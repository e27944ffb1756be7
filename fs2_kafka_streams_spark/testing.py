"""Local mimic of the driver's correctness gate.

Runs a QuerySpec's Spark builder and its DuckDB oracle over the same parquet
tables and compares row count, (normalized) schema, and the order-insensitive
multiset of canonicalized values — the same contract the driver applies at
sf0.01. Used by the test suite so every query is verified before the driver
ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb

from fs2_kafka_streams_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_spark_type(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array<"):
        return "arr<" + _norm_spark_type(dt[6:-1]) + ">"
    return {
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float",
        "string": "str", "varchar": "str",
        "timestamp": "ts", "timestamp_ntz": "ts",
        "date": "date", "boolean": "bool", "binary": "bin",
    }.get(dt, dt)


def _norm_duck_type(dt: str) -> str:
    dt = dt.upper()
    if dt.endswith("[]"):
        return "arr<" + _norm_duck_type(dt[:-2]) + ">"
    if dt.startswith("DECIMAL"):
        return "decimal"
    return {
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
        "HUGEINT": "int", "UTINYINT": "int", "USMALLINT": "int",
        "UINTEGER": "int", "UBIGINT": "int",
        "FLOAT": "float", "DOUBLE": "float", "REAL": "float",
        "VARCHAR": "str", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
        "DATE": "date", "BOOLEAN": "bool", "BLOB": "bin",
    }.get(dt, dt.lower())


def canon_value(v):
    """Canonical string for one cell, matching across Spark and DuckDB."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str

    def __bool__(self):
        return self.ok


def compare_rows(name, spark_cols, spark_types, spark_rows,
                 duck_cols, duck_types, duck_rows) -> CompareResult:
    if sorted(spark_cols) != sorted(duck_cols):
        return CompareResult(
            name, False,
            f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        return CompareResult(
            name, False,
            f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    for i, j in zip(order, dorder):
        st, dt = _norm_spark_type(spark_types[i]), _norm_duck_type(duck_types[j])
        if st != dt:
            return CompareResult(
                name, False,
                f"type mismatch on {spark_cols[i]}: spark={spark_types[i]}({st}) "
                f"duck={duck_types[j]}({dt})")

    s_set = sorted(tuple(canon_value(r[i]) for i in order) for r in spark_rows)
    d_set = sorted(tuple(canon_value(r[j]) for j in dorder) for r in duck_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in set(map(tuple, d_set))][:3]
        diff_d = [r for r in d_set if r not in set(map(tuple, s_set))][:3]
        return CompareResult(
            name, False,
            f"value mismatch; spark-only(≤3)={diff_s} duck-only(≤3)={diff_d}")
    return CompareResult(name, True, f"{len(spark_rows)} rows match")


def reject_unhashable_columns(name: str, df) -> CompareResult | None:
    """Fail any query whose output has a top-level array/map/struct column.

    The driver's canonicalizer pandas-``sort_values`` the raw cells, and
    list-valued cells are unhashable — q25/q29 crashed the round-1 driver this
    way while the old local gate silently stringified them. Mimic the driver:
    such a schema is an automatic failure before any value comparison.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    for fld in df.schema.fields:
        if isinstance(fld.dataType, (ArrayType, MapType, StructType)):
            return CompareResult(
                name, False,
                f"top-level {fld.dataType.simpleString()} column "
                f"'{fld.name}' would crash the driver canonicalizer "
                f"(unhashable in pandas sort_values) — array_join/to_json it",
            )
    return None


def run_compare(spark, sf_dir: str, spec,
                con: duckdb.DuckDBPyConnection | None = None) -> CompareResult:
    """Execute one QuerySpec on Spark and DuckDB; compare like the driver."""
    df = spec.build(spark, sf_dir)
    bad = reject_unhashable_columns(spec.name, df)
    if bad is not None:
        return bad
    spark_cols = df.columns
    spark_types = [t for _, t in df.dtypes]
    spark_rows = [tuple(r) for r in df.collect()]

    if spec.oracle is None:
        # No registry entry is oracle-less today; if one appears, an empty
        # result is almost certainly a regression (every declared query
        # returns rows on the fixtures), so fail on 0 — the old `>= 0`
        # read like a guard but could never be false.
        ok = len(spark_rows) > 0
        return CompareResult(spec.name, ok, f"rows-only check: {len(spark_rows)} rows")

    own_con = con is None
    if own_con:
        con = duck_connect(sf_dir)
    try:
        rel = con.sql(spec.oracle)
        duck_cols = list(rel.columns)
        duck_types = [str(t) for t in rel.types]
        duck_rows = rel.fetchall()
    finally:
        if own_con:
            con.close()
    return compare_rows(spec.name, spark_cols, spark_types, spark_rows,
                        duck_cols, duck_types, duck_rows)
