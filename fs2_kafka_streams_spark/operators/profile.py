"""Single-pass dataset profiling — the ANALYZE / data-quality operator.

At 100 TB you get ONE scan to learn everything about a table: row count,
per-column null counts, exact distinct counts, min/max. This operator
folds all of it into a single aggregation job (multiple exact DISTINCT
aggregates plan as one Expand + aggregation pair in Spark — a documented
xN row expansion, still one pass over storage, no per-column re-scans),
then pivots the one result row into a long-format stats table with a
row-local explode.

Reference scope note: the reference engine (a Kafka streaming library)
has no profiling surface; this belongs to the analytics extension
mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fs2_kafka_streams_spark.operators.util import spread as _spread

__all__ = ["table_profile"]

#: explicit cross-engine renderings per type family; never rely on the
#: engine's default value->string formatting (Spark and DuckDB disagree on
#: trailing zeros, exponent thresholds, and fractional seconds)
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _render(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, _TS_FMT)
    if isinstance(dtype, T.DoubleType):
        # test-table doubles carry <= 2 decimal digits (FIXTURES.md);
        # exact decimal rendering is identical in both engines. Routed
        # through the measure-guarded dec2, not a raw decimal cast (r10
        # advisory): the raw cast is the exact engine-divergent /
        # ANSI-throwing cast the measure-domain policy eliminated — a
        # NaN/±inf/overflow extremum renders as NULL ("no usable
        # measurement") instead of crashing the exported operator on
        # hostile data. Identity on in-contract ≤2-dp values.
        from fs2_kafka_streams_spark.canonical import dec2

        return dec2(col).cast("string")
    return col.cast("string")


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with ``n_rows``,
    ``n_nonnull``, ``n_distinct`` (exact), ``min_value``/``max_value``
    (rendered with explicit cross-engine formats).

    One aggregation job for the whole table; the pivot to long format is
    a row-local explode of a 1-row result — nothing but the scan and one
    exchange touches the data.
    """
    cols = columns or df.columns
    dtypes = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("_nr")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            _render(F.min(F.col(c)), dtypes[c]).alias(f"_mn_{c}"),
            _render(F.max(F.col(c)), dtypes[c]).alias(f"_mx_{c}"),
        ]
    # The multi-distinct plan Expands the input N-ways and (with string
    # min/max buffers) SORT-aggregates it — per-row work far heavier than
    # the scan itself, so it must not serialize on the scan's split count
    # (a single-row-group parquet delivers every row to ONE task; guide
    # §2.5 input skew). Same guard as the text/similarity pipelines.
    one = _spread(df).agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_nr").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nonnull"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_value"),
                F.col(f"_mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("e")).select("e.*")
