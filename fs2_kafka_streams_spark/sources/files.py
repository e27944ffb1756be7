"""Batch file sources/sinks: parquet (primary), csv, json.

Parquet is the engine's native format (columnar, predicate pushdown, column
pruning). CSV/JSON exist for fixture interchange; both use explicit schemas
— inference is banned in pipelines (nondeterministic types at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, sep: str = ","
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).option(
        "sep", sep
    ).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None):
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True):
    df.write.mode("overwrite").option("header", header).csv(path)


def write_json(df: DataFrame, path: str):
    df.write.mode("overwrite").json(path)
