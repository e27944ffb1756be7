"""Catalog: named access to the driver's parquet tables.

The reference's "catalog" is a Kafka subscription (topic list / regex,
``client/Subscription.scala:3-7``); here tables are parquet datasets on disk
registered as temp views so both the DataFrame API and ``spark.sql`` reach
them. Reads are plain ``spark.read.parquet`` — Catalyst gets predicate
pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (path, size, mtime_ns) -> names of TIMESTAMP(NANOS) columns. Every query
#: builder constructs its own Catalog, so a per-instance cache gets almost
#: no reuse — without this, each of the ~50 driver entries re-runs the
#: blocking driver-side parquet footer read for the same files.
_NANOS_CACHE: dict[tuple[str, int, int], frozenset[str]] = {}


def _nanos_cols(path: str) -> frozenset[str]:
    import pyarrow as pa

    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    hit = _NANOS_CACHE.get(key)
    if hit is None:
        hit = frozenset(
            f.name
            for f in pq.read_schema(path)
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        )
        _NANOS_CACHE[key] = hit
        if len(_NANOS_CACHE) > 256:  # bound: stale stamps of rewritten files
            _NANOS_CACHE.pop(next(iter(_NANOS_CACHE)))
    return hit


class Catalog:
    """Bind a SparkSession to one scale-factor directory of parquet tables."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self._read(self.path(name))
        return self._cache[name]

    def _read(self, path: str) -> DataFrame:
        """Read parquet, normalizing TIMESTAMP(NANOS) columns.

        The driver's parquet stores nanosecond timestamps, which Spark's
        vectorized reader rejects. We read them as raw nanos
        (``spark.sql.legacy.parquet.nanosAsLong``) and convert to
        ``timestamp_ntz`` at microsecond precision — identical to what DuckDB
        yields for TIMESTAMP_NS, and free of session-timezone ambiguity.
        Conversion happens inside the scan projection (whole-stage codegen),
        so pushdown/pruning on all other columns is unaffected.
        """
        # Deliberate session mutation, set once: the driver hands us a
        # vanilla session and builds queries through this catalog only —
        # without the flag every read of the nano-timestamp driver parquet
        # fails (PARQUET_TYPE_ILLEGAL). Scoped-and-restored pinning is NOT
        # safe here: the flag must still be in force when the returned
        # lazy DataFrame actually executes.
        if (
            self.spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
            != "true"
        ):
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nanos_cols = _nanos_cols(path)
        df = self.spark.read.parquet(path)
        for c in nanos_cols:
            # timestampadd on an NTZ literal stays NTZ end-to-end — no
            # LTZ hop, so the result is independent of the session timezone
            # (the driver's session is not guaranteed to be UTC).
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(MICROSECOND, `{c}` div 1000, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL API."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)


def load(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)
