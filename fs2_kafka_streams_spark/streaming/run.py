"""Run a streaming DataFrame to completion and return the sink contents.

The harness pattern: ``availableNow`` trigger + memory sink + fresh
checkpoint = a deterministic, bounded replay of the file stream (see
:mod:`fs2_kafka_streams_spark.streaming.replay`). Production uses the same
plan with a Kafka/parquet sink and a durable checkpoint instead.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from fs2_kafka_streams_spark.streaming.conf import (
    STREAM_PERF_CONF,
    pinned_conf,
)


def run_to_memory(
    spark: SparkSession,
    df: DataFrame,
    name_prefix: str,
    output_mode: str = "append",
    extra_conf: dict[str, str] | None = None,
) -> DataFrame:
    """Returns the memory-sink table. The sink itself (small by design —
    every harness query aggregates before sinking) lives until the session
    ends or the caller drops it; the RocksDB checkpoint tree, which is NOT
    small, is deleted here once the query has terminated — availableNow
    ran the stream to completion, so nothing will resume from it."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    try:
        return _run(spark, df, name, checkpoint, output_mode, extra_conf)
    finally:
        # delete on failure too: a query that errors mid-replay must not
        # leave its RocksDB tree behind (repeated failing runs fill /tmp)
        shutil.rmtree(checkpoint, ignore_errors=True)


def _run(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    checkpoint: str,
    output_mode: str,
    extra_conf: dict[str, str] | None,
) -> DataFrame:
    confs = dict(STREAM_PERF_CONF)
    confs.update(extra_conf or {})
    with pinned_conf(spark, confs):
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
