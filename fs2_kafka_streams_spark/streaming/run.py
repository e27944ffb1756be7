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

#: Rolling trace of completed streaming runs: ``{"name", "n_triggers"}``
#: per query, appended by every runner right after ``awaitTermination``.
#: Same contract as ``conf.PIN_TRACE``: measurement harnesses (bench.py)
#: snapshot ``RUN_SEQ`` around each timed entry and record how many
#: micro-batches that entry actually executed — the per-trigger
#: checkpoint fsync count is the streaming family's dominant IO cost, so
#: a trigger-count change between rounds must be visible in the artifact,
#: not inferred (VERDICT r8 #6). Control flow never reads it.
RUN_TRACE: list[dict] = []
_RUN_TRACE_MAX = 256

#: Monotonic count of every RUN_TRACE append ever made — snapshot THIS,
#: not ``len(RUN_TRACE)`` (the rolling trim shifts indices).
RUN_SEQ = 0


def record_run(name: str, query) -> None:
    """Append a completed query's micro-batch count to :data:`RUN_TRACE`.

    ``lastProgress.batchId`` is 0-based over a fresh checkpoint, so
    ``+ 1`` is the executed-trigger count; a query that never produced a
    progress event records 0. If reading ``lastProgress`` itself throws,
    the count is unknowable and records ``None`` (→ ``null`` in
    BENCH_FULL.json's ``n_triggers`` lists) — never a numeric sentinel a
    cross-round sum/diff could silently absorb as an executed count."""
    global RUN_SEQ
    try:
        lp = query.lastProgress
        n = int(lp["batchId"]) + 1 if lp else 0
    except Exception:  # pragma: no cover — tracing must never fail a run
        n = None
    RUN_TRACE.append({"name": name, "n_triggers": n})
    RUN_SEQ += 1
    del RUN_TRACE[:-_RUN_TRACE_MAX]


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
    record_run(name, q)
    return spark.table(name)
