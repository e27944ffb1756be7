"""Streaming pattern detection (CEP-lite): A-followed-by-B within a gap.

The reference exposes per-partition, order-preserving typed streams
(``client/RecordStream.scala:14-16``) precisely so consumers can run
order-sensitive logic like this; here the same contract is a keyed
stateful streaming operator: for every ``trigger_type`` event, emit a
match against the key's most recent ``base_type`` event if it happened
within ``gap`` — e.g. "click within 10 minutes of a view".

State per key is ONE row (the latest base event) — O(keys) state, never
O(events), and a key's state is overwritten on every base event, so state
size is bounded regardless of stream length. Rows are processed in
``(ts, event_id)`` order: the time-ordered replay guarantees it across
micro-batches (contiguous time chunks), and the update function sorts
within each batch — so the streaming result equals the batch
last-prior-base window formulation row for row (asserted in
tests/test_streaming_duality.py and hash-checked against the DuckDB
oracle as q57).

Match timestamps compare in exact microseconds; the emitted
``lag_seconds`` is floor(epoch-seconds) difference, matching the SQL
``floor(extract(epoch ...))`` convention used across the repo.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fs2_kafka_streams_spark.streaming.replay import replay_dir
from fs2_kafka_streams_spark.streaming.run import run_to_memory
from fs2_kafka_streams_spark.streaming.stateful import EVENTS_SCHEMA

_MATCH_SCHEMA = (
    "user_id long, base_event_id long, trigger_event_id long, "
    "base_ts timestamp_ntz, trigger_ts timestamp_ntz, lag_seconds long"
)
_STATE_SCHEMA = "base_event_id long, base_ts_us long"


def _pattern_update_fn(base_type: str, trigger_type: str, gap_us: int):
    def update(key, pdf_iter, state: GroupState):
        last = tuple(state.get) if state.exists else None  # (event_id, ts_us)
        frames = [pdf for pdf in pdf_iter if not pdf.empty]
        if not frames:
            if last is not None:
                state.update(last)
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
        pdf = pdf.sort_values(["_ts_us", "event_id"], ignore_index=True)

        # last base event STRICTLY before each row in (ts, id) order:
        # ffill-then-shift — so a type that is both base and trigger
        # matches the PREVIOUS base, exactly the batch 1-PRECEDING frame.
        is_base = pdf["event_type"] == base_type
        prior_id = (
            pdf["event_id"].astype("Int64").where(is_base).ffill().shift(1)
        )
        prior_ts = pdf["_ts_us"].astype("Int64").where(is_base).ffill().shift(1)
        if last is not None:  # seed rows before the batch's first base
            prior_id = prior_id.fillna(last[0])
            prior_ts = prior_ts.fillna(last[1])

        hit = (
            (pdf["event_type"] == trigger_type)
            & prior_ts.notna()
            & (pdf["_ts_us"] - prior_ts <= gap_us)
            & (pdf["_ts_us"] - prior_ts >= 0)
        ).fillna(False).astype(bool)  # NA from rows with no prior base
        if is_base.any():
            i = is_base[is_base].index[-1]
            last = (int(pdf["event_id"].iloc[i]), int(pdf["_ts_us"].iloc[i]))
        if last is not None:
            state.update(last)

        if hit.any():
            m = pdf[hit]
            yield pd.DataFrame(
                {
                    "user_id": m["user_id"].astype("int64"),
                    "base_event_id": prior_id[hit].astype("int64"),
                    "trigger_event_id": m["event_id"].astype("int64"),
                    "base_ts": pd.to_datetime(
                        prior_ts[hit].astype("int64"), unit="us"
                    ),
                    "trigger_ts": pd.to_datetime(m["_ts_us"], unit="us"),
                    "lag_seconds": m["_ts_us"] // 1_000_000
                    - prior_ts[hit].astype("int64") // 1_000_000,
                }
            )

    return update


def pattern_match_stream(
    spark: SparkSession,
    sf_dir: str,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
) -> DataFrame:
    """Run the followed-by pattern as a REAL streaming query over the
    time-ordered replay; returns the materialized match table."""
    n, unit = gap.split()
    gap_us = int(n) * {"minutes": 60, "seconds": 1}[unit] * 1_000_000
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir(sf_dir, "events", order_col="ts"))
    )
    matches = src.groupBy("user_id").applyInPandasWithState(
        _pattern_update_fn(base_type, trigger_type, gap_us),
        outputStructType=_MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(spark, matches, "cep_sink")


def pattern_match_batch(
    events: DataFrame,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
) -> DataFrame:
    """Batch twin: for each trigger event, the key's last preceding base
    event in ``(ts, event_id)`` order, kept if within ``gap``. Pure window
    expressions — whole-stage codegen, one shuffle on the key."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base_ts = F.last(
        F.when(F.col("event_type") == base_type, F.col("ts")), ignorenulls=True
    ).over(w)
    base_id = F.last(
        F.when(F.col("event_type") == base_type, F.col("event_id")),
        ignorenulls=True,
    ).over(w)
    seq = events.select(
        "user_id", "event_id", "ts", "event_type",
        base_ts.alias("base_ts"), base_id.alias("base_event_id"),
    )
    return (
        seq.filter(
            (F.col("event_type") == trigger_type)
            & F.col("base_ts").isNotNull()
            & (F.col("ts") <= F.col("base_ts") + F.expr(f"INTERVAL {gap}"))
        )
        .select(
            "user_id",
            "base_event_id",
            F.col("event_id").alias("trigger_event_id"),
            "base_ts",
            F.col("ts").alias("trigger_ts"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("base_ts")
            ).cast("long").alias("lag_seconds"),
        )
    )
