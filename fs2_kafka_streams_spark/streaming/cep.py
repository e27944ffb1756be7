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


def pattern_matches_stream(
    spark: SparkSession,
    sf_dir: str,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
) -> DataFrame:
    """The UN-SINKED streaming match DataFrame (shared by the memory-sink
    runner and the crash-recovery tests, which drive it through their own
    checkpointed sink)."""
    n, unit = gap.split()
    gap_us = int(n) * {"minutes": 60, "seconds": 1}[unit] * 1_000_000
    # 2 files/trigger: cross-batch state is still exercised (2 triggers
    # over the 4-file ts-ordered replay) at half the per-batch machinery
    # cost; the update fn sorts each batch by (ts, event_id) so intra-
    # trigger file order is irrelevant
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events", order_col="ts"))
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _pattern_update_fn(base_type, trigger_type, gap_us),
        outputStructType=_MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def pattern_match_stream(
    spark: SparkSession,
    sf_dir: str,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
) -> DataFrame:
    """Run the followed-by pattern as a REAL streaming query over the
    time-ordered replay; returns the materialized match table."""
    matches = pattern_matches_stream(
        spark, sf_dir, base_type, trigger_type, gap
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


# ---- 3-stage funnel (A followed-by B followed-by C, gap per hop) ----------

_FUNNEL_SCHEMA = (
    "user_id long, view_event_id long, click_event_id long, "
    "purchase_event_id long, view_ts timestamp_ntz, "
    "click_ts timestamp_ntz, purchase_ts timestamp_ntz, "
    "total_lag_seconds long"
)
# level-1 state (last base) + level-2 state (last qualified mid + its base)
_FUNNEL_STATE = (
    "v_id long, v_ts long, c_id long, c_ts long, cv_id long, cv_ts long"
)


def _funnel_update_fn(stages: tuple[str, str, str], gap_us: int):
    base_t, mid_t, fin_t = stages

    def update(key, pdf_iter, state: GroupState):
        st = tuple(state.get) if state.exists else (None,) * 6
        frames = [pdf for pdf in pdf_iter if not pdf.empty]
        if not frames:
            if state.exists:
                state.update(st)
            return
        pdf = pd.concat(frames, ignore_index=True)
        pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
        pdf = pdf.sort_values(["_ts_us", "event_id"], ignore_index=True)

        # pass 1: last STRICTLY-prior base per row (seeded from state)
        is_base = pdf["event_type"] == base_t
        pv_id = pdf["event_id"].astype("Int64").where(is_base).ffill().shift(1)
        pv_ts = pdf["_ts_us"].astype("Int64").where(is_base).ffill().shift(1)
        if st[0] is not None:
            pv_id, pv_ts = pv_id.fillna(st[0]), pv_ts.fillna(st[1])

        # qualified mid: a mid-event whose own prior base is within gap
        q_mid = (
            (pdf["event_type"] == mid_t)
            & pv_ts.notna()
            & (pdf["_ts_us"] - pv_ts <= gap_us)
        ).fillna(False).astype(bool)

        # pass 2: last strictly-prior QUALIFIED mid, carrying its base refs
        pc_id = pdf["event_id"].astype("Int64").where(q_mid).ffill().shift(1)
        pc_ts = pdf["_ts_us"].astype("Int64").where(q_mid).ffill().shift(1)
        pcv_id = pv_id.where(q_mid).ffill().shift(1)
        pcv_ts = pv_ts.where(q_mid).ffill().shift(1)
        if st[2] is not None:
            pc_id, pc_ts = pc_id.fillna(st[2]), pc_ts.fillna(st[3])
            pcv_id, pcv_ts = pcv_id.fillna(st[4]), pcv_ts.fillna(st[5])

        hit = (
            (pdf["event_type"] == fin_t)
            & pc_ts.notna()
            & (pdf["_ts_us"] - pc_ts <= gap_us)
        ).fillna(False).astype(bool)

        # roll state forward: last base; last qualified mid (+ its base)
        new = list(st)
        if is_base.any():
            i = is_base[is_base].index[-1]
            new[0], new[1] = int(pdf["event_id"].iloc[i]), int(pdf["_ts_us"].iloc[i])
        if q_mid.any():
            j = q_mid[q_mid].index[-1]
            new[2], new[3] = int(pdf["event_id"].iloc[j]), int(pdf["_ts_us"].iloc[j])
            new[4], new[5] = int(pv_id.iloc[j]), int(pv_ts.iloc[j])
        if any(x is not None for x in new):
            state.update(tuple(new))

        if hit.any():
            m = pdf[hit]
            yield pd.DataFrame(
                {
                    "user_id": m["user_id"].astype("int64"),
                    "view_event_id": pcv_id[hit].astype("int64"),
                    "click_event_id": pc_id[hit].astype("int64"),
                    "purchase_event_id": m["event_id"].astype("int64"),
                    "view_ts": pd.to_datetime(
                        pcv_ts[hit].astype("int64"), unit="us"
                    ),
                    "click_ts": pd.to_datetime(
                        pc_ts[hit].astype("int64"), unit="us"
                    ),
                    "purchase_ts": pd.to_datetime(m["_ts_us"], unit="us"),
                    "total_lag_seconds": m["_ts_us"] // 1_000_000
                    - pcv_ts[hit].astype("int64") // 1_000_000,
                }
            )

    return update


def funnel_matches_stream(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    gap: str = "12 hours",
) -> DataFrame:
    """The un-sinked 3-stage funnel stream (see
    :func:`pattern_matches_stream` for why this is split out)."""
    n, unit = gap.split()
    gap_us = int(n) * {"hours": 3600, "minutes": 60, "seconds": 1}[unit] * 1_000_000
    # 2 files/trigger — same rationale as pattern_matches_stream
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events", order_col="ts"))
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _funnel_update_fn(stages, gap_us),
        outputStructType=_FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_match_stream(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    gap: str = "12 hours",
) -> DataFrame:
    """3-stage funnel detection as a stateful streaming query: for every
    final-stage event, the chain (last qualified mid-stage event, which in
    turn carries ITS last prior base event), each hop within ``gap``.
    State per key is two rows (last base; last qualified mid + base refs)
    — still O(keys), bounded forever."""
    matches = funnel_matches_stream(spark, sf_dir, stages, gap)
    return run_to_memory(spark, matches, "funnel_sink")


def funnel_match_batch(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    gap: str = "12 hours",
) -> DataFrame:
    """Batch twin of :func:`funnel_match_stream`: two chained
    last-prior-qualified windows — pure column expressions."""
    base_t, mid_t, fin_t = stages
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def lastq(col, cond):
        return F.last(F.when(cond, col), ignorenulls=True).over(w)

    is_base = F.col("event_type") == base_t
    s1 = events.select(
        "user_id", "event_id", "ts", "event_type",
        lastq(F.col("ts"), is_base).alias("v_ts"),
        lastq(F.col("event_id"), is_base).alias("v_id"),
    )
    gap_i = F.expr(f"INTERVAL {gap}")
    q_mid = (
        (F.col("event_type") == mid_t)
        & F.col("v_ts").isNotNull()
        & (F.col("ts") <= F.col("v_ts") + gap_i)
    )
    s2 = s1.select(
        "user_id", "event_id", "ts", "event_type",
        lastq(F.col("ts"), q_mid).alias("c_ts"),
        lastq(F.col("event_id"), q_mid).alias("c_id"),
        lastq(F.col("v_ts"), q_mid).alias("cv_ts"),
        lastq(F.col("v_id"), q_mid).alias("cv_id"),
    )
    return (
        s2.filter(
            (F.col("event_type") == fin_t)
            & F.col("c_ts").isNotNull()
            & (F.col("ts") <= F.col("c_ts") + gap_i)
        )
        .select(
            "user_id",
            F.col("cv_id").alias("view_event_id"),
            F.col("c_id").alias("click_event_id"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("cv_ts").alias("view_ts"),
            F.col("c_ts").alias("click_ts"),
            F.col("ts").alias("purchase_ts"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("cv_ts")
            ).cast("long").alias("total_lag_seconds"),
        )
    )
