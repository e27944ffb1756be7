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

from fs2_kafka_streams_spark.queries import ntz_epoch_seconds
from fs2_kafka_streams_spark.streaming.replay import replay_dir
from fs2_kafka_streams_spark.streaming.conf import duration_us
from fs2_kafka_streams_spark.streaming.run import run_to_memory
from fs2_kafka_streams_spark.streaming.stateful import EVENTS_SCHEMA

_MATCH_SCHEMA = (
    "user_id long, base_event_id long, trigger_event_id long, "
    "base_ts timestamp_ntz, trigger_ts timestamp_ntz, lag_seconds long"
)
_STATE_SCHEMA = "base_event_id long, base_ts_us long"


def _fold_pattern(
    frames: list[pd.DataFrame],
    last: tuple[int, int] | None,
    base_type: str,
    trigger_type: str,
    gap_us: int,
) -> tuple[tuple[int, int] | None, pd.DataFrame | None]:
    """Pure per-key fold shared by BOTH state APIs
    (``applyInPandasWithState`` and ``transformWithStateInPandas``):
    given the batch's frames and the carried (base_event_id, base_ts_us)
    state, return (new_state, match_frame_or_None)."""
    if not frames:
        return last, None
    pdf = pd.concat(frames, ignore_index=True)
    pdf = pdf.assign(_ts_us=pdf["ts"].astype("int64") // 1000)
    # NaN event_ids sort LAST among ts ties (pandas default na_position)
    # — exactly DuckDB's ASC NULLS LAST, so the oracle needs no spelling
    pdf = pdf.sort_values(["_ts_us", "event_id"], ignore_index=True)

    # last base event STRICTLY before each row in (ts, id) order, tracked
    # by ROW POSITION (ffill-then-shift on the position, so a type that is
    # both base and trigger matches the PREVIOUS base — the batch
    # 1-PRECEDING frame). Position, not id: a base whose event_id is NULL
    # is still a real base (the id is payload), and an id-ffill would
    # silently attribute its matches to an OLDER base's id while taking
    # the new base's ts (r10 NULL-id sweep).
    is_base = pdf["event_type"] == base_type
    pos = pd.Series(range(len(pdf)), dtype="float64")
    bpos = pos.where(is_base).ffill().shift(1)
    have = bpos.notna()
    taken = bpos.fillna(0).astype(int).to_numpy()
    ids = pdf["event_id"].astype("Int64").to_numpy()
    prior_id = pd.Series(
        pd.array(ids[taken], dtype="Int64"), index=pdf.index
    ).where(have)
    prior_ts = pd.Series(
        pdf["_ts_us"].to_numpy()[taken], index=pdf.index, dtype="Int64"
    ).where(have)
    if last is not None:  # seed rows before the batch's first base
        # base_ts (never NULL after the ts filter) marks existence; the
        # seeded id may itself be genuinely NULL
        prior_id = prior_id.mask(~have, last[0])
        prior_ts = prior_ts.fillna(last[1])

    hit = (
        (pdf["event_type"] == trigger_type)
        & prior_ts.notna()
        & (pdf["_ts_us"] - prior_ts <= gap_us)
        & (pdf["_ts_us"] - prior_ts >= 0)
    ).fillna(False).astype(bool)  # NA from rows with no prior base
    if is_base.any():
        i = is_base[is_base].index[-1]
        eid = pdf["event_id"].iloc[i]
        last = (
            None if pd.isna(eid) else int(eid),
            int(pdf["_ts_us"].iloc[i]),
        )

    match = None
    if hit.any():
        m = pdf[hit]
        match = pd.DataFrame(
            {
                # nullable Int64: the NULL grouping key is a legitimate
                # group (batch PARTITION BY groups NULLs together on both
                # engines); plain int64 astype crashes on its NaN. Same
                # for the id columns: an unkeyed base/trigger emits NULL.
                "user_id": m["user_id"].astype("Int64"),
                "base_event_id": prior_id[hit],
                "trigger_event_id": m["event_id"].astype("Int64"),
                "base_ts": pd.to_datetime(
                    prior_ts[hit].astype("int64"), unit="us"
                ),
                "trigger_ts": pd.to_datetime(m["_ts_us"], unit="us"),
                "lag_seconds": m["_ts_us"] // 1_000_000
                - prior_ts[hit].astype("int64") // 1_000_000,
            }
        )
    return last, match


def _pattern_update_fn(base_type: str, trigger_type: str, gap_us: int):
    def update(key, pdf_iter, state: GroupState):
        last = tuple(state.get) if state.exists else None  # (event_id, ts_us)
        frames = [pdf for pdf in pdf_iter if not pdf.empty]
        last, match = _fold_pattern(
            frames, last, base_type, trigger_type, gap_us
        )
        if last is not None:
            state.update(last)
        if match is not None:
            yield match

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
    gap_us = duration_us(gap)
    # 2 files/trigger: cross-batch state is still exercised (2 triggers
    # over the 4-file ts-ordered replay) at half the per-batch machinery
    # cost; the update fn sorts each batch by (ts, event_id) so intra-
    # trigger file order is irrelevant
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events", order_col="ts"))
        # NULL event-time contract (docs/USAGE.md): a row with no event
        # time cannot be sequenced — CEP drops it, exactly as Spark's own
        # event-time operators (window aggregation, stream-stream join)
        # drop NULL event times. Without this, NaT → int64 µs is the
        # int64-min sentinel and the fold crashes or mis-sequences.
        .filter(F.col("ts").isNotNull())
        # the fold touches only these four columns; value/props would
        # otherwise ride the state shuffle AND the per-trigger Arrow
        # JVM→Python transfer as dead weight (guide §4: pass only the
        # columns the function needs — the grouped-state boundary ships
        # every input column, opaque to Catalyst's pruning)
        .select("event_id", "ts", "user_id", "event_type")
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
    # NULL event-time contract — mirror of the streaming side's drop
    events = events.filter(F.col("ts").isNotNull())
    # asc_nulls_last on the tie-break: the streaming fold's pandas sort
    # puts NaN ids last among ts ties (Spark's window default would be
    # NULLS FIRST and silently flip tie order; r10 NULL-id sweep)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last prior base as ONE struct: a base whose event_id is NULL is
    # still a base (the struct is non-NULL), so its ts and its NULL id
    # travel together — two separate ignorenulls lasts would skip the id
    # but take the ts, attributing the match to an older base's id
    base = F.last(
        F.when(
            F.col("event_type") == base_type,
            F.struct(F.col("ts"), F.col("event_id")),
        ),
        ignorenulls=True,
    ).over(w)
    seq = events.select(
        "user_id", "event_id", "ts", "event_type",
        base["ts"].alias("base_ts"), base["event_id"].alias("base_event_id"),
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
            # NTZ-safe epoch arithmetic (r10 cold review): unix_timestamp
            # interprets NTZ as session-LOCAL wall time, which is
            # non-linear across a DST transition — a (base, trigger) pair
            # straddling one would report a lag ±3600 s off the streaming
            # side's pure-µs integers under a DST session timezone
            (
                ntz_epoch_seconds("ts") - ntz_epoch_seconds("base_ts")
            ).cast("long").alias("lag_seconds"),
        )
    )


# ---- typed-state variant with event-time timers (A22 + A17 discipline) ----

from fs2_kafka_streams_spark.streaming.stateful import HAS_TWS  # noqa: E402

if HAS_TWS:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class PatternTimerProcessor(StatefulProcessor):
        """The followed-by CEP on ``transformWithStateInPandas`` with the
        reference's wakeup-timeout discipline (``client/ConsumerAlgebra.
        scala:64-77``) as EVENT-TIME state expiry: every base event arms a
        timer at ``base_ts + gap``; when the watermark passes it, the timer
        fires and DELETES the key's base state.

        Expiry is semantically neutral — a trigger can only match a base
        within ``gap``, so a base whose timer fired (watermark ≥ expiry,
        hence every future on-time event is ≥ expiry) can never match again
        — but it bounds state at O(keys-with-a-live-base) instead of
        O(keys-ever-seen): exactly the reference's timeout-driven cleanup,
        and the 100 TB posture for unbounded key domains. Output equality
        with the timerless engine and the batch window formulation is the
        q57b driver entry + tests/test_cep_tws.py.

        Timer discipline (pinned in tests/test_tws_state_kinds.py): ≤1 live
        timer per key — a new base deletes the previous base's timer
        (unless already fired, i.e. its expiry ≤ current watermark) before
        arming its own; the fired-timer callback double-checks the state is
        actually due, so a stale timer racing a same-batch refresh is a
        no-op."""

        def __init__(self, base_type: str, trigger_type: str, gap_us: int):
            self._base_type = base_type
            self._trigger_type = trigger_type
            self._gap_us = gap_us

        def init(self, handle) -> None:
            self._handle = handle
            # wall micros for output/ordering + the zone offset captured
            # when the base was stored, for wall→UTC timer conversion
            self._base = handle.getValueState(
                "base", "base_event_id long, base_ts_us long, tz_off_us long"
            )

        def _expiry_ms(self, base_ts_us: int, off_us: int) -> int:
            # +1 ms, not floor: the timer clock is ms while matching is µs.
            # A floored expiry can fire with the watermark still up to
            # 999 µs BEFORE base+gap, clearing the base while a valid
            # trigger (and even an exactly-at-boundary one, since the
            # watermark keeps rows at ts == wm) can still arrive. Firing
            # 1 ms late is output-neutral — the timer only GCs state.
            return (base_ts_us - off_us + self._gap_us) // 1000 + 1

        def handleInputRows(self, key, rows, timerValues):
            prev = tuple(self._base.get()) if self._base.exists() else None
            frames = [pdf for pdf in rows if not pdf.empty]
            last, match = _fold_pattern(
                frames, prev[:2] if prev else None, self._base_type,
                self._trigger_type, self._gap_us,
            )
            if last is not None and (prev is None or last != prev[:2]):
                # NTZ wall-time micros drive matching and output; Spark's
                # timer clock is UTC epoch ms (the watermark's domain), so
                # convert through the JVM-computed per-row offset
                # (``_utc_us``, the LAST column by construction —
                # pattern_matches_stream_tws appends it and TWS's Arrow
                # transfer renames derived columns positionally). Under a
                # non-UTC session timezone wall and UTC micros differ by
                # the zone offset; registering wall-derived expiries would
                # fire timers hours early, expiring bases with gap left.
                # Take the offset of THE BASE ROW ITSELF, not the batch's
                # first row — a batch spanning a DST transition has two
                # offsets, and the wrong one skews the expiry by ±1 h.
                off_us = prev[2] if prev is not None else 0
                for f in frames:
                    wall = f["ts"].astype("int64") // 1000
                    # null-safe id match: a NULL-id base row is located by
                    # (id IS NULL, ts) — `== None` would yield an all-NA
                    # mask and never find it (r10 NULL-id sweep)
                    idm = (
                        f["event_id"].isna()
                        if last[0] is None
                        else (f["event_id"] == last[0]).fillna(False)
                    )
                    hit = idm & (wall == last[1])
                    if hit.any():
                        i = hit.idxmax()
                        off_us = int(wall.loc[i]) - int(f.iloc[:, -1].loc[i])
                        break
                self._base.update((last[0], last[1], off_us))
                wm = timerValues.getCurrentWatermarkInMs()
                if prev is not None:
                    prev_exp = self._expiry_ms(prev[1], prev[2])
                    if prev_exp > wm:
                        self._handle.deleteTimer(prev_exp)
                self._handle.registerTimer(self._expiry_ms(last[1], off_us))
            if match is not None:
                yield match

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._base.exists():
                _, base_ts_us, off_us = tuple(self._base.get())
                if self._expiry_ms(base_ts_us, off_us) <= (
                    expiredTimerInfo.getExpiryTimeInMs()
                ):
                    self._base.clear()
            return iter(())

        def close(self) -> None:
            pass


def pattern_matches_stream_tws(
    spark: SparkSession,
    sf_dir: str,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
    source: DataFrame | None = None,
) -> DataFrame:
    """Un-sinked TWS pattern stream (see :class:`PatternTimerProcessor`).
    Event-time mode needs a watermark, and watermarks require TIMESTAMP —
    but the data contract is NTZ end-to-end, so the watermark rides a
    derived session-tz cast column (``_evt``) while ``ts`` stays NTZ for
    matching and output; ``_utc_us`` carries the cast's UTC micros so the
    processor can convert wall-time expiries into the timer clock's domain.
    The time-ordered replay's contiguous chunks make a 0-second delay
    lossless (no late rows).

    ``source`` injects any other streaming DataFrame carrying the events
    columns with an NTZ ``ts`` (e.g. the wire source's decoded stream —
    the reference's rebalance + table-materialization composition,
    ``client/RecordStream.scala:71-108`` + ``streams/Tables.scala``);
    default is the deterministic time-ordered file replay of
    ``{sf_dir}/events.parquet``."""
    from fs2_kafka_streams_spark.streaming.stateful import _tws_prepare

    _tws_prepare(spark)
    gap_us = duration_us(gap)
    if source is None:
        source = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .parquet(replay_dir(sf_dir, "events", order_col="ts"))
        )
    src = (
        # NULL event-time contract — see pattern_matches_stream (a NULL ts
        # would also yield a NULL _evt watermark column here)
        source.filter(F.col("ts").isNotNull())
        .withColumn("_evt", F.col("ts").cast("timestamp"))
        .withColumn("_utc_us", F.unix_micros(F.col("_evt")))
        .withWatermark("_evt", "0 seconds")
        # _utc_us LAST: the processor reads it positionally (TWS renames
        # derived columns in the Arrow transfer). value/props are pruned —
        # the processor touches neither, and the state boundary ships
        # every listed column through Arrow per trigger (guide §4).
        .select(
            "event_id", "ts", "user_id", "event_type", "_utc_us",
        )
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PatternTimerProcessor(
            base_type, trigger_type, gap_us
        ),
        outputStructType=_MATCH_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def pattern_match_stream_tws(
    spark: SparkSession,
    sf_dir: str,
    base_type: str = "view",
    trigger_type: str = "click",
    gap: str = "10 minutes",
    checkpoint: str | None = None,
    source: DataFrame | None = None,
) -> DataFrame:
    """Run the timer-expiring TWS pattern query to completion; returns the
    match table (must equal :func:`pattern_match_batch` — the q57 oracle)."""
    from fs2_kafka_streams_spark.streaming.conf import (
        STREAM_PERF_CONF,
        pinned_conf,
    )
    from fs2_kafka_streams_spark.streaming.run import run_to_memory
    from fs2_kafka_streams_spark.streaming.stateful import _tws_prepare

    matches = pattern_matches_stream_tws(
        spark, sf_dir, base_type, trigger_type, gap, source=source
    )
    if checkpoint is None:
        # throwaway checkpoint: run_to_memory owns the tempdir and deletes
        # the RocksDB tree after termination (a hand-rolled mkdtemp here
        # used to leak one tree per run)
        return run_to_memory(
            spark, matches, "cep_tws", extra_conf=dict(_tws_prepare(spark))
        )
    # explicit checkpoint = the crash-recovery path: the caller owns the
    # tree (it restarts from it), so no cleanup here. Conf layering matches
    # run_to_memory's (_tws_prepare on top of STREAM_PERF_CONF) so both
    # paths run under identical session confs.
    import uuid as _uuid

    conf = dict(STREAM_PERF_CONF)
    conf.update(_tws_prepare(spark))
    name = f"cep_tws_{_uuid.uuid4().hex[:8]}"
    with pinned_conf(spark, conf):
        q = (
            matches.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from fs2_kafka_streams_spark.streaming.run import record_run

    record_run(name, q)
    return spark.table(name)


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
        # NaN ids sort LAST among ts ties — DuckDB's ASC NULLS LAST
        pdf = pdf.sort_values(["_ts_us", "event_id"], ignore_index=True)

        ids = pdf["event_id"].astype("Int64").to_numpy()
        tss = pdf["_ts_us"].to_numpy()
        pos = pd.Series(range(len(pdf)), dtype="float64")

        def prior(mask, col_np, dtype="Int64"):
            # value of `col_np` at the last strictly-prior row where
            # `mask` held — POSITION-tracked so a NULL value (unkeyed
            # event's id) is carried faithfully, never skipped-over
            # (r10 NULL-id sweep; see _fold_pattern)
            p = pos.where(mask).ffill().shift(1)
            have = p.notna()
            taken = p.fillna(0).astype(int).to_numpy()
            return pd.Series(
                pd.array(col_np[taken], dtype=dtype), index=pdf.index
            ).where(have), have

        # pass 1: last STRICTLY-prior base per row (seeded from state).
        # st[1]/st[3] (the ts slots, never NULL after the ts filter) mark
        # level existence — the id slots may be genuinely NULL.
        is_base = pdf["event_type"] == base_t
        pv_id, have_v = prior(is_base, ids)
        pv_ts, _ = prior(is_base, tss)
        if st[1] is not None:
            pv_id = pv_id.mask(~have_v, st[0])
            pv_ts = pv_ts.fillna(st[1])

        # qualified mid: a mid-event whose own prior base is within gap
        q_mid = (
            (pdf["event_type"] == mid_t)
            & pv_ts.notna()
            & (pdf["_ts_us"] - pv_ts <= gap_us)
        ).fillna(False).astype(bool)

        # pass 2: last strictly-prior QUALIFIED mid, carrying its base refs
        pc_id, have_c = prior(q_mid, ids)
        pc_ts, _ = prior(q_mid, tss)
        pcv_id, _ = prior(q_mid, pv_id.to_numpy())
        pcv_ts, _ = prior(q_mid, pv_ts.to_numpy())
        if st[3] is not None:
            pc_id = pc_id.mask(~have_c, st[2])
            pc_ts = pc_ts.fillna(st[3])
            pcv_id = pcv_id.mask(~have_c, st[4])
            pcv_ts = pcv_ts.fillna(st[5])

        hit = (
            (pdf["event_type"] == fin_t)
            & pc_ts.notna()
            & (pdf["_ts_us"] - pc_ts <= gap_us)
        ).fillna(False).astype(bool)

        def opt(v):
            return None if pd.isna(v) else int(v)

        # roll state forward: last base; last qualified mid (+ its base)
        new = list(st)
        if is_base.any():
            i = is_base[is_base].index[-1]
            new[0], new[1] = opt(pdf["event_id"].iloc[i]), int(pdf["_ts_us"].iloc[i])
        if q_mid.any():
            j = q_mid[q_mid].index[-1]
            new[2], new[3] = opt(pdf["event_id"].iloc[j]), int(pdf["_ts_us"].iloc[j])
            new[4], new[5] = opt(pv_id.iloc[j]), int(pv_ts.iloc[j])
        if any(x is not None for x in new):
            state.update(tuple(new))

        if hit.any():
            m = pdf[hit]
            yield pd.DataFrame(
                {
                    # nullable Int64 — NULL grouping key, see _fold_pattern
                    "user_id": m["user_id"].astype("Int64"),
                    "view_event_id": pcv_id[hit],
                    "click_event_id": pc_id[hit],
                    "purchase_event_id": m["event_id"].astype("Int64"),
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
    gap_us = duration_us(gap)
    # 2 files/trigger — same rationale as pattern_matches_stream
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events", order_col="ts"))
        # NULL event-time contract — see pattern_matches_stream
        .filter(F.col("ts").isNotNull())
        # column pruning through the opaque state boundary — see
        # pattern_matches_stream (the fold reads only these four)
        .select("event_id", "ts", "user_id", "event_type")
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
    # NULL event-time contract — mirror of the streaming side's drop
    events = events.filter(F.col("ts").isNotNull())
    base_t, mid_t, fin_t = stages
    w = (
        Window.partitionBy("user_id")
        # asc_nulls_last + struct carry — see pattern_match_batch
        .orderBy(F.col("ts"), F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def lastq(col, cond):
        return F.last(F.when(cond, col), ignorenulls=True).over(w)

    is_base = F.col("event_type") == base_t
    v = lastq(F.struct(F.col("ts"), F.col("event_id")), is_base)
    s1 = events.select(
        "user_id", "event_id", "ts", "event_type",
        v["ts"].alias("v_ts"), v["event_id"].alias("v_id"),
    )
    gap_i = F.expr(f"INTERVAL {gap}")
    q_mid = (
        (F.col("event_type") == mid_t)
        & F.col("v_ts").isNotNull()
        & (F.col("ts") <= F.col("v_ts") + gap_i)
    )
    c = lastq(
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.col("v_ts"), F.col("v_id"),
        ),
        q_mid,
    )
    s2 = s1.select(
        "user_id", "event_id", "ts", "event_type",
        c["ts"].alias("c_ts"),
        c["event_id"].alias("c_id"),
        c["v_ts"].alias("cv_ts"),
        c["v_id"].alias("cv_id"),
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
            # NTZ-safe, like pattern_match_batch's lag_seconds (r10 review)
            (
                ntz_epoch_seconds("ts") - ntz_epoch_seconds("cv_ts")
            ).cast("long").alias("total_lag_seconds"),
        )
    )
