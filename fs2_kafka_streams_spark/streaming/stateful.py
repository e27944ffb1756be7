"""Streaming latest-by-key: the reference's persistent table materialization.

Reference semantics (``streams/Tables.scala:110-138``): consume a keyed
changelog in chunks, upsert latest value per key into a RocksDB-backed
store, expose the materialized view. Here the same contract runs as a
Structured Streaming query: per-key state via ``applyInPandasWithState``
(Arrow-batched), the state store persisting between micro-batches, a
foreachBatch upsert assembling the final view.

At scale this is the right shape: state is partitioned by key across
executors (RocksDB state store — configure
``spark.sql.streaming.stateStore.providerClass``), each micro-batch touches
only the keys present in the batch, and watermarking can bound state if the
key domain churns.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fs2_kafka_streams_spark.streaming.conf import duration_us
from fs2_kafka_streams_spark.streaming.replay import replay_dir

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)
_STATE_SCHEMA = "event_id long, ts_us long, event_type string, value double, props string"
# deletes-variant state carries the tombstone flag: a tombstone is KEPT in
# state (with its (ts, event_id)) rather than removed, so a record OLDER
# than the tombstone arriving in a later micro-batch loses the comparison
# instead of resurrecting the key — Kafka's delete-retention window, and
# exactly the batch MERGE's (ts, event_id)-max semantics.
#
# Retention accounting: the kept marker makes dead-key STATE O(keys-ever-
# seen) until it is reclaimed. compact_upsert_log(retain_tombstones=False)
# GCs the SINK log only — state-store reclamation is the typed-state
# engine's ``tombstone_retention`` (event-time timers clear a tombstone
# once the watermark passes its ts + retention: Kafka's delete.retention.ms,
# with Kafka's own caveat that a record older than the tombstone arriving
# AFTER retention can resurrect the key). The applyInPandasWithState
# engine has no retention hook here; on an unbounded churning key domain
# use the TWS engine with retention, or accept O(keys-ever) state.
_STATE_SCHEMA_DEAD = _STATE_SCHEMA + ", dead boolean"
_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp_ntz, "
    "event_type string, value double, props string"
)


def _pick_latest(pdf: pd.DataFrame, tombstone_col: str | None = None):
    """(ts, event_id)-max row of ONE pandas micro-batch frame as a state
    tuple ``(event_id, ts_us, event_type, value, props[, dead])`` plus the
    winning index — the single fold step every stateful engine here shares
    (four near-identical copies of it had already been drifting).

    NULL-safe on the payload columns: a NULL event_type/props stays None
    (``str()`` would store the literal string ``'None'``, silently
    diverging from the batch fold, which keeps NULL) and a NULL value
    stays None (``float()`` would store NaN). A NULL ts orders SMALLEST —
    the numpy iNaT sentinel is the most-negative int64, which matches the
    batch ``max_by``'s NULLS-FIRST struct ordering — and round-trips back
    out as NaT/NULL. A NULL ``event_id`` is an UNKEYED record (the r10
    NULL-id contract: its id is payload, it participates in every fold)
    that orders SMALLEST among same-ts ties — ``na_position="first"``
    matches the batch struct ordering's NULLS FIRST — and stays None in
    state (r11 NULL-id streaming sweep: ``int(NaN)`` crashed all four
    stateful engines the moment the replay became total on NULL ids).
    """
    # Per-key hot path (r12, guide §4.2): numpy lexsort instead of a
    # throwaway two-column DataFrame sort — this runs once per key per
    # micro-batch (measured 8.8× per call, byte-identical on the
    # randomized NULL/tie sweep in tests/test_fold_vectorized.py).
    import numpy as np

    ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    ids = pdf["event_id"].to_numpy()
    # max by (ts, id), NULLS FIRST on both: NaT is already the
    # most-negative int64; a NaN id must order SMALLEST among ts ties
    # (lexsort places NaN last, so map it to -inf first)
    idkey = np.where(np.isnan(ids), -np.inf, ids) if ids.dtype.kind == "f" else ids
    i = int(np.lexsort((idkey, ts_us))[-1])

    def _opt(v, conv):
        return None if pd.isna(v) else conv(v)

    cand = (
        _opt(ids[i], int),
        int(ts_us[i]),
        _opt(pdf["event_type"].iloc[i], str),
        _opt(pdf["value"].iloc[i], float),
        _opt(pdf["props"].iloc[i], str),
    )
    if tombstone_col is not None:
        cand = cand + (bool(pdf[tombstone_col].iloc[i]),)
    return cand, pdf.index[i]


def _fold_rank(cand) -> tuple:
    """(ts, event_id) ordering key of a state tuple, total on NULL ids:
    a None event_id ranks below every real id at the same ts (the batch
    fold's NULLS-FIRST struct ordering) — a bare ``(ts, id)`` tuple
    comparison raises TypeError on None vs int."""
    return (cand[1], cand[0] is not None, 0 if cand[0] is None else cand[0])


def _latest_update(key, pdf_iter, state: GroupState):
    """Keep the (ts, event_id)-max row per key across micro-batches.

    Last-write-wins upsert exactly as the reference's in-memory table
    (``streams/Table.scala:52-56``): state overwrite, ordered by changelog
    position — here (ts, event_id).
    """
    best = tuple(state.get) if state.exists else None
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        cand, _ = _pick_latest(pdf)
        if best is None or _fold_rank(cand) > _fold_rank(best):
            best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[0]],
                "ts": [pd.to_datetime(best[1], unit="us")],
                "event_type": [best[2]],
                "value": [best[3]],
                "props": [best[4]],
            }
        )


def _latest_update_deletes(tombstone_col: str):
    """Last-write-wins upsert WITH tombstones: if a key's latest change (by
    ``(ts, event_id)``) is a delete marker, a tombstone MARKER — carrying
    the delete's own ``(ts, event_id)`` — is kept in state and a ``_dead``
    row is emitted so the sink drops the key from the materialized view.

    Keeping the marker (instead of ``state.remove()``) makes the fold
    order-insensitive across micro-batches: a record OLDER than the
    tombstone arriving in a LATER micro-batch loses the ``(ts, event_id)``
    comparison and stays dead — identical to the batch MERGE, which keeps
    the (ts, event_id)-max tombstone (``operators/incremental.py``). A
    record NEWER than the tombstone re-inserts the key, as on a compacted
    topic. The kept marker makes dead-key state O(keys-ever-seen) on this
    engine (see the ``_STATE_SCHEMA_DEAD`` retention note — the typed-state
    engine's ``tombstone_retention`` is the state GC;
    :func:`compact_upsert_log` reclaims the SINK log only).

    This drives the API the reference exposes but never itself emits
    (``Table.delete``, ``streams/Table.scala:31``; its ``Tables.scala``
    changelog is upsert-only — SURVEY invariant 6). Duality-tested —
    including the out-of-order late-record case — in
    tests/test_streaming_duality.py::test_streaming_deletes_match_batch_merge.
    """

    def update(key, pdf_iter, state: GroupState):
        best = tuple(state.get) if state.exists else None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            cand, _ = _pick_latest(pdf, tombstone_col)
            if best is None or _fold_rank(cand) > _fold_rank(best):
                best = cand
        if best is not None:
            state.update(best)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_id": [best[0]],
                    "ts": [pd.to_datetime(best[1], unit="us")],
                    "event_type": [best[2]],
                    "value": [best[3]],
                    "props": [best[4]],
                    "_dead": [best[5]],
                }
            )

    return update


try:  # Spark 4.x arbitrary-state API; older clusters fall back to q38.
    # The API's state server speaks protobuf — require it up front so an
    # environment without it degrades to applyInPandasWithState instead of
    # crashing the driver worker. When the real distribution is absent the
    # vendored pure-Python wire-format shim (vendor/protobuf_shim) takes
    # over — PB_MODE records which one is active ("real" | "shim" | "none").
    from fs2_kafka_streams_spark.vendor import ensure_protobuf

    PB_MODE = ensure_protobuf()
    if PB_MODE == "none":
        raise ImportError("google.protobuf unavailable and shim missing")
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class LatestProcessor(StatefulProcessor):
        """StatefulProcessor for ``transformWithStateInPandas``: the same
        last-write-wins upsert as :func:`_latest_update`, on the newer
        arbitrary-state API with a typed ValueState handle — the closest
        Spark analogue of the reference's typed RocksDB table
        (``streams/Table.scala:115-137``, ``Key.scala:3-17``)."""

        def init(self, handle) -> None:
            self._state = handle.getValueState("latest", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            best = tuple(self._state.get()) if self._state.exists() else None
            for pdf in rows:
                if pdf.empty:
                    continue
                cand, _ = _pick_latest(pdf)
                if best is None or _fold_rank(cand) > _fold_rank(best):
                    best = cand
            if best is not None:
                self._state.update(best)
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "event_id": [best[0]],
                        "ts": [pd.to_datetime(best[1], unit="us")],
                        "event_type": [best[2]],
                        "value": [best[3]],
                        "props": [best[4]],
                    }
                )

        def close(self) -> None:
            pass

    class LatestDeletesProcessor(StatefulProcessor):
        """Tombstone-aware twin of :class:`LatestProcessor` on the typed-state
        API: the (ts, event_id)-max change wins; when that change is a delete
        marker the tombstone itself is KEPT in the ValueState (with its
        ordering tuple) so a late older record cannot resurrect the key —
        the same order-insensitive fold as :func:`_latest_update_deletes`,
        duality-tested against it and against the batch MERGE
        (``Table.delete``, ``streams/Table.scala:31``).

        ``retention_us`` (requires event-time mode + a watermark, see
        :func:`latest_by_key_tws_with_deletes`) is Kafka's
        ``delete.retention.ms`` for the STATE STORE: storing a tombstone
        arms a timer at ``tombstone_ts + retention``; when the watermark
        passes it the marker is cleared, reclaiming the dead key's state
        slot — so state is O(live keys + tombstones-within-retention)
        instead of O(keys-ever-seen). Kafka's own caveat applies: a record
        OLDER than the tombstone arriving after retention has expired can
        resurrect the key (the marker that would have out-ordered it is
        gone). Without retention the marker is permanent and the fold is
        order-insensitive forever."""

        def __init__(
            self, tombstone_col: str = "deleted",
            retention_us: int | None = None,
        ):
            self._tombstone_col = tombstone_col
            self._retention_us = retention_us

        def init(self, handle) -> None:
            self._handle = handle
            # retention mode widens the state with tz_off_us (wall→UTC
            # offset captured when the row was stored, for timer-clock
            # conversion — see PatternTimerProcessor); without retention
            # the schema stays the original 6 fields so durable
            # checkpoints written by the pre-retention engine restart
            # unchanged (a widened value schema would fail RocksDB's
            # schema-compatibility check). A checkpoint written while the
            # widening was unconditional must be reopened with
            # ``tombstone_retention`` set (7-field schema) or rebuilt.
            schema = _STATE_SCHEMA_DEAD
            if self._retention_us is not None:
                schema = schema + ", tz_off_us long"
            self._state = handle.getValueState("latest", schema)

        def _expiry_ms(self, ts_us: int, off_us: int) -> int:
            return (ts_us - off_us + self._retention_us) // 1000

        def handleInputRows(self, key, rows, timerValues):
            prev = tuple(self._state.get()) if self._state.exists() else None
            best = prev[:6] if prev is not None else None
            best_frame = None
            for pdf in rows:
                if pdf.empty:
                    continue
                cand, idx = _pick_latest(pdf, self._tombstone_col)
                if best is None or _fold_rank(cand) > _fold_rank(best):
                    best = cand
                    best_frame = (pdf, idx)
            if best is not None:
                # off_us is consumed only in retention mode, where a
                # changed `best` always came from a batch frame (best
                # starts as prev[:6] and moves only via cand), so the
                # branch below always recomputes it before any use
                off_us = 0
                if self._retention_us is not None and best_frame is not None:
                    # _utc_us is the LAST column by construction (appended
                    # by the retention-mode source projection; TWS renames
                    # derived columns positionally) — offset of the stored
                    # row itself, robust across DST-spanning batches
                    pdf, idx = best_frame
                    off_us = int(best[1]) - int(pdf.iloc[:, -1].loc[idx])
                changed = prev is None or best != prev[:6]
                if changed:
                    self._state.update(
                        best + (off_us,)
                        if self._retention_us is not None
                        else best
                    )
                    if self._retention_us is not None:
                        wm = timerValues.getCurrentWatermarkInMs()
                        if prev is not None and prev[5]:
                            old_exp = self._expiry_ms(prev[1], prev[6])
                            if old_exp > wm:
                                self._handle.deleteTimer(old_exp)
                        if best[5]:
                            self._handle.registerTimer(
                                self._expiry_ms(best[1], off_us)
                            )
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "event_id": [best[0]],
                        "ts": [pd.to_datetime(best[1], unit="us")],
                        "event_type": [best[2]],
                        "value": [best[3]],
                        "props": [best[4]],
                        "_dead": [best[5]],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # clear ONLY a tombstone whose retention is genuinely due —
            # a stale timer racing a same-batch re-insert is a no-op
            if self._retention_us is not None and self._state.exists():
                st = tuple(self._state.get())
                if st[5] and self._expiry_ms(st[1], st[6]) <= (
                    expiredTimerInfo.getExpiryTimeInMs()
                ):
                    self._state.clear()
            return iter(())

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pragma: no cover
    HAS_TWS = False
    PB_MODE = "none"
# The gate is asserted against the actual environment (and against the
# driver registry's q38b exposure) in tests/test_kafka_contract.py::
# test_tws_gate_matches_environment — closed gate must fail loudly.


def _tws_prepare(spark: SparkSession) -> dict:
    """Gate + worker setup shared by every transformWithStateInPandas entry:
    raise if the API tier is absent, expose the vendored protobuf shim to
    worker processes when it is the active provider, and return the conf
    pin the API needs (each state variable lives in its own column family,
    which only RocksDBStateStoreProvider supports — a vanilla session's
    HDFS-backed default throws STATE_STORE_MULTIPLE_COLUMN_FAMILIES)."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    if PB_MODE == "shim":
        # Python workers are fresh processes: expose the vendored shim on
        # their module path (worker daemons are keyed by env, so this takes
        # effect without a JVM restart).
        from fs2_kafka_streams_spark.vendor import inject_worker_path

        inject_worker_path(spark)
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    }


def latest_by_key_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A9 on ``transformWithStateInPandas`` — returns the final view
    (must equal batch Q17; cross-checked by the driver oracle as q38b)."""
    conf = _tws_prepare(spark)
    proc = LatestProcessor()

    # 2 files/trigger — cross-batch typed state still exercised (q38's
    # rationale) at half the micro-batch machinery cost
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events"))
    )
    updates = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    from fs2_kafka_streams_spark.streaming.conf import pinned_conf

    with pinned_conf(spark, conf):
        return _run_upsert_sink(spark, updates)


def latest_by_key_tws_with_deletes(
    spark: SparkSession,
    replay_path: str,
    tombstone_col: str = "deleted",
    checkpoint: str | None = None,
    sink_dir: str | None = None,
    tombstone_retention: str | None = None,
) -> DataFrame:
    """:func:`latest_by_key_streaming_with_deletes` on the typed-state API —
    same changelog-with-tombstones contract, same materialized view, driven
    through :class:`LatestDeletesProcessor`. Both state APIs run the same
    duality test against the batch MERGE
    (tests/test_streaming_duality.py).

    ``tombstone_retention`` (e.g. ``"5 minutes"``) enables the state-store
    delete-retention GC: event-time timers clear a tombstone marker once
    the watermark passes ``tombstone_ts + retention`` — Kafka's
    ``delete.retention.ms`` applied to the state slot, bounding state at
    O(live keys + recent tombstones) on a churning key domain. The
    materialized view is unchanged (the sink log keeps the tombstone head
    until :func:`compact_upsert_log` GCs it); only late records older than
    an EXPIRED tombstone can resurrect — Kafka's documented caveat."""
    from pyspark.sql import functions as F

    conf = _tws_prepare(spark)
    schema = EVENTS_SCHEMA + f", {tombstone_col} boolean"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_path)
    )
    retention_us = None
    time_mode = "None"
    if tombstone_retention is not None:
        retention_us = duration_us(tombstone_retention)
        time_mode = "EventTime"
        # watermark rides a session-tz cast column, data stays NTZ;
        # _utc_us LAST so the processor reads it positionally (the q57b
        # technique — see streaming/cep.py::pattern_matches_stream_tws)
        src = (
            src.withColumn("_evt", F.col("ts").cast("timestamp"))
            .withColumn("_utc_us", F.unix_micros(F.col("_evt")))
            .withWatermark("_evt", "0 seconds")
            .select(
                "event_id", "ts", "user_id", "event_type", "value",
                "props", tombstone_col, "_utc_us",
            )
        )
    updates = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=LatestDeletesProcessor(
            tombstone_col, retention_us=retention_us
        ),
        outputStructType=_OUTPUT_SCHEMA + ", _dead boolean",
        outputMode="Update",
        timeMode=time_mode,
    )
    from fs2_kafka_streams_spark.streaming.conf import pinned_conf

    with pinned_conf(spark, conf):
        return _run_upsert_sink(
            spark, updates, checkpoint=checkpoint, sink_dir=sink_dir,
            row_schema=_OUTPUT_SCHEMA + ", _dead boolean", dead_col="_dead",
        )


#: Key-bucket count for the upsert sink's partitioned layout. At 100 TB this
#: becomes O(state partitions) so each bucket's compaction is an independent
#: task; 8 matches the pinned local stream-state partition count.
SINK_BUCKETS = 8


import contextlib  # noqa: E402


@contextlib.contextmanager
def _sink_lock(sink_dir: str, exclusive: bool):
    """Advisory lock fencing the upsert-sink directory swap: triggers take
    it SHARED around their append, compaction takes it EXCLUSIVE around
    read→rewrite→rename — so an append can never land between compaction's
    two renames (where it would write into the doomed ``.old`` directory
    and be deleted, or recreate ``sink_dir`` and break the swap).

    The lock file lives BESIDE the sink directory (the directory itself is
    renamed during the swap). This is a single-host fence — exactly the
    harness's execution model; a multi-driver production deployment runs
    the same rewrite through a transactional table format
    (Delta/Iceberg ``replaceWhere``), as documented on
    :func:`compact_upsert_log`."""
    import fcntl

    lock_path = sink_dir.rstrip("/") + ".lock"
    with open(lock_path, "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def _read_upsert_log(
    spark: SparkSession, sink_dir: str, row_schema: str = _OUTPUT_SCHEMA
) -> DataFrame:
    return spark.read.schema(
        row_schema + ", _epoch long, _bucket int"
    ).parquet(sink_dir)


def _log_head(
    log: DataFrame,
    dead_col: str | None = None,
    order_cols: tuple[str, ...] = ("_epoch", "ts", "event_id"),
) -> DataFrame:
    """Latest row per key from the append log; with ``dead_col``, keys
    whose head is a tombstone drop out — exactly a compacted topic's read
    view (tombstoned keys vanish once the tombstone is the head).

    ``order_cols``: the single-state folds emit MONOTONE rows per key, so
    commit order (``_epoch`` first) is also data order. The SALTED fold's
    per-(key, salt) partials are monotone only within a salt — a later
    epoch may carry an older row from a different salt — so it orders by
    the data itself, ``("ts", "event_id")``, which is what makes the
    log-head aggregation the fold's associative second level.
    """
    from pyspark.sql import functions as F

    from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key

    value_cols = ["event_id", "ts", "event_type", "value", "props"]
    if dead_col is not None:
        value_cols = value_cols + [dead_col]
    head = latest_by_key(
        log,
        key_cols=["user_id"],
        order_cols=list(order_cols),
        value_cols=value_cols,
        # (_epoch, ts, event_id) is unique per key per append; an
        # at-least-once duplicate append ties only against an IDENTICAL
        # row, so dropping the value tie-break stays deterministic. The
        # salted ordering (ts, event_id) ties only when a salt state
        # re-emits its unchanged best row — also identical content.
        unique_order=True,
    )
    if dead_col is not None:
        head = head.filter(~F.col(dead_col)).drop(dead_col)
    return head


def compact_upsert_log(
    spark: SparkSession, sink_dir: str, dead_col: str | None = None,
    retain_tombstones: bool = True,
) -> tuple[int, int]:
    """Kafka-style log compaction for the upsert sink: rewrite the append
    log to exactly one row per key — the (epoch, ts, event_id)-max one,
    keeping its original ``_epoch`` so later appends (higher epochs) still
    order after it. Returns (rows_before, rows_after).

    For a DELETES sink (``latest_by_key_streaming_with_deletes``), pass its
    ``dead_col``: the tombstone flag must survive compaction — compacting
    with the default schema would silently strip it and RESURRECT deleted
    keys. ``retain_tombstones=True`` keeps the tombstone head row (Kafka's
    delete-retention window: replicas that haven't seen the delete yet can
    still learn it); ``False`` is the post-retention garbage collection
    that drops the whole key.

    The reference's table IS a compacted topic (``streams/Tables.scala``);
    this bounds the sink's storage at O(distinct keys) for a long-running
    query, matching broker-side compaction. Each key bucket compacts as an
    independent partitioned task. The swap is directory-rename (atomic on
    a POSIX filesystem) fenced by :func:`_sink_lock`: compaction holds the
    lock EXCLUSIVE for the whole read→rewrite→swap, triggers hold it
    SHARED around their append — so a concurrent trigger can never
    interleave destructively with the swap (race-tested in
    tests/test_streaming_duality.py::test_compaction_concurrent_appends).
    A multi-driver production deployment runs the same rewrite through a
    transactional table format (Delta/Iceberg ``replaceWhere``) instead of
    a host-local lock.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key

    row_schema = _OUTPUT_SCHEMA
    value_cols = ["event_id", "ts", "event_type", "value", "props", "_epoch"]
    if dead_col is not None:
        row_schema = row_schema + f", {dead_col} boolean"
        value_cols = value_cols + [dead_col]
    with _sink_lock(sink_dir, exclusive=True):
        # crash recovery BEFORE reading (under the same exclusive lock the
        # swap holds): a previous compaction that died mid-swap leaves
        # either (a) both '.old' and the new sink — its rmtree never ran;
        # finish the cleanup — or (b) only '.old' — it died between the
        # two renames; roll the log back into place. Without this, case
        # (a) wedges every future compaction on ENOTEMPTY and case (b)
        # silently orphans the whole log.
        old_dir = sink_dir.rstrip("/") + ".old"
        tmp_dir = sink_dir.rstrip("/") + ".compacting"
        if os.path.isdir(old_dir):
            if os.path.isdir(sink_dir):
                shutil.rmtree(old_dir)
            else:
                os.rename(old_dir, sink_dir)
        shutil.rmtree(tmp_dir, ignore_errors=True)  # stale partial output
        log = _read_upsert_log(spark, sink_dir, row_schema)
        rows_before = log.count()
        compacted = latest_by_key(
            log,
            key_cols=["user_id"],
            order_cols=["_epoch", "ts", "event_id"],
            value_cols=value_cols,
            unique_order=True,
        )
        if dead_col is not None and not retain_tombstones:
            compacted = compacted.filter(~F.col(dead_col))
        compacted = compacted.withColumn(
            "_bucket", F.pmod(F.xxhash64("user_id"), F.lit(SINK_BUCKETS))
        )
        # same task-per-bucket co-location as the append path: a compaction
        # whose OUTPUT re-fragments into tasks × buckets files would undo
        # the very thing it runs for
        compacted = compacted.repartition(SINK_BUCKETS, F.col("_bucket"))
        compacted.write.mode("overwrite").partitionBy("_bucket").parquet(tmp_dir)
        os.rename(sink_dir, old_dir)
        os.rename(tmp_dir, sink_dir)
        shutil.rmtree(old_dir)
        rows_after = _read_upsert_log(spark, sink_dir, row_schema).count()
    return rows_before, rows_after


#: tempdirs whose contents a returned lazy DataFrame may still read — they
#: can only be reclaimed when the process ends.
_EXIT_REAP: list[str] = []


def _reap_all() -> None:
    import os

    for d in _EXIT_REAP:
        shutil.rmtree(d, ignore_errors=True)
        with contextlib.suppress(OSError):
            os.remove(d.rstrip("/") + ".lock")  # the sink's flock file


def _reap_at_exit(path: str) -> None:
    if not _EXIT_REAP:
        atexit.register(_reap_all)
    _EXIT_REAP.append(path)


def _run_upsert_sink(
    spark: SparkSession, updates: DataFrame, checkpoint: str | None = None,
    sink_dir: str | None = None, row_schema: str = _OUTPUT_SCHEMA,
    dead_col: str | None = None,
    head_order: tuple[str, ...] = ("_epoch", "ts", "event_id"),
) -> DataFrame:
    """Drive the update stream to completion; materialize the view through a
    KEYED PARQUET UPSERT SINK (the Spark-native analogue of a compacted
    Kafka topic / KV store):

    - each micro-batch APPENDS its update rows — tagged with the commit
      epoch — to a parquet log partitioned by key bucket (a distributed
      executor-side write; nothing flows through the driver);
    - the materialized view is the read-back latest row per key, ordered by
      (epoch, ts, event_id) — one ``max_by`` aggregation, shuffle volume
      O(distinct keys).

    The round-1 version collected every batch into a driver dict — a driver
    bottleneck growing with key cardinality. This shape survives 100×: the
    append log and the compaction read-back are both partitioned work.
    """
    from pyspark.sql import functions as F

    run_id = uuid.uuid4().hex[:8]
    own_ckpt = checkpoint is None
    if own_ckpt:
        checkpoint = tempfile.mkdtemp(prefix=f"ckpt_upsert_{run_id}_")
    if sink_dir is None:
        # The returned DataFrame reads the sink LAZILY, so the directory
        # must outlive this call — clean it at interpreter exit instead
        # (an unmanaged mkdtemp here used to leak one O(events) log per
        # driver-gate/bench/test run).
        sink_dir = tempfile.mkdtemp(prefix=f"sink_upsert_{run_id}_")
        _reap_at_exit(sink_dir)

    # Epoch ids restart at 0 on a FRESH checkpoint; appending a re-run's
    # batches to an EXISTING sink with raw epoch ids would let the prior
    # run's higher-_epoch rows shadow genuinely newer updates in
    # _log_head's (_epoch, ts, event_id) ordering. Offset this run's
    # epochs past everything already in the log. (A crash-resume on the
    # SAME checkpoint recomputes a higher base for the replayed batch —
    # harmless: the replayed rows are identical in content, and either
    # copy is the same head.) The scan holds the shared sink lock so it
    # cannot interleave with compaction's exclusive directory-rename swap.
    # Writers themselves are one-at-a-time per sink (q75's writer flock is
    # the pattern): two runs snapshotting the same base would interleave
    # epochs — same as the pre-base behavior, not a regression, but not
    # supported either.
    import os as _os

    epoch_base = 0
    with _sink_lock(sink_dir, exclusive=False):
        if _os.path.isdir(sink_dir) and any(
            not f.startswith(".") for f in _os.listdir(sink_dir)
        ):
            prev_max = (
                _read_upsert_log(spark, sink_dir, row_schema)
                .agg(F.max("_epoch"))
                .collect()[0][0]
            )
            epoch_base = (prev_max + 1) if prev_max is not None else 0

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        # SHARED lock: appends may run concurrently with each other but
        # never overlap compaction's exclusive directory swap
        with _sink_lock(sink_dir, exclusive=False):
            (
                batch_df.withColumn("_epoch", F.lit(epoch_base + epoch_id))
                .withColumn(
                    "_bucket",
                    F.pmod(F.xxhash64("user_id"), F.lit(SINK_BUCKETS)),
                )
                # co-locate each bucket in one task before the partitioned
                # write: without this, partitionBy fans every input task
                # out across all buckets — tasks × buckets files PER EPOCH
                # (measured: 256 files for a 1,500-row view at sf0.1, 16×
                # the bucket count). At 100 TB that is the classic
                # small-files failure: metadata pressure on the store and
                # O(files) footer reads for every log-head view. One
                # narrow exchange of O(batch) update rows per epoch buys
                # ≤ SINK_BUCKETS files instead.
                .repartition(SINK_BUCKETS, F.col("_bucket"))
                .write.mode("append")
                .partitionBy("_bucket")
                .parquet(sink_dir)
            )

    from fs2_kafka_streams_spark.streaming.conf import (
        STREAM_PERF_CONF,
        pinned_conf,
    )

    try:
        with pinned_conf(spark, STREAM_PERF_CONF):
            q = (
                updates.writeStream.outputMode("update")
                .foreachBatch(upsert)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            from fs2_kafka_streams_spark.streaming.run import record_run

            record_run("upsert_sink", q)
    finally:
        if own_ckpt:
            # availableNow ran to completion (or died): nothing resumes
            # from a throwaway checkpoint — only the sink must outlive us
            shutil.rmtree(checkpoint, ignore_errors=True)

    return _log_head(
        _read_upsert_log(spark, sink_dir, row_schema),
        dead_col=dead_col,
        order_cols=head_order,
    )


def latest_by_key_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str | None = None,
    sink_dir: str | None = None,
) -> DataFrame:
    """Run the changelog→table materialization as a real streaming query and
    return the final materialized view (equals batch Q17 — stream-table
    duality). Pass ``checkpoint`` to keep the state store inspectable
    afterwards via :func:`read_table_state` (A10 interactive reads); pass
    ``sink_dir`` to keep the upsert log for :func:`compact_upsert_log`."""
    # 2 files/trigger: multiple micro-batches (cross-batch state is the
    # semantic under test — latest-by-key is batching-insensitive) at half
    # the per-batch machinery cost
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(sf_dir, "events"))
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _latest_update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_upsert_sink(
        spark, updates, checkpoint=checkpoint, sink_dir=sink_dir
    )


def latest_by_key_streaming_salted(
    spark: SparkSession,
    replay_path: str,
    salt: int = 8,
    hot_keys: list | None = None,
    checkpoint: str | None = None,
    sink_dir: str | None = None,
    files_per_trigger: int = 2,
) -> DataFrame:
    """Hot-key-salted changelog→table materialization: the two-level fold
    SCALE.md "Skew axis" prescribes, as a real operator.

    The single-state fold (:func:`latest_by_key_streaming`) funnels EVERY
    row of a key through one state group per trigger — on a Zipf-tail
    corpus the hot key's group is the whole trigger's critical path (one
    Arrow round-trip carrying 95% of the batch, measured in SCALE.md).
    Here each row scatters to one of ``salt`` sub-groups by a
    DETERMINISTIC row hash (``operators/joins.py::deterministic_salt`` on
    ``(event_id, ts)``; never ``spark_partition_id`` — retry-safe), the
    stateful level folds per ``(user_id, _salt)`` so the hot key's work
    spreads over ``salt`` parallel groups, and the upsert sink's log-head
    aggregation IS the second, tiny merge level: at most ``salt`` partial
    rows per key, merged by ``max_by`` on ``(ts, event_id)`` — the fold
    is associative and commutative, so salted ≡ unsalted ≡ batch
    (equivalence-tested on hot40/hot95 corpora in
    tests/test_salted_fold.py).

    Why the merge lives in the sink and not a second in-query stateful
    operator: Structured Streaming does not compose two update-mode
    stateful operators in one query, and the sink's read-back aggregation
    already runs per view materialization — O(keys·salt) rows, shuffle
    O(keys). The log head orders by the DATA ``(ts, event_id)`` rather
    than commit epoch: per-salt partials are monotone only within their
    salt, so a later epoch may legitimately carry an older row from a
    colder salt (see :func:`_log_head`).

    ``hot_keys`` — SALT ONLY THESE KEYS (the known hot tenants /
    celebrity users; the production pattern, since a changelog's hot keys
    are stable and observable): everything else keeps ``_salt = 0``, so
    the state-group count stays ≈ O(keys) + salt × |hot_keys|. This
    matters, measured: full-row salting multiplies the PER-GROUP Arrow
    round-trip overhead across every cold key each trigger — at 6M
    events / hot95 the full-salt fold was 2.6× SLOWER per trigger (p50
    2.3 s → 5.9 s) than unsalted because 1,500 key groups became 12,000,
    while hot-only salting spreads the one hot group without touching the
    cold 1,499 (numbers in SCALE.md "Skew axis"). ``None`` salts every
    row — only sensible when most keys are hot or the key domain is tiny.
    Pick ``salt`` ≈ the per-executor core count the hot key should fan
    out to.

    ``replay_path``: a directory of parquet changelog files (events
    schema), e.g. from ``streaming/replay.py::replay_dir`` or a test's
    hot-key corpus. Reference anchor: the 4-hot-user fixture shape of
    ``ReadOnlyTableSpec.scala:41-54`` scaled to a skewed domain.
    """
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(replay_path)
    )
    # (event_id, ts) is the changelog position — unique per row, cheap to
    # hash, and NOT the grouping key (salting by a key-correlated value
    # would put the whole hot key back in one sub-group)
    row_salt = F.pmod(F.xxhash64("event_id", "ts"), F.lit(salt)).cast("int")
    if hot_keys is not None:
        from fs2_kafka_streams_spark.operators.joins import (
            hot_key_condition,
        )

        # shared predicate with the batch fold and salted_join (r9): a
        # None entry targets the NULL-key group isin() cannot match
        row_salt = (
            F.when(hot_key_condition("user_id", hot_keys), row_salt)
            .otherwise(F.lit(0))
            .cast("int")
        )
    src = src.withColumn("_salt", row_salt)
    updates = src.groupBy("user_id", "_salt").applyInPandasWithState(
        _latest_update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_upsert_sink(
        spark, updates, checkpoint=checkpoint, sink_dir=sink_dir,
        head_order=("ts", "event_id"),
    )


def latest_by_key_streaming_with_deletes(
    spark: SparkSession,
    replay_path: str,
    tombstone_col: str = "deleted",
    checkpoint: str | None = None,
    sink_dir: str | None = None,
) -> DataFrame:
    """Changelog→table materialization where the changelog carries DELETE
    markers (boolean ``tombstone_col``): a key whose latest change is a
    tombstone drops out of the materialized view, its state holding the
    tombstone marker until compaction GC — the streaming twin of the batch
    MERGE's tombstone branch (``operators/incremental.py``) and the
    reference's ``Table.delete`` (``streams/Table.scala:31``).

    ``replay_path`` is a directory of parquet files in changelog order
    (events schema + the tombstone column), replayed 2 files/trigger so
    delete/re-insert sequences cross micro-batch boundaries.
    """
    schema = EVENTS_SCHEMA + f", {tombstone_col} boolean"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_path)
    )
    updates = src.groupBy("user_id").applyInPandasWithState(
        _latest_update_deletes(tombstone_col),
        outputStructType=_OUTPUT_SCHEMA + ", _dead boolean",
        stateStructType=_STATE_SCHEMA_DEAD,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_upsert_sink(
        spark, updates, checkpoint=checkpoint, sink_dir=sink_dir,
        row_schema=_OUTPUT_SCHEMA + ", _dead boolean", dead_col="_dead",
    )


def read_table_state(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Interactive state read (A10, ``ReadOnlyTable.get``,
    ``streams/Table.scala:11``): read the live RocksDB/HDFS state of the
    latest-by-key query DIRECTLY from its checkpoint via Spark's State Data
    Source — the "get(k) now, without waiting for the sink" path the
    reference exposes on its table handle.

    Returns the same (user_id, event_id, ts, event_type, value, props)
    schema as the materialized view; point lookups / multi-gets are filters
    over it (partition-pruned by the state store layout at scale).
    """
    from pyspark.sql import functions as F

    raw = spark.read.format("statestore").load(checkpoint)
    # applyInPandasWithState persists (key struct, value struct) rows with
    # the user state nested under value.groupState; ts is epoch micros
    # (state schema, _STATE_SCHEMA).
    st = F.col("value.groupState")
    # NTZ via timestampadd on an NTZ epoch literal — timestamp_micros()
    # would build an instant whose NTZ cast shifts by the session TZ
    return raw.select(
        F.col("key.user_id").alias("user_id"),
        st.getField("event_id").alias("event_id"),
        F.expr(
            "timestampadd(MICROSECOND, value.groupState.ts_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts"),
        st.getField("event_type").alias("event_type"),
        st.getField("value").alias("value"),
        st.getField("props").alias("props"),
    )
