"""The CEP pattern on ``transformWithStateInPandas`` with EVENT-TIME
timers (q57b): the reference's wakeup-timeout discipline
(``client/ConsumerAlgebra.scala:64-77``) realized as timer-driven state
expiry.

Two claims, tested separately because expiry is output-invisible by
design:

- OUTPUT duality — the timer-expiring TWS stream emits exactly the batch
  window formulation (and hence exactly what the timerless
  ``applyInPandasWithState`` engine emits);
- STATE expiry — timers actually fire and clear base state: the
  checkpoint's ``base`` state variable (read via the State Data Source)
  holds strictly fewer keys than ever stored a base, every evicted key's
  expiry lies at or below the final watermark, and every survivor holds
  its key's true last base event.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.streaming import stateful
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.skipif(
    not stateful.HAS_TWS, reason="transformWithStateInPandas gate closed"
)

GAP = "120 minutes"
GAP_US = 120 * 60 * 1_000_000


def test_tws_pattern_equals_batch_and_apws(spark):
    """Three-way duality: TWS-with-timers ≡ batch window formulation ≡
    applyInPandasWithState stream. A premature timer fire (expiring a base
    that still had gap left) would surface here as missing matches."""
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.streaming.cep import (
        pattern_match_batch,
        pattern_match_stream,
        pattern_match_stream_tws,
    )

    tws = sorted(
        map(tuple, pattern_match_stream_tws(spark, SF_SMOKE, gap=GAP).collect())
    )
    batch = sorted(
        map(
            tuple,
            pattern_match_batch(Catalog(spark, SF_SMOKE).events, gap=GAP).collect(),
        )
    )
    apws = sorted(
        map(tuple, pattern_match_stream(spark, SF_SMOKE, gap=GAP).collect())
    )
    assert tws == batch == apws
    assert len(tws) > 0


def test_tws_timers_expire_base_state(spark):
    """Timers fire and DELETE state: after the replay completes, the
    ``base`` state variable holds only bases the watermark has not passed
    (+gap); everything older was evicted by ``handleExpiredTimer``. The
    survivors' values are the keys' true last views — eviction never
    corrupted live state."""
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.streaming.cep import pattern_match_stream_tws

    ckpt = tempfile.mkdtemp(prefix="cep_tws_state_")
    pattern_match_stream_tws(spark, SF_SMOKE, gap=GAP, checkpoint=ckpt).collect()

    state = (
        spark.read.format("statestore")
        .option("stateVarName", "base")
        .load(ckpt)
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.base_event_id").alias("base_event_id"),
            F.col("value.base_ts_us").alias("base_ts_us"),
        )
    )
    survivors = {r.user_id: (r.base_event_id, r.base_ts_us) for r in state.collect()}

    views = (
        Catalog(spark, SF_SMOKE)
        .events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            "event_id",
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
        )
    )
    last_view = {
        r.user_id: (r.event_id, r.ts_us)
        for r in views.groupBy("user_id")
        .agg(F.max(F.struct("ts_us", "event_id")).alias("s"))
        .select("user_id", "s.event_id", "s.ts_us")
        .collect()
    }
    assert last_view, "fixture has no view events"

    # expiry happened: some keys that stored a base no longer hold one
    assert set(survivors) < set(last_view), (
        f"no state was expired: {len(survivors)} survivors of "
        f"{len(last_view)} keys-with-a-base"
    )

    # the watermark visible to timers during the LAST data batch is the max
    # event time of all PRIOR batches; with 2-files/trigger over the 4-file
    # time-ordered replay that is the max ts of files 0-1. Every key whose
    # last view expired before that watermark MUST have been evicted.
    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    import pyarrow.parquet as pq

    rd = replay_dir(SF_SMOKE, "events", order_col="ts")
    # replay files carry timestamp[us] — to_pandas gives datetime64[us],
    # so astype(int64) IS already µs (a former //1000 here turned the
    # watermark into milliseconds and made the loop below vacuous)
    wm1_us = max(
        pq.read_table(f"{rd}/part-{k:04d}.parquet")
        .column("ts")
        .to_pandas()
        .astype("datetime64[us]")
        .astype("int64")
        .max()
        for k in (0, 1)
    )
    for uid, (eid, ts_us) in last_view.items():
        if ts_us + GAP_US < wm1_us:
            assert uid not in survivors, (
                f"key {uid}: base expired at {ts_us + GAP_US} < wm {wm1_us} "
                "but was not evicted"
            )
    # survivors hold the key's true last view (eviction didn't corrupt)
    for uid, (eid, ts_us) in survivors.items():
        assert last_view[uid] == (eid, ts_us)


def test_tombstone_retention_reclaims_state(spark, tmp_path):
    """Kafka's delete.retention.ms on the state store: a tombstoned key's
    marker is cleared by an event-time timer once the watermark passes
    ``tombstone_ts + retention`` — state becomes O(live keys + recent
    tombstones) — while the materialized view still excludes the key (the
    sink log, not the state store, carries the tombstone until sink
    compaction). A live key's state survives untouched."""
    import pandas as pd

    from fs2_kafka_streams_spark.streaming.stateful import (
        latest_by_key_tws_with_deletes,
    )

    def mkrow(eid, ts_min, uid, etype, deleted):
        return {
            "event_id": eid,
            "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=ts_min),
            "user_id": uid,
            "event_type": etype,
            "value": float(eid),
            "props": "{}",
            "deleted": deleted,
        }

    # 2 files/trigger -> 3 triggers. Key 1: insert then tombstone (t=20);
    # key 2 stays live. Later files advance the watermark far past
    # t=20 + 5min retention, so key 1's marker must be reclaimed by the
    # timer while key 2's state survives.
    files = [
        [mkrow(1, 10, 1, "view", False), mkrow(2, 10, 2, "view", False)],
        [mkrow(3, 20, 1, "del", True)],
        [mkrow(4, 60, 2, "click", False)],
        [mkrow(5, 120, 2, "click", False)],
        [mkrow(6, 180, 2, "click", False)],
        [mkrow(7, 240, 2, "click", False)],
    ]
    from tests.conftest import write_replay_files

    # spaced mtimes (shared writer) pin trigger order: this query is
    # WATERMARKED, so a same-ms mtime tie could sort a late file into the
    # first trigger, jump the watermark, and drop the tombstone as late data
    replay = tmp_path / "changelog_retention"
    write_replay_files(replay, [pd.DataFrame(rows) for rows in files])

    ckpt = str(tmp_path / "ckpt_retention")
    view = latest_by_key_tws_with_deletes(
        spark, str(replay), tombstone_col="deleted",
        checkpoint=ckpt, tombstone_retention="5 minutes",
    )
    got = {r["user_id"]: r["event_id"] for r in view.collect()}
    assert got == {2: 7}, got  # key 1 deleted from the view, key 2 live

    state = (
        spark.read.format("statestore")
        .option("stateVarName", "latest")
        .load(ckpt)
        .select(
            F.col("key.user_id").alias("user_id"),
            F.col("value.event_id").alias("event_id"),
            F.col("value.dead").alias("dead"),
        )
    )
    rows = {r.user_id: (r.event_id, r.dead) for r in state.collect()}
    assert 1 not in rows, f"tombstone marker not reclaimed: {rows}"
    assert rows.get(2) == (7, False), rows
