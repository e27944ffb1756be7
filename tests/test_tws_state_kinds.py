"""Exercise ALL transformWithStateInPandas state kinds through the
protobuf shim (A22 depth, reference typed bindings ``streams/Key.scala:3-17``,
``streams/Table.scala:115-137``).

q38b covers the ValueState get/update/exists cycle; this suite drives the
REST of the state-server wire protocol end-to-end against the JVM:

- ListState: appendValue / appendList / listStateGet (paginated
  ``StateResponseWithListGet`` with ``requireNextFetch``) / clear;
- MapState: updateValue / getValue / containsKey / iterator / keys /
  removeKey (``StateResponseWithMapKeysOrValues`` /
  ``StateResponseWithMapIterator`` + ``KeyAndValuePair``);
- timers: registerTimer / listTimers / handleExpiredTimer
  (``TimerStateCallCommand``, ``StateResponseWithTimer``, processing-time
  ``TimerValueRequest``).

Each processor's output is checked against an exact batch formulation, so
a mis-encoded request or mis-parsed response surfaces as a wrong answer,
not just a crash.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.streaming import stateful
from fs2_kafka_streams_spark.streaming.replay import replay_dir
from fs2_kafka_streams_spark.streaming.stateful import EVENTS_SCHEMA
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.skipif(
    not stateful.HAS_TWS, reason="transformWithStateInPandas gate closed"
)


def _run_tws(spark, processor, output_schema, time_mode="None", stop_when=None):
    """Drive the TWS stream to completion.

    ``stop_when(table_df) -> bool``: required for ``ProcessingTime`` mode —
    transformWithStateInPandas with availableNow + ProcessingTime keeps
    scheduling empty timer-check batches indefinitely (observed: 280+
    stages after all timers fired and were auto-removed), so the query
    never terminates on its own; the test polls its output condition and
    stops the query explicitly."""
    import tempfile
    import time

    from fs2_kafka_streams_spark.streaming.conf import (
        STREAM_STATE_PARTITIONS,
        pinned_conf,
    )

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(replay_dir(SF_SMOKE, "events"))
    )
    updates = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=output_schema,
        outputMode="Update",
        timeMode=time_mode,
    )
    name = f"tws_{id(processor)}"
    with pinned_conf(
        spark,
        {
            "spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS,
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
        },
    ):
        ckpt = tempfile.mkdtemp(prefix="tws_kinds_")
        try:
            q = (
                updates.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if stop_when is None:
                q.awaitTermination()
            else:
                deadline = time.time() + 120
                while time.time() < deadline:
                    if q.awaitTermination(2):
                        break
                    if stop_when(spark.table(name)):
                        break
                q.stop()
                q.awaitTermination()
        finally:
            # per-run RocksDB tree; nothing resumes from it
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def test_list_state_accumulates_across_batches(spark):
    """ListState as a per-key event-id log: appendValue per batch, full
    listStateGet at every trigger — the LAST emitted row per key must hold
    ALL of the key's event ids (paginated list reads included)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class IdLog(StatefulProcessor):
        def init(self, handle):
            self._log = handle.getListState("ids", "event_id long")

        def handleInputRows(self, key, rows, timerValues):
            batch_ids = []
            for pdf in rows:
                if not pdf.empty:
                    batch_ids.extend(int(x) for x in pdf["event_id"])
            # appendList for the batch (one wire call, repeated-bytes path)
            if batch_ids:
                self._log.appendList([(i,) for i in batch_ids])
            all_ids = sorted(int(r[0]) for r in self._log.get())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_ids": [len(all_ids)],
                    "sum_ids": [sum(all_ids)],
                }
            )

        def close(self):
            pass

    out = _run_tws(spark, IdLog(), "user_id long, n_ids long, sum_ids long")
    # last emission per key (largest n_ids) == full batch aggregate
    final = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_ids", "sum_ids")).alias("s"))
        .select("user_id", "s.n_ids", "s.sum_ids")
    )
    from fs2_kafka_streams_spark.catalog import Catalog

    batch = (
        Catalog(spark, SF_SMOKE)
        .events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.sum("event_id").alias("sum_ids"),
        )
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_map_state_counts_event_types(spark):
    """MapState as per-key {event_type: count}: containsKey/getValue/
    updateValue per row, iterator() for the emission — exercises the map
    wire calls incl. KeyAndValuePair parsing."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class TypeCounts(StatefulProcessor):
        def init(self, handle):
            self._m = handle.getMapState("counts", "t string", "n long")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                if pdf.empty:
                    continue
                for t, c in pdf["event_type"].value_counts().items():
                    prev = (
                        int(self._m.getValue((t,))[0])
                        if self._m.containsKey((t,))
                        else 0
                    )
                    self._m.updateValue((t,), (prev + int(c),))
            items = {k[0]: int(v[0]) for k, v in self._m.iterator()}
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(items),
                    "event_type": list(items),
                    "n": list(items.values()),
                }
            )

        def close(self):
            pass

    out = _run_tws(
        spark, TypeCounts(), "user_id long, event_type string, n long"
    )
    final = (
        out.groupBy("user_id", "event_type").agg(F.max("n").alias("n"))
    )
    from fs2_kafka_streams_spark.catalog import Catalog

    batch = (
        Catalog(spark, SF_SMOKE)
        .events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_timers_register_delete_list_and_fire(spark):
    """Processing-time timers through the shim: registerTimer /
    deleteTimer / listTimers in handleInputRows, emission from
    handleExpiredTimer — exercises TimerStateCallCommand,
    StateResponseWithTimer, and the processing-time TimerValueRequest.

    Semantics pinned by an instrumented run: a fired timer is auto-removed
    AFTER handleExpiredTimer returns (listTimers inside the callback still
    shows it; calling deleteTimer there warns and can leave the query
    spinning), so registration is guarded by a ValueState flag, not by
    listTimers. The delete path is proven end-to-end by registering TWO
    already-expired timers per key and deleting one before the batch ends
    — exactly one fire per key means the delete took effect."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        TimerValues,
    )

    class FireOnce(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._seen = handle.getValueState("seen", "n long")
            self._reg = handle.getValueState("reg", "r long")

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = int(self._seen.get()[0]) if self._seen.exists() else 0
            self._seen.update((prev + n,))
            if not self._reg.exists():
                now = timerValues.getCurrentProcessingTimeInMs()
                self._handle.registerTimer(now - 2)
                self._handle.registerTimer(now - 1)
                self._handle.deleteTimer(now - 1)  # must prevent 2nd fire
                self._reg.update((1,))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # pre-removal view: the fired timer is still listed (wire path
            # for ListTimers / StateResponseWithTimer)
            pending = list(self._handle.listTimers())
            n = int(self._seen.get()[0]) if self._seen.exists() else 0
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_at_fire": [n],
                    "fired_ts": [expiredTimerInfo.getExpiryTimeInMs()],
                    "n_pending": [len(pending)],
                }
            )

        def close(self):
            pass

    from fs2_kafka_streams_spark.catalog import Catalog

    n_keys = Catalog(spark, SF_SMOKE).events.select("user_id").distinct().count()
    out = _run_tws(
        spark, FireOnce(),
        "user_id long, n_at_fire long, fired_ts long, n_pending long",
        time_mode="ProcessingTime",
        stop_when=lambda t: t.select("user_id").distinct().count() >= n_keys,
    )
    fired = out.collect()
    assert fired, "no timers fired through the shim"

    totals = {
        r.user_id: r.n
        for r in Catalog(spark, SF_SMOKE)
        .events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_key: dict[int, int] = {}
    for r in fired:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
        assert 0 < r.n_at_fire <= totals[r.user_id]
        assert r.n_pending >= 1, "listTimers empty inside the fired callback"
    assert set(per_key) == set(totals), "every key fired"
    assert all(v == 1 for v in per_key.values()), (
        f"deleteTimer did not prevent the second fire: {per_key}"
    )
