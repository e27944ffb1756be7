"""Concurrent streaming queries on one session (round 10).

The reference multiplexes MANY record streams over one client — each
partition stream is an independent fs2 stream consumed concurrently
(``client/RecordStream.scala:71-108``: per-partition queues drained in
parallel; ``src/it/scala/RecordStreamSpec.scala`` runs plain and
partitioned streams side by side). The Spark analogue: several
StreamingQuery instances sharing one SparkSession and scheduler, each
with its own checkpoint, sink, and state store lineage.

What could go wrong that batch-sequential tests never see:
- state-store cross-talk (two stateful queries resolving to the same
  RocksDB lineage would corrupt each other's versions);
- conf capture races (streaming confs are bound at query START — a pin
  leaking between concurrently-started queries);
- scheduler starvation/deadlock under availableNow when several
  micro-batch engines contend for the same local[*] slots.

Each query's result must equal its batch twin exactly — same oracle as
the sequential duality tests, now under contention.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.streaming.conf import (
    STREAM_STATE_PARTITIONS,
    pinned_conf,
)
from tests.conftest import SF_SMOKE


def _multiset(df):
    return sorted(map(tuple, df.collect()))


def _start(stream_df, name, ckpt):
    return (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )


def test_concurrent_heterogeneous_streams(spark, tmp_path):
    """Pattern CEP + 3-stage funnel + streaming dedup started together,
    drained together — each must equal its batch twin."""
    from fs2_kafka_streams_spark.queries.streaming_ext import _events_stream
    from fs2_kafka_streams_spark.streaming.cep import (
        funnel_match_batch,
        funnel_matches_stream,
        pattern_match_batch,
        pattern_matches_stream,
    )

    confs = {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
    with pinned_conf(spark, confs):
        queries = [
            _start(
                pattern_matches_stream(spark, SF_SMOKE),
                "conc_pattern", tmp_path / "ck_p",
            ),
            _start(
                funnel_matches_stream(spark, SF_SMOKE),
                "conc_funnel", tmp_path / "ck_f",
            ),
            _start(
                _events_stream(spark, SF_SMOKE, files_per_trigger=2)
                .select("user_id", "event_type")
                .dropDuplicates(["user_id", "event_type"]),
                "conc_dedup", tmp_path / "ck_d",
            ),
        ]
        # all three run concurrently in the shared scheduler; drain all
        for q in queries:
            q.awaitTermination()

    ev = Catalog(spark, SF_SMOKE).events
    pat = pattern_match_batch(ev)
    assert _multiset(
        spark.table("conc_pattern").select(*pat.columns)
    ) == _multiset(pat)

    fun = funnel_match_batch(ev)
    assert _multiset(
        spark.table("conc_funnel").select(*fun.columns)
    ) == _multiset(fun)

    # dedup twin (q46's own oracle shape): the streaming seen-key set
    # must equal DISTINCT over the batch table
    got_keys = _multiset(spark.table("conc_dedup"))
    want_keys = _multiset(ev.select("user_id", "event_type").distinct())
    assert got_keys == want_keys


def test_concurrent_same_shape_isolated_state(spark, tmp_path):
    """Two instances of the SAME stateful query started together with
    different checkpoints: state must not cross-talk (each query's
    RocksDB lineage is keyed by its own checkpoint/runId). Both must
    independently equal the batch twin — a shared or clobbered state
    store would double-apply updates in one of them."""
    from fs2_kafka_streams_spark.streaming.cep import (
        pattern_match_batch,
        pattern_matches_stream,
    )

    confs = {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
    with pinned_conf(spark, confs):
        qa = _start(
            pattern_matches_stream(spark, SF_SMOKE),
            "conc_twin_a", tmp_path / "ck_a",
        )
        qb = _start(
            pattern_matches_stream(spark, SF_SMOKE),
            "conc_twin_b", tmp_path / "ck_b",
        )
        qa.awaitTermination()
        qb.awaitTermination()

    batch = pattern_match_batch(Catalog(spark, SF_SMOKE).events)
    want = _multiset(batch)
    assert _multiset(spark.table("conc_twin_a").select(*batch.columns)) == want
    assert _multiset(spark.table("conc_twin_b").select(*batch.columns)) == want
