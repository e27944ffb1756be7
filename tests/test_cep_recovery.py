"""Crash-recovery for the hardest streaming state shapes (VERDICT r4 item 3).

The reference guarantees replay idempotence: a consumer that dies and
resumes from committed offsets materializes the same table
(``streams/Tables.scala:127-132``). Spark's analogue is checkpoint
recovery; these tests KILL each query mid-replay — a sink that throws
after N batches, i.e. a hard failure after output was written but before
the batch committed — then resume on the same checkpoint and assert the
final result still equals the batch formulation:

- multi-level CEP pattern state (q57 shape),
- 3-stage funnel state (q59 shape),
- LEFT OUTER stream–stream join state + restored watermark (q72 shape).

The foreachBatch sink is idempotent-by-batchId (overwrite ``bid=<n>``) —
the standard exactly-once recipe: the crashed batch legitimately re-runs
on resume (at-least-once delivery to the sink) and the overwrite absorbs
the duplicate, while the STATE the re-run starts from is the committed
version, which is the semantics under test.
"""

from __future__ import annotations

import pytest
from pyspark.errors import StreamingQueryException
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.streaming.conf import (
    STREAM_STATE_PARTITIONS,
    pinned_conf,
)
from tests.conftest import SF_SMOKE


class _InjectedCrash(RuntimeError):
    pass


def _crash_resume_run(spark, build_stream, out, ckpt, crash_after=1):
    """Drive the stream to a mid-replay crash, then resume and drain.

    Returns the read-back union of all batch outputs (bid partition
    dropped). Asserts the crash actually happened mid-replay (the resumed
    run processed at least one further batch)."""
    out, ckpt = str(out), str(ckpt)
    confs = {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
    bids_first: list[int] = []
    bids_second: list[int] = []

    def crash_sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{out}/bid={bid}")
        bids_first.append(bid)
        if len(bids_first) >= crash_after:
            raise _InjectedCrash("injected mid-replay crash")

    def sink(bdf, bid):
        bdf.write.mode("overwrite").parquet(f"{out}/bid={bid}")
        bids_second.append(bid)

    with pinned_conf(spark, confs):
        q = (
            build_stream()
            .writeStream.outputMode("append")
            .foreachBatch(crash_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException):
            q.awaitTermination()

        q2 = (
            build_stream()
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

    assert bids_second, "resume processed no batches — crash was not mid-replay"
    assert max(bids_second) > max(bids_first), "no progress after resume"
    # the crashed batch re-ran under EXACTLY the same id (offset log
    # replay; crash_sink records the bid before raising, and the raise
    # prevents that batch's commit), absorbed by the idempotent overwrite.
    # The old `<= max+1` also accepted the failure mode this pins against:
    # a crashed batch whose offsets committed anyway and was skipped.
    assert min(bids_second) == max(bids_first)
    return (
        spark.read.option("basePath", out).parquet(out).drop("bid")
    )


def _multiset(df):
    return sorted(map(tuple, df.collect()))


def test_pattern_match_recovers_mid_replay(spark, tmp_path):
    from fs2_kafka_streams_spark.streaming.cep import (
        pattern_match_batch,
        pattern_matches_stream,
    )

    got = _crash_resume_run(
        spark,
        lambda: pattern_matches_stream(spark, SF_SMOKE),
        tmp_path / "out", tmp_path / "ck",
    )
    batch = pattern_match_batch(Catalog(spark, SF_SMOKE).events)
    assert _multiset(got.select(*batch.columns)) == _multiset(batch)


def test_funnel_match_recovers_mid_replay(spark, tmp_path):
    from fs2_kafka_streams_spark.streaming.cep import (
        funnel_match_batch,
        funnel_matches_stream,
    )

    got = _crash_resume_run(
        spark,
        lambda: funnel_matches_stream(spark, SF_SMOKE),
        tmp_path / "out", tmp_path / "ck",
    )
    batch = funnel_match_batch(Catalog(spark, SF_SMOKE).events)
    assert _multiset(got.select(*batch.columns)) == _multiset(batch)


def test_outer_join_recovers_mid_replay(spark, tmp_path):
    """The hardest shape: outer-join state whose NULL emission depends on
    the WATERMARK restored from the checkpoint — a resume that lost the
    watermark would emit spurious NULL rows (state flushed too early
    re-matched later) or none at all (sentinel advance forgotten)."""
    from fs2_kafka_streams_spark.queries.streaming_ext import outer_join_stream

    got = _crash_resume_run(
        spark,
        lambda: outer_join_stream(spark, SF_SMOKE),
        tmp_path / "out", tmp_path / "ck",
        crash_after=2,
    ).filter(F.col("user_id") != -1)

    ev = Catalog(spark, SF_SMOKE).events
    a, b = ev.alias("a"), ev.alias("b")
    batch = a.join(
        b,
        on=[
            F.col("a.user_id") == F.col("b.user_id"),
            F.col("a.event_id") < F.col("b.event_id"),
            F.col("b.ts").between(
                F.col("a.ts") - F.expr("INTERVAL 5 MINUTES"),
                F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"),
            ),
        ],
        how="left_outer",
    ).select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    )
    assert _multiset(got.select(*batch.columns)) == _multiset(batch)
