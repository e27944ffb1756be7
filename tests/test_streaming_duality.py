"""Stream-batch duality: streaming queries over the deterministic replay
equal their batch formulations — the reference's table⇄changelog claim
(``streams/Tables.scala``), upgraded to Spark's stronger guarantees."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _replay_stream(spark, ts_type="timestamp"):
    from fs2_kafka_streams_spark.streaming.replay import replay_dir
    from fs2_kafka_streams_spark.streaming.stateful import EVENTS_SCHEMA

    return (
        spark.readStream.schema(EVENTS_SCHEMA.replace("timestamp_ntz", ts_type))
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir(SF_SMOKE, "events"))
    )


def _run_to_memory(df, mode="append"):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_streaming_multiset_roundtrip(spark):
    """The reference's core test idea (``RecordStreamSpec.scala:102``):
    consume everything, compare as a multiset with the source."""
    out = _run_to_memory(_replay_stream(spark).select("event_id", "user_id"))
    from fs2_kafka_streams_spark.catalog import Catalog

    src = Catalog(spark, SF_SMOKE).events.select("event_id", "user_id")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_streaming_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark: unique event_ids pass through, but
    rows behind the watermark are dropped as late (that is the operator's
    contract). The expected survivor set follows the same lag-by-one-batch
    watermark trajectory established for Q36: the filter for bucket k uses
    max(ts over buckets 0..k-2) − delay."""
    stream = _replay_stream(spark).withWatermark("ts", "10 minutes")
    out = _run_to_memory(
        stream.dropDuplicatesWithinWatermark(["event_id"]).select("event_id")
    )
    import duckdb

    expected = duckdb.sql(f"""
      WITH tagged AS (
        SELECT event_id, ts, event_id % 4 AS f
        FROM read_parquet('{SF_SMOKE}/events.parquet')
      ), fmax AS (SELECT f, max(ts) AS mx FROM tagged GROUP BY f),
      wm AS (SELECT f, max(mx) OVER (ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
               - INTERVAL '10 minutes' AS wm_before FROM fmax)
      SELECT count(*) FROM tagged t JOIN wm ON t.f = wm.f
      WHERE wm.wm_before IS NULL OR t.ts >= wm.wm_before
    """).fetchall()[0][0]
    assert out.count() == expected


def test_streaming_complete_agg_equals_batch(spark):
    """Unwatermarked counts in complete mode equal the batch aggregation —
    no rows are ever dropped without a watermark."""
    stream = _replay_stream(spark)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out = {r["event_type"]: r["n"] for r in _run_to_memory(agg, "complete").collect()}

    from fs2_kafka_streams_spark.catalog import Catalog

    batch = {
        r["event_type"]: r["n"]
        for r in Catalog(spark, SF_SMOKE)
        .events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == batch


def test_watermarked_join_equals_unbounded(spark):
    """The watermarked q48 (time-ordered replay, state evicted past the
    watermark) must emit exactly the multiset the unbounded-state variant
    emits — i.e. watermarking loses no on-time matches."""
    from fs2_kafka_streams_spark.queries.streaming_ext import (
        q48_stream_stream_join,
        stream_stream_join_unbounded,
    )

    wm = q48_stream_stream_join(spark, SF_SMOKE)
    ub = stream_stream_join_unbounded(spark, SF_SMOKE)
    key = ["id_a", "id_b", "user_id", "type_a", "type_b"]
    wm_rows = sorted(tuple(r) for r in wm.select(*key).collect())
    ub_rows = sorted(tuple(r) for r in ub.select(*key).collect())
    assert wm_rows == ub_rows and len(wm_rows) > 0
