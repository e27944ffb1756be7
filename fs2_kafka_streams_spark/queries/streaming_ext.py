"""Additional REAL streaming queries (beyond q36/q38): stream–table join
and streaming dedup, both run as genuine Structured Streaming queries over
the deterministic file replay and checked against a batch SQL oracle.

- q45: the reference's stream–table enrichment join (A14,
  ``ReadOnlyTableSpec.scala:71-79``): each stream element looks up the
  table's value for its key; misses stay NULL (``Option[V] = None``). In
  Spark this is a stream–static join — stateless, executed per micro-batch
  with the static side broadcast.
- q46: streaming ``dropDuplicates`` keyed on (user_id, event_type): state
  accumulates the seen-key set across micro-batches (the streaming shape of
  Q37). Output = the distinct key set, so the result is deterministic no
  matter which physical row arrives first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.queries import query
from fs2_kafka_streams_spark.streaming.replay import replay_dir
from fs2_kafka_streams_spark.streaming.run import run_to_memory
from fs2_kafka_streams_spark.streaming.stateful import EVENTS_SCHEMA


def _events_stream(spark, sf_dir):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay_dir(sf_dir, "events"))
    )


@query(
    "q45_stream_table_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_nationkey, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("streaming", "join", "core"),
)
def q45_stream_table_join(spark, sf_dir):
    """Stream–table enrichment join as a real streaming query (A14):
    events stream ⟕ broadcast customer table, append mode."""
    src = _events_stream(spark, sf_dir)
    cust = Catalog(spark, sf_dir).customer.select(
        F.col("c_custkey"), "c_nationkey", "c_mktsegment"
    )
    joined = src.join(
        F.broadcast(cust), src.user_id == cust.c_custkey, "left"
    ).select("event_id", "user_id", "c_nationkey", "c_mktsegment")
    return run_to_memory(spark, joined, "q45_sink")


@query(
    "q46_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def q46_stream_dedup(spark, sf_dir):
    """Streaming dropDuplicates on (user_id, event_type): the seen-key set
    is streaming state carried across micro-batches; emitting only the key
    columns makes first-arrival nondeterminism irrelevant."""
    src = _events_stream(spark, sf_dir)
    deduped = src.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_to_memory(spark, deduped, "q46_sink")
