"""Relational query surface (SURVEY §2 Part B, Q01–Q32).

Pure DataFrame/SQL — every operator compiles to Catalyst built-ins: predicate
pushdown, column pruning, join selection (broadcast vs sort-merge), and AQE
come for free. No RDDs, no Python row loops.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.canonical import davg, dsum, sql_davg, sql_dsum
from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from fs2_kafka_streams_spark.queries import query


@query(
    "q17_latest_by_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("core", "agg"),
)
def q17_latest_by_key(spark, sf_dir):
    """Latest event per user — the reference's table materialization (A7).

    Reference: fold-changelog-into-map, last write wins
    (``streams/Tables.scala:46-70``, ``streams/Table.scala:52-56``); "last" =
    highest (ts, event_id). One hash aggregation via ``max_by`` — shuffle
    volume O(distinct users), not O(events).
    """
    events = Catalog(spark, sf_dir).events
    return latest_by_key(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_id", "ts", "event_type", "value", "props"],
    )
