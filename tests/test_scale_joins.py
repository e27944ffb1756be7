"""Scale-path join strategies: bucketed co-located joins must be
shuffle-free, salted joins must preserve join semantics under skew."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_eliminates_shuffle(spark):
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.operators.joins import (
        bucketed_join,
        write_bucketed,
    )

    cat = Catalog(spark, SF_SMOKE)
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"orders_b_{suffix}", f"cust_b_{suffix}"
    write_bucketed(
        cat.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        lt, ["o_custkey"], n_buckets=8,
    )
    write_bucketed(
        cat.customer.select(
            F.col("c_custkey").alias("o_custkey"), "c_name"
        ),
        rt, ["o_custkey"], n_buckets=8,
    )
    try:
        # disable broadcast so the planner must pick sort-merge — the case
        # bucketing exists for (at 100 TB neither fact side broadcasts)
        from fs2_kafka_streams_spark.streaming.conf import pinned_conf

        with pinned_conf(
            spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        ):
            joined = bucketed_join(spark, lt, rt, on=["o_custkey"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "SortMergeJoin" in plan

        # same result as the plain (shuffling) join
        plain = cat.orders.select("o_orderkey", "o_custkey", "o_totalprice").join(
            cat.customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_name"
            ),
            on=["o_custkey"],
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_semantics(spark, how):
    """Salted join == plain join, including duplicate keys on the small
    side staying duplicated and (for left) misses staying NULL."""
    from fs2_kafka_streams_spark.operators.joins import salted_join

    # skewed big side: one hot key with most rows
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, 7).otherwise(F.col("id") % 13).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(7, "hot"), (3, "cold"), (3, "cold2")], "k long, label string"
    )
    expected = sorted(map(tuple, big.join(small, "k", how).collect()))
    got = sorted(map(tuple, salted_join(big, small, "k", salt=4, how=how).collect()))
    assert got == expected


def test_salted_join_hot_key_count(spark):
    """An all-hot-key big side joins completely (no rows lost to salting)."""
    from fs2_kafka_streams_spark.operators.joins import salted_join

    big = spark.range(0, 1000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    small = spark.createDataFrame([(7, "x")], "k long, v string")
    out = salted_join(big, small, "k", salt=8)
    assert out.count() == 1000
