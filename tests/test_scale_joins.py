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
        # ShuffleExchangeExec renders as 'Exchange hashpartitioning(...)'
        # in plan strings (never the literal 'ShuffleExchange')
        assert "Exchange hashpartitioning" not in plan, (
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


# ---- LSH-tier plan properties (VERDICT r3 item 8) -------------------------
#
# The O(n·bands) claim of the approximate dedup/similarity tiers rests on the
# candidate generation being a bucketed EQUI-join. A regression to a
# cartesian/BNLJ plan would still return correct rows at test scale while
# being quadratic at 100 TB — so the plan SHAPE is asserted, not just values.

_FORBIDDEN_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_equi_join_plan(df, what: str) -> None:
    plan = _executed_plan(df)
    for node in _FORBIDDEN_NODES:
        assert node not in plan, f"{what} degraded to {node}:\n{plan}"


def _planted_docs(spark):
    """200 distinct filler docs + a 3-doc near-dup cluster + 30 byte-identical
    boilerplate docs (the degenerate skewed bucket)."""
    filler = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(200)
    ]
    cluster = [
        (1000, "the quick brown fox jumps over the lazy dog near the river"),
        (1001, "the quick brown fox jumps over the lazy dog near the creek"),
        (1002, "the quick brown fox jumps over the lazy dog near the shore"),
    ]
    boiler = [(2000 + i, "subscribe to our newsletter now") for i in range(30)]
    return spark.createDataFrame(
        filler + cluster + boiler, "doc_id long, text string"
    )


def test_minhash_lsh_plan_and_skew_guard(spark):
    from fs2_kafka_streams_spark.operators.dedup import minhash_lsh_pairs

    docs = _planted_docs(spark)

    uncapped = minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    _assert_equi_join_plan(uncapped, "minhash_lsh_pairs")
    pairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    # the planted near-dup cluster is found; filler does not pair
    assert {(1000, 1001), (1000, 1002), (1001, 1002)} <= pairs
    assert all(a >= 1000 for a, _ in pairs), "filler docs must not pair"
    # the degenerate boilerplate bucket contributes its full quadratic
    # pair set when uncapped ...
    boiler_pairs = {p for p in pairs if p[0] >= 2000}
    assert len(boiler_pairs) == 30 * 29 // 2

    # ... and is dropped by max_bucket_size (every band bucket of the
    # identical docs has 30 members > cap), while the true cluster —
    # whose buckets are small — keeps its pairs: recall degrades
    # gracefully, the O(f²) blowup is bounded.
    capped = minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_bucket_size=10
    )
    _assert_equi_join_plan(capped, "minhash_lsh_pairs(max_bucket_size)")
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert {(1000, 1001), (1000, 1002), (1001, 1002)} <= capped_pairs
    assert not {p for p in capped_pairs if p[0] >= 2000}


def test_embedding_lsh_plan_shape(spark):
    from fs2_kafka_streams_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    base = [float(i % 7) - 3.0 for i in range(64)]
    rows = []
    for i in range(120):
        v = [x + 0.001 * ((i * 31 + j) % 11) for j, x in enumerate(base)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs_lsh(emb, threshold=0.99)
    _assert_equi_join_plan(out, "embedding_neardup_pairs_lsh")
    # candidate generation is banded: the verified output is a subset of
    # all pairs and non-empty on this near-identical corpus
    n_pairs = out.count()
    assert 0 < n_pairs <= 120 * 119 // 2
