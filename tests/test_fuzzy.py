"""Blocked fuzzy-match join: exactness of the thresholded DP, blocking
recall on planted typos, and the block-size skew guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kafka_streams_spark.operators.fuzzy import fuzzy_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_planted_typos_found_with_exact_distance(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgit"),   # dist 1
        (3, "red zzzzzz"),   # dist 6 — same length, beyond threshold
        (4, "blue widget"),  # different block — missed by design
        (5, "red wdget"),    # dist 1 from #1 (deletion)
    ]
    out = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(_df(spark, rows), "name", "id", max_dist=2).collect()
    }
    assert out[(1, 2)] == 1
    assert out[(1, 5)] == 1
    assert out[(2, 5)] == 2
    assert (1, 4) not in out  # blocking miss, documented trade
    assert (1, 3) not in out  # dist 6 > threshold (banded DP abandons)


def test_threshold_equals_unbounded_levenshtein(spark):
    """Kept pairs from the banded DP must carry the exact distance the
    unbounded levenshtein computes (the oracle replay contract)."""
    rows = [(i, n) for i, n in enumerate(
        ["alpha beam", "alpha bean", "alpha gleam", "alpha beams", "alpha x"]
    )]
    pairs = fuzzy_pairs(_df(spark, rows), "name", "id", max_dist=3)
    # one job for every oracle distance — a per-pair createDataFrame loop
    # scheduled O(pairs) separate Spark jobs
    got = pairs.withColumn(
        "exact", F.levenshtein("name_a", "name_b")
    ).collect()
    assert got, "expected at least one pair"
    for r in got:
        assert r.dist == r.exact <= 3


def test_block_size_guard_drops_degenerate_blocks(spark):
    rows = [(i, f"hot item{i}") for i in range(50)] + [
        (100, "cold brew"), (101, "cold brow")
    ]
    out = fuzzy_pairs(
        _df(spark, rows), "name", "id", max_dist=2, max_block_size=10
    ).collect()
    # the 50-row 'hot' block is dropped whole; the small block survives
    assert {(r.id_a, r.id_b) for r in out} == {(100, 101)}
