"""Connected components + keep-best dedup over near-dup pair sets.

Cross-checked against a pure-Python union-find on the same edges, including
transitive chains (the case pair-at-a-time dropping gets wrong), plus the
end-to-end pairs → clusters → keep-best flow on the fixture corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _union_find(edges, ids):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min label per component
    comp = {}
    for i in ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _cc(spark, edges):
    from fs2_kafka_streams_spark.operators.clusters import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }


def test_cc_matches_union_find_random_graph(spark):
    import random

    rng = random.Random(42)
    ids = list(range(60))
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(edges, sorted({x for e in edges for x in e}))
    got = _cc(spark, edges)
    assert got == want


def test_cc_transitive_chain(spark):
    # A-B, B-C, C-D: one component labeled by the min — the case where
    # "drop the right id of each pair" would over/under-delete
    got = _cc(spark, [(4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_long_chain_converges(spark):
    # path graph of 33 nodes: diameter 32 ≫ the handful of rounds pointer
    # jumping needs
    edges = [(i, i + 1) for i in range(32)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 33


def test_cc_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert got == {
        1: 1, 2: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_dedup_keep_best_quality_policy(spark):
    from fs2_kafka_streams_spark.operators.clusters import dedup_keep_best

    corpus = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.5),  # cluster {1,2,3}: keep 2
            (4, 0.1),                       # isolated: kept
            (5, 0.7), (6, 0.7),             # cluster {5,6}: tie -> min id 5
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_best(
            corpus, pairs, "doc_id", quality_col="quality"
        ).collect()
    )
    assert kept == [2, 4, 5]


def test_dedup_keep_best_end_to_end_fixture(spark):
    """pairs → clusters → keep-best over the real fixture corpus: survivors
    contain no near-dup pair, and every dropped doc has a surviving
    cluster-mate."""
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.operators.clusters import (
        connected_components,
        dedup_keep_best,
    )
    from fs2_kafka_streams_spark.operators.dedup import ngram_jaccard_pairs

    docs = Catalog(spark, SF_SMOKE).documents
    # localCheckpoint, not persist: the session outlives this test and an
    # un-unpersisted cache block would occupy executor storage for the
    # rest of the whole pytest run
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.4
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    if pairs.count() == 0:
        pytest.skip("fixture produced no near-dup pairs at this threshold")

    kept = dedup_keep_best(docs, pairs, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}

    # no surviving near-dup pair
    for r in pairs.collect():
        assert not (r["id_a"] in kept_ids and r["id_b"] in kept_ids), r
    # exactly one survivor per component, isolated docs all kept
    comp = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    clustered = set(comp)
    assert all_ids - clustered <= kept_ids  # isolated docs kept
    by_comp = {}
    for i, c in comp.items():
        by_comp.setdefault(c, set()).add(i)
    for members in by_comp.values():
        assert len(members & kept_ids) == 1  # one representative each
