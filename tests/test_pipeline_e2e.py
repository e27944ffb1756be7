"""End-to-end curation pipeline composition: the operators are built to be
CHAINED (what a real training-data pipeline does), not just pass their
individual oracles. This test runs the full chain as one DataFrame program:

    quality filter → boilerplate gate → near-dup clustering (keep-best) →
    benchmark decontamination → temperature mixture → context chunking →
    train/val/test split → deterministic shuffle → sharded export

and asserts the invariants the composition must preserve: monotone row
containment at every stage, end-to-end determinism across re-execution,
and a sane composed physical plan (no cartesian products — chaining must
not defeat the per-operator plan guarantees).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _pipeline(spark, strict: bool):
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.operators.clusters import dedup_keep_best
    from fs2_kafka_streams_spark.operators.dedup import (
        boilerplate_report,
        decontaminate,
        minhash_lsh_pairs,
    )
    from fs2_kafka_streams_spark.operators.pipeline import (
        chunk_documents,
        hash_split,
        temperature_sample,
    )
    from fs2_kafka_streams_spark.operators.text import gopher_metrics

    docs = Catalog(spark, SF_SMOKE).documents

    # 1. quality gate — the synthetic fixture fails the word-count floor,
    #    so the e2e run uses the permissive sub-flags; `strict` exercises
    #    the full conjunction path (may keep zero docs, still must compose)
    q = gopher_metrics(docs, "text", "doc_id")
    keep_flag = (
        F.col("pass_quality")
        if strict
        else F.col("ok_dup_3gram") & F.col("ok_top_word")
    )
    quality_ids = q.filter(keep_flag).select("doc_id")
    d1 = docs.join(quality_ids, "doc_id", "left_semi")

    # 2. boilerplate gate
    bp = boilerplate_report(d1, "text", "doc_id")
    d2 = d1.join(
        bp.filter(~F.col("boiler_heavy")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 3. near-dup clustering, keep one representative per cluster
    pairs = minhash_lsh_pairs(d2, "text", "doc_id", n=3, threshold=0.5)
    d3 = dedup_keep_best(d2, pairs, "doc_id")

    # 4. decontamination against a planted "benchmark" (first 3 docs —
    #    drawn from the corpus itself, so the overlap is real)
    bench = docs.filter("doc_id < 3").select("doc_id", "text")
    d4 = decontaminate(d3, bench, "text", "doc_id", n=5)

    # 5. temperature mixture across sources
    d5 = temperature_sample(
        d4.withColumn("_tok", F.size(F.split("text", " "))),
        "_tok",
        source_col="source",
        id_col="doc_id",
    ).join(d4, ["doc_id", "source"])

    # 6. chunk → 7. split
    chunks = chunk_documents(d5, "text", "doc_id")
    return hash_split(chunks, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


def test_pipeline_composes_and_contains(spark):
    from fs2_kafka_streams_spark.catalog import Catalog

    out = _pipeline(spark, strict=False)
    rows = out.collect()
    assert len(rows) > 0  # permissive gates keep a real corpus slice
    all_ids = {
        r["doc_id"]
        for r in Catalog(spark, SF_SMOKE).documents.select("doc_id").collect()
    }
    # containment: every surviving chunk belongs to an input document, and
    # every document's chunks carry exactly one split
    by_doc = {}
    for r in rows:
        assert r["doc_id"] in all_ids
        by_doc.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_doc.values())
    # chunk indices per doc are contiguous from 0
    idx = {}
    for r in rows:
        idx.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    for v in idx.values():
        assert sorted(v) == list(range(len(v)))


def test_pipeline_deterministic_end_to_end(spark):
    a = sorted(
        (r["doc_id"], r["chunk_idx"], r["split"])
        for r in _pipeline(spark, strict=False).collect()
    )
    b = sorted(
        (r["doc_id"], r["chunk_idx"], r["split"])
        for r in _pipeline(spark, strict=False).collect()
    )
    assert a == b


def test_pipeline_strict_path_composes(spark):
    """The full-conjunction quality gate may keep zero documents on the
    synthetic fixture — the composition must still plan and execute, and
    every document it DOES keep must actually pass the strict gate (the
    old ``count() >= 0`` could never fail; note the strict output is NOT
    a subset of the permissive output — dedup_keep_best representatives
    depend on the candidate set)."""
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.operators.text import gopher_metrics

    kept = {
        r["doc_id"]
        for r in _pipeline(spark, strict=True)
        .select("doc_id").distinct().collect()
    }
    docs = Catalog(spark, SF_SMOKE).documents
    passing = {
        r["doc_id"]
        for r in gopher_metrics(docs, "text", "doc_id")
        .filter("pass_quality").select("doc_id").collect()
    }
    assert kept <= passing


def test_pipeline_plan_has_no_cartesian(spark):
    import re

    plan = (
        _pipeline(spark, strict=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin IS expected here (the 1-row corpus-count
    # crossJoin, q43h's shape); what must never appear is a SHUFFLED
    # keyless product
    assert not re.search(r"SortMergeJoin.*Cross", plan)
