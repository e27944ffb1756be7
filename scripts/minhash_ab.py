"""A/B the minhash shingle-materialization variants at 100× corpus scale
(VERDICT r6 #3). Interleaved reps (A B A B ...) so host drift over the run
cancels instead of biasing one variant; pair counts must be identical
across variants (same corpus, same seed, same plan modulo storage).

``--breakdown`` additionally times the shingle build and the signature
aggregation in isolation (the two stages the storage choice can affect);
the full pipeline rebuilds its own shingles, so the remaining
candidates+verify cost is NOT derivable by subtraction — the breakdown
bounds where the wall time lives, it does not partition it exactly. It
runs AFTER the A/B and is followed by an explicit cache clear, so its
retained blocks never sit in executor memory during the timed reps.

Usage::

    python scripts/minhash_ab.py [--scale 100] [--reps 3] [--out /tmp/scale_corpus]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_run import BASE_DOCS, gen_documents  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/scale_corpus")
    ap.add_argument(
        "--breakdown", action="store_true",
        help="also time the pipeline stage by stage (checkpoint variant)",
    )
    args = ap.parse_args()

    from fs2_kafka_streams_spark.operators.dedup import (
        _doc_shingles,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="minhash_ab")
    n_docs = BASE_DOCS * args.scale
    dpath = os.path.join(args.out, f"docs_{n_docs}.parquet")
    os.makedirs(args.out, exist_ok=True)
    gen_documents(dpath, n_docs)
    docs = spark.read.parquet(dpath)

    variants = ("checkpoint", "disk_persist")
    results: dict[str, list[float]] = {v: [] for v in variants}
    counts: dict[str, set[int]] = {v: set() for v in variants}
    for rep in range(args.reps):
        for v in variants:
            t0 = time.time()
            pairs = minhash_lsh_pairs(
                docs, "text", "doc_id", max_bucket_size=256,
                shingle_storage=v,
            )
            n = pairs.count()
            dt = time.time() - t0
            # the caller-owned unpersist the disk_persist contract requires
            spark.catalog.clearCache()
            results[v].append(round(dt, 1))
            counts[v].add(n)
            print(
                "AB_ROW",
                json.dumps({"variant": v, "rep": rep, "s": round(dt, 1), "pairs": n}),
                flush=True,
            )

    print("\nvariant | runs (s) | median | pairs")
    for v in variants:
        runs = results[v]
        med = sorted(runs)[len(runs) // 2]
        print(f"{v} | {runs} | {med} | {sorted(counts[v])}")
    assert counts["checkpoint"] == counts["disk_persist"], (
        "variants disagree on pair count — storage must not change results"
    )

    if args.breakdown:
        # after the A/B so the retained blocks can't bias the timed reps
        t0 = time.time()
        sh = _doc_shingles(docs, "text", "doc_id", 3).localCheckpoint(
            eager=True
        )
        t_sh = time.time() - t0
        t0 = time.time()
        sig = minhash_signatures(docs, "text", "doc_id", shingle_df=sh)
        sig.write.format("noop").mode("overwrite").save()
        t_sig = time.time() - t0
        print(
            "BREAKDOWN",
            json.dumps(
                {"shingle_build_s": round(t_sh, 1), "signatures_s": round(t_sig, 1)}
            ),
            flush=True,
        )
        del sh, sig
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
