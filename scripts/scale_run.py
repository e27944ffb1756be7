"""Empirical scale evidence for the heavy dedup/ANN operators.

The plan guards (tests/test_plan_properties.py, tests/test_scale_joins.py)
prove the SHAPES are bucketed equi-joins; this script measures the actual
scaling BEHAVIOR on synthetic corpora generated at multiple sizes from the
same seeded distribution:

- ``minhash_lsh_pairs``: verified near-dup pair count must grow ~linearly
  (planted duplicate structure is linear in corpus size; an all-pairs
  blowup would grow quadratically);
- ``connected_components``: propagation round count must stay FLAT
  (O(log diameter), independent of corpus size);
- ``embedding_neardup_pairs_lsh``: candidate/verified pair counts grow
  ~linearly under banded hyperplane LSH;
- ``boilerplate_report``: wall time ~linear (one DF aggregation, no
  pair join).

Usage::

    python scripts/scale_run.py [--scales 1,10] [--out /tmp/scale_corpus]

Results print as a markdown table to paste into SCALE.md. Generation is
seeded and deterministic; corpora are cached under --out per (kind, n).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5_000       # = sf0.1 documents rows
BASE_VECS = 2_000       # = sf0.1 embeddings rows
VOCAB = 2_000
DIM = 64
NEAR_DUP_FRAC = 0.15    # planted near-duplicate fraction (linear structure)
N_CLUSTERS = 50


def gen_documents(path: str, n: int, seed: int = 7) -> None:
    """Seeded synthetic corpus: Zipf-ish vocabulary (shingles repeat across
    documents like real text) + NEAR_DUP_FRAC planted near-duplicates
    (~5% token mutations of an original doc). Vectorized — one token draw
    for all originals, one for all mutations — so 100× corpora generate in
    seconds, not minutes."""
    if os.path.exists(path):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    probs = 1.0 / np.arange(1, VOCAB + 1) ** 0.9
    probs /= probs.sum()
    words = np.array([f"w{i:04d}" for i in range(VOCAB)])

    is_dup = rng.rand(n) < NEAR_DUP_FRAC
    is_dup[0] = False
    orig_idx = np.flatnonzero(~is_dup)
    # originals: one big token draw, sliced by per-doc length
    lengths = rng.randint(40, 200, size=len(orig_idx))
    flat = rng.choice(VOCAB, size=int(lengths.sum()), p=probs)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    texts: list[str | None] = [None] * n
    for j, i in enumerate(orig_idx):
        texts[i] = " ".join(words[flat[offsets[j] : offsets[j + 1]]])
    # near-dups: mutate ~5% of a random ORIGINAL's tokens (clusters form
    # when several dups pick the same base)
    dup_idx = np.flatnonzero(is_dup)
    bases = orig_idx[rng.randint(0, len(orig_idx), size=len(dup_idx))]
    mut_flat = rng.choice(VOCAB, size=10 * len(dup_idx) + 1, p=probs)
    mp = 0
    for i, b in zip(dup_idx, bases):
        toks = np.array(texts[b].split(), dtype=object)
        n_mut = max(1, int(0.05 * len(toks)))
        pos = rng.choice(len(toks), size=n_mut, replace=False)
        take = mut_flat[mp : mp + n_mut]
        if len(take) < n_mut:  # refill if the mutation pool ran dry
            mut_flat = rng.choice(VOCAB, size=10 * len(dup_idx) + 1, p=probs)
            mp = 0
            take = mut_flat[:n_mut]
        mp += n_mut
        toks[pos] = words[take]
        texts[i] = " ".join(toks.tolist())
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, path)


def gen_embeddings(path: str, n: int, seed: int = 11) -> None:
    """Clustered unit vectors + NEAR_DUP_FRAC tiny-perturbation near-dups
    of earlier ORIGINAL vectors. Vectorized."""
    if os.path.exists(path):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    centers = rng.randn(N_CLUSTERS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    is_dup = rng.rand(n) < NEAR_DUP_FRAC
    is_dup[0] = False
    vecs = np.empty((n, DIM), dtype=np.float64)
    orig_idx = np.flatnonzero(~is_dup)
    vecs[orig_idx] = (
        centers[rng.randint(0, N_CLUSTERS, size=len(orig_idx))]
        + 0.25 * rng.randn(len(orig_idx), DIM)
    )
    dup_idx = np.flatnonzero(is_dup)
    bases = orig_idx[rng.randint(0, len(orig_idx), size=len(dup_idx))]
    vecs[dup_idx] = vecs[bases] + 0.02 * rng.randn(len(dup_idx), DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10")
    ap.add_argument("--out", default="/tmp/scale_corpus")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    os.makedirs(args.out, exist_ok=True)

    from fs2_kafka_streams_spark.operators import clusters
    from fs2_kafka_streams_spark.operators.clusters import connected_components
    from fs2_kafka_streams_spark.operators.dedup import (
        boilerplate_report,
        minhash_lsh_pairs,
    )
    from fs2_kafka_streams_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark()
    rows = []
    for s in scales:
        n_docs, n_vecs = BASE_DOCS * s, BASE_VECS * s
        dpath = os.path.join(args.out, f"docs_{n_docs}.parquet")
        epath = os.path.join(args.out, f"emb_{n_vecs}.parquet")
        gen_documents(dpath, n_docs)
        gen_embeddings(epath, n_vecs)
        docs = spark.read.parquet(dpath)
        emb = spark.read.parquet(epath)

        t0 = time.time()
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", max_bucket_size=256
        ).persist()
        n_pairs = pairs.count()
        t_lsh = time.time() - t0

        t0 = time.time()
        cc = connected_components(pairs)
        n_comp = cc.select("component").distinct().count()
        t_cc = time.time() - t0
        cc_rounds = clusters.LAST_ROUNDS
        pairs.unpersist()

        t0 = time.time()
        # auto-sized band width + bucket cap — the scale path; fixed 8-bit
        # bands measured 62x slower at 10x rows (see SCALE.md)
        epairs = embedding_neardup_pairs_lsh(
            emb, threshold=0.9, bits_per_band=None, max_bucket_size=1024
        )
        n_epairs = epairs.count()
        t_elsh = time.time() - t0

        t0 = time.time()
        boiler = boilerplate_report(docs, "text", "doc_id")
        n_boiler = boiler.count()
        t_boiler = time.time() - t0

        row = {
            "scale": s,
            "n_docs": n_docs,
            "n_vecs": n_vecs,
            "minhash_pairs": n_pairs,
            "minhash_s": round(t_lsh, 1),
            "cc_components": n_comp,
            "cc_rounds": cc_rounds,
            "cc_s": round(t_cc, 1),
            "emb_pairs": n_epairs,
            "emb_lsh_s": round(t_elsh, 1),
            "boiler_rows": n_boiler,
            "boiler_s": round(t_boiler, 1),
        }
        rows.append(row)
        print("SCALE_ROW", json.dumps(row), flush=True)

    hdr = list(rows[0])
    print("\n| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r[k]) for k in hdr) + " |")

    if len(rows) >= 2:
        a, b = rows[0], rows[-1]
        f = b["scale"] / a["scale"]
        print(
            f"\npair growth ×{b['minhash_pairs']/max(1,a['minhash_pairs']):.1f} "
            f"(corpus ×{f:.0f}; quadratic would be ×{f*f:.0f}); "
            f"cc rounds {a['cc_rounds']} -> {b['cc_rounds']}; "
            f"emb pair growth ×{b['emb_pairs']/max(1,a['emb_pairs']):.1f}"
        )


if __name__ == "__main__":
    main()
