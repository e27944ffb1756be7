"""Similarity search over embedding columns (array<float>).

Two tiers:

- **Brute-force cosine top-k** — the correctness baseline. Embeddings are
  quantized to integer micro-units in-query (floor(x·1e6) — float→double
  widening is exact, so the quantization is bit-identical in any engine),
  the dot product is then exact bigint arithmetic, and the final cosine is
  a single IEEE division chain: bit-identical cross-engine, hash-checkable
  against DuckDB.
- **Random-hyperplane LSH** — the scale path: b sign-bits of dot products
  with deterministic pseudo-random hyperplanes bucket the vectors; only
  within-bucket (or neighboring-band) pairs are scored. Shuffle volume
  O(n·bands) instead of O(n·q).

Pairwise scoring stays JVM-side (`zip_with`/`aggregate` in codegen, with
per-row quantized vectors + norms precomputed so each pair costs exactly one
dot product). The one Python hop is :func:`band_signatures` — an
Arrow-batched pandas UDF computing all LSH sign-bits as a single numpy
int64 matmul per batch, ~100× cheaper than the same dots as interpreted
higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Corpus-side scans do their heavy per-row work (quantization, signature
# UDFs, cross-join scoring) in the SCAN stage — a coarsely-partitioned
# input (few files, or giant single-row-group parquet) would serialize it
# on a handful of cores. Same guard as the text-dedup pipeline.
from fs2_kafka_streams_spark.operators.util import materialize
from fs2_kafka_streams_spark.operators.util import spread as _spread

QUANT = 1_000_000

#: Embedding element domain bound (|x| <= EMB_BOUND): keeps the quantized
#: micro-unit dot product inside int64 — |q| <= 1e8, so a dim-d dot sums
#: to at most d·1e16, exact in int64 up to d ≈ 900.
EMB_BOUND = 100.0

#: Fixture embedding dimensionality (FIXTURES.md) — the ONE declaration of
#: the well-formed-vector contract's dim. Every consumer (queries/llm.py's
#: batch family, queries/streaming_ext.py's streaming ANN) imports THIS
#: constant (r10 advisory): a hardcoded copy that drifted from the fixture
#: dim would silently filter every vector into an empty corpus instead of
#: failing loudly.
EMB_DIM = 64


def well_formed_vectors(
    col: str | Column, dim: int, bound: float = EMB_BOUND
) -> Column:
    """Predicate: the embedding is usable by the similarity family —
    non-NULL, exactly ``dim`` elements, every element non-NULL with
    ``abs(x) <= bound``.

    The similarity operators REQUIRE this filter on untrusted corpora
    (r10 non-finite-vector sweep): a wrong-dimension vector crashes the
    numpy signature matmul (ragged stack) and silently zero-pads the SQL
    dot product; a NaN/±inf/overflow element poisons the quantized
    int64 dot (ANSI long-overflow / engine-divergent NaN ordering in
    top-k ranks). ``abs(x) <= bound`` is one portable predicate: false
    for NaN on both engines (IEEE), false for ±inf, false for float32
    magnitudes that would overflow the micro-unit int64 dot.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        c.isNotNull()
        & (F.size(c) == F.lit(dim))
        & F.forall(
            c, lambda x: x.isNotNull() & (F.abs(x) <= F.lit(bound))
        )
    )


def sql_well_formed_vectors(
    col: str = "embedding", dim: int = 64, bound: float = EMB_BOUND
) -> str:
    """DuckDB mirror of :func:`well_formed_vectors` (NULL elements flagged
    explicitly: a NULL predicate result would silently pass list_filter)."""
    return (
        f"({col} IS NOT NULL AND len({col}) = {dim}"
        f" AND len(list_filter({col},"
        f" x -> x IS NULL OR NOT (abs(x) <= {bound}))) = 0)"
    )


def quantized(col: Column) -> Column:
    """array<float> → array<bigint> of micro-units (exact cross-engine)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint")
    )


def dot_int(a: Column, b: Column) -> Column:
    """Exact integer dot product (order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: exact ints → one IEEE division chain."""
    qa, qb = quantized(a), quantized(b)
    return cosine_precomputed(qa, qb, dot_int(qa, qa), dot_int(qb, qb))


def cosine_precomputed(qa: Column, qb: Column, na2: Column, nb2: Column) -> Column:
    """Cosine when the quantized vectors and squared norms are already
    columns: one cross dot per pair instead of three (the self-norms are
    computed once per ROW, not once per PAIR — at n rows and O(n²) pairs
    that's the difference between 2n + p and 3p dot products). Bit-identical
    to :func:`cosine`.

    Zero-norm vectors yield NULL, never NaN: Spark orders NaN ABOVE every
    double and ``NaN >= threshold`` is true, so a 0/0 cosine would rank an
    all-zero vector as everyone's nearest neighbor and pass every
    near-dup filter — while the numpy exact tier (``NaN >= t`` → False)
    excludes it. NULL fails filters and sorts last under ``desc()``,
    matching the exact tier: no similarity is defined for a zero vector."""
    return F.when(
        (na2 > 0) & (nb2 > 0),
        dot_int(qa, qb).cast("double")
        / F.sqrt(na2.cast("double"))
        / F.sqrt(nb2.cast("double")),
    )


def with_quantized(
    df: DataFrame, vec_col: str, id_col: str, prefix: str
) -> DataFrame:
    """Project (id, quantized vector, squared norm) — the per-row
    precomputation shared by every pairwise-cosine operator."""
    q = quantized(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}id"), q.alias(f"{prefix}q")
    ).withColumn(f"{prefix}n2", dot_int(F.col(f"{prefix}q"), F.col(f"{prefix}q")))


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Shared rank-filter tail of every ANN tier (brute-force, LSH, IVF):
    the k best-cosine neighbors per query, ties broken by neighbor id.
    NULL cosines (zero-norm vectors — see :func:`cosine_precomputed`) are
    dropped: no similarity is defined, and a tier-shared tail guarantees
    the tiers can never disagree on ordering or NaN handling."""
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.filter(F.col("cos").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> DataFrame:
    """Brute-force top-k neighbors per query vector (broadcast the queries).

    The scan side streams once; per row only k candidates per query survive
    the rank filter. This is the O(n·q) baseline ANN — correct by
    construction, used to validate the LSH tier.

    ``spread=False`` skips the corpus width guard — for callers that
    invoke this per micro-batch over an unchanging corpus (the streaming
    ANN) and have already spread it once, so the probe's driver-side
    RPCs don't repeat per trigger.
    """
    q = with_quantized(queries, vec_col, id_col, "q_")
    e = with_quantized(
        _spread(embeddings) if spread else embeddings, vec_col, id_col, "n_"
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            cosine_precomputed(
                F.col("q_q"), F.col("n_q"), F.col("q_n2"), F.col("n_n2")
            ).alias("cos"),
        )
    )
    return _topk_per_query(scored, k)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact tier): every unordered
    pair with cosine >= threshold — the correctness baseline that
    :func:`embedding_neardup_pairs_lsh` is validated against.

    Execution: DISTRIBUTED blocked matrix multiply — nothing is ever
    materialized on the driver. Rows are hashed into ``num_blocks`` blocks;
    each of the B·(B+1)/2 unordered block pairs becomes one cogroup of a
    cogrouped ``applyInPandas``, which scores left-block × right-block with
    a single BLAS dgemm. Shuffle volume is O(n·B) (each row is replicated
    to the ≤B block pairs it participates in); compute is the inherent
    O(n²) dot products of the exact tier, executed vectorized on the
    executors. Larger corpora should use the O(n·bands) LSH tier — the
    exact tier's wall-clock is quadratic by definition — but memory no
    longer caps it: each task holds only two blocks of ~n/B vectors.

    Exactness: quantized values are ≤1e6, so every product (≤1e12) and
    64-term sum (≤6.4e13) is an integer below 2^53 — float64 accumulation
    is EXACT in any order, bit-identical to the bigint SQL formulation
    (asserted in tests + the q44c oracle).
    """
    import numpy as np
    import pandas as pd

    B = num_blocks

    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("b", F.pmod(F.xxhash64("id"), F.lit(B)).cast("int"))
    # A pair (x, y) meets exactly once: in block-pair (bx, by) with
    # bx <= by, x arriving on the left iff bx is x's block. Left replicates
    # a block-b row to pairs (b, j>=b); right to pairs (i<=b, b).
    left = base.withColumn(
        "bj", F.explode(F.sequence(F.col("b"), F.lit(B - 1)))
    ).withColumnRenamed("b", "bi")
    right = base.withColumn(
        "bi", F.explode(F.sequence(F.lit(0), F.col("b")))
    ).withColumnRenamed("b", "bj")

    def score(key, l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos": "float64"}
        )
        if len(l_pdf) == 0 or len(r_pdf) == 0:
            return out
        l_ids = l_pdf["id"].to_numpy(dtype=np.int64)
        r_ids = r_pdf["id"].to_numpy(dtype=np.int64)
        L = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in l_pdf["vec"]])
            * QUANT
        )
        R = np.floor(
            np.stack([np.asarray(v, dtype=np.float64) for v in r_pdf["vec"]])
            * QUANT
        )
        n2_l = np.einsum("ij,ij->i", L, L)
        n2_r = np.einsum("ij,ij->i", R, R)
        cos = (L @ R.T) / np.sqrt(n2_l)[:, None] / np.sqrt(n2_r)[None, :]
        if key[0] == key[1]:
            # diagonal block: both sides hold the same rows — the strict
            # id order both dedups and drops self-pairs
            mask = (cos >= threshold) & (l_ids[:, None] < r_ids[None, :])
            ii, jj = np.nonzero(mask)
            a, b = l_ids[ii], r_ids[jj]
        else:
            # off-diagonal: each unordered pair appears once; ids may sort
            # either way relative to the blocks, so normalize to (min, max)
            mask = cos >= threshold
            ii, jj = np.nonzero(mask)
            la, rb = l_ids[ii], r_ids[jj]
            a, b = np.minimum(la, rb), np.maximum(la, rb)
        return pd.DataFrame({"id_a": a, "id_b": b, "cos": cos[ii, jj]})

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(score, schema="id_a long, id_b long, cos double")
    )


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_band: int | None = 8,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup, 100 TB path: banded hyperplane LSH.

    Each vector gets `bands` small signatures (``bits_per_band`` sign-bits
    each); candidate pairs share at least one band signature — an equi-join
    per band (shuffle O(n·bands)), never the O(n²) cross join. Candidates
    are then verified with the exact cosine, so precision is 1; recall is
    probabilistic: two vectors at cosine θ collide in one band with prob
    (1 − arccos(θ)/π)^bits, amplified across bands — with 8×16 defaults
    that is ≈0.996 at θ=0.9 (the regime real near-dups live in) but small
    at θ≈0.4.

    Band width must scale with corpus size: each band's expected candidate
    count is ~n²/2^bits, so FIXED 8-bit bands turn superlinear once n
    outgrows ~10⁴ (measured: 10× rows → 62× wall time at n=20k, SCALE.md
    "measured scaling"). Pass ``bits_per_band=None`` to auto-size to
    ⌈log2 n⌉ (clamped to [8, 20]) — buckets ≈ corpus size, so expected
    candidates stay O(n·bands); trade recall back by raising ``bands`` if
    the target regime is below θ≈0.95. The default stays pinned at 8
    because the DuckDB oracle replays the exact 8-bit pipeline.

    ``max_bucket_size`` is the skew guard (same contract as
    ``minhash_lsh_pairs``): real corpora are CLUSTERED, and a dense
    cluster's band bucket emits O(f²) candidates no matter the bit width.
    With a cap, oversized buckets are dropped before the self-join; a true
    near-dup pair still meets in its other bands, so recall decays
    gracefully while the worst-case join stays bounded.

    Candidate-set reduction and recall are asserted against the exact tier
    in the test suite."""
    if bits_per_band is None:
        import math

        n = embeddings.count()
        bits_per_band = max(8, min(20, math.ceil(math.log2(max(n, 2)))))
    embeddings = _spread(embeddings)
    e = embeddings.select(
        F.col(id_col).alias("id"),
        quantized(F.col(vec_col)).alias("q"),
        band_signatures(vec_col, dim, bits_per_band, bands).alias("sigs"),
    ).withColumn("n2", dot_int(F.col("q"), F.col("q")))
    tagged = e.select(
        "id", "q", "n2", F.posexplode("sigs").alias("band", "sig")
    )
    if max_bucket_size is not None:
        ok_buckets = (
            tagged.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") <= max_bucket_size)
            .select("band", "sig")
        )
        tagged = tagged.join(ok_buckets, on=["band", "sig"], how="left_semi")
    # Materialize the tagged table ONCE before the self-join: both sides
    # reference this subtree and Spark re-executes it per side — with the
    # §4.4 filter/project duplication of the signature UDF that adds, the
    # corpus was scanned, quantized and signature-matmul'd four times per
    # call (plan-verified at r11: 4 ArrowEvalPython nodes, 2 scans).
    tagged = materialize(tagged)
    cand = (
        tagged.alias("a")
        .join(
            tagged.alias("b"),
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.sig") == F.col("b.sig"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.q").alias("qa"),
            F.col("b.q").alias("qb"),
            F.col("a.n2").alias("na2"),
            F.col("b.n2").alias("nb2"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        cosine_precomputed(
            F.col("qa"), F.col("qb"), F.col("na2"), F.col("nb2")
        ).alias("cos"),
    ).filter(F.col("cos") >= threshold)


def _hyperplanes(dim: int, bits: int) -> list[list[int]]:
    """Deterministic ±1 pseudo-random hyperplanes (seeded LCG)."""
    planes, x = [], 0x2545F4914F6CDD1D
    for _ in range(bits):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1 if (x >> 32) & 1 else -1)
        planes.append(row)
    return planes


def band_signatures(
    vec_col: str, dim: int, bits: int, bands: int
) -> Column:
    """All band signatures in one vectorized pass: an Arrow-batched pandas
    UDF computing sign-bits of Q·Pᵀ with a single int64 matmul per batch.

    This is the engine's one sanctioned Python hop in the similarity family:
    `bands × bits` hyperplane dot products per row as interpreted Catalyst
    higher-order functions cost ~100× more than one numpy matmul (and the
    literal-heavy expression tree slows planning itself). Determinism:
    quantization is floor(float64(x)·1e6) — identical IEEE ops to the SQL
    tier — and the hyperplanes are the same seeded ±1 matrix on every
    executor. Returns array<bigint> of length `bands`.
    """
    import numpy as np
    import pandas as pd

    planes = np.array(_hyperplanes(dim, bits * bands), dtype=np.int64)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def _sigs(v):
        if len(v) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype=object)
        mat = np.stack(
            [np.asarray(x, dtype=np.float64) for x in v]
        )  # (n, dim)
        q = np.floor(mat * QUANT).astype(np.int64)
        bits_mat = (q @ planes.T >= 0).astype(np.int64)  # (n, bands*bits)
        packed = (
            bits_mat.reshape(len(v), bands, bits) * weights
        ).sum(axis=2)  # (n, bands)
        return pd.Series(list(packed))

    sigs = F.pandas_udf(_sigs, returnType="array<bigint>")
    return sigs(F.col(vec_col))


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's hyperplane
    bucket. With `bits` sign-bits, expected candidate fraction is 2^-bits of
    the corpus per bucket — the IVF-style scale path. Recall is probabilistic;
    validated against :func:`cosine_topk` in the test suite."""
    def prep(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}id"),
            quantized(F.col(vec_col)).alias(f"{prefix}q"),
            band_signatures(vec_col, dim, bits, bands=1)[0].alias("bucket"),
        ).withColumn(
            f"{prefix}n2", dot_int(F.col(f"{prefix}q"), F.col(f"{prefix}q"))
        )

    e = prep(_spread(embeddings), "n_")
    q = prep(queries, "q_")
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            cosine_precomputed(
                F.col("q_q"), F.col("n_q"), F.col("q_n2"), F.col("n_n2")
            ).alias("cos"),
        )
    )
    return _topk_per_query(scored, k)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — learned coarse quantizer tier
# --------------------------------------------------------------------------

#: Driver-side training-sample bound for the IVF coarse quantizer. k-means
#: training on a bounded sample is the standard IVF recipe (the index
#: quality depends on centroid coverage, not on seeing every row); the
#: assignment pass over the full corpus stays distributed.
IVF_TRAIN_SAMPLE = 100_000

#: below this corpus size the IVF index probes EVERY cell. An inverted
#: file is an approximation whose quality premise is corpus >> nlist ·
#: cell-occupancy; at a few hundred rows the cells are a handful of
#: vectors each and recall@k has no statistical floor (r11 fuzz, seed 3:
#: a 70-row corpus at nprobe=4/nlist=16 scored ~17 rows per query and
#: missed top-5 recall). Exhaustive search at this scale costs less than
#: the quantizer itself; at 100 TB the floor is never reached.
IVF_EXHAUSTIVE_FLOOR = 256


def _train_centroids(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    iters: int = 5,
):
    """Spherical k-means on a deterministic sample (first IVF_TRAIN_SAMPLE
    rows by id; init = first nlist samples; fixed iteration count) — every
    run, every engine, same centroids. Returns ``(C, n_seen)``: a
    (nlist, dim) float64 centroid matrix (rows L2-normalized) or None,
    and the number of sample rows seen — ``n_seen < IVF_TRAIN_SAMPLE``
    means n_seen IS the corpus size, which the caller's small-regime
    policy needs."""
    import numpy as np

    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(IVF_TRAIN_SAMPLE)
        .collect()
    )
    if not rows:
        # empty corpus: nothing to train AND nothing to search — the
        # exact answer is the empty set, so signal "no centroids" rather
        # than crashing in np.stack (the 0 < n < nlist case below stays a
        # loud error: a result IS expected there but training is not
        # meaningful)
        return None, 0
    X = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if len(X) < nlist:
        # fewer vectors than requested cells: k-means cannot place more
        # centroids than points. Shrink to one centroid per vector; the
        # caller widens nprobe to ALL cells, so the degenerate regime
        # degrades to exact exhaustive search instead of failing loudly
        # (r10 tiny-corpus sweep) — the speed premise corpus >> nlist is
        # absent here, so correctness wins
        nlist = len(X)
    C = X[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # ties -> lowest cell id
        for j in range(nlist):
            m = assign == j
            if m.any():
                c = X[m].sum(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return C, len(X)


def _cell_udf(C, nprobe: int):
    """pandas UDF: vec → the nprobe nearest centroid ids (one matmul per
    Arrow batch; ties broken by cell id via stable argsort)."""
    import numpy as np
    import pandas as pd

    Cm = C

    def _cells(v):
        if len(v) == 0:  # np.stack raises on an empty Arrow batch
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ Cm.T  # (n, nlist)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    return F.pandas_udf(_cells, returnType="array<int>")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: a LEARNED coarse quantizer (spherical k-means
    centroids) partitions the corpus into nlist cells; each query scores
    only the vectors in its nprobe nearest cells.

    vs the hyperplane-LSH tier: data-adaptive cells follow the actual
    embedding distribution (better recall at equal candidates on clustered
    data) at the cost of a training pass. 100 TB shape: training on a
    bounded sample (driver, standard IVF recipe), assignment as one
    vectorized matmul per Arrow batch (distributed), candidate scoring as a
    cell equi-join — shuffle O(n + q·nprobe·cell_size), never O(n·q).
    Exact-cosine scoring within cells (same quantized arithmetic as the
    exact tier); recall vs :func:`cosine_topk` is asserted in the suite.
    """
    C, n_seen = _train_centroids(embeddings, id_col, vec_col, nlist)
    if C is not None and (
        C.shape[0] < nlist or n_seen < IVF_EXHAUSTIVE_FLOOR
    ):
        # trainer shrank nlist (corpus smaller than the requested cell
        # count) OR the corpus sits under the small-regime floor: probe
        # every cell — exhaustive, exact at this scale, and the only way
        # the recall contract is total (r11 fuzz seed 3)
        nprobe = C.shape[0]
    if C is None:  # empty corpus — exact result is the empty top-k
        q_idt = queries.schema[id_col].dataType.simpleString()
        n_idt = embeddings.schema[id_col].dataType.simpleString()
        return queries.sparkSession.createDataFrame(
            [],
            f"query_id {q_idt}, neighbor_id {n_idt}, rank int, cos double",
        )
    assign_one = _cell_udf(C, 1)
    assign_probe = _cell_udf(C, nprobe)

    e = _spread(embeddings).select(
        F.col(id_col).alias("n_id"),
        quantized(F.col(vec_col)).alias("n_q"),
        assign_one(F.col(vec_col))[0].alias("cell"),
    ).withColumn("n_n2", dot_int(F.col("n_q"), F.col("n_q")))
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            quantized(F.col(vec_col)).alias("q_q"),
            F.explode(assign_probe(F.col(vec_col))).alias("cell"),
        )
        .withColumn("q_n2", dot_int(F.col("q_q"), F.col("q_q")))
    )
    scored = (
        e.join(F.broadcast(q), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            cosine_precomputed(
                F.col("q_q"), F.col("n_q"), F.col("q_n2"), F.col("n_n2")
            ).alias("cos"),
        )
    )
    return _topk_per_query(scored, k)
