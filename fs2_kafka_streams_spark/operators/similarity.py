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

No UDFs: `zip_with`/`aggregate` keep everything in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


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
    return (
        dot_int(qa, qb).cast("double")
        / F.sqrt(dot_int(qa, qa).cast("double"))
        / F.sqrt(dot_int(qb, qb).cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k neighbors per query vector (broadcast the queries).

    The scan side streams once; per row only k candidates per query survive
    the rank filter. This is the O(n·q) baseline ANN — correct by
    construction, used to validate the LSH tier.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact tier): every unordered
    pair with cosine >= threshold. O(n²/2) scored pairs — the correctness
    baseline that :func:`embedding_neardup_pairs_lsh` is validated against.
    Exact integer dot products (see module docstring) keep it hash-checkable
    cross-engine."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits_per_band: int = 3,
    bands: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup, 100 TB path: banded hyperplane LSH.

    Each vector gets `bands` small signatures (``bits_per_band`` sign-bits
    each); candidate pairs share at least one band signature — an equi-join
    per band (shuffle O(n·bands)), never the O(n²) cross join. Candidates
    are then verified with the exact cosine, so precision is 1; recall is
    probabilistic (two vectors at cosine θ collide in one band with prob
    (1 − arccos(θ)/π)^bits, amplified across bands) and is asserted against
    the exact tier in the test suite."""
    sigs = [
        lsh_bucket_band(F.col(vec_col), dim, bits_per_band, band)
        for band in range(bands)
    ]
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.array(*sigs).alias("sigs"),
    )
    tagged = e.select(
        "id", "v", F.posexplode("sigs").alias("band", "sig")
    )
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
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos")
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


def lsh_bucket_band(
    col: Column, dim: int, bits: int, band: int
) -> Column:
    """Band signature for banded LSH: `bits` sign-bits from the band's own
    slice of the deterministic hyperplane sequence."""
    q = quantized(col)
    planes = _hyperplanes(dim, bits * (band + 1))[band * bits :]
    acc = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        coeffs = F.array(*[F.lit(c) for c in plane])
        d = dot_int(q, coeffs)
        bit = F.when(d >= 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
            F.lit(0).cast("bigint")
        )
        acc = acc.bitwiseXOR(bit)
    return acc


def lsh_bucket(col: Column, dim: int = 64, bits: int = 16) -> Column:
    """Random-hyperplane signature: an integer bucket id from `bits`
    sign-bits of ±1-hyperplane dot products over the quantized vector."""
    q = quantized(col)
    acc = F.lit(0).cast("bigint")
    for j, plane in enumerate(_hyperplanes(dim, bits)):
        coeffs = F.array(*[F.lit(c) for c in plane])
        d = dot_int(q, coeffs)
        bit = F.when(d >= 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
            F.lit(0).cast("bigint")
        )
        acc = acc.bitwiseXOR(bit)
    return acc


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
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        lsh_bucket(F.col(vec_col), dim, bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), dim, bits).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("n_vec")).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
