"""Fuzzy-match join (entity resolution): blocked edit-distance pairing.

The curation-pipeline counterpart of the shingle/LSH dedup family for
SHORT strings (names, titles, product labels) where token shingles are
too coarse: candidate pairs come from equi-joining on a cheap blocking
key, then each candidate is verified with a banded Levenshtein. The
candidate structure mirrors ``minhash_lsh_pairs``: O(n·blocks) shuffle,
never O(n²), with the same style of skew guard.

Verification uses Spark's thresholded ``levenshtein(l, r, d)`` — the DP
runs in a band of width 2d+1 and abandons early above ``d`` (O(d·len)
per pair, not O(len²)); the returned value is exact for kept pairs, so
the emitted distance replays in DuckDB's unthresholded ``levenshtein``
filtered to ``<= d``.

Blocking keys trade recall for cost and are the caller's choice:
``first token`` works for label vocabularies, a (length-bucket, prefix)
composite for free text. A pair whose members land in different blocks
is missed — the standard blocking trade; the exact tier over all pairs
is the oracle-scale ground truth (same contract as ``max_doc_freq`` in
the shingle tier).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 3,
    block_expr: Column | None = None,
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """All (id_a, id_b, name_a, name_b, dist) pairs with
    ``levenshtein <= max_dist`` among rows sharing a blocking key.

    ``block_expr`` defaults to the first whitespace token. Blocks larger
    than ``max_block_size`` are dropped whole (skew guard — a degenerate
    key like an empty string would otherwise quadratically explode one
    partition; dropped blocks are a documented recall cut, mirroring
    ``max_bucket_size`` in the LSH tiers).

    A length pre-filter (``|len_a - len_b| <= max_dist``, a Levenshtein
    lower bound) prunes candidates before the DP runs.
    """
    if block_expr is None:
        block_expr = F.split_part(F.col(text_col), F.lit(" "), F.lit(1))
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        block_expr.alias("_blk"),
        F.length(text_col).alias("_len"),
    )
    if max_block_size is not None:
        # groupBy + left_semi, NOT a window count: a window partitioned by
        # the blocking key funnels the entire degenerate block onto ONE
        # task just to compute the count that drops it — the exact hot key
        # the guard exists to defuse. The aggregate partial-combines
        # map-side and never concentrates the block (same shape as the
        # LSH tiers' max_bucket_size guard in similarity.py/dedup.py).
        small_blocks = (
            b.groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") <= max_block_size)
            .select("_blk")
        )
        b = b.join(small_blocks, "_blk", "left_semi")
    left = b.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("name_a"),
        F.col("_len").alias("_len_a"),
    )
    right = b.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("name_b"),
        F.col("_len").alias("_len_b"),
    )
    cand = left.join(right, on="_blk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_len_a") - F.col("_len_b")) <= max_dist)
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist)
        )
        .filter(F.col("dist") >= 0)  # -1 = above threshold, band abandoned
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
