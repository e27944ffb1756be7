"""Mergeable sketch aggregates (round 4): the 100 TB distinct-count tier.

An exact ``COUNT(DISTINCT)`` over 100 TB shuffles every distinct key; the
deployment-shape alternative is a **mergeable sketch**: each shard builds
a fixed-size HLL sketch (Apache DataSketches, built into Spark as
``hll_sketch_agg`` / ``hll_union_agg``), partials merge associatively, and
the estimate is read once at the end — O(shards × 2^lgK) bytes moved,
independent of cardinality. This is also the only aggregate family that
supports **incremental** maintenance: yesterday's sketch unions with
today's delta without rescanning history (the sketch twin of
``operators/incremental.py``'s snapshot+delta MERGE).

DuckDB has no DataSketches HLL, so the oracle checks what IS
engine-portable: the exact distinct counts, plus two *property columns*
the Spark side must prove about its sketches —

- ``merge_consistent``: the union of 8 shard-partial sketches estimates
  EXACTLY what the one-pass sketch estimates (register-wise max is
  insertion-partition-invariant — the associativity that makes the
  pattern safe to distribute);
- ``est_within_5pct``: the estimate lands within 5% of the exact count
  (lgConfigK=12 → ~1.6% standard error; 5% is a hard bound, not a hope).

The oracle emits ``TRUE`` for both, so a sketch regression fails the
driver's hash check loudly rather than degrading silently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.queries import query


@query(
    "q64_hll_sketch_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS merge_consistent,
           TRUE AS est_within_5pct
    FROM events GROUP BY 1
    """,
    tags=("sketch", "approx", "scale", "events"),
)
def q64_hll_sketch_merge(spark, sf_dir):
    """Distinct users per event type, three ways at once: exact, one-pass
    HLL sketch, and an 8-shard partial-sketch union — asserting the two
    sketch paths agree at the REGISTER level and both estimates land
    within 5% of exact.

    ``merge_consistent`` routes BOTH sketches through the same two-input
    union estimator and requires ``est(union(sk, sk)) ==
    est(union(msk, msk))`` (symmetric: registers lost in EITHER path
    change one side's composite estimate) AND ``est(union(sk, msk)) ==
    est(union(msk, msk))`` (the absorbed union must equal the sharded one
    — a one-sided check alone would also pass when sk's registers are a
    strict subset of msk's). Comparing the raw estimates directly is NOT
    an invariant — once sketches leave exact coupon mode, a stream-built
    sketch reports the DataSketches HIP estimate while a union reports
    the composite register estimate (1494 vs 1488 on the sf0.1 corpus
    from identical registers), so a naive equality check passes only at
    toy scale.

    Plan: the sharded path is the deployment shape — partials are
    map-side-combinable fixed-size binaries, so the shuffle carries
    O(types × shards × 4 KB) regardless of user cardinality; the exact
    ``countDistinct`` here is the verification baseline, not the scale
    recommendation."""
    e = Catalog(spark, sf_dir).events
    lg_k = 12

    direct = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk"),
        F.countDistinct("user_id").cast("bigint").alias("n_exact"),
    )
    merged = (
        e.withColumn("shard", F.pmod(F.col("event_id"), F.lit(8)))
        .groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("psk"))
        .groupBy("event_type")
        .agg(F.hll_union_agg("psk", F.lit(False)).alias("msk"))
    )
    est_d = F.hll_sketch_estimate("sk")
    est_m = F.hll_sketch_estimate("msk")
    registers_equal = F.expr(
        "hll_sketch_estimate(hll_union(sk, sk))"
        " = hll_sketch_estimate(hll_union(msk, msk))"
        " AND hll_sketch_estimate(hll_union(sk, msk))"
        " = hll_sketch_estimate(hll_union(msk, msk))"
    )
    tol = F.lit(0.05) * F.col("n_exact")
    # eqNullSafe: a NULL event_type is a legitimate group — both groupBys
    # produce it, and a null-unsafe equi-join here silently dropped the
    # whole group from the output (r10 NULL-key sweep)
    return direct.join(
        merged.withColumnRenamed("event_type", "_et"),
        direct["event_type"].eqNullSafe(F.col("_et")),
    ).select(
        "event_type",
        "n_exact",
        registers_equal.alias("merge_consistent"),
        (
            (F.abs(est_d - F.col("n_exact")) <= tol)
            & (F.abs(est_m - F.col("n_exact")) <= tol)
        ).alias("est_within_5pct"),
    )


@query(
    "q69_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_merged
    FROM events GROUP BY 1
    """,
    tags=("sketch", "bitmap", "scale", "events"),
)
def q69_bitmap_distinct(spark, sf_dir):
    """EXACT mergeable distinct counts via fixed-size bitmaps
    (``bitmap_bucket_number`` / ``bitmap_construct_agg`` /
    ``bitmap_or_agg`` / ``bitmap_count`` — Spark's bitmap aggregate
    family): each (group, bucket) holds a 32k-bit bitmap of key
    positions; bitmaps OR-merge associatively, and the count is exact —
    the exact-tier twin of q64's approximate HLL for bounded integer
    domains (the pattern behind bitmap indexes and audience-overlap
    engines).

    Two paths computed and BOTH hash-checked against the plain
    ``COUNT(DISTINCT)`` oracle: a direct bitmap aggregation, and an
    8-shard partial build OR-merged afterwards — equality of the merged
    path to the exact count is the associativity proof, with no
    approximate tolerance involved.

    Scale: shuffle volume is O(groups × occupied buckets × 4 KB),
    independent of row count; partials map-side combine; incremental
    maintenance is a bitmap OR with yesterday's state.
    """
    e = Catalog(spark, sf_dir).events.select(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
        # pmod, not %: a negative id would shard negatively (q64's idiom);
        # harmless on this fixture but the trap is free to remove
        F.pmod(F.col("event_id"), F.lit(8)).alias("shard"),
    )
    direct = (
        e.groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct"))
    )
    merged = (
        e.groupBy("event_type", "bucket", "shard")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_merged"))
    )
    # eqNullSafe — q64's NULL-group rationale
    return direct.join(
        merged.withColumnRenamed("event_type", "_et"),
        direct["event_type"].eqNullSafe(F.col("_et")),
    ).select(
        "event_type",
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.col("n_distinct_merged").cast("bigint").alias("n_distinct_merged"),
    )
