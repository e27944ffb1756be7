"""As-of join: enrich each left row with the latest right row at-or-before it.

The reference's stream-table join (``src/it/scala/ReadOnlyTableSpec.scala:77-79``)
looks up "the current value of the table as of this record" — the batch
re-expression of that is a backward as-of join on event time.

Spark has no native as-of join. Implementation: the union + ordered-window
"last known value" technique — O(n log n) per key-partition, one shuffle, no
O(n*m) theta-join blowup:

  1. stack left (probe) and right (state) rows into one DataFrame tagged by
     side, with right rows carrying their payload in a struct;
  2. per key, order by (time, side, payload) — right rows sort before left
     rows at equal timestamps so an exact-time match is visible to the probe;
  3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
     frame gives each left row the most recent right payload;
  4. keep only left rows and unnest.

Scale note: this is one shuffle on the join key and a per-key sort — the same
cost profile as a sort-merge join, and it inherits AQE skew splitting. For
severely skewed keys, pre-aggregate the right side (latest per (key, time))
first, which also makes ties deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    left_by: Sequence[str],
    right_by: Sequence[str],
    right_values: Sequence[str] | None = None,
    time_bucket: str | int | float | None = None,
) -> DataFrame:
    """Backward as-of left join (every left row kept; no match → NULLs).

    Matches DuckDB ``ASOF LEFT JOIN`` semantics: right row with the greatest
    ``right_time`` <= ``left_time`` for the same key. Ties among right rows at
    the same time resolve to the greatest payload struct (deterministic).

    ``time_bucket`` selects the SKEW-BOUNDED plan the module doc
    prescribes for hot keys: a duration string ("1 hour") for timestamp
    time columns, or a numeric width for numeric ones. The default plan
    sorts each key's ENTIRE row set in one window partition — a 40%-hot
    key makes that partition the stage's critical path, and no salt can
    split a window whose frame spans the whole key. Bucketing splits it
    BY TIME instead:

    1. both sides bucket on ``floor(time / width)``;
    2. the right side pre-aggregates to its latest (time, payload) per
       (key, bucket) — one hash aggregation, map-side partials absorb the
       hot key;
    3. a tiny per-key window over the O(keys × buckets) bucket-latest
       rows computes each bucket's CARRY-IN (the latest right row from
       any earlier bucket);
    4. the union-window runs partitioned by (key, BUCKET): candidates for
       a probe are its bucket's right rows at-or-before it, else the
       injected carry-in row — so the sort partitions are bounded by
       bucket width no matter how hot the key.

    Equivalent to the unbucketed path for every input (equality-tested on
    q12's oracle in tests/test_asof_bucketed.py, incl. ties, NULL times,
    and carry-in across empty buckets). Cost: two extra small shuffles
    (bucket-latest + distinct buckets) — the 100 TB trade is a monster
    per-key sort for bounded per-(key, bucket) sorts; measured in
    SCALE.md's O(rows) sweep (hot40 crossover).
    """
    if right_values is None:
        right_values = [
            c for c in right.columns if c not in set(right_by) | {right_time}
        ]
    left_cols = left.columns

    l2 = left.select(
        *[F.col(b).alias(f"_k{i}") for i, b in enumerate(left_by)],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_values
            ) + ">"
        ).alias("_r"),
    )
    # a NULL right_time never matches in an ASOF comparison (DuckDB: the
    # inequality is never true) — but ascending-NULLS-FIRST would sort such
    # a row BEFORE every timestamped row and hand its payload to early left
    # rows via last(ignorenulls); drop them before the union. Likewise a
    # NULL join KEY never matches an equality condition, but the window's
    # partitionBy groups NULLs together — a NULL-key right row would hand
    # its payload to NULL-key left rows; drop those too (NULL-key left
    # rows stay, unmatched, as ASOF LEFT JOIN requires).
    _r_matchable = F.col(right_time).isNotNull()
    for b in right_by:
        _r_matchable = _r_matchable & F.col(b).isNotNull()
    r2 = right.filter(_r_matchable).select(
        *[F.col(b).alias(f"_k{i}") for i, b in enumerate(right_by)],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l2.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in right_values]).alias("_r"),
    )

    keys = [f"_k{i}" for i in range(len(left_by))]

    def _finish(filled: DataFrame) -> DataFrame:
        return filled.filter(F.col("_side") == 1).select(
            *[F.col(f"_l.{c}").alias(c) for c in left_cols],
            *[F.col(f"_rf.{c}").alias(c) for c in right_values],
        )

    if time_bucket is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t"), F.col("_side"), F.col("_r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return _finish(
            l2.unionByName(r2).withColumn(
                "_rf", F.last("_r", ignorenulls=True).over(w)
            )
        )

    # ---- bucketed (skew-bounded) plan ------------------------------------
    from fs2_kafka_streams_spark.functions.buckets import time_bucket_expr

    bucket = time_bucket_expr(
        left.schema[left_time].dataType, time_bucket, "_t"
    )
    l2b = l2.withColumn("_b", bucket)
    r2b = r2.withColumn("_b", bucket)

    # right side pre-aggregated to latest-per-(key, bucket): max over the
    # (time, payload) struct is exactly the unbucketed tie rule (greatest
    # time, then greatest payload)
    bucket_latest = r2b.groupBy(*keys, "_b").agg(
        F.max(F.struct("_t", "_r")).alias("_s")
    )
    # every bucket that appears on EITHER side needs a carry-in row — a
    # left bucket with no right rows still inherits the previous latest
    all_buckets = (
        l2b.select(*keys, "_b").union(r2b.select(*keys, "_b")).distinct()
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(bucket_latest, on=keys + ["_b"], how="left")
        # running max over STRICTLY EARLIER buckets (aggregates skip
        # nulls); buckets are time-disjoint, so the max struct is simply
        # the most recent earlier bucket's latest. A NULL bucket (left
        # rows with NULL time) sorts first and gets no carry — NULL-time
        # probes stay unmatched, as in the unbucketed path.
        .withColumn("_c", F.max("_s").over(w_carry))
        .filter(F.col("_c").isNotNull())
        .select(
            *keys,
            F.col("_c._t").alias("_t"),
            # sorts before any same-bucket row even at an (impossible)
            # time tie; its _t is from an earlier bucket by construction
            F.lit(-1).alias("_side"),
            F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
            F.col("_c._r").alias("_r"),
            F.col("_b"),
        )
    )
    w = (
        Window.partitionBy(*keys, "_b")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l2b.unionByName(r2b)
        .unionByName(carry)
        .withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    )
    return _finish(filled)
