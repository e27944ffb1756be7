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
) -> DataFrame:
    """Backward as-of left join (every left row kept; no match → NULLs).

    Matches DuckDB ``ASOF LEFT JOIN`` semantics: right row with the greatest
    ``right_time`` <= ``left_time`` for the same key. Ties among right rows at
    the same time resolve to the greatest payload struct (deterministic).
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
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).withColumn(
        "_rf", F.last("_r", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        *[F.col(f"_rf.{c}").alias(c) for c in right_values],
    )
