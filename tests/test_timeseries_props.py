"""Property tests for the time-series analytics family (q60–q63, q71):
algebraic invariants on small synthetic frames, complementing the
two-scale-factor oracle checks in test_queries_oracle.py.

- TWA is a weighted mean: bounded by [min, max] of the signal, and equal
  to the signal on any constant series.
- The q62 integer sufficient-statistics anomaly decision agrees with the
  naive float z-score decision away from the |z| = 3 boundary (the exact
  form exists precisely to remove boundary ambiguity, so only
  non-boundary agreement is meaningful).
- Gap-fill output is a dense calendar per group, forward fill carries
  the last observed value, and flagged days reproduce the observed set.
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


def _events_df(spark, rows):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@st.composite
def _user_series(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    base = datetime.datetime(2024, 1, 1)
    offsets = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=10**6),
                min_size=n,
                max_size=n,
                unique=True,
            )
        )
    )
    cents = draw(
        st.lists(
            st.integers(min_value=1, max_value=49000),
            min_size=n,
            max_size=n,
        )
    )
    return [
        (
            i,
            base + datetime.timedelta(seconds=off),
            7,
            "view",
            c / 100.0,
            "{}",
        )
        for i, (off, c) in enumerate(zip(offsets, cents))
    ]


@settings(max_examples=12, deadline=None)
@given(rows=_user_series())
def test_twa_bounded_and_exact(spark, rows):
    """TWA ∈ [min, max] of the observed values, and equals the exact
    numpy LOCF integral computed from the same integer weights."""
    from fs2_kafka_streams_spark.queries import load_all

    df = _events_df(spark, rows)

    # compute directly with the same operator expression as the registered
    # builder (no temp view needed — an earlier version registered one
    # that nothing read)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("t"),
        F.lead(F.unix_timestamp(F.col("ts").cast("timestamp"))).over(w).alias("t_next"),
    )
    gap = F.col("t_next") - F.col("t")
    agg = (
        seq.filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.col("cents") * gap).alias("wsum"), F.sum(gap).alias("wtot"))
        .filter(F.col("wtot") > 0)
        .collect()
    )
    ts = np.array([r[1].replace(tzinfo=datetime.timezone.utc).timestamp() for r in rows])
    cents = np.array([round(r[4] * 100) for r in rows])
    gaps = np.diff(ts).astype(np.int64)
    # _user_series draws unique offsets with n >= 2, so total gap > 0
    assert gaps.sum() > 0
    expected = float((cents[:-1] * gaps).sum()) / (100.0 * gaps.sum())
    assert len(agg) == 1
    got = agg[0].wsum / (100.0 * agg[0].wtot)
    assert got == pytest.approx(expected, rel=0, abs=1e-12)
    assert min(r[4] for r in rows) - 1e-9 <= got <= max(r[4] for r in rows) + 1e-9


@settings(max_examples=15, deadline=None)
@given(
    baseline=st.lists(
        st.integers(min_value=0, max_value=10**7), min_size=5, max_size=8
    ),
    x=st.integers(min_value=0, max_value=10**7),
)
def test_anomaly_integer_decision_matches_float_zscore(baseline, x):
    """(n·x−S1)²·(n−1) > 9·n·(n·S2−S1²)  ⟺  z² > 9 (float), away from
    the boundary. Pure-python check of the q62 algebra."""
    n = len(baseline)
    s1, s2 = sum(baseline), sum(v * v for v in baseline)
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    mean = s1 / n
    if var <= 0:
        return  # degenerate: zero variance — exact form flags any deviation
    z2 = (x - mean) ** 2 / var
    if abs(z2 - 9.0) < 1e-6:
        return  # boundary: float formulation is ambiguous by construction
    exact = (n * x - s1) ** 2 * (n - 1) > 9 * n * (n * s2 - s1 * s1)
    assert exact == (z2 > 9.0)


def test_gapfill_dense_and_locf(spark):
    """Gap-fill on a fixture with a hole: the spine is dense, the hole
    day carries the previous day's value, and has_data marks exactly the
    observed days."""
    from pyspark.sql import functions as F

    rows = [
        (1, datetime.datetime(2024, 1, 1, 10), 1, "view", 10.0, "{}"),
        (2, datetime.datetime(2024, 1, 2, 10), 1, "view", 20.0, "{}"),
        # hole on Jan 3
        (3, datetime.datetime(2024, 1, 4, 10), 1, "view", 40.0, "{}"),
    ]
    df = _events_df(spark, rows)
    daily = df.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev"))
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "day",
            "rev",
            F.last("rev", ignorenulls=True).over(w).alias("rev_filled"),
            F.col("rev").isNotNull().alias("has_data"),
        )
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in out]
    assert days == [datetime.date(2024, 1, d) for d in (1, 2, 3, 4)]
    assert [r.has_data for r in out] == [True, True, False, True]
    hole = out[2]
    assert hole.rev is None and hole.rev_filled == 20.0
