"""Time-series analytics (round 4, third batch): gap filling, equi-width
histograms, rolling anomaly detection, time-weighted averages.

The reference materializes keyed changelogs consumed in timestamp order
(``client/RecordStream.scala:14-16``, ``streams/Tables.scala:46-70``);
these are the standard time-series queries a deployment runs on top of
such a stream: regularize an irregular series onto a fixed calendar spine
(gap-fill + forward-fill), summarize a value distribution (histogram),
flag outliers against a trailing baseline (rolling z-score), and average
a sampled signal weighted by how long each sample was current (TWA — the
right mean for irregularly-sampled state, e.g. a price or sensor level).

Determinism notes (every query hash-matches a DuckDB oracle):

- All money/value arithmetic is exact: 2-dp doubles become DECIMAL(18,2)
  or BIGINT cents before any sum (see :mod:`..canonical`).
- The anomaly decision |z| > 3 is evaluated on exact integer sufficient
  statistics — ``(n·x − S1)²·(n−1) > 9·n·(n·S2 − S1²)`` — so no engine
  ever computes a float stddev; there is no rounding boundary to disagree
  on. (At 100 TB magnitudes the same identity runs in DECIMAL(38,0); the
  driver tables fit comfortably in BIGINT cents.)
- Forward fill orders by the day column, which is unique within each
  partition, so ``last(..., ignorenulls)`` is frame-deterministic.
- TWA weights are integer epoch-second gaps via the NTZ-safe
  :func:`~fs2_kafka_streams_spark.queries.ntz_epoch_seconds` (==
  DuckDB ``floor(extract(epoch ...))``, immune to the session timezone);
  the single final division is one IEEE double op on bit-identical
  inputs, identical on both engines.

Scale shape: the calendar spine is generated row-locally per group
(``sequence`` + ``explode`` — zero extra shuffle); histograms are pure
projection + one map-side-combined aggregate; the rolling window and TWA
shuffle once on their natural key. Nothing here collects to the driver
and no window is unpartitioned.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fs2_kafka_streams_spark.canonical import (
    dec2,
    dsum_expr,
    measure,
    sql_dsum,
    sql_measure,
)
from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.queries import ntz_epoch_seconds, query


@query(
    "q60_gapfill",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(cast((CASE WHEN abs(value) < 1e14 THEN value END)
                      AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    )
    SELECT s.event_type, s.day, d.rev,
           last_value(d.rev IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS rev_filled,
           (d.rev IS NOT NULL) AS has_data
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
    tags=("timeseries", "events", "gapfill"),
)
def q60_gapfill(spark, sf_dir):
    """Gap-fill an irregular daily series onto a dense calendar spine and
    forward-fill missing days (the ``time_bucket_gapfill`` / ``locf``
    primitive of time-series stores).

    Plan: the daily pre-aggregate is one shuffle on (type, day); the spine
    is ``sequence(min_day, max_day)`` exploded **row-locally from the
    per-type bounds row** — O(types) rows expanded to O(types × days),
    never a driver loop or a cross join. The forward fill is a window
    partitioned by type (bounded partitions: days don't scale with event
    volume), and the spine ⋈ daily join is a broadcast hash join — both
    sides are post-aggregation O(types × days) relations, never the raw
    event log.
    """
    e = Catalog(spark, sf_dir).events
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        # measure(): non-finite/overflow metrics are NULL on both engines
        .agg(dsum_expr(dec2(measure("value"))).alias("rev"))
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # no explicit broadcast hint: the build side of a LEFT outer join must
    # be the right (daily) side, and Spark auto-broadcasts it — both sides
    # are post-aggregation O(types × days) relations
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            "rev",
            F.last("rev", ignorenulls=True).over(w).alias("rev_filled"),
            F.col("rev").isNotNull().alias("has_data"),
        )
    )


@query(
    "q61_histogram",
    oracle=f"""
    SELECT CAST(floor({sql_measure('o_totalprice')} / 50000.0) AS INTEGER)
             AS bucket,
           CAST(CAST(floor({sql_measure('o_totalprice')} / 50000.0)
                     AS INTEGER) * 50000.0 AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice')} AS sum_price,
           min({sql_measure('o_totalprice')}) AS min_price,
           max({sql_measure('o_totalprice')}) AS max_price
    FROM orders GROUP BY 1
    """,
    tags=("timeseries", "analytics", "histogram"),
)
def q61_histogram(spark, sf_dir):
    """Equi-width value histogram of order totals (bucket = 50k).

    Equi-width, not equi-depth, is the 100 TB-safe formulation: bucket
    assignment is a scan-stage projection and the aggregate map-side
    combines to O(buckets) rows — an ``ntile`` equi-depth histogram would
    need a global sort through a single partition. (Equi-depth at scale is
    served by the existing ``approx_percentile`` tier in q13b.) The
    bucket boundary is one IEEE double divide + floor on identical
    inputs, so both engines bucket every row identically.
    """
    o = Catalog(spark, sf_dir).orders
    # measure-domain bucketing: an out-of-domain price (NaN/±inf/
    # overflow) has no meaningful bucket — it lands in the NULL bucket
    # with NULL stats on BOTH engines (Spark's floor(inf) saturates to
    # int64-max then overflows the INT cast; DuckDB throws casting NaN
    # to INTEGER — r10 non-finite sweep)
    m = measure("o_totalprice")
    bucket = F.floor(m / F.lit(50000.0)).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_expr(dec2("o_totalprice")).alias("sum_price"),
            F.min(m).alias("min_price"),
            F.max(m).alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(50000.0)).alias("bucket_lo"),
            "n",
            "sum_price",
            "min_price",
            "max_price",
        )
    )


@query(
    "q62_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round((CASE WHEN abs(value) < 1e14 THEN value END) * 100)
                           AS BIGINT)) AS HUGEINT)
               AS cents
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, day, cents,
             sum(cents) OVER w AS s1,
             sum(cents * cents) OVER w AS s2,
             count(*) OVER w AS n
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day,
           CAST(cents AS DOUBLE) / 100.0 AS rev,
           CAST(n AS BIGINT) AS n_base,
           CAST(s1 AS DOUBLE) / (100.0 * n) AS base_mean,
           (n * cents - s1) * (n * cents - s1) * (n - 1)
             > 9 * n * (n * s2 - s1 * s1) AS is_anomaly
    FROM stats WHERE n >= 5
    """,
    tags=("timeseries", "events", "anomaly"),
)
def q62_anomaly(spark, sf_dir):
    """Rolling z-score anomaly detection: flag days whose revenue deviates
    more than 3 trailing standard deviations from the preceding 7-day
    baseline, per event type.

    The |z| > 3 test is evaluated as ``(n·x − S1)²·(n−1) > 9·n·(n·S2 −
    S1²)`` over exact integer cent sums — algebraically identical to
    ``((x−μ)/σ_samp)² > 9`` but with no floating-point mean, variance, or
    sqrt anywhere, so the decision replays bit-for-bit in DuckDB.

    Overflow posture: the sufficient statistics run in DECIMAL (Spark) /
    HUGEINT (DuckDB) — both exact up to ~1e38 — instead of BIGINT, whose
    ~9.2e18 ceiling the squared terms cross once daily cent sums exceed
    ~1.2e9 (bigger scale factors / hot event types; under ANSI mode that
    would throw, otherwise silently wrap). Exactness now holds while
    ``64·max_daily_cents²·7 < 1e38``, i.e. daily revenue up to ~10¹⁵
    dollars — beyond any 100 TB corpus.

    Plan: one (type, day) aggregation, then a window over the tiny daily
    series partitioned by type — the window input is O(types × days),
    independent of event volume, so the per-partition sort is bounded at
    any scale.
    """
    # NULL event-time contract (docs/USAGE.md): an undated observation
    # has no place in a trailing 7-day baseline — dropped on BOTH engines.
    # (Without the filter a NULL day lands at opposite ends of the window
    # order — Spark NULLS FIRST, DuckDB NULLS LAST — shifting every
    # 7-preceding frame near that end.)
    e = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    # decimal(19,0) BEFORE the day-sum so even the aggregation can't wrap
    cents = F.round(measure("value") * 100).cast("decimal(19,0)")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(cents).cast("decimal(38,0)").alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("cents") * F.col("cents"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    x, s1, s2 = (
        F.col(c).cast("decimal(38,0)") for c in ("cents", "s1", "s2")
    )
    n = F.col("n")
    nd = n.cast("decimal(38,0)")
    return stats.filter(n >= 5).select(
        "event_type",
        "day",
        (x.cast("double") / F.lit(100.0)).alias("rev"),
        n.alias("n_base"),
        (s1.cast("double") / (F.lit(100.0) * n)).alias("base_mean"),
        (
            (nd * x - s1) * (nd * x - s1) * (nd - F.lit(1))
            > F.lit(9) * nd * (nd * s2 - s1 * s1)
        ).alias("is_anomaly"),
    )


@query(
    "q63_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(round((CASE WHEN abs(value) < 1e14 THEN value END) * 100) AS BIGINT)
               AS cents,
             CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS t,
             -- NULLS FIRST on the tie-break: Spark's ASC default — a
             -- NULL-id sample at a tied ts carries zero duration on both
             -- engines (r10 NULL-id sweep)
             lead(CAST(floor(extract(epoch FROM ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST)
               AS t_next
      FROM events WHERE ts IS NOT NULL
    ),
    agg AS (
      SELECT user_id,
             -- HUGEINT product (r11 cold review): a cent value near the
             -- 1e14 measure bound times a multi-year gap (~1.8e10 s at
             -- the calendar extremes) reaches ~1.8e26 cent-seconds —
             -- past BIGINT, where both engines THROW. HUGEINT/decimal38
             -- keeps the identity exact to ~1e38 on both halves.
             sum(CAST(cents AS HUGEINT) * (t_next - t)) AS wsum,
             sum(t_next - t) AS wtot,
             count(*) AS n_events
      FROM seq WHERE t_next IS NOT NULL GROUP BY 1
    )
    SELECT user_id, CAST(n_events + 1 AS BIGINT) AS n_events,
           CAST(wtot AS BIGINT) AS span_seconds,
           CAST(wsum AS DOUBLE) / (100.0 * wtot) AS twa_value
    FROM agg WHERE wtot > 0
    """,
    tags=("timeseries", "events", "twa"),
)
def q63_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of each user's ``value`` signal: every
    observation is weighted by how long it remained current (until the
    next event), i.e. the integral of the last-observation-carried-forward
    curve divided by the observed span — the correct mean for
    irregularly-sampled state and the ``time_weight('locf')`` primitive
    of time-series databases.

    Exactness: weights are integer epoch-second gaps from ``lead`` over
    the deterministic ``(ts, event_id)`` order; value·weight products are
    BIGINT cent-seconds, summed exactly; the one final division is a
    single IEEE double op on identical inputs.

    Plan: one shuffle on ``user_id`` feeding both the ``lead`` window and
    the aggregation (same key — AQE reuses the exchange), output O(users).
    """
    # NULL event-time contract: an undated sample has no duration to
    # weight — dropped on BOTH engines (q62's rationale)
    e = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.round(measure("value") * 100).cast("bigint").alias("cents"),
        ntz_epoch_seconds("ts").alias("t"),
        F.lead(ntz_epoch_seconds("ts")).over(w).alias("t_next"),
    )
    gap = F.col("t_next") - F.col("t")
    # decimal(38,0) cent-second products (r11 cold review, mirroring the
    # oracle's HUGEINT): BIGINT products overflow (both engines throw) at
    # in-measure-domain cents (~1e16) times calendar-extreme gaps
    # (~1.8e10 s) — the q62 sufficient-statistics posture applied here
    agg = (
        seq.filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.col("cents").cast("decimal(19,0)") * gap
            ).cast("decimal(38,0)").alias("wsum"),
            F.sum(gap).alias("wtot"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return agg.filter(F.col("wtot") > 0).select(
        "user_id",
        (F.col("n_events") + 1).cast("bigint").alias("n_events"),
        F.col("wtot").cast("bigint").alias("span_seconds"),
        (F.col("wsum").cast("double") / (F.lit(100.0) * F.col("wtot"))).alias(
            "twa_value"
        ),
    )


@query(
    "q71_resample_ohlc",
    oracle="""
    WITH seq AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             -- NULLS FIRST mirrors Spark's struct ordering in min_by: a
             -- NULL field is SMALLEST, so a NULL-id row at the bucket's
             -- min ts is the open on both engines; the DESC side needs no
             -- spelling — Spark max_by (null smallest) ≡ DuckDB's DESC
             -- default NULLS LAST (r10 NULL-id sweep probes)
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts, event_id NULLS FIRST) AS rn_a,
             row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, day,
           min(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           min(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM seq GROUP BY 1, 2
    """,
    tags=("timeseries", "events", "resample"),
)
def q71_resample_ohlc(spark, sf_dir):
    """OHLC downsampling (the candlestick / ``first-last-min-max``
    resample): per (type, day) bucket, the first and last observed value
    in ``(ts, event_id)`` order plus the extremes and the sample count —
    the canonical time-series compaction for dashboards and downstream
    models.

    Determinism: open/close use ``min_by``/``max_by`` over the composite
    ``(ts, event_id)`` struct — ``event_id`` is unique, so ties in ``ts``
    cannot flip the selection (the oracle replays the same order with
    ascending/descending row_numbers); high/low/n are order-free.

    Plan: ONE hash aggregation over the scan — min_by/max_by are
    map-side-combinable, so shuffle volume is O(types × days) rows of
    fixed width, never a per-bucket sort. This is the aggregation-only
    formulation of what a window-based first/last would pay a per-bucket
    sort for.
    """
    e = Catalog(spark, sf_dir).events
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min_by("value", ordk).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordk).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )
