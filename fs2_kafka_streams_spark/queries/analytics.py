"""Event-sequence analytics (round 4): funnel, retention cohorts,
transition matrix, SCD2 changelog history.

These are the user-behavior queries a stream-processor deployment runs on
top of its materialized tables — the reference materializes the keyed
changelog (``streams/Tables.scala:46-70``) and this module adds the
standard analytics that consume such a table/stream: ordered funnels,
cohort retention, event-type transition counts, and the full versioned
history (SCD type 2) that ``latest_by_key`` truncates to its head.

Determinism notes (every query hash-matches a DuckDB oracle):

- Funnel stage times use ``min`` aggregates and strict ``>`` comparisons —
  no window-order dependence, so ties in ``ts`` cannot flip results.
- Sequence windows order by ``(ts, event_id)``; ``event_id`` is unique, so
  ``lag`` is deterministic.
- Lag sums are integer epoch-seconds via the NTZ-safe
  :func:`~fs2_kafka_streams_spark.queries.ntz_epoch_seconds` (==
  DuckDB ``floor(extract(epoch ...))``; ``unix_timestamp`` would route
  through the session timezone and go non-linear across a DST
  transition), summed as BIGINT — exact and order-independent.

Scale shape: everything here is one or two shuffles on ``user_id`` (the
natural key the events stream is already keyed by in the reference's
partitioned-consumer model, ``client/RecordStream.scala:14-16``), then a
small re-aggregation. No Python in any plan; whole-stage codegen
throughout.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.operators.scd import changelog_history
from fs2_kafka_streams_spark.queries import query


@query(
    "q51_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY 1
    )
    SELECT 'view' AS stage, CAST(1 AS INTEGER) AS stage_idx,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(NULL AS BIGINT) AS sum_lag_seconds
    FROM v
    UNION ALL
    SELECT 'click', 2, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(extract(epoch FROM c.t_click)) AS BIGINT)
                    - CAST(floor(extract(epoch FROM v.t_view)) AS BIGINT))
                AS BIGINT)
    FROM c JOIN v ON c.user_id = v.user_id
    UNION ALL
    SELECT 'purchase', 3, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(extract(epoch FROM p.t_purchase)) AS BIGINT)
                    - CAST(floor(extract(epoch FROM c.t_click)) AS BIGINT))
                AS BIGINT)
    FROM p JOIN c ON p.user_id = c.user_id
    """,
    tags=("analytics", "events", "funnel"),
)
def q51_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase.

    Each stage is the earliest qualifying event strictly after the previous
    stage's time, per user; the output is one row per stage with the users
    reaching it and the total integer-seconds lag from the previous stage.

    Plan: three aggregations partitioned on ``user_id``; each stage joins
    the previous stage's (user, min-ts) — at 100 TB the stage tables are
    O(users), orders of magnitude smaller than the event log, and every
    join/aggregate shares the ``user_id`` shuffle key so AQE coalesces the
    exchanges. No windows, so skewed users cost one aggregate buffer, not
    a sort.
    """
    e = Catalog(spark, sf_dir).events

    def stage(df, etype, prev, prev_ts_col, out_col):
        s = df.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts_col))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_col))

    v = stage(e, "view", None, None, "t_view")
    c = stage(e, "click", v, "t_view", "t_click")
    p = stage(e, "purchase", c, "t_click", "t_purchase")

    from fs2_kafka_streams_spark.queries import ntz_epoch_seconds as epoch

    row_v = v.agg(
        F.lit("view").alias("stage"),
        F.lit(1).cast("int").alias("stage_idx"),
        F.count(F.lit(1)).alias("n_users"),
        F.lit(None).cast("bigint").alias("sum_lag_seconds"),
    )
    row_c = (
        c.join(v, "user_id")
        .agg(
            F.lit("click").alias("stage"),
            F.lit(2).cast("int").alias("stage_idx"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(epoch("t_click") - epoch("t_view"))
            .cast("bigint")
            .alias("sum_lag_seconds"),
        )
    )
    row_p = (
        p.join(c, "user_id")
        .agg(
            F.lit("purchase").alias("stage"),
            F.lit(3).cast("int").alias("stage_idx"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(epoch("t_purchase") - epoch("t_click"))
            .cast("bigint")
            .alias("sum_lag_seconds"),
        )
    )
    return row_v.unionByName(row_c).unionByName(row_p)


@query(
    "q52_retention_cohort",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', CAST(f.cohort_week AS DATE),
                                  CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
               AS week_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity GROUP BY 1, 2
    """,
    tags=("analytics", "events", "retention"),
)
def q52_retention_cohort(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-activity week,
    counted as active per whole-week offset from that cohort week.

    Plan: one ``user_id`` aggregation for first-seen, a join back to the
    event log on the same key (shuffle reused), a distinct on
    (user, cohort, offset) — O(users × weeks), tiny relative to the log —
    then the final small groupBy. The week offset is computed as
    floor(days/7) from the cohort week's Monday, which sidesteps
    engine-specific ISO-week boundary rules.
    """
    e = Catalog(spark, sf_dir).events
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"),
                           F.col("cohort_week").cast("date")) / 7.0
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@query(
    "q53_scd_history",
    oracle="""
    WITH h AS (
      SELECT user_id, event_type, value,
             event_id AS valid_from,
             -- NULLS FIRST: Spark's ASC default — a NULL-id write is the
             -- key's OLDEST version on both engines (r10 NULL-id sweep)
             lead(event_id) OVER (PARTITION BY user_id
                                  ORDER BY event_id NULLS FIRST)
               AS valid_to
      FROM events
    )
    SELECT user_id, event_type, value, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    -- IS DISTINCT FROM: a NULL event_type is a regular write, not a
    -- tombstone ('<>' would silently drop its version row)
    FROM h WHERE event_type IS DISTINCT FROM 'error'
    """,
    tags=("analytics", "scd", "changelog"),
)
def q53_scd_history(spark, sf_dir):
    """SCD type-2 history of the events changelog keyed by ``user_id``
    (``operators/scd.py``): every non-tombstone write stamped with its
    validity interval; ``error`` events act as tombstones — they close the
    preceding version's interval but emit no version row (the reference's
    delete semantics, ``streams/Table.scala:52-56``). ``history.filter(
    is_current)`` equals ``latest_by_key`` minus deleted keys (asserted in
    tests/test_scd_history.py).

    Plan: one shuffle on the key + a per-key ``lead`` window ordered by the
    unique ``event_id`` — the operator's floor at any scale; output is
    O(rows) by definition of a history.
    """
    e = Catalog(spark, sf_dir).events
    # eqNullSafe: NULL event_type is NOT a tombstone (== would make the
    # flag NULL; the oracle's IS DISTINCT FROM spells out the same rule)
    hist = changelog_history(
        e.withColumn("_tomb", F.col("event_type").eqNullSafe("error")),
        key_cols=["user_id"],
        order_col="event_id",
        value_cols=["event_type", "value"],
        tombstone_col="_tomb",
    )
    return hist.select(
        "user_id", "event_type", "value", "valid_from", "valid_to",
        "is_current",
    )


@query(
    "q55_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             -- NULLS FIRST on the tie-break: Spark's ASC default — a
             -- NULL-id event at a tied ts sequences BEFORE the keyed one
             -- on both engines (r10 NULL-id sweep)
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id NULLS FIRST)
               AS prev_type
      FROM events WHERE ts IS NOT NULL
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("analytics", "events", "sequence"),
)
def q55_event_transitions(spark, sf_dir):
    """Per-user event-type transition matrix (Markov bigram counts): for
    each user's event sequence ordered by ``(ts, event_id)``, count
    ``prev → next`` type pairs. The sequence-analytics primitive behind
    path analysis on a partitioned, order-preserving stream (the
    reference's per-partition ordering guarantee,
    ``client/RecordStream.scala:14-16``).

    Plan: one shuffle on ``user_id`` + per-key sort for ``lag``, then a
    5×5 aggregate — map-side partials collapse it before the final
    exchange.

    NULL event-time contract (docs/USAGE.md): a row with no event time
    cannot be placed in a sequence — dropped on BOTH engines. (Without the
    explicit filter the engines disagree silently: Spark windows sort
    ascending NULLS FIRST, DuckDB NULLS LAST, so a NULL-ts row lands at
    opposite ends of the sequence and flips two transition counts —
    caught by the r10 NULL-corpus sweep.)
    """
    e = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q56_incremental_upsert",
    oracle="""
    WITH last AS (
      SELECT user_id, event_type, value, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC)
               AS rn
      FROM events
    )
    SELECT user_id, event_type, value, event_id AS last_event_id
    FROM last WHERE rn = 1 AND event_type IS DISTINCT FROM 'error'
    """,
    tags=("analytics", "changelog", "incremental", "scale"),
)
def q56_incremental_upsert(spark, sf_dir):
    """Incremental table maintenance (``operators/incremental.py``): fold
    the first two-thirds of the events changelog into a snapshot, then
    MERGE only the remaining third onto it — last-write-wins per key,
    ``error`` writes delete the key (reference ``Table.scala:52-56``). The
    oracle folds the WHOLE log in one pass; equality proves snapshot+delta
    ≡ full fold, i.e. recovery from a checkpoint never rescans the prefix
    (the reference's committed-offset recovery, ``Table.scala:64-95``).

    Plan: the delta apply shuffles O(snapshot keys + delta rows),
    independent of log length — the property that matters at 100 TB.

    The split is on ``event_id`` — the SAME column the merge orders by —
    so seg1 is a strict prefix of the changelog in merge order. A split
    on a different column (an earlier version used ``ts``) silently
    depends on that column being monotone in event_id: one out-of-order
    id and a key tombstoned in seg1 (whose marker the snapshot drops)
    resurrects from a lower-id seg2 row, diverging from the whole-log
    fold.
    """
    from fs2_kafka_streams_spark.operators.incremental import apply_changes

    e = Catalog(spark, sf_dir).events.withColumn(
        # eqNullSafe — NULL event_type is a write, not a delete (q53's rule)
        "_tomb", F.col("event_type").eqNullSafe("error")
    )
    # 2/3 checkpoint position; a single-scalar agg, not a data collect.
    split = e.agg((F.max("event_id") * 2 / 3).cast("long")).collect()[0][0]
    # NULL ids sort as minus-infinity in the merge order (apply_changes'
    # contract), so they belong to the PREFIX segment — a plain <= would
    # strand them in NEITHER segment and a key whose only write is
    # unkeyed would silently vanish from the snapshot (r10 NULL-id sweep)
    seg1 = e.filter(F.col("event_id").isNull() | (F.col("event_id") <= split))
    seg2 = e.filter(F.col("event_id") > split)
    snap = apply_changes(
        None, seg1, ["user_id"], "event_id", ["event_type", "value"], "_tomb"
    )
    merged = apply_changes(
        snap, seg2, ["user_id"], "event_id", ["event_type", "value"], "_tomb"
    )
    return merged.withColumnRenamed("event_id", "last_event_id")


#: The CEP "click within 2 hours after a view" contract in SQL — shared by
#: q57 (applyInPandasWithState) and q57b (transformWithStateInPandas with
#: event-time timers): both engines must hash-match the SAME batch
#: formulation, which is exactly the duality claim.
CEP_VIEW_CLICK_ORACLE = """
    WITH seq AS (
      -- the last prior base rides as ONE struct: a base whose event_id
      -- is NULL is still a base (ts and NULL id travel together); two
      -- separate IGNORE-NULLS lasts would skip its id but take its ts.
      -- NULLS LAST on the tie-break = the streaming fold's pandas sort
      -- (r10 NULL-id sweep).
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view'
                        THEN struct_pack(ts := ts, id := event_id) END
                        IGNORE NULLS) OVER w AS base
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, (base).id AS base_event_id,
           event_id AS trigger_event_id,
           (base).ts AS base_ts, ts AS trigger_ts,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT)
           - CAST(floor(extract(epoch FROM (base).ts)) AS BIGINT)
             AS lag_seconds
    FROM seq
    WHERE event_type = 'click' AND (base).ts IS NOT NULL
      AND ts - (base).ts <= INTERVAL '2 hours'
    """


@query(
    "q57_stream_pattern_match",
    oracle=CEP_VIEW_CLICK_ORACLE,
    tags=("streaming", "analytics", "cep", "stateful"),
)
def q57_stream_pattern_match(spark, sf_dir):
    """Streaming pattern detection (CEP): "click within 2 hours after a
    view" per user, run as a REAL stateful streaming query
    (``streaming/cep.py`` — ``applyInPandasWithState`` over the
    time-ordered replay, one base-event row of state per key). The oracle
    is the batch last-prior-base window formulation; hash equality proves
    the stream processed its per-key sequences in exact ``(ts, event_id)``
    order with bounded O(keys) state."""
    from fs2_kafka_streams_spark.streaming.cep import pattern_match_stream

    return pattern_match_stream(
        spark, sf_dir, base_type="view", trigger_type="click",
        gap="120 minutes",
    )


from fs2_kafka_streams_spark.streaming.stateful import HAS_TWS  # noqa: E402

if HAS_TWS:

    @query(
        "q57b_stream_pattern_tws_timers",
        oracle=CEP_VIEW_CLICK_ORACLE,
        tags=("streaming", "analytics", "cep", "stateful", "tws", "timers"),
    )
    def q57b_stream_pattern_tws_timers(spark, sf_dir):
        """q57 on the typed-state API with EVENT-TIME TIMERS
        (``streaming/cep.py::PatternTimerProcessor``): every base event
        arms a timer at ``base_ts + gap`` that DELETES the key's base state
        when the watermark passes it — the reference's wakeup-timeout
        discipline (``client/ConsumerAlgebra.scala:64-77``) as state
        expiry. Expiry is semantically neutral (an expired base could never
        match again), so the SAME q57 oracle hash-checks it; that the
        timers actually fire and clear state is asserted via the State Data
        Source in tests/test_cep_tws.py. Registered only where the API's
        protobuf dependency exists (q57 covers the tier otherwise)."""
        from fs2_kafka_streams_spark.streaming.cep import (
            pattern_match_stream_tws,
        )

        return pattern_match_stream_tws(
            spark, sf_dir, base_type="view", trigger_type="click",
            gap="120 minutes",
        )


@query(
    "q58_fuzzy_match",
    oracle="""
    WITH names AS (
      SELECT p_name AS n, CAST(min(p_partkey) AS BIGINT) AS id
      FROM part GROUP BY 1
    ),
    -- mirror the operator's skew guard (blocks > 10000 names dropped
    -- whole) so the two sides stay in lock-step at ANY scale factor:
    -- TPC-H first tokens are ~92 colors, so blocks grow linearly with SF
    -- and an unguarded oracle would keep pairs Spark cut
    b AS (
      SELECT id, n, tok FROM (
        SELECT id, n, split_part(n, ' ', 1) AS tok,
               count(*) OVER (PARTITION BY split_part(n, ' ', 1)) AS bs
        FROM names
      ) WHERE bs <= 10000
    )
    SELECT a.id AS id_a, c.id AS id_b, a.n AS name_a, c.n AS name_b,
           CAST(levenshtein(a.n, c.n) AS INTEGER) AS dist
    FROM b a JOIN b c
      ON a.tok = c.tok AND a.id < c.id
      AND abs(length(a.n) - length(c.n)) <= 4
    WHERE levenshtein(a.n, c.n) <= 4
    """,
    tags=("analytics", "dedup", "fuzzy", "entity-resolution"),
)
def q58_fuzzy_match(spark, sf_dir):
    """Entity resolution over the part-name vocabulary
    (``operators/fuzzy.py``): blocked fuzzy-match join — candidates from a
    first-token blocking key, verified with banded Levenshtein ≤ 4. The
    short-string counterpart of the shingle/LSH text-dedup family;
    O(n·blocks) candidate shuffle with a block-size skew guard (pinned to
    10 000 here and replayed in the oracle's qualifying CTE), and the
    thresholded DP (O(d·len) per pair) replays exactly in DuckDB's
    unthresholded ``levenshtein`` filtered to the same bound."""
    from fs2_kafka_streams_spark.operators.fuzzy import fuzzy_pairs

    p = Catalog(spark, sf_dir).part
    names = p.groupBy(F.col("p_name").alias("n")).agg(
        F.min("p_partkey").cast("bigint").alias("id")
    )
    return fuzzy_pairs(names, "n", "id", max_dist=4, max_block_size=10_000)


@query(
    "q59_stream_funnel_match",
    oracle="""
    WITH s1 AS (
      -- struct carry + NULLS LAST tie-break — see CEP_VIEW_CLICK_ORACLE
      -- (a NULL-id stage event is still a stage event; r10 NULL-id sweep)
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view'
                        THEN struct_pack(ts := ts, id := event_id) END
                        IGNORE NULLS) OVER w AS v
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), s2 AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN q
                        THEN struct_pack(ts := ts, id := event_id,
                                         v_ts := (v).ts, v_id := (v).id) END
                        IGNORE NULLS) OVER w AS c
      FROM (SELECT *, event_type = 'click' AND (v).ts IS NOT NULL
                      AND ts - (v).ts <= INTERVAL '12 hours' AS q
            FROM s1)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, (c).v_id AS view_event_id, (c).id AS click_event_id,
           event_id AS purchase_event_id, (c).v_ts AS view_ts,
           (c).ts AS click_ts, ts AS purchase_ts,
           CAST(floor(extract(epoch FROM ts)) AS BIGINT)
           - CAST(floor(extract(epoch FROM (c).v_ts)) AS BIGINT)
             AS total_lag_seconds
    FROM s2
    WHERE event_type = 'purchase' AND (c).ts IS NOT NULL
      AND ts - (c).ts <= INTERVAL '12 hours'
    """,
    tags=("streaming", "analytics", "cep", "funnel", "stateful"),
)
def q59_stream_funnel_match(spark, sf_dir):
    """3-stage streaming funnel (CEP): view → click → purchase, each hop
    within 12 hours, as a REAL stateful streaming query
    (``streaming/cep.py::funnel_match_stream``) — state per key is two
    rows (last view; last qualified click + its view), bounded forever.
    The oracle chains two last-prior-qualified windows; hash equality
    proves multi-stage pattern state carries correctly across
    micro-batches."""
    from fs2_kafka_streams_spark.streaming.cep import funnel_match_stream

    return funnel_match_stream(spark, sf_dir)
