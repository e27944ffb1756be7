"""Relational query surface (SURVEY §2 Part B, Q01–Q32).

Pure DataFrame/SQL — every operator compiles to Catalyst built-ins: predicate
pushdown, column pruning, join selection (broadcast vs sort-merge), and AQE
come for free. No RDDs, no Python row loops.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.canonical import (
    SQL_REVENUE,
    davg,
    dsum,
    dsum_expr,
    revenue_expr,
    sql_davg,
    sql_dsum,
    sql_dsum_expr,
)
from fs2_kafka_streams_spark.operators.asof_join import asof_join
from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from fs2_kafka_streams_spark.queries import query


def _cat(spark, sf_dir) -> Catalog:
    return Catalog(spark, sf_dir)


# --------------------------------------------------------------------------
# Q01–Q04: scan / project / filter / expression projection
# --------------------------------------------------------------------------


@query(
    "q01_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("scan",),
)
def q01_scan_project(spark, sf_dir):
    """Parquet scan + column projection; pruning reaches the reader."""
    return _cat(spark, sf_dir).region.select("r_regionkey", "r_name")


@query(
    "q02_filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
    """,
    tags=("filter",),
)
def q02_filter_conjunctive(spark, sf_dir):
    """Conjunctive predicates, pushed down to the parquet scan."""
    li = _cat(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.02, 0.08)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    )


@query(
    "q03_filter_in_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O') AND o_orderpriority IS NOT NULL
    """,
    tags=("filter",),
)
def q03_filter_in_null(spark, sf_dir):
    """IN-list + IS NULL predicates."""
    o = _cat(spark, sf_dir).orders
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "q04_project_expression",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           cast({SQL_REVENUE} as double) AS revenue
    FROM lineitem
    """,
    tags=("project",),
)
def q04_project_expression(spark, sf_dir):
    """Derived-column projection (revenue), computed exactly in decimal."""
    li = _cat(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue_expr().cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Q05–Q12: the join family
# --------------------------------------------------------------------------


@query(
    "q05_join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def q05_join_inner(spark, sf_dir):
    """Inner equi-join; Catalyst/AQE picks broadcast vs sort-merge by size."""
    c = _cat(spark, sf_dir)
    return c.orders.join(
        c.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name")


@query(
    "q06_join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join",),
)
def q06_join_broadcast(spark, sf_dir):
    """Broadcast hash join: the small dim ships to every task — no shuffle of
    the big side. At 100 TB this is the only sane plan for dim joins."""
    c = _cat(spark, sf_dir)
    return c.nation.join(
        F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name", "r_name")


@query(
    "q07_join_multiway",
    oracle=f"""
    SELECT n_name, {sql_dsum_expr(SQL_REVENUE)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "agg"),
)
def q07_join_multiway(spark, sf_dir):
    """lineitem ⋈ orders ⋈ customer ⋈ nation → revenue per nation.

    Fact-to-fact joins shuffle on their keys; the nation dim is broadcast.
    """
    c = _cat(spark, sf_dir)
    return (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum_expr(revenue_expr()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q08_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    tags=("join",),
)
def q08_join_left_outer(spark, sf_dir):
    """Left outer join — customers without orders survive with NULLs
    (the reference's enrichment-miss semantics: Option[V] = None,
    ``ReadOnlyTableSpec.scala:77-79``)."""
    c = _cat(spark, sf_dir)
    return c.customer.join(
        c.orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q08b_join_full_outer",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
    """,
    tags=("join",),
)
def q08b_join_full_outer(spark, sf_dir):
    c = _cat(spark, sf_dir)
    return c.customer.join(
        c.orders, F.col("c_custkey") == F.col("o_custkey"), "full"
    ).select("c_custkey", "o_orderkey")


@query(
    "q09_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def q09_join_semi(spark, sf_dir):
    """Left semi join (EXISTS)."""
    c = _cat(spark, sf_dir)
    return c.customer.join(
        c.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q10_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def q10_join_anti(spark, sf_dir):
    """Left anti join (NOT EXISTS)."""
    c = _cat(spark, sf_dir)
    return c.customer.join(
        c.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q11_join_range",
    oracle=f"""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem JOIN part
      ON p_partkey = l_partkey AND l_quantity < p_size
    GROUP BY p_brand
    """,
    tags=("join",),
)
def q11_join_range(spark, sf_dir):
    """Equi-join with a range residual (theta) predicate — stays a hash/SMJ
    join on the equi key with the range condition as a post-filter, never a
    cartesian product."""
    c = _cat(spark, sf_dir)
    return (
        c.lineitem.join(
            c.part,
            (F.col("p_partkey") == F.col("l_partkey"))
            & (F.col("l_quantity") < F.col("p_size")),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "q12_join_asof",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           r.o_orderkey, r.o_orderdate, r.o_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    tags=("join", "asof"),
)
def q12_join_asof(spark, sf_dir):
    """As-of join: each event enriched with the customer's latest order
    at-or-before the event time (the reference's stream-table join
    re-expressed on event time, ``ReadOnlyTableSpec.scala:77-79``).

    The right side is deduplicated to one row per (custkey, orderdate) so
    ties are deterministic on both engines.
    """
    c = _cat(spark, sf_dir)
    latest_order = latest_by_key(
        c.orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        key_cols=["o_custkey", "o_orderdate"],
        order_cols=["o_orderkey"],
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return asof_join(
        c.events.select("event_id", "user_id", "ts"),
        latest_order,
        left_time="ts",
        right_time="o_orderdate",
        left_by=["user_id"],
        right_by=["o_custkey"],
        right_values=["o_orderkey", "o_orderdate", "o_totalprice"],
    )


# --------------------------------------------------------------------------
# Q13–Q16: aggregation family
# --------------------------------------------------------------------------


@query(
    "q13_agg_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum_expr(SQL_REVENUE)} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q13_agg_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: hash aggregate with partial (map-side) aggregation —
    shuffle volume is O(groups), not O(rows)."""
    li = _cat(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum_expr(revenue_expr()).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q14_count_distinct",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY 1
    """,
    tags=("agg",),
)
def q14_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) per month — Spark expands to a two-stage aggregate."""
    li = _cat(spark, sf_dir).lineitem
    return li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    ).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q15_approx_count_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           true AS within_tol
    FROM orders
    """,
    tags=("agg", "approx"),
)
def q15_approx_count_distinct(spark, sf_dir):
    """HLL++ approximate distinct. The sketch differs between engines, so the
    hash-checked contract is (exact count, approx-within-5%-of-exact)."""
    o = _cat(spark, sf_dir).orders
    return o.agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
    ).select(
        "n_exact",
        (
            F.abs(F.col("_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_tol"),
    )


@query(
    "q16_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('c_acctbal')} AS sum_bal,
           CAST(count(*) AS BIGINT) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg",),
)
def q16_rollup(spark, sf_dir):
    """ROLLUP grouping sets (region → nation hierarchy)."""
    c = _cat(spark, sf_dir)
    return (
        c.customer.join(
            F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            dsum("c_acctbal").alias("sum_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "q16b_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum('o_totalprice')} AS sum_price,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def q16b_cube(spark, sf_dir):
    """CUBE grouping sets."""
    o = _cat(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q17_latest_by_key",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("core", "agg"),
)
def q17_latest_by_key(spark, sf_dir):
    """Latest event per user — the reference's table materialization (A7).

    Reference: fold-changelog-into-map, last write wins
    (``streams/Tables.scala:46-70``, ``streams/Table.scala:52-56``); "last" =
    highest (ts, event_id). One hash aggregation via ``max_by`` — shuffle
    volume O(distinct users), not O(events).
    """
    events = Catalog(spark, sf_dir).events
    return latest_by_key(
        events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_id", "ts", "event_type", "value", "props"],
    )
