"""Pins for the round-11 verdict/advisory findings (VERDICT.md "Next
round" + ADVICE.md, r11) implemented in the r12 optimization round.

Same contract as test_review_r8..r11_fixes.py: every fix must be
observable behavior, not a comment.
"""

from __future__ import annotations

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# r11 VERDICT Next #5 — materialize(): reliable .checkpoint() when a
# checkpoint dir is configured, localCheckpoint otherwise
# ---------------------------------------------------------------------------


def test_materialize_local_arm(spark):
    """Without a checkpoint dir the fallback is localCheckpoint: the
    result is a truncated-lineage frame with the same rows."""
    from fs2_kafka_streams_spark.operators.util import materialize

    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(10).selectExpr("id", "id * 2 AS y")
    out = materialize(df)
    # lineage truncated to an RDD scan (a reliable .checkpoint() without a
    # dir would have raised, so success here proves the LOCAL arm ran)
    assert "LogicalRDD" in out._jdf.queryExecution().analyzed().toString()
    assert sorted(r.y for r in out.collect()) == [2 * k for k in range(10)]


def test_materialize_reliable_arm(spark, tmp_path):
    """With a checkpoint dir configured, materialize uses the RELIABLE
    checkpoint (recoverable on executor loss) and writes under the dir."""
    from fs2_kafka_streams_spark.operators.util import materialize

    ckdir = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckdir)
    try:
        df = spark.range(10).selectExpr("id", "id * 3 AS y")
        out = materialize(df)
        assert (
            "LogicalRDD" in out._jdf.queryExecution().analyzed().toString()
        )
        assert sorted(r.y for r in out.collect()) == [3 * k for k in range(10)]
        # the RELIABLE arm writes the blocks under the configured dir
        assert any(Path(ckdir).rglob("*")), "no checkpoint files written"
    finally:
        # PySpark exposes no unsetCheckpointDir; clear via the JVM so the
        # session-scoped fixture does not leak the dir into other tests
        getattr(spark._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.apply(None)
        )
        assert spark.sparkContext.getCheckpointDir() is None


# ---------------------------------------------------------------------------
# r11 ADVICE #3 — the width guard is shared public infrastructure now
# ---------------------------------------------------------------------------


def test_spread_promoted_and_aliased(spark):
    from fs2_kafka_streams_spark.operators import dedup
    from fs2_kafka_streams_spark.operators.util import spread

    assert dedup._spread is spread
    # a plan that already has >= defaultParallelism partitions after a
    # shuffle is returned untouched (no gratuitous extra exchange)
    n = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(n)
    assert spread(df) is df


# ---------------------------------------------------------------------------
# r11 ADVICE #2 — analyze() must not clobber a caller-owned __tok column
# ---------------------------------------------------------------------------


def test_analyze_tok_collision_guard(spark):
    from fs2_kafka_streams_spark.operators.text import analyze

    df = spark.createDataFrame(
        [(1, "hello world hello", "keep me")],
        "doc_id long, text string, __tok string",
    )
    out = analyze(df)
    assert "__tok" in out.columns
    row = out.collect()[0]
    assert row["__tok"] == "keep me"
    assert row["n_tokens"] == 3


# ---------------------------------------------------------------------------
# r12 q73/q49b restructures — the oracle strings must stay byte-identical
# to the r11 declarations (the builds changed, the contracts did not)
# ---------------------------------------------------------------------------


def test_q73_oracle_text_unchanged():
    from fs2_kafka_streams_spark.queries import extensions as e

    assert e._Q73_SQL == """
    WITH RECURSIVE users AS (
      SELECT user_id AS id,
             -- measure domain guard (canonical.sql_measure): identical
             -- SQL runs on BOTH engines, and a non-finite value otherwise
             -- throws differently on each (r10 extreme-numerics sweep)
             CAST(sum(CAST(round((CASE WHEN abs(value) < 1e14 THEN value END) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tree(anc, node) AS (
      SELECT id, id FROM users
      UNION ALL
      SELECT t.anc, u.id
      FROM tree t JOIN users u
        ON CAST(floor(u.id / 2.0) AS BIGINT) = t.node AND u.id <> t.node
    )
    SELECT t.anc AS user_id,
           CAST(count(*) AS BIGINT) AS n_subtree,
           CAST(sum(u.cents) AS DOUBLE) / 100.0 AS subtree_revenue
    FROM tree t JOIN users u ON t.node = u.id
    GROUP BY 1
"""


def test_q49b_oracle_text_unchanged():
    from fs2_kafka_streams_spark.canonical import sql_dsum
    from fs2_kafka_streams_spark.queries import relational as r

    assert r._Q49B_SQL == f"""
WITH big_orders AS (
  SELECT o_custkey, {sql_dsum('o_totalprice')} AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_big_spenders
FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
WHERE b.total_spend > (SELECT avg(total_spend) FROM big_orders)
GROUP BY c.c_mktsegment
"""


def test_q73_matches_batch_oracle_at_smoke_scale(spark):
    """The materialized-users build equals the verbatim-CTE build row for
    row at sf0.001 (the in-suite equivalence check; the sf0.01 DuckDB
    hash check runs in the driver contract)."""
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.queries import extensions as e

    sf = "/root/testdata/sf0.001"
    new = e.q73_recursive_cte.__wrapped__ if hasattr(
        e.q73_recursive_cte, "__wrapped__"
    ) else e.q73_recursive_cte
    got = new(spark, sf)
    Catalog(spark, sf).register_views()
    want = spark.sql(e._Q73_SQL)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# r11 VERDICT #7 — per-cpu-count bench artifact twin
# ---------------------------------------------------------------------------


def test_bench_writes_per_cpu_artifact_source():
    src = (REPO / "bench.py").read_text()
    assert 'BENCH_FULL_c{cpus}.json' in src
    assert '"BENCH_FULL.json"' in src  # the unchanged primary remains
