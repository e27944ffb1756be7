"""Changelog → SCD2 history: interval correctness, tombstone semantics,
point-in-time snapshots, and duality with latest_by_key (the reference's
table head, ``streams/Tables.scala:46-70``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from fs2_kafka_streams_spark.operators.scd import as_of, changelog_history
from tests.conftest import SF_SMOKE


def _changelog(spark):
    rows = [
        # key, offset, value, dead
        ("a", 1, "a1", False),
        ("a", 3, "a3", False),
        ("a", 7, "a7", False),
        ("b", 2, "b2", False),
        ("b", 5, None, True),   # tombstone: b deleted at offset 5
        ("c", 4, "c4", False),
        ("c", 6, "c6", False),
    ]
    return spark.createDataFrame(
        rows, "key string, off long, val string, dead boolean"
    )


def test_history_intervals_and_tombstones(spark):
    h = changelog_history(
        _changelog(spark), ["key"], "off", ["val"], tombstone_col="dead"
    )
    got = {
        (r["key"], r["valid_from"]): (r["val"], r["valid_to"], r["is_current"])
        for r in h.collect()
    }
    assert got == {
        ("a", 1): ("a1", 3, False),
        ("a", 3): ("a3", 7, False),
        ("a", 7): ("a7", None, True),
        # b2's interval is CLOSED by the tombstone, which emits no row
        ("b", 2): ("b2", 5, False),
        ("c", 4): ("c4", 6, False),
        ("c", 6): ("c6", None, True),
    }


def test_as_of_snapshots(spark):
    h = changelog_history(
        _changelog(spark), ["key"], "off", ["val"], tombstone_col="dead"
    )
    snap = lambda t: {
        (r["key"], r["val"]) for r in as_of(h, F.lit(t)).collect()
    }
    assert snap(0) == set()
    assert snap(2) == {("a", "a1"), ("b", "b2")}
    assert snap(4) == {("a", "a3"), ("b", "b2"), ("c", "c4")}
    assert snap(5) == {("a", "a3"), ("c", "c4")}  # b deleted at 5
    assert snap(9) == {("a", "a7"), ("c", "c6")}


def test_current_slice_equals_latest_by_key(spark):
    """history.filter(is_current) must equal the latest_by_key fold on the
    real events changelog (user_id keyed, event_id ordered) — the SCD2 view
    and the table head are two projections of one changelog."""
    from fs2_kafka_streams_spark.catalog import Catalog

    ev = Catalog(spark, SF_SMOKE).events.select("user_id", "event_id", "value")
    h = changelog_history(ev, ["user_id"], "event_id", ["value"])
    current = {
        (r["user_id"], r["valid_from"], r["value"])
        for r in h.filter("is_current").collect()
    }
    head = {
        (r["user_id"], r["event_id"], r["value"])
        for r in latest_by_key(
            ev, ["user_id"], ["event_id"], ["event_id", "value"]
        ).collect()
    }
    assert current == head

    # intervals chain: within a key, valid_to == next valid_from, one open
    rows = sorted(
        ((r["user_id"], r["valid_from"], r["valid_to"]) for r in h.collect())
    )
    by_key: dict = {}
    for k, vf, vt in rows:
        by_key.setdefault(k, []).append((vf, vt))
    for chain in by_key.values():
        for (_, vt), (nvf, _) in zip(chain, chain[1:]):
            assert vt == nvf
        assert chain[-1][1] is None
        assert all(vt is not None for _, vt in chain[:-1])


def test_history_matches_duckdb_oracle(spark):
    """Cross-check the events-table history against an independent DuckDB
    window formulation (same lead-over-key semantics)."""
    import duckdb

    from fs2_kafka_streams_spark.catalog import Catalog

    ev = Catalog(spark, SF_SMOKE).events.select("user_id", "event_id", "value")
    h = changelog_history(ev, ["user_id"], "event_id", ["value"])
    # raw values, no rounding: both engines read the SAME parquet doubles
    # and carry them through untouched, so they are bit-identical — and
    # Python round() (half-to-even) vs DuckDB round() (half-away-from-
    # zero) can disagree by 1e-9 at boundary doubles
    got = sorted(
        (r["user_id"], r["valid_from"], r["valid_to"], r["value"])
        for r in h.collect()
    )
    want = sorted(
        duckdb.sql(
            f"""
            SELECT user_id, event_id AS valid_from,
                   lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
                     AS valid_to,
                   value
            FROM read_parquet('{SF_SMOKE}/events.parquet')
            """
        ).fetchall()
    )
    assert got == want


# ---- salt-window-stitch (order_bucket) equality ---------------------------


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_bucketed_history_matches_default_small(spark):
    """Every interval boundary crosses or sits inside some bucket for at
    least one of these widths, including the tombstone closing b's
    interval from a different bucket."""
    ev = _changelog(spark)
    base = changelog_history(
        ev, ["key"], "off", ["val"], tombstone_col="dead"
    )
    for width in (1, 2, 5, 100):
        got = changelog_history(
            ev, ["key"], "off", ["val"], tombstone_col="dead",
            order_bucket=width,
        )
        assert _rows(got) == _rows(base), width


def test_bucketed_history_matches_default_hot_corpus(spark):
    """Hot-key corpus (the skew case the stitch exists for) + NULL key +
    empty buckets between a key's writes."""
    import numpy as np

    rng = np.random.default_rng(5)
    n = 3000
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(100, 150, n))
    offs = rng.permutation(np.arange(1, n + 1)) * 3  # gaps -> empty buckets
    dead = rng.random(n) < 0.05
    rows = [
        (int(k) if i % 500 else None, int(o), f"v{o}", bool(d))
        for i, (k, o, d) in enumerate(zip(keys, offs, dead))
    ]
    ev = spark.createDataFrame(
        rows, "key long, off long, val string, dead boolean"
    )
    base = changelog_history(ev, ["key"], "off", ["val"], tombstone_col="dead")
    got = changelog_history(
        ev, ["key"], "off", ["val"], tombstone_col="dead", order_bucket=50
    )
    assert _rows(got) == _rows(base)


def test_bucketed_history_timestamp_order(spark):
    """Duration-string buckets on a timestamp order column, q53's shape:
    events at sf0.001 with a (ts, event_id)-derived unique order."""
    from fs2_kafka_streams_spark.catalog import Catalog

    ev = Catalog(spark, SF_SMOKE).events.select(
        "user_id", "ts", "event_type", "value"
    )
    base = changelog_history(ev, ["user_id"], "ts", ["event_type", "value"])
    got = changelog_history(
        ev, ["user_id"], "ts", ["event_type", "value"],
        order_bucket="6 hours",
    )
    assert _rows(got) == _rows(base)


def test_bucketed_history_null_orders_within_contract(spark):
    """NULL order values (r8 probe): a NULL-order row sorts first for its
    key in BOTH plans — in the bucketed plan it lands alone in the NULL
    bucket and the stitch hands it the first real write, exactly what
    lead() sees in the default plan. The uniqueness contract extends to
    NULLs (at most one NULL-order row per key): with duplicate NULLs the
    default plan's lead over tied rows is already nondeterministic, and
    the bucketed plan may additionally conflate a tied-NULL lead with
    end-of-slice — documented, not supported."""
    rows = [
        (1, None, "n1", False), (1, 5, "a", False), (1, 9, None, True),
        (2, None, "z", False), (None, 3, "nk", False), (3, None, "o", True),
    ]
    ev = spark.createDataFrame(rows, "key long, off long, val string, dead boolean")
    base = changelog_history(ev, ["key"], "off", ["val"], tombstone_col="dead")
    for width in (1, 4, 100):
        got = changelog_history(
            ev, ["key"], "off", ["val"], tombstone_col="dead",
            order_bucket=width,
        )
        assert _rows(got) == _rows(base), width
