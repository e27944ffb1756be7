"""Bucketed (skew-bounded) as-of join ≡ unbucketed path.

The ``time_bucket`` option trades the per-KEY window sort (unsplittable
under a hot key) for per-(key, time-bucket) sorts plus a carry-in row per
bucket. These tests prove exact equality with the default path on q12's
own shape (sf0.001) and on adversarial synthetics: right-time ties,
NULL times/keys, buckets with no right rows (multi-bucket carry), and a
hot key.
"""

from __future__ import annotations

import datetime as dt

import pytest

from fs2_kafka_streams_spark.operators.asof_join import asof_join
from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_bucketed_matches_default_on_q12_shape(spark):
    from fs2_kafka_streams_spark.catalog import Catalog

    c = Catalog(spark, SF_SMOKE)
    latest_order = latest_by_key(
        c.orders.select(
            "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
        ),
        key_cols=["o_custkey", "o_orderdate"],
        order_cols=["o_orderkey"],
        value_cols=["o_orderkey", "o_totalprice"],
        unique_order=True,
    )
    kwargs = dict(
        left_time="ts",
        right_time="o_orderdate",
        left_by=["user_id"],
        right_by=["o_custkey"],
        right_values=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    left = c.events.select("event_id", "user_id", "ts")
    base = asof_join(left, latest_order, **kwargs)
    for bucket in ("1 hour", "2400 hours"):  # sub-day and ~coarser-than-data
        got = asof_join(
            left, latest_order, time_bucket=bucket, **kwargs
        )
        assert _sorted_rows(got) == _sorted_rows(base), bucket


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def adversarial(spark):
    # key 1: hot probe side; right rows sparse -> carry across many empty
    # buckets. key 2: right-time TIES (two rows at the same ts). key 3:
    # right rows only after every probe (all unmatched). NULLs both sides.
    left_rows = (
        [(i, 1, _ts("2024-03-01 00:00:00") + dt.timedelta(minutes=i))
         for i in range(200)]
        + [(900, 2, _ts("2024-03-01 05:00:00")),
           (901, 2, _ts("2024-03-02 05:00:00")),
           (902, 3, _ts("2024-03-01 00:30:00")),
           (903, None, _ts("2024-03-01 01:00:00")),
           (904, 4, None)]
    )
    right_rows = [
        (1, _ts("2024-03-01 00:10:00"), "r1a"),
        (1, _ts("2024-03-01 02:59:00"), "r1b"),
        (2, _ts("2024-03-01 05:00:00"), "tie_a"),
        (2, _ts("2024-03-01 05:00:00"), "tie_b"),
        (3, _ts("2024-03-01 23:00:00"), "late"),
        (None, _ts("2024-03-01 00:00:00"), "nullkey"),
        (4, None, "nulltime"),
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        right_rows, "r_user long, r_ts timestamp_ntz, payload string"
    )
    return left, right


@pytest.mark.parametrize("bucket", ["30 seconds", "17 minutes", "1 hour", "48 hours"])
def test_bucketed_matches_default_adversarial(spark, adversarial, bucket):
    left, right = adversarial
    kwargs = dict(
        left_time="ts", right_time="r_ts",
        left_by=["user_id"], right_by=["r_user"],
        right_values=["r_ts", "payload"],
    )
    base = asof_join(left, right, **kwargs)
    got = asof_join(left, right, time_bucket=bucket, **kwargs)
    assert _sorted_rows(got) == _sorted_rows(base)
    # sanity on the semantics themselves, not just path equality
    by_id = {r["event_id"]: r["payload"] for r in got.collect()}
    assert by_id[0] is None           # probe before any right row
    assert by_id[15] == "r1a"         # within-bucket / carry-in match
    assert by_id[199] == "r1b"        # latest right row carried forward
    assert by_id[900] in ("tie_b",)   # tie -> greatest payload struct
    assert by_id[902] is None         # right rows all later
    assert by_id[903] is None         # NULL key never matches
    assert by_id[904] is None         # NULL probe time never matches


def test_numeric_time_bucketed(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 55.0), (2, 7.0)], "k long, t double"
    )
    right = spark.createDataFrame(
        [(1, 9.5, "a"), (1, 54.0, "b"), (2, 8.0, "c")],
        "k long, rt double, v string",
    )
    kwargs = dict(
        left_time="t", right_time="rt", left_by=["k"], right_by=["k"],
        right_values=["v"],
    )
    base = asof_join(left, right, **kwargs)
    got = asof_join(left, right, time_bucket=10, **kwargs)
    assert _sorted_rows(got) == _sorted_rows(base)


def test_bucket_kind_mismatch_raises(spark):
    left = spark.createDataFrame([(1, 10.0)], "k long, t double")
    right = spark.createDataFrame([(1, 9.5, "a")], "k long, rt double, v string")
    with pytest.raises(ValueError, match="numeric width"):
        asof_join(
            left, right, "t", "rt", ["k"], ["k"], ["v"],
            time_bucket="1 hour",
        )
    tleft = spark.createDataFrame(
        [(1, _ts("2024-03-01 00:00:00"))], "k long, t timestamp_ntz"
    )
    tright = spark.createDataFrame(
        [(1, _ts("2024-03-01 00:00:00"), "a")],
        "k long, rt timestamp_ntz, v string",
    )
    with pytest.raises(ValueError, match="duration string"):
        asof_join(
            tleft, tright, "t", "rt", ["k"], ["k"], ["v"], time_bucket=10
        )


def test_date_time_columns_bucketed(spark):
    """DATE time columns (r8: time_bucket_expr accepts DateType — a date
    reads as its midnight in timestampdiff, so DATE and timestamp sides
    bucket on the same scale): date-date and mixed ntz-date both equal
    the unbucketed path, including a pre-epoch date (negative micros,
    floor keeps bucketing monotone)."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, "2024-03-05"), (1, "2024-03-20"), (2, "1969-12-30"),
         (2, "1970-01-02")],
        "k long, t string",
    ).select("k", F.col("t").cast("date").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-03-10", "a"), (2, "1969-12-29", "pre")],
        "k long, rt string, v string",
    ).select("k", F.col("rt").cast("date").alias("rt"), "v")
    kwargs = dict(
        left_time="t", right_time="rt", left_by=["k"], right_by=["k"],
        right_values=["v"],
    )
    base = asof_join(left, right, **kwargs)
    for bucket in ("12 hours", "3 days", "720 hours"):
        got = asof_join(left, right, time_bucket=bucket, **kwargs)
        assert _sorted_rows(got) == _sorted_rows(base), bucket

    # mixed: timestamp_ntz probes against DATE right times
    tleft = spark.createDataFrame(
        [(1, "2024-03-05 01:30:00"), (1, "2024-03-20 23:00:00")],
        "k long, t string",
    ).select("k", F.col("t").cast("timestamp_ntz").alias("t"))
    base_m = asof_join(tleft, right, **kwargs)
    got_m = asof_join(tleft, right, time_bucket="7 hours", **kwargs)
    assert _sorted_rows(got_m) == _sorted_rows(base_m)


def test_date_order_scd_bucketed(spark):
    import pyspark.sql.functions as F

    from fs2_kafka_streams_spark.operators.scd import changelog_history

    ev = spark.createDataFrame(
        [(1, "2024-01-01", "a", False), (1, "2024-02-15", "b", False),
         (1, "2024-03-01", None, True), (2, "2024-01-20", "x", False)],
        "k long, d string, val string, dead boolean",
    ).select("k", F.col("d").cast("date").alias("d"), "val", "dead")
    base = changelog_history(ev, ["k"], "d", ["val"], tombstone_col="dead")
    got = changelog_history(
        ev, ["k"], "d", ["val"], tombstone_col="dead", order_bucket="10 days"
    )
    assert _sorted_rows(got) == _sorted_rows(base)
