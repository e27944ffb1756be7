"""apply_changes (incremental MERGE) must equal the full-changelog fold
for any split of the log — the reference's committed-offset recovery
contract (never rescan the prefix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.operators.incremental import apply_changes
from tests.conftest import SF_SMOKE

KEY, ORDER, VALS = ["user_id"], "event_id", ["event_type", "value"]


def _full_fold(spark, e):
    return apply_changes(None, e, KEY, ORDER, VALS, "_tomb")


def _events(spark):
    return Catalog(spark, SF_SMOKE).events.withColumn(
        "_tomb", F.col("event_type") == "error"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("splits", [(0.5,), (0.2, 0.8), (0.33, 0.5, 0.9)])
def test_chained_apply_equals_full_fold(spark, splits):
    e = _events(spark)
    lo, hi = [
        r[0] for r in e.agg(F.min("event_id")).collect()
    ][0], [r[0] for r in e.agg(F.max("event_id")).collect()][0]
    cuts = [int(lo + (hi - lo) * s) for s in splits]
    bounds = list(zip([lo - 1] + cuts, cuts + [hi]))
    snap = None
    for a, b in bounds:
        seg = e.filter((F.col(ORDER) > a) & (F.col(ORDER) <= b))
        snap = apply_changes(snap, seg, KEY, ORDER, VALS, "_tomb")
    assert _rows(snap) == _rows(_full_fold(spark, e))


def test_delete_of_missing_key_is_noop_and_resurrection_works(spark):
    sc = spark
    log1 = sc.createDataFrame(
        [(1, 10, "a", 1.0, False), (2, 11, "b", 2.0, True)],
        "k int, off int, t string, v double, dead boolean",
    )
    # delta: delete missing key 9 (no-op), delete 1, re-create 2
    log2 = sc.createDataFrame(
        [(9, 20, None, None, True), (1, 21, None, None, True),
         (2, 22, "b2", 4.0, False)],
        "k int, off int, t string, v double, dead boolean",
    )
    snap = apply_changes(None, log1, ["k"], "off", ["t", "v"], "dead")
    assert _rows(snap) == [(1, "a", 1.0, 10)]
    out = apply_changes(snap, log2, ["k"], "off", ["t", "v"], "dead")
    assert _rows(out) == [(2, "b2", 4.0, 22)]


def test_snapshot_only_keys_pass_through_null_safe(spark):
    # a delta writing NULL values must still overwrite (NULL is a value,
    # not "absent") — the merge gates on the delta's order col, not values
    log1 = spark.createDataFrame(
        [(1, 10, "a", 1.0, False)], "k int, off int, t string, v double, dead boolean"
    )
    log2 = spark.createDataFrame(
        [(1, 20, None, None, False)], "k int, off int, t string, v double, dead boolean"
    )
    snap = apply_changes(None, log1, ["k"], "off", ["t", "v"], "dead")
    out = apply_changes(snap, log2, ["k"], "off", ["t", "v"], "dead")
    assert _rows(out) == [(1, None, None, 20)]
