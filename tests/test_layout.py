"""Z-order layout: multi-dimensional min-max pruning must beat linear.

The operator's whole value claim is "files are tight in every ordered
dimension, so footer statistics prune multi-dimensional slices". The
test writes the SAME events data three ways — unclustered, linearly
sorted by ts, z-ordered by (ts, user_id) — and replays a 2-D box
predicate against the parquet footers:

- a box narrow in ``user_id`` but wide in ``ts`` must scan almost every
  linear file (ts sort can't help the user dimension) but a strict
  subset of the z-ordered files;
- a box narrow in ``ts`` must still prune well under z-order (the curve
  trades per-dimension tightness, it doesn't give one dimension away).
"""

from __future__ import annotations

import datetime

import pytest

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.operators.layout import (
    pruning_report,
    write_zordered,
    zorder_code,
)

from tests.conftest import SF_CORRECT

SF = SF_CORRECT
N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    e = Catalog(spark, SF).events.select("event_id", "ts", "user_id", "value")
    paths = {
        "unclustered": str(base / "plain"),
        "linear_ts": str(base / "linear"),
        "zorder": str(base / "zorder"),
    }
    e.repartition(N_FILES).write.mode("overwrite").parquet(paths["unclustered"])
    (
        e.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(paths["linear_ts"])
    )
    write_zordered(e, paths["zorder"], ["ts", "user_id"], n_files=N_FILES)
    return paths


def _box(ts_lo, ts_hi, uid_lo, uid_hi):
    # parquet stats for int96/int64 timestamps surface as datetimes
    return {
        "ts": (datetime.datetime.fromisoformat(ts_lo),
               datetime.datetime.fromisoformat(ts_hi)),
        "user_id": (uid_lo, uid_hi),
    }


def test_zorder_preserves_rows(spark, layouts):
    orig = Catalog(spark, SF).events.count()
    assert spark.read.parquet(layouts["zorder"]).count() == orig


def test_narrow_user_wide_ts_box(layouts):
    """ts sort is blind to user_id; z-order must prune where linear can't."""
    box = _box("2024-01-01", "2024-01-31", uid_lo=100, uid_hi=120)
    lin = pruning_report(layouts["linear_ts"], box)
    z = pruning_report(layouts["zorder"], box)
    assert lin["files_total"] == z["files_total"] == N_FILES
    assert lin["scan_fraction"] >= 0.9  # linear layout can't prune this box
    assert z["files_scanned"] < lin["files_scanned"]
    assert z["scan_fraction"] <= 0.5


def test_narrow_ts_box_still_prunes(layouts):
    """z-order trades tightness across dims — a ts slice must still skip
    a meaningful share of files (never win one dim by giving up the other)."""
    box = _box("2024-01-05", "2024-01-08", uid_lo=0, uid_hi=10**9)
    z = pruning_report(layouts["zorder"], box)
    assert z["scan_fraction"] <= 0.75


def test_unclustered_baseline_scans_everything(layouts):
    box = _box("2024-01-05", "2024-01-08", uid_lo=100, uid_hi=120)
    plain = pruning_report(layouts["unclustered"], box)
    assert plain["scan_fraction"] >= 0.9


def test_zorder_code_is_deterministic_and_bounded(spark):
    e = Catalog(spark, SF).events
    z1 = e.select(zorder_code(e, ["ts", "user_id"], bits_per_col=8))
    stats = z1.selectExpr(
        "min(_zorder) AS lo", "max(_zorder) AS hi", "count(*) AS n"
    ).first()
    assert 0 <= stats.lo <= stats.hi < (1 << 16)
    z2 = e.select(zorder_code(e, ["ts", "user_id"], bits_per_col=8))
    assert z1.exceptAll(z2).count() == 0


def test_too_many_bits_rejected(spark):
    e = Catalog(spark, SF).events
    with pytest.raises(ValueError):
        zorder_code(e, ["ts", "user_id"], bits_per_col=32)
