"""Pins for the round-9 advisory findings (ADVICE.md, r9).

One test per advisory item, same contract as test_review_r8/r9_fixes.py:
the fix must be observable behavior, not a comment.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# r9 advisory #1 — dotted column names in the numeric bucket branch,
# bucket_width_report key_cols, and detect_hot_keys
# ---------------------------------------------------------------------------


def test_numeric_bucket_quotes_dotted_column(spark):
    """time_bucket_expr's numeric branch must backtick-quote the column
    name like the duration branch does — a dotted name ('t.s') otherwise
    misbinds as a struct-field reference and fails analysis."""
    from fs2_kafka_streams_spark.functions.buckets import time_bucket_expr

    df = spark.createDataFrame(
        pd.DataFrame({"t.s": [0.0, 5.0, 10.0], "k": [1, 1, 2]})
    )
    expr = time_bucket_expr(df.schema["t.s"].dataType, 4.0, "t.s")
    got = sorted(r[0] for r in df.select(expr.alias("b")).collect())
    assert got == [0, 1, 2]


def test_bucket_width_report_quotes_dotted_key_cols(spark):
    """bucket_width_report's key_cols go through the same quoting."""
    from fs2_kafka_streams_spark.functions.buckets import (
        bucket_width_report,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {"t": [0.0, 5.0, 10.0, 11.0], "grp.id": [1, 1, 2, 2]}
        )
    )
    rep = bucket_width_report(
        df, "t", 4.0, key_cols=["grp.id"], warn=False
    )
    assert rep["rows"] == 4
    # (key=1, b=0), (key=1, b=1), (key=2, b=2) x2
    assert rep["groups"] == 3
    assert rep["max_group_rows"] == 2


def test_detect_hot_keys_quotes_dotted_key(spark):
    """detect_hot_keys on a dotted key name groups on the COLUMN, not a
    struct field, and the returned values are the plain key values."""
    from fs2_kafka_streams_spark.operators.joins import detect_hot_keys

    df = spark.createDataFrame(
        pd.DataFrame({"user.id": [7] * 98 + [1, 2]})
    )
    assert detect_hot_keys(df, "user.id", share=0.5) == [7]


# ---------------------------------------------------------------------------
# r9 advisory #2 — detect_hot_keys releases its checkpoint blocks
# ---------------------------------------------------------------------------


def test_detect_hot_keys_releases_checkpoint_storage(spark):
    """The eager localCheckpoint inside detect_hot_keys must be
    unpersisted once both collects have read it: repeated detections in a
    long-lived session must not accumulate executor block storage."""
    from fs2_kafka_streams_spark.operators.joins import detect_hot_keys

    df = spark.createDataFrame(
        pd.DataFrame({"k": [0] * 90 + list(range(10))})
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for _ in range(3):
        assert detect_hot_keys(df, "k", share=0.5) == [0]
    assert jsc.getPersistentRDDs().size() <= before


# ---------------------------------------------------------------------------
# r9 advisory #3 — unknown trigger counts record None, not -1
# ---------------------------------------------------------------------------


def test_record_run_unknown_trigger_count_is_none():
    """If reading lastProgress throws, record_run must record None (JSON
    null) — a numeric sentinel like -1 silently skews any cross-round
    sum/diff of executed trigger counts."""
    from fs2_kafka_streams_spark.streaming import run as srun

    class _Boom:
        @property
        def lastProgress(self):
            raise RuntimeError("gone")

    seq_before = srun.RUN_SEQ
    srun.record_run("probe_none", _Boom())
    assert srun.RUN_SEQ == seq_before + 1
    rec = srun.RUN_TRACE[-1]
    assert rec["name"] == "probe_none"
    assert rec["n_triggers"] is None


# ---------------------------------------------------------------------------
# r9 advisory #4 — no CWD-relative source reads in tests
# ---------------------------------------------------------------------------


def test_no_cwd_relative_bench_open():
    """tests must resolve bench.py via the module, never open('bench.py')
    relative to the CWD (pytest may be invoked from anywhere)."""
    import pathlib

    here = pathlib.Path(__file__).parent
    needle = "open(" + '"bench.py")'  # split so this file never matches
    for p in here.glob("test_*.py"):
        assert needle not in p.read_text(), p.name
