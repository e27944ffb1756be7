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
# r10 cold review — streaming/replay.py
# ---------------------------------------------------------------------------


def _write_parquet(path, frame):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(frame), path)
    return str(path)


def test_replay_null_ids_raise_not_vanish(tmp_path):
    """A NULL id used to convert to NaN, NaN % n matched no bucket, and
    the row silently vanished from every replay file — breaking the
    multiset equality the harness rests on. Must raise loudly instead."""
    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    frame = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, None], dtype="Int64"),
            "v": [1.0, 2.0, 3.0],
        }
    )
    _write_parquet(tmp_path / "t.parquet", frame)
    with pytest.raises(ValueError, match="NULL"):
        replay_dir(
            str(tmp_path), "t", cache_root=str(tmp_path / "cache")
        )


def test_replay_cache_keyed_on_id_col(tmp_path):
    """Two replays of the SAME table with DIFFERENT id columns must not
    share a cache directory — the second caller would silently get the
    first caller's bucket split."""
    import pyarrow.parquet as pq

    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    frame = pd.DataFrame(
        {"a": [0, 1, 2, 3, 4, 5, 6, 7], "b": [0, 0, 0, 0, 1, 1, 1, 1]}
    )
    _write_parquet(tmp_path / "t.parquet", frame)
    cache = str(tmp_path / "cache")
    d_a = replay_dir(str(tmp_path), "t", id_col="a", cache_root=cache)
    d_b = replay_dir(str(tmp_path), "t", id_col="b", cache_root=cache)
    assert d_a != d_b
    # and the b-split really is keyed on b: bucket 1 holds b % 4 == 1
    import pathlib

    f1 = sorted(pathlib.Path(d_b).glob("part-*.parquet"))[1]
    got = pq.read_table(f1).column("b").to_pylist()
    assert got == [1, 1, 1, 1]


# ---------------------------------------------------------------------------
# r10 cold review — queries/merged.py join-merge adapter
# ---------------------------------------------------------------------------


def test_join_merge_rejects_overlapping_value_columns(spark):
    """A non-key column shared by two join-merged variants would ride the
    USING join twice under the same name and make the driver's
    sort-by-name hash ambiguous — the adapter must fail loudly at build
    time instead."""
    from fs2_kafka_streams_spark.queries import REGISTRY
    from fs2_kafka_streams_spark.queries.merged import _join_build

    # two registered variants that genuinely share a value column name
    build = _join_build(
        ["o_custkey", "o_orderkey"],
        ["q19_window_ranking", "q19_window_ranking"],
    )
    assert "q19_window_ranking" in REGISTRY
    with pytest.raises(ValueError, match="appears in both"):
        build(spark, "/root/testdata/sf0.001")


def test_join_merges_have_disjoint_value_columns(spark):
    """Every registered join-merge builds clean under the new guard (the
    current merges all have disjoint value columns)."""
    from fs2_kafka_streams_spark.queries import REGISTRY

    for name in [
        "q25_string_hash_functions",
        "q26_date_math_functions",
        "q28_conditional_json",
        "q29_array_hof_agg",
        "q19_window_ranking_dist",
        "q20_window_analytic_value",
        "q16c_pivot_map",
        "q07_join_multiway_broadcast",
        "q43b_text_metrics",
    ]:
        df = REGISTRY[name].build(spark, "/root/testdata/sf0.001")
        assert len(set(df.columns)) == len(df.columns), name


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
