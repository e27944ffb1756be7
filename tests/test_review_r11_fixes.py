"""Pins for the round-10 verdict/advisory findings (VERDICT.md Next #5 +
ADVICE.md, r10).

Same contract as test_review_r8/r9/r10_fixes.py: every fix must be
observable behavior, not a comment.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent


def _write_parquet(path, frame):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(frame), path)
    return str(path)


# ---------------------------------------------------------------------------
# r10 verdict Next #5 — replay_dir sentinel totality on all-NULL ts columns
# ---------------------------------------------------------------------------

_TS = [dt.datetime(2024, 1, 1, 12, 0, k) for k in range(4)]


def test_replay_sentinel_null_secondary_ts_column(tmp_path):
    """`pc.max` of an all-NULL timestamp column is None; the sentinel row
    used to compute None + timedelta (TypeError) with rows > 0. A NULL
    secondary ts column must get a NULL sentinel value while the real ts
    column still advances past max(ts)."""
    import pyarrow.parquet as pq

    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    frame = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.Series(_TS, dtype="datetime64[us]"),
            "ts2": pd.Series([pd.NaT] * 4, dtype="datetime64[us]"),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    _write_parquet(tmp_path / "t.parquet", frame)
    d = replay_dir(
        str(tmp_path),
        "t",
        n_files=2,
        sentinel_minutes=30,
        cache_root=str(tmp_path / "cache"),
    )
    last = sorted(Path(d).glob("part-*.parquet"))[-1]
    row = pq.read_table(last).to_pylist()[0]
    assert row["event_id"] == -1
    assert row["ts"] == _TS[-1] + dt.timedelta(minutes=30)
    assert row["ts2"] is None


def test_replay_sentinel_all_null_order_col_raises(tmp_path):
    """If THE order column is all-NULL the sentinel cannot advance the
    watermark that flushes outer/timeout state — silent NULL would hang
    the consumer's pending state forever; must raise loudly."""
    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    frame = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.Series([pd.NaT] * 4, dtype="datetime64[us]"),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    _write_parquet(tmp_path / "t.parquet", frame)
    with pytest.raises(ValueError, match="order column"):
        replay_dir(
            str(tmp_path),
            "t",
            n_files=2,
            order_col="ts",
            sentinel_minutes=30,
            cache_root=str(tmp_path / "cache"),
        )


def test_replay_sentinel_no_advanceable_ts_raises(tmp_path):
    """sentinel_minutes with EVERY timestamp column all-NULL is an
    unsatisfiable request (no watermark can advance) — loud, not a
    silently inert extra trigger."""
    from fs2_kafka_streams_spark.streaming.replay import replay_dir

    frame = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.Series([pd.NaT] * 4, dtype="datetime64[us]"),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    _write_parquet(tmp_path / "t.parquet", frame)
    with pytest.raises(ValueError, match="no timestamp column"):
        replay_dir(
            str(tmp_path),
            "t",
            n_files=2,
            sentinel_minutes=30,
            cache_root=str(tmp_path / "cache"),
        )


# ---------------------------------------------------------------------------
# r10 advisory — shared EMB_DIM constant (llm.py + streaming_ext.py)
# ---------------------------------------------------------------------------


def test_emb_dim_single_source_of_truth():
    """The embedding dim is declared ONCE (operators/similarity.EMB_DIM);
    a drifted hardcoded copy in the streaming ANN path would silently
    filter every vector into an empty corpus instead of failing loudly."""
    import inspect

    from fs2_kafka_streams_spark.operators.similarity import EMB_DIM
    from fs2_kafka_streams_spark.queries import llm, streaming_ext

    assert llm._EMB_DIM is EMB_DIM
    src = inspect.getsource(streaming_ext)
    assert "EMB_DIM" in src
    assert 'well_formed_vectors("embedding", 64)' not in src


# ---------------------------------------------------------------------------
# r10 advisory — table_profile hostile-double rendering (measure domain)
# ---------------------------------------------------------------------------


def test_table_profile_hostile_doubles_render_null(spark):
    """The exported operator used a raw cast(decimal(18,2)) for double
    min/max — the exact engine-divergent / ANSI-throwing cast the
    measure-domain policy eliminated everywhere else. Direct use on
    hostile doubles (finite overflow 1e300, NaN, ±inf) must render NULL,
    not crash."""
    from fs2_kafka_streams_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4],
                "x": [1.25, float("nan"), float("inf"), 1e300],
            }
        )
    )
    rows = {r["column"]: r for r in table_profile(df).collect()}
    x = rows["x"]
    assert x["n_rows"] == 4
    # NaN/inf/1e300 are outside the measure domain: max renders NULL
    # ("no usable measurement") instead of throwing CAST_OVERFLOW
    assert x["max_value"] is None
    # the in-domain extremum still renders exactly
    assert x["min_value"] == "1.25"


def test_table_profile_in_domain_unchanged(spark):
    """Identity on in-contract ≤2-dp doubles: the guard must not change
    the rendering q50 hashes against the oracle."""
    from fs2_kafka_streams_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        pd.DataFrame({"x": [1.25, -3.5, 100.0]})
    )
    row = table_profile(df).collect()[0]
    assert row["min_value"] == "-3.50"
    assert row["max_value"] == "100.00"


# ---------------------------------------------------------------------------
# r10 advisory — q15b sketch reference point is bounded-memory again
# ---------------------------------------------------------------------------


def test_q15b_accuracy_is_bounded():
    """approx_percentile at int32-max accuracy is effectively an exact
    aggregate whose buffer grows with the group — contradicting the
    entry's own one-pass-mergeable rationale. The reference point must
    use a documented large-but-bounded accuracy."""
    import inspect

    from fs2_kafka_streams_spark.queries import relational

    src = inspect.getsource(relational)
    assert "2147483647" not in src


def test_q15b_tiny_group_still_within_tol(spark, tmp_path):
    """The r10 tiny-corpus property the int32-max accuracy existed for —
    a 2-row group's discrete reference point is a group member, so the
    5% claim holds — must survive the bounded accuracy (exact for groups
    ≤ 1M rows)."""
    from fs2_kafka_streams_spark.queries import load_all

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 4],
            "l_returnflag": ["A", "A", "B", "B"],
            "l_quantity": [1.0, 100.0, 7.0, 7.0],
        }
    )
    _write_parquet(tmp_path / "lineitem.parquet", li)
    spec = load_all()["q15b_approx_percentile"]
    got = {
        r["l_returnflag"]: r["within_tol"]
        for r in spec.build(spark, str(tmp_path)).collect()
    }
    assert got == {"A": True, "B": True}


# ---------------------------------------------------------------------------
# r10 verdict Next #1 (flagging half) — run-gated uniform-IO-elevation flag
# ---------------------------------------------------------------------------


def test_noise_flags_uniform_io_elevation_self_flags():
    """The r10 driver run measured q48 +30% at io_med 0.647 ms/op with NO
    flag: under a uniformly elevated run the median rises with the load,
    so no bracket ever clears 1.6×median. With quiet_band_top set, an
    entry whose BOTH brackets sit above the absolute quiet band must
    self-flag when the run median is itself above the band."""
    import bench

    names = [f"q{i}" for i in range(5)]
    # the r10 shape: every tick moderately elevated (median 0.65 > 0.60
    # band top), no single spike — the old rule flags nothing
    elevated = [0.65, 0.66, 0.64, 0.67, 0.63, 0.65]
    noisy_old, _ = bench.noise_flags(names, elevated, abs_floor=0.25)
    assert noisy_old == {}, "sanity: the relative rule is blind to this"
    noisy_new, mid = bench.noise_flags(
        names, elevated, abs_floor=0.25,
        quiet_band_top=bench.IO_QUIET_BAND_MS[1],
    )
    assert sorted(noisy_new) == names
    assert noisy_new["q0"] == [0.65, 0.66]  # bracket values ride along


def test_noise_flags_quiet_run_gate_stays_closed():
    """Quiet-run discrimination (the r8 min-tick lesson): at a median
    inside the band, an entry with both brackets above the band top must
    NOT flag — local bursts at a quiet median are fsync jitter, and
    flagging them would mass-flag quiet runs (3/83 such entries in the
    r10 quiet artifact)."""
    import bench

    names = [f"q{i}" for i in range(4)]
    quiet = [0.45, 0.46, 0.65, 0.63, 0.44]  # median 0.46: gate closed
    noisy, _ = bench.noise_flags(
        names, quiet, abs_floor=0.25,
        quiet_band_top=bench.IO_QUIET_BAND_MS[1],
    )
    assert noisy == {}


def test_bench_summary_carries_io_loaded():
    """The run-level io_loaded flag (IO twin of host_loaded) must ride
    the driver-visible summary, so a cross-round reader can attribute a
    stream-family swing to host IO without the local artifact."""
    import bench

    src = open(bench.__file__).read()
    assert '"io_loaded": io_loaded,' in src
    assert "io_median > IO_QUIET_BAND_MS[1]" in src
