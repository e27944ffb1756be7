#!/usr/bin/env python
"""Per-trigger durationMs breakdown for the expensive streaming entries.

Usage: python scripts/stream_trigger_probe.py [entry ...]

Rebuilds the named streaming queries' plans exactly as their driver
entries do, but drives the sink directly so the StreamingQuery handle is
available, then prints every micro-batch's ``durationMs`` map
(addBatch / getBatch / queryPlanning / triggerExecution / walCommit /
commitOffsets) and the state-operator commit times — the measurement
VERDICT r11 asked for before touching the per-trigger floor (guide §1:
measure first).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.1"


def probe(spark, df, output_mode="append", extra_conf=None, name="probe"):
    from fs2_kafka_streams_spark.streaming.conf import (
        STREAM_PERF_CONF,
        pinned_conf,
    )

    confs = dict(STREAM_PERF_CONF)
    confs.update(extra_conf or {})
    qn = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"probe_{qn}_")
    t0 = time.perf_counter()
    try:
        with pinned_conf(spark, confs):
            q = (
                df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(qn)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    print(f"\n=== {name}: wall {wall}s, {len(prog)} progress events")
    for p in prog:
        dm = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        commit = sum(s.get("commitTimeMs", 0) for s in so)
        rows = p.get("numInputRows")
        print(
            f"  batch {p.get('batchId')}: rows={rows} "
            f"trigger={dm.get('triggerExecution')} "
            f"addBatch={dm.get('addBatch')} "
            f"getBatch={dm.get('getBatch')} "
            f"planning={dm.get('queryPlanning')} "
            f"walCommit={dm.get('walCommit')} "
            f"commitOffsets={dm.get('commitOffsets')} "
            f"stateCommit={commit}"
        )
    try:
        spark.catalog.dropTempView(qn)
    except Exception:
        pass


def main() -> None:
    only = set(sys.argv[1:])
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="stream-trigger-probe")
    spark.read.parquet(f"{SF}/region.parquet").count()

    from fs2_kafka_streams_spark.queries import streaming_ext as sx
    from fs2_kafka_streams_spark.streaming import cep, stateful as st

    if not only or "q48" in only:
        # q48 inner join shape (watermarked), current conf posture
        joined = None
        a_extra = {
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.session.timeZone": "UTC",
        }
        # plain (no-data batch ON)
        df = sx._stream_stream_join.__wrapped__ if hasattr(
            sx._stream_stream_join, "__wrapped__"
        ) else None
        # build via the module helper but intercept before run_to_memory:
        # reproduce its body inline
        from pyspark.sql import functions as F

        def build_join(how):
            a = sx._events_stream(
                spark, SF, files_per_trigger=2, time_ordered=True,
                ts_type="timestamp",
            ).withWatermark("ts", "10 minutes")
            b = sx._events_stream(
                spark, SF, files_per_trigger=2, time_ordered=True,
                ts_type="timestamp",
            ).withWatermark("ts", "10 minutes")
            a, b = a.alias("a"), b.alias("b")
            return a.join(
                b,
                on=[
                    F.col("a.user_id") == F.col("b.user_id"),
                    F.col("a.event_id") < F.col("b.event_id"),
                    F.col("b.ts").between(
                        F.col("a.ts") - F.expr("INTERVAL 5 MINUTES"),
                        F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"),
                    ),
                ],
                how=how,
            ).select(
                F.col("a.event_id").alias("id_a"),
                F.col("b.event_id").alias("id_b"),
            )

        probe(spark, build_join("inner"), extra_conf=a_extra,
              name="q48_inner_nodata_on")
        probe(
            spark, build_join("inner"),
            extra_conf={
                **a_extra,
                "spark.sql.streaming.noDataMicroBatches.enabled": "false",
            },
            name="q48_inner_nodata_off",
        )

    if not only or "q57" in only:
        df = cep.pattern_match_stream(spark, SF) if hasattr(
            cep, "pattern_match_stream"
        ) else None
        if df is None:
            print("cep probe: no pattern_match_stream helper; skipped")


if __name__ == "__main__":
    main()
