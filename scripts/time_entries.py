#!/usr/bin/env python
"""Isolated warm timing for named driver entries (noop sink, median of N).

Usage: python scripts/time_entries.py [-n REPS] name [name ...]

Replicates bench.py's measurement shape (same session factory, noop sink,
cache-clear between reps, streaming warm-up when a streaming entry is
named) without running the other 80 entries — for before/after A/B of one
optimization under a quiet window.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from statistics import median

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.1"


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args

    from fs2_kafka_streams_spark.queries import driver_registry
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="time-entries")
    registry = driver_registry()

    # same warm-up bench.py applies outside its timed region
    from pyspark.sql import functions as _F

    spark.read.parquet(f"{SF}/region.parquet").count()
    _identity = _F.pandas_udf(lambda s: s, "long")
    spark.range(64).select(_identity("id").alias("x")).write.format(
        "noop"
    ).mode("overwrite").save()
    if any("streaming" in registry[n].tags for n in names):
        # bench.py's streaming warm-up, inlined (RocksDB JNI, TWS server,
        # symmetric-hash-join machinery) so first-rep numbers are warm
        import tempfile

        import pandas as pd

        warm_sf = tempfile.mkdtemp(prefix="time_entries_warm_")
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "ts": pd.to_datetime([1, 2, 3, 4], unit="s").astype(
                    "datetime64[us]"
                ),
                "user_id": [1, 1, 2, 2],
                "event_type": ["view"] * 4,
                "value": [1.0] * 4,
                "props": ["{}"] * 4,
            }
        ).to_parquet(f"{warm_sf}/events.parquet", index=False)
        from fs2_kafka_streams_spark.queries import streaming_ext as _sx
        from fs2_kafka_streams_spark.streaming import stateful as _st

        _st.latest_by_key_streaming(spark, warm_sf).collect()
        if _st.HAS_TWS:
            _st.latest_by_key_tws(spark, warm_sf).collect()
        _sx._stream_stream_join(spark, warm_sf, watermark="10 minutes").collect()

    def tick() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "xxhash64(id) AS h"
        ).selectExpr("bit_xor(h)").collect()
        return round(time.perf_counter() - t0, 4)

    def _temp_views():
        return {t.name for t in spark.catalog.listTables() if t.isTemporary}

    tick()
    for name in names:
        spec = registry[name]
        ts = []
        for _ in range(reps):
            views_before = _temp_views()
            t0 = time.perf_counter()
            df = spec.build(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            for v in _temp_views() - views_before:
                try:
                    spark.catalog.dropTempView(v)
                except Exception:
                    pass
        print(
            f"{name}: median={median(ts)} reps={ts} tick={tick()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
