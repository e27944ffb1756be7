#!/usr/bin/env python
"""Bench harness — wall-clock per declared query (SURVEY.md §2 Part B).

Runs every query in the driver registry against ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``.

The LAST stdout line is ONE compact JSON line (guaranteed < ~1.5 KB — the
driver keeps only a 2 KB stdout tail, which truncated the full per-query
map in round 1)::

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., "n_queries": K,
     "queries": {...10 slowest...}}

The FULL per-query timing map is written to ``BENCH_FULL.json`` next to
this script.

Execution is forced with the noop sink (full plan runs distributed; nothing
is materialized on the driver), which is the scale-honest way to time a
query — ``collect()`` would add a driver bottleneck that doesn't exist in
the 100 TB deployment shape.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fs2_kafka_streams_spark.queries import driver_registry
    from fs2_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = driver_registry()

    # Warm the JVM + parquet footer caches AND the Python UDF worker pool
    # outside the timed region so per-query numbers reflect steady-state
    # execution, not session startup (workers are reused across queries, so
    # the first pandas/udtf entry would otherwise absorb interpreter
    # spin-up that a long-running cluster amortizes away).
    from pyspark.sql import functions as _F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    _identity = _F.pandas_udf(lambda s: s, "long")
    spark.range(64).select(_identity("id").alias("x")).write.format(
        "noop"
    ).mode("overwrite").save()

    def warm_streaming() -> None:
        """Warm the STREAMING machinery — RocksDB provider JNI + state-store
        maintenance threads, the micro-batch engine, and (when the TWS gate
        is open) the transformWithState state server + the protobuf shim
        import in fresh workers. Measured: the first streaming entry
        otherwise absorbs 3-8 s of one-time spin-up (q38b cold 12.9 s vs
        warm 5 s) that a long-running cluster pays once per deployment, not
        once per query. Called BETWEEN the batch block and the streaming
        block — streaming entries are already ordered last precisely
        because their session residue (maintenance threads, GC pressure)
        inflates whatever runs after them, so the warm-up must not run
        before the batch measurements either. A 4-row synthetic events
        table keeps it cheap; failures are non-fatal (the bench then just
        measures cold, as before)."""
        try:
            import os as _os
            import tempfile as _tf

            import pandas as _pd

            # FIXED name, not mkdtemp: the replay cache is keyed by this
            # directory's basename, so a random name deposited one
            # never-reusable cache dir per bench run; a stable name is
            # rebuilt in place and the warm dir itself never accumulates
            _warm_sf = _os.path.join(
                _tf.gettempdir(), "spark_graft_bench_warm_sf"
            )
            _os.makedirs(_warm_sf, exist_ok=True)
            # written atomically below (tmp + os.replace) so an unlikely
            # concurrent bench run never reads a half-written fixture —
            # though overlapping bench runs skew each other's timings and
            # are not a supported measurement anyway
            _pd.DataFrame(
                {
                    "event_id": [1, 2, 3, 4],
                    "ts": _pd.to_datetime([1, 2, 3, 4], unit="s").astype(
                        "datetime64[us]"
                    ),
                    "user_id": [1, 1, 2, 2],
                    "event_type": ["view"] * 4,
                    "value": [1.0] * 4,
                    "props": ["{}"] * 4,
                }
            ).to_parquet(f"{_warm_sf}/.events.tmp.parquet", index=False)
            _os.replace(
                f"{_warm_sf}/.events.tmp.parquet",
                f"{_warm_sf}/events.parquet",
            )
            from fs2_kafka_streams_spark.streaming import stateful as _st

            _st.latest_by_key_streaming(spark, _warm_sf).collect()
            if _st.HAS_TWS:
                _st.latest_by_key_tws(spark, _warm_sf).collect()
        except Exception as e:  # pragma: no cover - must never fail the bench
            print(f"streaming warm-up skipped: {e}", file=sys.stderr)

    def calibrate() -> float:
        """Fixed CPU-bound probe (200M xxhash64 in whole-stage codegen, no
        IO, no Python workers): its wall time measures HOST throughput at
        this moment, nothing about this repo. Whole-run totals drift ~1.5×
        with host load over hours (SCALE.md "Bench noise"); recording the
        probe before AND after the query loop gives every BENCH file its
        own drift denominator — compare totals across rounds as
        ``value / mean(calib_sec)``, not raw."""
        t0 = time.perf_counter()
        # bit_xor, not sum: the session is ANSI and 200M hash sums overflow
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "xxhash64(id) AS h"
        ).selectExpr("bit_xor(h)").collect()
        return round(time.perf_counter() - t0, 3)

    calibrate()  # untimed: absorb the probe's own one-time codegen JIT
    calib_before = calibrate()

    # Measure real Structured Streaming entries LAST: their micro-batch
    # machinery leaves session residue (RocksDB state-store maintenance,
    # checkpoint cleanup, GC pressure) that measurably inflates whatever
    # runs right after them (observed: the broadcast-join entries doubling
    # when measured directly after the streaming block). Iteration order
    # here is a measurement concern only — the driver's correctness order
    # (`driver_registry()`) is unchanged.
    ordered = sorted(
        registry.items(), key=lambda kv: "streaming" in kv[1].tags
    )
    timings: dict[str, float] = {}
    warmed_streaming = False
    for name, spec in ordered:
        if not warmed_streaming and "streaming" in spec.tags:
            warm_streaming()  # batch block done; spin up streaming machinery
            warmed_streaming = True
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # drop persisted intermediates (shared shingle/pair tables) so no
        # query's cache residue distorts the next query's measurement
        spark.catalog.clearCache()

    calib_after = calibrate()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    full = {
        "metric": "total_wall_clock_all_queries",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "calib_sec": [calib_before, calib_after],
        "queries": timings,
    }
    (Path(_REPO) / "BENCH_FULL.json").write_text(json.dumps(full, indent=1))

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # Compact summary as the LAST stdout line, < ~1.5 KB: the driver keeps
    # only a 2000-char stdout tail (round-1 full map got truncated to
    # "parsed": null).
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "calib_sec": [calib_before, calib_after],
                "queries": slowest,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
