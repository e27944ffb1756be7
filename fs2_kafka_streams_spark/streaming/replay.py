"""Deterministic file-based replay of a parquet table as a stream.

The reference's tests replay known data through a real Kafka broker and
assert multiset equality (``RecordStreamSpec.scala:93-141``). Without a
broker, the deterministic equivalent is the file stream source: the table is
split into N parquet files, written with strictly increasing modification
times, and consumed with ``maxFilesPerTrigger=1`` — so micro-batch k
contains exactly bucket k, in a fixed order, on every run. Watermark
advancement between batches is then a pure function of the data, which is
what makes Q36 (late-data drop) hash-checkable against a SQL oracle.

Two splits are offered:

- **hash buckets** (default): bucket = id % n — every file spans the full
  time range, so replay interleaves event times across batches (the
  out-of-order shape watermark tests need);
- **time-ordered** (``order_col=...``): rows sorted by (order_col, id) and
  cut into contiguous chunks — file k's max time ≤ file k+1's min time, so
  a watermark never retro-drops data. This is the Kafka-with-
  roughly-ordered-producers shape the watermarked stream-stream join (q48)
  assumes.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "replay",
)
N_FILES = 4


def _source_stamp(path: str) -> str:
    # ns-resolution mtime (r9 cold review): with whole-second stamps a
    # fixture rewritten within the same second at the same byte size —
    # exactly what a test regenerating a corpus in place does — would
    # keep serving the STALE replay cache
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def replay_dir(
    sf_dir: str, table: str = "events", id_col: str = "event_id",
    n_files: int = N_FILES, order_col: str | None = None,
    sentinel_minutes: int | None = None, cache_root: str | None = None,
) -> str:
    """Split ``{sf_dir}/{table}.parquet`` into ``n_files`` replay files with
    ordered mtimes; idempotent (cached per (sf, table, n, order)), with the
    cache keyed on the source parquet's (size, mtime) so a changed fixture
    invalidates it.

    Timestamps are coerced to microseconds so Spark's file source reads them
    natively as TIMESTAMP_NTZ (the driver parquet is TIMESTAMP(NANOS), which
    Spark rejects).

    ``cache_root`` overrides the default repo-local cache directory (the
    scale harness passes its ``--out`` so generated replay sets live and
    die with the corpus they derive from).

    ``sentinel_minutes`` appends ONE extra final file holding a single
    synthetic row whose timestamps sit that many minutes past the data's
    maximum (ids = -1, strings = ``__sentinel__``). Outer stream–stream
    joins and other watermark-flushed operators only emit their pending
    state when the watermark PASSES the last real event — which a finite
    replay otherwise never does. The sentinel is the deterministic
    stand-in for "the topic keeps flowing" (the advanced watermark
    flushes state in the engine's final no-data batch under
    availableNow); consumers filter the -1 ids out of their results.
    """
    src = os.path.join(sf_dir, f"{table}.parquet")
    stamp = _source_stamp(src)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    # id_col is part of the cache identity (r10 cold review): two calls on
    # the same table with different id columns produce different buckets,
    # and a key without it would silently serve the first caller's split
    # to the second
    suffix = f"_id_{id_col}" if id_col != "event_id" else ""
    suffix += f"_by_{order_col}" if order_col else ""
    if sentinel_minutes:
        suffix += f"_sent{sentinel_minutes}v3"
    out = os.path.join(cache_root or CACHE_ROOT, f"{sf_name}_{table}_{n_files}{suffix}")
    marker = os.path.join(out, "_SPARK_GRAFT_READY")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == stamp:
                return out

    os.makedirs(out, exist_ok=True)
    for old in os.listdir(out):  # stale cache: rebuild from scratch
        os.remove(os.path.join(out, old))
    t = pq.read_table(src)
    # nanos → micros, truncating: DuckDB's TIMESTAMP (µs) does the same on
    # read, and the batch catalog divides nanos by 1000 — all three paths see
    # identical µs values.
    cols = []
    for f in t.schema:
        col = t.column(f.name)
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            col = pc.cast(
                col,
                pa.timestamp("us"),
                safe=False,
            )
        cols.append(col)
    t = pa.table(cols, names=[f.name for f in t.schema])

    base = time.time() - 3600
    if order_col is not None:
        t = t.sort_by([(order_col, "ascending"), (id_col, "ascending")])
        n = t.num_rows
        chunk = (n + n_files - 1) // n_files
        parts = [t.slice(k * chunk, chunk) for k in range(n_files)]
    else:
        id_arrow = t.column(id_col)
        if id_arrow.null_count:
            # total, not lossy (r11, superseding the r10 loud-rejection):
            # a NULL id converted to NaN in numpy, NaN % n matched NO
            # bucket, and the row silently VANISHED from the replay —
            # breaking the multiset equality the whole harness rests on.
            # r10 made that a loud ValueError; r11 makes the split TOTAL
            # instead: NULL-id rows bucket deterministically by ROW
            # POSITION % n (parquet row order is stable), the same
            # round-robin last resort the wire source uses for unkeyed
            # records — a real topic does not reject unkeyed consumption,
            # and neither should its replay twin. Multiset equality and
            # run-to-run determinism both hold.
            import numpy as np

            null_mask = pc.is_null(id_arrow).to_numpy(zero_copy_only=False)
            filled = (
                pc.fill_null(id_arrow, 0)
                .to_numpy(zero_copy_only=False)
                .astype("int64")
            )
            bucket = filled % n_files
            pos = np.arange(t.num_rows, dtype="int64")
            bucket[null_mask] = pos[null_mask] % n_files
        else:
            ids = id_arrow.to_numpy()
            bucket = ids % n_files
        parts = [t.filter(pa.array(bucket == k)) for k in range(n_files)]
    if sentinel_minutes and t.num_rows == 0:
        # empty topic: there is no real event whose outer/timeout state
        # needs flushing, and a sentinel timed off max(ts) of zero rows
        # would be None + timedelta — skip it (the stream still runs its
        # empty triggers and completes with an empty result)
        sentinel_minutes = None
    if sentinel_minutes:
        import datetime as _dt

        # ONE sentinel file advances the watermark past every real event;
        # the engine's final NO-DATA batch (availableNow runs one before
        # terminating, `spark.sql.streaming.noDataMicroBatches.enabled`
        # default) then flushes the remaining outer-join / timeout state.
        # r8 shipped TWO sentinel files citing processAllAvailable not
        # awaiting the no-data batch — but every runner uses availableNow
        # + awaitTermination, where the flush is deterministic (r10 probe:
        # 6/6 trials complete with 1 sentinel, pinned in
        # tests/test_review_r10_fixes.py) — so the second sentinel was one
        # whole wasted trigger of state-store commits per run.
        arrays, names = [], []
        any_ts_advanced = False
        for f in t.schema:
            if pa.types.is_timestamp(f.type):
                mx = pc.max(t.column(f.name)).as_py()
                if mx is None:
                    # all-NULL timestamp column (r11, VERDICT Next #5):
                    # max() of zero non-NULL values is None and
                    # None + timedelta is a TypeError. A secondary ts
                    # column that carries no data gets a NULL sentinel
                    # value — but if it is THE replay order column, a
                    # silent NULL sentinel means the watermark never
                    # advances and outer/timeout state never flushes:
                    # fail loudly instead of hanging the consumer.
                    if order_col == f.name:
                        raise ValueError(
                            f"replay_dir: order column {order_col!r} is "
                            "all-NULL; the sentinel cannot advance a "
                            "watermark off it"
                        )
                    arrays.append(pa.array([None], f.type))
                else:
                    any_ts_advanced = True
                    arrays.append(
                        pa.array(
                            [mx + _dt.timedelta(minutes=sentinel_minutes)],
                            f.type,
                        )
                    )
            elif pa.types.is_string(f.type):
                arrays.append(pa.array(["__sentinel__"], f.type))
            elif pa.types.is_floating(f.type):
                arrays.append(pa.array([0.0], f.type))
            else:
                arrays.append(pa.array([-1], f.type))
            names.append(f.name)
        if not any_ts_advanced:
            # every timestamp column is all-NULL (or absent): the
            # sentinel row cannot advance ANY watermark, so the caller's
            # "flush pending state" intent is unsatisfiable — loud, not
            # a silently inert extra trigger (r11, VERDICT Next #5)
            raise ValueError(
                "replay_dir: sentinel_minutes requested but no timestamp "
                "column has a non-NULL max; no watermark can advance"
            )
        parts.append(pa.table(arrays, names=names))

    for k, part in enumerate(parts):
        path = os.path.join(out, f"part-{k:04d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (base + 10 * k, base + 10 * k))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out
