"""Deterministic file-based replay of a parquet table as a stream.

The reference's tests replay known data through a real Kafka broker and
assert multiset equality (``RecordStreamSpec.scala:93-141``). Without a
broker, the deterministic equivalent is the file stream source: the table is
split into N parquet files by a hash of a stable id column, written with
strictly increasing modification times, and consumed with
``maxFilesPerTrigger=1`` — so micro-batch k contains exactly bucket k, in a
fixed order, on every run. Watermark advancement between batches is then a
pure function of the data, which is what makes Q36 (late-data drop)
hash-checkable against a SQL oracle.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CACHE_ROOT = "/root/repo/.cache/replay"
N_FILES = 4


def replay_dir(
    sf_dir: str, table: str = "events", id_col: str = "event_id",
    n_files: int = N_FILES,
) -> str:
    """Split ``{sf_dir}/{table}.parquet`` into ``n_files`` hash buckets with
    ordered mtimes; idempotent (cached per (sf, table, n)).

    Timestamps are coerced to microseconds so Spark's file source reads them
    natively as TIMESTAMP_NTZ (the driver parquet is TIMESTAMP(NANOS), which
    Spark rejects).
    """
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(CACHE_ROOT, f"{sf_name}_{table}_{n_files}")
    marker = os.path.join(out, "_SPARK_GRAFT_READY")
    if os.path.exists(marker):
        return out

    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"))
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

    ids = t.column(id_col).to_numpy()
    bucket = ids % n_files
    base = time.time() - 3600
    for k in range(n_files):
        part = t.filter(pa.array(bucket == k))
        path = os.path.join(out, f"part-{k:04d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (base + 10 * k, base + 10 * k))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out
