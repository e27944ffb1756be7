"""Scoped SQL-conf pinning for streaming queries.

Stateful streaming queries fix their state-store partition count at first
start (it equals ``spark.sql.shuffle.partitions``). The harness queries run
on fresh checkpoints with small-to-moderate key domains, so a lower count
means fewer RocksDB store instances + Python state workers per micro-batch —
at 100 TB with a real cluster the same knob is simply set higher before the
query first starts. Pinning is scoped and restored so batch queries keep the
session default.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

STREAM_STATE_PARTITIONS = "4"  # harness scale; a real cluster sets O(cores)


@contextmanager
def pinned_conf(spark: SparkSession, confs: dict[str, str]):
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
