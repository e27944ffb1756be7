"""Shared plan-shaping utilities used across operator families.

Two cross-cutting helpers lived as private functions of the dedup module
and grew callers in profile, similarity, merged-query and streaming code
(r11 advisory): they are promoted here as the public, documented versions.

- :func:`spread` — the input-skew width guard (guide §2.5): round-robin
  repartition a coarsely-partitioned scan before CPU-heavy per-row work,
  as a provable NO-OP whenever the input already parallelizes.
- :func:`materialize` — lineage truncation for multiply-referenced
  subtrees (guide §5 "localCheckpoint is a cheaper way to cut lineage"),
  with the cluster-posture fallback the r11 verdict asked for: when the
  session has a reliable checkpoint directory configured, use
  ``.checkpoint()`` (recomputable-from-storage on executor loss); only a
  checkpoint-dir-less session — the local harness — uses
  ``localCheckpoint`` (executor-local blocks, no lineage to recompute).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame


def _parse_byte_size(v) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128MB", "1g", "64k")
    into bytes. Spark accepts case-insensitive b/k/kb/m/mb/g/gb/t/tb/p/pb
    suffixes; a bare number is bytes. Raises ValueError on anything else so a
    bad conf is visible instead of silently forcing a repartition."""
    s = str(v).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmgtp]?b?)", s)
    if not m:
        raise ValueError(f"unparseable byte size: {v!r}")
    mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
            "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40,
            "tb": 1 << 40, "p": 1 << 50, "pb": 1 << 50}[m.group(2)]
    return int(m.group(1)) * mult


def _local_path(uri: str) -> str:
    """``DataFrame.inputFiles()`` returns percent-encoded ``file:`` URIs —
    decode to a filesystem path (a space in a directory name otherwise
    breaks every footer/size probe with FileNotFoundError)."""
    from urllib.parse import unquote

    if uri.startswith("file:"):
        uri = uri[len("file:"):]
    return unquote(uri)


#: Logical-plan node-name PREFIXES that imply the rows have already been
#: (or will be) spread by a shuffle. Prefix-matched against the node name
#: parsed from each tree line, NOT substring-matched against the whole
#: plan text — a column alias or file path containing "Join"/"Union2024"
#: must not disable the demotion, and Except/Intersect/CoGroup/Expand are
#: shuffle introducers the old token list missed.
_SHUFFLE_NODE_PREFIXES = (
    "Repartition", "Join", "Aggregate", "Sort", "Window",
    "Deduplicate", "Distinct", "Union", "Except", "Intersect",
    "CoGroup", "Expand", "FlatMapGroups", "MapGroups", "ApplyInPandas",
)

#: One tree line of ``analyzed().toString()``: optional indentation made of
#: spaces and the tree-drawing glyphs ``:``, ``+``, ``-``, ``|``, then the
#: node class name (unresolved nodes carry a leading apostrophe).
_PLAN_NODE_RE = re.compile(r"^[\s:+\-|]*'?([A-Za-z][A-Za-z0-9]*)")


def _is_scan_shaped(df: DataFrame) -> bool:
    """True when the plan is a bare scan pipeline (project/filter/generate
    over a relation) — the only shape where parquet rows are still pinned
    to their row groups. After any shuffle-introducing operator
    (repartition, join, aggregate, sort, window, distinct) the rows are
    already spread, so demoting the width by row-group count would add a
    redundant shuffle and could even override caller-set parallelism.
    Unknown (Spark Connect: no plan handle) → False, i.e. don't demote."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        m = _PLAN_NODE_RE.match(line)
        if m and m.group(1).startswith(_SHUFFLE_NODE_PREFIXES):
            return False
    return True


def spread(df: DataFrame) -> DataFrame:
    """Redistribute a coarsely-partitioned input before CPU-heavy per-row
    work (tokenization, shingle explode, vectorized packing).

    A scan's parallelism is bounded by its row-group splits; a corpus
    delivered as a few large files (or the harness's single-row-group
    oracle tables) would otherwise serialize the whole pipeline on a
    handful of cores while the rest idle. When the scan already yields at
    least ``defaultParallelism`` splits — the normal 100 TB case, where
    repartitioning would be a pointless extra shuffle of raw text — this
    is a no-op and adds nothing to the plan.

    Width probe: the exact ``df.rdd.getNumPartitions()`` on classic Spark
    (one cheap RPC; counts actual scan splits); under Spark Connect —
    where the RDD handle doesn't exist — fall back to estimating splits
    from ``inputFiles()`` sizes against
    ``spark.sql.files.maxPartitionBytes`` (file count alone would
    under-count splittable files and force the very shuffle this guard
    avoids).

    Parquet caveat the probe must correct for: byte-range SPLITS only
    parallelize across ROW GROUPS — Spark assigns each row group to the
    split holding its starting offset, so a 176 MB single-row-group file
    plans as 32 splits yet delivers every row to ONE task (31 empty
    tasks beside one straggler; measured at the 100× corpus: the shingle
    stage serialized on one core). When the split count looks sufficient
    but the input is a FEW large parquet files, read their footers
    (cheap, driver-side, capped at ``target`` files by construction) and
    demote the effective width to the real row-group count. Inputs with
    at least ``target`` files, non-parquet formats (byte-splittable —
    splits genuinely parallelize), non-file sources, and unreadable
    (remote) footers keep the split-based answer.
    """
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no SparkContext handle
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        files = df.inputFiles()  # fetched ONCE; reused by both probes below
    except Exception:
        files = []
    n_splits = None
    try:
        n_splits = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: estimate from file sizes
        max_bytes = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        n_splits = 0
        for f in files:
            try:
                size = os.path.getsize(_local_path(f))
                n_splits += max(1, -(-size // max_bytes))
            except OSError:  # remote/object-store path: count the file
                n_splits += 1
    if n_splits < target:
        return df.repartition(target)
    # splits >= target: trustworthy only if the rows can actually reach
    # that many tasks — for a bare parquet scan that means enough row
    # groups (post-shuffle plans are already spread; see _is_scan_shaped)
    if (
        files
        and len(files) < target
        and all(f.endswith(".parquet") for f in files)
        and _is_scan_shaped(df)
    ):
        import pyarrow.parquet as _pq

        row_groups = 0
        for f in files:
            try:
                row_groups += _pq.ParquetFile(
                    _local_path(f)
                ).metadata.num_row_groups
            except Exception:  # remote/unreadable footer: trust the splits
                return df
            if row_groups >= target:
                return df
        return df.repartition(target)
    return df


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multiply-referenced subtree once and truncate its
    lineage, so self-joins and repeated references execute the subtree a
    single time instead of once per reference (Spark re-executes aliased
    self-join sides; ``ReuseExchange`` does not fire across them).

    Checkpoint flavor is chosen by session posture:

    - A session with ``spark.sparkContext.setCheckpointDir(...)``
      configured (the production-cluster posture) gets a **reliable**
      ``.checkpoint()``: blocks live in fault-tolerant storage, so an
      executor loss recomputes nothing and loses nothing.
    - Without a checkpoint dir — the local harness — ``localCheckpoint``
      keeps blocks executor-local. That is the documented trade: cheaper,
      but blocks are unrecoverable on executor loss (no lineage remains).

    Side effect callers must know (r11 advisory): with ``eager=True``
    (default) merely BUILDING the DataFrame executes the subtree's job at
    call time — plan capture or schema validation of an operator that
    materializes will run the heavy upstream work. ``eager=False`` defers
    materialization to the first action at the cost of non-deterministic
    first-action timing.
    """
    spark = df.sparkSession
    try:
        has_dir = spark.sparkContext.getCheckpointDir() is not None
    except Exception:  # Spark Connect: no SparkContext handle
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
