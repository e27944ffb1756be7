"""Partitioned parquet sink + partition pruning: THE data-layout lever at
100 TB (a date/tenant-partitioned table turns full scans into directory
listings). Asserts the physical layout and that a partition predicate
becomes a PartitionFilter (zero data files of other partitions read)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partitioned_write_and_pruning(spark, tmp_path):
    from fs2_kafka_streams_spark.catalog import Catalog

    events = Catalog(spark, SF_SMOKE).events
    out = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").parquet(out)

    # physical layout: one directory per partition value
    parts = {d for d in os.listdir(out) if d.startswith("event_type=")}
    types = {r["event_type"] for r in events.select("event_type").distinct().collect()}
    assert parts == {f"event_type={t}" for t in types}

    back = spark.read.parquet(out)
    pruned = back.filter(F.col("event_type") == "click")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", "").replace(
        ")", ""
    ) or "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0], plan

    # row fidelity through the partitioned round-trip
    got = pruned.count()
    want = events.filter(F.col("event_type") == "click").count()
    assert got == want
