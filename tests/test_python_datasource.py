"""Broker-less Kafka-wire Python DataSource (A1/A2/A16/A17/A18 without a
broker): wire-schema contract, per-partition offset semantics, decode
round-trip equality with the parquet path, multi-batch streaming, and
exactly-once checkpoint recovery across a stop/restart.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from fs2_kafka_streams_spark.sources.python_source import (
    decode_wire,
    read_wire,
    read_wire_stream,
)

SF = "/root/testdata/sf0.001"
N_PARTS = 4


@pytest.fixture(scope="module")
def wire(spark):
    return read_wire(spark, SF, partitions=N_PARTS)


def test_wire_schema_contract(wire):
    """The wire columns mirror the Kafka record contract the sink encoder
    writes (key/value bytes, topic, partition, offset, timestamp)."""
    assert [f.name for f in wire.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp_us",
    ]
    types = {f.name: f.dataType.simpleString() for f in wire.schema.fields}
    assert types["key"] == "binary" and types["value"] == "binary"
    assert types["offset"] == "bigint"


def test_offsets_dense_and_partitioned_by_key(spark, wire):
    """Kafka's guarantee, reproduced: offsets are dense 0..n_p-1 within
    each partition, and partition = key % N (same key → same partition)."""
    n_events = Catalog(spark, SF).events.count()
    per = (
        wire.groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.count_distinct("offset").alias("nd"),
        )
        .collect()
    )
    assert sum(r.n for r in per) == n_events
    for r in per:
        assert r.lo == 0 and r.hi == r.n - 1 and r.nd == r.n
    mism = (
        decode_wire(wire)
        .filter(F.col("user_id") % N_PARTS != F.col("partition"))
        .count()
    )
    assert mism == 0


def test_offsets_respect_event_time_order(spark, wire):
    """Within a partition, offset order == (ts, event_id) order — the
    per-partition total order the reference's consumer model guarantees
    (client/RecordStream.scala:14-16)."""
    dec = decode_wire(wire)
    w = (
        dec.groupBy("partition")
        .agg(
            F.min_by(F.struct("ts", "event_id"), "offset").alias("first"),
            F.max_by(F.struct("ts", "event_id"), "offset").alias("last"),
        )
        .collect()
    )
    for r in w:
        assert (r.first.ts, r.first.event_id) <= (r.last.ts, r.last.event_id)


def test_decode_roundtrip_equals_parquet(spark, wire):
    """decode(wire) must equal the parquet table row-for-row — the A3
    deserialize path applied to our own source loses nothing (exact NTZ
    timestamps included)."""
    dec = decode_wire(wire).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = Catalog(spark, SF).events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert dec.exceptAll(src).count() == 0
    assert src.exceptAll(dec).count() == 0


def test_latest_by_key_through_wire_equals_direct(spark, wire):
    """The flagship fold (A7) over the wire path ≡ over parquet."""
    via_wire = latest_by_key(
        decode_wire(wire),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    direct = latest_by_key(
        Catalog(spark, SF).events,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    assert via_wire.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_wire).count() == 0


def test_stream_multi_batch_and_exactly_once_recovery(spark, tmp_path):
    """The live-topic simulation must (a) deliver in >1 micro-batch,
    (b) resume from the committed offset after a stop/restart, and
    (c) never re-serve a COMMITTED batch's offsets under a new batch id.

    The sink is idempotent-by-batchId (overwrite ``bid=<n>``) — the
    standard foreachBatch exactly-once recipe: a batch interrupted before
    its checkpoint commit legitimately re-runs (at-least-once delivery to
    the sink), the overwrite absorbs it, and the SOURCE-level guarantee
    under test is that each (partition, offset) lands in exactly ONE
    distinct batch id."""
    out = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    seen_batches: list[int] = []

    cursor = tmp_path / "publish_cursor.json"

    def run_until(n_progress: int, batch_rows: int = 120) -> None:
        stream = read_wire_stream(
            spark,
            SF,
            partitions=N_PARTS,
            batch_rows=batch_rows,
            cursor_file=str(cursor),
        )

        def sink(bdf, bid):
            seen_batches.append(bid)
            bdf.select("partition", "offset").write.mode(
                "overwrite"
            ).parquet(f"{out}/bid={bid}")

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        deadline = time.time() + 120
        try:
            while time.time() < deadline:
                if len(seen_batches) >= n_progress:
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination()

    # phase 1: consume a couple of micro-batches, then stop mid-stream
    run_until(2)
    assert len(seen_batches) >= 2
    # phase 2: restart on the same checkpoint and drain the rest
    n_events = Catalog(spark, SF).events.count()
    for _ in range(10):
        run_until(10_000)
        got = spark.read.parquet(str(out))
        if got.select("partition", "offset").distinct().count() >= n_events:
            break

    got = spark.read.parquet(str(out))
    assert (
        got.select("partition", "offset").distinct().count() == n_events
    ), "every offset delivered"
    multi = (
        got.groupBy("partition", "offset")
        .agg(F.count_distinct("bid").alias("n_bids"))
        .filter(F.col("n_bids") > 1)
        .count()
    )
    assert multi == 0, "a committed batch was re-served under a new bid"
    assert len(set(seen_batches)) >= 3, "genuinely multi-batch"


def test_stream_full_log_single_catchup_equals_batch(spark, tmp_path):
    """Default (no batch_rows): one catch-up batch serves the whole log —
    the restart-always-safe mode; contents equal the batch read."""
    rows = []
    stream = read_wire_stream(spark, SF, partitions=N_PARTS)
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: rows.append(bdf.count())
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and not rows:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination()
    assert rows and rows[0] == Catalog(spark, SF).events.count()
