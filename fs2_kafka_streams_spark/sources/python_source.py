"""Broker-less Kafka-wire source via the Spark 4 Python DataSource API.

The reference IS a Kafka source library (``client/RecordStream.scala``,
``client/Subscription.scala``); this sandbox has no broker, so the
built-in Kafka connector (``sources/kafka.py``) can only be
option-plumbing-tested. This module closes the gap at the protocol
level: a custom ``DataSource`` that serves a parquet table AS Kafka wire
records — ``key``/``value`` bytes, ``topic``, ``partition``, monotone
per-partition ``offset``, ``timestamp`` — with BOTH a batch reader and a
micro-batch ``DataSourceStreamReader`` whose offset planning and
checkpoint recovery follow the same contract Spark's real Kafka source
implements (A16/A17: ranged offsets per partition, resume from the
committed offset, never re-serve committed records).

Wire shape (mirrors the reference's consumer record,
``client/RecordStream.scala:14-16``, and the sink contract of
``encode_for_kafka``):

- ``partition`` = ``user_id % n_partitions`` — the reference's keyed
  partitioning (same key → same partition → per-key total order);
- ``offset`` = dense ordinal within the partition in ``(ts, event_id)``
  order — per-partition monotone, globally unordered, exactly Kafka's
  guarantee;
- ``value`` = deterministic JSON bytes; ``ts`` travels as integer epoch
  microseconds so decoding is timezone-proof and exact (the catalog's
  own NTZ technique);
- ``key`` = the user id as UTF-8 bytes.

Scale notes: partition planning is O(n_partitions) on the driver; each
task reads ONLY its partition's rows (pyarrow filter pushdown on the
modulus — a real deployment's source would read its own partition log
natively, which is exactly how the per-partition files would be laid
out). The stream reader advances ``batch_rows`` offsets per partition
per trigger — the ``maxOffsetsPerTrigger`` backpressure contract (A18).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp_us bigint"
)

#: from_json schema for the value payload (ts as epoch-µs for exactness)
VALUE_DDL = (
    "event_id bigint, ts_us bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def _load_partition_batch(path: str, n_parts: int, pid: int, topic: str):
    """One topic-partition as an offset-ordered ``pyarrow.RecordBatch`` in
    the wire schema. Runs inside the read task — the driver never touches
    row data — and is returned as ONE Arrow batch because the Python
    DataSource API transfers yielded RecordBatches zero-copy, an order of
    magnitude cheaper than per-row tuple pickling."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    ts = t.column("ts")
    if pa.types.is_timestamp(ts.type) and ts.type.unit == "ns":
        ts_us = pc.divide(ts.cast("int64"), 1000)
    else:
        ts_us = ts.cast(pa.timestamp("us")).cast("int64")
    t = t.append_column("_ts_us", ts_us)
    mask = pa.array(t.column("user_id").to_numpy() % n_parts == pid)
    part = t.filter(mask)
    rows = sorted(
        zip(
            part.column("_ts_us").to_pylist(),
            part.column("event_id").to_pylist(),
            part.column("user_id").to_pylist(),
            part.column("event_type").to_pylist(),
            part.column("value").to_pylist(),
            part.column("props").to_pylist(),
        )
    )
    keys, values, ts_col = [], [], []
    for ts_us_v, eid, uid, etype, val, props in rows:
        payload = {
            "event_id": eid,
            "ts_us": ts_us_v,
            "user_id": uid,
            "event_type": etype,
            "value": val,
            "props": props,
        }
        keys.append(str(uid).encode())
        values.append(json.dumps(payload, separators=(",", ":")).encode())
        ts_col.append(ts_us_v)
    n = len(rows)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(keys, pa.binary()),
            pa.array(values, pa.binary()),
            pa.array([topic] * n, pa.string()),
            pa.array([pid] * n, pa.int32()),
            pa.array(range(n), pa.int64()),
            pa.array(ts_col, pa.int64()),
        ],
        names=["key", "value", "topic", "partition", "offset", "timestamp_us"],
    )


class _Part(InputPartition):
    def __init__(self, pid: int, start: int = 0, end: int | None = None):
        self.pid = pid
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.topic = options.get("topic", "events")
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        return [_Part(p) for p in range(self.n_parts)]

    def read(self, part):
        yield _load_partition_batch(
            self.path, self.n_parts, part.pid, self.topic
        )


#: default home for simulated-publication cursor files (see
#: ``_StreamReader``): Spark runs the Python stream reader in its own
#: worker process per query run, so the cursor must live on disk to keep
#: the simulated log end MONOTONE across a stop/restart — a real broker's
#: end offset never moves backwards, and an end that regressed below the
#: committed offset would make Spark commit a regressed offset and
#: re-serve committed records.
_CURSOR_HOME = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "publish_cursors",
)


class _StreamReader(DataSourceStreamReader):
    """Micro-batch reader: offsets are ``{partition: next_offset}`` dicts
    (the Kafka source's own offset shape).

    With ``batch_rows`` unset the whole log is available immediately —
    one catch-up batch, unconditionally restart-safe. Setting
    ``batch_rows`` simulates a LIVE topic: ``latestOffset`` publishes at
    most that many offsets per partition per trigger (the
    ``maxOffsetsPerTrigger`` backpressure shape, A18), so a static table
    replays as a genuine multi-batch stream; after a restart Spark hands
    the committed start offsets back to ``partitions``/``read`` and only
    unserved ranges are read (exactly-once, asserted in
    tests/test_python_datasource.py)."""

    def __init__(self, options):
        self.path = options["path"]
        self.topic = options.get("topic", "events")
        self.n_parts = int(options.get("partitions", "4"))
        self.batch_rows = int(options.get("batch_rows", "0"))
        self.cursor_file = options.get("cursor_file")
        if self.batch_rows > 0 and not self.cursor_file:
            import hashlib

            key = f"{self.path}:{self.n_parts}:{self.batch_rows}"
            self.cursor_file = os.path.join(
                _CURSOR_HOME, hashlib.md5(key.encode()).hexdigest() + ".json"
            )
        self._ends = None

    def _load_cursor(self):
        try:
            with open(self.cursor_file) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {str(p): 0 for p in range(self.n_parts)}

    def _save_cursor(self, cur):
        os.makedirs(os.path.dirname(self.cursor_file), exist_ok=True)
        tmp = self.cursor_file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cur, fh)
        os.replace(tmp, self.cursor_file)

    def _end_offsets(self):
        if self._ends is None:
            import pyarrow.parquet as pq

            uids = pq.read_table(self.path, columns=["user_id"]).column(
                "user_id"
            ).to_numpy()
            mods = uids % self.n_parts
            self._ends = {
                p: int((mods == p).sum()) for p in range(self.n_parts)
            }
        return self._ends

    def initialOffset(self):
        return {str(p): 0 for p in range(self.n_parts)}

    def latestOffset(self):
        ends = self._end_offsets()
        if self.batch_rows <= 0:
            return {str(p): ends[p] for p in range(self.n_parts)}
        cur = self._load_cursor()
        cur = {
            p: min(c + self.batch_rows, ends[int(p)]) for p, c in cur.items()
        }
        self._save_cursor(cur)
        return dict(cur)

    def partitions(self, start, end):
        return [
            _Part(int(p), start.get(p, 0), end[p])
            for p in end
            if end[p] > start.get(p, 0)
        ]

    def read(self, part):
        batch = _load_partition_batch(
            self.path, self.n_parts, part.pid, self.topic
        )
        yield batch.slice(part.start, part.end - part.start)

    def commit(self, end):
        pass


class KafkaReplaySource(DataSource):
    """``spark.read.format("kafka_replay")`` after registration via
    ``spark.dataSource.register(KafkaReplaySource)``."""

    @classmethod
    def name(cls):
        return "kafka_replay"

    def schema(self):
        return WIRE_SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def read_wire(spark, sf_dir: str, table: str = "events", partitions: int = 4):
    """Batch-read a driver table through the wire-shape source."""
    spark.dataSource.register(KafkaReplaySource)
    return (
        spark.read.format("kafka_replay")
        .option("path", os.path.join(sf_dir, f"{table}.parquet"))
        .option("topic", table)
        .option("partitions", str(partitions))
        .load()
    )


def read_wire_stream(
    spark,
    sf_dir: str,
    table: str = "events",
    partitions: int = 4,
    batch_rows: int = 0,
    cursor_file: str | None = None,
):
    """Micro-batch stream of the wire records. ``batch_rows=0`` serves
    the whole log in one catch-up batch (always restart-safe);
    ``batch_rows>0`` simulates a live topic publishing that many offsets
    per partition per trigger, with the publication cursor persisted at
    ``cursor_file`` (auto-derived if unset) so the simulated log end
    stays monotone across query restarts."""
    spark.dataSource.register(KafkaReplaySource)
    rd = (
        spark.readStream.format("kafka_replay")
        .option("path", os.path.join(sf_dir, f"{table}.parquet"))
        .option("topic", table)
        .option("partitions", str(partitions))
        .option("batch_rows", str(batch_rows))
    )
    if cursor_file:
        rd = rd.option("cursor_file", cursor_file)
    return rd.load()


def decode_wire(df):
    """Wire records → typed event rows (the A3 decode path on our own
    source): parse the JSON value, rebuild the exact NTZ timestamp from
    epoch-µs, keep the wire metadata columns."""
    from pyspark.sql import functions as F

    parsed = df.select(
        "topic",
        "partition",
        "offset",
        F.from_json(F.col("value").cast("string"), VALUE_DDL).alias("r"),
    )
    return parsed.select(
        "topic",
        "partition",
        "offset",
        F.col("r.event_id").alias("event_id"),
        F.expr(
            "timestampadd(MICROSECOND, r.ts_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts"),
        F.col("r.user_id").alias("user_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.value").alias("value"),
        F.col("r.props").alias("props"),
    )
