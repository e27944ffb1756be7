"""Kafka source & sink wrappers (A1/A2/A15/A18/A23).

Reference mapping (all consumer mechanics — poll loop, partition demux,
rebalance, backpressure, commit queue — are *internal* to Spark's Kafka
source; this wrapper only surfaces the knobs):

- Subscription.Topics / .Pattern (``client/Subscription.scala:3-7``) →
  ``subscribe`` / ``subscribePattern`` options.
- Partitioned vs plain stream (``RecordStream.scala:14-18``) → the
  ``partition`` column; per-partition ordering is preserved into tasks.
- Backpressure via buffer pause/resume (``RecordStream.scala:110-150``) →
  ``maxOffsetsPerTrigger`` / ``minOffsetsPerTrigger`` rate limits.
- Offset recovery (``RecordStream.scala:194-219``) → ``startingOffsets`` +
  checkpoint recovery (automatic, exactly-once for state).
- Producer (``client/Producer.scala:37-55``) → ``writeStream.format("kafka")``
  with key/value binary columns.

This container has no Kafka broker or connector jars, so ``load()`` raises
a clear error; everything up to the reader construction is plain option
plumbing and IS unit-tested. The decode layer (``sources/decode.py``) is
broker-independent and tested against synthetic byte records.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

#: With ``includeHeaders=true`` the source adds the record headers —
#: ``ByteRecord`` carries them in the reference (``model/package.scala:8``;
#: SURVEY §1.3 source schema).
KAFKA_HEADERS_FIELD = "headers array<struct<key:string,value:binary>>"
KAFKA_SCHEMA_WITH_HEADERS = f"{KAFKA_SCHEMA}, {KAFKA_HEADERS_FIELD}"


@dataclass
class KafkaSourceConfig:
    bootstrap_servers: str
    topics: list[str] | None = None
    pattern: str | None = None
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    min_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = True
    include_headers: bool = False
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        if (self.topics is None) == (self.pattern is None):
            raise ValueError("exactly one of topics / pattern required")
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        if self.topics is not None:
            opts["subscribe"] = ",".join(self.topics)
        else:
            opts["subscribePattern"] = self.pattern
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.min_offsets_per_trigger is not None:
            opts["minOffsetsPerTrigger"] = str(self.min_offsets_per_trigger)
        if self.include_headers:
            opts["includeHeaders"] = "true"
        opts.update(self.extra)
        return opts


def read_stream(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """The plain stream (A2): all partitions merged, unordered across
    partitions — order within a partition preserved."""
    reader = spark.readStream.format("kafka")
    for k, v in cfg.options().items():
        reader = reader.option(k, v)
    return reader.load()


def read_batch(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """Bounded snapshot read of the same topics (batch Kafka source).

    The streaming-only knobs are NOT silently carried over: the batch
    source ignores ``maxOffsetsPerTrigger``/``minOffsetsPerTrigger``
    (the "bounded" read would scan the whole topic), and forbids
    ``startingOffsets=latest`` — both are config errors here, raised
    with the batch alternatives (``endingOffsets``/explicit offset
    ranges via ``extra``) instead of discovered mid-scan."""
    # validate the MERGED options, after cfg.extra overrides, and
    # case-insensitively (Spark's option keys and the offset sentinels
    # are both case-insensitive) — checking only the dataclass fields
    # would let extra={"startingOffsets": "latest"} bypass the guard and
    # spuriously reject a cfg whose extra overrides it back to a range
    opts = cfg.options()
    folded = {k.lower(): str(v) for k, v in opts.items()}
    if folded.get("startingoffsets", "").strip().lower() == "latest":
        raise ValueError(
            "startingOffsets=latest is a streaming posture; a batch read "
            "of 'nothing before now' is empty by definition — pass "
            "explicit offsets (or 'earliest' with endingOffsets in extra)"
        )
    if "maxoffsetspertrigger" in folded or "minoffsetspertrigger" in folded:
        raise ValueError(
            "maxOffsetsPerTrigger/minOffsetsPerTrigger are ignored by the "
            "batch Kafka source — the read would silently scan the whole "
            "topic; bound a batch read with startingOffsets/endingOffsets "
            "JSON ranges instead"
        )
    reader = spark.read.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def encode_for_kafka(
    df: DataFrame,
    value_cols: list[str],
    key_col: str | None = None,
    topic: str | None = None,
    partition_col: str | None = None,
    timestamp_col: str | None = None,
    headers_col: str | None = None,
) -> DataFrame:
    """KafkaEncoder (A15): payload → JSON value bytes + optional key bytes.
    Mirrors ``KafkaEncoder.encode: T => (Option[Key], Value)``
    (``codecs/KafkaEncoder.scala:24-28``).

    ``Producer.produce`` takes explicit topic/partition/timestamp
    (``client/Producer.scala:22-35``); the Kafka sink honors the same via
    the ``partition`` / ``timestamp`` / ``headers`` columns — pass the
    source columns through here to pin them."""
    out = _encode_exprs(df, value_cols, key_col=key_col, topic=topic)
    if partition_col is not None:
        out.append(F.col(partition_col).cast("int").alias("partition"))
    if timestamp_col is not None:
        out.append(F.col(timestamp_col).cast("timestamp").alias("timestamp"))
    if headers_col is not None:
        out.append(F.col(headers_col).alias("headers"))
    return df.select(*out)


def _encode_exprs(
    df: DataFrame,
    value_cols: list[str],
    key_col: str | None = None,
    topic: str | None = None,
) -> list:
    """The INFALLIBLE producer expressions shared by both encoder forms:
    value/key/topic never fail per row (to_json and string→binary are
    total; a binary key passes through byte-for-byte)."""
    out = [F.to_json(F.struct(*value_cols)).cast("binary").alias("value")]
    if key_col is not None:
        # a key that is ALREADY binary passes through untouched: a
        # binary→string→binary round-trip UTF-8-decodes the bytes and
        # mangles any non-UTF8 key (Avro/hashed), silently changing its
        # Kafka partition assignment downstream. Resolve the type through
        # select() so nested paths ("payload.user_id") keep working.
        from pyspark.sql.types import BinaryType

        key = F.col(key_col)
        key_type = df.select(key).schema.fields[0].dataType
        if not isinstance(key_type, BinaryType):
            key = key.cast("string").cast("binary")
        out.append(key.alias("key"))
    if topic is not None:
        out.append(F.lit(topic).alias("topic"))
    return out


def encode_for_kafka_checked(
    df: DataFrame,
    value_cols: list[str],
    key_col: str | None = None,
    topic: str | None = None,
    partition_col: str | None = None,
    timestamp_col: str | None = None,
    headers_col: str | None = None,
) -> DataFrame:
    """:func:`encode_for_kafka` with PER-ROW totality: rows whose producer
    fields cannot be encoded land in an in-band ``error`` column instead
    of killing the whole write — the producer-side mirror of the decode
    tier's ``Result[A]`` (``model/package.scala:16``; the reference's
    ``KafkaEncoder`` is total only because its input is already typed —
    here the frame may carry wire-incompatible VALUES, and under ANSI a
    single out-of-range partition (cast long→int overflow) or
    un-castable timestamp string would otherwise fail the job at row
    granularity).

    Output: the sink columns (value/key/topic/partition/timestamp/
    headers, as applicable) plus ``error`` (NULL = encodable). Filter
    ``error IS NULL`` for the producible view and its complement for the
    errors view — every input row appears in exactly one
    (tests/test_encode_fuzz.py pins the partition invariant). Failed
    fields are NULL in the error row; route the errors view to a DLQ
    with the original frame joined back on a row id if the raw values
    are needed.
    """
    out = _encode_exprs(df, value_cols, key_col=key_col, topic=topic)
    errs: list = []
    # the fallible producer fields go through try_cast: NULL-out on
    # failure and record why. A NULL SOURCE value is legal (the broker
    # assigns the partition / stamps broker time), so only
    # non-null-in → null-out counts as a failure.
    if partition_col is not None:
        p = F.col(partition_col).try_cast("int")
        errs.append(
            F.when(
                F.col(partition_col).isNotNull() & p.isNull(),
                F.concat(
                    F.lit("partition: cannot cast to int: "),
                    F.coalesce(
                        F.col(partition_col).try_cast("string"),
                        F.lit("<unprintable>"),
                    ),
                ),
            )
        )
        out.append(p.alias("partition"))
    if timestamp_col is not None:
        t = F.col(timestamp_col).try_cast("timestamp")
        errs.append(
            F.when(
                F.col(timestamp_col).isNotNull() & t.isNull(),
                F.concat(
                    F.lit("timestamp: cannot cast to timestamp: "),
                    F.coalesce(
                        F.col(timestamp_col).try_cast("string"),
                        F.lit("<unprintable>"),
                    ),
                ),
            )
        )
        out.append(t.alias("timestamp"))
    if headers_col is not None:
        out.append(F.col(headers_col).alias("headers"))
    error = (
        F.coalesce(*errs) if errs else F.lit(None).cast("string")
    ).alias("error")
    # one projection over the original frame — a single scan-stage
    # expression set, no join, no second pass
    return df.select(*out, error)


def write_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
):
    """Kafka sink (A15): at-least-once per micro-batch; the commit queue /
    ack machinery of the reference (A16, ``CommitQueue.scala``) is Spark's
    checkpoint offset log — one commit per micro-batch, max-offset merge."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
