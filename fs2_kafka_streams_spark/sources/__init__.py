"""Sources & sinks: Kafka (streaming), parquet/csv/json (batch fixtures),
and the decode registry that turns raw byte records into typed rows with
in-band errors."""

from fs2_kafka_streams_spark.sources.decode import (  # noqa: F401
    DecodeRegistry,
    JsonFormat,
    clean_view,
    dead_letters,
)
