"""Structured Streaming surface: deterministic file replay, watermarked
windowed aggregation, streaming dedup, and the stateful latest-by-key
operator (the reference's table materialization, A7/A9)."""

from fs2_kafka_streams_spark.streaming.replay import replay_dir  # noqa: F401
