"""Column-expression helpers shared across operators and queries."""

from fs2_kafka_streams_spark.functions.hashing import (  # noqa: F401
    md5_int64,
    SQL_MD5_INT64,
)
