"""fs2-kafka-streams-spark: a PySpark-native analytics/stream-processing engine.

A brand-new, DataFrame-first engine with the query and data-processing
capabilities of the reference library ``iravid/fs2-kafka-streams`` (a
cats-effect/fs2 Kafka consumer + KTable-style materialized tables), re-expressed
on Apache Spark:

- Streams are (unbounded) DataFrames; tables are latest-by-key materializations
  (reference: ``streams/Tables.scala:46-70``).
- Decode errors are in-band (dead-letter columns), mirroring
  ``Result[A] = Either[Throwable, A]`` (reference: ``model/package.scala:16``).
- The full relational query surface (scans, joins, aggregations, windows,
  streaming semantics) plus LLM-data-pipeline operators (dedup, similarity
  search, text analysis) designed for 100 TB scale.

Everything here derives from the public Apache Spark API; nothing is copied
from the reference (which is JVM/Scala — a different execution model entirely).
"""

__version__ = "0.1.0"

from fs2_kafka_streams_spark.session import get_spark  # noqa: F401
from fs2_kafka_streams_spark.catalog import Catalog, TABLES  # noqa: F401
