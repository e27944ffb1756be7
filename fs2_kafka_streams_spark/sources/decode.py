"""Decode registry: topic → (format, schema) → typed rows + in-band errors.

Reference mapping:
- ``KafkaDecoder[T]`` typeclass (``codecs/KafkaDecoder.scala:50-52``) →
  a per-topic format entry producing a ``decoded`` struct column.
- ``EnvT`` metadata retention (``EnvT.scala:5``) → Kafka metadata columns
  (topic/partition/offset/timestamp) are carried alongside the payload.
- ``Result[A] = Either[Throwable, A]`` (``model/package.scala:16``) → a
  nullable ``decode_error`` string column; decode failures never kill the
  stream.
- materializer drop of Lefts (``streams/Tables.scala:24-27``) →
  :func:`clean_view`; the complement is :func:`dead_letters` (the DLQ).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METADATA_COLS = ["topic", "partition", "offset", "timestamp"]


@dataclass
class JsonFormat:
    """JSON payload with a declared schema (DDL string or StructType)."""

    schema: str

    def decode(self, value: Column) -> tuple[Column, Column]:
        s = value.cast("string")
        decoded = F.from_json(s, self.schema)
        # from_json yields a struct of NULLs on corrupt input; re-parse via
        # get_json_object to distinguish "corrupt" from "all fields null"
        err = F.when(
            F.get_json_object(s, "$").isNull(),
            F.concat(F.lit("malformed json: "), F.substring(s, 1, 64)),
        )
        return decoded, err


@dataclass
class CsvFormat:
    """Delimited payload with a declared schema."""

    schema: str
    sep: str = ","

    def decode(self, value: Column) -> tuple[Column, Column]:
        s = value.cast("string")
        decoded = F.from_csv(
            s, F.lit(self.schema), {"sep": self.sep, "mode": "PERMISSIVE"}
        )
        err = F.when(
            decoded.isNull(),
            F.concat(F.lit("malformed csv: "), F.substring(s, 1, 64)),
        )
        return decoded, err


@dataclass
class BinaryFormat:
    """Arbitrary bytes→T decoder — the full ``KafkaDecoder`` typeclass
    parity (``codecs/KafkaDecoder.scala:50-52``): any user Python function
    over the raw payload, run as an Arrow-batched pandas UDF, errors
    in-band (a raising decoder dead-letters the row, never kills the
    stream — ``Result[A]`` semantics, ``model/package.scala:16``).

    ``fn(bytes) -> dict`` must return values for every field in ``schema``
    (a flat DDL string like ``"a int, b string"``).
    """

    schema: str
    fn: object  # Callable[[bytes], dict]

    def decode(self, value: Column) -> tuple[Column, Column]:
        import pandas as pd

        field_names = [
            f.strip().split()[0] for f in self.schema.split(",")
        ]
        user_fn = self.fn

        def _decode(s):
            rows = []
            for b in s:
                try:
                    d = user_fn(bytes(b) if b is not None else b"")
                    rows.append({**{k: d.get(k) for k in field_names}, "_err": None})
                except Exception as ex:  # noqa: BLE001 — in-band by design
                    rows.append(
                        {**{k: None for k in field_names},
                         "_err": f"{type(ex).__name__}: {ex}"[:128]}
                    )
            return pd.DataFrame(rows)

        udf = F.pandas_udf(_decode, returnType=f"{self.schema}, _err string")
        out = udf(value)
        return out.dropFields("_err"), out.getField("_err")


class DecodeRegistry:
    """Per-topic decoder registry (the engine's KafkaDecoder table)."""

    def __init__(self):
        self._formats: dict[str, object] = {}

    def register(self, topic: str, fmt) -> "DecodeRegistry":
        self._formats[topic] = fmt
        return self

    def decode(self, records: DataFrame, topic_col: str = "topic") -> DataFrame:
        """Decode a (multi-topic) record DataFrame: adds ``decoded`` struct +
        ``decode_error``; keeps all metadata columns (A3/A4)."""
        if not self._formats:
            raise ValueError("no formats registered")
        decoded_expr = None
        err_expr = None
        for topic, fmt in self._formats.items():
            d, e = fmt.decode(F.col("value"))
            cond = F.col(topic_col) == topic
            decoded_expr = (
                F.when(cond, d) if decoded_expr is None
                else decoded_expr.when(cond, d)
            )
            err_expr = (
                F.when(cond, e) if err_expr is None else err_expr.when(cond, e)
            )
        meta = [c for c in METADATA_COLS if c in records.columns]
        return records.select(
            *meta,
            F.col("value"),
            decoded_expr.alias("decoded"),
            err_expr.alias("decode_error"),
        )


def clean_view(decoded: DataFrame) -> DataFrame:
    """Successfully-decoded rows, payload unnested, metadata retained
    (the materializer's collect-Rights, ``Tables.scala:24-27``)."""
    meta = [c for c in METADATA_COLS if c in decoded.columns]
    return decoded.filter(F.col("decode_error").isNull()).select(
        *meta, "decoded.*"
    )


def dead_letters(decoded: DataFrame) -> DataFrame:
    """The DLQ view: rows whose decode failed, with the error and raw bytes
    (the Lefts of ``Result[A]``)."""
    meta = [c for c in METADATA_COLS if c in decoded.columns]
    return decoded.filter(F.col("decode_error").isNotNull()).select(
        *meta, "value", "decode_error"
    )
