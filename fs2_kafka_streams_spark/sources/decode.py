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
        from pyspark.sql.types import StructType

        if "_corrupt" in {f.name for f in StructType.fromDDL(self.schema).fields}:
            # the corrupt-record channel appends a field of this name; a
            # user field would collide (duplicate struct field — ambiguous
            # getField, rows misclassified as dead letters)
            raise ValueError(
                "JsonFormat reserves the field name '_corrupt' for its "
                "corrupt-record channel; rename the schema field"
            )
        s = value.cast("string")
        decoded = F.from_json(
            s,
            f"{self.schema}, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        )
        # Two independent error channels, because from_json yields a struct
        # of NULLs (never a null struct) on corrupt input:
        # 1. json_object_keys is NULL exactly when the payload is not a
        #    JSON OBJECT — malformed bytes, valid non-object roots ('5',
        #    '[1,2]', which can never fill a struct schema), and NULL
        #    payloads (coalesce keeps the message non-NULL so the row
        #    cannot masquerade as clean);
        # 2. the _corrupt record catches FIELD-level failures inside a
        #    well-formed object ('{"a":"xyz"}' for an int field), which
        #    would otherwise decode to NULL fields with a NULL error and
        #    pass clean_view as a phantom row — the same Result[A] hole
        #    CsvFormat closes. A merely-missing field stays clean (NULL
        #    value): JSON objects are sparse by design.
        err = F.when(
            F.json_object_keys(s).isNull(),
            F.concat(
                F.lit("malformed json: "),
                F.coalesce(F.substring(s, 1, 64), F.lit("<null payload>")),
            ),
        ).when(
            decoded.getField("_corrupt").isNotNull(),
            F.concat(F.lit("malformed json field: "), F.substring(s, 1, 64)),
        )
        return decoded.dropFields("_corrupt"), err


@dataclass
class CsvFormat:
    """Delimited payload with a declared schema.

    Corrupt-row detection uses ``columnNameOfCorruptRecord``: in PERMISSIVE
    mode ``from_csv`` returns a non-null struct with null fields for
    malformed input (never a null struct), so a naive ``decoded.isNull()``
    check lets corrupt rows masquerade as successfully-decoded all-null rows
    — breaking the ``Result[A]``/DLQ contract (the reference drops Lefts
    explicitly, ``streams/Tables.scala:24-27``).
    """

    schema: str
    sep: str = ","

    def decode(self, value: Column) -> tuple[Column, Column]:
        from pyspark.sql.types import StructType

        if "_corrupt" in {
            f.name for f in StructType.fromDDL(self.schema).fields
        }:
            # same reservation as JsonFormat: the corrupt-record channel
            # appends this field; a user field would collide with an
            # opaque AMBIGUOUS_REFERENCE at decode time
            raise ValueError(
                "CsvFormat reserves the field name '_corrupt' for its "
                "corrupt-record channel; rename the schema field"
            )
        s = value.cast("string")
        decoded = F.from_csv(
            s,
            F.lit(f"{self.schema}, _corrupt string"),
            {
                "sep": self.sep,
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt",
            },
        )
        err = F.when(
            # from_csv(NULL) is a NULL struct with a NULL _corrupt field —
            # without this branch a NULL payload would carry NULL decoded
            # AND NULL error, passing clean_view as a phantom row
            s.isNull(),
            F.lit("malformed csv: <null payload>"),
        ).when(
            # an EMPTY payload decodes to an all-NULL struct with NULL
            # _corrupt — the other phantom-clean-row hole (zero-byte
            # tombstones, truncated writes)
            F.length(s) == 0,
            F.lit("malformed csv: <empty payload>"),
        ).when(
            decoded.getField("_corrupt").isNotNull(),
            F.concat(F.lit("malformed csv: "), F.substring(s, 1, 64)),
        )
        return decoded.dropFields("_corrupt"), err


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

    #: tells DecodeRegistry this decode runs in a Python worker, so its
    #: input must be gated per topic (see DecodeRegistry.decode)
    python_backed = True

    def decode(self, value: Column) -> tuple[Column, Column]:
        import pandas as pd

        from pyspark.sql.types import StructType

        # real DDL parse, not a comma split: "a decimal(10,2), b string"
        # would otherwise split inside the type and desync the UDF's
        # pandas columns from the declared struct
        field_names = [f.name for f in StructType.fromDDL(self.schema).fields]
        if "_err" in field_names:
            # same reservation as JsonFormat/_corrupt: the in-band error
            # channel appends this field; a user field would produce a
            # duplicate struct field and an opaque ambiguous reference
            raise ValueError(
                "BinaryFormat reserves the field name '_err' for its "
                "in-band error channel; rename the schema field"
            )
        user_fn = self.fn

        def _decode(s):
            rows = []
            none_row = {**{k: None for k in field_names},
                        "_err": "null payload: nothing to decode"}
            for b in s:
                if b is None:
                    # NULL payload → dead letter (uniform with JsonFormat's
                    # "<null payload>"), and — critically — the fast path
                    # for rows of OTHER topics: DecodeRegistry gates this
                    # UDF's input with when(topic == mine, value), because
                    # Spark extracts Python UDFs out of CASE WHEN and runs
                    # them over EVERY row; without the gate a registry with
                    # one binary topic would ship all topics' payload bytes
                    # through the Python worker and user decoder.
                    rows.append(none_row)
                    continue
                try:
                    d = user_fn(bytes(b))
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


def has_avro_datasource(spark) -> bool:
    """True when the spark-avro package is usable in this session (probed by
    actually analyzing a ``from_avro`` expression — the classes may be on
    the classpath while the datasource is still unregistered)."""
    try:
        from pyspark.sql.avro.functions import from_avro

        probe = '{"type":"record","name":"p","fields":[]}'
        spark.range(1).select(
            from_avro(F.lit(b"").alias("v"), probe).alias("d")
        ).schema
        return True
    except Exception:  # noqa: BLE001 — any failure means "not usable"
        return False


@dataclass
class AvroFormat:
    """Avro payload with a declared writer schema (the ``from_avro`` path —
    closes the SURVEY §1.3 KafkaDecoder mapping).

    The spark-avro datasource is an EXTERNAL package (not bundled with a
    stock Spark distribution, absent in this container), so construction of
    the decode expression raises a clear error when it is unavailable —
    mirroring the tws env-gate. ``BinaryFormat`` with a Python avro reader
    remains the dependency-free fallback.
    """

    avro_schema: str  # JSON Avro schema string

    def decode(self, value: Column) -> tuple[Column, Column]:
        from pyspark.sql.avro.functions import from_avro

        # PERMISSIVE: corrupt records decode to a null struct (unlike CSV).
        decoded = from_avro(value, self.avro_schema, {"mode": "PERMISSIVE"})
        err = F.when(decoded.isNull(), F.lit("malformed avro payload"))
        return decoded, err


class DecodeRegistry:
    """Per-topic decoder registry (the engine's KafkaDecoder table)."""

    def __init__(self):
        self._formats: dict[str, object] = {}

    def register(self, topic: str, fmt) -> "DecodeRegistry":
        self._formats[topic] = fmt
        return self

    def decode(self, records: DataFrame, topic_col: str = "topic") -> DataFrame:
        """Decode a (multi-topic) record DataFrame: adds ``decoded`` struct +
        ``decode_error``; keeps all metadata columns (A3/A4).

        Topics may declare DIFFERENT schemas (the reference's model: one
        ``KafkaDecoder[T]`` per topic): the ``decoded`` struct is the
        by-name UNION of every registered schema, with a topic's missing
        fields NULL — the single-column analogue of reading heterogeneous
        topics into one DataFrame. A field name claimed by two topics with
        two different types is a registry conflict and raises."""
        if not self._formats:
            raise ValueError("no formats registered")
        pairs = []
        for topic, fmt in self._formats.items():
            v = F.col("value")
            if getattr(fmt, "python_backed", False):
                # Python-backed decoders are EXTRACTED out of the CASE WHEN
                # below (ExtractPythonUDFs) and evaluated over every row of
                # every topic; gate their input so foreign rows arrive as
                # NULL and skip the user decoder instead of shipping other
                # topics' full payload volume through the Python worker.
                v = F.when(F.col(topic_col) == topic, v)
            pairs.append((topic, *fmt.decode(v)))
        # analysis-only probe for each topic's decoded struct type; merge
        # into the field-union supertype (insertion-ordered, stable)
        types = {
            topic: records.select(d.alias("_d")).schema["_d"].dataType
            for topic, d, _ in pairs
        }
        merged: dict[str, object] = {}
        for topic, t in types.items():
            for fld in t.fields:
                prev = merged.get(fld.name)
                if prev is not None and prev != fld.dataType:
                    raise ValueError(
                        f"decode registry conflict: field {fld.name!r} is "
                        f"{fld.dataType.simpleString()} for topic "
                        f"{topic!r} but {prev.simpleString()} in an "
                        "earlier registration"
                    )
                merged.setdefault(fld.name, fld.dataType)
        homogeneous = all(
            [f.name for f in t.fields] == list(merged) for t in types.values()
        )
        decoded_expr = None
        err_expr = None
        for topic, d, e in pairs:
            if not homogeneous:
                have = {f.name for f in types[topic].fields}
                d = F.struct(
                    *[
                        d.getField(name).alias(name)
                        if name in have
                        else F.lit(None).cast(dtype).alias(name)
                        for name, dtype in merged.items()
                    ]
                )
            cond = F.col(topic_col) == topic
            decoded_expr = (
                F.when(cond, d) if decoded_expr is None
                else decoded_expr.when(cond, d)
            )
            err_expr = (
                F.when(cond, e) if err_expr is None else err_expr.when(cond, e)
            )
        # Rows from a topic with no registered decoder are dead letters, not
        # silently "decoded to NULL": without this otherwise() they'd carry
        # NULL decoded AND NULL decode_error and pass clean_view's filter.
        # coalesce the topic: concat with a NULL topic would return NULL,
        # turning an unroutable row into a phantom CLEAN row — the exact
        # hole this otherwise() exists to close
        err_expr = err_expr.otherwise(
            F.concat(
                F.lit("no decoder registered for topic: "),
                F.coalesce(F.col(topic_col), F.lit("<null topic>")),
            )
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
