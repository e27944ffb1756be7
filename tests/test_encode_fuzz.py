"""Property-fuzz of the ENCODER half of the wire contract (VERDICT r8 #5).

``test_decode_fuzz.py`` pins decode totality; this is the producer-side
twin over ``encode_for_kafka_checked`` (``sources/kafka.py``, ≙ the
reference's ``codecs/KafkaEncoder.scala:20-27`` made total over untyped
frames):

    encode → wire records → decode ≡ identity on the encodable view,
    and un-encodable rows land in the errors view — never vanish, never
    appear in both.

Row classes: NULL keys, empty/unicode/oversized/control-char payload
strings, NULL payload fields, NaN/±inf doubles, NULL timestamps, valid
and garbage timestamp strings, NULL/valid/negative/overflowing partition
ids (ANSI long→int overflow is the real per-row producer failure this
container can exhibit).
"""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.sources.decode import (
    DecodeRegistry,
    JsonFormat,
    clean_view,
)
from fs2_kafka_streams_spark.sources.kafka import encode_for_kafka_checked

VALUE_SCHEMA = "id bigint, s string, d double"


def _rows(rng: random.Random, n: int = 300):
    strings = [
        "plain",
        "",
        "é∀ — ünïcode",
        'quotes " and \\ backslash',
        "new\nline\ttab",
        "x" * 65536,
        None,
        "\x00\x01 control",
    ]
    doubles = [1.5, 0.0, -0.0, float("nan"), float("inf"), -2.5e308, None]
    keys = ["k1", "", "é-key", None]
    parts = [0, 3, 31, -1, None, 2**40, -(2**40)]  # last two: ANSI overflow
    tss = [
        "2024-01-02 03:04:05",
        "2024-02-29T23:59:59.123456",
        None,
        "not-a-time",
        "2024-13-45 99:99:99",
    ]
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice(strings),
                rng.choice(doubles),
                rng.choice(keys),
                rng.choice(parts),
                rng.choice(tss),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_encode_partition_invariant_and_roundtrip(spark, seed):
    rng = random.Random(seed)
    rows = _rows(rng)
    df = spark.createDataFrame(
        rows,
        "id bigint, s string, d double, key string, part bigint, tss string",
    )
    enc = encode_for_kafka_checked(
        df,
        value_cols=["id", "s", "d"],
        key_col="key",
        topic="t",
        partition_col="part",
        timestamp_col="tss",
    )
    got = enc.collect()

    # ---- totality: every input row appears exactly once --------------
    assert len(got) == len(rows)
    ids = sorted(json.loads(bytes(r["value"]))["id"] for r in got)
    assert ids == list(range(len(rows)))

    # ---- error classification is exactly the un-encodable set --------
    def expect_err(row) -> bool:
        _, _, _, _, part, ts = row
        bad_part = part is not None and not (-(2**31) <= part < 2**31)
        bad_ts = ts is not None and ts.startswith(("not-", "2024-13"))
        return bad_part or bad_ts

    by_id = {json.loads(bytes(r["value"]))["id"]: r for r in got}
    for row in rows:
        r = by_id[row[0]]
        if expect_err(row):
            assert r["error"] is not None, f"row {row[0]} should error"
        else:
            assert r["error"] is None, f"row {row[0]}: {r['error']}"
            # legal NULL producer fields stay NULL, not errors
            if row[4] is None:
                assert r["partition"] is None
            if row[5] is None:
                assert r["timestamp"] is None

    # ---- encodable view → wire → decode ≡ identity --------------------
    clean = enc.filter(F.col("error").isNull()).drop("error")
    wire = clean.select(
        "key",
        "value",
        "topic",
        F.coalesce("partition", F.lit(0)).alias("partition"),
        F.row_number().over(Window.orderBy(F.lit(1))).cast("long").alias(
            "offset"
        ),
        F.coalesce(
            "timestamp", F.lit("2024-01-01").cast("timestamp")
        ).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    reg = DecodeRegistry().register("t", JsonFormat(VALUE_SCHEMA))
    out = clean_view(reg.decode(wire))
    decoded = {r["id"]: r for r in out.collect()}
    originals = {row[0]: row for row in rows if not expect_err(row)}
    assert set(decoded) == set(originals)

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)  # nan/inf spelled out; -0.0 preserved
        return str(v)

    for i, row in originals.items():
        assert canon(decoded[i]["s"]) == canon(row[1]), f"s diverged at {i}"
        assert canon(decoded[i]["d"]) == canon(row[2]), f"d diverged at {i}"


def test_encode_checked_no_fallible_fields_is_total(spark):
    """Without partition/timestamp columns nothing can fail: error is the
    all-NULL column and the frame matches encode_for_kafka's contract."""
    df = spark.createDataFrame([(1, "a"), (2, None)], "id bigint, s string")
    enc = encode_for_kafka_checked(df, ["id", "s"], key_col="id", topic="t")
    rows = enc.collect()
    assert all(r["error"] is None for r in rows)
    assert [f.name for f in enc.schema.fields] == [
        "value",
        "key",
        "topic",
        "error",
    ]
