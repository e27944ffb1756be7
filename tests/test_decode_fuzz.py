"""Property-fuzz of the decode tier (VERDICT r7 #7).

r7 closed five phantom-clean-row / reserved-field holes in ``decode.py``
one at a time, each found by hand. This pins the CLASS with one invariant
over seeded-random payload×topic space:

    every input row lands in EXACTLY ONE of clean_view ∪ dead_letters,
    and their union preserves the input row multiset.

Payload classes: valid, field-type-corrupt, non-object JSON roots,
malformed bytes, empty, whitespace, NULL, oversized, raw binary garbage,
unicode. Topic classes: each registered format (Json/Csv/Binary),
an UNREGISTERED topic, and a NULL topic. A violation means a row either
vanished (dropped Left — breaks the reference's Result[A] contract,
``model/package.scala:16``) or appeared in both views / as a phantom
clean row.
"""

from __future__ import annotations

import json
import random

import pytest

from fs2_kafka_streams_spark.sources.decode import (
    BinaryFormat,
    CsvFormat,
    DecodeRegistry,
    JsonFormat,
    clean_view,
    dead_letters,
)

SCHEMA = "a int, b string"


def _bin_fn(b: bytes) -> dict:
    # raises on non-int payloads — the in-band error path under fuzz
    return {"a": int(b), "b": "ok"}


def _payloads(rng: random.Random) -> list[bytes | None]:
    a, b = rng.randint(-10**6, 10**6), rng.choice(["x", "", "é∀", "q" * 50])
    valid_json = json.dumps({"a": a, "b": b}).encode()
    choices = [
        valid_json,
        json.dumps({"a": "notint", "b": b}).encode(),  # field-corrupt
        json.dumps(a).encode(),                        # non-object root
        json.dumps([a, a]).encode(),                   # array root
        f"{a},{b}".encode(),                           # valid csv / bin err
        f"notint,{b},extra,extra2".encode(),           # csv corrupt-ish
        str(a).encode(),                               # valid for binary fn
        b"{truncated",
        b"",
        b"   ",
        b"\t\n",
        None,
        bytes(rng.randbytes(16)),                      # raw garbage
        ("é∀" * rng.randint(1, 5)).encode(), # unicode
        b"x" * 65536,                                  # oversized
        json.dumps({"a": None, "b": None}).encode(),   # nulls-in-object
        json.dumps({"c": 1}).encode(),                 # only-unknown field
    ]
    return choices


TOPICS = ["tj", "tc", "tb", "unregistered", None]

#: record {a: long, b: string} — "\x02\x02x" is (a=1, b="x") in avro binary
_AVRO_SCHEMA = (
    '{"type":"record","name":"r","fields":'
    '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_decode_partition_invariant(spark, seed):
    from fs2_kafka_streams_spark.sources.decode import (
        AvroFormat,
        has_avro_datasource,
    )

    # the 4th format is environment-gated: spark-avro is an external
    # package absent in this container; wherever it IS present, the fuzz
    # covers it too (valid avro bytes land among the payload classes)
    avro = has_avro_datasource(spark)
    topics = TOPICS + (["ta"] if avro else [])
    rng = random.Random(seed)
    rows = []
    off = 0
    for _ in range(400):
        p = rng.choice(_payloads(rng) + ([b"\x02\x02x"] if avro else []))
        t = rng.choice(topics)
        rows.append((t, 0, off, p))
        off += 1
    records = spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )
    reg = (
        DecodeRegistry()
        .register("tj", JsonFormat(SCHEMA))
        .register("tc", CsvFormat(SCHEMA))
        .register("tb", BinaryFormat(SCHEMA, _bin_fn))
    )
    if avro:
        reg = reg.register("ta", AvroFormat(_AVRO_SCHEMA))
    decoded = reg.decode(records)
    clean = clean_view(decoded)
    dlq = dead_letters(decoded)

    clean_offsets = [r["offset"] for r in clean.select("offset").collect()]
    dlq_offsets = [r["offset"] for r in dlq.select("offset").collect()]
    assert len(clean_offsets) == len(set(clean_offsets))
    assert len(dlq_offsets) == len(set(dlq_offsets))
    overlap = set(clean_offsets) & set(dlq_offsets)
    assert not overlap, f"rows in BOTH views: {sorted(overlap)[:5]}"
    missing = set(range(off)) - set(clean_offsets) - set(dlq_offsets)
    assert not missing, f"rows VANISHED: {sorted(missing)[:5]}"

    # class-level spot checks: unregistered/NULL topics are always DLQ;
    # a valid payload on its matching topic is always clean
    by_off = {r[2]: (r[0], r[3]) for r in rows}
    for o in clean_offsets:
        t, p = by_off[o]
        assert t in ("tj", "tc", "tb", "ta"), f"clean row from topic {t!r}"
        assert p is not None, "NULL payload decoded clean"
