"""Hostile WIRE axis for the Python DataSource (r10 VERDICT Next #6).

The r10 crash-recovery matrix proved the trigger boundaries; the wire
INPUTS themselves were still clean. This module fuzzes the source
against the hostile publication shapes a real deployment sees:

- a REGRESSING / corrupted publication cursor (the pacing file is plain
  JSON on disk — hand edits, partial external writes, clock bugs);
- zero-byte and corrupt ``value`` bytes through the decode path;
- a PARTITION-COUNT SHRINK between restarts (Kafka cannot shrink a
  topic, so a smaller layout is a rewritten broker = data loss — the
  reference's Revoke, ``client/commands.scala:29-35``).

Found and fixed (r11): the shrink silently dropped the vanished
partitions' unserved records (measured 30 of 40 delivered on a 4→2
restart) — it now fails loudly by default and ends the vanished
partitions' streams cleanly under ``failOnDataLoss=false``; a
non-numeric or out-of-range cursor entry crashed ``int()`` /
planned nonsense ranges — it is now coerced-or-re-floored with
exactly-once intact (planning always starts from Spark's committed
offsets, never from the cursor).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _mk_events(d, n=40, n_users=8):
    import numpy as np

    pdf = pd.DataFrame(
        {
            "event_id": range(1, n + 1),
            "ts": pd.to_datetime(
                np.arange(n) * 1_000_000, unit="us"
            ).astype("datetime64[us]"),
            "user_id": [i % n_users for i in range(n)],
            "event_type": ["view"] * n,
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    )
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return pdf


def _drain(spark, d, ckpt, sink, cursor, partitions, batch_rows=5, **kw):
    from fs2_kafka_streams_spark.sources.python_source import (
        read_wire_stream,
    )

    q = (
        read_wire_stream(
            spark,
            d,
            table="events",
            partitions=partitions,
            batch_rows=batch_rows,
            cursor_file=cursor,
            **kw,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _drain_all(spark, d, ckpt, sink, cursor, partitions, expect, **kw):
    """availableNow pins the available offsets at query start, so a paced
    source serves batch_rows x partitions offsets per run — loop runs
    until the sink stops growing (or reaches ``expect``)."""
    last = -1
    for _ in range(12):
        _drain(spark, d, ckpt, sink, cursor, partitions, **kw)
        n = spark.read.parquet(sink).count()
        if n >= expect or n == last:
            break
        last = n
    return spark.read.parquet(sink)


def test_partition_shrink_fails_loudly(spark, tmp_path):
    """A 4→2 partition restart used to deliver 30 of 40 rows with no
    error. Default failOnDataLoss must refuse the shrunken layout."""
    d = str(tmp_path)
    _mk_events(d)
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    cursor = str(tmp_path / "cursor.json")
    _drain_all(spark, d, ckpt, sink, cursor, partitions=4, expect=40)
    with pytest.raises(Exception, match="partition.*gone|gone.*partition"):
        _drain(spark, d, ckpt, sink, cursor, partitions=2)


def test_partition_shrink_clean_end_without_duplicates(spark, tmp_path):
    """failOnDataLoss=false: the vanished partitions' streams end cleanly
    at their committed offsets — the query continues, and no already-
    committed (partition, offset) is ever re-served."""
    d = str(tmp_path)
    _mk_events(d)
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    cursor = str(tmp_path / "cursor.json")
    before = _drain_all(
        spark, d, ckpt, sink, cursor, partitions=4, expect=40
    ).select("partition", "offset").collect()
    assert len(before) == 40
    _drain_all(
        spark, d, ckpt, sink, cursor, partitions=2, expect=10**9,
        fail_on_data_loss=False,
    )
    got = spark.read.parquet(sink).select("partition", "offset")
    # nothing re-served: every (partition, offset) delivered exactly once
    assert got.count() == got.distinct().count()


@pytest.mark.parametrize(
    "corrupt",
    [
        {"events": {"0": "garbage", "1": -99, "2": 10**9, "3": None}},
        {"events": "not-a-dict"},
        {"events": {"0": 0, "1": 0, "2": 0, "3": 0}},  # full regression
    ],
    ids=["garbage-values", "wrong-shape", "regressed-to-zero"],
)
def test_corrupt_cursor_between_restarts(spark, tmp_path, corrupt):
    """A corrupted/regressing publication cursor between restarts must
    not crash planning, must not re-serve committed offsets, and must
    still drain the full log (the cursor only PACES; exactly-once comes
    from Spark's committed offsets)."""
    d = str(tmp_path)
    _mk_events(d)
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    cursor = str(tmp_path / "cursor.json")
    _drain(spark, d, ckpt, sink, cursor, partitions=4)  # partial drain
    with open(cursor, "w") as fh:
        json.dump(corrupt, fh)
    # the wrong-shape corpus makes cur.get(topic, {}) a string; .get on
    # it raises — treat any failure mode other than silent loss as open
    try:
        got = _drain_all(
            spark, d, ckpt, sink, cursor, partitions=4, expect=40
        ).select("partition", "offset")
    except Exception as ex:  # pragma: no cover - would mark a regression
        pytest.fail(f"corrupt cursor crashed the restart: {ex}")
    assert got.count() == got.distinct().count() == 40


def test_cursor_regression_wastes_triggers_not_correctness(spark, tmp_path):
    """Mid-log regression: after a partial drain, rewind the cursor to 0
    and finish — the committed offsets gate re-serving, so the multiset
    is exact."""
    d = str(tmp_path)
    src = _mk_events(d)
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")
    cursor = str(tmp_path / "cursor.json")
    # partial drain (one availableNow round serves 3 offsets/partition),
    # then rewind the cursor to 0 — the regression under test
    _drain(spark, d, ckpt, sink, cursor, partitions=4, batch_rows=3)
    with open(cursor, "w") as fh:
        json.dump({"events": {str(p): 0 for p in range(4)}}, fh)
    got = _drain_all(
        spark, d, ckpt, sink, cursor, partitions=4, expect=40,
        batch_rows=3,
    )
    assert got.count() == len(src)
    assert got.select("partition", "offset").distinct().count() == len(src)


def test_decode_wire_corrupt_value_bytes_in_band(spark):
    """Zero-byte, truncated-JSON, non-JSON, and non-UTF8 value bytes must
    ride the decode path IN-BAND: the row survives with its wire metadata
    and NULL typed fields (A3's errors-as-data contract on the wire
    decode), never a crash, never a dropped row."""
    from fs2_kafka_streams_spark.sources.python_source import decode_wire

    rows = [
        ("t", 0, 0, bytearray(b"")),  # zero-byte
        ("t", 0, 1, bytearray(b'{"event_id": 7, "ts_us": 1000000, '
                              b'"user_id": 3, "event_type": "view", '
                              b'"value": 1.5, "props": "{}"}')),  # clean
        ("t", 1, 0, bytearray(b'{"event_id": 8, "ts_us":')),  # truncated
        ("t", 1, 1, bytearray(b"not json at all")),
        ("t", 2, 0, bytearray(b"\xff\xfe\x00\x01")),  # non-UTF8
    ]
    df = spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )
    out = decode_wire(df).orderBy("partition", "offset").collect()
    assert len(out) == 5, "no wire row may vanish in decode"
    by_po = {(r["partition"], r["offset"]): r for r in out}
    good = by_po[(0, 1)]
    assert good["event_id"] == 7 and good["user_id"] == 3
    assert good["value"] == 1.5
    for po in [(0, 0), (1, 0), (1, 1), (2, 0)]:
        r = by_po[po]
        assert r["event_id"] is None and r["ts"] is None, po
    # metadata intact on every row
    assert all(r["topic"] == "t" for r in out)
