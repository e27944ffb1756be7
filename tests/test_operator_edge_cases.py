"""Edge-case pins for the operator-review fixes: inputs the sf-data oracle
sweep can never produce (zero-norm vectors, NULL flags, NULL event times,
string ids, empty payloads) but a 100 TB corpus certainly will. Each test
names the failure it pins."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_zero_norm_vector_never_ranks_or_pairs(spark):
    """0/0 cosine must be NULL, not NaN: Spark sorts NaN above every
    double and passes `NaN >= t`, so an all-zero embedding used to rank as
    everyone's nearest neighbor in the LSH/IVF tiers while the numpy exact
    tier excluded it — the tiers this library validates against each other
    disagreed."""
    from fs2_kafka_streams_spark.operators.similarity import (
        cosine_topk,
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (9, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: no similarity defined
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    topk = cosine_topk(df, df, k=3).collect()
    assert all(r.neighbor_id != 9 and r.query_id != 9 for r in topk)
    assert all(r.cos == r.cos for r in topk)  # no NaN survives

    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(df, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs_lsh(
            df, threshold=0.5, dim=4
        ).collect()
    }
    assert not any(9 in p for p in lsh), "zero vector paired in LSH tier"
    assert lsh <= exact  # LSH can miss, must never invent


def test_scd_history_keeps_rows_with_null_tombstone_flag(spark):
    """A nullable flag set only on tombstones: filter(~NULL) used to drop
    every live row; the flag must coalesce NULL→False like
    apply_changes."""
    from fs2_kafka_streams_spark.operators.scd import changelog_history

    df = spark.createDataFrame(
        [(1, 10, "a", None), (1, 20, "b", None), (1, 30, None, True)],
        "k long, off long, v string, deleted boolean",
    )
    hist = changelog_history(
        df, key_cols=["k"], order_col="off", value_cols=["v"],
        tombstone_col="deleted",
    ).collect()
    assert {(r.v, r.valid_from) for r in hist} == {("a", 10), ("b", 20)}
    assert all(not r.is_current for r in hist)  # tombstone closed "b"


def test_asof_join_ignores_null_right_times(spark):
    """A NULL right_time never matches in ASOF semantics (DuckDB: the
    inequality is never true); NULLS-FIRST ordering used to hand its
    payload to every left row before the first real right row."""
    from fs2_kafka_streams_spark.operators.asof_join import asof_join

    left = spark.createDataFrame(
        [(1, 5), (1, 25)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, 20, "real")], "k long, rt long, payload string"
    )
    got = {
        r.t: r.payload
        for r in asof_join(
            left, right, left_by=["k"], right_by=["k"],
            left_time="t", right_time="rt",
        ).collect()
    }
    assert got == {5: None, 25: "real"}


def test_materialized_table_rejects_boolean_tombstone_col(spark):
    """MaterializedTable's tombstone_col is Kafka's null-VALUE convention;
    a boolean True-means-delete flag (the other operators' convention)
    must be rejected loudly, not silently invert the semantics."""
    from fs2_kafka_streams_spark.operators.table import MaterializedTable

    df = spark.createDataFrame(
        [(1, 1, "a", False)], "k long, off long, v string, deleted boolean"
    )
    with pytest.raises(TypeError, match="null-VALUE convention"):
        MaterializedTable(
            df, key_cols=["k"], order_cols=["off"], tombstone_col="deleted"
        )


def test_shingles_short_doc_is_empty_not_error(spark):
    """size(tok) < n used to make F.sequence count DOWN into index 0 — a
    runtime error on 1-based SQL arrays — and emit truncated shingles."""
    from fs2_kafka_streams_spark.operators.text import shingles, tokens

    df = spark.createDataFrame(
        [("one two",), ("a b c d",), ("",)], "text string"
    )
    got = df.select(shingles(tokens("text"), 3).alias("s")).collect()
    assert [len(r.s) for r in got] == [0, 2, 0]


def test_multimodal_null_and_empty_payloads(spark):
    """NULL / zero-byte binary payloads must not kill the executor task
    (len(None), b''[0])."""
    from fs2_kafka_streams_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    media = spark.createDataFrame(
        [
            (1, "image", 2, 2, bytearray(b"\x01\x02\x03\x04")),
            (2, "image", 0, 0, bytearray(b"")),
            (3, "image", 0, 0, None),
        ],
        "media_id long, kind string, width int, height int, payload binary",
    )
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[2].n_bytes == 0 and feats[3].n_bytes == 0
    assert feats[2].byte_mean == 0.0 and feats[3].byte_mean == 0.0

    out = {r.media_id: r for r in resize_images(media, 4, 4).collect()}
    assert len(out[2].payload) == 16 and set(out[2].payload) == {0}
    assert len(out[3].payload) == 16


def test_connected_components_and_keep_best_on_string_ids(spark):
    """Vertex ids may be string/UUID document ids: the NULL label
    placeholder used to be hard-cast to long (AnalysisException) and the
    keep-best tie-break negated the id (NULL/ANSI error on strings)."""
    from fs2_kafka_streams_spark.operators.clusters import (
        connected_components,
        dedup_keep_best,
    )

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }

    corpus = spark.createDataFrame(
        [("doc-a", 1.0), ("doc-b", 9.0), ("doc-c", 9.0),
         ("doc-x", 1.0), ("doc-y", 1.0), ("doc-solo", 0.0)],
        "doc_id string, quality double",
    )
    kept = {
        r.doc_id
        for r in dedup_keep_best(
            corpus, pairs, "doc_id", quality_col="quality"
        ).collect()
    }
    # best quality wins; quality ties -> smallest id; singletons survive
    assert kept == {"doc-b", "doc-x", "doc-solo"}


def test_chunk_documents_rejects_lossy_stride(spark):
    """stride > chunk_size silently loses the tokens between windows —
    must raise instead."""
    from fs2_kafka_streams_spark.operators.pipeline import chunk_documents

    df = spark.createDataFrame([("a b c",)], "text string").withColumn(
        "doc_id", F.lit(1)
    )
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, "text", "doc_id", chunk_size=8, stride=9)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, "text", "doc_id", chunk_size=8, stride=0)
    # == chunk_size is complete (non-overlapping) and allowed
    rows = chunk_documents(
        df, "text", "doc_id", chunk_size=2, stride=2
    ).collect()
    assert [r.chunk_text for r in sorted(rows, key=lambda r: r.chunk_idx)] == [
        "a b", "c"
    ]


def test_decode_null_and_nonobject_payloads_dead_letter(spark):
    """A NULL payload (Kafka tombstone reaching a value decoder) and
    valid-but-non-object JSON ('5', '[1,2]') must dead-letter, not pass
    clean_view as phantom all-NULL rows — the Result[A] contract says a
    row is clean IFF decode_error is NULL."""
    from fs2_kafka_streams_spark.sources.decode import (
        CsvFormat,
        DecodeRegistry,
        JsonFormat,
        clean_view,
        dead_letters,
    )

    rows = [
        ("j", 0, 0, bytearray(b'{"x": 1}')),
        ("j", 0, 1, bytearray(b"{bad")),
        ("j", 0, 2, bytearray(b"5")),
        ("j", 0, 3, bytearray(b"[1,2]")),
        ("j", 0, 4, None),
        ("c", 0, 0, bytearray(b"1,a")),
        ("c", 0, 1, None),
    ]
    records = spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )
    reg = (
        DecodeRegistry()
        .register("j", JsonFormat("x int"))
        .register("c", CsvFormat("n int, s string"))
    )
    decoded = reg.decode(records)
    clean = {(r.topic, r.offset) for r in clean_view(decoded).collect()}
    dead = {(r.topic, r.offset) for r in dead_letters(decoded).collect()}
    assert clean == {("j", 0), ("c", 0)}
    assert dead == {("j", 1), ("j", 2), ("j", 3), ("j", 4), ("c", 1)}
    assert all(
        r.decode_error is not None
        for r in decoded.collect()
        if (r.topic, r.offset) in dead
    )


def test_decode_registry_heterogeneous_topic_schemas(spark):
    """Topics may declare different schemas (the reference's one
    KafkaDecoder[T] per topic): decoded becomes the by-name field union
    with a topic's missing fields NULL; a name registered with two types
    raises. Previously two differing schemas failed analysis outright."""
    import pytest as _pytest

    from fs2_kafka_streams_spark.sources.decode import (
        DecodeRegistry,
        JsonFormat,
        clean_view,
    )

    records = spark.createDataFrame(
        [
            ("a", 0, 0, bytearray(b'{"x": 7}')),
            ("b", 0, 0, bytearray(b'{"y": "hi", "z": 9}')),
        ],
        "topic string, partition int, offset long, value binary",
    )
    reg = (
        DecodeRegistry()
        .register("a", JsonFormat("x int"))
        .register("b", JsonFormat("y string, z long"))
    )
    got = {r.topic: r for r in clean_view(reg.decode(records)).collect()}
    assert got["a"].x == 7 and got["a"].y is None and got["a"].z is None
    assert got["b"].x is None and got["b"].y == "hi" and got["b"].z == 9

    conflict = (
        DecodeRegistry()
        .register("a", JsonFormat("x int"))
        .register("b", JsonFormat("x string"))
    )
    with _pytest.raises(ValueError, match="conflict"):
        conflict.decode(records)


def test_binary_format_parameterized_ddl_types(spark):
    """BinaryFormat's field names come from a real DDL parse — a
    comma-split used to shear 'decimal(10,2)' into two fields and desync
    the UDF output columns."""
    from decimal import Decimal

    from fs2_kafka_streams_spark.sources.decode import (
        BinaryFormat,
        DecodeRegistry,
        clean_view,
    )

    def fn(b: bytes) -> dict:
        n, s = b.decode().split("|")
        return {"amount": Decimal(n).quantize(Decimal("0.01")), "note": s}

    records = spark.createDataFrame(
        [("t", 0, 0, bytearray(b"12.50|ok"))],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register(
        "t", BinaryFormat("amount decimal(10,2), note string", fn)
    )
    row = clean_view(reg.decode(records)).collect()[0]
    assert row.amount == Decimal("12.50") and row.note == "ok"
