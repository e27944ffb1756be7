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
    assert not any(9 in p for p in exact), "zero vector paired in exact tier"
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


def test_apply_changes_is_order_aware_across_batches(spark):
    """Chained event-time merges where batches OVERLAP in order_col: a
    delta row older than the snapshot's recorded position must lose (no
    value regression), and with keep_tombstones=True a late record older
    than a kept tombstone must not resurrect the key — the batch twin of
    the streaming engines' kept tombstone marker."""
    from fs2_kafka_streams_spark.operators.incremental import apply_changes

    schema = "k long, v string, ord long, deleted boolean"

    def batch(rows):
        return spark.createDataFrame(rows, schema)

    # batch 1: k1 value@100; k2 tombstone@100
    snap = apply_changes(
        None, batch([(1, "new", 100, False), (2, None, 100, True)]),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted", keep_tombstones=True,
    )
    # batch 2 (late, overlapping): k1 older value@50 must lose;
    # k2 older record@50 must stay dead; k3 fresh insert
    snap2 = apply_changes(
        snap, batch([(1, "old", 50, False), (2, "ghost", 50, False),
                     (3, "live", 60, False)]),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted", keep_tombstones=True,
    )
    got = {r.k: (r.v, r.ord, r.deleted) for r in snap2.collect()}
    assert got[1] == ("new", 100, False)      # no regression
    assert got[2][2] is True and got[2][1] == 100  # tombstone retained
    assert got[3] == ("live", 60, False)
    live = {r.k for r in snap2.filter("not deleted").collect()}
    assert live == {1, 3}

    # default mode (offset-driven, non-overlapping batches): output schema
    # unchanged — live rows only, no tombstone column
    plain = apply_changes(
        None, batch([(1, "a", 1, False), (1, None, 2, True)]),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted",
    )
    assert plain.columns == ["k", "v", "ord"] and plain.count() == 0


def test_encode_for_kafka_binary_key_passthrough(spark):
    """A binary key must pass through byte-for-byte: the old
    binary->string->binary round-trip UTF-8-mangled non-UTF8 keys,
    changing their Kafka partition assignment downstream."""
    from fs2_kafka_streams_spark.sources.kafka import encode_for_kafka

    raw = bytes([0xC3, 0x28, 0xFF, 0x00, 0x01])  # invalid UTF-8
    df = spark.createDataFrame(
        [(bytearray(raw), 1)], "k binary, x long"
    )
    out = encode_for_kafka(df, value_cols=["x"], key_col="k").collect()[0]
    assert bytes(out.key) == raw
    # string keys still encode to their UTF-8 bytes
    df2 = spark.createDataFrame([("uid-7", 1)], "k string, x long")
    out2 = encode_for_kafka(df2, value_cols=["x"], key_col="k").collect()[0]
    assert bytes(out2.key) == b"uid-7"


def test_read_batch_rejects_streaming_only_knobs(spark):
    """Batch Kafka reads silently ignore the per-trigger rate limits and
    forbid startingOffsets=latest — both must fail fast as config errors
    instead of scanning the whole topic / failing mid-plan."""
    from fs2_kafka_streams_spark.sources.kafka import (
        KafkaSourceConfig,
        read_batch,
    )

    with pytest.raises(ValueError, match="streaming posture"):
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"], starting_offsets="latest",
        ))
    with pytest.raises(ValueError, match="maxOffsetsPerTrigger"):
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"], max_offsets_per_trigger=100,
        ))


def test_salted_join_hot_threshold_equals_plain_join(spark):
    """Hot-keys-only salting (hot_threshold): only keys above the
    frequency threshold are replicated across salts, and the result is
    row-for-row the plain join for inner AND left."""
    from fs2_kafka_streams_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(50)]      # hot key
        + [(2, 100), (3, 101), (9, 102)],  # cold keys; 9 unmatched
        "k long, x long",
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "unused")],
        "k long, name string",
    )
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, big.join(small, "k", how).collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(
                    big, small, "k", salt=4, how=how, hot_threshold=10
                ).collect(),
            )
        )
        assert salted == plain, how


def test_get_spark_reuse_warns_on_ineffective_static_conf(spark):
    """getOrCreate on an existing session copies builder configs into the
    runtime conf even when they are STATIC and can no longer take effect
    — conf.get() then echoes the new value, hiding the drop. get_spark
    must warn on exactly those keys and stay silent for runtime-settable
    ones (which getOrCreate really does apply)."""
    import warnings

    from fs2_kafka_streams_spark.session import get_spark

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_spark(extra_conf={"spark.eventLog.enabled": "true"})
    assert any("did NOT take effect" in str(x.message) for x in w)

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            s = get_spark(
                extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10485760"}
            )
        assert not [x for x in w if "did NOT take effect" in str(x.message)]
        assert s.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760"
    finally:
        # the session fixture is session-scoped: leaving the threshold
        # lowered would flip later tests' join strategies
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    # custom app-level keys DO land on a reused session (getOrCreate
    # applies them to the runtime conf) — no spurious warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_spark(extra_conf={"spark.fs2graft.test.tag": "r6"})
    assert not [x for x in w if "did NOT take effect" in str(x.message)]


def test_apply_changes_marker_snapshot_honored_in_default_mode(spark):
    """A keep_tombstones=True snapshot fed back through the DEFAULT mode
    must still honor its markers: the dead key stays dead (not emitted as
    a live NULL row), and a delta row with a NULL order position wins
    against an absent snapshot entry but loses to any present one."""
    from fs2_kafka_streams_spark.operators.incremental import apply_changes

    schema = "k long, v string, ord long, deleted boolean"
    snap = apply_changes(
        None,
        spark.createDataFrame(
            [(1, "live", 100, False), (2, None, 100, True)], schema
        ),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted", keep_tombstones=True,
    )
    out = apply_changes(
        snap,
        spark.createDataFrame([(2, "ghost", 50, False)], schema),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted",
    )
    assert {(r.k, r.v) for r in out.collect()} == {(1, "live")}

    # NULL order position: insert-if-absent, never a silent drop
    out2 = apply_changes(
        snap,
        spark.createDataFrame(
            [(1, "nullord", None, False), (3, "fresh", None, False)], schema
        ),
        key_cols=["k"], order_col="ord", value_cols=["v"],
        tombstone_col="deleted",
    )
    got = {r.k: r.v for r in out2.collect()}
    assert got == {1: "live", 3: "fresh"}  # 1 keeps its positioned value


def test_read_batch_guard_covers_extra_and_case(spark):
    """The batch-read guard must validate the MERGED option map: an
    extra={'startingOffsets': 'latest'} override or a case-variant value
    is the same config error, and an extra override back to a concrete
    range makes the cfg acceptable."""
    from fs2_kafka_streams_spark.sources.kafka import (
        KafkaSourceConfig,
        read_batch,
    )

    with pytest.raises(ValueError, match="streaming posture"):
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"],
            extra={"startingOffsets": "latest"},
        ))
    with pytest.raises(ValueError, match="streaming posture"):
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"], starting_offsets="Latest",
        ))
    with pytest.raises(ValueError, match="maxOffsetsPerTrigger"):
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"],
            extra={"maxOffsetsPerTrigger": "100"},
        ))
    # override back to a concrete range: passes the guard, fails later
    # only because no Kafka connector jar exists in this container
    try:
        read_batch(spark, KafkaSourceConfig(
            "localhost:9092", topics=["t"], starting_offsets="latest",
            extra={"startingOffsets": '{"t":{"0":5}}'},
        ))
    except ValueError as e:
        raise AssertionError(f"guard spuriously rejected: {e}")
    except Exception:
        pass  # connector-not-found from load(): expected here


def test_encode_for_kafka_nested_key_path(spark):
    """A nested struct field as the key column must keep working (the
    binary-passthrough type lookup resolves through select, not the
    top-level schema map)."""
    from fs2_kafka_streams_spark.sources.kafka import encode_for_kafka

    df = spark.createDataFrame(
        [((7, "u9"), 1)], "payload struct<id:long,user:string>, x long"
    )
    out = encode_for_kafka(df, value_cols=["x"], key_col="payload.user")
    assert bytes(out.collect()[0].key) == b"u9"
