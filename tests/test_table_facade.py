"""Reference API parity: MaterializedTable (get/get_all/scan/tombstones),
stream-table join, decode registry + DLQ, Kafka option plumbing,
file round-trips, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def changelog(spark):
    # a keyed changelog: (user_id) -> (name), offset = changelog order
    rows = [
        (0, "bob", "v1", 1),
        (0, "bob", "v2", 3),
        (1, "alice", "v1", 2),
        (2, "joe", "v1", 4),
        (2, None, None, 5),  # tombstone for joe
    ]
    return spark.createDataFrame(
        rows, "user_id long, name string, payload string, offset long"
    )


def test_table_get_scan_multiget(spark, changelog):
    from fs2_kafka_streams_spark.operators.table import MaterializedTable

    t = MaterializedTable(
        changelog.filter(F.col("name").isNotNull()),
        key_cols=["user_id"],
        order_cols=["offset"],
        value_cols=["name", "payload", "offset"],
    )
    scan = {r["user_id"]: r["payload"] for r in t.scan().collect()}
    assert scan == {0: "v2", 1: "v1", 2: "v1"}  # last write wins

    assert t.get(0)["payload"] == "v2"
    assert t.get(99) is None  # missing -> None (Option[V])

    got = {r["user_id"]: r["payload"] for r in t.get_all([0, 1, 99]).collect()}
    assert got == {0: "v2", 1: "v1", 99: None}
    assert t.get_all([0, 1, 99]).count() == 3  # requested keys preserved

    assert t.last_committed_offset() == 4


def test_table_tombstones(spark, changelog):
    from fs2_kafka_streams_spark.operators.table import MaterializedTable

    t = MaterializedTable(
        changelog,
        key_cols=["user_id"],
        order_cols=["offset"],
        value_cols=["name", "payload", "offset"],
        tombstone_col="name",
    )
    keys = {r["user_id"] for r in t.scan().collect()}
    assert keys == {0, 1}  # joe deleted by tombstone


def test_stream_table_join(spark, changelog):
    from fs2_kafka_streams_spark.operators.table import (
        MaterializedTable,
        join_with,
    )

    t = MaterializedTable(
        changelog.filter(F.col("name").isNotNull()),
        key_cols=["user_id"],
        order_cols=["offset"],
        value_cols=["name"],
    )
    clicks = spark.createDataFrame(
        [(0, 100), (1, 101), (7, 102)], "user_id long, click_id long"
    )
    out = {r["click_id"]: r["name"] for r in join_with(clicks, t).collect()}
    assert out == {100: "bob", 101: "alice", 102: None}  # miss -> NULL


def test_decode_registry_and_dlq(spark):
    from fs2_kafka_streams_spark.sources.decode import (
        DecodeRegistry,
        JsonFormat,
        clean_view,
        dead_letters,
    )

    records = spark.createDataFrame(
        [
            ("t1", 0, 0, b'{"a": 1, "b": "x"}'),
            ("t1", 0, 1, b"not json at all"),
            ("t1", 1, 0, b'{"a": 2, "b": "y"}'),
        ],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register("t1", JsonFormat("a int, b string"))
    decoded = reg.decode(records)

    clean = clean_view(decoded)
    assert {r["a"] for r in clean.collect()} == {1, 2}
    assert set(clean.columns) >= {"topic", "partition", "offset", "a", "b"}

    dlq = dead_letters(decoded).collect()
    assert len(dlq) == 1 and "malformed json" in dlq[0]["decode_error"]


def test_binary_format_custom_decoder(spark):
    """BinaryFormat: arbitrary user bytes->T decoder with in-band errors —
    the full KafkaDecoder typeclass parity. A raising decoder dead-letters
    the row; good rows decode with metadata retained."""
    from fs2_kafka_streams_spark.sources.decode import (
        BinaryFormat,
        DecodeRegistry,
        clean_view,
        dead_letters,
    )

    def pipe_decoder(b: bytes) -> dict:
        uid, name = b.decode("utf-8").split("|")
        return {"uid": int(uid), "name": name}

    records = spark.createDataFrame(
        [
            ("t2", 0, 0, b"7|bob"),
            ("t2", 0, 1, b"not-pipe-separated"),
            ("t2", 1, 0, b"9|alice"),
        ],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register(
        "t2", BinaryFormat("uid long, name string", pipe_decoder)
    )
    decoded = reg.decode(records)
    clean = {r["uid"]: r["name"] for r in clean_view(decoded).collect()}
    assert clean == {7: "bob", 9: "alice"}
    dlq = dead_letters(decoded).collect()
    assert len(dlq) == 1 and "ValueError" in dlq[0]["decode_error"]


def test_kafka_option_plumbing():
    from fs2_kafka_streams_spark.sources.kafka import KafkaSourceConfig

    cfg = KafkaSourceConfig(
        bootstrap_servers="broker:9092",
        topics=["a", "b"],
        max_offsets_per_trigger=1000,
    )
    opts = cfg.options()
    assert opts["subscribe"] == "a,b"
    assert opts["maxOffsetsPerTrigger"] == "1000"

    pat = KafkaSourceConfig(bootstrap_servers="x", pattern="topic-.*").options()
    assert pat["subscribePattern"] == "topic-.*"

    with pytest.raises(ValueError):
        KafkaSourceConfig(bootstrap_servers="x").options()
    with pytest.raises(ValueError):
        KafkaSourceConfig(
            bootstrap_servers="x", topics=["a"], pattern="b.*"
        ).options()


def test_kafka_encode(spark):
    from fs2_kafka_streams_spark.sources.kafka import encode_for_kafka

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    out = encode_for_kafka(df, ["id", "s"], key_col="id", topic="out").collect()
    assert bytes(out[0]["value"]) == b'{"id":1,"s":"x"}'
    assert bytes(out[0]["key"]) == b"1"
    assert out[0]["topic"] == "out"


def test_file_roundtrip(spark, tmp_path):
    from fs2_kafka_streams_spark.sources import files
    from fs2_kafka_streams_spark.catalog import Catalog

    region = Catalog(spark, SF_SMOKE).region
    for fmt, writer, reader in [
        ("parquet", files.write_parquet, lambda s, p: files.read_parquet(s, p)),
        ("csv", files.write_csv,
         lambda s, p: files.read_csv(s, p, "r_regionkey int, r_name string")),
        ("json", files.write_json,
         lambda s, p: files.read_json(s, p, "r_regionkey int, r_name string")),
    ]:
        path = str(tmp_path / fmt)
        writer(region, path)
        back = reader(spark, path)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in region.collect()
        ), fmt


def test_multimodal_plumbing(spark):
    from fs2_kafka_streams_spark.catalog import Catalog
    from fs2_kafka_streams_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        synthesize_media,
    )

    docs = Catalog(spark, SF_SMOKE).documents.limit(50)
    media = synthesize_media(docs, "doc_id", "text")
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0 <= v <= 1 for r in rows for v in r["feature"])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)

    frames = frame_sample(media, every_ms=10000)
    fr = frames.groupBy("media_id").count().collect()
    assert fr and all(r["count"] >= 1 for r in fr)

    from fs2_kafka_streams_spark.operators.multimodal import resize_images

    resized = resize_images(media, out_w=8, out_h=4).collect()
    assert resized, "no image rows resized"
    assert all(len(bytes(r["payload"])) == 32 for r in resized)
    assert all(r["out_w"] == 8 and r["out_h"] == 4 for r in resized)
    # non-images pruned before the Python hop
    assert all(r["kind"] == "image" for r in resized)


def test_csv_corrupt_rows_dead_letter(spark):
    """PERMISSIVE from_csv yields a non-null struct of NULLs on malformed
    input — corrupt rows must still land in the DLQ (via the
    columnNameOfCorruptRecord marker), never in clean_view as all-null
    'successes' (ADVICE round 1)."""
    from fs2_kafka_streams_spark.sources.decode import (
        CsvFormat,
        DecodeRegistry,
        clean_view,
        dead_letters,
    )

    records = spark.createDataFrame(
        [
            ("t1", 0, 0, b"1,bob"),
            ("t1", 0, 1, b"not,a,valid,row,too,many"),
            ("t1", 1, 2, b"2,alice"),
        ],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register("t1", CsvFormat("uid int, name string"))
    decoded = reg.decode(records)
    clean = clean_view(decoded).collect()
    assert {r["uid"] for r in clean} == {1, 2}
    dlq = dead_letters(decoded).collect()
    assert len(dlq) == 1 and "malformed csv" in dlq[0]["decode_error"]


def test_unregistered_topic_dead_letters(spark):
    """Rows from a topic with no registered decoder are dead letters, not
    silently-null 'successes' (ADVICE round 1)."""
    from fs2_kafka_streams_spark.sources.decode import (
        DecodeRegistry,
        JsonFormat,
        clean_view,
        dead_letters,
    )

    records = spark.createDataFrame(
        [("known", 0, 0, b'{"a": 1}'), ("mystery", 0, 0, b'{"a": 2}')],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register("known", JsonFormat("a int"))
    decoded = reg.decode(records)
    assert clean_view(decoded).count() == 1
    dlq = dead_letters(decoded).collect()
    assert len(dlq) == 1
    assert "no decoder registered" in dlq[0]["decode_error"]
    assert dlq[0]["topic"] == "mystery"


def test_avro_format_gate(spark):
    """AvroFormat decodes when spark-avro is loaded; otherwise the gate
    raises a clear error (this container ships no spark-avro package)."""
    from fs2_kafka_streams_spark.sources.decode import (
        AvroFormat,
        has_avro_datasource,
    )
    from pyspark.sql import functions as F

    schema = (
        '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'
    )
    fmt = AvroFormat(schema)
    df = spark.createDataFrame([(b"\x02",)], "value binary")
    if has_avro_datasource(spark):
        decoded, err = fmt.decode(F.col("value"))
        assert df.select(decoded.alias("d")).collect()[0]["d"]["a"] == 1
    else:
        with pytest.raises(Exception) as ei:
            df.select(fmt.decode(F.col("value"))[0].alias("d")).collect()
        assert "avro" in str(ei.value).lower()


def test_kafka_headers_and_producer_columns(spark):
    from fs2_kafka_streams_spark.sources.kafka import (
        KAFKA_SCHEMA_WITH_HEADERS,
        KafkaSourceConfig,
        encode_for_kafka,
    )

    opts = KafkaSourceConfig(
        bootstrap_servers="b:9092", topics=["t"], include_headers=True
    ).options()
    assert opts["includeHeaders"] == "true"
    assert "headers" in KAFKA_SCHEMA_WITH_HEADERS

    df = spark.createDataFrame(
        [(1, "x", 3, "2024-01-02 03:04:05")],
        "id long, s string, part int, ts string",
    ).selectExpr(
        "id", "s", "part", "cast(ts as timestamp) ts",
        "array(named_struct('key', 'h1', 'value', cast('v1' as binary))) hdrs",
    )
    out = encode_for_kafka(
        df,
        ["id", "s"],
        key_col="id",
        topic="out",
        partition_col="part",
        timestamp_col="ts",
        headers_col="hdrs",
    ).collect()[0]
    assert out["partition"] == 3
    assert out["timestamp"] is not None
    assert out["headers"][0]["key"] == "h1"
    assert bytes(out["headers"][0]["value"]) == b"v1"


def test_end_to_end_program_shape(spark):
    """The reference's full integration program (``ReadOnlyTableSpec.scala:
    41-79``: produce Customer(userId, name) from skewed userIds, materialize
    a table keyed by userId, join a click stream against it, sink) — run
    end-to-end through this engine's stages with assertions at the end (the
    reference runs it as smoke only).

    source bytes -> DecodeRegistry -> clean_view -> MaterializedTable ->
    stream-table join -> encode_for_kafka, with the sink bytes decoded back
    and checked against the expected join result.
    """
    import json

    from fs2_kafka_streams_spark.operators.table import (
        MaterializedTable,
        join_with,
    )
    from fs2_kafka_streams_spark.sources.decode import (
        DecodeRegistry,
        JsonFormat,
        clean_view,
        dead_letters,
    )
    from fs2_kafka_streams_spark.sources.kafka import encode_for_kafka

    # skewed customer changelog (reference: 4 skewed userIds, :41-54),
    # with one malformed record that must dead-letter, not poison the run
    writes = [(uid, f"name_{uid}_{i}") for i, uid in enumerate(
        [0, 0, 0, 0, 0, 1, 1, 2, 0, 0, 3, 0]
    )]
    records = spark.createDataFrame(
        [
            ("customers", uid % 2, off, json.dumps(
                {"userId": uid, "name": name}).encode())
            for off, (uid, name) in enumerate(writes)
        ] + [("customers", 0, 999, b"\x00broken")],
        "topic string, partition int, offset long, value binary",
    )
    reg = DecodeRegistry().register(
        "customers", JsonFormat("userId long, name string")
    )
    decoded = reg.decode(records)
    assert dead_letters(decoded).count() == 1

    table = MaterializedTable(
        clean_view(decoded),
        key_cols=["userId"],
        order_cols=["offset"],
        value_cols=["name", "offset"],
    )
    # expected head: last write per userId in offset order
    want_head = {}
    for off, (uid, name) in enumerate(writes):
        want_head[uid] = name
    assert {
        r["userId"]: r["name"] for r in table.scan().collect()
    } == want_head

    clicks = spark.createDataFrame(
        [(0, 100), (2, 101), (77, 102)], "userId long, click_id long"
    )
    joined = join_with(clicks, table)
    sink = encode_for_kafka(
        joined, value_cols=["click_id", "name"],
        key_col="userId", topic="clicks_enriched",
    ).collect()
    got = {
        int(r["key"].decode()): json.loads(bytes(r["value"]).decode())
        for r in sink
    }
    assert set(r["topic"] for r in sink) == {"clicks_enriched"}
    assert got[0] == {"click_id": 100, "name": want_head[0]}
    assert got[2] == {"click_id": 101, "name": want_head[2]}
    assert got[77] == {"click_id": 102}  # miss -> NULL name, omitted by to_json
