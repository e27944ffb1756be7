"""Rebalance semantics on the broker-less wire source (A19/A23 residue,
VERDICT r4 item 2):

- pattern subscription resolves a regex to a topic SET (reference
  ``Subscription.Pattern``, ``client/Subscription.scala:5-6``; compile +
  subscribe ``client/ConsumerAlgebra.scala:90-94``);
- a topic appearing between runs is assigned from offset 0 (the
  metadata-refresh half of ``applyRebalanceEvents``,
  ``client/RecordStream.scala:71-108``);
- partition growth mid-log reassigns NEW records to the grown layout while
  produced records stay put (Kafka's actual partition-add semantics), and
  the latest-by-key fold stays correct across the reassignment because it
  orders by data-derived (ts, event_id), not arrival.
"""

from __future__ import annotations

import json
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.catalog import Catalog
from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key
from fs2_kafka_streams_spark.sources.python_source import (
    decode_wire,
    read_wire_stream,
)

SF = "/root/testdata/sf0.001"


def _split_events_broker(tmp_path, n_topics=2):
    """Split the events table into n 'topics' by user hash — every event in
    exactly one topic, so the union over the subscription ≡ the table."""
    t = pq.read_table(f"{SF}/events.parquet")
    df = t.to_pandas()
    broker = tmp_path / "broker"
    broker.mkdir(exist_ok=True)
    for i in range(n_topics):
        part = df[df["user_id"] % n_topics == i]
        part.to_parquet(broker / f"events-{i}.parquet", index=False)
    return broker


def _drain(spark, stream, ckpt, sink_rows, timeout_s=90):
    """Run the stream until idle; append each batch's decoded rows."""

    def sink(bdf, bid):
        pdf = decode_wire(bdf).toPandas()
        pdf["bid"] = bid
        sink_rows.append(pdf)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
    q.awaitTermination()


def test_pattern_subscription_union_equals_table(spark, tmp_path):
    """Subscribe ``events-.*`` over a 2-topic broker dir: the decoded union
    must equal the events table row-for-row and the fold must equal the
    direct batch latest-by-key (same invariant as q67, through a topic SET)."""
    broker = _split_events_broker(tmp_path)
    rows: list = []
    stream = read_wire_stream(
        spark, SF, partitions=3,
        broker_dir=str(broker), topic_pattern="events-.*",
    )
    _drain(spark, stream, tmp_path / "ck", rows)
    got = pd.concat(rows, ignore_index=True)

    assert set(got["topic"]) == {"events-0", "events-1"}
    assert len(got) == 1000
    assert got["event_id"].is_unique

    # per-(topic, partition) offsets dense from 0
    for (_t, _p), g in got.groupby(["topic", "partition"]):
        offs = sorted(g["offset"])
        assert offs == list(range(len(offs)))

    # fold over the union == direct batch fold
    sdf = spark.createDataFrame(
        got[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    )
    via_wire = latest_by_key(
        sdf, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    direct = latest_by_key(
        Catalog(spark, SF).events,
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    assert sorted(map(tuple, via_wire.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_explicit_topic_list_and_bad_subscription(spark, tmp_path):
    broker = _split_events_broker(tmp_path)
    rows: list = []
    stream = read_wire_stream(
        spark, SF, partitions=2,
        broker_dir=str(broker), topics=["events-1"],
    )
    _drain(spark, stream, tmp_path / "ck", rows)
    got = pd.concat(rows, ignore_index=True)
    assert set(got["topic"]) == {"events-1"}
    assert (got["user_id"] % 2 == 1).all()

    from fs2_kafka_streams_spark.sources.python_source import _resolve_topics

    with pytest.raises(ValueError):
        _resolve_topics({"broker_dir": str(broker), "topics": "nope"})
    # zero pattern matches is LEGAL (Kafka: consumer idles until a
    # matching topic appears) — resolves to the empty topic set
    assert _resolve_topics({"broker_dir": str(broker), "topic_pattern": "zzz.*"}) == {}
    # Kafka full-matches the pattern: a prefix-only regex matches nothing
    assert _resolve_topics({"broker_dir": str(broker), "topic_pattern": "event"}) == {}


def test_pattern_topic_appearing_between_runs(spark, tmp_path):
    """Rebalance (assign) on metadata refresh: a topic that appears AFTER
    the first run's checkpoint commit is picked up from offset 0 on the
    next run; nothing already committed is re-served."""
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    broker = tmp_path / "broker"
    broker.mkdir()
    t[t["user_id"] % 2 == 0].to_parquet(broker / "events-0.parquet", index=False)

    rows: list = []
    ckpt = tmp_path / "ck"

    def stream():
        return read_wire_stream(
            spark, SF, partitions=3,
            broker_dir=str(broker), topic_pattern="events-.*",
        )

    _drain(spark, stream(), ckpt, rows)
    n_first = sum(len(p) for p in rows)
    assert n_first == int((t["user_id"] % 2 == 0).sum())

    # the topic appears; the pattern re-resolves on the next run
    t[t["user_id"] % 2 == 1].to_parquet(broker / "events-1.parquet", index=False)
    _drain(spark, stream(), ckpt, rows)

    got = pd.concat(rows, ignore_index=True)
    assert len(got) == 1000
    assert got["event_id"].is_unique, "a committed offset was re-served"
    late = got[got["topic"] == "events-1"]
    assert len(late) == 1000 - n_first
    assert (late["bid"] > got[got["topic"] == "events-0"]["bid"].max() - 1).all()


def test_partition_growth_exactly_once_and_fold(spark, tmp_path):
    """Kafka partition-add semantics: records published before ``grow_at``
    stay on ``user_id % 3``; later ones land on ``user_id % 5``. Across a
    mid-replay restart the source must deliver each record exactly once
    with dense per-partition offsets, the assignment must match an
    independent pandas reconstruction, and the latest-by-key fold must
    still equal the batch result (order-insensitivity across reassignment
    — the reference's fold correctness under ``applyRebalanceEvents``)."""
    n_parts, grow_to, grow_at = 3, 5, 500
    cursor = tmp_path / "cursor.json"
    rows: list = []
    ckpt = tmp_path / "ck"

    def stream():
        return read_wire_stream(
            spark, SF, partitions=n_parts, batch_rows=120,
            cursor_file=str(cursor), grow_to=grow_to, grow_at=grow_at,
        )

    # several runs with a stop in between — the cursor paces publication,
    # so each run advances some batches and the restart crosses offsets
    deadline = time.time() + 300
    while time.time() < deadline:
        _drain(spark, stream(), ckpt, rows, timeout_s=60)
        if sum(len(p) for p in rows) >= 1000:
            break
    got = pd.concat(rows, ignore_index=True)

    assert len(got) == 1000
    assert got["event_id"].is_unique, "re-served or lost records"
    assert set(got["partition"]) == set(range(grow_to)), "growth partitions used"

    for p, g in got.groupby("partition"):
        offs = sorted(g["offset"])
        assert offs == list(range(len(offs))), f"offsets not dense on p{p}"

    # independent reconstruction of the publish-time assignment
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    t["ts_us"] = t["ts"].astype("int64") // 1000
    t = t.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    t["expected_p"] = t["user_id"] % n_parts
    t.loc[grow_at:, "expected_p"] = t.loc[grow_at:, "user_id"] % grow_to
    exp = dict(zip(t["event_id"], t["expected_p"]))
    assert all(exp[e] == p for e, p in zip(got["event_id"], got["partition"]))

    # fold across the reassignment == batch latest-by-key
    sdf = spark.createDataFrame(
        got[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    )
    via_wire = latest_by_key(
        sdf, key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    direct = latest_by_key(
        Catalog(spark, SF).events,
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_cols=["event_id", "event_type", "value"],
    )
    assert sorted(map(tuple, via_wire.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # the offset map in the checkpoint is the nested Kafka shape
    import glob
    import os

    # numeric sort: lexical sorted(...)[-1] picks '9' over '10' once ten
    # batch files exist, silently validating a mid-stream offset map
    off_files = sorted(
        (f for f in glob.glob(str(ckpt / "offsets" / "*"))
         if os.path.basename(f).isdigit()),
        key=lambda f: int(os.path.basename(f)),
    )
    last = open(off_files[-1]).read().splitlines()[-1]
    offmap = json.loads(json.loads(last)) if last.startswith('"') else json.loads(last)
    assert "events" in offmap and set(offmap["events"]) == {
        str(p) for p in range(grow_to)
    }


def test_batch_reader_multi_topic_and_growth(spark, tmp_path):
    """The BATCH wire view (a backfill over the same subscription a stream
    uses) supports pattern topic-sets and partition growth identically:
    union over topics ≡ the events table, and the growth assignment matches
    the stream reader's."""
    from fs2_kafka_streams_spark.sources.python_source import read_wire

    broker = _split_events_broker(tmp_path)
    wire = read_wire(
        spark, SF, partitions=3,
        broker_dir=str(broker), topic_pattern="events-.*",
    )
    got = decode_wire(wire).toPandas()
    assert set(got["topic"]) == {"events-0", "events-1"}
    assert len(got) == 1000 and got["event_id"].is_unique

    grown = read_wire(spark, SF, partitions=3, grow_to=5, grow_at=500)
    gp = decode_wire(grown).toPandas()
    assert len(gp) == 1000
    assert set(gp["partition"]) == set(range(5))

    # growth assignment identical to an independent reconstruction
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    t["ts_us"] = t["ts"].astype("int64") // 1000
    t = t.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    t["expected_p"] = t["user_id"] % 3
    t.loc[500:, "expected_p"] = t.loc[500:, "user_id"] % 5
    exp = dict(zip(t["event_id"], t["expected_p"]))
    assert all(exp[e] == p for e, p in zip(gp["event_id"], gp["partition"]))


def test_seek_applied_at_mid_query_assignment(spark, tmp_path):
    """A topic named in ``startingOffsets`` that only APPEARS (pattern
    re-resolution) after the query has already committed offsets must
    begin at its SEEK point on first assignment — never at 0, which would
    re-serve the records the seek explicitly skips. Mirrors the
    reference's seek-on-assign (the recovery fn runs in the rebalance
    listener, ``client/RecordStream.scala:194-219``, so a partition
    assigned mid-stream is seeked too). Kafka sentinels resolve per
    partition: -1 (latest) serves nothing until new data, -2 = earliest."""
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    broker = tmp_path / "broker"
    broker.mkdir()
    t[t["user_id"] % 2 == 0].to_parquet(broker / "events-0.parquet", index=False)

    seek = {"events-1": {"0": 7, "1": -1, "2": -2}}
    rows: list = []
    ckpt = tmp_path / "ck"

    def stream():
        return read_wire_stream(
            spark, SF, partitions=3,
            broker_dir=str(broker), topic_pattern="events-.*",
            starting_offsets=seek,
        )

    _drain(spark, stream(), ckpt, rows)
    n_first = sum(len(p) for p in rows)
    assert n_first == int((t["user_id"] % 2 == 0).sum())

    # the seeked topic appears only now — its committed start is absent,
    # so partitions() must fall back to the RESOLVED seek, not 0
    t[t["user_id"] % 2 == 1].to_parquet(broker / "events-1.parquet", index=False)
    _drain(spark, stream(), ckpt, rows)
    got = pd.concat(rows, ignore_index=True)
    assert got["event_id"].is_unique

    # expected per-partition logs of events-1: publish order is
    # (ts_us, event_id), partition = user_id % 3, offsets dense from 0
    odd = t[t["user_id"] % 2 == 1].copy()
    odd["ts_us"] = odd["ts"].astype("int64") // 1000
    odd = odd.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    odd["p"] = odd["user_id"] % 3
    odd["off"] = odd.groupby("p").cumcount()

    late = got[got["topic"] == "events-1"]
    by_p = {p: g for p, g in late.groupby("partition")}
    # p0: explicit seek to 7 — offsets [7, end), nothing below
    exp0 = odd[(odd["p"] == 0) & (odd["off"] >= 7)]
    assert sorted(by_p[0]["offset"]) == sorted(exp0["off"])
    assert set(by_p[0]["event_id"]) == set(exp0["event_id"])
    # p1: latest — no records until something new is published
    assert 1 not in by_p
    # p2: earliest sentinel — the full partition log
    exp2 = odd[odd["p"] == 2]
    assert sorted(by_p[2]["offset"]) == list(range(len(exp2)))
    assert set(by_p[2]["event_id"]) == set(exp2["event_id"])


def test_global_latest_serves_backlog_of_mid_query_topic(spark, tmp_path):
    """``startingOffsets="latest"`` applies at query START only: a topic
    that appears mid-query (pattern re-resolution) is a newly discovered
    assignment and must serve its FULL backlog from 0 — the Kafka source
    consumes newly discovered partitions from earliest regardless of the
    global startingOffsets string. Resolving "latest" at assignment time
    would silently drop every record the topic already held (the
    regression this test pins)."""
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    broker = tmp_path / "broker"
    broker.mkdir()
    evens = t[t["user_id"] % 2 == 0]
    evens.to_parquet(broker / "events-0.parquet", index=False)

    rows: list = []
    ckpt = tmp_path / "ck"

    def stream():
        return read_wire_stream(
            spark, SF, partitions=3,
            broker_dir=str(broker), topic_pattern="events-.*",
            starting_offsets="latest",
        )

    # at start, "latest" means: nothing already in events-0 is served
    _drain(spark, stream(), ckpt, rows)
    assert sum(len(p) for p in rows) == 0

    # events-1 appears mid-query -> its whole existing log must arrive
    odds = t[t["user_id"] % 2 == 1]
    odds.to_parquet(broker / "events-1.parquet", index=False)
    _drain(spark, stream(), ckpt, rows)
    got = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame()
    assert set(got["event_id"]) == set(odds["event_id"])
    assert (got["topic"] == "events-1").all()


def test_topic_revocation_fail_on_data_loss_and_clean_end(spark, tmp_path):
    """Rebalance REVOCATION (reference Rebalance.Revoke,
    ``client/commands.scala:29-35``; EOF-completion of the revoked
    partition's stream ``client/RecordStream.scala:71-108``): a topic
    deleted from the broker mid-query.

    Kafka's source shape, mirrored: with the default
    ``failOnDataLoss=true`` the next run FAILS loudly (deleted partitions
    = possible data loss); with ``failOnDataLoss=false`` the revoked
    partitions' streams end cleanly at their last served offsets — the
    surviving topic continues exactly-once, already-committed results are
    unaffected, and the latest-by-key fold over everything consumed stays
    oracle-correct."""
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    broker = tmp_path / "broker"
    broker.mkdir()
    keep = t[t["user_id"] % 2 == 0]
    gone = t[t["user_id"] % 2 == 1]
    keep.iloc[: len(keep) // 2].to_parquet(
        broker / "events-keep.parquet", index=False
    )
    gone.to_parquet(broker / "events-gone.parquet", index=False)

    rows: list = []
    ckpt = tmp_path / "ck"

    def stream(**extra):
        return read_wire_stream(
            spark, SF, partitions=3,
            broker_dir=str(broker), topic_pattern="events-.*", **extra,
        )

    _drain(spark, stream(), ckpt, rows)
    n_first = sum(len(p) for p in rows)
    assert n_first == len(keep) // 2 + len(gone)

    # the broker deletes one topic; more records appear on the survivor
    (broker / "events-gone.parquet").unlink()
    keep.to_parquet(broker / "events-keep.parquet", index=False)

    # default: the revocation is DATA LOSS -> the query fails loudly
    # (awaitTermination surfaces the planner's RuntimeError)
    with pytest.raises(Exception, match="gone"):
        _drain(spark, stream(), ckpt, rows)

    # failOnDataLoss=false: revoked stream ends cleanly; survivor continues
    rows2: list = []
    _drain(spark, stream(fail_on_data_loss=False), ckpt, rows2)
    got = pd.concat(rows + rows2, ignore_index=True)
    assert got["event_id"].is_unique, "revocation re-served or dropped"
    assert len(got) == 1000  # every event consumed exactly once overall
    assert set(got.loc[got["topic"] == "events-gone", "event_id"]) == set(
        gone["event_id"]
    )

    # fold over the union of everything consumed == the batch oracle
    folded = latest_by_key(
        spark.createDataFrame(got[["event_id", "user_id", "offset"]]),
        ["user_id"], ["offset", "event_id"],
    )
    assert folded.count() == got["user_id"].nunique()
