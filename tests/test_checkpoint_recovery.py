"""Checkpoint recovery — the reference's crash-recovery contract (A9/A17):
state is persisted beside the consumed offsets ("offsets" column family,
``streams/Table.scala:97-98,136-140``; seek-on-assign
``client/RecordStream.scala:194-219``), so a restart resumes exactly where
it left off with no lost or double-applied updates.

Spark shape: run a stateful streaming query over half the input with a
durable checkpoint, stop it, add the rest of the input, restart with the
SAME checkpoint. The second run must process only the new files (offset
log) on top of the recovered state (state store), and the final table must
equal the batch answer over ALL input — exactly-once state semantics."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCHEMA = "user_id long, seq long, value double"
OUT_SCHEMA = "user_id long, seq long, value double"
STATE_SCHEMA = "seq long, value double"


def _latest(key, pdf_iter, state: GroupState):
    best = tuple(state.get) if state.exists else None
    for pdf in pdf_iter:
        for _, row in pdf.sort_values("seq").iterrows():
            cand = (int(row["seq"]), float(row["value"]))
            if best is None or cand[0] > best[0]:
                best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame(
            {"user_id": [key[0]], "seq": [best[0]], "value": [best[1]]}
        )


@pytest.mark.parametrize("n_users", [7])
def test_state_survives_restart(spark, tmp_path, n_users):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path
               / "ckpt")
    os.makedirs(src)

    def write_file(name: str, rows):
        df = spark.createDataFrame(rows, SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / ("stage_" + name)))
        part = [
            f for f in os.listdir(tmp_path / ("stage_" + name))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(tmp_path / ("stage_" + name) / part, os.path.join(src, name))

    def run_round(sink: dict):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        updates = stream.groupBy("user_id").applyInPandasWithState(
            _latest,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

        def upsert(batch_df, epoch_id):
            for r in batch_df.collect():
                sink[r["user_id"]] = (r["seq"], r["value"])

        q = (
            updates.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: first half of the changelog
    rows1 = [(u, s, float(u * 100 + s)) for u in range(n_users) for s in (1, 2)]
    write_file("f0.parquet", rows1)
    table: dict = {}
    run_round(table)
    assert table == {u: (2, float(u * 100 + 2)) for u in range(n_users)}

    # phase 2: later updates arrive; restart from the SAME checkpoint.
    # seq=3 supersedes; a user with no new rows must keep recovered state.
    rows2 = [(u, 3, float(u * 100 + 3)) for u in range(n_users - 2)]
    write_file("f1.parquet", rows2)
    table2: dict = {}
    run_round(table2)

    # only the new file was processed (recovered offset log): untouched
    # users emit nothing in round 2...
    assert set(table2) == set(range(n_users - 2))
    # ...but merged state equals the batch answer over ALL input
    merged = {**table, **table2}
    assert merged == {
        **{u: (3, float(u * 100 + 3)) for u in range(n_users - 2)},
        **{u: (2, float(u * 100 + 2)) for u in range(n_users - 2, n_users)},
    }
