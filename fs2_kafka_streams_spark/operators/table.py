"""MaterializedTable — API parity with the reference's ReadOnlyTable/Table.

Reference (``streams/Table.scala:10-41``):
  get(k): F[Option[V]]          → point lookup
  getAll(ks): F[Map[K,Option[V]]] → multi-get, missing keys → None
  scan: Stream[F,(K,V)]          → full scan
  delete(k) / tombstones         → key removal
  lastCommittedOffset            → recovery bookkeeping

Spark re-expression: the table IS a DataFrame (the latest-by-key
materialization of a changelog, ``streams/Tables.scala:46-70``). Point and
multi-get are broadcast joins from the key set (the distributed analogue of
RocksDB multiGet, ``PolyKVStore.scala:122-133``); scan is the DataFrame
itself. Tombstones: a NULL value column deletes the key (the reference
exposes ``delete`` but its shipped materializer never emits it — we support
both behaviors via ``respect_tombstones``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key


class MaterializedTable:
    """A keyed latest-value view of a changelog DataFrame."""

    def __init__(
        self,
        changelog: DataFrame,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        value_cols: Sequence[str] | None = None,
        tombstone_col: str | None = None,
        unique_order: bool = False,
    ):
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.value_cols = list(
            value_cols
            if value_cols is not None
            else [c for c in changelog.columns if c not in key_cols]
        )
        if "_found" in set(self.key_cols) | set(self.value_cols):
            # get()/get_all(marker=True) emit a boolean "_found" presence
            # marker; a payload column with that name would collide
            # (duplicate/ambiguous output column) — reject at the boundary,
            # matching the reserved-name convention of salted_join /
            # apply_changes / changelog_history
            raise ValueError(
                "MaterializedTable reserves column name '_found' (the "
                "get/get_all presence marker); rename the conflicting "
                "input column"
            )
        if tombstone_col is not None and tombstone_col not in self.value_cols:
            # the snapshot filter below reads the tombstone column from the
            # aggregated output; an explicit value_cols that omits it would
            # otherwise surface later as UNRESOLVED_COLUMN far from here
            raise ValueError(
                f"tombstone_col {tombstone_col!r} must be included in "
                f"value_cols (got {self.value_cols}) — the latest-write "
                "tombstone test reads it from the aggregated snapshot"
            )
        self._changelog = changelog
        self._tombstone_col = tombstone_col
        # unique_order: caller's promise that order_cols never ties per key
        # (e.g. Kafka offsets) — halves the max_by comparator state.
        self._unique_order = unique_order
        snap = latest_by_key(
            changelog, key_cols, order_cols, self.value_cols,
            unique_order=unique_order,
        )
        if tombstone_col is not None:
            # a tombstone (NULL value) as the latest write removes the key.
            # NOTE the convention: this is Kafka's null-VALUE tombstone
            # (the reference's Table.delete), the OPPOSITE of the boolean
            # True-means-delete flag that apply_changes/changelog_history/
            # the streaming deletes engines call tombstone_col — reject a
            # boolean column loudly rather than silently keeping deleted
            # keys (True is non-null) and dropping NULL-flagged live rows
            from pyspark.sql.types import BooleanType

            if isinstance(changelog.schema[tombstone_col].dataType, BooleanType):
                raise TypeError(
                    "MaterializedTable tombstone_col uses the null-VALUE "
                    "convention (NULL in this column deletes the key); a "
                    "boolean True-means-delete flag belongs to "
                    "apply_changes/changelog_history — pass the nullable "
                    "value column instead"
                )
            snap = snap.filter(F.col(tombstone_col).isNotNull())
        self._snapshot = snap

    # -- reads (A10–A12) ---------------------------------------------------

    def scan(self) -> DataFrame:
        """Full scan — the materialized view itself (A12)."""
        return self._snapshot

    def get(self, key: Any | tuple) -> dict | None:
        """Point lookup (A10). Returns the value row dict or None.

        Presence is decided by a join marker, NOT by all-NULL value
        columns — a key whose latest write genuinely carries NULL values
        is Some(null row), not None (the ``Map[K, Option[V]]`` contract).
        """
        out = self._get_all([key], marker=True).collect()[0]
        d = out.asDict()
        if not d["_found"]:
            return None
        return {c: d[c] for c in self.value_cols}

    def get_all(
        self, keys: Sequence[Any | tuple], marker: bool = False
    ) -> DataFrame:
        """Multi-get (A11): preserves requested keys, missing → NULL row —
        exactly the reference's ``Map[K, Option[V]]`` contract
        (``streams/Table.scala:61-62``).

        ``marker=True`` adds a boolean ``_found`` column so callers can
        distinguish a MISSING key from a present key whose latest write
        genuinely carries all-NULL values (Some(null row) vs None — the
        same distinction :meth:`get` makes; with the default output alone
        the two are indistinguishable).

        Scale path: the key prune is applied to the CHANGELOG, below the
        latest-by-key aggregation (latest-of-a-key-subset == subset-of-
        latest, since the aggregation is per-key). A single-column literal
        key set becomes an ``isin`` predicate that reaches the parquet scan
        (``PushedFilters: In(...)`` — row groups whose min/max exclude the
        keys are never read); composite keys use a broadcast semi-join,
        which prunes before the aggregation shuffle. Never broadcasts or
        fully aggregates the table itself.
        """
        return self._get_all(keys, marker=marker)

    def _get_all(
        self, keys: Sequence[Any | tuple], marker: bool = False
    ) -> DataFrame:
        spark = self._snapshot.sparkSession
        # dedupe (order-preserving): a Map result has one row per KEY, and
        # a duplicated request key would otherwise duplicate output rows
        rows = list(dict.fromkeys(
            k if isinstance(k, tuple) else (k,) for k in keys
        ))
        schema_fields = ", ".join(
            f"{c} {self._snapshot.schema[c].dataType.simpleString()}"
            for c in self.key_cols
        )
        keys_df = spark.createDataFrame(rows, schema_fields)
        # NULL-safe throughout: a NULL-keyed changelog row (an un-keyed
        # record folded into the table) is visible in scan(), so point
        # reads must be able to reach it too — plain isin/equi-joins drop
        # every NULL comparison and would make such a key permanently
        # unreachable while scan() still shows it.
        if len(self.key_cols) == 1:
            kc = F.col(self.key_cols[0])
            non_null = [r[0] for r in rows if r[0] is not None]
            pred = kc.isin(non_null) if non_null else F.lit(False)
            if len(non_null) < len(rows):  # a NULL key was requested
                pred = pred | kc.isNull()
            pruned_log = self._changelog.filter(pred)
        else:
            semi_cond = None
            for k in self.key_cols:
                c = self._changelog[k].eqNullSafe(keys_df[k])
                semi_cond = c if semi_cond is None else semi_cond & c
            pruned_log = self._changelog.join(
                F.broadcast(keys_df), on=semi_cond, how="left_semi"
            )
        matched = latest_by_key(
            pruned_log, self.key_cols, self.order_cols, self.value_cols,
            unique_order=self._unique_order,
        )
        if self._tombstone_col is not None:
            matched = matched.filter(F.col(self._tombstone_col).isNotNull())
        if marker:
            matched = matched.withColumn("_found", F.lit(True))
        kdf, m = keys_df.alias("_k"), matched.alias("_m")
        cond = None
        for k in self.key_cols:
            c = F.col(f"_k.{k}").eqNullSafe(F.col(f"_m.{k}"))
            cond = c if cond is None else cond & c
        out = kdf.join(F.broadcast(m), on=cond, how="left").select(
            *[F.col(f"_k.{k}").alias(k) for k in self.key_cols],
            *[F.col(f"_m.{c}").alias(c) for c in self.value_cols],
            *(
                [F.coalesce(F.col("_m._found"), F.lit(False)).alias("_found")]
                if marker
                else []
            ),
        )
        return out

    def last_committed_offset(self) -> Any:
        """Highest changelog position applied (A17,
        ``streams/Table.scala:67-68``) — here max of the first order col."""
        col = self.order_cols[0]
        return self._changelog.agg(F.max(col)).collect()[0][0]


def join_with(
    stream: DataFrame, table: MaterializedTable, how: str = "left"
) -> DataFrame:
    """Stream–table enrichment join (A14, ``ReadOnlyTableSpec.scala:77-79``):
    each stream row gains the table's current value for its key; misses stay
    as NULLs (Option[V] = None).

    Shared non-key column names are rejected at the boundary: the join
    would otherwise succeed with two identically-named output columns and
    fail with AMBIGUOUS_REFERENCE only at the first downstream reference,
    far from the cause. Rename or trim ``value_cols`` on the table side.
    """
    overlap = (
        set(stream.columns) & set(table.scan().columns)
    ) - set(table.key_cols)
    if overlap:
        raise ValueError(
            f"join_with: column(s) {sorted(overlap)} exist on both the "
            "stream and the table's value set — rename them or exclude "
            "them via the table's value_cols"
        )
    return stream.join(table.scan(), on=table.key_cols, how=how)
