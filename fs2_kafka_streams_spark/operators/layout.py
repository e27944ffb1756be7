"""Z-order file layout: multi-dimensional clustering for data skipping.

At 100 TB the fastest scan is the one that never happens: parquet
readers skip whole files / row groups whose column min-max statistics
don't overlap the query predicate. A linear sort clusters ONE column —
range predicates on any other column overlap every file. Z-ordering
interleaves the bits of several columns' rank codes so that files are
tight in EVERY ordered dimension at once, making min-max pruning
effective for multi-dimensional slices (the layout trick behind Delta
``OPTIMIZE ZORDER BY`` and ClickHouse/Databend space-filling-curve
clustering — public techniques; implemented here from the definition).

The reference engine has no file layout story at all (Kafka topics are
its only storage, ``client/RecordStream.scala:202-260``); this operator
exists for the engine's own parquet tables.

Scale posture — every step is a standard distributed primitive:

1. **Rank coding**: per column, bin values into ``2^bits_per_col``
   quantile bins. Bin edges come from ``approxQuantile`` (driver holds
   ``2^bits`` scalars per column — bounded, the standard recipe); the
   bin lookup is a higher-order function over a literal edge array —
   JVM-side, whole-stage codegen, zero Python.
2. **Bit interleave**: pure integer shift/mask expression tree.
3. **Write**: ``repartitionByRange(n_files, z)`` (one sampled range
   shuffle — file-level clustering) + ``sortWithinPartitions(z)``
   (row-group-level clustering). No driver materialization anywhere.

``pruning_report`` measures the payoff the same way an engine's file
index would: it reads parquet footer statistics (pyarrow, no data read)
and counts the files a min-max pruner must scan for a given box
predicate. ``tests/test_layout.py`` asserts z-order strictly beats a
linear layout on a 2-D slice.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_code", "write_zordered", "pruning_report"]


def _bin_code(col: Column, edges: list[float], bits: int) -> Column:
    """Quantile-bin index of ``col`` against literal ``edges`` (ascending),
    clamped to ``[0, 2^bits)``: ``size(filter(edges, e -> e <= col))``.

    A HOF over a ≤``2^bits``-element literal array — evaluated in
    codegen at scan speed; no join, no udf. NULLs code to bin 0 so they
    cluster together at the low end.
    """
    arr = F.array(*[F.lit(float(e)) for e in edges])
    n_bins = (1 << bits) - 1
    code = F.size(F.filter(arr, lambda e: e <= col.cast("double")))
    return F.least(F.greatest(F.coalesce(code, F.lit(0)), F.lit(0)), F.lit(n_bins))


def zorder_code(
    df: DataFrame, cols: Sequence[str], bits_per_col: int = 8
) -> Column:
    """Z-value (Morton code) column interleaving ``cols``' quantile-bin
    codes, ``bits_per_col`` bits each (total ≤ 63 bits).

    Numeric and timestamp columns are supported; timestamps rank by
    epoch seconds. Bin edges are interior quantiles (``approxQuantile``,
    relative error 1e-3) so bins are equi-depth even under skew — a
    min/max linear scaling would collapse under heavy-tailed columns.
    """
    k = len(cols)
    if k * bits_per_col > 63:
        raise ValueError(f"{k} cols × {bits_per_col} bits exceeds 63 bits")
    n_bins = 1 << bits_per_col
    probs = [i / n_bins for i in range(1, n_bins)]

    dtypes = dict(df.dtypes)
    _ok = ("tinyint", "smallint", "int", "bigint", "float", "double",
           "boolean",  # casts to 0.0/1.0 — orderable, never NULLed
           "timestamp", "timestamp_ntz", "date")
    for c in cols:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"zorder column {c!r} not in DataFrame")
        if t not in _ok and not t.startswith("decimal"):
            # A silent cast-to-double would NULL every value of e.g. a
            # string column: its z-bits all zero, the dimension clusters
            # nothing, and pruning quietly never improves. Fail instead.
            raise TypeError(
                f"zorder column {c!r} has non-orderable-numeric type {t}; "
                "cast it to a numeric/timestamp rank yourself first"
            )
    proj = df.select(
        *[
            (
                F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
                if dtypes[c] in ("timestamp", "timestamp_ntz", "date")
                else F.col(c).cast("double")
            ).alias(f"_zc{i}")
            for i, c in enumerate(cols)
        ]
    )
    all_edges = proj.stat.approxQuantile(
        [f"_zc{i}" for i in range(k)], probs, 1e-3
    )

    z = F.lit(0).cast("bigint")
    for ci, (c, edges) in enumerate(zip(cols, all_edges)):
        base = (
            F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
            if dtypes[c] in ("timestamp", "timestamp_ntz", "date")
            else F.col(c)
        )
        code = _bin_code(base, sorted(set(edges)), bits_per_col).cast("bigint")
        for b in range(bits_per_col):
            # bit b of column ci lands at interleaved position b*k + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(code, b).bitwiseAND(F.lit(1)), b * k + ci
                )
            )
    return z.alias("_zorder")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits_per_col: int = 8,
) -> None:
    """Write ``df`` to parquet clustered by the z-order of ``cols``:
    range-partitioned into ``n_files`` z-ranges (file-level clustering),
    sorted by z within each (row-group-level clustering). The z column
    itself is dropped — it's a layout artifact, not data.
    """
    z = zorder_code(df, cols, bits_per_col)
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruning_report(
    path: str, box: dict[str, tuple[object, object]]
) -> dict[str, int | float]:
    """Footer-statistics pruning simulation: how many parquet files of
    ``path`` would a min-max pruner scan for the conjunctive range
    predicate ``box`` ({col: (lo, hi)})?

    Reads only footers (pyarrow metadata — the same information a
    catalog file index or Spark's parquet reader uses), no row data.
    Returns total/scanned file counts and the scan fraction.
    """
    ds = pq.ParquetDataset(path)
    total, scanned = 0, 0
    for frag in ds.fragments:
        total += 1
        md = frag.metadata
        schema_names = frag.physical_schema.names
        overlap = True
        for col, (lo, hi) in box.items():
            idx = schema_names.index(col)
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    fmin = None
                    break
                fmin = stats.min if fmin is None else min(fmin, stats.min)
                fmax = stats.max if fmax is None else max(fmax, stats.max)
            if fmin is None:
                continue  # no stats → cannot prune on this column
            if fmax < lo or fmin > hi:
                overlap = False
                break
        scanned += int(overlap)
    return {
        "files_total": total,
        "files_scanned": scanned,
        "scan_fraction": scanned / max(total, 1),
    }
