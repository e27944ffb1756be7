"""Training-data pipeline operators: splits, shuffles, shards, packing.

The ops a 100 TB pretraining-data pipeline runs after cleaning/dedup and
before the trainer reads shards. All are deterministic (seeded content
hashes, never ``rand()``) so re-running a pipeline stage on retried tasks
or re-planned stages yields byte-identical output — the same property the
deterministic-salt fix gives ``salted_join`` (nondeterministic expressions
re-evaluate differently across Spark task retries and silently corrupt
results).

Scale posture per op:

- ``hash_split``: pure column expression on a content hash — no shuffle at
  all; the split column is computable at scan time on every executor.
- ``deterministic_shuffle``: ONE range-partitioned sort by a seeded hash —
  the standard "global shuffle before sharding" step; Spark's sort is
  distributed (sampled range boundaries, per-partition sort, no driver
  materialization).
- ``sharded_export``: ``repartition(n, hash)`` — one hash shuffle; shard
  sizes are balanced in expectation (md5 is uniform), verified in tests.
- ``pack_sequences``: greedy first-fit packing inside each hash bucket via
  ``applyInPandas`` — state is per-bucket (no global coordination), so
  buckets pack in parallel and the operator scales linearly with
  executors. Arrow-vectorized; the only Python hop in this module.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "seeded_bucket",
    "hash_split",
    "stratified_sample",
    "stratified_sample_flag",
    "deterministic_shuffle",
    "sharded_export",
    "pack_sequences",
    "temperature_sample",
    "chunk_documents",
]

#: Buckets for split assignment — 1e4 gives 0.01% fraction granularity.
SPLIT_BUCKETS = 10_000


def seeded_bucket(col: str | Column, seed: str, n: int) -> Column:
    """Deterministic uniform bucket in ``[0, n)`` from a seeded content hash.

    ``conv(substr(md5(seed || id), 1, 8), 16, 10) % n`` — md5 is portable
    (the DuckDB oracle computes the identical bucket with
    ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)``), uniform, and a
    pure projection: no shuffle, no Python, pushable into the scan stage.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(n))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test/...) by content hash.

    Properties a training pipeline needs and ``rand()``-based splits lack:

    - **deterministic**: the same (id, seed) always lands in the same
      split, across runs, task retries, and cluster sizes;
    - **disjoint + exhaustive**: buckets partition ``[0, SPLIT_BUCKETS)``;
    - **stable under growth**: adding new documents never moves an
      existing document between splits (its bucket depends only on itself).

    ``fractions`` values must sum to 1.0 (±1e-9). Assignment is by
    cumulative bucket ranges in dict order.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = seeded_bucket(id_col, seed, SPLIT_BUCKETS)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        hi = round(cum * SPLIT_BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float rounding can leave bucket == SPLIT_BUCKETS-1 unassigned for a
    # hair; fold it into the last split
    expr = expr.otherwise(list(fractions)[-1])
    # a NULL id has no hash: its split is NULL (the caller decides),
    # consistent with stratified_sample which drops NULL-id rows — the
    # otherwise() above would otherwise route every NULL id into the LAST
    # declared split, silently contaminating the eval/test set
    expr = F.when(F.col(id_col).isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance sources or
    languages in a training mix): keep a ``fractions[stratum]`` share of
    each stratum, ``default`` share of unlisted strata.

    Unlike ``DataFrame.sampleBy`` (rand()-based: nondeterministic across
    retries, unstable membership run-to-run), membership is a pure
    function of (id, seed): ``bucket(id) < frac * SPLIT_BUCKETS``. A pure
    projection + filter — no shuffle; composes with :func:`hash_split`
    (different seeds give independent bucketings).
    """
    return df.filter(
        stratified_sample_flag(stratum_col, id_col, fractions, default, seed)
    )


def stratified_sample_flag(
    stratum_col: str,
    id_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: str = "sample-v1",
) -> Column:
    """The membership predicate :func:`stratified_sample` filters on, as a
    standalone boolean column.

    Exposing the flag (rather than semi-joining against the sampled set)
    matters at scale: the kept set is O(corpus) — broadcasting or joining
    it to tag membership is a driver OOM waiting to happen, while this is
    a zero-join scan-stage projection.
    """
    bucket = seeded_bucket(id_col, seed, SPLIT_BUCKETS)
    thresh = F.lit(round(default * SPLIT_BUCKETS))
    for stratum, frac in fractions.items():
        thresh = (
            F.when(
                F.col(stratum_col) == stratum,
                F.lit(round(frac * SPLIT_BUCKETS)),
            ).otherwise(thresh)
        )
    return bucket < thresh


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "shuffle-v1",
    expose_key: str | None = None,
) -> DataFrame:
    """Globally shuffle rows into a seeded pseudorandom — but reproducible —
    order (the "shuffle the corpus before sharding" training-data step).

    One distributed sort by ``(md5(seed || id), id)``: Spark samples range
    boundaries, range-partitions, and sorts per partition — no single-task
    bottleneck, no driver materialization. Changing ``seed`` produces an
    independent permutation; the ``id`` tiebreak makes the order total.

    ``expose_key=<name>`` additionally emits the sort key as a column, so
    the permutation itself is verifiable by an order-insensitive oracle
    (sorting by the exposed key reproduces the shuffle order exactly) —
    without a global ``row_number()`` window, which would serialize on a
    single task at scale.
    """
    c = F.col(id_col).cast("string")
    key = F.md5(F.concat(F.lit(seed), c))
    if expose_key is not None:
        df = df.withColumn(expose_key, key)
        return df.orderBy(F.col(expose_key), F.col(id_col))
    return df.orderBy(key, F.col(id_col))


def sharded_export(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    seed: str = "shard-v1",
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` balanced output files.

    ``repartition(n, seeded_bucket)`` hash-distributes rows uniformly (one
    shuffle), then each task writes exactly one file — the shard layout
    trainers expect (uniform sizes, deterministic membership). With plain
    ``df.write`` the file count would be whatever the previous stage's
    partitioning happened to be.

    The bucket domain is much larger than ``n_shards``: repartition hashes
    the bucket VALUE, so with only ``n_shards`` distinct values hash
    collisions would leave some shards empty and others doubled; 64k
    sub-buckets spread evenly over any shard count.
    """
    bucket = seeded_bucket(id_col, seed, 65_536)
    (
        df.repartition(n_shards, bucket)
        .write.format(format)
        .mode("overwrite")
        .save(path)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_buckets: int = 64,
    seed: str = "pack-v1",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Greedy sequence packing: group documents into bins of ≤ ``budget``
    total tokens (the context-window packing step before tokenized shards
    are written).

    Documents are hash-bucketed (deterministic, ``n_buckets`` ≫ executors
    for parallelism), and each bucket is packed independently with a
    first-fit-decreasing pass inside ``applyInPandas`` — packing state is
    per-bucket, so no global coordination and linear scale-out; bin ids are
    globally unique as ``(bucket, local_bin)``.

    Returns one row per document: ``(id, token_count, *keep_cols, bucket,
    bin_id, bin_tokens)``. Invariants (asserted in tests): every input id
    appears exactly once; ``bin_tokens <= budget`` unless the bin is a
    single document longer than the budget.
    """
    keep = list(keep_cols or [])
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(token_count_col).cast("long").alias("_tokens"),
        *[F.col(c) for c in keep],
    ).withColumn("bucket", seeded_bucket("_id", seed, n_buckets).cast("int"))

    out_schema = ", ".join(
        [f"_id {base.schema['_id'].dataType.simpleString()}",
         "_tokens long"]
        + [f"{c} {base.schema[c].dataType.simpleString()}" for c in keep]
        + ["bucket int", "bin_id string", "bin_tokens long"]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["_tokens"].isna().any():
            # a NULL count reaches pandas as NaN (long→float64 promotion)
            # and int(NaN) would abort the whole job with an opaque
            # ValueError — name the offending id instead
            bad = pdf.loc[pdf["_tokens"].isna(), "_id"].iloc[0]
            raise ValueError(
                f"pack_sequences: NULL token count for id {bad!r} — "
                "filter or impute the count upstream"
            )
        pdf = pdf.sort_values(
            ["_tokens", "_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        bins: list[int] = []  # remaining capacity per bin
        assign: list[int] = []
        for t in pdf["_tokens"]:
            t = int(t)
            placed = None
            for i, cap in enumerate(bins):
                if cap >= t:
                    placed = i
                    bins[i] = cap - t
                    break
            if placed is None:
                # new bin; an oversized doc still gets its own bin
                bins.append(max(budget - t, 0))
                placed = len(bins) - 1
            assign.append(placed)
        pdf["bin_id"] = [f"{bucket}-{a}" for a in assign]
        totals = pdf.groupby("bin_id")["_tokens"].transform("sum")
        pdf["bin_tokens"] = totals.astype("int64")
        return pdf

    return (
        base.groupBy("bucket")
        .applyInPandas(pack, schema=out_schema)
        .withColumnRenamed("_id", id_col)
        .withColumnRenamed("_tokens", token_count_col)
    )


def temperature_sample(
    df: DataFrame,
    weight_col: str,
    source_col: str = "source",
    id_col: str = "doc_id",
    frac: float = 0.5,
    seed: str = "mix-v1",
) -> DataFrame:
    """Temperature-weighted mixture sampling across sources (the sqrt /
    alpha=0.5 domain-rebalancing recipe of multi-corpus pretraining
    mixtures): a source's share of the sampled corpus is proportional to
    ``sqrt(sum(weight))`` rather than its raw size, damping dominant
    domains and boosting the tail.

    Per source ``s``: ``p_s = min(1, frac * N_total * isqrt_s / (S *
    n_docs_s))`` with ``isqrt_s = floor(sqrt(sum(weight_s)))`` and ``S =
    sum_t isqrt_t``; a document is kept iff its seeded md5 bucket fraction
    is below ``p_s``. Deterministic (same doc + seed => same decision on
    any cluster size or task retry) and exact: isqrt is a correctly-rounded
    IEEE sqrt of an exact integer, floored — bit-identical in any engine —
    and every later product/division is single IEEE ops on exact-integer
    doubles, so the DuckDB oracle reproduces each decision bit-for-bit.

    Plan shape (100 TB): one O(sources)-row aggregate, broadcast back to
    the corpus scan; selection is a scan-time projection + filter. No
    corpus-sized shuffle anywhere. The ``sample_weight`` output column
    (1/p_s) is the importance weight a loss-weighted trainer would consume.
    """
    doc = df.select(
        F.col(id_col),
        F.col(source_col),
        F.col(weight_col).cast("bigint").alias("_w"),
    )
    stats = (
        doc.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("_n_docs"),
            F.sum("_w").alias("_src_w"),
        )
        .withColumn(
            "_isqrt",
            F.floor(F.sqrt(F.col("_src_w").cast("double"))).cast("bigint"),
        )
    )
    tot = stats.agg(
        F.sum("_isqrt").alias("_sum_sqrt"),
        F.sum("_n_docs").alias("_n_total"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            # guard the zero-mass case (all weights zero/NULL): under the
            # session's ANSI mode the bare division would abort the job
            # with DIVIDE_BY_ZERO; a weightless source samples NOTHING
            # (p_sel = 0), which also keeps non-ANSI from silently
            # resolving least(1.0, NULL) to "keep everything"
            F.when(
                (F.col("_sum_sqrt") > 0) & (F.col("_n_docs") > 0),
                F.lit(frac)
                * F.col("_n_total").cast("double")
                * F.col("_isqrt").cast("double")
                / (
                    F.col("_sum_sqrt").cast("double")
                    * F.col("_n_docs").cast("double")
                ),
            ).otherwise(F.lit(0.0)),
        ).alias("p_sel"),
    )
    bucket = seeded_bucket(id_col, seed, SPLIT_BUCKETS)
    return (
        doc.join(F.broadcast(rates), source_col)
        .where(
            bucket.cast("double") / F.lit(float(SPLIT_BUCKETS))
            < F.col("p_sel")
        )
        .select(
            id_col,
            source_col,
            F.col("_w").alias("n_tok"),
            "p_sel",
            (F.lit(1.0) / F.col("p_sel")).alias("sample_weight"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    (``stride < chunk_size``) — the standard context-window chunking step
    between cleaning and packing. Emits one row per (doc, chunk):
    ``chunk_idx``, the space-rejoined ``chunk_text``, and its token count.
    Every token appears in at least one chunk; trailing windows may be
    short (kept — deterministic and loss-free; a trainer-side filter can
    drop sub-minimum tails).

    Plan shape (100 TB): tokenize → build the start list → explode —
    all row-local array expressions on the scan, zero shuffle, output
    rows ≈ tokens/stride per doc. Exact integer arithmetic throughout,
    so the DuckDB oracle replays every chunk boundary.
    """
    from fs2_kafka_streams_spark.operators.text import tokens

    if not 0 < stride <= chunk_size:
        # stride > chunk_size silently loses the tokens between windows —
        # a violation of the every-token-in-a-chunk contract above; == is
        # allowed (non-overlapping but complete)
        raise ValueError(
            f"stride must be in (0, chunk_size={chunk_size}], got {stride}"
        )
    tok = tokens(text_col)
    # stepped sequence, not sequence+filter: the filtered form built an
    # n_tokens-element array per document before keeping ~n/stride entries
    # — 24× the needed intermediate array memory on the scan path at the
    # default stride (DuckDB's generate_series takes the same step, so the
    # oracle mirror is unchanged)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("_t")), F.lit(1)), F.lit(stride)
    )
    chunk = F.slice(F.col("_t"), F.col("_s"), chunk_size)
    return (
        df.select(F.col(id_col), tok.alias("_t"))
        .select(id_col, "_t", F.explode(starts).alias("_s"))
        .select(
            id_col,
            ((F.col("_s") - 1) / F.lit(stride))
            .cast("int")
            .alias("chunk_idx"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
        .filter(F.col("n_chunk_tokens") > 0)
    )
