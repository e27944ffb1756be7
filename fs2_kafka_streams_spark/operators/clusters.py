"""Connected components + canonical-representative selection over
near-duplicate pair sets — the last step of the dedup family.

``ngram_jaccard_pairs`` / ``minhash_lsh_pairs`` / ``simhash_pairs`` emit
PAIRS; a training pipeline needs CLUSTERS (duplicate groups) so it can keep
exactly one representative per group. Pair-at-a-time dropping (e.g. "drop
the right id of every pair") over-deletes on transitive chains A–B–C, so
the correct reduction is connected components.

Algorithm: distributed **min-label propagation with pointer jumping**
(the standard iterative MapReduce/Pregel CC formulation from the public
literature). Each round is two hash joins + one aggregation over the
label/edge tables — fully distributed; the driver holds only a round
counter and a convergence flag (one scalar per round). Plain propagation
alone needs O(component diameter) rounds; the pointer-jumping step
(``lbl ← lbl(lbl)``, valid because every label IS a vertex id) halves
label-chain depth each round, giving the logarithmic convergence that
makes this viable on 100 TB pair sets.

Correctness of the fixed point: labels only ever decrease and only take
existing vertex ids, so they are bounded below by the component minimum;
at stability every edge (u,v) forces lbl(u) = lbl(v), so labels are
constant per component; the minimum vertex keeps its own id; hence every
label equals its component minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fs2_kafka_streams_spark.operators.util import materialize
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_keep_best"]


#: Observability: propagation rounds used by the most recent
#: :func:`connected_components` call (scale runs assert round-count
#: stability — label propagation with pointer jumping converges in
#: O(log diameter), so corpus growth must NOT grow rounds).
LAST_ROUNDS: int = 0


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Reduce an undirected pair list to ``(id, component)``, where
    ``component`` is the smallest id in each connected group. Ids may be
    any orderable type — numeric offsets or string/UUID document ids
    ("smallest" is that type's ordering; the NULL label placeholder below
    is cast to the id column's own type).

    Ids not present in ``pairs`` are the caller's concern — join the
    result back to the corpus with a coalesce-to-self (see
    :func:`dedup_keep_best`).

    Raises if not converged within ``max_rounds`` (with pointer jumping
    this covers astronomically deep components) rather than silently
    returning wrong labels.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter("src <> dst")
        .distinct()
        # localCheckpoint, not persist: the caller's pair DF may carry an
        # arbitrarily deep plan (e.g. the whole LSH pipeline), and EVERY
        # round's join/agg/changed-check would re-COMPILE that tree even
        # though persist reuses its execution (measured 5× loop slowdown
        # on the minhash input). Checkpointing truncates the plan to an
        # RDD scan. Production clusters: reliable .checkpoint().
        .transform(materialize)
    )
    # seed each vertex with min(self, min neighbor) — one aggregation over
    # the (already materialized) edge table that is exactly the first
    # propagation round, so small-diameter components (the common planted-
    # duplicate case: pairs/triples) converge one round earlier
    lab = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_mn")).alias("lbl"),
        )
        .persist()
    )

    global LAST_ROUNDS
    for _round in range(max_rounds):
        # propagate: each vertex adopts the min label in its neighborhood.
        # The vertex's OLD label rides along through the aggregation
        # (min over exactly one non-null value) so the convergence check
        # below needs no join against the previous round's table — one
        # fewer O(V) shuffle per round.
        via_edges = (
            edges.join(lab, edges["src"] == lab["id"])
            .select(
                F.col("dst").alias("id"),
                "lbl",
                # the id column's OWN type, not a hard-coded long — string
                # doc ids would otherwise fail unionByName with lbl
                F.lit(None).cast(edges.schema["src"].dataType).alias("_old"),
            )
        )
        prop = (
            lab.select("id", "lbl", F.col("lbl").alias("_old"))
            .unionByName(via_edges)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"), F.min("_old").alias("_old"))
        )
        # pointer jump: lbl <- lbl(lbl) (labels are vertex ids, so they
        # index back into the label table)
        l2 = prop.select(
            F.col("id").alias("_jid"), F.col("lbl").alias("_jlbl")
        )
        # localCheckpoint (not persist): it TRUNCATES the logical plan.
        # Without it each round's plan embeds every previous round's
        # (self-joins double the tree), and by ~10 rounds plan compilation
        # itself OOMs — the standard iterative-DataFrame pitfall. On a real
        # cluster use reliable checkpointing (spark.sparkContext.
        # setCheckpointDir + .checkpoint()) for fault tolerance.
        new_full = (
            prop.join(l2, prop["lbl"] == l2["_jid"], "left")
            .select(
                "id",
                F.least(
                    F.col("lbl"), F.coalesce("_jlbl", F.col("lbl"))
                ).alias("lbl"),
                "_old",
            )
            .transform(materialize)
        )
        # every id in prop carries its own previous label (edges are
        # symmetric, so via_edges introduces no new ids) — the convergence
        # check is a filter over the just-materialized table, no join
        changed = (
            new_full.filter(F.col("lbl") != F.col("_old")).limit(1).count()
        )
        # round 0 releases the genuinely persisted seed; on later rounds
        # lab is localCheckpoint-backed, where unpersist is a no-op by
        # design — those blocks are GC-reclaimed with the DataFrame
        # (ContextCleaner), as are the edge blocks
        lab.unpersist()
        lab = new_full.drop("_old")
        if changed == 0:
            LAST_ROUNDS = _round + 1
            break
    else:
        LAST_ROUNDS = max_rounds  # don't leave a stale count from a
        # previous successful call on the diagnostic path
        raise RuntimeError(
            f"connected_components: no convergence in {max_rounds} rounds"
        )

    return lab.select("id", F.col("lbl").alias("component"))


def dedup_keep_best(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one representative per near-duplicate cluster.

    The representative is the highest-``quality_col`` member (ties and
    ``quality_col=None`` fall back to smallest id) — the "keep the best
    copy" policy pipelines actually want, vs. keep-arbitrary. Documents in
    no cluster survive unchanged. One ``max_by`` aggregation per cluster +
    a semi-join back; everything hash-partitioned by cluster/doc id.
    """
    from pyspark.sql import Window as W

    clash = {"component", "_rn"} & set(corpus.columns)
    if clash or id_col == "component":
        # a corpus already carrying a 'component' column (e.g. re-deduping
        # an already-clustered corpus) would make the label join ambiguous
        # at the first downstream reference — fail at the boundary
        raise ValueError(
            f"dedup_keep_best reserves column name(s) "
            f"{sorted(clash or {'component'})}; rename or drop them on "
            "the corpus first"
        )
    comp = connected_components(pairs, id_a, id_b)
    labeled = corpus.join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    # row_number over (quality desc, id asc), not max_by over a negated
    # id: negation only orders NUMERIC ids (a string/UUID id col would
    # yield NULL or an ANSI cast error and break the documented
    # smallest-id tie-break); the window is the same single shuffle
    w = W.partitionBy("component").orderBy(
        *([F.col(quality_col).desc_nulls_last()] if quality_col else []),
        F.col(id_col).asc(),
    )
    best = (
        labeled.select(
            "component", id_col, *([quality_col] if quality_col else [])
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return corpus.join(best.select(id_col), id_col, "left_semi")
