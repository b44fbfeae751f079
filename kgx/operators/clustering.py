"""Embedding k-means clustering (Lloyd's) in exact integer arithmetic.

Corpus clustering over the embedding column is the backbone of
cluster-based curation (SemDeDup-style semantic dedup, cluster-balanced
sampling, topic bucketing) in a large-scale training-data pipeline.  The
reference extractor has no equivalent — it never looks at embeddings — so
this is a north-star NEW operator alongside the ANN family
(kgx.operators.similarity).

Determinism contract (the same one as similarity.py): embeddings are
quantized to 1e-4 fixed point (``similarity.QUANT``); dot products, norms
and centroid updates are exact 64-bit integer arithmetic (sums of bigints
are order-independent, so no float-summation-order divergence between
engines); centroid means use truncation-toward-zero division, which Spark's
``DIV`` and DuckDB's ``//`` both implement; the only floats are final
correctly-rounded IEEE ``sqrt``/division for the argmax-by-cosine ranking,
identical bit-for-bit in both engines.  Initial centroids are the first
``k`` vectors (at 100 TB you'd train centroids on a sample offline and
broadcast them — the same stance as similarity.assign_cells).

Scale design: the assignment join broadcasts the k-row centroid table;
the centroid update is posexplode → groupBy(cluster, pos) with map-side
partial aggregation, so the shuffle per round carries only
``partitions × k × dim`` pre-combined rows — never the corpus.  Truncated
means keep centroid components bounded by the quantized input range, so
assignment dots stay far from bigint overflow at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgx.operators.similarity import _dot, quantized

#: Ranking expression for the argmax assignment: cosine without the
#: per-vector norm factor (constant within a vec_id partition).  Exact
#: integer inputs → correctly-rounded double ops → deterministic cross-engine.
_RANK_COSINE = "cast(dot as double) / sqrt(cast(cnrm as double))"

#: Full cosine for the reported output column.
_OUT_COSINE = (
    "cast(dot as double) / (sqrt(cast(qnrm as double)) * sqrt(cast(cnrm as double)))"
)


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q, nrm) × (cluster, cq, cnrm) → best cluster per vector
    (argmax dot/sqrt(cnrm), ties → min cluster id)."""
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "q",
        F.col("nrm").alias("qnrm"),
        "cluster",
        F.expr(_dot("q", "cq")).alias("dot"),
        "cnrm",
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.expr(_RANK_COSINE)), F.asc("cluster")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Recompute centroids as the per-dimension truncated integer mean of
    each cluster's member vectors.  posexplode → groupBy(cluster, pos) rides
    map-side combine; reassembly sorts by pos explicitly (never relies on
    collect_list order)."""
    dims = assigned.select("cluster", F.posexplode("q").alias("pos", "v"))
    means = dims.groupBy("cluster", "pos").agg(
        F.expr("sum(v) DIV count(*)").alias("c")
    )
    cents = (
        means.groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)"
            ).alias("cq")
        )
        .withColumn(
            "cnrm", F.expr("aggregate(cq, cast(0 as bigint), (acc, v) -> acc + v * v)")
        )
        .where(F.col("cnrm") > 0)
    )
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    rounds: int = 2,
    target_cluster_size: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over ``(vec_id, embedding array<float>)``.

    ``rounds`` centroid-update iterations (init → [assign → update] ×
    rounds → final assign).  Output: (vec_id, cluster, cosine) — the final
    cluster per vector and the exact quantized cosine to its final centroid.
    Empty clusters drop out (their centroid table row disappears), matching
    classic Lloyd behavior.

    ``target_cluster_size`` auto-sizes ``k = ceil(N / target)``
    (similarity.auto_centroids) — the k ∝ N contract that keeps
    within-cluster work (SemDeDup's pair join) linear in corpus size.
    """
    if target_cluster_size is not None:
        from kgx.operators.similarity import auto_centroids

        k = auto_centroids(embeddings, target_cluster_size)
    base = quantized(embeddings).where(F.col("nrm") > 0)
    cents = base.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"),
        F.col("q").alias("cq"),
        F.col("nrm").alias("cnrm"),
    )
    for _ in range(rounds):
        assigned = _assign(base, cents)
        # localCheckpoint would truncate lineage for deep runs (the PageRank
        # stance, graphstats.pagerank); at the 2-3 rounds used here the plan
        # stays shallow enough to leave lazy.
        cents = _update(assigned)
    final = _assign(base, cents)
    return final.select(
        "vec_id", "cluster", F.expr(_OUT_COSINE).alias("cosine")
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    rounds: int = 2,
    min_cosine: float = 0.5,
    target_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means bucketing.

    Cluster the embedding space (:func:`kmeans_assign`), then compare only
    WITHIN clusters with the exact quantized cosine; a vector is a
    semantic duplicate iff a smaller-id cluster-mate lies inside its cosine
    ball (keep-first, the same canonical-min policy as the text dedup
    family).  Output covers every clustered vector:
    (vec_id, cluster, dup_of, is_duplicate) — ``dup_of`` = the smallest
    such cluster-mate, NULL for keepers.

    Scale stance: within-cluster comparison is the SemDeDup design — k is
    sized so clusters hold ~1k-100k points at corpus scale (k ∝ N), keeping
    the per-cluster pair join bounded; the cluster equi-join is the only
    shuffle beyond k-means itself.  ``target_cluster_size`` COMPUTES that
    sizing (k = ceil(N / target), similarity.auto_centroids) instead of
    leaving it to the caller.  The paper resolves ε-balls greedily
    per cluster too (keeping one point per ball); keep-first-by-id is the
    deterministic, engine-replayable variant of that choice.
    """
    if target_cluster_size is not None:
        from kgx.operators.similarity import auto_centroids

        k = auto_centroids(embeddings, target_cluster_size)
    # materialize the k-means result once: the within-cluster pair join
    # consumes it three times (the assigns left-join plus both x/y sides),
    # and without a cut each consumer re-runs the full Lloyd's iteration
    # chain.  localCheckpoint (the linking.connected_components stance) both
    # truncates the deep per-round lineage and caches the tiny
    # (vec_id, cluster) table.
    assigns = (
        kmeans_assign(embeddings, k, rounds)
        .select("vec_id", "cluster")
        .localCheckpoint()
    )
    base = quantized(embeddings).where(F.col("nrm") > 0)
    vb = assigns.join(base, "vec_id")
    x = vb.select(
        F.col("cluster").alias("cx"), F.col("vec_id").alias("xa"),
        F.col("q").alias("qx"), F.col("nrm").alias("nx"),
    )
    y = vb.select(
        F.col("cluster").alias("cy"), F.col("vec_id").alias("ya"),
        F.col("q").alias("qy"), F.col("nrm").alias("ny"),
    )
    cos = (
        f"cast({_dot('qx', 'qy')} as double) / "
        "(sqrt(cast(nx as double)) * sqrt(cast(ny as double)))"
    )
    dups = (
        x.join(y, (F.col("cx") == F.col("cy")) & (F.col("xa") < F.col("ya")))
        .where(F.expr(cos) >= F.lit(min_cosine))
        .groupBy(F.col("ya").alias("vec_id"))
        .agg(F.min("xa").alias("dup_of"))
    )
    return assigns.join(dups, "vec_id", "left").select(
        "vec_id",
        "cluster",
        "dup_of",
        F.col("dup_of").isNotNull().alias("is_duplicate"),
    )


def cluster_stats(assignments: DataFrame) -> DataFrame:
    """Per-cluster summary over :func:`kmeans_assign` output:
    (cluster, n_vecs, min_vec_id) — the shape cluster-balanced sampling and
    SemDeDup bucket sizing consume."""
    return assignments.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("vec_id").alias("min_vec_id"),
    )
