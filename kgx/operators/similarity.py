"""Similarity search over embedding columns — brute-force and IVF.

ANN over an ``array<float>`` column is the scale path for embedding-based
near-dup mining and retrieval.  Two operators:

- :func:`cosine_topk` — exact brute-force top-k (the correctness baseline).
  O(Q·N) via a broadcast of the (small) query set; every step is a built-in
  higher-order array function, JVM-side, whole-stage-codegen'd.
- :func:`ivf_topk` — IVF-style bucketed search: deterministic centroids
  (the first ``n_centroids`` vectors), cells assigned by max quantized dot,
  queries probe their ``nprobe`` nearest cells only — the O(Q·N/C·nprobe)
  scale path.

Determinism contract: embeddings are quantized to 1e-4 fixed point and all
dot products/norms are computed in exact 64-bit integer arithmetic; the final
cosine is ``int_dot / (sqrt(na) * sqrt(nb))`` evaluated in IEEE double.
Integer sums are order-independent and sqrt/division are correctly-rounded
IEEE ops, so results are bit-identical in Spark and the DuckDB oracle —
float *summation order* (the usual cross-engine divergence) never occurs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10000  # 1e-4 fixed point; |x|<~10 and 64 dims keep dots < 2^63

_QUANT_EXPR = (
    f"transform(embedding, x -> cast(round(cast(x as double) * {QUANT}) as bigint))"
)
_NORM_EXPR = "aggregate(q, cast(0 as bigint), (acc, v) -> acc + v * v)"


def quantized(embeddings: DataFrame) -> DataFrame:
    """(vec_id, embedding float[]) → (vec_id, q bigint[], nrm bigint)."""
    return embeddings.select(
        "vec_id", F.expr(_QUANT_EXPR).alias("q")
    ).withColumn("nrm", F.expr(_NORM_EXPR))


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"


_COSINE = (
    "cast(dot as double) / (sqrt(cast(qnrm as double)) * sqrt(cast(vnrm as double)))"
)


def cosine_topk(embeddings: DataFrame, n_queries: int = 8, k: int = 5) -> DataFrame:
    """Exact top-k by quantized cosine.  Queries = vec_id < n_queries
    (deterministic, oracle-reproducible).  Output:
    (query_id, rank, vec_id, cosine) — ties broken by vec_id."""
    from pyspark.sql.window import Window

    base = quantized(embeddings).where(F.col("nrm") > 0)
    qs = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        base.crossJoin(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(_dot("qq", "q")).alias("dot"),
            "qnrm",
            F.col("nrm").alias("vnrm"),
        )
        .withColumn("cosine", F.expr(_COSINE))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "vec_id", "cosine")
    )


def auto_centroids(embeddings: DataFrame, target_cell_size: int) -> int:
    """Derive the centroid/cluster count from a TARGET CELL SIZE:
    ``k = ceil(N / target_cell_size)`` (exact integer arithmetic, min 1).

    This is the scale contract for the whole embedding family: same-cell
    pair enumeration costs O(sum of cell²) = O(N · cell_size), so holding
    cell size constant while k grows ∝ N keeps candidate generation LINEAR
    in corpus size — a fixed k would make it O(N²/k), quadratic at 100×.
    The count is a driver-side metadata action (one scalar); the DuckDB
    oracles replay the identical formula as a scalar subquery
    (kgx.oracles._auto_k_expr), so derived-k results stay hash-identical
    across engines at any sf."""
    n = embeddings.count()
    return max(1, (n + target_cell_size - 1) // target_cell_size)


def assign_cells(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_assign: int = 1,
    target_cell_size: int | None = None,
) -> DataFrame:
    """IVF cell assignment: centroid = argmax integer dot (ties → min id).
    Centroids are the first ``n_centroids`` vectors — deterministic without
    an iterative k-means (at 100 TB you'd train centroids offline and
    broadcast them the same way).  ``n_assign > 1`` indexes each vector into
    its top-N cells (multi-probe indexing for the near-dup candidate join).
    ``target_cell_size`` overrides ``n_centroids`` with the auto-sized
    ``ceil(N / target)`` (:func:`auto_centroids`) so cells stay bounded as
    the corpus grows."""
    if target_cell_size is not None:
        n_centroids = auto_centroids(embeddings, target_cell_size)
    from pyspark.sql.window import Window

    base = quantized(embeddings).where(F.col("nrm") > 0)
    cents = base.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"),
        F.col("q").alias("cq"),
        F.col("nrm").alias("cnrm"),
    )
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "nrm", "cell", F.expr(_dot("q", "cq")).alias("cdot")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_assign)
        .select("vec_id", "q", "nrm", "cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    target_cell_size: int | None = None,
) -> DataFrame:
    """IVF search: each query probes its ``nprobe`` best cells, exact rerank
    inside.  Output schema identical to :func:`cosine_topk`.
    ``target_cell_size`` auto-sizes the cell count (:func:`auto_centroids`)
    so per-probe rerank work stays bounded as the corpus grows."""
    from pyspark.sql.window import Window

    if target_cell_size is not None:
        n_centroids = auto_centroids(embeddings, target_cell_size)
    cells = assign_cells(embeddings, n_centroids)
    base = quantized(embeddings).where(F.col("nrm") > 0)
    cents = base.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cell"),
        F.col("q").alias("cq"),
    )
    qs = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qnrm"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cell"))
    probes = (
        qs.crossJoin(F.broadcast(cents))
        .select("query_id", "qq", "qnrm", "cell", F.expr(_dot("qq", "cq")).alias("cdot"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qq", "qnrm", "cell")
    )
    scored = (
        probes.join(cells, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(_dot("qq", "q")).alias("dot"),
            "qnrm",
            F.col("nrm").alias("vnrm"),
        )
        .withColumn("cosine", F.expr(_COSINE))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int"), "vec_id", "cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    min_cosine: float = 0.2,
    n_centroids: int = 16,
    n_assign: int = 2,
    target_cell_size: int | None = None,
) -> DataFrame:
    """Cell-bucketed embedding near-duplicate pairs above a cosine floor.

    Each vector is indexed into its ``n_assign`` best IVF cells
    (:func:`assign_cells`); candidate pairs are vectors sharing at least one
    cell, verified with the exact quantized cosine — the same
    bucket-then-verify shape as the MinHash-LSH dedup family, and the fix for
    round 1's all-pairs ``crossJoin`` (O(N²) pair materialization dies at
    100×; same-cell joins stay O(sum of cell²) with cells bounded by
    ``n_centroids`` scaling with N).  Truly near-duplicate vectors
    (cosine → 1) agree on their argmax cell by construction; multi-probe
    ``n_assign = 2`` covers centroid-boundary splits.

    Output: (vec_a, vec_b, cosine), vec_a < vec_b, cosine >= ``min_cosine``,
    restricted to cell-cohabiting candidates.  The exact all-pairs variant
    survives as :func:`embedding_near_dup_pairs_exact` — the recall oracle in
    tests, not a scale path.

    ``target_cell_size`` auto-sizes ``n_centroids`` (:func:`auto_centroids`)
    — the k ∝ N sizing the docstring above REQUIRES is then computed, not
    left to the caller; candidate-pair count stays ~linear in corpus size
    (asserted across two corpus sizes in tests/test_similarity_media.py).
    """
    if target_cell_size is not None:
        n_centroids = auto_centroids(embeddings, target_cell_size)
    idx = assign_cells(embeddings, n_centroids, n_assign).select("vec_id", "cell")
    x, y = idx.alias("x"), idx.alias("y")
    cands = (
        x.join(y, (F.col("x.cell") == F.col("y.cell")) & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    base = quantized(embeddings).where(F.col("nrm") > 0)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("nrm").alias("qnrm")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("nrm").alias("vnrm")
    )
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a", "vec_b", F.expr(_dot("qa", "qb")).alias("dot"), "qnrm", "vnrm"
        )
        .withColumn("cosine", F.expr(_COSINE))
        .where(F.col("cosine") >= min_cosine)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame, min_cosine: float = 0.2
) -> DataFrame:
    """Exact all-pairs near-duplicates — O(N²), the correctness/recall
    baseline for :func:`embedding_near_dup_pairs`.  Never run this at corpus
    scale; it exists so tests can measure the bucketed variant's recall."""
    base = quantized(embeddings).where(F.col("nrm") > 0)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"), F.col("nrm").alias("qnrm")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"), F.col("nrm").alias("vnrm")
    )
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.expr(_dot("qa", "qb")).alias("dot"), "qnrm", "vnrm"
        )
        .withColumn("cosine", F.expr(_COSINE))
        .where(F.col("cosine") >= min_cosine)
        .select("vec_a", "vec_b", "cosine")
    )


def ivf_recall(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Per-query recall@k audit of the IVF index against the exact
    brute-force baseline — the quality dial every ANN deployment
    monitors before widening/narrowing ``nprobe``: how many of
    :func:`cosine_topk`'s true top-k does :func:`ivf_topk` return with
    the same parameters?  Both sides rank by the identical quantized
    cosine, so any miss is attributable to the probe set alone (the
    recall-loss-is-only-the-probe-set law the IVF design rests on).

    Scale shape: a pure composition — two already-bounded top-k plans
    (k rows per query each) joined on (query_id, vec_id) and counted;
    nothing beyond the k·n_queries result rows ever shuffles here.
    At 100 TB this runs on a query SAMPLE (n_queries bounds the cost)
    exactly as recall is estimated in production ANN systems.

    Output: (query_id, n_exact, hits, recall_bp) — recall in floor-
    divided basis points, one row per query with an exact result.
    """
    exact = cosine_topk(embeddings, n_queries=n_queries, k=k).select(
        "query_id", "vec_id"
    )
    approx = ivf_topk(
        embeddings, n_queries=n_queries, k=k,
        n_centroids=n_centroids, nprobe=nprobe,
    ).select("query_id", "vec_id")
    n_exact = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    hits = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("hits"))
    )
    return (
        n_exact.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.expr(
                "(10000 * coalesce(hits, 0)) div n_exact"
            ).cast("long").alias("recall_bp"),
        )
    )
