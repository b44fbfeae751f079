"""Entity linking & canonicalization (north-star NEW operators).

The reference never merges entities across documents — node ids are per-doc
(reference models.py:49-68).  At 10^12-doc scale the same real-world entity
surfaces under many labels ("Acme Corporation", "Acme Corp", "Acme Inc"), so
the north star adds:

1. alias-dictionary candidates — broadcast equi-join on normalized stems
   (SURVEY §2.5 JN4)
2. MinHash-LSH similarity candidates over character shingles
   (SURVEY §2.5 JN5; pyspark.ml MinHashLSH, seeded → deterministic)
3. connected-components merge over the candidate edge list via the
   large-star/small-star algorithm (Kiveris et al., "Connected Components in
   MapReduce and Beyond") — pure DataFrame self-joins + aggregations with
   ``localCheckpoint`` per round to truncate lineage; converges in
   O(log n) rounds, no GraphFrames dependency
4. content-derived canonical ids (sha2 of the component-minimum label) —
   stable across runs/partitions, never ``monotonically_increasing_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: org-suffix vocabulary used by the deterministic alias normalizer; matches
#: the corpus generator's org name shapes plus common real-world suffixes.
ORG_SUFFIXES = (
    "corporation", "corp", "incorporated", "inc", "systems", "ltd", "llc", "company", "co",
)

_SUFFIX_RX = r"\s+(?:" + "|".join(ORG_SUFFIXES) + r")\.?$"


def normalized_stem(col):
    """lower → strip one trailing org suffix → collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, _SUFFIX_RX, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def distinct_labels(nodes: DataFrame) -> DataFrame:
    """(doc_id, node_id, label, ...) → one row per distinct label string.
    This is the dedup that makes linking scale: downstream joins operate on
    |unique labels| (≪ |nodes| at corpus scale)."""
    return nodes.select("label").distinct()


def alias_edges(labels: DataFrame) -> DataFrame:
    """Alias-dictionary candidate edges: labels sharing a normalized stem.

    The stem dictionary is derived from the label set itself and joined via
    broadcast (it is tiny relative to the corpus — bounded by unique entity
    names).  Output: (src_label, dst_label) undirected candidate pairs with
    src < dst.
    """
    stems = labels.select("label", normalized_stem(F.col("label")).alias("stem"))
    a, b = stems.alias("a"), stems.alias("b")
    return (
        a.join(F.broadcast(b), (F.col("a.stem") == F.col("b.stem")) & (F.col("a.label") < F.col("b.label")))
        .select(F.col("a.label").alias("src_label"), F.col("b.label").alias("dst_label"))
    )


def minhash_edges(
    labels: DataFrame,
    jaccard_max_distance: float = 0.4,
    num_hash_tables: int = 8,
    shingle_size: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH similarity candidates over character shingles.

    Built-in pyspark.ml pipeline: RegexTokenizer(char) → NGram →
    HashingTF(binary) → MinHashLSH.approxSimilarityJoin.  Deterministic for
    a fixed seed.  Output: (src_label, dst_label, jaccard_distance).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    chars = RegexTokenizer(
        inputCol="padded", outputCol="chars", pattern=".", gaps=False, toLowercase=True
    )
    grams = NGram(n=shingle_size, inputCol="chars", outputCol="shingles")
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    prepared = labels.select(
        "label", F.concat(F.lit("^^"), F.lower("label"), F.lit("$$")).alias("padded")
    )
    # '^^'/'$$' padding guarantees ≥ shingle_size chars, so no empty vectors
    staged = tf.transform(grams.transform(chars.transform(prepared)))
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(staged)
    joined = lsh.approxSimilarityJoin(staged, staged, jaccard_max_distance, distCol="jaccard_distance")
    return joined.where(F.col("datasetA.label") < F.col("datasetB.label")).select(
        F.col("datasetA.label").alias("src_label"),
        F.col("datasetB.label").alias("dst_label"),
        F.col("jaccard_distance"),
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = 2_000_000
) -> DataFrame:
    """(src_label, dst_label) undirected edges → (label, component) where
    ``component`` is the lexicographic minimum label of the component.

    Adaptive strategy (both paths produce identical output):

    - ``|edges| <= driver_threshold``: collect + union-find on the driver.
      A candidate edge list that fits in driver memory gains nothing from
      6 distributed stages per round — this is the same call most
      production CC implementations make.
    - otherwise: large-star/small-star alternation (Kiveris et al.) — two
      shuffles per round, edge set monotonically contracts toward stars,
      ``localCheckpoint`` truncates lineage.  O(log n) rounds, no driver
      materialization, no GraphFrames dependency.
    """
    e = (
        edges.select(
            F.least("src_label", "dst_label").alias("u"),
            F.greatest("src_label", "dst_label").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    if driver_threshold > 0:
        sample = e.limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            return _driver_union_find(edges.sparkSession, sample)

    def _checksum(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev = None
    for _ in range(max_iter):
        # large-star: for every node, attach strictly-larger neighbors to the
        # minimum of (neighborhood ∪ self)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        e = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v"))
            .where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )
        # small-star: attach smaller-or-equal neighbors to the minimum
        directed = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
        mins2 = directed.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            directed.join(mins2, "u")
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .union(directed.join(mins2, "u").select(F.col("m").alias("a"), F.col("u").alias("b")))
            .where(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    # at convergence every edge is (component_min, member)
    members = e.select(F.col("v").alias("label"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("label"), F.col("u").alias("component")).distinct()
    return members.union(roots).distinct()


def _driver_union_find(spark, edge_rows) -> DataFrame:
    """Small-graph path: classic union-find, component = min label."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in edge_rows:
        u, v = row["u"], row["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by label order so the root IS the component minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    out = [(x, find(x)) for x in parent]
    return spark.createDataFrame(out, "label string, component string")


def canonical_map(
    nodes: DataFrame,
    use_minhash: bool = False,
    jaccard_max_distance: float = 0.4,
) -> DataFrame:
    """Full canonicalization: alias (+ optional LSH) candidates → connected
    components → (label, canonical_label, canonical_id).

    ``canonical_id`` is content-derived (sha2 of the canonical label) so it
    is stable across runs and partition layouts.
    Labels that join no component map to themselves.
    """
    labels = distinct_labels(nodes)
    cand = alias_edges(labels)
    if use_minhash:
        cand = cand.unionByName(
            minhash_edges(labels, jaccard_max_distance).select("src_label", "dst_label")
        ).distinct()
    comp = connected_components(cand)
    mapped = labels.join(comp, "label", "left").select(
        "label", F.coalesce("component", "label").alias("canonical_label")
    )
    return mapped.withColumn("canonical_id", F.sha2(F.col("canonical_label"), 256))


def canonical_triples(triples: DataFrame, cmap: DataFrame) -> DataFrame:
    """Rewrite triples through the canonical map (broadcast joins — the map
    is bounded by unique labels) and dedup the result."""
    c = F.broadcast(cmap.select("label", "canonical_label"))
    return (
        triples.join(c.withColumnRenamed("label", "subj").withColumnRenamed("canonical_label", "subj_c"), "subj", "left")
        .join(c.withColumnRenamed("label", "obj").withColumnRenamed("canonical_label", "obj_c"), "obj", "left")
        .select(
            "doc_id",
            F.coalesce("subj_c", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_c", "obj").alias("obj"),
        )
        .dropDuplicates(["doc_id", "subj", "pred", "obj"])
    )
