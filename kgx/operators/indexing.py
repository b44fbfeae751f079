"""Text indexing: inverted postings and n-gram language-model counts.

The retrieval-side companions to the ANN family (kgx.operators.similarity):
an inverted token index is how a 100 TB corpus serves keyword/BM25-style
retrieval next to embedding search, and n-gram count tables (with
Kneser-Ney continuation counts) are the statistical-LM prep a data
pipeline exports for perplexity filtering and infini-gram-style lookups.
The reference extractor has none of this (single-document HTTP service) —
north-star NEW operators.

Everything is flat-schema built-in aggregates: tokens explode once, then
groupBy with map-side partial aggregation, so the shuffle carries
pre-combined (token[, doc]) counts — hot tokens collapse locally exactly
like vocab_topk (kgx.operators.textstats).  A production index would add a
df cutoff (stop tokens dominate postings; ``min_df``/``max_df`` mirror the
dedup family's hot-shingle guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.operators.textstats import TOKENS_EXPR


def _doc_tokens(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("token")
    )


def inverted_postings(
    documents: DataFrame, min_df: int = 1, max_df: int | None = None
) -> DataFrame:
    """One posting row per (token, doc_id): term frequency plus the token's
    document frequency.  ``min_df``/``max_df`` bound the posting lists the
    way the dedup family bounds hot shingles (a stop token's posting list is
    |corpus|-long and retrieval-useless).

    Output: (token, doc_id, tf, df) — flat, deterministic, shuffled only on
    pre-combined (token, doc_id) counts.
    """
    tf = _doc_tokens(documents).groupBy("token", "doc_id").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_ = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    df_ = df_.where(F.col("df") >= min_df)
    if max_df is not None:
        df_ = df_.where(F.col("df") <= max_df)
    return tf.join(df_, "token").select("token", "doc_id", "tf", "df")


def lm_ngram_counts(documents: DataFrame, n: int = 3, min_count: int = 2) -> DataFrame:
    """N-gram LM count table with Kneser-Ney continuation counts.

    Per surviving n-gram (space-joined): total occurrences, document
    frequency, and the continuation count of its (n-1)-suffix — the number
    of DISTINCT left contexts the suffix appears with, the numerator of the
    Kneser-Ney lower-order distribution.  ``min_count`` prunes the long
    tail before anything wide shuffles (the standard count-cutoff).

    Output: (gram, n_occurrences, n_docs, suffix, continuation_count).
    """
    grams = documents.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size({TOKENS_EXPR}) < {n} THEN array() "
                f"ELSE transform(sequence(1, size({TOKENS_EXPR}) - {n - 1}), "
                f"i -> array_join(slice({TOKENS_EXPR}, i, {n}), ' ')) END"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    ).where(F.col("n_occurrences") >= min_count)
    # continuation counts run over the UNPRUNED gram table: KN counts
    # distinct left contexts of the suffix, regardless of each context's own
    # frequency
    suffixed = grams.select(
        F.expr("substring_index(gram, ' ', 1)").alias("ctx"),
        F.expr(f"substring(gram, length(substring_index(gram, ' ', 1)) + 2)").alias(
            "suffix"
        ),
    )
    cont = suffixed.groupBy("suffix").agg(
        F.countDistinct("ctx").cast("long").alias("continuation_count")
    )
    out = counts.withColumn(
        "suffix",
        F.expr("substring(gram, length(substring_index(gram, ' ', 1)) + 2)"),
    )
    return out.join(cont, "suffix").select(
        "gram", "n_occurrences", "n_docs", "suffix", "continuation_count"
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1_centi: int = 120,
    b_centi: int = 75,
    materialize: bool = True,
) -> DataFrame:
    """Top-k documents for a keyword query under fixed-point BM25 — the
    retrieval pass a targeted-data-selection pipeline runs over the
    inverted index (e.g. "pull the k most domain-relevant docs for this
    term set" before fine-tune mixing).

    Engine-neutral by construction: every quantity is a BIGINT and every
    division is an explicit floor division (Spark ``div`` == DuckDB ``//``
    on non-negative operands), so the DuckDB oracle replays the score
    bit-for-bit — the same discipline as the integer PageRank and the
    quantized ANN dot products.  Two deliberate quantizations versus
    textbook BM25 (Robertson/Okapi):

    - **idf**: ``length(bin(N div df))`` = floor(log2(N/df)) + 1 — the
      log2-bit-length idf (exact integer; the HLL rho / log2-histogram
      arithmetic), monotone non-increasing in df.
    - **tf saturation + length normalization**: with k1 = k1_centi/100,
      b = b_centi/100, avgdl = T/N (T = corpus token count), the real-valued
      term ``tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)`` is evaluated as
      one bigint ratio by multiplying numerator and denominator through by
      10000·T, then milli-scaled:

          contrib_milli = (1000·idf_bits·tf·(100+K)·100·T)
                      div (10000·T·tf + K·(100−B)·T + K·B·dl·N)

      (K = k1_centi, B = b_centi).  Bigint headroom: the numerator is
      ≈ 2.2e9·tf·T at default K with idf_bits ≤ 20, overflowing int64
      once tf·T ≳ 4e9 — beyond that substitute the reduced pair
      (N/g, T/g), g = gcd(N, T), into the length-norm term (the norm
      depends only on the RATIO N/T; idf keeps the true N), and/or drop
      the 1000× milli scale — the score ORDER is unchanged either way.

    Plan shape (the 100 TB story): the token explode is filtered to the
    query terms BEFORE any aggregation, so tf/df shuffles carry only
    matching postings; corpus scalars (N, T) aggregate from the SAME
    per-doc length projection the scorer joins (one expression, two
    bounded branches) and ride in on a broadcast one-row cross join; the
    final top-k is ``orderBy().limit(k)`` — Spark's
    TakeOrderedAndProject, a per-partition heap + driver merge of k rows,
    never a global sort.

    ``materialize`` (default on — the multi-branch stance of
    :func:`kgx.operators.dedup.jaccard_pairs`): the per-term tf table
    feeds TWO plan branches (the df aggregate and the scoring join), and
    a lazy plan re-runs the corpus-wide token explode per branch — the
    dominant cost.  The eager ``localCheckpoint`` pins it to one pass;
    the pinned table is (token, doc_id, tf) for the query terms only, so
    its size is bounded by the matched postings.  Measured at sf0.1
    (alternating 3-round A/B, warmed, local[8]): 1.20/0.90/1.66 s pinned
    vs 1.27/0.92/4.65 s lazy — ordered in the checkpoint's favor every
    round, and the gap grows with document length (the lazy plan replays
    the full-corpus explode).  An ad-hoc query recomputes postings from
    text by design — a standing retrieval deployment feeds this scorer
    from a materialized :func:`inverted_postings` table instead.

    Output: (doc_id, score_milli, n_terms, rank) — rank 1..k by
    (score_milli DESC, doc_id) — deterministic total order.
    """
    from pyspark.sql import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if not (k > 0 and k1_centi >= 0 and 0 <= b_centi <= 100):
        raise ValueError("need k > 0, k1_centi >= 0, 0 <= b_centi <= 100")
    K, B = int(k1_centi), int(b_centi)
    tf = (
        _doc_tokens(documents)
        .where(F.col("token").isin([str(t) for t in query_terms]))
        .groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    if materialize:
        tf = tf.localCheckpoint(eager=True)
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    dl = documents.select(
        "doc_id", F.expr(f"cast(size({TOKENS_EXPR}) as bigint)").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    contrib = (
        tf.join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c",
            F.expr(
                f"(1000L * cast(length(bin(n_docs div df)) as bigint) * tf"
                f" * {100 + K}L * 100L * total_tokens) div"
                f" (10000L * total_tokens * tf"
                f" + {K * (100 - B)}L * total_tokens"
                f" + {K * B}L * dl * n_docs)"
            ),
        )
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("score_milli"),
        F.count("*").cast("long").alias("n_terms"),
    )
    topk = per_doc.orderBy(F.desc("score_milli"), F.asc("doc_id")).limit(k)
    # rank over the k surviving rows only (bounded single-partition window)
    w = Window.orderBy(F.desc("score_milli"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def unigram_surprisal(
    documents: DataFrame, materialize: bool = False
) -> DataFrame:
    """Per-document mean unigram surprisal in (quantized) bits — the
    perplexity-style quality screen of CCNet/RedPajama run with the
    corpus's OWN unigram statistics instead of a trained LM: documents
    made of corpus-common tokens score low (boilerplate, templates),
    documents of corpus-rare tokens score high (noise, mojibake, exotic
    vocab), and the screen keeps the middle band.

    Engine-neutral bigint arithmetic throughout: a token with corpus count
    ct out of T total tokens gets ``surprisal_bits = length(bin(T div
    ct))`` = floor(log2(T/ct)) + 1 — the log2-bit-length quantization of
    −log2 p(t) (same arithmetic as the HLL rho and the BM25 idf), and the
    per-doc mean is milli-scaled floor division, so the DuckDB oracle
    replays every score bit-for-bit.

    Plan shape: one token explode feeds (a) the vocab-sized (token, ct)
    count aggregate — whose 1-row sum is T, broadcast back — and (b) the
    scoring join probe side; the count side arrives AQE-decided (vocab
    size is unbounded on the open web, so no forced broadcast hint —
    the alias-dictionary stance).  ``materialize`` pins the exploded
    token table with one eager ``localCheckpoint`` so the explode runs
    once, not twice — but unlike the bm25/jaccard pins the table here is
    CORPUS-scale (every token row) while the replayed work is one cheap
    projection+explode, and the A/B at sf0.1 (alternating 5-round,
    warmed, local[8]) read lazy 0.84/0.64/0.70/0.58/0.58 s vs pinned
    1.06/0.68/0.72/0.63/0.61 s — lazy won every round, so the default
    stays lazy (the pagerank-edge-list stance: measured losers don't
    checkpoint).

    Output: (doc_id, n_tokens, total_bits, mean_milli_bits) — one row per
    document with ≥ 1 token.
    """
    toks = _doc_tokens(documents)
    if materialize:
        toks = toks.localCheckpoint(eager=True)
    ct = toks.groupBy("token").agg(F.count("*").cast("long").alias("ct"))
    total = ct.agg(F.sum("ct").cast("long").alias("t_total"))
    scored = (
        toks.join(ct, "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "bits", F.expr("cast(length(bin(t_total div ct)) as bigint)")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("(1000L * sum(bits)) div count(*)").alias("mean_milli_bits"),
    )
