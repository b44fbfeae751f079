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
