"""Inverted postings and n-gram LM counts (kgx.operators.indexing)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgx.operators import indexing


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat sat on the mat",
                    "the dog sat on the log",
                    "cats are not dogs",
                ],
            }
        )
    )


def test_inverted_postings_tf_df(spark, tiny):
    rows = {(r.token, r.doc_id): (r.tf, r.df)
            for r in indexing.inverted_postings(tiny).collect()}
    assert rows[("the", 1)] == (2, 2)   # tf 2 in doc 1, df 2 (docs 1 and 2)
    assert rows[("the", 2)] == (2, 2)
    assert rows[("cat", 1)] == (1, 1)
    assert ("cats", 3) in rows
    # every (token, doc) pair of the corpus is present at min_df=1
    assert sum(tf for tf, _ in rows.values()) == 6 + 6 + 4


def test_inverted_postings_df_cutoffs(spark, tiny):
    out = indexing.inverted_postings(tiny, min_df=2).select("token").distinct()
    toks = {r.token for r in out.collect()}
    assert toks == {"the", "sat", "on"}  # exactly the cross-doc tokens
    capped = indexing.inverted_postings(tiny, min_df=1, max_df=1)
    assert "the" not in {r.token for r in capped.collect()}


def test_lm_ngram_counts_and_continuation(spark, tiny):
    out = {r.gram: r for r in
           indexing.lm_ngram_counts(tiny, n=3, min_count=1).collect()}
    assert out["the cat sat"].n_occurrences == 1
    assert out["sat on the"].n_occurrences == 2      # docs 1 and 2
    assert out["sat on the"].n_docs == 2
    # continuation of suffix "on the": distinct left contexts = {"sat"}
    assert out["sat on the"].continuation_count == 1
    # suffix "sat on" appears after both "cat" and "dog"
    assert out["the cat sat"].suffix == "cat sat"
    cont = {r.suffix: r.continuation_count for r in
            indexing.lm_ngram_counts(tiny, n=3, min_count=1).collect()}
    assert cont["sat on"] == 2


def test_min_count_prunes_but_continuation_sees_all(spark, tiny):
    """KN continuation counts come from the UNPRUNED gram table."""
    pruned = {r.gram: r for r in
              indexing.lm_ngram_counts(tiny, n=3, min_count=2).collect()}
    assert list(pruned) == ["sat on the"]
    # its continuation count still reflects every context in the corpus
    assert pruned["sat on the"].continuation_count == 1


def test_short_docs_produce_no_grams(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["one two", ""]})
    )
    assert indexing.lm_ngram_counts(docs, n=3, min_count=1).count() == 0
