"""End-to-end corpus curation job: the standard pre-training data funnel.

The KG pipeline (kgx/plans/pipeline.py) assumes a curated corpus; this job
produces one.  Stage order follows the published pipelines (C4, Gopher
§A.1, RefinedWeb): cheap per-document gates first, corpus-global passes on
the survivors, text rewrites last —

1. **quality gate** — Gopher/C4 composite rules
   (:func:`kgx.operators.textstats.quality_filter`), pure projection.
2. **exact dedup** — keep the min-doc_id copy of byte-identical texts
   (:func:`kgx.operators.dedup.exact_groups`), 60-bit-hash shuffle.
3. **near-dup clusters** — MinHash-LSH pair graph → connected components →
   keep one doc per cluster (:func:`kgx.operators.dedup.near_dup_clusters`).
4. **PII scrub** — redaction cascade rewrite
   (:func:`kgx.operators.curation.pii_scrub`).
5. **sentence prune** — corpus-wide keep-first-occurrence sentence dedup
   (:func:`kgx.operators.curation.sentence_prune`); documents whose every
   sentence was seen elsewhere drop out.

Each stage materializes its survivor set once (persisted (doc_id, text) —
never wider), so the funnel metrics cost no recomputation and downstream
stages reuse the cached survivors.  Output: ``curated/`` parquet (doc_id,
text) plus a one-row ``funnel`` table recording per-stage document counts —
the number a 100 TB curation run reports to its operators.

The reference has no corpus curation (one trusted document per request,
reference main.py:69-117); this job is the batch front door its extractor
never needed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.operators import curation, dedup, textstats


@dataclass
class CurationConfig:
    out_dir: str
    min_tokens: int = 20
    near_dup_threshold: float = 0.5
    scrub_pii: bool = True
    prune_sentences: bool = True
    write: bool = True
    #: extra keyword overrides for the quality gate (max_symbol_ratio etc.) —
    #: prose corpora with short sentences need a looser symbol cap than the
    #: Gopher default, which counts sentence-final periods as symbols.
    quality_kwargs: dict = field(default_factory=dict)


# Shared stage builders — run() (count-instrumented, persisted) and
# funnel_final() (the lazy gate-query/oracle view) compose the SAME stages,
# so the metrics job and the correctness oracle can never drift.

def _stage_quality(documents: DataFrame, cfg: CurationConfig) -> DataFrame:
    passing = textstats.quality_filter(
        documents, min_tokens=cfg.min_tokens, **cfg.quality_kwargs
    ).where("passes").select("doc_id")
    return documents.join(passing, "doc_id", "left_semi")


def _stage_exact(docs: DataFrame) -> DataFrame:
    keep_exact = (
        dedup.exact_groups(docs)
        .where("doc_id = canonical_doc_id")
        .select("doc_id")
    )
    return docs.join(keep_exact, "doc_id", "left_semi")


def _stage_near_dup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    keep_near = (
        dedup.near_dup_clusters(docs, threshold=cfg.near_dup_threshold)
        .where("NOT is_duplicate")
        .select("doc_id")
    )
    return docs.join(keep_near, "doc_id", "left_semi")


def _stage_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, n_pii, text) — scrubbed text plus the per-doc redaction count."""
    return curation.pii_scrub(docs).select(
        "doc_id", "n_pii", F.col("clean_text").alias("text")
    )


def _stage_prune(docs_txt: DataFrame) -> DataFrame:
    return (
        curation.sentence_prune(docs_txt)
        .where("n_kept > 0")
        .select("doc_id", F.col("pruned_text").alias("text"))
    )


#: survivor tables persisted by funnel_final — bounded ((doc_id, text),
#: never wider than the corpus); clear with clear_funnel_cache()
_FUNNEL_CACHE: list[DataFrame] = []


def clear_funnel_cache() -> None:
    while _FUNNEL_CACHE:
        _FUNNEL_CACHE.pop().unpersist()


def funnel_final(
    documents: DataFrame, cfg: CurationConfig, persist: bool = True
) -> DataFrame:
    """The curated corpus as ONE DataFrame (doc_id, text): quality gate →
    exact dedup → near-dup keep-one → PII scrub → sentence prune.  This is
    the gate-query view of :func:`run` — the DuckDB oracle
    (kgx.oracles.curation_funnel_sql) replays the identical five-stage
    composition as CTEs.

    ``persist`` (default on) caches the two survivor-set boundaries that
    the downstream plan references many times — near-dup clustering reads
    its input ~6× (shingles, sizes, signature verify, corpus map-back) and
    sentence prune reads its input 3× (instances, keep-key join, text
    rejoin), so a fully lazy composition re-evaluates the quality+dedup
    chain multiplicatively (measured: minutes instead of seconds at sf0.1).
    Cached tables are (doc_id, text) only; call :func:`clear_funnel_cache`
    when done (mirrors __spark_entry__'s bounded extraction cache)."""
    from pyspark import StorageLevel

    def _mark(df: DataFrame) -> DataFrame:
        if persist:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            _FUNNEL_CACHE.append(df)
        return df

    exact = _mark(_stage_exact(_stage_quality(documents, cfg)))
    docs = _mark(_stage_near_dup(exact, cfg))
    docs_txt = _stage_pii(docs).select("doc_id", "text") if cfg.scrub_pii else docs
    if not cfg.prune_sentences:
        return docs_txt
    return _stage_prune(_mark(docs_txt) if cfg.scrub_pii else docs_txt)


def run(spark: SparkSession, documents: DataFrame, cfg: CurationConfig) -> dict:
    """Run the funnel over ``documents`` (doc_id, text); returns metrics."""
    funnel: dict[str, int] = {"input": documents.count()}

    # 1. quality gate (per-doc projection; survivors via semi join on doc_id)
    docs = _stage_quality(documents, cfg)
    funnel["after_quality"] = docs.count()

    # 2. exact dedup keep-one (persisted: the near-dup stage reads its
    # input ~6x — shingles, sizes, verify, corpus map-back)
    exact = _stage_exact(docs).persist()
    funnel["after_exact_dedup"] = exact.count()

    # 3. near-dup clusters keep-one (runs only on exact-dedup survivors)
    docs = _stage_near_dup(exact, cfg).persist()
    funnel["after_near_dup"] = docs.count()

    # 4. PII scrub (text rewrite)
    if cfg.scrub_pii:
        scrubbed = _stage_pii(docs)
        funnel["pii_redactions"] = int(
            scrubbed.agg(F.coalesce(F.sum("n_pii"), F.lit(0))).collect()[0][0]
        )
        docs_txt = scrubbed.select("doc_id", "text")
    else:
        docs_txt = docs

    # 5. corpus-wide sentence prune (keep-first; fully-pruned docs drop out)
    if cfg.prune_sentences:
        docs_txt = _stage_prune(docs_txt)
    final = docs_txt.persist()
    funnel["final_docs"] = final.count()

    if cfg.write:
        final.write.mode("overwrite").parquet(os.path.join(cfg.out_dir, "curated"))
        spark.createDataFrame([funnel]).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(cfg.out_dir, "funnel")
        )
    exact.unpersist()
    docs.unpersist()
    final.unpersist()
    return funnel
