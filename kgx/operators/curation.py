"""Corpus-curation operators beyond dedup: PII scrubbing, sentence-level
duplication stats, and benchmark-decontamination screening.

These are the remaining standard passes a large-scale training-data pipeline
runs over a web corpus (the reference extractor has no equivalent — it
ingests one trusted document per HTTP request, reference main.py:69-117;
at 10^12 docs the corpus is adversarial and these gates run *before*
extraction):

- :func:`pii_scrub` — regex redaction of emails / SSNs / phone numbers /
  IPv4s with per-category counts (the C4-style "remove lines with PII"
  pass, applied per document).
- :func:`sentence_dedup_stats` — cross-document duplicate-sentence
  detection (CCNet / RefinedWeb style): the per-sentence document
  frequency, aggregated per document.
- :func:`contamination_screen` — n-gram-overlap decontamination against a
  held-out benchmark set (the GPT-3 appendix-C / PaLM 13-gram screen
  shape).

Every operator is built-in Spark SQL functions only (JVM-side, codegen, no
UDFs), with regex constructs restricted to the Java-regex ∩ RE2 common
subset (no lookaround, no backrefs) so the DuckDB oracle replays them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.functions.hashing import spark_md5_60

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) in fixed cascade order.  Patterns use only
#: the Java-regex ∩ RE2 subset; ``\b`` is ASCII-equivalent in both engines.
#: SSN precedes phone so the 3-2-4 digit shape is never half-eaten by a
#: later pass; email precedes IPv4 so a redacted mailbox can't expose a
#: digit-run domain to the address pattern.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IPV4]"),
)

#: Dialect-neutral SQL suffix (Spark SQL ∩ DuckDB: ``||``, ``lpad``,
#: ``cast(.. as string)``, ``%``) that plants deterministic PII in 2 of
#: every 3 documents — the gate-query fixture, since the driver corpus is
#: clean word-salad text.  Kept in ONE string so the engine and the oracle
#: can never drift.
PII_FIXTURE_SUFFIX = (
    "' contact user' || cast(doc_id % 89 as string) || '@mail'"
    " || cast(doc_id % 7 as string) || '.net call 415-'"
    " || lpad(cast((doc_id * 7) % 1000 as string), 3, '0') || '-'"
    " || lpad(cast(doc_id % 10000 as string), 4, '0')"
    " || ' ssn 90' || cast(doc_id % 10 as string) || '-12-'"
    " || lpad(cast((doc_id * 3) % 10000 as string), 4, '0')"
    " || ' from 10.' || cast(doc_id % 256 as string) || '.3.'"
    " || cast(doc_id % 250 as string)"
)


def pii_fixture_expr() -> str:
    """``text`` column expression planting :data:`PII_FIXTURE_SUFFIX` in
    docs with ``doc_id % 3 != 2`` (valid in both Spark SQL and DuckDB)."""
    return (
        f"CASE WHEN doc_id % 3 = 2 THEN text"
        f" ELSE text || {PII_FIXTURE_SUFFIX} END"
    )


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, n_email, n_ssn, n_phone, n_ipv4, n_pii, clean_text).

    Counts are per-pattern matches against the ORIGINAL text (the audit
    number a compliance report wants); ``clean_text`` applies the
    :data:`PII_PATTERNS` replacement cascade in order.  Pure projection:
    zero shuffle, whole-stage codegen, scales linearly with input splits —
    the plan shape this pass must have when it fronts a 100 TB corpus.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    out = documents.select("doc_id", *counts, clean.alias("clean_text"))
    total = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0))
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        total.cast("long").alias("n_pii"),
        "clean_text",
    )


# ---------------------------------------------------------------------------
# sentence-level duplication
# ---------------------------------------------------------------------------

#: sentence splitter shared with the oracle: literal '.' split (the
#: narrative corpus terminates every sentence with '.'), trim, drop empties,
#: lowercase for the identity hash.  Spark regex '[.]' == DuckDB literal '.'.
_SENT_EXPR = (
    "filter(transform(split(text, '[.]'), s -> trim(s)), s -> s != '')"
)


def sentence_dedup_stats(documents: DataFrame) -> DataFrame:
    """Cross-document duplicate-sentence stats (CCNet / RefinedWeb pass).

    For every document: ``n_sentences``, ``n_shared`` (sentences whose
    normalized form appears in more than one distinct document) and
    ``shared_ratio``.  This is the detection half of sentence-level dedup;
    a removal pass keeps the first global occurrence of each sentence.

    Scale shape: sentences collapse to 60-bit hashes before any exchange,
    so both shuffles (the document-frequency aggregation and the hash
    equi-join back to instances) carry ``(bigint, bigint)`` rows — never
    text.  Hot sentences ("click here to subscribe") concentrate on one
    key only inside the tiny ``df``-per-hash aggregate, not the join
    (instances stay spread across their documents' partitions), and AQE
    handles residual skew.
    """
    inst = documents.select(
        "doc_id", F.explode(F.expr(_SENT_EXPR)).alias("sentence")
    ).select("doc_id", F.expr(spark_md5_60("lower(sentence)")).alias("h"))
    df_per_h = inst.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        inst.join(df_per_h, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_sentences",
            "n_shared",
            (F.col("n_shared") / F.col("n_sentences")).alias("shared_ratio"),
        )
    )


def sentence_prune(documents: DataFrame, materialize: bool = False) -> DataFrame:
    """Keep-first-occurrence sentence-level dedup — the removal half of the
    CCNet pass (:func:`sentence_dedup_stats` is the detection half).

    Every distinct normalized sentence keeps exactly ONE instance corpus-wide:
    the occurrence with the smallest ``(doc_id, idx)`` order key.  Output per
    document: ``(doc_id, n_sentences, n_kept, pruned_text)`` where
    ``pruned_text`` re-joins the surviving sentences in original order with
    ``'. '``.

    Scale shape — text never crosses an exchange: the explode projects the
    sentence away immediately (keeping only ``(doc_id, idx, h)`` bigints), the
    first-occurrence aggregate and the keep-key join shuffle pure bigints, and
    the surviving 0-based index *array* joins back to the one-row-per-document
    table where a position-aware higher-order ``filter`` rebuilds the text
    map-side.  The only exchange touching text is that final doc_id equi-join.

    ``materialize``: the ``inst`` instance table feeds two plan branches
    (the first-occurrence aggregate and the keep-key join side), so a lazy
    plan runs the sentence-split regex over the corpus text THREE times
    (both branches + the final rebuild); ``True`` pins ``inst`` — pure
    bigints, far smaller than the text — with an eager ``localCheckpoint``,
    cutting the split to the two-pass minimum.  Default OFF, unlike
    minhash_lsh_pairs' analogous shingle-table switch, because the A/B
    measurement splits the other way here: at sf0.1 the lazy plan wins
    (minima 0.31 s vs 0.37 s, alternating 5-round A/B, persisted input) —
    a sentence split over short cached docs is cheaper than the checkpoint
    barrier, whereas the LSH shingle+md5-per-token pass is not.  Flip it on
    for long-document corpora or computed-view inputs, where each extra
    branch re-runs the full text pass.
    """
    sents = F.expr(_SENT_EXPR)
    # order key: doc_id * 2^20 + idx (narrative docs are far below 2^20
    # sentences; documents.doc_id is a bigint) — a single bigint both engines
    # compare identically, avoiding cross-engine struct-ordering semantics.
    inst = documents.select(
        "doc_id", F.posexplode(sents).alias("idx", "sentence")
    ).select(
        "doc_id",
        "idx",
        F.expr(spark_md5_60("lower(sentence)")).alias("h"),
        (F.col("doc_id") * (1 << 20) + F.col("idx")).alias("k"),
    )
    if materialize:
        inst = inst.localCheckpoint(eager=True)
    first = inst.groupBy("h").agg(F.min("k").alias("k_min"))
    kept = (
        inst.join(first, "h")
        .where(F.col("k") == F.col("k_min"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("kept_idx"))
    )
    return (
        documents.select("doc_id", sents.alias("sents"))
        .where(F.size("sents") > 0)
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.size("sents").cast("long").alias("n_sentences"),
            F.coalesce(F.size("kept_idx"), F.lit(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.expr(
                    "filter(sents, (s, i) -> array_contains("
                    "coalesce(kept_idx, array()), i))"
                ),
                ". ",
            ).alias("pruned_text"),
        )
    )


# ---------------------------------------------------------------------------
# stratified corpus sampling
# ---------------------------------------------------------------------------

#: Dialect-neutral stratum fixture for the gate query (the driver corpus is
#: uniformly English, so language is a degenerate stratum; this stands in for
#: the crawl-source/domain column a production corpus carries): 60% web,
#: 20% books, 10% code, 10% wiki.  ONE string shared with the oracle.
DOMAIN_FIXTURE_EXPR = (
    "CASE WHEN doc_id % 10 < 6 THEN 'web'"
    " WHEN doc_id % 10 < 8 THEN 'books'"
    " WHEN doc_id % 10 < 9 THEN 'code'"
    " ELSE 'wiki' END"
)


def balanced_sample(documents: DataFrame, strata: DataFrame | None = None) -> DataFrame:
    """Deterministic balance-to-minority stratified sampling.

    Given a per-document stratum label (default: :func:`language_id
    <kgx.operators.textstats.language_id>` over the corpus), each stratum is
    downsampled toward the SMALLEST stratum's size with a per-stratum keep
    rate in basis points ``rate_bp = min(10000, (10000 * min_count) div
    count)`` — pure bigint arithmetic, so the rate is bit-identical across
    engines.  Selection is the deterministic hash-Bernoulli
    ``md5_60(doc_id) % 10000 < rate_bp`` — reproducible under re-runs,
    restarts, and repartitioning, unlike ``DataFrame.sample`` whose output
    depends on partition layout.

    Returns per-stratum audit stats ``(stratum, n_docs, rate_bp,
    n_sampled)``.  Scale shape: the stratum-size aggregate is tiny (bounded
    by the label vocabulary), rates broadcast back, and the Bernoulli filter
    is a stateless map — no shuffle ever carries text.
    """
    if strata is None:
        from kgx.operators.textstats import language_id

        strata = language_id(documents).select(
            "doc_id", F.col("lang_guess").alias("stratum")
        )
    counts = strata.groupBy("stratum").agg(F.count("*").alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "stratum",
        "n_docs",
        F.expr("least(10000, (10000 * min_n) div n_docs)")
        .cast("long")
        .alias("rate_bp"),
    )
    picked = (
        strata.select(
            "stratum",
            (
                F.expr(spark_md5_60("cast(doc_id as string)")) % 10000
            ).alias("u"),
        )
        .join(F.broadcast(rates.select("stratum", "rate_bp")), "stratum")
        .where(F.col("u") < F.col("rate_bp"))
        .groupBy("stratum")
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    return (
        rates.join(picked, "stratum", "left")
        .select(
            "stratum",
            "n_docs",
            "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_screen(
    documents: DataFrame, bench_mod: int = 19, n: int = 5
) -> DataFrame:
    """n-gram-overlap decontamination screen (GPT-3 appendix C shape).

    The benchmark set is the deterministic slice ``doc_id % bench_mod = 0``
    (standing in for an eval suite; at production it is a real benchmark
    table).  Every OTHER document is scored by the fraction of its distinct
    word ``n``-grams that also occur anywhere in the benchmark set:
    (doc_id, n_shingles, n_contaminated, contamination).

    Scale shape: the benchmark shingle-hash set is bounded by the eval
    suite's size (millions of hashes at worst — eval suites are small by
    construction, unlike the unbounded label tables that forbid broadcast
    in kgx.operators.linking), so it is explicitly broadcast and the scan
    side never shuffles: hash, broadcast-hash-join, partial aggregate per
    doc. Docs with no ``n``-gram (shorter than ``n`` words) are excluded,
    mirroring the guarded shingle expression.
    """
    from kgx.operators.dedup import shingle_table

    sh = shingle_table(documents, n=n)
    bench = (
        sh.where(F.col("doc_id") % bench_mod == 0)
        .select("shingle_hash")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = sh.where(F.col("doc_id") % bench_mod != 0)
    return (
        train.join(F.broadcast(bench), "shingle_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias("contamination"),
        )
    )


def dataset_split(
    documents: DataFrame,
    val_bp: int = 500,
    test_bp: int = 500,
    strat_col: str = "source",
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split audit — the assignment every
    training-data pipeline needs to be REPRODUCIBLE and leakage-free:
    each document's split is a pure function of its id
    (``md5_60(seed|doc_id) % 10000`` against basis-point thresholds), so
    re-runs, backfills, and incremental appends can never move a
    document across the split boundary (the only leakage-safe property
    that matters at 100 TB — a random() split reshuffles on every
    retry).  Hash uniformity makes the split self-stratifying within
    ANY stratum; this query emits the per-``strat_col`` audit that
    verifies it: (stratum, split, n_docs, share_bp) with floor-divided
    basis-point shares per stratum.

    Scale shape: one integer projection + one map-side-combined count
    aggregate on the (stratum, split) key + one AQE-decided join onto
    the per-stratum totals; nothing but pre-combined counter rows ever
    shuffles.  Output rows ≤ 3 × distinct strata.
    """
    from kgx.functions.hashing import seeded

    if val_bp < 0 or test_bp < 0 or val_bp + test_bp > 10000:
        raise ValueError(f"bad split shares val_bp={val_bp} test_bp={test_bp}")
    h = seeded("cast(doc_id as string)", seed, "spark")
    # NULL strata must stay IN the audit (web-crawl metadata is often
    # missing): coalesce to a sentinel before grouping, or the inner
    # equi-join below would silently drop every NULL-stratum document
    assigned = documents.select(
        F.expr(f"coalesce({strat_col}, '(null)')").alias("stratum"),
        F.expr(
            f"CASE WHEN ({h}) % 10000 < {test_bp} THEN 'test' "
            f"WHEN ({h}) % 10000 < {test_bp + val_bp} THEN 'val' "
            f"ELSE 'train' END"
        ).alias("split"),
    )
    counts = assigned.groupBy("stratum", "split").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    totals = counts.groupBy("stratum").agg(
        F.sum("n_docs").cast("long").alias("n_total")
    )
    return counts.join(totals, "stratum").select(
        "stratum",
        "split",
        "n_docs",
        F.expr("(10000 * n_docs) div n_total").cast("long").alias("share_bp"),
    )
