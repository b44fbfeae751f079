"""End-to-end curation funnel: stage monotonicity, planted-document fates,
and output round-trip (quality gate → exact dedup → near-dup → PII scrub →
sentence prune).  Complements the per-operator tests in test_curation.py /
test_dedup.py by checking the stages compose: each planted document takes
exactly the exit the funnel order implies.

doc_id is bigint throughout (the corpus contract — sentence_prune's
first-occurrence order key is ``doc_id * 2^20 + idx``)."""

import shutil
import tempfile

import pytest

from kgx.plans.curation_pipeline import CurationConfig, run

GOOD = (
    "The research team published their findings on distributed systems. "
    "Results indicate that careful partitioning improves throughput. "
    "The committee approved further funding for the laboratory. "
    "Engineers deployed the new pipeline across several regions. "
    "Every metric improved after the rollout finished last quarter."
)
GOOD2 = (
    "Astronomers observed the distant galaxy through the new telescope. "
    "Measurements confirmed the predicted rotation curve anomaly. "
    "The observatory scheduled follow-up sessions for the winter. "
    "Students analyzed the spectra during the summer program. "
    "A joint paper appeared in the spring conference proceedings."
)
PII_DOC = (
    "Please contact the coordinator at alice@example.com for details. "
    "Her office line is 415-555-2671 and the backup host is 10.0.0.12. "
    "The onboarding packet explains the remaining enrollment steps. "
    "New members should read the safety handbook before the first visit. "
    "Sessions run every weekday morning in the main building."
)


@pytest.fixture(scope="module")
def funnel_result(spark):
    near_dup = GOOD.replace("quarter", "month")  # one-token change: near-dup of GOOD
    rows = [
        (1, GOOD),
        (2, GOOD),  # exact dup of doc 1
        (3, near_dup),  # near-dup of doc 1
        (4, GOOD2),
        (5, PII_DOC),
        (6, "too short"),  # quality-gate kill
        (7, GOOD2),  # exact dup of doc 4
    ]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    out = tempfile.mkdtemp(prefix="kgx_curation_")
    metrics = run(
        spark,
        documents,
        CurationConfig(
            out_dir=out,
            min_tokens=20,
            near_dup_threshold=0.5,
            quality_kwargs={"max_symbol_ratio": 0.2},
        ),
    )
    yield spark, out, metrics
    shutil.rmtree(out, ignore_errors=True)


def test_funnel_counts_monotone_and_exact(funnel_result):
    _, _, m = funnel_result
    assert m["input"] == 7
    assert m["after_quality"] == 6  # doc 6 out
    assert m["after_exact_dedup"] == 4  # docs 2, 7 out
    assert m["after_near_dup"] == 3  # doc 3 out
    assert m["final_docs"] == 3
    assert m["pii_redactions"] >= 3  # email + phone + ip in doc 5
    order = ["input", "after_quality", "after_exact_dedup", "after_near_dup", "final_docs"]
    vals = [m[k] for k in order]
    assert vals == sorted(vals, reverse=True)


def test_curated_output_round_trip(funnel_result):
    spark, out, m = funnel_result
    curated = spark.read.parquet(out + "/curated")
    assert set(curated.columns) == {"doc_id", "text"}
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert ids == {1, 4, 5}
    # PII was scrubbed in the surviving doc-5 text
    d5 = curated.where("doc_id = 5").collect()[0].text
    assert "alice@example.com" not in d5
    assert "415-555-2671" not in d5
    assert "10.0.0.12" not in d5
    # funnel metrics table round-trips with the returned dict
    funnel = spark.read.parquet(out + "/funnel").collect()[0].asDict()
    assert funnel == m


def test_sentence_prune_drops_fully_duplicated_doc(spark):
    # doc 2 consists entirely of doc 1's sentences; threshold 0.9 keeps the
    # near-dup stage out of the way so the prune stage is what removes it
    rows = [(1, GOOD), (2, ". ".join(GOOD.split(". ")[:3]) + ".")]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    m = run(
        spark,
        documents,
        CurationConfig(
            out_dir="/tmp/unused_kgx_curation",
            min_tokens=5,
            near_dup_threshold=0.9,
            scrub_pii=False,
            write=False,
            quality_kwargs={"max_symbol_ratio": 0.2, "min_stop_hits": 0},
        ),
    )
    assert m["after_near_dup"] == 2
    assert m["final_docs"] == 1


def test_funnel_final_matches_run_survivors(spark):
    # the lazy gate view and the counting job agree doc-for-doc
    near_dup = GOOD.replace("quarter", "month")
    rows = [(1, GOOD), (2, GOOD), (3, near_dup), (4, GOOD2), (5, PII_DOC), (6, "too short")]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    from kgx.plans.curation_pipeline import funnel_final

    cfg = CurationConfig(
        out_dir="/tmp/unused_kgx_funnel",
        min_tokens=20,
        near_dup_threshold=0.5,
        write=False,
        quality_kwargs={"max_symbol_ratio": 0.2},
    )
    lazy = {(r.doc_id, r.text) for r in funnel_final(documents, cfg).collect()}
    m = run(spark, documents, cfg)
    assert m["final_docs"] == len(lazy)
    assert {d for d, _ in lazy} == {1, 4, 5}


def test_funnel_plan_reuses_cached_survivors(spark):
    # the funnel plan must read its survivor-set boundaries from cache
    # (InMemoryTableScan) and contain no cartesian anywhere — a fully lazy
    # composition re-evaluates the quality+dedup chain multiplicatively
    from kgx.plans.curation_pipeline import clear_funnel_cache, funnel_final

    rows = [(i, GOOD.replace("research", f"research{i}")) for i in range(8)]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(
        out_dir="", write=False, min_tokens=5,
        quality_kwargs={"max_symbol_ratio": 0.2},
    )
    try:
        df = funnel_final(documents, cfg)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "InMemoryTableScan" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
    finally:
        clear_funnel_cache()


def _resume_cfg(out, **kw):
    base = dict(
        out_dir=out,
        min_tokens=20,
        near_dup_threshold=0.5,
        quality_kwargs={"max_symbol_ratio": 0.2},
        resume=True,
    )
    base.update(kw)
    return CurationConfig(**base)


def test_funnel_resume_skips_committed_stages(spark):
    import shutil as _sh
    import tempfile as _tf

    rows = [(1, GOOD), (2, GOOD), (3, GOOD2), (5, PII_DOC)]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    out = _tf.mkdtemp(prefix="kgx_cur_resume_")
    try:
        m1 = run(spark, documents, _resume_cfg(out))
        from kgx.plans.curation_pipeline import read_stage_lineage

        lin = read_stage_lineage(spark, out)
        assert set(lin) == {"quality", "exact_dedup", "near_dup", "pii"}

        # restart with a POISONED input: every stage is committed, so the
        # restarted run must read only snapshots — if any committed stage
        # recomputed, the poison would surface in the metrics/output
        poisoned = spark.createDataFrame(
            [(9, "totally different text that would change every count")],
            "doc_id long, text string",
        )
        m2 = run(spark, poisoned, _resume_cfg(out))
        for k in ("after_quality", "after_exact_dedup", "after_near_dup",
                  "pii_redactions", "final_docs"):
            assert m2[k] == m1[k], k
        ids = {r.doc_id for r in spark.read.parquet(out + "/curated").collect()}
        assert ids == {1, 3, 5}
    finally:
        _sh.rmtree(out, ignore_errors=True)


def test_funnel_resume_mid_death_converges_to_clean_run(spark):
    import shutil as _sh
    import tempfile as _tf

    rows = [(1, GOOD), (2, GOOD), (3, GOOD2), (5, PII_DOC)]
    documents = spark.createDataFrame(rows, "doc_id long, text string")
    out_clean = _tf.mkdtemp(prefix="kgx_cur_clean_")
    out_resume = _tf.mkdtemp(prefix="kgx_cur_mid_")
    try:
        m_clean = run(spark, documents, _resume_cfg(out_clean))

        # simulate death after near_dup: commit a full run, then erase the
        # pii snapshot+lineage so the restart replays from the near_dup one
        run(spark, documents, _resume_cfg(out_resume))
        import duckdb as _dd

        from kgx.plans.curation_pipeline import (
            _stage_lineage_path,
            _stage_snapshot_path,
        )

        _sh.rmtree(_stage_snapshot_path(out_resume, "pii"))
        lin_dir = _stage_lineage_path(out_resume)
        kept = _dd.sql(
            f"SELECT * FROM '{lin_dir}/*.parquet' WHERE stage <> 'pii'"
        ).df()
        _sh.rmtree(lin_dir)
        import os as _os

        _os.makedirs(lin_dir)
        _dd.sql("SELECT * FROM kept").write_parquet(lin_dir + "/part-0.parquet")

        m2 = run(spark, documents, _resume_cfg(out_resume))
        assert m2 == m_clean
        a = {tuple(r) for r in spark.read.parquet(out_clean + "/curated").collect()}
        b = {tuple(r) for r in spark.read.parquet(out_resume + "/curated").collect()}
        assert a == b
    finally:
        _sh.rmtree(out_clean, ignore_errors=True)
        _sh.rmtree(out_resume, ignore_errors=True)
