"""Structured Streaming incremental ingest + versioned recompute views."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from kgx.plans import versions
from kgx.sources import corpus, docs as docs_src
from kgx.streaming import incremental


def test_streaming_matches_batch(spark, sf_dir):
    narrative = corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    docs = docs_src.spans_table(narrative.limit(60)).cache()
    in_dir = tempfile.mkdtemp(prefix="kgx_stream_in_")
    out_dir = tempfile.mkdtemp(prefix="kgx_stream_out_")
    try:
        # two separate file drops → two micro-batches on catch-up
        part1 = docs.where(F.expr("pmod(xxhash64(doc_id), 2) = 0"))
        part2 = docs.where(F.expr("pmod(xxhash64(doc_id), 2) = 1"))
        part1.write.mode("append").parquet(in_dir)
        q = incremental.start_incremental(spark, in_dir, out_dir)
        q.awaitTermination(120)

        part2.write.mode("append").parquet(in_dir)
        q = incremental.start_incremental(spark, in_dir, out_dir)
        q.awaitTermination(120)

        got = {
            tuple(r)
            for r in spark.read.parquet(os.path.join(out_dir, "triples"))
            .select("doc_id", "subj", "pred", "obj")
            .collect()
        }
        from kgx.operators import extract, spans as spans_op

        want = {
            tuple(r)
            for r in extract.triples_table(
                extract.extract_graphs(spans_op.with_doc_text(docs))
            ).collect()
        }
        assert got == want
        lineage = spark.read.parquet(os.path.join(out_dir, "stream_lineage"))
        assert lineage.agg(F.sum("docs")).collect()[0][0] == 60
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_versioned_views(spark):
    rows = [
        ("d1", "a", "r1", 1),
        ("d1", "b", "r2", 2),
        ("d1", "c", "r3", 3),
        ("d2", "x", "r1", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload string, run_id string, run_seq int")
    latest = {(r["doc_id"], r["payload"]) for r in versions.latest_per_doc(df).collect()}
    assert latest == {("d1", "c"), ("d2", "x")}
    stale = {(r["doc_id"], r["payload"]) for r in versions.retention_delete_set(df, keep=2).collect()}
    assert stale == {("d1", "a")}
    stamped = versions.stamp_run(df.drop("run_id", "run_seq"), "r9", 9)
    assert stamped.select("run_id").distinct().collect()[0][0] == "r9"
