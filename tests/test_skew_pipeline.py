"""Heavy-tail skew: the salted pipeline must stay correct (and balanced)
when 10% of documents are 10x longer."""

import shutil
import tempfile

from pyspark.sql import functions as F

from kgx.plans import pipeline
from kgx.sources import corpus, docs as docs_src


def test_pipeline_on_heavy_tail_corpus(spark, sf_dir):
    documents = corpus.heavy_tail(docs_src.load_documents(spark, sf_dir))
    narrative = corpus.narrative_documents(documents)
    docs = docs_src.spans_table(narrative)

    # tail docs really are ~10x heavier
    lens = (
        narrative.select(
            (F.col("doc_id") % 10 == 0).alias("is_tail"), F.length("text").alias("n")
        )
        .groupBy("is_tail")
        .agg(F.avg("n"))
        .collect()
    )
    by_tail = {bool(r[0]): r[1] for r in lens}
    assert by_tail[True] > 5 * by_tail[False]

    out = tempfile.mkdtemp(prefix="kgx_skew_")
    try:
        m = pipeline.run(
            spark,
            docs,
            pipeline.PipelineConfig(out_dir=out, n_buckets=16, validate=True),
        )
        assert m["docs"] == documents.count()
        assert m["triples"] > 0
        # no bucket starves or hoards: docs spread within a sane band
        lineage = spark.read.parquet(f"{out}/lineage")
        per = [r["docs"] for r in lineage.collect()]
        assert len(per) == 16 and min(per) > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
