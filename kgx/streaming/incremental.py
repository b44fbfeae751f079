"""Incremental ingest via Structured Streaming.

The reference has no real-time path (readme.md:643 "No real-time graph
updates"); its update endpoint re-extracts the whole concatenated document
per request (main.py:202-285).  Because every kgx stage is a pure
``DataFrame -> DataFrame`` function, the same code runs incrementally: a
file/Iceberg stream of new span rows flows through ``foreachBatch``, which
reuses the batch stages verbatim and appends to the same output tables with
per-batch lineage.

``Trigger.AvailableNow`` gives catch-up batch semantics (process everything
pending, then stop) — the right shape for scheduled incremental crawls;
switch to a processing-time trigger for continuous tailing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.operators import extract, spans as spans_op
from kgx.sources.docs import SPAN_FIELDS


def docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of (doc_id, spans) parquet drops."""
    schema = f"doc_id string, spans array<struct<{SPAN_FIELDS}>>"
    return spark.readStream.schema(schema).parquet(input_dir)


def start_incremental(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    available_now: bool = True,
):
    """Stream docs → extraction → append nodes/edges/triples tables.

    Returns the StreamingQuery.  Checkpoint lives under ``out_dir`` so a
    restarted stream resumes from the last committed source offsets — the
    streaming twin of the batch lineage protocol.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        graphs = extract.extract_graphs(spans_op.with_doc_text(batch_df))
        graphs = graphs.withColumn("batch_id", F.lit(batch_id)).cache()
        try:
            for name, fn in (
                ("nodes", extract.nodes_table),
                ("edges", extract.edges_table),
                ("triples", extract.triples_table),
            ):
                fn(graphs).write.mode("append").parquet(os.path.join(out_dir, name))
            # per-batch lineage row (docs/triples counts + batch id)
            graphs.groupBy("batch_id").agg(
                F.count("*").alias("docs"),
                F.sum(F.size("triples")).alias("triples"),
            ).write.mode("append").parquet(os.path.join(out_dir, "stream_lineage"))
        finally:
            graphs.unpersist()

    writer = (
        docs_stream(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_ingest_metrics(
    stream: DataFrame,
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed ingest metrics with a late-data watermark.

    Input: any streaming DataFrame with ``event_ts timestamp`` and ``spans``
    columns (e.g. the docs stream joined with crawl timestamps).  Output per
    closed window: doc count, span count, media-span count.

    The watermark bounds state: windows older than ``max(event_ts) -
    watermark`` are finalized and evicted, and rows arriving later than that
    are DROPPED — the crawl-ingest contract for out-of-order fetchers.  In
    append output mode a window emits exactly once, when the watermark
    passes its end — this is what makes the metrics table append-only and
    idempotent downstream (each window row is immutable once written).
    State per executor is O(open windows), independent of stream length.
    """
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window_len).alias("win"))
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.size("spans")).alias("spans"),
            F.sum(
                F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media")))
            ).alias("media_spans"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "docs",
            "spans",
            "media_spans",
        )
    )


def sessionized_stream(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`kgx.operators.temporal.sessionize` — the
    same native ``session_window`` aggregate with an event-time watermark.

    In append mode a session emits exactly once, when the watermark passes
    its end (last event + gap); state per executor is O(open sessions) —
    the watermark closes and evicts idle sessions, so a long-running crawl
    never accumulates state.  Output matches the batch operator's
    ``(key, session_start, session_end, n_events)`` (the global per-key
    ``session_id`` numbering is batch-only: a stream cannot renumber
    history).
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# incremental export-manifest maintenance (streaming twin of packing)
# ---------------------------------------------------------------------------


def start_manifest_maintenance(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    n_shards: int = 8,
    available_now: bool = True,
):
    """Maintain per-shard export manifests over a (doc_id, text) stream.

    Every manifest column (kgx.operators.packing.shard_manifest) is a
    MERGEABLE aggregate — counts, token/char sums, and the
    order-independent doc-set checksum (an associative bigint sum) — so
    maintenance needs no read-modify-write of a global table: each
    micro-batch appends its per-shard DELTA rows (``n_shards`` tiny rows,
    written into a ``batch_id=`` partition with dynamic partition overwrite
    so an at-least-once foreachBatch retry rewrites the same partition
    instead of double-counting), and the live manifest is the groupBy-sum
    over deltas (:func:`current_shard_manifest`).  At 100 TB ingest the hot
    path touches only the batch and n_shards rows; delta compaction is
    optional and offline.  Streaming == batch equality is asserted by
    tests/test_streaming_versions.py.
    """
    from kgx.operators import packing

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = packing.shard_manifest(batch_df, n_shards).withColumn(
            "batch_id", F.lit(batch_id)
        )
        (
            delta.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "manifest_deltas"))
        )

    stream = (
        spark.readStream.schema("doc_id bigint, text string").parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_manifest_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def current_shard_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    """The live manifest: merge all committed deltas (sum of mergeable
    aggregates per shard)."""
    deltas = spark.read.parquet(os.path.join(out_dir, "manifest_deltas"))
    return deltas.groupBy("shard").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("checksum").alias("checksum"),
    )


def start_sketch_maintenance(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str,
    distinct_expr: str,
    freq_expr: str,
    m: int = 64,
    depth: int = 4,
    width: int = 256,
    member_expr: str | None = None,
    m_bits: int = 65536,
    bloom_k: int = 4,
    hist_expr: str | None = None,
    available_now: bool = True,
):
    """Maintain HLL + count-min sketches over an event stream — the
    monitoring pass a 100 TB ingest runs beside the pipeline (live distinct
    counts and heavy-hitter frequencies without ever re-scanning history).

    Same delta stance as :func:`start_manifest_maintenance`: both sketch
    register tables are MERGEABLE (HLL: element-wise max; count-min:
    element-wise sum), so each micro-batch appends only its tiny delta
    rows — ≤ m and ≤ depth × width per batch — into a ``batch_id=``
    partition with dynamic partition overwrite (an at-least-once
    foreachBatch retry rewrites the same partition instead of
    double-counting), and :func:`current_sketches` is a groupBy max/sum
    over deltas.  Streaming == batch equality asserted by
    tests/test_streaming_versions.py.

    ``member_expr`` additionally maintains the Bloom MEMBERSHIP bitmap
    (kgx.operators.sketches.bloom_registers; merge = element-wise
    ``bit_or``, ≤ m_bits/32 delta rows per batch) — the live
    decontamination screen: probe any candidate against
    :func:`current_bloom` without re-scanning history.  ``hist_expr``
    likewise maintains the log2 DISTRIBUTION histogram (sum-merge, ≤65
    delta rows per batch) — live drift monitoring via
    :func:`current_hist`.
    """
    from kgx.operators import sketches

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        hll = sketches.hll_registers(batch_df, distinct_expr, m).withColumn(
            "batch_id", F.lit(batch_id)
        )
        cm = sketches.cm_registers(batch_df, freq_expr, depth, width).withColumn(
            "batch_id", F.lit(batch_id)
        )
        outputs = [(hll, "hll_deltas"), (cm, "cm_deltas")]
        if member_expr is not None:
            bl = sketches.bloom_registers(
                batch_df, member_expr, m_bits, bloom_k
            ).withColumn("batch_id", F.lit(batch_id))
            outputs.append((bl, "bloom_deltas"))
        if hist_expr is not None:
            hg = sketches.hist_registers(batch_df, hist_expr).withColumn(
                "batch_id", F.lit(batch_id)
            )
            outputs.append((hg, "hist_deltas"))
        for delta, sub in outputs:
            (
                delta.coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(out_dir, sub))
            )

    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_sketch_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def current_sketches(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The live sketches: (hll_registers, cm_registers) merged over all
    committed deltas with each table's merge law."""
    hll = (
        spark.read.parquet(os.path.join(out_dir, "hll_deltas"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    cm = (
        spark.read.parquet(os.path.join(out_dir, "cm_deltas"))
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return hll, cm


def current_bloom(spark: SparkSession, out_dir: str) -> DataFrame:
    """The live Bloom bitmap: bloom_deltas merged with the bitmap's merge
    law (element-wise ``bit_or`` — identical to how a second cluster's
    registers would fold in)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "bloom_deltas"))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )


def current_hist(spark: SparkSession, out_dir: str) -> DataFrame:
    """The live log2 histogram: hist_deltas merged with sum — feed the
    collected rows to kgx.operators.sketches.estimate_quantile."""
    return (
        spark.read.parquet(os.path.join(out_dir, "hist_deltas"))
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
