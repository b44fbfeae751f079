"""applyInPandasWithState: dedup state survives micro-batches AND restarts."""

import os
import shutil
import tempfile

import pandas as pd

from kgx.streaming import stateful


def _write_batch(spark, in_dir, rows):
    spark.createDataFrame(pd.DataFrame(rows)).write.mode("append").parquet(in_dir)


def _run_catchup(spark, in_dir, out_dir):
    stream = (
        spark.readStream.schema("doc_id string, fingerprint string").parquet(in_dir)
    )
    q = (
        stateful.streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "deduped"))
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_dedup_across_batches_and_restarts(spark):
    in_dir = tempfile.mkdtemp(prefix="st_in_")
    out_dir = tempfile.mkdtemp(prefix="st_out_")
    try:
        _write_batch(
            spark,
            in_dir,
            [
                {"doc_id": "a", "fingerprint": "f1"},
                {"doc_id": "b", "fingerprint": "f2"},
                {"doc_id": "a2", "fingerprint": "f1"},  # dup within batch
            ],
        )
        _run_catchup(spark, in_dir, out_dir)

        # restart with a second drop: f2 repeats (cross-restart state),
        # f3 is new
        _write_batch(
            spark,
            in_dir,
            [
                {"doc_id": "b2", "fingerprint": "f2"},
                {"doc_id": "c", "fingerprint": "f3"},
            ],
        )
        _run_catchup(spark, in_dir, out_dir)

        got = {
            (r["fingerprint"])
            for r in spark.read.parquet(os.path.join(out_dir, "deduped")).collect()
        }
        rows = spark.read.parquet(os.path.join(out_dir, "deduped")).collect()
        assert got == {"f1", "f2", "f3"}
        assert len(rows) == 3  # every fingerprint admitted exactly once
        # deterministic admission: min doc_id within the first batch wins
        admitted = {r["fingerprint"]: r["doc_id"] for r in rows}
        assert admitted["f1"] == "a"

        # bounded-state contract: exactly ONE state row per distinct
        # fingerprint, each holding a single admitted doc_id — read back from
        # the checkpoint with the state-store reader
        state = spark.read.format("statestore").load(os.path.join(out_dir, "_ckpt"))
        srows = state.collect()
        assert len(srows) == 3
        keys = {r["key"]["fingerprint"] for r in srows}
        assert keys == {"f1", "f2", "f3"}
        for r in srows:
            assert r["value"]["groupState"]["admitted_doc"] is not None
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_stateful_dedup_state_stays_linear_in_distinct_keys(spark):
    """Volume check of the O(1)-per-key state contract: two batches with
    heavy duplication (4000 rows, 1500 distinct fingerprints) must leave
    exactly 1500 state rows and admit exactly 1500 outputs."""
    in_dir = tempfile.mkdtemp(prefix="st_vol_in_")
    out_dir = tempfile.mkdtemp(prefix="st_vol_out_")
    try:
        _write_batch(
            spark,
            in_dir,
            [
                {"doc_id": f"d{i:05d}", "fingerprint": f"f{i % 1000:04d}"}
                for i in range(2000)
            ],
        )
        _run_catchup(spark, in_dir, out_dir)
        _write_batch(
            spark,
            in_dir,
            [
                # 500 repeats of batch-1 keys + 500 new keys
                {"doc_id": f"e{i:05d}", "fingerprint": f"f{500 + i % 1000:04d}"}
                for i in range(2000)
            ],
        )
        _run_catchup(spark, in_dir, out_dir)

        out = spark.read.parquet(os.path.join(out_dir, "deduped"))
        assert out.count() == 1500
        assert out.select("fingerprint").distinct().count() == 1500
        state = spark.read.format("statestore").load(os.path.join(out_dir, "_ckpt"))
        assert state.count() == 1500
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
