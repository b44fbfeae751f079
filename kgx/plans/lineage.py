"""Per-partition lineage + metrics — the checkpoint/resume protocol.

The reference models versioned state with SQLAlchemy ``versions`` rows
(reference database_service.py:35-83); at cluster scale we instead record one
lineage row per *partition bucket* after that bucket's output commits.  A
restarted job anti-joins its input against completed buckets and recomputes
nothing that already landed (north rule: "resumable from checkpoint with
per-partition lineage + metrics").

Schema::

    run_id       string   -- caller-supplied job identifier
    bucket       int      -- pmod(xxhash64(doc_id), n_buckets)
    status       string   -- 'done'
    docs         long     -- documents processed in this bucket
    nodes        long
    edges        long
    triples      long
    started_at   timestamp
    finished_at  timestamp

The lineage table is append-only; the newest 'done' row per bucket wins.
In production this lives in an Iceberg table (atomic appends); the sandbox
fallback is a parquet directory where each append writes new files — both
give atomic per-commit visibility.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, bucket int, status string, docs long, nodes long, "
    "edges long, triples long, started_at timestamp, finished_at timestamp"
)


def lineage_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = lineage_path(out_dir)
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    lin = read_lineage(spark, out_dir)
    return [
        r["bucket"]
        for r in lin.where(F.col("status") == "done").select("bucket").distinct().collect()
    ]


def append_lineage(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    per_bucket: DataFrame,
    started_at: datetime,
) -> None:
    """``per_bucket``: (bucket, docs, nodes, edges, triples)."""
    finished = datetime.now(timezone.utc)
    rows = (
        per_bucket.select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").cast("int"),
            F.lit("done").alias("status"),
            F.col("docs").cast("long"),
            F.col("nodes").cast("long"),
            F.col("edges").cast("long"),
            F.col("triples").cast("long"),
            F.lit(started_at).alias("started_at"),
            F.lit(finished).alias("finished_at"),
        )
    )
    rows.write.mode("append").parquet(lineage_path(out_dir))
