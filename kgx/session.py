"""SparkSession factory with scale-oriented defaults.

Used by tests and benchmarks; production runs pass their own session from
``spark-submit``.  Every setting here is cluster-safe — the same config block
is what we'd ship in ``spark-defaults.conf`` for a 1000-executor job:

- AQE on (runtime coalescing + skew-join splitting) — the heavy-tail doc-size
  distribution makes static partition sizing wrong at 100 TB.
- Arrow batch size bounded so a batch of 1 MB documents doesn't blow the
  Python worker (10k rows x 1 MB would be 10 GB per batch otherwise).
- Shuffle partitions default to 2x cores locally; on a real cluster AQE
  coalesces from ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``
  downward, so oversizing is safe and undersizing is not.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _default_driver_mem() -> str:
    """Half of physical RAM, capped at 24g, floored at the historical 8g
    default (the floor only bends below 8g on hosts that physically lack
    8 GB, where the old fixed value could never have been honored anyway).
    Falls back to 8g when RAM can't be probed.  Big heaps help the persisted
    materialization; the 8g floor prevents a silent regression on mid-size
    hosts (e.g. 12 GB boxes) that ran fine at the old fixed 8g."""
    try:
        total_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "8g"
    half = int(total_gb // 2)
    if total_gb >= 8:
        return f"{min(24, max(8, half))}g"
    return f"{max(2, half)}g"


def get_spark(
    app_name: str = "kgx",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 1024,
) -> SparkSession:
    cores = default_parallelism()
    master = master or os.environ.get("KGX_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("KGX_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("KGX_COMMITTER_V2") == "1":
        # OPT-IN ONLY: v2 task commit moves output files as tasks finish, so
        # job commit is O(partition dirs) instead of serial driver renames —
        # but task commit is NOT atomic (deprecated in Hadoop 3.x,
        # MAPREDUCE-7282): a task retried mid-commit can leave duplicate or
        # partial files, and the lineage-based resume in kgx.plans.pipeline
        # would then treat a partially-written bucket dir as complete.  The
        # default stays the atomic v1 committer; on object stores use a
        # cloud-native committer (magic/S3A, GCS flush) instead of v2.
        builder = builder.config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    return builder.getOrCreate()
