"""Custom stateful streaming operator: cross-batch exactly-once dedup.

``applyInPandasWithState`` is the escape hatch for stateful semantics the
built-in streaming operators can't express.  Here: admit each document
fingerprint exactly once across ALL micro-batches (an incremental crawl
keeps re-seeing the same pages; the KG must not re-extract them).

State layout: one group per fingerprint shard (``pmod(xxhash64(fp), N)``),
state value = the sorted list of fingerprints already admitted in that
shard.  Sharding keeps every state row bounded and spreads state across
partitions — the same bucketing discipline as the batch pipeline.  State is
checkpointed by the engine, so a restarted query continues deduping against
everything admitted before the restart.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, fingerprint string, shard int"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        for doc_id, fp in zip(pdf["doc_id"], pdf["fingerprint"]):
            if fp not in seen:
                seen.add(fp)
                out.append((doc_id, fp, key[0]))
    state.update((sorted(seen),))
    if out:
        yield pd.DataFrame(out, columns=["doc_id", "fingerprint", "shard"])


def streaming_dedup(docs_stream: DataFrame, n_shards: int = 32) -> DataFrame:
    """(doc_id, fingerprint) stream → first-seen rows only, across batches
    and across restarts (state lives in the checkpoint)."""
    sharded = docs_stream.withColumn(
        "shard", F.pmod(F.xxhash64("fingerprint"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
