"""spark-submit entry point for KG-embedding training-data prep.

Consumes the triples table a finished jobs/run_pipeline.py run
materialized (never re-extracting — the run_graph_stats stance) and
writes the three training-data tables a node2vec / TransE trainer
consumes::

    spark-submit --py-files dist/kgx.zip jobs/run_embedding_prep.py \\
        --graph /data/kg_out --out /data/kg_training \\
        --walk-length 8 --walks-per-node 4 --window 2 --seed 0

Outputs: ``<out>/walks`` (start_label, walk_id, walk, walk_len — the
deterministic walk corpus, reproducible by (seed, walk_id); uniform
DeepWalk sampling by default, node2vec second-order bias with
``--biased --w-return/--w-near/--w-far``),
``<out>/skipgram_pairs`` (center, context, n_pairs — windowed pair
counts, the node2vec co-occurrence table), ``<out>/training_pairs``
(subj, pred, obj, is_positive — the filtered TransE contrastive set)
and ``<out>/transe_margin`` (the epoch-zero per-predicate energy audit
a trainer logs before its first gradient step, computed from the
training_pairs table it just wrote).  Prints one JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--graph", required=True,
                   help="pipeline --out dir (reads <graph>/triples)")
    p.add_argument("--out", required=True, help="training-data output root")
    p.add_argument("--walk-length", type=int, default=8)
    p.add_argument("--walks-per-node", type=int, default=4)
    p.add_argument("--window", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--negatives-k", type=int, default=2,
                   help="negatives per distinct triple (0 = skip the "
                        "training_pairs table)")
    p.add_argument("--negatives-buckets", type=int, default=64)
    p.add_argument("--embedding-dim", type=int, default=8,
                   help="hash-embedding dims for the transe_margin audit")
    p.add_argument("--embedding-modulus", type=int, default=1024)
    p.add_argument("--biased", action="store_true",
                   help="node2vec second-order biased walks instead of "
                        "the uniform DeepWalk sampler")
    p.add_argument("--w-return", type=int, default=1,
                   help="node2vec return weight (~1/p), --biased only")
    p.add_argument("--w-near", type=int, default=4,
                   help="node2vec distance-1 weight, --biased only")
    p.add_argument("--w-far", type=int, default=2,
                   help="node2vec distance-2 weight (~1/q), --biased only")
    p.add_argument("--master", default=None, help="override (sandbox runs)")
    args = p.parse_args(argv)

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from kgx.operators import graphstats
    from kgx.plans import pipeline
    from kgx.session import get_spark

    spark = (
        get_spark("kgx-embedding-prep", master=args.master)
        if args.master
        else get_spark("kgx-embedding-prep")
    )
    triples = pipeline.read_output(spark, args.graph, "triples")
    # the walk corpus feeds BOTH its own write and the skip-gram pass —
    # persist the bounded (labels + short array) table once
    if args.biased:
        walks = graphstats.node2vec_walks(
            triples,
            length=args.walk_length,
            walks_per_node=args.walks_per_node,
            seed=args.seed,
            w_return=args.w_return,
            w_near=args.w_near,
            w_far=args.w_far,
        )
    else:
        walks = graphstats.random_walks(
            triples,
            length=args.walk_length,
            walks_per_node=args.walks_per_node,
            seed=args.seed,
        )
    walks = walks.persist(StorageLevel.MEMORY_AND_DISK)

    walks.write.mode("overwrite").parquet(args.out + "/walks")
    pairs = graphstats.walk_skipgram_pairs(walks, window=args.window)
    pairs.write.mode("overwrite").parquet(args.out + "/skipgram_pairs")
    if args.negatives_k:
        graphstats.training_pairs(
            triples, k=args.negatives_k, buckets=args.negatives_buckets
        ).write.mode("overwrite").parquet(args.out + "/training_pairs")
        # epoch-zero audit FROM the table just written (never re-deriving
        # the contrastive set — the read_output stance this job opens with)
        graphstats.transe_margin(
            spark.read.parquet(args.out + "/training_pairs"),
            dim=args.embedding_dim,
            modulus=args.embedding_modulus,
        ).write.mode("overwrite").parquet(args.out + "/transe_margin")

    walk_stats = walks.agg(
        F.count("*").alias("n"), F.sum("walk_len").alias("tokens")
    ).collect()[0]
    pair_stats = (
        spark.read.parquet(args.out + "/skipgram_pairs")
        .agg(F.count("*").alias("n"), F.sum("n_pairs").alias("occ"))
        .collect()[0]
    )
    metrics = {
        "walks": int(walk_stats["n"]),
        "walk_tokens": int(walk_stats["tokens"]),
        "walk_length": args.walk_length,
        "walks_per_node": args.walks_per_node,
        "seed": args.seed,
        "biased": bool(args.biased),
        # the bias weights are corpus-determining exactly like seed /
        # walk_length — record them so biased runs are reproducible
        # from the manifest alone
        "walk_weights": (
            {"w_return": args.w_return, "w_near": args.w_near,
             "w_far": args.w_far}
            if args.biased else None
        ),
        "skipgram_pairs_distinct": int(pair_stats["n"]),
        "skipgram_pair_occurrences": int(pair_stats["occ"]),
        "training_pairs": (
            int(spark.read.parquet(args.out + "/training_pairs").count())
            if args.negatives_k
            else 0
        ),
        "transe_preds": (
            int(spark.read.parquet(args.out + "/transe_margin").count())
            if args.negatives_k
            else 0
        ),
    }
    walks.unpersist()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
