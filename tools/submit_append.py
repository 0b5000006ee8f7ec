"""spark-submit entry point: merge-free delta ingest into a written index.

    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_append.py --index <runs index dir> \
        --input <delta docs parquet> [--mode chem] [--shards 32] \
        [--positional] [--on-conflict skip]

BM25 runs index (submit_build --runs-index): new docs become extra runs
in the shard dirs, impacts baked at the index's CURRENT avgdl (frozen
Lucene-segment-style; periodic stats refresh = rebuild). Positional
index (--positional, submit_build --positional-index): exact, no stats
caveat. Both paths are atomic + resumable (staged files, per-unit
lineage commits — re-run this script after a crash and it completes the
in-flight batch) and enforce doc_id disjointness (existing ids abort the
ingest, or are dropped with --on-conflict skip). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--mode", default="simple",
                    choices=["simple", "chem", "chem+greek"])
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--positional", action="store_true",
                    help="the index is a positional runs index")
    ap.add_argument("--on-conflict", default="error",
                    choices=["error", "skip"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import index_build as ib

    spark = SparkSession.builder.appName("cer_index_append").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    if args.positional:
        n = ib.append_positional_runs_index(
            spark, args.index, docs, mode=args.mode,
            num_shards=args.shards, on_conflict=args.on_conflict)
        stats = {}
    else:
        # decode/bake at the index's FROZEN bake avgdl (index_meta.json)
        # — the live doc_stats avgdl moves with every append, and baking
        # each batch at a different value breaks the block-max bounds
        _, avgdl = ib.bake_stats(spark, args.index, max_drift=0.5)
        n = ib.append_runs_index(
            spark, args.index, docs, avgdl, mode=args.mode,
            num_shards=args.shards, on_conflict=args.on_conflict)
        stats = {"frozen_avgdl": round(avgdl, 4)}
    print(json.dumps({
        "appended_docs": int(n),
        "elapsed_sec": round(time.time() - t0, 3),
        "index": args.index, **stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
