"""spark-submit entry point: BM25 top-k over a written index.

    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_query.py --index <index dir> \
        --query "insulin" --query "chemical binding" \
        [--k 10] [--mode chem] [--shards 32] [--sharded]

Scan-pruned (shard partition pruning + term row-group pushdown); with
--sharded the index dir must be a runs index (submit_build --runs-index)
and scoring runs per (query, doc-range bucket) with bounded task bytes.
Prints one JSON line per (query, rank).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="simple",
                    choices=["simple", "chem", "chem+greek"])
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--sharded", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators import index_build as ib

    spark = SparkSession.builder.appName("cer_bm25_query").getOrCreate()
    ds = spark.read.parquet(f"{args.index}/doc_stats")
    n, avgdl = ib.corpus_stats(ds)
    queries = spark.createDataFrame(
        list(enumerate(args.query)), "query_id int, query string"
    )
    if args.sharded:
        out = bm25.bm25_wand_sharded_from_index(
            spark, args.index, queries, n, avgdl, k=args.k, mode=args.mode,
            num_shards=args.shards,
        )
    else:
        out = bm25.bm25_wand_from_index(
            spark, args.index, queries, n, avgdl, k=args.k, mode=args.mode,
            num_shards=args.shards,
        )
    qtext = dict(enumerate(args.query))
    for r in out.orderBy("query_id", "rank").collect():
        print(json.dumps({
            "query_id": r["query_id"], "query": qtext[r["query_id"]],
            "rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
