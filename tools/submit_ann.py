"""spark-submit entry point: build / query the persisted IVF-PQ ANN index.

    zip -r /tmp/cer_for_mti_spark.zip cer_for_mti_spark
    # build: train centroids + codebooks, write codes partitionBy(cell)
    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_ann.py build --input <embeddings parquet> \
        --output <index dir> [--centroids 16] [--m 8] [--ks 16] \
        [--sample 2048] [--store-vectors]
    # append: new vectors encoded with the EXISTING centroids/codebooks
    # (frozen-quantizer contract), atomic + resumable, ids enforced unique
    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_ann.py append --index <index dir> \
        --input <new embeddings parquet> [--on-conflict skip]
    # query: probe cells (partition pruning) + ADC scan (or exact with
    # --flat over the stored-vectors layer)
    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_ann.py query --index <index dir> \
        --queries <parquet with (q_id, q_vec)> [--k 5] [--nprobe 2] [--flat]

Prints one JSON line per build, or per (query, rank) result row.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--centroids", type=int, default=16)
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--ks", type=int, default=16)
    b.add_argument("--sample", type=int, default=2048)
    b.add_argument("--store-vectors", action="store_true")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--commit-mode", default="rename",
                   choices=["rename", "manifest"],
                   help="manifest = object-store-safe commits (copy + "
                        "manifest; readers list committed files only)")
    a = sub.add_parser("append")
    a.add_argument("--index", required=True)
    a.add_argument("--input", required=True,
                   help="parquet with new (vec_id, embedding) rows")
    a.add_argument("--on-conflict", default="error",
                   choices=["error", "skip"])
    a.add_argument("--id-col", default="vec_id")
    a.add_argument("--vec-col", default="embedding")
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet with (q_id, q_vec array)")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--nprobe", type=int, default=2)
    q.add_argument("--flat", action="store_true",
                   help="exact cosine over the stored-vectors layer "
                        "(build --store-vectors) instead of ADC codes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import similarity

    spark = SparkSession.builder.appName("cer_ann").getOrCreate()
    if args.cmd == "build":
        emb = spark.read.parquet(args.input)
        t0 = time.time()
        similarity.write_ann_index(
            emb, args.output, n_centroids=args.centroids, m=args.m,
            ks=args.ks, sample_size=args.sample,
            store_vectors=args.store_vectors,
            id_col=args.id_col, vec_col=args.vec_col,
            commit_mode=args.commit_mode,
        )
        print(json.dumps({
            "index": args.output, "n_centroids": args.centroids,
            "m": args.m, "ks": args.ks,
            "elapsed_sec": round(time.time() - t0, 3),
        }))
    elif args.cmd == "append":
        emb = spark.read.parquet(args.input)
        t0 = time.time()
        n = similarity.append_ann_index(
            spark, args.index, emb, id_col=args.id_col,
            vec_col=args.vec_col, on_conflict=args.on_conflict,
        )
        print(json.dumps({
            "index": args.index, "appended_vectors": int(n),
            "elapsed_sec": round(time.time() - t0, 3),
        }))
    else:
        queries = spark.read.parquet(args.queries)
        if args.flat:
            out = similarity.ivf_topk_from_index(
                spark, args.index, queries, k=args.k, nprobe=args.nprobe
            )
            score_col = "cosine"
        else:
            out = similarity.ann_topk_from_index(
                spark, args.index, queries, k=args.k, nprobe=args.nprobe
            )
            score_col = "adc_score"
        for r in out.orderBy("q_id", "rank").collect():
            print(json.dumps({
                "q_id": r["q_id"], "rank": r["rank"],
                "vec_id": r["vec_id"], "score": r[score_col],
            }))
    spark.stop()


if __name__ == "__main__":
    main()
