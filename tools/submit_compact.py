"""spark-submit entry point: offline compaction of written indexes.

    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_compact.py runs --index <runs index dir> [--shards 32]
    spark-submit ... tools/submit_compact.py positional \
        --index <positional runs index dir> [--shards 32]
    spark-submit ... tools/submit_compact.py merged \
        --index <merged index dir> --delta <doc_terms delta dir> \
        --output <new index dir> [--shards 32] [--on-conflict skip] \
        [--rebuild-threshold 0.5]

runs / positional: fold the one-run-per-(term, bucket, batch) layout the
merge-free appends accumulate back to exactly one run per (term, bucket)
— results identical before/after (byte-level for positional, rank-level
for BM25 at the frozen bake avgdl, which `runs` reads from the index's
own doc_stats). merged: index_build.compact_index — streamed doc_terms
deltas merged into the merged-postings layout (auto-upgrades to a
stats-refresh rebuild past the drift threshold). ann: purge tombstoned vectors
(index_build.delete_docs on an ANN index) from the codes/vectors layers.
vacuum: delete data files no committed manifest references (torn PUTs
left by crashed copy-mode appends — manifest-mode indexes only).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("runs")
    r.add_argument("--index", required=True)
    r.add_argument("--shards", type=int, default=None)
    p = sub.add_parser("positional")
    p.add_argument("--index", required=True)
    p.add_argument("--shards", type=int, default=None)
    a = sub.add_parser("ann")
    a.add_argument("--index", required=True)
    v = sub.add_parser("vacuum")
    v.add_argument("--index", required=True)
    m = sub.add_parser("merged")
    m.add_argument("--index", required=True)
    m.add_argument("--delta", required=True)
    m.add_argument("--output", required=True)
    m.add_argument("--shards", type=int, default=None)
    m.add_argument("--on-conflict", default="error",
                   choices=["error", "skip"])
    m.add_argument("--rebuild-threshold", type=float, default=0.5)
    args = ap.parse_args()

    from cer_for_mti_spark.operators import index_build as ib

    if args.cmd == "vacuum":
        # driver-local manifest walk — no SparkSession needed
        t0 = time.time()
        out = {"index": args.index, **ib.vacuum_index(args.index)}
        out["elapsed_sec"] = round(time.time() - t0, 3)
        print(json.dumps(out))
        return

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cer_compact").getOrCreate()
    t0 = time.time()
    if args.cmd == "runs":
        # the FROZEN bake avgdl (index_meta.json), not live doc_stats —
        # re-encoding interleaved runs at a drifted live value would
        # silently change existing docs' impacts
        _, avgdl = ib.bake_stats(spark, args.index)
        before, after = ib.compact_runs_index(spark, args.index, avgdl,
                                              num_shards=args.shards)
        out = {"index": args.index, "runs_before": before,
               "runs_after": after, "frozen_avgdl": round(avgdl, 4)}
    elif args.cmd == "positional":
        from cer_for_mti_spark.operators import phrase as ph

        before, after = ph.compact_positional_runs(spark, args.index,
                                                   num_shards=args.shards)
        out = {"index": args.index, "runs_before": before,
               "runs_after": after}
    elif args.cmd == "ann":
        from cer_for_mti_spark.operators import similarity

        n = similarity.compact_ann_index(spark, args.index)
        out = {"index": args.index, "vectors_purged": int(n)}
    else:
        # merged compaction WRITES a new index: shard count comes from
        # the input index's metadata unless given explicitly
        shards = (args.shards if args.shards is not None
                  else ib.index_num_shards(args.index) or 32)
        n, avgdl = ib.compact_index(
            spark, args.index, args.delta, args.output,
            num_shards=shards, on_conflict=args.on_conflict,
            rebuild_threshold=args.rebuild_threshold)
        out = {"index": args.output, "n_docs": n,
               "avgdl_in_effect": round(avgdl, 4)}
    out["elapsed_sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
