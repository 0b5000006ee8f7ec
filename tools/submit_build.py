"""spark-submit entry point: build the sharded inverted index.

    zip -r /tmp/cer_for_mti_spark.zip cer_for_mti_spark
    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_build.py --input <docs parquet> --output <index dir> \
        [--mode chem] [--plan spimi] [--shards 32] [--runs-index]

Reads the documents table (doc_id, text, ...), builds doc_stats +
postings with the chosen plan, writes the sharded index (and optionally
the run-level index for bm25_wand_sharded_from_index), prints one JSON
line with corpus stats + timings. The same script serves both cluster
sizes of the north_rule's N-vs-4N run: the executor count comes from
spark-submit flags, not from this code.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", default="simple",
                    choices=["simple", "chem", "chem+greek"])
    ap.add_argument("--plan", default="spimi",
                    choices=["spimi", "narrow", "shuffle"])
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--runs-index", action="store_true",
                    help="also write the run-level index (bucketed, for "
                         "doc-range-sharded query scoring)")
    ap.add_argument("--positional-index", action="store_true",
                    help="also write the positional runs index (for "
                         "doc-range-sharded phrase search)")
    ap.add_argument("--commit-mode", default="rename",
                    choices=["rename", "manifest"],
                    help="manifest = object-store-safe commits for the "
                         "runs/positional indexes (copy + manifest; "
                         "readers list committed files only)")
    ap.add_argument("--fuzzy-dict", type=int, default=None,
                    metavar="MAX_DIST",
                    help="with --runs-index: also build the SymSpell "
                         "delete-neighborhood sidecar at this depth "
                         "(vocabulary-scale fuzzy queries, "
                         "submit_query --symspell)")
    ap.add_argument("--rev-dict", action="store_true",
                    help="with --runs-index: also build the reversed "
                         "dictionary sidecar (leading-wildcard range "
                         "seeks, submit_query --wildcard)")
    args = ap.parse_args()
    if (args.fuzzy_dict is not None or args.rev_dict) and not args.runs_index:
        raise SystemExit("--fuzzy-dict/--rev-dict are runs-index sidecars; "
                         "pass --runs-index too")

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import index_build as ib

    spark = SparkSession.builder.appName("cer_index_build").getOrCreate()
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    postings, doc_stats, n, avgdl = ib.build_index(
        docs, mode=args.mode, plan=args.plan
    )
    ib.write_index(postings, doc_stats, args.output, num_shards=args.shards)
    extra = {}
    if args.runs_index:
        dt = (ib.build_doc_terms_narrow(docs, mode=args.mode)
              if args.plan != "shuffle"
              else ib.build_doc_terms_with_dl(docs, mode=args.mode))
        runs = ib.build_posting_runs(dt, doc_stats, avgdl, n_docs=n)
        ib.write_runs_index(runs, doc_stats, args.output + "_runs",
                            num_shards=args.shards,
                            commit_mode=args.commit_mode)
        extra["runs_index"] = args.output + "_runs"
        if args.fuzzy_dict is not None:
            from cer_for_mti_spark.operators import fuzzy_dict as fz

            extra["fuzzy_dict_rows"] = fz.write_fuzzy_dict(
                spark, args.output + "_runs", max_dist=args.fuzzy_dict)
        if args.rev_dict:
            from cer_for_mti_spark.operators import rev_dict as rv

            extra["rev_dict_rows"] = rv.write_rev_dict(
                spark, args.output + "_runs")
    if args.positional_index:
        from cer_for_mti_spark.operators import phrase as ph

        pos_runs = ph.build_positional_runs(docs, mode=args.mode, n_docs=n)
        # docs= writes the doc-id sidecar so the index accepts enforced
        # appends (append_positional_runs_index)
        ph.write_positional_runs_index(pos_runs, args.output + "_pos",
                                       num_shards=args.shards, docs=docs,
                                       commit_mode=args.commit_mode)
        extra["positional_index"] = args.output + "_pos"
    elapsed = time.time() - t0
    print(json.dumps({
        "n_docs": n, "avgdl": round(avgdl, 4),
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n / elapsed, 1),
        "index": args.output, **extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
