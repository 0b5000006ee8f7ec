"""spark-submit entry point: queries over a written index.

    spark-submit --py-files /tmp/cer_for_mti_spark.zip \
        tools/submit_query.py --index <index dir> \
        --query "insulin" --query "chemical binding" \
        [--k 10] [--mode chem] [--shards 32] [--sharded] \
        [--conjunctive] [--phrase]

Scan-pruned (shard partition pruning + term row-group pushdown).
--sharded: index dir must be a runs index (submit_build --runs-index);
scoring runs per (query, doc-range bucket) with bounded task bytes.
--conjunctive: AND semantics — only docs containing every query term;
combined with --sharded it runs bm25_conjunctive_sharded over the runs
index (bounded task bytes), alone it reads the merged-postings layout.
--exclude "t1 t2": Boolean NOT — docs containing any listed term are
dropped BEFORE the top-k cut; composes with --conjunctive / --sharded.
--phrase: index dir must be a positional runs index (submit_build
--positional-index); queries are exact-adjacency phrases; output rows
are (query, doc_id, n_matches). Prints one JSON line per result row.
--prefix / --fuzzy: query expansion over a runs index — wildcard
('dat*') completions or Levenshtein-close terms from the index term
dictionary (sorted term_dict sidecar when present), scored through the
sharded BM25 path; see operators/query_expand.py.
--wildcard: generalized globs ('d?p', 's*m', '*tion') — literal-prefix
seeks on term_dict; leading wildcards use the rev_dict sidecar
(submit_build --rev-dict) or need --allow-leading.
--symspell: vocabulary-scale fuzzy (prefixLength=0 — first-char typos
expand) via the fuzzy_dict sidecar (submit_build --fuzzy-dict D).
--phrase-prefix: with --phrase, trailing-'*' tokens are MultiPhraseQuery
slots expanding to --max-expansions completions in term order.
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
    ap.add_argument("--shards", type=int, default=None,
                    help="index shard count; default = the count "
                         "recorded in index_meta.json (explicit "
                         "mismatches raise)")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--exclude", default=None,
                    help="space-separated terms applied to every query: "
                         "docs containing ANY of them are dropped before "
                         "the top-k cut (Boolean NOT); composes with "
                         "--conjunctive and --sharded")
    ap.add_argument("--slop", type=int, default=0,
                    help="with --phrase: ordered-proximity tolerance "
                         "(term i may sit up to slop positions beyond "
                         "its exact slot); 0 = exact adjacency")
    ap.add_argument("--prefix", action="store_true",
                    help="wildcard retrieval over a RUNS index: "
                         "'*'-suffixed query tokens expand against the "
                         "index term dictionary (top --max-expansions "
                         "by df) before BM25 scoring")
    ap.add_argument("--fuzzy", action="store_true",
                    help="typo-tolerant retrieval over a RUNS index: "
                         "every token expands to dictionary terms "
                         "within --fuzzy-dist edits sharing its first "
                         "--fuzzy-prefix-len chars")
    ap.add_argument("--fuzzy-dist", type=int, default=1)
    ap.add_argument("--fuzzy-prefix-len", type=int, default=1)
    ap.add_argument("--max-expansions", type=int, default=50)
    ap.add_argument("--wildcard", action="store_true",
                    help="generalized glob retrieval over a RUNS index: "
                         "'*' and '?' anywhere in a token; leading "
                         "wildcards seek the rev_dict sidecar when "
                         "present, else need --allow-leading")
    ap.add_argument("--symspell", action="store_true",
                    help="vocabulary-scale fuzzy over a RUNS index with "
                         "a fuzzy_dict sidecar: prefixLength=0 "
                         "semantics (first-char typos expand) at "
                         "--fuzzy-dist edits")
    ap.add_argument("--regexp", action="store_true",
                    help="regexp retrieval over a RUNS index: "
                         "'/re/'-wrapped tokens expand to dictionary "
                         "terms the anchored regex fully matches "
                         "(mandatory-literal-prefix seek)")
    ap.add_argument("--allow-leading", action="store_true",
                    help="with --wildcard/--regexp: accept the "
                         "full-dictionary enumeration for patterns "
                         "with no seekable literal prefix")
    ap.add_argument("--phrase-prefix", action="store_true",
                    help="with --phrase: tokens carrying '*'/'?' expand "
                         "to --max-expansions dictionary completions in "
                         "term order (MultiPhraseQuery glob slots)")
    args = ap.parse_args()
    n_exp = sum([args.prefix, args.fuzzy, args.wildcard, args.symspell,
                 args.regexp])
    if n_exp > 1:
        raise SystemExit("--prefix/--fuzzy/--wildcard/--symspell/--regexp "
                         "are mutually exclusive")
    if n_exp and (args.conjunctive or args.phrase or args.exclude):
        raise SystemExit("expansion flags do not compose with "
                         "--conjunctive/--phrase/--exclude")
    if n_exp and args.mode != "simple":
        raise SystemExit("expansion flags expand to already-analyzed "
                         "terms; only --mode simple is supported")
    if args.phrase_prefix and not args.phrase:
        raise SystemExit("--phrase-prefix requires --phrase")

    from pyspark.sql import SparkSession

    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators import index_build as ib

    spark = SparkSession.builder.appName("cer_bm25_query").getOrCreate()
    queries = spark.createDataFrame(
        list(enumerate(args.query)), "query_id int, query string"
    )
    qtext = dict(enumerate(args.query))

    if args.phrase:
        from cer_for_mti_spark.operators import phrase as ph

        if args.phrase_prefix:
            hits = ph.phrase_prefix_search_sharded_from_index(
                spark, args.index, queries, num_shards=args.shards,
                max_expansions=args.max_expansions, slop=args.slop,
            )
        else:
            hits = ph.phrase_search_sharded_from_index(
                spark, args.index, queries, mode=args.mode,
                num_shards=args.shards, slop=args.slop,
            )
        for r in hits.orderBy("phrase_id", "doc_id").collect():
            print(json.dumps({
                "query_id": r["phrase_id"], "query": qtext[r["phrase_id"]],
                "doc_id": r["doc_id"], "n_matches": r["n_matches"],
            }))
        spark.stop()
        return

    # live N (idf freshness) + FROZEN bake avgdl (index_meta.json): the
    # runs' impacts/block maxes were encoded at the bake value, and
    # decoding at a drifted live avgdl can exceed those bounds and make
    # block-max WAND skip true top-k docs
    n, avgdl = ib.bake_stats(spark, args.index)
    # tombstoned docs (submit_delete.py) are dropped before every top-k
    # cut; the array is loaded once and passed to whichever path runs
    tomb = ib.load_tombstones(spark, args.index)
    if n_exp:
        # expansion paths run over the RUNS index layout only (the
        # dictionary probe and the sharded scorer share its pruning)
        from cer_for_mti_spark.operators import query_expand as qe

        if args.prefix:
            out = qe.bm25_prefix_sharded_from_index(
                spark, args.index, queries, n, avgdl, k=args.k,
                num_shards=args.shards,
                max_expansions=args.max_expansions, tombstones=tomb)
        elif args.wildcard:
            out = qe.bm25_wildcard_sharded_from_index(
                spark, args.index, queries, n, avgdl, k=args.k,
                num_shards=args.shards,
                max_expansions=args.max_expansions,
                allow_leading=args.allow_leading, tombstones=tomb)
        elif args.symspell:
            out = qe.bm25_fuzzy_symspell_from_index(
                spark, args.index, queries, n, avgdl, k=args.k,
                num_shards=args.shards, max_dist=args.fuzzy_dist,
                max_expansions=args.max_expansions, tombstones=tomb)
        elif args.regexp:
            out = qe.bm25_regexp_sharded_from_index(
                spark, args.index, queries, n, avgdl, k=args.k,
                num_shards=args.shards,
                max_expansions=args.max_expansions,
                allow_full_scan=args.allow_leading, tombstones=tomb)
        else:
            out = qe.bm25_fuzzy_sharded_from_index(
                spark, args.index, queries, n, avgdl, k=args.k,
                num_shards=args.shards, max_dist=args.fuzzy_dist,
                prefix_len=args.fuzzy_prefix_len,
                max_expansions=args.max_expansions, tombstones=tomb)
        for r in out.orderBy("query_id", "rank").collect():
            print(json.dumps({
                "query_id": r["query_id"], "query": qtext[r["query_id"]],
                "rank": r["rank"], "doc_id": r["doc_id"],
                "score": r["score"],
            }))
        spark.stop()
        return
    terms = sorted(bm25._query_term_set(queries.collect(), args.mode))
    if args.exclude:
        neg_terms = bm25._query_term_set([{"query": args.exclude}],
                                         args.mode)
        terms = sorted(set(terms) | neg_terms)  # prune must fetch negs too
        qex = spark.createDataFrame(
            [(i, q, args.exclude) for i, q in enumerate(args.query)],
            "query_id int, query string, exclude string")
        if args.sharded:
            pruned = bm25.read_runs_pruned(spark, args.index, terms,
                                           num_shards=args.shards)
            out = bm25.bm25_exclude_sharded(
                qex, pruned, n, avgdl, k=args.k, mode=args.mode,
                conjunctive=args.conjunctive, tombstones=tomb)
        else:
            pruned = bm25.read_postings_pruned(spark, args.index, terms,
                                               num_shards=args.shards)
            out = bm25.bm25_exclude(
                qex, pruned, n, avgdl, k=args.k, mode=args.mode,
                conjunctive=args.conjunctive, tombstones=tomb)
        for r in out.orderBy("query_id", "rank").collect():
            print(json.dumps({
                "query_id": r["query_id"], "query": qtext[r["query_id"]],
                "rank": r["rank"], "doc_id": r["doc_id"],
                "score": r["score"],
            }))
        spark.stop()
        return
    if args.conjunctive and args.sharded:
        # AND semantics over the runs-index layout: bounded task bytes
        pruned = bm25.read_runs_pruned(spark, args.index, terms,
                                       num_shards=args.shards)
        out = bm25.bm25_conjunctive_sharded(queries, pruned, n, avgdl,
                                            k=args.k, mode=args.mode,
                                            tombstones=tomb)
    elif args.conjunctive:
        pruned = bm25.read_postings_pruned(spark, args.index, terms,
                                           num_shards=args.shards)
        out = bm25.bm25_conjunctive(queries, pruned, n, avgdl, k=args.k,
                                    mode=args.mode, tombstones=tomb)
    elif args.sharded:
        out = bm25.bm25_wand_sharded_from_index(
            spark, args.index, queries, n, avgdl, k=args.k, mode=args.mode,
            num_shards=args.shards, tombstones=tomb,
        )
    else:
        out = bm25.bm25_wand_from_index(
            spark, args.index, queries, n, avgdl, k=args.k, mode=args.mode,
            num_shards=args.shards, tombstones=tomb,
        )
    for r in out.orderBy("query_id", "rank").collect():
        print(json.dumps({
            "query_id": r["query_id"], "query": qtext[r["query_id"]],
            "rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
