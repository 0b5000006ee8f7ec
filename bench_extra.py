"""Optimization-round isolation harness (guide §1.4): times individual
query paths over the bench artifacts with a noop sink and dumps
`.explain("formatted")` for each into plans/r06/.

Separate from bench.py on purpose — bench.py is FROZEN for the driver's
measurement; this file exists so OPTIMIZATION_r06.md can cite per-path
numbers and committed plans without touching the frozen harness.

Usage:
    python bench_extra.py [--explain-only] [--tag before|after]

Expects the bench artifacts under /tmp/cer_bench (run `python bench.py`
or at least its gen/aux_build phases first). Each timed path runs in
THIS process (one warm JVM): numbers here are for relative comparison
of plan variants, not cross-JVM absolutes — bench.py remains the
methodology of record.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "500000"))
WORK = "/tmp/cer_bench"
CORPUS = f"{WORK}/corpus_{SCALE_DOCS}"
POS_IDX = f"{WORK}/pos_idx_{SCALE_DOCS}"
POS_RUNS_IDX = f"{WORK}/pos_runs_idx_{SCALE_DOCS}"
ANN_IDX = f"{WORK}/ann_idx_{SCALE_DOCS}"
BM25_RUNS_IDX = f"{WORK}/bm25_runs_idx_{SCALE_DOCS}"
IDX = f"{WORK}/idx{CPUS}_shuffle"

QROWS = [
    (i, q)
    for i, q in enumerate(
        ["the data", "insulin", "dopamine serotonin", "protein binding",
         "the of and to in", "NaCl", "acid reaction method", "energy",
         "cell protein structure", "TNF-α"] * 3
    )
]


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _dump_plan(df, name: str, tag: str) -> None:
    os.makedirs(f"{REPO}/plans/r06", exist_ok=True)
    with open(f"{REPO}/plans/r06/{name}_{tag}.txt", "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main() -> None:
    explain_only = "--explain-only" in sys.argv
    tag = "after"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators import index_build as ib
    from cer_for_mti_spark.operators import phrase as ph
    from cer_for_mti_spark.operators import query_expand as qe
    from cer_for_mti_spark.operators import similarity as sim
    from cer_for_mti_spark.session import get_spark

    spark = get_spark(app_name=f"bench_extra_{tag}", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes":
                              str(4 * 1024 * 1024),
                          "spark.sql.files.openCostInBytes":
                              str(512 * 1024),
                      })
    sc = spark.sparkContext
    timings: dict[str, float] = {}

    def run(name, df, plan_name=None):
        sc.setJobDescription(name)
        if plan_name:
            _dump_plan(df, plan_name, tag)
        if not explain_only:
            timings[name] = _noop(df)
        sc.setJobDescription(None)

    docs = spark.read.parquet(CORPUS)
    queries = spark.createDataFrame(QROWS, "query_id int, query string")

    # --- build-path isolation -------------------------------------------
    ds = ib.build_doc_stats(docs, mode="chem")
    run("build_doc_stats_chem", ds, "doc_stats_chem")
    n, avgdl = ib.corpus_stats(ib.build_doc_stats(docs, mode="simple"))
    spimi = ib.build_postings_spimi(docs, avgdl, mode="chem")
    run("spimi_chem_postings", spimi, "spimi_chem")
    dt = ib.build_doc_terms_with_dl(docs, mode="simple")
    run("doc_terms_shuffle", dt)
    postings_b = ib.build_postings(dt, ib.build_doc_stats(dt), avgdl,
                                   n_docs=n)
    run("shuffle_plan_postings", postings_b, "shuffle_postings")

    # --- query-path isolation (warm cached postings, like bench.py) ----
    postings = spark.read.parquet(f"{IDX}/postings").cache()
    dstats = spark.read.parquet(f"{IDX}/doc_stats").cache()
    n, avgdl = ib.corpus_stats(dstats)
    postings.count()
    run("bm25_wand_30q",
        bm25.bm25_wand(queries, postings, n, avgdl, k=10), "bm25_wand")
    run("bm25_conjunctive_30q",
        bm25.bm25_conjunctive(queries, postings, n, avgdl, k=10))

    pos_base = spark.read.option("basePath", f"{POS_IDX}/positional") \
        .parquet(f"{POS_IDX}/positional")
    run("phrase_30q_merged",
        ph.phrase_search_from_index(spark, POS_IDX, queries,
                                    base_df=pos_base),
        "phrase_merged")
    runs_base = spark.read.option(
        "basePath", f"{POS_RUNS_IDX}/positional_runs"
    ).parquet(f"{POS_RUNS_IDX}/positional_runs")
    run("phrase_30q_sharded",
        ph.phrase_search_sharded_from_index(spark, POS_RUNS_IDX, queries,
                                            base_df=runs_base),
        "phrase_sharded")
    pfx_rows = [
        (i, " ".join(q.split()[:-1] + [q.split()[-1][:3] + "*"]))
        for i, q in QROWS
    ]
    pfx = spark.createDataFrame(pfx_rows, "query_id int, query string")
    run("phrase_prefix_30q_sharded",
        ph.phrase_prefix_search_sharded_from_index(spark, POS_RUNS_IDX,
                                                   pfx))
    fz_rows = [
        (i, " ".join(
            ("q" + t[1:]) if t.startswith("x") else ("x" + t[1:])
            for t in q.split()))
        for i, q in QROWS
    ]
    fz_qs = spark.createDataFrame(fz_rows, "query_id int, query string")
    run("bm25_symspell_30q",
        qe.bm25_fuzzy_symspell_from_index(spark, BM25_RUNS_IDX, fz_qs, n,
                                          avgdl, k=10), "symspell")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ann_qs = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).cache()
    ann_qs.count()
    ann_index = sim.read_ann_index(spark, ANN_IDX)
    run("ann_from_index_30q",
        sim.ann_topk_from_index(spark, ANN_IDX, ann_qs, k=5, nprobe=4,
                                index=ann_index), "ann_from_index")

    dt_c = ib.build_doc_terms(docs, mode="simple").cache()
    dt_c.count()
    run("bm25_naive_30q",
        bm25.bm25_naive(queries, dt_c, dstats, n, avgdl, k=10),
        "bm25_naive")

    # --- sf-dir declared queries (the bench QUERY_NAMES) ----------------
    all_queries = {**entry.queries(), **entry.queries_extra()}
    for name in ["tpch_q1", "top_orders", "doc_terms", "bm25_topk",
                 "bm25_wand_sharded", "minhash_lsh", "embedding_near_dup",
                 "sessionize", "embedding_topk", "quality", "bm25_prefix",
                 "bm25_fuzzy", "bm25_fuzzy_symspell", "phrase_prefix"]:
        df = all_queries[name](spark, SF_DIR)
        run(f"q_{name}", df, name if name in (
            "bm25_topk", "minhash_lsh", "bm25_prefix") else None)

    print(json.dumps({"tag": tag, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
