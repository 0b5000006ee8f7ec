"""BM25 top-k query execution: a declarative naive path (oracle-checkable
against DuckDB SQL) and a block-max WAND path over compressed postings.

BM25 (k1=1.2, b=0.75, per BASELINE.json north_star), Lucene idf variant:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = sum_{t in q∩d} idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

Determinism contract (SURVEY.md §4.2.5): ranks are ordered by
(round(score, 6) DESC, doc_id ASC). Rounding before ranking absorbs
float-summation-order differences across parallelism levels (local[8] vs
local[32]) and across engines (JVM vs numpy vs DuckDB libm), making the
naive and WAND paths rank-identical and N-vs-4N runs rank-identical.

Scale notes: the query path broadcast-semi-prunes the postings scan to the
query batch's terms (≤ |queries|·|terms| posting rows move), then groups a
query's postings together (applyInPandas) — query-parallel, which is the
right axis at web scale where the query batch is large. Stop-word terms
(huge postings) are the reason block-max WAND exists: the scorer skips
whole 128-doc blocks whose upper bound can't reach the current top-k
threshold.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cer_for_mti_spark.functions import analyze
from cer_for_mti_spark.operators.index_build import B, K1, _impact
from cer_for_mti_spark.functions.codecs import delta_decode, varint_decode

TOPK_SCHEMA = "query_id int, doc_id long, score double, rank int"


def idf_col(df_col, n_docs: int):
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def dedup_query_batch(queries: DataFrame,
                      key_col: str = "query"
                      ) -> tuple[DataFrame, DataFrame | None]:
    """Batch planning: identical query texts do identical work on every
    scorer path, so score each DISTINCT text once (canonical query_id =
    min over its duplicates) and fan the rows back out afterwards.
    Returns (canonical queries, remap) with remap == None when the batch
    has no duplicate texts. Nothing persists beyond the call — this is
    per-batch planning, not result caching; results per query_id are
    identical (tested).

    The duplicate probe is a driver-side collect of the (query_id, text)
    pairs — free for the usual createDataFrame batch (LocalTableScan
    collect launches no job), one tiny job otherwise, and the batch is
    small by the driver contract. A duplicate-free batch returns
    (queries, None) unchanged, so the common single-query path pays
    nothing."""
    spark = queries.sparkSession
    rows = queries.select("query_id", key_col).collect()
    by_text: dict = {}
    for r in rows:
        by_text.setdefault(r[key_col], []).append(int(r["query_id"]))
    if len(by_text) == len(rows):
        return queries, None
    canon = spark.createDataFrame(
        [(min(v), q) for q, v in by_text.items()],
        f"query_id int, {key_col} string")
    remap = spark.createDataFrame(
        [(min(v), qid) for v in by_text.values() for qid in v],
        "cqid int, query_id int")
    return canon, remap


def fanout_query_results(result: DataFrame,
                         remap: DataFrame | None,
                         id_col: str = "query_id") -> DataFrame:
    """Re-attach per-canonical-query rows to every duplicate query_id."""
    if remap is None:
        return result
    cols = result.columns
    return (
        result.withColumnRenamed(id_col, "cqid")
        .join(F.broadcast(remap.withColumnRenamed("query_id", id_col)),
              "cqid")
        .select(*cols)
    )


def query_terms(queries: DataFrame, mode: str = "simple") -> DataFrame:
    """(query_id, query) -> distinct (query_id, term) via the same analyzer
    as the index build."""
    toks = analyze.tokenize(queries, "query", mode)
    return (
        toks.select("query_id", F.explode("tokens").alias("term")).distinct()
    )


def bm25_naive(queries: DataFrame, doc_terms: DataFrame, doc_stats: DataFrame,
               n_docs: int, avgdl: float, k: int = 10,
               mode: str = "simple") -> DataFrame:
    """Fully declarative scorer over the uncompressed (doc_id, term, tf)
    relation — Catalyst plans: broadcast the tiny query-term set, hash-join
    against doc_terms (filter pushed to the parquet scan when doc_terms is
    a table), co-keyed join to doc_stats, partial+final agg, window top-k.
    This is the DuckDB-oracle twin of the WAND path. Duplicate query
    texts in the batch are scored once and fanned back out
    (dedup_query_batch) — per-query rows are identical either way."""
    queries, remap = dedup_query_batch(queries)
    qt = query_terms(queries, mode)
    q_only = qt.select("term").distinct()
    # prune doc_terms to the query vocabulary FIRST (broadcast hash join →
    # at table scale this also becomes a pushed-down IN filter on the scan),
    # then df counts are still global per term (all docs kept per term).
    dt_q = doc_terms.join(F.broadcast(q_only), "term")
    # global per-term df via a count window over the pruned relation: ONE
    # pass over dt_q instead of two (the separate groupBy + re-join read
    # the full doc_terms relation twice — measured 17-20s vs 11.5s on the
    # 12.5M-row bench corpus, guide §2.4: two operations keyed the same
    # way share one exchange)
    scored = (
        dt_q.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(qt), "term")
        .join(doc_stats, "doc_id")
        .withColumn("idf", idf_col(F.col("df").cast("double"), n_docs))
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("doclen") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    return fanout_query_results(ranked, remap)


from cer_for_mti_spark.operators.index_build import (  # noqa: E402
    isin_sorted as _isin_sorted,
)


def _decode_cursor(row, n_docs: int, avgdl: float,
                   tomb: np.ndarray | None = None):
    ids = delta_decode(row["doc_ids"])
    tfs = varint_decode(row["tfs"])
    dls = varint_decode(row["doclens"])
    if tomb is not None and len(ids):
        # tombstone mask at decode — BEFORE impacts/top-k, so deleted
        # docs can never eat top-k slots. Lazy-delete semantics: df (and
        # the baked block maxes) keep counting the deleted docs until
        # compaction physically purges them; the block arrays therefore
        # stay valid UPPER bounds over the surviving subset.
        keep = ~_isin_sorted(ids, tomb)
        if not keep.all():
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
    df = float(row["df"])
    idf = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    imps = idf * _impact(tfs, dls, avgdl)
    block_last = np.asarray(row["block_last"], dtype=np.int64)
    block_ub = idf * np.asarray(row["block_max"], dtype=np.float64)
    return ids, imps, block_last, block_ub, idf * float(row["max_impact"])


def _taat_one_query(rows: list, n_docs: int, avgdl: float, k: int,
                    tomb: np.ndarray | None = None):
    """Vectorized term-at-a-time exhaustive scorer: concatenate all
    postings, segment-sum per doc with numpy. At moderate posting mass
    this beats a per-doc Python DAAT loop by orders of magnitude; the
    WAND loop takes over when the mass is large enough that skipping
    wins (see bm25_wand's auto switch). Deterministic: terms are
    processed in sorted order, accumulation via np.add.reduceat over a
    doc-sorted concat."""
    decoded = []
    for row in rows:
        ids, imps, _, _, _ = _decode_cursor(row, n_docs, avgdl, tomb)
        if len(ids):
            decoded.append((ids, imps))
    if not decoded:
        return []
    all_ids = np.concatenate([d[0] for d in decoded])
    all_imps = np.concatenate([d[1] for d in decoded])
    order = np.argsort(all_ids, kind="stable")
    ids_s, imps_s = all_ids[order], all_imps[order]
    starts = np.flatnonzero(np.concatenate(([True], ids_s[1:] != ids_s[:-1])))
    docs = ids_s[starts]
    scores = np.add.reduceat(imps_s, starts)
    scores_r = np.round(scores, 6)
    if len(docs) > k:
        # keep every doc tied with the kth score so doc_id tie-break stays
        # exact, then sort the (small) survivor set
        kth = np.partition(scores_r, len(scores_r) - k)[len(scores_r) - k]
        mask = scores_r >= kth
        docs, scores_r = docs[mask], scores_r[mask]
    final = np.lexsort((docs, -scores_r))[:k]
    return [(float(scores_r[i]), int(docs[i])) for i in final]


def _wand_one_query(rows: list, n_docs: int, avgdl: float, k: int,
                    tomb: np.ndarray | None = None):
    """Classic block-max WAND (Broder et al. 2003; Ding & Suel 2011
    block-max refinement) over the decoded cursors of one query."""
    cursors = []
    for row in rows:
        ids, imps, block_last, block_ub, ub = _decode_cursor(
            row, n_docs, avgdl, tomb)
        if len(ids):
            cursors.append({"ids": ids, "imps": imps, "bl": block_last,
                            "bub": block_ub, "ub": ub, "pos": 0})
    if not cursors:
        return []

    heap: list[float] = []  # min-heap of the current top-k scores
    candidates: list[tuple[float, int]] = []
    slack = 1e-6

    def threshold() -> float:
        return heap[0] - slack if len(heap) >= k else -1.0

    def cur_doc(c) -> int:
        return int(c["ids"][c["pos"]]) if c["pos"] < len(c["ids"]) else 1 << 62

    INF = 1 << 62
    live = cursors
    while True:
        live = [c for c in live if c["pos"] < len(c["ids"])]
        if not live:
            break
        live.sort(key=cur_doc)
        theta = threshold()
        # pivot: first prefix whose summed term upper bounds beat theta
        acc, pivot = 0.0, -1
        for i, c in enumerate(live):
            acc += c["ub"]
            if acc > theta:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = cur_doc(live[pivot])
        # pivot SET = every cursor positioned at or before pivot_doc (the
        # prefix may extend past `pivot` when several cursors sit on it)
        m = pivot + 1
        while m < len(live) and cur_doc(live[m]) <= pivot_doc:
            m += 1
        # block-max refinement (Ding & Suel 2011): UB of any doc in
        # [pivot_doc, d'-1] using current-block maxima of the pivot set
        bacc = 0.0
        d_blocks = INF
        for c in live[:m]:
            bi = int(np.searchsorted(c["bl"], pivot_doc))
            if bi < len(c["bub"]):
                bacc += float(c["bub"][bi])
                d_blocks = min(d_blocks, int(c["bl"][bi]))
        if bacc <= theta:
            # safe skip: docs < next non-pivot cursor are covered only by
            # the pivot set, and docs <= min(block_last) stay in-block
            d_next = cur_doc(live[m]) if m < len(live) else INF
            nxt = max(min(d_blocks + 1, d_next), pivot_doc + 1)
            for c in live[:m]:
                c["pos"] += int(np.searchsorted(c["ids"][c["pos"]:], nxt))
            continue
        if cur_doc(live[0]) == pivot_doc:
            score = 0.0
            for c in live[:m]:
                if cur_doc(c) == pivot_doc:
                    score += float(c["imps"][c["pos"]])
                    c["pos"] += 1
            if score > theta:
                candidates.append((score, pivot_doc))
                heapq.heappush(heap, score)
                if len(heap) > k:
                    heapq.heappop(heap)
        else:
            # advance the largest-UB cursor strictly BEHIND the pivot doc
            # (cursors already sitting on pivot_doc must not be chosen —
            # searchsorted would return 0 and the loop would not progress)
            pre = [c for c in live[:pivot] if cur_doc(c) < pivot_doc]
            adv = max(pre, key=lambda c: c["ub"])
            adv["pos"] += int(np.searchsorted(adv["ids"][adv["pos"]:], pivot_doc))

    # deterministic final ranking: (round(score,6) DESC, doc_id ASC)
    ranked = sorted(
        ((round(s, 6), d) for s, d in candidates), key=lambda x: (-x[0], x[1])
    )
    return ranked[:k]


# Auto-scorer crossover. Measured on the 500k-doc bench index (r06):
# vectorized TAAT scores a 2.46M-posting stop-word query in 0.31s where
# the per-doc Python WAND loop takes 10.0s — and BOTH paths pay the same
# full _decode_cursor cost first, so skipping can only save the numpy
# segment-sum, never the decode. TAAT therefore wins at any mass that
# fits a task's decode budget; the WAND loop remains for callers that
# force scorer='wand' and as the documented skip-path shape for engines
# with block-level decode skipping. 50M postings ≈ 0.4 GB decoded ≈ the
# per-task posting budget (phrase DEFAULT_MAX_POSTING_BYTES) — beyond
# that the sharded scorer is the right tool anyway.
TAAT_MASS_THRESHOLD = 50_000_000


def _tomb_broadcast(df_like: DataFrame, tombstones):
    """sc.broadcast the sorted tombstone array once per query batch (or
    pass None through) — the scorers' tasks then share one copy per
    executor instead of re-pickling it into every closure."""
    if tombstones is None or not len(tombstones):
        return None
    arr = np.asarray(tombstones, dtype=np.int64)
    arr = np.unique(arr)  # sorted + deduped, _isin_sorted's contract
    return df_like.sparkSession.sparkContext.broadcast(arr)


def bm25_wand(queries: DataFrame, postings: DataFrame, n_docs: int,
              avgdl: float, k: int = 10, mode: str = "simple",
              scorer: str = "auto", tombstones=None) -> DataFrame:
    """Top-k over compressed postings: broadcast-prune postings to the
    query terms, co-locate each query's posting lists with applyInPandas,
    score per query. Output rank-identical to bm25_naive.

    scorer: 'auto' (default) picks vectorized TAAT when the query's total
    posting mass is below TAAT_MASS_THRESHOLD (numpy segment-sum beats a
    per-doc Python loop there) and block-max WAND above it (skipping wins
    once a stop-word-sized posting dominates); 'wand'/'taat' force a path
    (tests assert both are rank-identical). Duplicate query texts in the
    batch are scored once (dedup_query_batch)."""
    queries, remap = dedup_query_batch(queries)
    qt = query_terms(queries, mode)
    fetched = postings.join(F.broadcast(qt), "term")
    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        tomb = tomb_bc.value if tomb_bc is not None else None
        rows = [pdf.iloc[i] for i in range(len(pdf))]
        rows.sort(key=lambda r: r["term"])  # deterministic accumulation
        if scorer == "taat" or (
            scorer == "auto" and pdf["df"].sum() <= TAAT_MASS_THRESHOLD
        ):
            ranked = _taat_one_query(rows, n_docs, avgdl, k, tomb)
        else:
            ranked = _wand_one_query(rows, n_docs, avgdl, k, tomb)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for _, d in ranked],
                "score": [s for s, _ in ranked],
                "rank": list(range(1, len(ranked) + 1)),
            }
        )

    return fanout_query_results(
        fetched.groupBy("query_id").applyInPandas(score_group, TOPK_SCHEMA),
        remap)


def bm25_wand_sharded(queries: DataFrame, runs: DataFrame, n_docs: int,
                      avgdl: float, k: int = 10, mode: str = "simple",
                      scorer: str = "auto", tombstones=None) -> DataFrame:
    """Doc-range-sharded top-k: score per (query_id, bucket) with a
    per-bucket top-k, then a tiny global merge — rank-identical to
    bm25_wand over the merged postings.

    Input is the RUN-level relation from index_build.build_posting_runs:
    buckets are doc-id ranges CONSISTENT ACROSS TERMS, so every posting of
    doc d (whatever the term) lives in d's bucket and the per-doc score is
    complete within it. Each bucket's top-k is a superset filter of the
    global top-k, so the union (S·k tiny rows per query) merged by one
    window is exact.

    Why this exists: bm25_wand co-locates ALL of a query's posting bytes
    in ONE task (groupBy(query_id)); at 10^12 docs a stop-word term's
    posting is tens of GB — single-task OOM no matter how well WAND skips
    CPU work. Here a task fetches only one bucket's slice of each posting,
    so per-task bytes are bounded by the bucket width regardless of term
    hotness, and a hot query parallelizes across S tasks.

    idf needs the GLOBAL df: run-local df is summed per term first
    (broadcast back onto the runs). Duplicate query texts are scored
    once (dedup_query_batch)."""
    queries, remap = dedup_query_batch(queries)
    qt = query_terms(queries, mode)
    fetched = runs.join(F.broadcast(qt), "term")
    gdf = (
        runs.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("df").alias("_gdf"))
    )
    fetched = (
        fetched.join(F.broadcast(gdf), "term")
        .drop("df")
        .withColumnRenamed("_gdf", "df")  # _decode_cursor reads row["df"]
    )
    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        tomb = tomb_bc.value if tomb_bc is not None else None
        rows = [pdf.iloc[i] for i in range(len(pdf))]
        rows.sort(key=lambda r: r["term"])  # deterministic accumulation
        if scorer == "taat" or (
            scorer == "auto" and pdf["df"].sum() <= TAAT_MASS_THRESHOLD
        ):
            ranked = _taat_one_query(rows, n_docs, avgdl, k, tomb)
        else:
            ranked = _wand_one_query(rows, n_docs, avgdl, k, tomb)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for _, d in ranked],
                "score": [s for s, _ in ranked],
            }
        )

    cands = fetched.groupBy("query_id", "bucket").applyInPandas(
        score_bucket, "query_id int, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    return fanout_query_results(ranked, remap)


def bm25_conjunctive(queries: DataFrame, postings: DataFrame, n_docs: int,
                     avgdl: float, k: int = 10,
                     mode: str = "simple", tombstones=None) -> DataFrame:
    """AND-semantics top-k: only documents containing EVERY query term
    are scored (the classic conjunctive retrieval mode; the reference's
    whole-document term-set matching is conjunctive at n=1). Engine
    path: broadcast-prune postings to the query terms, co-locate per
    query, numpy-intersect the doc-id lists across the query's cursors,
    sum impacts at the intersection only. A query with an out-of-
    vocabulary term returns no rows (no doc can contain all terms).

    Scale shape: identical to bm25_wand's (the intersection is cheaper
    than scoring — it prunes before summing); for bounded task bytes at
    10^12 docs run it per (query, bucket) over runs exactly like
    bm25_wand_sharded — conjunctive-ness is per-doc, so bucket-local
    intersection is exact."""
    queries, remap = dedup_query_batch(queries)
    qt = query_terms(queries, mode)
    need = {
        int(r["query_id"]): int(r["n"])
        for r in qt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    fetched = postings.join(F.broadcast(qt), "term")
    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        tomb = tomb_bc.value if tomb_bc is not None else None
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
            "rank": pd.Series([], dtype="int64"),
        })
        if len(pdf) < need[qid]:  # some term has no posting at all
            return empty
        rows = [pdf.iloc[i] for i in range(len(pdf))]
        rows.sort(key=lambda r: r["term"])  # deterministic accumulation
        decoded = []
        for row in rows:
            ids, imps, _, _, _ = _decode_cursor(row, n_docs, avgdl, tomb)
            decoded.append((ids, imps))
        common = decoded[0][0]
        for ids, _ in decoded[1:]:
            common = np.intersect1d(common, ids, assume_unique=True)
        if not len(common):
            return empty
        score = np.zeros(len(common), dtype=np.float64)
        for ids, imps in decoded:
            score += imps[np.searchsorted(ids, common)]
        scores_r = np.round(score, 6)
        if len(common) > k:
            kth = np.partition(scores_r, len(scores_r) - k)[len(scores_r) - k]
            mask = scores_r >= kth
            common, scores_r = common[mask], scores_r[mask]
        final = np.lexsort((common, -scores_r))[:k]
        return pd.DataFrame({
            "query_id": np.full(len(final), qid, dtype=np.int64),
            "doc_id": common[final],
            "score": scores_r[final],
            "rank": np.arange(1, len(final) + 1, dtype=np.int64),
        })

    return fanout_query_results(
        fetched.groupBy("query_id").applyInPandas(score_group, TOPK_SCHEMA),
        remap)


def bm25_conjunctive_sharded(queries: DataFrame, runs: DataFrame,
                             n_docs: int, avgdl: float, k: int = 10,
                             mode: str = "simple",
                             tombstones=None) -> DataFrame:
    """Doc-range-sharded conjunctive top-k — bm25_conjunctive with
    bounded per-task bytes, rank-identical to it.

    Correctness: buckets are doc-id ranges consistent across terms
    (build_posting_runs contract), so a doc contains ALL query terms iff
    its own bucket's slices of every term's posting contain it —
    bucket-local intersection is exact, and each bucket's top-k is a
    superset filter of the global conjunctive top-k (scores are complete
    within the bucket). One window merges the S·k candidate rows.
    idf uses the GLOBAL df (run-local df summed per term first).

    A bucket missing one of the query's terms simply produces no rows
    (no doc in that range contains all terms); a query whose term is
    missing EVERYWHERE yields nothing from every bucket — the OOV
    contract holds without any global coordination."""
    queries, remap = dedup_query_batch(queries)
    qt = query_terms(queries, mode)
    need = {
        int(r["query_id"]): int(r["n"])
        for r in qt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    fetched = runs.join(F.broadcast(qt), "term")
    gdf = (
        runs.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("df").alias("_gdf"))
    )
    fetched = (
        fetched.join(F.broadcast(gdf), "term")
        .drop("df")
        .withColumnRenamed("_gdf", "df")  # _decode_cursor reads row["df"]
    )

    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        tomb = tomb_bc.value if tomb_bc is not None else None
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        })
        # a (term, bucket) slice may arrive as several runs; merge the
        # decoded arrays per term before intersecting
        by_term: dict[str, list] = {}
        for i in range(len(pdf)):
            row = pdf.iloc[i]
            by_term.setdefault(row["term"], []).append(row)
        if len(by_term) < need[qid]:
            return empty
        decoded = []
        for term in sorted(by_term):  # deterministic accumulation
            ids_l, imps_l = [], []
            for row in by_term[term]:
                ids, imps, _, _, _ = _decode_cursor(row, n_docs, avgdl, tomb)
                ids_l.append(ids)
                imps_l.append(imps)
            ids = np.concatenate(ids_l)
            imps = np.concatenate(imps_l)
            order = np.argsort(ids, kind="stable")
            decoded.append((ids[order], imps[order]))
        common = decoded[0][0]
        for ids, _ in decoded[1:]:
            common = np.intersect1d(common, ids, assume_unique=True)
        if not len(common):
            return empty
        score = np.zeros(len(common), dtype=np.float64)
        for ids, imps in decoded:
            score += imps[np.searchsorted(ids, common)]
        scores_r = np.round(score, 6)
        if len(common) > k:
            kth = np.partition(scores_r, len(scores_r) - k)[len(scores_r) - k]
            mask = scores_r >= kth
            common, scores_r = common[mask], scores_r[mask]
        return pd.DataFrame({
            "query_id": np.full(len(common), qid, dtype=np.int64),
            "doc_id": common,
            "score": scores_r,
        })

    cands = fetched.groupBy("query_id", "bucket").applyInPandas(
        score_bucket, "query_id int, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
    return fanout_query_results(ranked, remap)


def _exclusion_want(queries: DataFrame, mode: str,
                    exclude_col: str) -> tuple[DataFrame, dict]:
    """(query_id, term, neg) want-set for Boolean NOT retrieval, plus
    {qid: n_pos_terms}. A term listed both positively and negatively
    stays negative (exclusion wins — the doc is dropped regardless)."""
    qt_pos = query_terms(queries, mode).withColumn("neg", F.lit(False))
    qt_neg = query_terms(
        queries.select(
            "query_id",
            F.coalesce(F.col(exclude_col), F.lit("")).alias("query"),
        ),
        mode,
    ).withColumn("neg", F.lit(True))
    want = (
        qt_pos.unionByName(qt_neg)
        .groupBy("query_id", "term")
        .agg(F.max("neg").alias("neg"))
    )
    need = {
        int(r["query_id"]): int(r["n"])
        for r in want.filter(~F.col("neg")).groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    return want, need


def _score_with_exclusion(pdf: pd.DataFrame, qid: int, k: int | None,
                          n_docs: int, avgdl: float, need_pos: int,
                          conjunctive: bool, merge_runs: bool,
                          tomb: np.ndarray | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Shared NOT-semantics core: decode the group's cursors, candidates
    = union (OR) or intersection (AND) of the POSITIVE doc lists MINUS
    the union of negative doc lists — the exclusion happens BEFORE any
    top-k cut, so excluded docs can never eat top-k slots. Returns
    (doc_ids, rounded scores) of the k best (all, if k is None)."""
    by_term: dict[str, list] = {}
    for i in range(len(pdf)):
        row = pdf.iloc[i]
        by_term.setdefault(row["term"], []).append(row)
    neg_terms = {row["term"] for rows in by_term.values()
                 for row in rows if row["neg"]}
    pos, neg_ids = [], []
    for term in sorted(by_term):  # deterministic accumulation
        rows = by_term[term]
        if merge_runs:
            ids_l, imps_l = [], []
            for row in rows:
                ids, imps, _, _, _ = _decode_cursor(row, n_docs, avgdl, tomb)
                ids_l.append(ids)
                imps_l.append(imps)
            ids = np.concatenate(ids_l)
            imps = np.concatenate(imps_l)
            order = np.argsort(ids, kind="stable")
            ids, imps = ids[order], imps[order]
        else:
            ids, imps, _, _, _ = _decode_cursor(rows[0], n_docs, avgdl, tomb)
        if term in neg_terms:
            neg_ids.append(ids)
        else:
            pos.append((ids, imps))
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))
    if not pos or (conjunctive and len(pos) < need_pos):
        return empty
    if conjunctive:
        cands = pos[0][0]
        for ids, _ in pos[1:]:
            cands = np.intersect1d(cands, ids, assume_unique=True)
    else:
        cands = np.unique(np.concatenate([ids for ids, _ in pos]))
    if neg_ids:
        cands = cands[~np.isin(cands, np.concatenate(neg_ids),
                               assume_unique=False)]
    if not len(cands):
        return empty
    score = np.zeros(len(cands), dtype=np.float64)
    for ids, imps in pos:
        sel = np.searchsorted(ids, cands)
        sel = np.minimum(sel, len(ids) - 1)
        hit = ids[sel] == cands
        score[hit] += imps[sel[hit]]
    scores_r = np.round(score, 6)
    if k is not None and len(cands) > k:
        kth = np.partition(scores_r, len(scores_r) - k)[len(scores_r) - k]
        mask = scores_r >= kth
        cands, scores_r = cands[mask], scores_r[mask]
    return cands, scores_r


def bm25_exclude(queries: DataFrame, postings: DataFrame, n_docs: int,
                 avgdl: float, k: int = 10, mode: str = "simple",
                 conjunctive: bool = False,
                 exclude_col: str = "exclude", tombstones=None) -> DataFrame:
    """Boolean retrieval with NOT: queries carry an `exclude` column
    (space-separated terms, analyzed like the query); documents
    containing ANY excluded term are dropped BEFORE the top-k cut, so
    exclusion can never be approximated away by a deeper k. Positive
    semantics are OR (default, bm25_topk-style) or AND
    (conjunctive=True). An all-negative or OOV-positive query returns
    no rows.

    Scale shape: identical to bm25_conjunctive's — the negative postings
    are fetched through the same broadcast term prune and contribute
    only their id lists; bm25_exclude_sharded is the bounded-task-bytes
    twin (exclusion is per-doc, so bucket-local subtraction is exact)."""
    want, need = _exclusion_want(queries, mode, exclude_col)
    fetched = postings.join(F.broadcast(want), "term")
    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        cands, scores_r = _score_with_exclusion(
            pdf, qid, k, n_docs, avgdl, need.get(qid, 0), conjunctive,
            merge_runs=False,
            tomb=tomb_bc.value if tomb_bc is not None else None,
        )
        final = np.lexsort((cands, -scores_r))[:k]
        return pd.DataFrame({
            "query_id": np.full(len(final), qid, dtype=np.int64),
            "doc_id": cands[final],
            "score": scores_r[final],
            "rank": np.arange(1, len(final) + 1, dtype=np.int64),
        })

    return fetched.groupBy("query_id").applyInPandas(score_group, TOPK_SCHEMA)


def bm25_exclude_sharded(queries: DataFrame, runs: DataFrame, n_docs: int,
                         avgdl: float, k: int = 10, mode: str = "simple",
                         conjunctive: bool = False,
                         exclude_col: str = "exclude",
                         tombstones=None) -> DataFrame:
    """Doc-range-sharded Boolean NOT — bm25_exclude with bounded
    per-task bytes, rank-identical to it. Exclusion is per-doc and every
    posting of doc d lives in d's bucket, so subtracting the bucket's
    negative id slices is exact; each bucket's top-k is a superset
    filter of the global answer (scores complete within the bucket) and
    one window merges the S·k candidates. idf uses global df (run-local
    df summed per POSITIVE term; negative cursors contribute ids only)."""
    want, need = _exclusion_want(queries, mode, exclude_col)
    fetched = runs.join(F.broadcast(want), "term")
    gdf = (
        runs.join(F.broadcast(want.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("df").alias("_gdf"))
    )
    fetched = (
        fetched.join(F.broadcast(gdf), "term")
        .drop("df")
        .withColumnRenamed("_gdf", "df")
    )

    tomb_bc = _tomb_broadcast(queries, tombstones)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        cands, scores_r = _score_with_exclusion(
            pdf, qid, k, n_docs, avgdl, need.get(qid, 0), conjunctive,
            merge_runs=True,
            tomb=tomb_bc.value if tomb_bc is not None else None,
        )
        return pd.DataFrame({
            "query_id": np.full(len(cands), qid, dtype=np.int64),
            "doc_id": cands,
            "score": scores_r,
        })

    cands = fetched.groupBy("query_id", "bucket").applyInPandas(
        score_bucket, "query_id int, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def _query_term_set(queries_rows, mode: str) -> set[str]:
    """Driver-side query analysis mirroring the index tokenizer exactly
    (incl. greek variants for chem+greek — the pruned scan must fetch
    variant-term postings or they silently score zero)."""
    from cer_for_mti_spark.functions.analyze import chem_tokenize_str, greek_variants
    from cer_for_mti_spark.operators.index_build import _JAVA_WS_RE

    terms: set[str] = set()
    for r in queries_rows:
        if mode == "simple":
            terms.update(t for t in _JAVA_WS_RE.split(r["query"] or "") if t)
        else:
            ts = chem_tokenize_str(r["query"] or "")
            if mode == "chem+greek":
                ts = ts + greek_variants(ts)
            terms.update(ts)
    return terms


def bm25_wand_sharded_from_index(spark, index_path: str, queries: DataFrame,
                                 n_docs: int, avgdl: float, k: int = 10,
                                 mode: str = "simple",
                                 num_shards: int | None = None,
                                 scorer: str = "auto",
                                 base_df: DataFrame | None = None,
                                 tombstones="auto") -> DataFrame:
    """End-to-end sharded query path over a WRITTEN runs index
    (index_build.write_runs_index): literal shard filters prune whole
    partition directories (PartitionFilters), term filters push into the
    parquet row groups (PushedFilters), and scoring runs per
    (query, bucket) with bounded task bytes — the full 10^12-doc query
    shape: touch |terms| row groups, fetch one bucket slice per task."""
    from cer_for_mti_spark.functions.hashing import md5_60_py

    q_rows = queries.collect()
    terms = _query_term_set(q_rows, mode)
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    pruned = read_runs_pruned(spark, index_path, sorted(terms),
                              num_shards=num_shards, base_df=base_df)
    if isinstance(tombstones, str) and tombstones == "auto":
        # honour the index's delete sidecar by default — deleted docs
        # must never surface in top-k (delete_docs' contract)
        from cer_for_mti_spark.operators.index_build import load_tombstones

        tombstones = load_tombstones(spark, index_path)
    return bm25_wand_sharded(queries, pruned, n_docs, avgdl, k=k, mode=mode,
                             scorer=scorer, tombstones=tombstones)


def read_runs_pruned(spark, index_path: str, query_terms: list[str],
                     num_shards: int | None = None,
                     base_df: DataFrame | None = None) -> DataFrame:
    """read_postings_pruned's twin for the RUN-level layout
    (<path>/runs, write_runs_index / append_runs_index): shard dirs
    prune at planning time, term predicates push into row groups, the
    bucket column survives as data for per-(query, bucket) scoring."""
    from cer_for_mti_spark.functions.hashing import md5_60_py
    from cer_for_mti_spark.operators.index_build import (
        repair_interrupted_compaction,
        resolve_num_shards,
    )

    num_shards = resolve_num_shards(index_path, num_shards)
    shards = sorted({md5_60_py(t) % num_shards for t in query_terms})
    if base_df is None:
        # a compaction crashed between its two renames leaves no runs/
        # dir but a complete staged replacement — roll it forward
        repair_interrupted_compaction(index_path, "runs")
    from cer_for_mti_spark.operators.index_build import read_index_rel

    df = base_df if base_df is not None else read_index_rel(
        spark, index_path, "runs", with_base_path=True
    )
    return df.filter(
        F.col("shard").isin(shards) & F.col("term").isin(list(query_terms))
    )


def read_postings_pruned(spark, index_path: str, query_terms: list[str],
                         num_shards: int | None = None,
                         base_df: DataFrame | None = None) -> DataFrame:
    """Scan-pruned postings read for a query batch: the term list and its
    shard ids are known before the scan (shard = md5_60(term) % S is a
    pure function of the term), so BOTH predicates are literal filters —
    `shard` prunes whole partition directories (PartitionFilters) and
    `term` pushes into the parquet row-group scan (PushedFilters). At
    10^12 docs this is the difference between touching S directories and
    touching |query_terms| row groups. The broadcast-join path
    (bm25_wand on an open postings DF) cannot do this: join keys don't
    push down into a columnar scan without DPP, and DPP doesn't apply to
    non-partition join columns."""
    from cer_for_mti_spark.functions.hashing import md5_60_py
    from cer_for_mti_spark.operators.index_build import resolve_num_shards

    num_shards = resolve_num_shards(index_path, num_shards)
    shards = sorted({md5_60_py(t) % num_shards for t in query_terms})
    # pass base_df (opened once) for repeated queries: partition pruning
    # happens at planning time from the cached file index, so reusing the
    # DataFrame keeps the pruning but skips per-query directory listing
    df = base_df if base_df is not None else (
        spark.read.option("basePath", f"{index_path}/postings").parquet(
            f"{index_path}/postings"
        )
    )
    return df.filter(
        F.col("shard").isin(shards) & F.col("term").isin(list(query_terms))
    )


def bm25_wand_from_index(spark, index_path: str, queries: DataFrame,
                         n_docs: int, avgdl: float, k: int = 10,
                         mode: str = "simple",
                         num_shards: int | None = None,
                         scorer: str = "auto",
                         base_df: DataFrame | None = None,
                         tombstones="auto") -> DataFrame:
    """End-to-end query path over a written index: analyze the query batch
    driver-side (tiny), prune the postings scan by shard + term, then
    score. Rank-identical to bm25_wand over the full postings relation."""
    q_rows = queries.collect()  # query batch is small by definition
    terms = _query_term_set(q_rows, mode)
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    pruned = read_postings_pruned(spark, index_path, sorted(terms),
                                  num_shards, base_df=base_df)
    if isinstance(tombstones, str) and tombstones == "auto":
        from cer_for_mti_spark.operators.index_build import load_tombstones

        tombstones = load_tombstones(spark, index_path)
    return bm25_wand(queries, pruned, n_docs, avgdl, k=k, mode=mode,
                     scorer=scorer, tombstones=tombstones)


def bm25_from_postings_naive(queries: DataFrame, postings: DataFrame,
                             n_docs: int, avgdl: float, k: int = 10,
                             mode: str = "simple") -> DataFrame:
    """Exhaustive scorer over the COMPRESSED postings (decodes, no skipping)
    — verifies the codec path against bm25_naive and gives WAND a same-input
    exhaustive twin for tests."""
    qt = query_terms(queries, mode)
    fetched = postings.join(F.broadcast(qt), "term")

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        acc: dict[int, float] = {}
        for i in range(len(pdf)):
            row = pdf.iloc[i]
            ids, imps, _, _, _ = _decode_cursor(row, n_docs, avgdl)
            for d, s in zip(ids.tolist(), imps.tolist()):
                acc[d] = acc.get(d, 0.0) + s
        ranked = sorted(
            ((round(s, 6), d) for d, s in acc.items()), key=lambda x: (-x[0], x[1])
        )[:k]
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for _, d in ranked],
                "score": [s for s, _ in ranked],
                "rank": list(range(1, len(ranked) + 1)),
            }
        )

    return fetched.groupBy("query_id").applyInPandas(score_group, TOPK_SCHEMA)
