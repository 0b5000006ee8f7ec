"""Document deletes (tombstones): the delete leg of the index lifecycle.

Semantics under test (index_build.delete_docs):
- LAZY, Lucene-style — df/N/avgdl and the run bytes are untouched; every
  query path drops tombstoned docs BEFORE its top-k cut (ground-truthed
  against naive full-rank + filter + re-rank).
- atomic + resumable + idempotent sidecar writes through the append
  lineage protocol; appends refuse to adopt a crashed delete batch.
- compaction PHYSICALLY purges: runs re-encoded without the deleted
  docs (content-identical to a from-scratch build over the survivors at
  the frozen bake avgdl), membership sidecars shrink, tombstones clear.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import phrase as ph

QS = [(0, "the data"), (1, "insulin protein"), (2, "zzz"), (3, "the")]


def _key(rows):
    return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                  for r in rows)


def _corpus(spark, n=120, seed=41):
    docs = datagen.generate_webtext(spark, n, seed=seed).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt).cache()
    n_docs, avgdl = ib.corpus_stats(ds)
    return docs, dt, ds, n_docs, avgdl


def _lazy_ground_truth(spark, queries, dt, ds, n, avgdl, tomb_ids, k=10):
    """Naive BM25 at FULL-corpus stats, ranked over all docs, tombstoned
    docs dropped BEFORE the top-k cut — the lazy-delete definition."""
    full = bm25.bm25_naive(queries, dt, ds, n, avgdl, k=1 << 30)
    kept = full.filter(~F.col("doc_id").isin([int(i) for i in tomb_ids]))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (kept.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def test_tombstone_masking_all_scorers(spark):
    """Every BM25 path (TAAT, WAND, sharded, conjunctive, exclusion)
    drops tombstoned docs before the top-k cut and matches the lazy
    ground truth; tombstoned docs never surface."""
    docs, dt, ds, n, avgdl, = _corpus(spark)
    tomb_ids = np.arange(3, 120, 7, dtype=np.int64)
    queries = spark.createDataFrame(QS, "query_id int, query string")
    postings = ib.build_postings(dt, ds, avgdl, salt=4, n_docs=n).cache()
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n).cache()

    want = _key(_lazy_ground_truth(
        spark, queries, dt, ds, n, avgdl, tomb_ids).collect())
    got_taat = _key(bm25.bm25_wand(queries, postings, n, avgdl, k=10,
                                   scorer="taat",
                                   tombstones=tomb_ids).collect())
    got_wand = _key(bm25.bm25_wand(queries, postings, n, avgdl, k=10,
                                   scorer="wand",
                                   tombstones=tomb_ids).collect())
    got_shard = _key(bm25.bm25_wand_sharded(queries, runs, n, avgdl, k=10,
                                            tombstones=tomb_ids).collect())
    assert got_taat == got_wand == got_shard == want
    hit_docs = {d for _, d, _, _ in want}
    assert not hit_docs & set(tomb_ids.tolist())
    # the mask actually changed something (a tombstoned doc was in the
    # unmasked top-k, otherwise the test proves nothing)
    unmasked = _key(bm25.bm25_wand(queries, postings, n, avgdl,
                                   k=10).collect())
    assert unmasked != want

    # conjunctive + exclusion twins honor the same mask
    conj = bm25.bm25_conjunctive(queries, postings, n, avgdl, k=10,
                                 tombstones=tomb_ids).collect()
    conj_s = bm25.bm25_conjunctive_sharded(queries, runs, n, avgdl, k=10,
                                           tombstones=tomb_ids).collect()
    assert _key(conj) == _key(conj_s)
    assert not {r.doc_id for r in conj} & set(tomb_ids.tolist())
    qex = spark.createDataFrame(
        [(qid, q, "protein") for qid, q in QS],
        "query_id int, query string, exclude string")
    exc = bm25.bm25_exclude(queries.sparkSession.createDataFrame(
        [(qid, q, "protein") for qid, q in QS],
        "query_id int, query string, exclude string"), postings, n, avgdl,
        k=10, tombstones=tomb_ids).collect()
    exc_s = bm25.bm25_exclude_sharded(qex, runs, n, avgdl, k=10,
                                      tombstones=tomb_ids).collect()
    assert _key(exc) == _key(exc_s)
    assert not {r.doc_id for r in exc} & set(tomb_ids.tolist())


def test_delete_docs_sidecar_and_from_index(spark, tmp_path):
    """delete_docs writes the tombstone sidecar atomically; the written-
    index query path honours it by default; deletes are idempotent and
    membership-checked; a crashed delete resumes; an append refuses to
    adopt a crashed delete batch."""
    docs, dt, ds, n, avgdl = _corpus(spark)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "del_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)
    queries = spark.createDataFrame(QS, "query_id int, query string")

    tomb_ids = np.arange(3, 120, 7, dtype=np.int64)
    del_df = spark.createDataFrame([(int(i),) for i in tomb_ids],
                                   "doc_id long")
    assert ib.delete_docs(spark, idx, del_df) == len(tomb_ids)
    # idempotent; unknown ids ignored
    assert ib.delete_docs(spark, idx, del_df) == 0
    ghost = spark.createDataFrame([(10_000,)], "doc_id long")
    assert ib.delete_docs(spark, idx, ghost) == 0

    got = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, queries, n, avgdl, k=10, num_shards=4).collect())
    want = _key(_lazy_ground_truth(
        spark, queries, dt, ds, n, avgdl, tomb_ids).collect())
    assert got == want

    # crash mid-delete: lineage row missing, resume completes; an append
    # must NOT adopt the delete batch
    idx2 = str(tmp_path / "del_crash")
    ib.write_runs_index(runs, ds, idx2, num_shards=4)
    ib.delete_docs(spark, idx2, del_df, fail_after=0)
    assert ib._find_inflight_batch(idx2) is not None
    new = datagen.generate_webtext(spark, 130, seed=41).filter(
        F.col("doc_id") >= 120)
    with pytest.raises(ValueError, match="delete"):
        ib.append_runs_index(spark, idx2, new, avgdl, salt=4, n_docs=130,
                             num_shards=4, batch_id=ib._find_inflight_batch(idx2))
    assert ib.delete_docs(spark, idx2, del_df) == len(tomb_ids)
    assert ib._find_inflight_batch(idx2) is None
    got2 = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx2, queries, n, avgdl, k=10, num_shards=4).collect())
    assert got2 == want

    # load_tombstones guard: past max_ids point at compaction
    with pytest.raises(ValueError, match="compact"):
        ib.load_tombstones(spark, idx, max_ids=3)


def test_compaction_purges_tombstones(spark, tmp_path):
    """compact_runs_index physically removes tombstoned docs: the purged
    index content equals a from-scratch build over the SURVIVORS at the
    frozen bake avgdl and the same bucket basis; doc_stats shrinks; the
    sidecar clears; post-purge queries at the surviving N match the
    from-scratch runs."""
    docs, dt, ds, n, avgdl = _corpus(spark)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "purge_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)
    tomb_ids = np.arange(3, 120, 7, dtype=np.int64)
    ib.delete_docs(spark, idx, spark.createDataFrame(
        [(int(i),) for i in tomb_ids], "doc_id long"))

    before, after = ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    assert after <= before
    import os
    assert not os.path.isdir(f"{idx}/tombstones")
    assert spark.read.parquet(f"{idx}/doc_stats").count() == \
        120 - len(tomb_ids)

    # content identity vs from-scratch over survivors (same avgdl, same
    # n_docs bucket basis)
    surv = docs.filter(~F.col("doc_id").isin([int(i) for i in tomb_ids]))
    dt_s = ib.build_doc_terms_narrow(surv)  # carries doclen
    runs_s = ib.build_posting_runs(dt_s, None, avgdl, salt=4, n_docs=120)
    got = {
        (r["term"], r["bucket"]): (r["df"], bytes(r["doc_ids"]),
                                   bytes(r["tfs"]), bytes(r["doclens"]),
                                   tuple(r["block_last"]),
                                   tuple(r["block_max"]), r["max_impact"])
        for r in spark.read.option("basePath", f"{idx}/runs").parquet(
            f"{idx}/runs").collect()}
    want = {
        (r["term"], r["bucket"]): (r["df"], bytes(r["doc_ids"]),
                                   bytes(r["tfs"]), bytes(r["doclens"]),
                                   tuple(r["block_last"]),
                                   tuple(r["block_max"]), r["max_impact"])
        for r in runs_s.collect()}
    assert got == want

    # post-purge query at surviving N == query over from-scratch runs
    queries = spark.createDataFrame(QS, "query_id int, query string")
    n_surv = 120 - len(tomb_ids)
    got_q = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, queries, n_surv, avgdl, k=10, num_shards=4).collect())
    want_q = _key(bm25.bm25_wand_sharded(
        queries, runs_s, n_surv, avgdl, k=10).collect())
    assert got_q == want_q


def test_phrase_delete_and_purge(spark, tmp_path):
    """Positional twin: tombstoned docs drop out of phrase hits at query
    time (anti-join) and are physically purged by the positional
    compactor — post-purge bytes equal a from-scratch positional build
    over the survivors; docs sidecar shrinks; sidecar clears."""
    docs, _, _, _, _ = _corpus(spark)
    pruns = ph.build_positional_runs(docs, salt=8, n_docs=120)
    idx = str(tmp_path / "pos_del")
    ph.write_positional_runs_index(pruns, idx, num_shards=4, docs=docs)
    phrases = spark.createDataFrame([(0, "the data"), (1, "the")],
                                    "query_id int, query string")
    before_hits = ph.phrase_search_sharded_from_index(
        spark, idx, phrases, num_shards=4).collect()
    hit_docs = sorted({r.doc_id for r in before_hits})
    assert hit_docs, "fixture phrases must hit"
    tomb_ids = np.asarray(hit_docs[::2], dtype=np.int64)  # delete half
    ib.delete_docs(spark, idx, spark.createDataFrame(
        [(int(i),) for i in tomb_ids], "doc_id long"))

    after_hits = ph.phrase_search_sharded_from_index(
        spark, idx, phrases, num_shards=4).collect()
    key = lambda rows: sorted((r.phrase_id, r.doc_id, r.n_matches)
                              for r in rows)
    assert key(after_hits) == key(
        [r for r in before_hits if r.doc_id not in set(tomb_ids.tolist())])

    # physical purge
    ph.compact_positional_runs(spark, idx, num_shards=4)
    import os
    assert not os.path.isdir(f"{idx}/tombstones")
    assert spark.read.parquet(f"{idx}/docs").count() == \
        120 - len(tomb_ids)
    surv = docs.filter(~F.col("doc_id").isin([int(i) for i in tomb_ids]))
    runs_s = ph.build_positional_runs(surv, salt=8, n_docs=120)
    got = {
        (r["term"], r["bucket"]): (r["df"], bytes(r["doc_ids"]),
                                   bytes(r["tfs"]), bytes(r["positions"]))
        for r in spark.read.option(
            "basePath", f"{idx}/positional_runs").parquet(
            f"{idx}/positional_runs").collect()}
    want = {
        (r["term"], r["bucket"]): (r["df"], bytes(r["doc_ids"]),
                                   bytes(r["tfs"]), bytes(r["positions"]))
        for r in runs_s.collect()}
    assert got == want
    purged = ph.phrase_search_sharded_from_index(
        spark, idx, phrases, num_shards=4).collect()
    assert key(purged) == key(after_hits)


def test_dedup_purge_wiring(spark, tmp_path):
    """dup_losers -> delete_docs: near-duplicate losers tombstone out of
    the live index; the canonical member of each group still retrieves."""
    from cer_for_mti_spark.operators import dedup

    docs, dt, ds, n, avgdl = _corpus(spark)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "dedup_purge")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    pairs = spark.createDataFrame(
        [(5, 12), (12, 33), (40, 41)], "doc_a long, doc_b long")
    losers = dedup.dup_losers(pairs)
    assert sorted(r.doc_id for r in losers.collect()) == [12, 33, 41]
    assert ib.delete_docs(spark, idx, losers) == 3

    queries = spark.createDataFrame(QS, "query_id int, query string")
    got = bm25.bm25_wand_sharded_from_index(
        spark, idx, queries, n, avgdl, k=120, num_shards=4).collect()
    got_docs = {r.doc_id for r in got}
    assert not got_docs & {12, 33, 41}
    assert 5 in got_docs and 40 in got_docs  # canonicals survive


def test_distributed_purge_identity(spark, tmp_path):
    """Past the broadcast bound, both compactors switch to the
    distributed purge plan (ids range-joined to their doc-range bucket,
    per-bucket sorted arrays as a merge-UDF column — no full-set
    broadcast, no driver materialization). Forcing that path with
    tombstone_broadcast_max=0 must produce byte-identical indexes to
    the broadcast path on twin copies, for BOTH layouts, and ANN
    compaction's non-broadcast anti-join must purge identically too."""
    import os
    import shutil as sh

    docs, dt, ds, n, avgdl = _corpus(spark)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    tomb_ids = np.arange(2, 120, 5, dtype=np.int64)
    tomb_df = spark.createDataFrame([(int(i),) for i in tomb_ids],
                                    "doc_id long")

    # --- BM25 runs layout ---
    idx_b = str(tmp_path / "bm25_bcast")
    ib.write_runs_index(runs, ds, idx_b, num_shards=4)
    ib.delete_docs(spark, idx_b, tomb_df)
    idx_d = str(tmp_path / "bm25_dist")
    sh.copytree(idx_b, idx_d)
    ib.compact_runs_index(spark, idx_b, avgdl, num_shards=4)
    ib.compact_runs_index(spark, idx_d, avgdl, num_shards=4,
                          tombstone_broadcast_max=0)

    def runs_content(idx):
        return {
            (r["term"], r["bucket"]): (
                r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                bytes(r["doclens"]), tuple(r["block_last"]),
                tuple(r["block_max"]), r["max_impact"])
            for r in spark.read.option("basePath", f"{idx}/runs").parquet(
                f"{idx}/runs").collect()}

    assert runs_content(idx_b) == runs_content(idx_d)
    assert not os.path.isdir(f"{idx_d}/tombstones")
    assert spark.read.parquet(f"{idx_d}/doc_stats").count() == \
        120 - len(tomb_ids)

    # --- positional layout ---
    pruns = ph.build_positional_runs(docs, salt=8, n_docs=120)
    pidx_b = str(tmp_path / "pos_bcast")
    ph.write_positional_runs_index(pruns, pidx_b, num_shards=4, docs=docs)
    ib.delete_docs(spark, pidx_b, tomb_df)
    pidx_d = str(tmp_path / "pos_dist")
    sh.copytree(pidx_b, pidx_d)
    ph.compact_positional_runs(spark, pidx_b, num_shards=4)
    ph.compact_positional_runs(spark, pidx_d, num_shards=4,
                               tombstone_broadcast_max=0)

    def pos_content(idx):
        return {
            (r["term"], r["bucket"]): (
                r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                bytes(r["positions"]))
            for r in spark.read.option(
                "basePath", f"{idx}/positional_runs").parquet(
                f"{idx}/positional_runs").collect()}

    assert pos_content(pidx_b) == pos_content(pidx_d)
    assert not os.path.isdir(f"{pidx_d}/tombstones")
    assert spark.read.parquet(f"{pidx_d}/docs").count() == \
        120 - len(tomb_ids)
