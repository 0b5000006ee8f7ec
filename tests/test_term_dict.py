"""Sorted term-dictionary sidecar (index_build.read_term_dict):
lifecycle parity with the runs relation — base write, per-batch append
deltas, kill/resume, compaction purge, manifest mode, and the
pre-sidecar fallback. The invariant everywhere: read_term_dict equals
the (term, global df) aggregation of the committed runs exactly."""
from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import query_expand as qe


def _dict_of(df):
    return {(r.term, r.df) for r in df.collect()}


def _runs_derived(spark, idx):
    return _dict_of(
        ib.read_index_rel(spark, idx, "runs", with_base_path=True)
        .groupBy("term").agg(F.sum("df").cast("long").alias("df")))


def _build(spark, tmp_path, name, n=120, seed=21, split=None,
           commit_mode="rename"):
    docs = datagen.generate_webtext(spark, n, seed=seed).cache()
    old = docs if split is None else docs.filter(F.col("doc_id") < split)
    dt = ib.build_doc_terms(old).cache()
    ds = ib.build_doc_stats(dt)
    _, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / name)
    ib.write_runs_index(runs, ds, idx, num_shards=4,
                        commit_mode=commit_mode)
    return docs, idx, avgdl


def test_term_dict_write_read_and_fallback(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "td_base")
    assert ib.has_term_dict(idx)
    full = _dict_of(ib.read_term_dict(spark, idx))
    assert full == _runs_derived(spark, idx) and full

    # prefix pruning pushes into the sidecar scan
    pruned = ib.read_term_dict(spark, idx, prefixes=["s", "d"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan, plan
    want = {(t, d) for t, d in full if t[:1] in ("s", "d")}
    assert _dict_of(pruned) == want and want
    # empty prefix list -> empty dictionary
    assert ib.read_term_dict(spark, idx, prefixes=[]).count() == 0

    # pre-sidecar index: fallback derives the same dictionary from runs
    shutil.rmtree(f"{idx}/term_dict")
    assert not ib.has_term_dict(idx)
    assert _dict_of(ib.read_term_dict(spark, idx)) == full
    assert _dict_of(ib.read_term_dict(spark, idx, prefixes=["s", "d"])) \
        == want


def test_term_dict_append_kill_resume(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "td_app", split=80)
    new = docs.filter(F.col("doc_id") >= 80)

    # kill between unit commits, then resume — dict equals a
    # from-scratch build over the full corpus
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    got = _dict_of(ib.read_term_dict(spark, idx))
    assert got == _runs_derived(spark, idx)

    _, idx_full, _ = _build(spark, tmp_path, "td_full")
    assert got == _dict_of(ib.read_term_dict(spark, idx_full))


def test_append_to_presidecar_index_stays_runs_derived(spark, tmp_path):
    """Appending to an index written before the sidecar existed must NOT
    create a dict holding only the delta's counts — that would corrupt
    global df. The index stays runs-derived and correct."""
    docs, idx, avgdl = _build(spark, tmp_path, "td_old", split=80)
    shutil.rmtree(f"{idx}/term_dict")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    assert not os.path.isdir(f"{idx}/term_dict")
    assert _dict_of(ib.read_term_dict(spark, idx)) \
        == _runs_derived(spark, idx)


def test_term_dict_compaction_applies_purge(spark, tmp_path):
    """Deletes are lazy in the dict (df unchanged) until compaction,
    which regenerates it from the purged runs — equal to a from-scratch
    dict over the survivors."""
    docs, idx, avgdl = _build(spark, tmp_path, "td_cmp")
    pre = _dict_of(ib.read_term_dict(spark, idx))
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    ib.delete_docs(spark, idx, victims)
    assert _dict_of(ib.read_term_dict(spark, idx)) == pre  # lazy

    ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    post = _dict_of(ib.read_term_dict(spark, idx))
    assert post == _runs_derived(spark, idx)

    survivors = docs.join(victims, "doc_id", "left_anti")
    dt = ib.build_doc_terms(survivors).cache()
    ds = ib.build_doc_stats(dt)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=120)
    idx2 = str(tmp_path / "td_scratch")
    ib.write_runs_index(runs, ds, idx2, num_shards=4)
    assert post == _dict_of(ib.read_term_dict(spark, idx2))
    assert post != pre


def test_term_dict_manifest_mode_and_vacuum(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "td_m", split=80,
                              commit_mode="manifest")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    full = _dict_of(ib.read_term_dict(spark, idx))
    assert full == _runs_derived(spark, idx)

    # a torn uncommitted object in term_dict/ is invisible to readers
    # and removed by vacuum
    torn = f"{idx}/term_dict/b9999-torn.parquet"
    with open(torn, "wb") as f:
        f.write(b"\x00junk" * 64)
    assert _dict_of(ib.read_term_dict(spark, idx)) == full
    res = ib.vacuum_index(idx)
    assert res["removed"] == 1 and not os.path.exists(torn)
    assert _dict_of(ib.read_term_dict(spark, idx)) == full


def test_term_dict_files_carry_disjoint_sorted_ranges(spark, tmp_path):
    """The range-seek property itself: term_dict data files hold
    disjoint, internally sorted term ranges, so parquet footer min/max
    stats prune whole files for any prefix predicate."""
    import pyarrow.parquet as pq

    _docs, idx, _avgdl = _build(spark, tmp_path, "td_rng", n=200, seed=13)
    spans = []
    for dp, _dn, fns in os.walk(f"{idx}/term_dict"):
        for fn in fns:
            if not fn.endswith(".parquet"):
                continue
            f = pq.ParquetFile(f"{dp}/{fn}")
            terms = f.read(columns=["term"]).column("term").to_pylist()
            if not terms:
                continue
            assert terms == sorted(terms), fn  # sorted within file
            spans.append((terms[0], terms[-1]))
    assert len(spans) > 1  # range-partitioned into multiple files
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint ranges across files


def test_term_dict_compaction_crash_rolls_forward(spark, tmp_path):
    """A compaction crash between the two term_dict renames leaves no
    term_dict dir but a complete staged replacement; readers and
    appenders must roll it forward instead of silently downgrading the
    index to the runs-derived fallback forever."""
    docs, idx, avgdl = _build(spark, tmp_path, "td_crash")
    full = _dict_of(ib.read_term_dict(spark, idx))
    os.makedirs(f"{idx}/.compact_staging", exist_ok=True)
    os.rename(f"{idx}/term_dict", f"{idx}/.compact_staging/term_dict")
    assert not os.path.isdir(f"{idx}/term_dict")
    assert _dict_of(ib.read_term_dict(spark, idx)) == full
    assert os.path.isdir(f"{idx}/term_dict")  # repaired, not fallback
    assert ib.has_term_dict(idx)


def test_prefix_query_identical_with_and_without_sidecar(spark, tmp_path):
    """bm25_prefix_sharded_from_index is result-identical whether the
    dictionary comes from the sidecar or the runs fallback."""
    docs, idx, avgdl = _build(spark, tmp_path, "td_q", n=200, seed=9)
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, _ = ib.corpus_stats(ds)
    qs = spark.createDataFrame([(0, "s* data"), (1, "w*")],
                               "query_id int, query string")

    def key():
        return sorted(
            (r.query_id, r.doc_id, r.rank, round(r.score, 6))
            for r in qe.bm25_prefix_sharded_from_index(
                spark, idx, qs, n, avgdl, k=10, num_shards=4,
                max_expansions=4).collect())

    with_sidecar = key()
    shutil.rmtree(f"{idx}/term_dict")
    assert key() == with_sidecar and with_sidecar
