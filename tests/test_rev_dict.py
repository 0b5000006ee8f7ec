"""Reversed term-dictionary sidecar (operators/rev_dict.py): suffix
probes equal an endswith filter of the forward dictionary, leading
wildcards become range seeks on indexes carrying the sidecar, and the
sidecar rides the index lifecycle (append deltas summing to global df,
compaction regen after purges, manifest + vacuum, crash repair,
in-flight refusal)."""
from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import query_expand as qe
from cer_for_mti_spark.operators import rev_dict as rv


def _key(df):
    return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                  for r in df.collect())


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
    rv.write_rev_dict(spark, idx)
    return docs, idx, avgdl


def _rev_of(spark, idx):
    """Committed sidecar as {(rev, term, df)} with per-batch deltas
    summed (the reader convention)."""
    return {
        (r.rev, r.term, r.df)
        for r in ib.read_index_rel(spark, idx, "rev_dict")
        .groupBy("rev", "term")
        .agg(F.sum("df").cast("long").alias("df")).collect()
    }


def test_suffix_probe_equals_endswith(spark, tmp_path):
    _docs, idx, _ = _build(spark, tmp_path, "rv_probe", n=200, seed=5)
    full = {(r.term, r.df)
            for r in ib.read_term_dict(spark, idx).collect()}
    for suf in ("a", "an", "em", "zzz"):
        got = {(r.term, r.df)
               for r in rv.read_rev_dict_terms(spark, idx, [suf]).collect()}
        want = {(t, d) for t, d in full if t.endswith(suf)}
        assert got == want, suf
    # multi-suffix probe is the union
    got2 = {(r.term, r.df)
            for r in rv.read_rev_dict_terms(spark, idx,
                                            ["an", "em"]).collect()}
    assert got2 == {(t, d) for t, d in full
                    if t.endswith("an") or t.endswith("em")}

    # the probe is a pushed StartsWith on the rev column
    plan = (rv.read_rev_dict_terms(spark, idx, ["an"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "StartsWith" in plan, plan


def test_leading_wildcard_seeks_rev_sidecar(spark, tmp_path):
    """With the sidecar, leading wildcards run WITHOUT allow_leading and
    rank-identical to the open-relation path; a both-ends-open pattern
    is still refused (no seekable literal at either end)."""
    docs, idx, avgdl = _build(spark, tmp_path, "rv_idx", n=200, seed=5)
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, _ = ib.corpus_stats(ds)
    qs = spark.createDataFrame(
        [(0, "*stem join"), (1, "*ime"), (2, "da*a *ata")],
        "query_id int, query string")
    mem = _key(qe.bm25_wildcard(qs, dt, ds, n, avgdl, k=10))
    viaidx = _key(qe.bm25_wildcard_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4))
    assert mem == viaidx and mem

    both_open = spark.createDataFrame([(0, "*at*")],
                                      "query_id int, query string")
    with pytest.raises(ValueError, match="allow_leading"):
        qe.bm25_wildcard_sharded_from_index(
            spark, idx, both_open, n, avgdl, k=10, num_shards=4)
    got = _key(qe.bm25_wildcard_sharded_from_index(
        spark, idx, both_open, n, avgdl, k=10, num_shards=4,
        allow_leading=True))
    assert got == _key(qe.bm25_wildcard(both_open, dt, ds, n, avgdl,
                                        k=10)) and got


def test_rev_dict_append_sums_to_global_df(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_app", split=80)
    new = docs.filter(F.col("doc_id") >= 80)
    # kill between unit commits, then resume — sidecar equals a
    # from-scratch build over the full corpus
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=2)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    _, idx_full, _ = _build(spark, tmp_path, "rv_full")
    got = _rev_of(spark, idx)
    assert got == _rev_of(spark, idx_full) and got
    # probe df equals the forward dictionary df
    td = {r.term: r.df for r in ib.read_term_dict(spark, idx).collect()}
    some_suf = sorted({t[-1] for t in list(td)[:5]})
    for r in rv.read_rev_dict_terms(spark, idx, some_suf).collect():
        assert r.df == td[r.term], r.term


def test_append_without_sidecar_stages_nothing(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_none", split=80)
    shutil.rmtree(f"{idx}/rev_dict")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    assert not os.path.isdir(f"{idx}/rev_dict")


def test_rev_dict_compaction_regenerates_with_purge(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_cmp")
    pre = _rev_of(spark, idx)
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    ib.delete_docs(spark, idx, victims)
    assert _rev_of(spark, idx) == pre  # lazy until compaction
    ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    post = _rev_of(spark, idx)

    survivors = docs.join(victims, "doc_id", "left_anti")
    dt = ib.build_doc_terms(survivors).cache()
    ds = ib.build_doc_stats(dt)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=120)
    idx2 = str(tmp_path / "rv_scratch")
    ib.write_runs_index(runs, ds, idx2, num_shards=4)
    rv.write_rev_dict(spark, idx2)
    assert post == _rev_of(spark, idx2)
    assert post != pre


def test_rev_dict_manifest_mode_and_vacuum(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_m", split=80,
                              commit_mode="manifest")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    full = _rev_of(spark, idx)
    _, idx_full, _ = _build(spark, tmp_path, "rv_m_full")
    assert full == _rev_of(spark, idx_full)

    torn = f"{idx}/rev_dict/b9999-torn.parquet"
    with open(torn, "wb") as f:
        f.write(b"\x00junk" * 64)
    assert _rev_of(spark, idx) == full  # invisible to manifest readers
    res = ib.vacuum_index(idx)
    assert res["removed"] == 1 and not os.path.exists(torn)
    assert _rev_of(spark, idx) == full


def test_rev_dict_compaction_crash_rolls_forward(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_crash")
    full = _rev_of(spark, idx)
    staging = f"{idx}/.compact_staging"
    os.makedirs(staging, exist_ok=True)
    os.rename(f"{idx}/rev_dict", f"{staging}/rev_dict")
    assert not os.path.isdir(f"{idx}/rev_dict")
    rv.read_rev_dict_terms(spark, idx, ["a"]).collect()
    assert os.path.isdir(f"{idx}/rev_dict")
    assert _rev_of(spark, idx) == full


def test_write_refuses_inflight_batch(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "rv_inflight", split=80)
    shutil.rmtree(f"{idx}/rev_dict")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)  # crash mid-batch
    with pytest.raises(ValueError, match="staged but not fully committed"):
        rv.write_rev_dict(spark, idx)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)  # resume
    rv.write_rev_dict(spark, idx)
    _, idx_full, _ = _build(spark, tmp_path, "rv_inflight_full")
    assert _rev_of(spark, idx) == _rev_of(spark, idx_full)
