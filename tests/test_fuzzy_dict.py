"""SymSpell-style delete-neighborhood fuzzy dictionary
(operators/fuzzy_dict.py): the SQL variant generator against its Python
twin, candidate-superset exactness (symspell expansion rank-identical to
the brute-force prefix_len=0 theta-join), and full sidecar lifecycle
parity with term_dict — base write, append deltas summing to global df,
compaction regeneration, manifest mode + vacuum, crash repair, and the
baked-depth guard."""
from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import fuzzy_dict as fz
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import query_expand as qe


def _key(df):
    return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                  for r in df.collect())


def _expanded_map(df):
    return {r.query_id: set((r.query or "").split()) for r in df.collect()}


def _build(spark, tmp_path, name, n=120, seed=21, split=None,
           commit_mode="rename", max_dist=1):
    docs = datagen.generate_webtext(spark, n, seed=seed).cache()
    old = docs if split is None else docs.filter(F.col("doc_id") < split)
    dt = ib.build_doc_terms(old).cache()
    ds = ib.build_doc_stats(dt)
    _, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / name)
    ib.write_runs_index(runs, ds, idx, num_shards=4,
                        commit_mode=commit_mode)
    fz.write_fuzzy_dict(spark, idx, max_dist=max_dist)
    return docs, idx, avgdl


def _fuzzy_of(spark, idx):
    """Committed sidecar as a global {(variant, term, df)} set (per-batch
    deltas summed, the reader convention)."""
    return {
        (r.variant, r.term, r.df)
        for r in ib.read_index_rel(spark, idx, "fuzzy_dict")
        .groupBy("variant", "term")
        .agg(F.sum("df").cast("long").alias("df")).collect()
    }


def test_variants_sql_matches_python(spark):
    random.seed(41)
    terms = sorted({
        "".join(random.choice("abcde") for _ in range(random.randint(1, 8)))
        for _ in range(300)
    })
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    for d in (1, 2):
        rows = df.select(
            "term", F.expr(fz._variants_expr("term", d)).alias("v")
        ).collect()
        for r in rows:
            assert set(r.v) == fz.delete_variants_py(r.term, d), (r.term, d)


def test_symspell_equals_bruteforce_prefix0(spark, tmp_path):
    """The headline equivalence: delete-neighborhood expansion is
    rank-identical to the brute-force full-dictionary theta-join with
    prefix_len=0 — including a pattern whose FIRST character is wrong,
    the case every shared-prefix pruning misses by construction."""
    docs = datagen.generate_webtext(spark, 300, seed=11).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    td = qe.term_dict_from_doc_terms(dt).cache()
    qs = spark.createDataFrame(
        [(0, "dataa"), (1, "xystem time"), (2, "zzznope"), (3, "wweb")],
        "query_id int, query string")

    pats = sorted({t for r in qs.collect() for t in r.query.split()})
    vocab = {r.term for r in td.collect()}
    for d in (1, 2):
        brute = _expanded_map(qe.expand_fuzzy(
            qs, td, max_dist=d, prefix_len=0))
        cand = fz.symspell_candidates(td, pats, max_dist=d)
        sym = _expanded_map(qe.expand_fuzzy_symspell(qs, cand, max_dist=d))
        assert sym == brute, d
        # the first-char edit is actually exercised (prefix pruning
        # would have missed it): 'xystem' -> 'system'
        if "system" in vocab:
            assert "system" in sym[1]


def test_bm25_symspell_open_equals_bruteforce(spark):
    docs = datagen.generate_webtext(spark, 250, seed=9).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    qs = spark.createDataFrame(
        [(0, "dataa"), (1, "xystem"), (2, "zzznope link")],
        "query_id int, query string")
    sym = _key(qe.bm25_fuzzy_symspell(qs, dt, ds, n, avgdl, k=10))
    brute = _key(qe.bm25_fuzzy(qs, dt, ds, n, avgdl, k=10, max_dist=1,
                               prefix_len=0))
    assert sym == brute and sym


def test_bm25_symspell_from_index_identity_and_pushdown(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_idx", n=200, seed=5)
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, _ = ib.corpus_stats(ds)
    qs = spark.createDataFrame(
        [(0, "dataa"), (1, "xystem time"), (2, "zzznope")],
        "query_id int, query string")
    mem = _key(qe.bm25_fuzzy_symspell(qs, dt, ds, n, avgdl, k=10))
    viaidx = _key(qe.bm25_fuzzy_symspell_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4))
    assert mem == viaidx and mem

    # the sidecar probe pushes the In predicate into the parquet scan
    cand = fz.read_fuzzy_candidates(spark, idx, ["dataa"])
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "variant" in plan and ("In(" in plan or "in(" in plan.lower()), \
        plan


def test_fuzzy_dict_append_sums_to_global_df(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_app", split=80)
    new = docs.filter(F.col("doc_id") >= 80)
    # kill between unit commits, then resume — sidecar equals a
    # from-scratch build over the full corpus
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=2)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    got = _fuzzy_of(spark, idx)

    _, idx_full, _ = _build(spark, tmp_path, "sy_full")
    assert got == _fuzzy_of(spark, idx_full) and got

    # candidate df equals the global dictionary df for every candidate
    td = {r.term: r.df for r in ib.read_term_dict(spark, idx).collect()}
    some = list(td)[:3] + ["dataa"]
    cand = fz.read_fuzzy_candidates(spark, idx, some)
    for r in cand.collect():
        assert r.df == td[r.term], (r.pat, r.term)


def test_append_to_no_sidecar_index_stages_nothing(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_old", split=80)
    shutil.rmtree(f"{idx}/fuzzy_dict")
    os.remove(f"{idx}/{fz.FUZZY_DICT_META_FILE}")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    assert not os.path.isdir(f"{idx}/fuzzy_dict")


def test_fuzzy_dict_compaction_regenerates_with_purge(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_cmp")
    pre = _fuzzy_of(spark, idx)
    victims = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    ib.delete_docs(spark, idx, victims)
    assert _fuzzy_of(spark, idx) == pre  # lazy until compaction

    ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    post = _fuzzy_of(spark, idx)

    survivors = docs.join(victims, "doc_id", "left_anti")
    dt = ib.build_doc_terms(survivors).cache()
    ds = ib.build_doc_stats(dt)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=120)
    idx2 = str(tmp_path / "sy_scratch")
    ib.write_runs_index(runs, ds, idx2, num_shards=4)
    fz.write_fuzzy_dict(spark, idx2, max_dist=1)
    assert post == _fuzzy_of(spark, idx2)
    assert post != pre


def test_fuzzy_dict_manifest_mode_and_vacuum(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_m", split=80,
                              commit_mode="manifest")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    full = _fuzzy_of(spark, idx)
    _, idx_full, _ = _build(spark, tmp_path, "sy_m_full")
    assert full == _fuzzy_of(spark, idx_full)

    torn = f"{idx}/fuzzy_dict/b9999-torn.parquet"
    with open(torn, "wb") as f:
        f.write(b"\x00junk" * 64)
    assert _fuzzy_of(spark, idx) == full  # invisible to manifest readers
    res = ib.vacuum_index(idx)
    assert res["removed"] == 1 and not os.path.exists(torn)
    assert _fuzzy_of(spark, idx) == full


def test_fuzzy_dict_compaction_crash_rolls_forward(spark, tmp_path):
    """Crash between the sidecar's two renames: no fuzzy_dict dir, a
    complete staged replacement — readers repair before probing."""
    docs, idx, avgdl = _build(spark, tmp_path, "sy_crash")
    full = _fuzzy_of(spark, idx)
    staging = f"{idx}/.compact_staging"
    os.makedirs(staging, exist_ok=True)
    os.rename(f"{idx}/fuzzy_dict", f"{staging}/fuzzy_dict")
    assert not os.path.isdir(f"{idx}/fuzzy_dict")
    cand = fz.read_fuzzy_candidates(spark, idx, ["dataa"])
    cand.collect()
    assert os.path.isdir(f"{idx}/fuzzy_dict")
    assert _fuzzy_of(spark, idx) == full


def test_write_refuses_inflight_batch(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_inflight", split=80)
    shutil.rmtree(f"{idx}/fuzzy_dict")
    os.remove(f"{idx}/{fz.FUZZY_DICT_META_FILE}")
    new = docs.filter(F.col("doc_id") >= 80)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)  # crash mid-batch
    with pytest.raises(ValueError, match="staged but not fully committed"):
        fz.write_fuzzy_dict(spark, idx, max_dist=1)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=120,
                         num_shards=4)  # resume
    fz.write_fuzzy_dict(spark, idx, max_dist=1)
    _, idx_full, _ = _build(spark, tmp_path, "sy_inflight_full")
    assert _fuzzy_of(spark, idx) == _fuzzy_of(spark, idx_full)


def test_query_deeper_than_baked_raises(spark, tmp_path):
    _docs, idx, _avgdl = _build(spark, tmp_path, "sy_depth", max_dist=1)
    with pytest.raises(ValueError, match="exceeds the sidecar's baked"):
        fz.read_fuzzy_candidates(spark, idx, ["dataa"], max_dist=2)
    # shallower queries against a deeper sidecar are fine (superset +
    # exact verify)
    _docs2, idx2, _ = _build(spark, tmp_path, "sy_depth2", max_dist=2)
    got = fz.read_fuzzy_candidates(spark, idx2, ["dataa"], max_dist=1)
    assert got.count() >= 0


def test_symspell_from_index_respects_tombstones(spark, tmp_path):
    docs, idx, avgdl = _build(spark, tmp_path, "sy_tomb", n=200, seed=5)
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, _ = ib.corpus_stats(ds)
    qs = spark.createDataFrame([(0, "dataa")], "query_id int, query string")
    pre = qe.bm25_fuzzy_symspell_from_index(
        spark, idx, qs, n, avgdl, k=100, num_shards=4).collect()
    victims = sorted({r.doc_id for r in pre})[:5]
    assert victims
    ib.delete_docs(
        spark, idx,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"))
    post = qe.bm25_fuzzy_symspell_from_index(
        spark, idx, qs, n, avgdl, k=100, num_shards=4).collect()
    assert post and not {r.doc_id for r in post} & set(victims)


def test_driver_side_expansion_identity(spark, tmp_path):
    """The from-index path's driver-side expansion (one probe job, pure
    Python verify/cap/rewrite) is row-identical to the DataFrame
    expansion expand_fuzzy_symspell — including first-char typos, OOV
    tokens, duplicate tokens, multi-token queries, and an empty query —
    and the Python levenshtein twin agrees with F.levenshtein."""
    import random

    from pyspark.sql import functions as F2

    docs = datagen.generate_webtext(spark, 200, seed=5).cache()
    dt = ib.build_doc_terms(docs).cache()
    td = qe.term_dict_from_doc_terms(dt).cache()
    qs_rows = [(0, "xystem"), (1, "dataa dataa time"), (2, "zzznope"),
               (3, ""), (4, "wweb xystem")]
    qs = spark.createDataFrame(qs_rows, "query_id int, query string")
    pats = sorted({t for _, q in qs_rows for t in q.split()})
    for d in (1, 2):
        cand = fz.symspell_candidates(td, pats, max_dist=d).cache()
        df_rows = sorted(
            (r.query_id, r.query)
            for r in qe.expand_fuzzy_symspell(qs, cand, max_dist=d)
            .collect())
        py_rows = sorted(qe.expand_symspell_driver(
            qs.collect(), cand.collect(), max_dist=d))
        assert py_rows == df_rows, d

    # the pure-Python levenshtein equals F.levenshtein on random pairs
    random.seed(23)
    pairs = [("".join(random.choice("abcd") for _ in range(random.randint(0, 7))),
              "".join(random.choice("abcd") for _ in range(random.randint(0, 7))))
             for _ in range(200)]
    pdf = spark.createDataFrame(pairs, "a string, b string").withColumn(
        "d", F2.levenshtein("a", "b"))
    for r in pdf.collect():
        assert qe._levenshtein_py(r.a, r.b) == r.d, (r.a, r.b)
