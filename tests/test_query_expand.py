"""Prefix (wildcard) and fuzzy (edit-distance) query expansion —
operators/query_expand.py. Ground-truth expansion on a handcrafted
vocabulary, the deterministic cap order, rank-identity between the
open-relation and written-index paths (with the StringStartsWith
pushdown asserted in the plan), degenerate cases, and the tombstone
interplay on the from-index path."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import query_expand as qe


def _corpus(spark):
    """Tiny handcrafted corpus with a controlled vocabulary:
    data/database/dates share the 'dat' prefix with distinct dfs."""
    rows = [
        (0, "data base"),
        (1, "data database"),
        (2, "data dates dog"),
        (3, "database dates"),
        (4, "dog base data"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _key(df):
    return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                  for r in df.collect())


def _expanded_map(df):
    return {r.query_id: set((r.query or "").split()) for r in df.collect()}


def test_expand_prefix_ground_truth(spark):
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame(
        [(0, "dat* dog"), (1, "zzz* base"), (2, "dog")],
        "query_id int, query string")
    got = _expanded_map(qe.expand_prefix(qs, td, max_expansions=50))
    # dfs: data=4, database=2, dates=2, dog=2, base=2
    assert got[0] == {"data", "database", "dates", "dog"}
    assert got[1] == {"base"}  # OOV prefix expands to nothing
    assert got[2] == {"dog"}

    # cap order: df DESC, term ASC — 'dat*' capped at 2 keeps data (df 4)
    # then database (df 2, alphabetically before dates)
    capped = _expanded_map(qe.expand_prefix(qs, td, max_expansions=2))
    assert capped[0] == {"data", "database", "dog"}


def test_expand_fuzzy_ground_truth(spark):
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame(
        [(0, "dataa"), (1, "dpg"), (2, "zzznope"), (3, "dog")],
        "query_id int, query string")
    got = _expanded_map(qe.expand_fuzzy(qs, td, max_dist=1, prefix_len=1))
    # dataa: data (1 deletion); dates/database are >1 away
    assert got[0] == {"data", "dataa"}
    # dpg: dog is distance 1 but prefix_len=1 requires same first char —
    # 'd'=='d' so it matches
    assert got[1] == {"dog", "dpg"}
    assert got[2] == {"zzznope"}  # OOV keeps only the literal
    assert got[3] == {"dog"}  # exact in-dict term: distance 0

    # prefix_len=2 excludes dpg→dog (shared prefix 'dp' != 'do')
    strict = _expanded_map(qe.expand_fuzzy(qs, td, max_dist=1,
                                           prefix_len=2))
    assert strict[1] == {"dpg"}

    # distance cap: max_dist=2 lets dates in from dataa
    wide = _expanded_map(qe.expand_fuzzy(qs, td, max_dist=2, prefix_len=1))
    assert "dates" in wide[0]


def test_fuzzy_cap_order(spark):
    """Cap prefers smaller distance first, then df, then term."""
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame([(0, "dates")], "query_id int, query string")
    # candidates at prefix 'd': dates(0), data(2)... with max_dist=2:
    # dates d=0, data d=2, database d=4(no) — cap 1 keeps dates only
    got = _expanded_map(qe.expand_fuzzy(qs, td, max_dist=2, prefix_len=1,
                                        max_expansions=1))
    assert got[0] == {"dates"}


def test_bm25_prefix_equals_manual_expansion(spark):
    docs = _corpus(spark)
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    qs = spark.createDataFrame([(0, "dat* dog")], "query_id int, query string")
    manual = spark.createDataFrame(
        [(0, "data database dates dog")], "query_id int, query string")
    got = _key(qe.bm25_prefix(qs, dt, ds, n, avgdl, k=10))
    want = _key(bm25.bm25_naive(manual, dt, ds, n, avgdl, k=10))
    assert got == want and got


def test_prefix_from_index_identity_and_pushdown(spark, tmp_path):
    """The from-index prefix path is rank-identical to the open-relation
    path, and its dictionary scan pushes StringStartsWith into the
    parquet scan."""
    docs = datagen.generate_webtext(spark, 300, seed=11).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "pfx_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    qs = spark.createDataFrame(
        [(0, "s* join"), (1, "c*"), (2, "zz* data"), (3, "qu* gr*")],
        "query_id int, query string")
    mem = _key(qe.bm25_prefix(qs, dt, ds, n, avgdl, k=10,
                              max_expansions=4))
    viaidx = _key(qe.bm25_prefix_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4, max_expansions=4))
    assert mem == viaidx and mem

    td = qe.term_dict_from_runs_index(spark, idx, ["s", "c"])
    plan = td._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan, plan


def test_fuzzy_from_index_identity(spark, tmp_path):
    docs = datagen.generate_webtext(spark, 300, seed=11).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "fz_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    qs = spark.createDataFrame(
        [(0, "dataa"), (1, "systen time"), (2, "zzznope")],
        "query_id int, query string")
    mem = _key(qe.bm25_fuzzy(qs, dt, ds, n, avgdl, k=10, max_dist=1,
                             prefix_len=1))
    viaidx = _key(qe.bm25_fuzzy_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4, max_dist=1,
        prefix_len=1))
    assert mem == viaidx and mem

    with pytest.raises(ValueError, match="prefix_len >= 1"):
        qe.bm25_fuzzy_sharded_from_index(
            spark, idx, qs, n, avgdl, num_shards=4, prefix_len=0)


def test_fuzzy_dist0_degrades_to_exact(spark):
    """max_dist=0 with in-vocabulary queries scores identically to the
    plain BM25 path (expansion = the terms themselves)."""
    docs = datagen.generate_webtext(spark, 200, seed=3).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    qs = spark.createDataFrame(
        [(0, "data web"), (1, "system")], "query_id int, query string")
    fz = _key(qe.bm25_fuzzy(qs, dt, ds, n, avgdl, k=10, max_dist=0))
    plain = _key(bm25.bm25_naive(qs, dt, ds, n, avgdl, k=10))
    assert fz == plain and fz


def test_prefix_from_index_respects_tombstones(spark, tmp_path):
    docs = datagen.generate_webtext(spark, 200, seed=5).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "tomb_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    qs = spark.createDataFrame([(0, "d*")], "query_id int, query string")
    pre = qe.bm25_prefix_sharded_from_index(
        spark, idx, qs, n, avgdl, k=100, num_shards=4).collect()
    victims = sorted({r.doc_id for r in pre})[:5]
    assert victims
    ib.delete_docs(
        spark, idx,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"))
    post = qe.bm25_prefix_sharded_from_index(
        spark, idx, qs, n, avgdl, k=100, num_shards=4).collect()
    assert post and not {r.doc_id for r in post} & set(victims)


def test_empty_and_duplicate_patterns(spark):
    dt = ib.build_doc_terms(_corpus(spark)).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame(
        [(0, "zzz*"), (1, "dat* dat* data")], "query_id int, query string")
    # all-OOV-wildcard query expands to empty → zero result rows, but the
    # rewritten batch still carries the query_id with an empty string
    exp = qe.expand_prefix(qs, td)
    assert _expanded_map(exp)[0] == {""} or _expanded_map(exp)[0] == set()
    res = qe.bm25_prefix(qs, dt, ds, n, avgdl, k=10)
    got = _key(res)
    assert {q for q, *_ in got} == {1}  # only the non-empty query scores


# --- generalized wildcard (Lucene WildcardQuery) -------------------------

def test_expand_wildcard_ground_truth(spark):
    """'?' = exactly one char, '*' = any run, anywhere in the token;
    literal tokens pass through; cap order mirrors expand_prefix."""
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame(
        [(0, "d?g base"), (1, "*ase"), (2, "d*t*"), (3, "da*a"),
         (4, "zzz*zzz")],
        "query_id int, query string")
    got = _expanded_map(qe.expand_wildcard(qs, td, max_expansions=50))
    assert got[0] == {"dog", "base"}
    assert got[1] == {"base", "database"}          # leading wildcard
    assert got[2] == {"data", "database", "dates"}  # infix
    assert got[3] == {"data"}                       # bounded both ends
    assert got[4] == set()  # no completion -> empty query, no literal

    # cap order df DESC, term ASC: d*t* capped at 2 keeps data (df 4)
    # then database (df 2 < dates alphabetically)
    capped = _expanded_map(qe.expand_wildcard(qs, td, max_expansions=2))
    assert capped[2] == {"data", "database"}


def test_wildcard_trailing_star_equals_prefix(spark):
    """A trailing-'*'-only pattern through the wildcard path is exactly
    expand_prefix (same candidates, same cap order)."""
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame([(0, "dat* dog"), (1, "zzz* base")],
                               "query_id int, query string")
    for cap in (2, 50):
        a = _expanded_map(qe.expand_wildcard(qs, td, max_expansions=cap))
        b = _expanded_map(qe.expand_prefix(qs, td, max_expansions=cap))
        assert a == b


def test_wildcard_matchall_refused(spark):
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    for bad in ("*", "**", "?", "*?"):
        qs = spark.createDataFrame([(0, f"{bad} data")],
                                   "query_id int, query string")
        with pytest.raises(ValueError, match="no literal characters"):
            qe.expand_wildcard(qs, td)


def test_bm25_wildcard_from_index_identity_and_leading_guard(
        spark, tmp_path):
    docs = datagen.generate_webtext(spark, 300, seed=11).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "wc_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    qs = spark.createDataFrame(
        [(0, "s?stem join"), (1, "da*a"), (2, "t*m*")],
        "query_id int, query string")
    mem = _key(qe.bm25_wildcard(qs, dt, ds, n, avgdl, k=10,
                                max_expansions=4))
    viaidx = _key(qe.bm25_wildcard_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4, max_expansions=4))
    assert mem == viaidx and mem

    # leading wildcard: refused by default, identical when allowed
    lead = spark.createDataFrame([(0, "*stem join")],
                                 "query_id int, query string")
    with pytest.raises(ValueError, match="allow_leading"):
        qe.bm25_wildcard_sharded_from_index(
            spark, idx, lead, n, avgdl, k=10, num_shards=4)
    got = _key(qe.bm25_wildcard_sharded_from_index(
        spark, idx, lead, n, avgdl, k=10, num_shards=4,
        allow_leading=True))
    want = _key(qe.bm25_wildcard(lead, dt, ds, n, avgdl, k=10))
    assert got == want and got


# --- regexp term queries (Lucene RegexpQuery) -----------------------------

def test_expand_regexp_ground_truth(spark):
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    qs = spark.createDataFrame(
        [(0, "/d.g/ base"), (1, "/(data|dog)/"), (2, "/da.a(base)?/"),
         (3, "/zz+/")],
        "query_id int, query string")
    got = _expanded_map(qe.expand_regexp(qs, td, max_expansions=50))
    assert got[0] == {"dog", "base"}
    assert got[1] == {"data", "dog"}
    assert got[2] == {"data", "database"}
    assert got[3] == set()  # no match, no literal kept

    # cap order df DESC, term ASC (data df=4 first)
    capped = _expanded_map(qe.expand_regexp(qs, td, max_expansions=1))
    assert capped[2] == {"data"}


def test_regexp_invalid_or_empty_raises(spark):
    dt = ib.build_doc_terms(_corpus(spark))
    td = qe.term_dict_from_doc_terms(dt)
    for bad in ("/(/", "//"):
        qs = spark.createDataFrame([(0, f"{bad} data")],
                                   "query_id int, query string")
        with pytest.raises(ValueError):
            qe.expand_regexp(qs, td)


def test_regexp_literal_prefix_extraction():
    f = qe._regex_literal_prefix
    assert f("dog") == "dog"
    assert f("d.g") == "d"
    assert f("da[tb]a") == "da"
    assert f("ab?c") == "a"      # 'b?' optional -> prefix stops at 'a'
    assert f("(data|dog)") == ""
    assert f(".*x") == ""
    assert f("scan{1,2}") == "sca"  # 'n{1,2}' quantified
    # top-level alternation: 'data' binds only to the first branch — a
    # 'data' dictionary seek would silently drop every 'dog' match
    assert f("data|dog") == ""
    assert f("a|b|c") == ""
    assert f("da(t|g)a") == "da"       # group-level '|' is not top-level
    assert f(r"a\|b") == r"a"          # escaped '|' is a literal; stops
    assert f("x[a|b]y") == "x"         # class-level '|' is a literal


def test_bm25_regexp_from_index_identity_and_guard(spark, tmp_path):
    docs = datagen.generate_webtext(spark, 300, seed=11).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "re_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=4)

    qs = spark.createDataFrame(
        [(0, "/s.stem/ join"), (1, "/da(ta)+/"), (2, "/t.me(s)?/")],
        "query_id int, query string")
    mem = _key(qe.bm25_regexp(qs, dt, ds, n, avgdl, k=10,
                              max_expansions=4))
    viaidx = _key(qe.bm25_regexp_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4, max_expansions=4))
    assert mem == viaidx and mem

    free = spark.createDataFrame([(0, "/[bd]ata/ join")],
                                 "query_id int, query string")
    with pytest.raises(ValueError, match="allow_full_scan"):
        qe.bm25_regexp_sharded_from_index(
            spark, idx, free, n, avgdl, k=10, num_shards=4)
    got = _key(qe.bm25_regexp_sharded_from_index(
        spark, idx, free, n, avgdl, k=10, num_shards=4,
        allow_full_scan=True))
    want = _key(qe.bm25_regexp(free, dt, ds, n, avgdl, k=10))
    assert got == want and got
