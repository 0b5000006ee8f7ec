"""Phrase prefix search (Lucene MultiPhraseQuery rewrite,
phrase.py phrase_prefix_*): trailing-'*' slots expand to capped
dictionary completions in term order; a slot matches ANY completion.
Checked against a per-doc token-window brute force with per-slot
membership sets, plus merged ≡ sharded ≡ from-index identity, cap
semantics, empty-expansion slots, slop interaction, tombstones, the
pure union-of-alternatives core, and dictionary-probe pushdown."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import phrase as ph

CAP = ph.PHRASE_PREFIX_MAX_EXPANSIONS


@pytest.fixture(scope="module")
def positional(spark, webtext):
    return ph.build_positional_postings(webtext, mode="simple").cache()


@pytest.fixture(scope="module")
def pos_runs(spark, webtext):
    return ph.build_positional_runs(webtext, mode="simple", salt=8).cache()


@pytest.fixture(scope="module")
def toks(webtext):
    return {r.doc_id: [t for t in r.text.split() if t]
            for r in webtext.collect()}


@pytest.fixture(scope="module")
def vocab(toks):
    return {t for tk in toks.values() for t in tk}


def _slot_sets(vocab, query, cap=CAP):
    """Per-slot allowed-term sets under the engine's expansion rule:
    first `cap` glob completions in term order; plain tokens are
    themselves."""
    from fnmatch import fnmatchcase

    sets = []
    for tok, isg in ph._split_prefix_tokens(query):
        if isg:
            sets.append(set(sorted(
                t for t in vocab if fnmatchcase(t, tok))[:cap]))
        else:
            sets.append({tok})
    return sets


def _brute_multi(tokens, sets, slop=0):
    """Reference matcher with per-slot membership sets — the window scan
    for adjacency, the greedy ordered chain for slop (mirrors
    test_phrase._brute_near with `in set` instead of `==`)."""
    L = len(sets)
    if any(not s for s in sets):
        return 0
    if slop == 0:
        return sum(
            all(tokens[i + j] in sets[j] for j in range(L))
            for i in range(len(tokens) - L + 1))
    n = 0
    for p0, t in enumerate(tokens):
        if t not in sets[0]:
            continue
        last, ok = p0, True
        for i in range(1, L):
            nxt = next(
                (p for p in range(last + 1,
                                  min(p0 + i + slop, len(tokens) - 1) + 1)
                 if tokens[p] in sets[i]), None)
            if nxt is None:
                ok = False
                break
            last = nxt
        if ok:
            n += 1
    return n


def _want_map(toks, vocab, queries, cap=CAP, slop=0):
    want = {}
    for qid, q in enumerate(queries):
        sets = _slot_sets(vocab, q, cap)
        for d, tk in toks.items():
            c = _brute_multi(tk, sets, slop)
            if c:
                want[(qid, d)] = c
    return want


def _got_map(df):
    return {(r.phrase_id, r.doc_id): r.n_matches for r in df.collect()}


QUERIES = ["of th*", "da* the", "th* th*", "zzzznope* the", "the of"]


def test_prefix_vs_bruteforce(spark, webtext, positional, toks, vocab):
    """Headline semantics: prefix-slot phrases equal the per-doc window
    scan with per-slot completion sets — including a repeated-stem
    phrase, a no-completion stem (matches nothing, batch unaffected),
    and a plain phrase riding the same batch."""
    assert len([t for t in vocab if t.startswith("th")]) > 1
    qs = spark.createDataFrame(list(enumerate(QUERIES)),
                               "query_id int, query string")
    got = _got_map(ph.phrase_prefix_search(qs, positional))
    want = _want_map(toks, vocab, QUERIES)
    assert got == want and len(got) > 0
    assert not any(qid == 3 for qid, _ in got)  # empty-expansion slot
    assert any(qid == 4 for qid, _ in got)      # plain phrase in batch


def test_prefix_plain_batch_equals_phrase_search(spark, positional):
    """A batch with no '*' markers through the prefix API is bit-for-bit
    phrase_search."""
    qs = spark.createDataFrame([(0, "the of"), (1, "the the")],
                               "query_id int, query string")
    assert _got_map(ph.phrase_prefix_search(qs, positional)) == \
        _got_map(ph.phrase_search(qs, positional))


def test_prefix_sharded_and_index_identity(spark, positional, pos_runs,
                                           tmp_path):
    """Merged ≡ sharded ≡ written-index results for prefix phrases (the
    sharded paths must union alternatives per (slot, bucket) with runs
    of one term merged doc-disjointly first)."""
    assert pos_runs.select("bucket").distinct().count() > 4
    qs = spark.createDataFrame(list(enumerate(QUERIES)),
                               "query_id int, query string")
    merged = _got_map(ph.phrase_prefix_search(qs, positional))
    sharded = _got_map(ph.phrase_prefix_search_sharded(qs, pos_runs))
    assert merged == sharded and merged

    idx = str(tmp_path / "ppfx_idx")
    ph.write_positional_runs_index(pos_runs, idx, num_shards=8)
    viaidx = _got_map(ph.phrase_prefix_search_sharded_from_index(
        spark, idx, qs, num_shards=8))
    assert viaidx == merged


def test_prefix_cap_binds_in_term_order(spark, positional, toks, vocab):
    """max_expansions caps completions in TERM order: with a cap below
    the stem's completion count the engine matches the brute force run
    over exactly the first `cap` sorted completions."""
    n_th = len([t for t in vocab if t.startswith("t")])
    assert n_th > 3, "fixture stem must overflow the cap"
    queries = ["t* the", "of t*"]
    qs = spark.createDataFrame(list(enumerate(queries)),
                               "query_id int, query string")
    got = _got_map(ph.phrase_prefix_search(qs, positional,
                                           max_expansions=3))
    assert got == _want_map(toks, vocab, queries, cap=3) and got
    # a larger cap strictly widens (or keeps) every doc's match count
    wide = _got_map(ph.phrase_prefix_search(qs, positional,
                                            max_expansions=n_th))
    assert set(got) <= set(wide)
    assert all(wide[k] >= v for k, v in got.items())


@pytest.mark.parametrize("slop", [1, 2])
def test_prefix_slop_vs_bruteforce(spark, positional, pos_runs, toks,
                                   vocab, slop):
    """Prefix slots compose with proximity: the greedy slop chain runs
    over the unioned alternative positions, equal to the membership-set
    brute force; sharded identical."""
    queries = ["of th*", "da* the"]
    qs = spark.createDataFrame(list(enumerate(queries)),
                               "query_id int, query string")
    got = _got_map(ph.phrase_prefix_search(qs, positional, slop=slop))
    assert got == _want_map(toks, vocab, queries, slop=slop) and got
    sharded = _got_map(ph.phrase_prefix_search_sharded(qs, pos_runs,
                                                       slop=slop))
    assert sharded == got


def test_prefix_from_index_respects_tombstones(spark, webtext, pos_runs,
                                               tmp_path):
    from cer_for_mti_spark.operators import index_build as ib

    idx = str(tmp_path / "ppfx_tomb")
    ph.write_positional_runs_index(pos_runs, idx, num_shards=8,
                                   docs=webtext)
    qs = spark.createDataFrame([(0, "of th*")],
                               "query_id int, query string")
    pre = ph.phrase_prefix_search_sharded_from_index(
        spark, idx, qs, num_shards=8).collect()
    victims = sorted({r.doc_id for r in pre})[:3]
    assert victims
    ib.delete_docs(
        spark, idx,
        spark.createDataFrame([(d,) for d in victims], "doc_id long"))
    post = ph.phrase_prefix_search_sharded_from_index(
        spark, idx, qs, num_shards=8).collect()
    assert post and not {r.doc_id for r in post} & set(victims)


def test_union_alternatives_pure():
    """The per-slot union core against a plain Python dict merge on
    random CSR postings — doc ids sorted unique, per-doc positions
    sorted, tf = total occurrences across alternatives."""
    rng = np.random.default_rng(17)
    for trial in range(25):
        n_alt = int(rng.integers(0, 4))
        parts, truth = [], {}
        # one shared permutation, consumed disjointly: distinct terms
        # never share a (doc, position) pair — one token per position
        pool, cursor = rng.permutation(10_000).astype(np.int64), 0
        for _ in range(n_alt):
            docs = np.sort(rng.choice(50, size=int(rng.integers(0, 8)),
                                      replace=False)).astype(np.int64)
            tfs = rng.integers(1, 4, size=len(docs)).astype(np.int64)
            ends = np.cumsum(tfs)
            total = int(ends[-1]) if len(ends) else 0
            pos = pool[cursor:cursor + total].copy()
            cursor += total
            k = 0
            for d, t in zip(docs, tfs):
                chunk = np.sort(pos[k:k + t])
                pos[k:k + t] = chunk
                truth.setdefault(int(d), []).extend(int(p) for p in chunk)
                k += t
            parts.append((docs, tfs, ends - tfs, ends, pos))
        ids, tfs, starts, ends, pos = ph._union_alternatives(parts)
        got = {int(ids[k]): [int(p) for p in pos[starts[k]:ends[k]]]
               for k in range(len(ids))}
        want = {d: sorted(ps) for d, ps in truth.items()}
        assert got == want, trial
        assert all(int(tfs[k]) == len(want[int(ids[k])])
                   for k in range(len(ids)))
        assert list(ids) == sorted(want)


def test_prefix_dictionary_probe_pushdown(spark, pos_runs, tmp_path):
    """The stem probe is a literal StartsWith that reaches the parquet
    scan (PushedFilters), so a term-sorted dictionary serves it as a
    range seek — the same contract the fuzzy_dict IN probe has."""
    idx = str(tmp_path / "ppfx_plan")
    ph.write_positional_runs_index(pos_runs, idx, num_shards=8)
    rel = spark.read.option(
        "basePath", f"{idx}/positional_runs").parquet(
        f"{idx}/positional_runs")
    probe = rel.select("term").filter(F.col("term").startswith("th"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan and "PushedFilters" in plan, plan


GLOB_QUERIES = ["the d?ta", "*ime of", "t*me the", "o? the d?ta"]


def test_phrase_glob_slots_vs_bruteforce(spark, webtext, positional,
                                         pos_runs, toks, vocab):
    """Slots accept full globs ('?' one char, '*' any run, anywhere —
    leading and infix included): engine equals the membership-set brute
    force, and the sharded path is identical."""
    qs = spark.createDataFrame(list(enumerate(GLOB_QUERIES)),
                               "query_id int, query string")
    got = _got_map(ph.phrase_prefix_search(qs, positional))
    want = _want_map(toks, vocab, GLOB_QUERIES)
    assert got == want and got
    sharded = _got_map(ph.phrase_prefix_search_sharded(qs, pos_runs))
    assert sharded == got


def test_phrase_glob_matchall_slot_refused(spark, positional):
    for bad in ("*", "?", "**"):
        qs = spark.createDataFrame([(0, f"the {bad}")],
                                   "query_id int, query string")
        with pytest.raises(ValueError, match="no literal characters"):
            ph.phrase_prefix_search(qs, positional)
