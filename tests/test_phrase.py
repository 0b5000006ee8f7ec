"""Positional postings + phrase search: decode roundtrip, brute-force
equivalence, repeated-term phrases."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import phrase as ph


@pytest.fixture(scope="module")
def positional(spark, webtext):
    return ph.build_positional_postings(webtext, mode="simple").cache()


def _brute_phrase(docs_rows, terms):
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    out = {}
    for r in docs_rows:
        toks = [t for t in ws.split(r.text) if t]
        n = 0
        for i in range(len(toks) - len(terms) + 1):
            if toks[i:i + len(terms)] == terms:
                n += 1
        if n:
            out[r.doc_id] = n
    return out


@pytest.mark.parametrize("query", ["the of", "of the and", "the the"])
def test_phrase_vs_brute_force(spark, webtext, positional, query):
    q = spark.createDataFrame([(0, query)], "query_id int, query string")
    got = {
        r.doc_id: r.n_matches
        for r in ph.phrase_search(q, positional).collect()
    }
    want = _brute_phrase(webtext.select("doc_id", "text").collect(),
                         query.split())
    assert got == want


def test_positional_decode_roundtrip(spark, webtext, positional):
    """Decoded positions of a few terms equal posexplode ground truth."""
    rows = positional.orderBy("term").limit(20).collect()
    truth = (
        webtext.select(
            "doc_id",
            F.posexplode(F.filter(F.split("text", r"\s+"),
                                  lambda t: t != "")).alias("pos", "term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
    )
    terms = [r["term"] for r in rows]
    tmap = {}
    for r in truth.filter(F.col("term").isin(terms)).collect():
        tmap.setdefault(r["term"], {})[r["doc_id"]] = list(r["ps"])
    for r in rows:
        ids, tfs, starts, ends, pos = ph._decode_positional(r)
        got = {
            int(ids[k]): [int(p) for p in pos[starts[k]:ends[k]]]
            for k in range(len(ids))
        }
        assert got == tmap[r["term"]], r["term"]


def test_positional_repartitioned_input(spark, webtext, positional):
    """Input partitions that are NOT disjoint doc-id ranges (repartition)
    produce overlapping positional runs: the merge must detect the overlap
    and decode/re-encode instead of byte-concatenating (a negative
    boundary gap would wrap to ~1.8e19 as uint64). Postings must be
    byte-identical to the ordered build, and phrase results unchanged."""
    pos_b = ph.build_positional_postings(webtext.repartition(7),
                                         mode="simple")
    a = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                     bytes(r["positions"]))
         for r in positional.collect()}
    b = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                     bytes(r["positions"]))
         for r in pos_b.collect()}
    assert a == b and len(a) > 0

    q = spark.createDataFrame([(0, "of the")], "query_id int, query string")
    got_a = {(r.doc_id, r.n_matches)
             for r in ph.phrase_search(q, positional).collect()}
    got_b = {(r.doc_id, r.n_matches)
             for r in ph.phrase_search(q, pos_b).collect()}
    assert got_a == got_b and len(got_a) > 0


@pytest.fixture(scope="module")
def pos_runs(spark, webtext):
    """Run-level positional index with a small salt -> many doc-range
    buckets (forces real per-bucket sharding on the 300-doc corpus)."""
    return ph.build_positional_runs(webtext, mode="simple", salt=8).cache()


@pytest.mark.parametrize("query", ["the of", "of the and", "the the"])
def test_phrase_sharded_vs_merged(spark, webtext, positional, pos_runs, query):
    """Sharded path is result-identical to the merged-postings path —
    including the stop-word repeated-term phrase whose postings a
    single-task matcher would have to fully co-locate."""
    assert pos_runs.select("bucket").distinct().count() > 4
    q = spark.createDataFrame([(0, query)], "query_id int, query string")
    merged = {(r.phrase_id, r.doc_id, r.n_matches)
              for r in ph.phrase_search(q, positional).collect()}
    sharded = {(r.phrase_id, r.doc_id, r.n_matches)
               for r in ph.phrase_search_sharded(q, pos_runs).collect()}
    assert merged == sharded and len(sharded) > 0


def test_phrase_sharded_chem_mode(spark, webtext):
    """Chem analyzer end-to-end through the sharded path: a phrase taken
    verbatim from a document's own chem-token stream must hit that doc,
    and merged vs sharded must agree."""
    from cer_for_mti_spark.functions.analyze import chem_tokenize_str

    row = webtext.orderBy("doc_id").first()
    toks = chem_tokenize_str(row["text"])
    query = " ".join(toks[:2])
    qs = spark.createDataFrame([(0, query)], "query_id int, query string")
    pos = ph.build_positional_postings(webtext, mode="chem")
    runs = ph.build_positional_runs(webtext, mode="chem", salt=8)
    merged = {(r.phrase_id, r.doc_id, r.n_matches)
              for r in ph.phrase_search(qs, pos, mode="chem").collect()}
    sharded = {(r.phrase_id, r.doc_id, r.n_matches)
               for r in ph.phrase_search_sharded(qs, runs,
                                                 mode="chem").collect()}
    assert merged == sharded
    assert any(d == row["doc_id"] for _, d, _ in sharded)


def test_phrase_sharded_repartitioned_input(spark, webtext, positional):
    """Runs built from NON-doc-range input partitions (repartition(7) ->
    a (term, bucket) pair carries several runs per bucket): the matcher
    must merge the decoded runs per term, results unchanged."""
    runs_b = ph.build_positional_runs(webtext.repartition(7), mode="simple",
                                      salt=8)
    # several runs per (term, bucket) actually occur
    from pyspark.sql import functions as F2
    multi = (runs_b.groupBy("term", "bucket").count()
             .filter(F2.col("count") > 1).count())
    assert multi > 0
    qs = spark.createDataFrame([(0, "of the"), (1, "the the")],
                               "query_id int, query string")
    want = {(r.phrase_id, r.doc_id, r.n_matches)
            for r in ph.phrase_search(qs, positional).collect()}
    got = {(r.phrase_id, r.doc_id, r.n_matches)
           for r in ph.phrase_search_sharded(qs, runs_b).collect()}
    assert want == got and len(got) > 0


def test_phrase_sharded_from_index(spark, webtext, positional, pos_runs,
                                   tmp_path):
    """Written positional-runs index: shard pruning + term pushdown,
    per-(phrase, bucket) matching, results identical to the merged path."""
    idx = str(tmp_path / "pos_runs_idx")
    ph.write_positional_runs_index(pos_runs, idx, num_shards=8)
    qs = spark.createDataFrame([(0, "the of"), (1, "the the")],
                               "query_id int, query string")
    want = {(r.phrase_id, r.doc_id, r.n_matches)
            for r in ph.phrase_search(qs, positional).collect()}
    got = {(r.phrase_id, r.doc_id, r.n_matches)
           for r in ph.phrase_search_sharded_from_index(
               spark, idx, qs, num_shards=8).collect()}
    assert want == got and len(got) > 0

    import contextlib
    import io

    from cer_for_mti_spark.functions.hashing import md5_60_py
    from pyspark.sql import functions as F2
    base = spark.read.option("basePath", f"{idx}/positional_runs").parquet(
        f"{idx}/positional_runs")
    probe = base.filter(
        F2.col("shard").isin([md5_60_py("the") % 8])
        & F2.col("term").isin(["the"]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "PushedFilters" in plan


def test_phrase_search_from_index(spark, webtext, positional, tmp_path):
    """Written positional index: shard pruning + term pushdown, results
    identical to the open-DF search."""
    idx = str(tmp_path / "pos_idx")
    ph.write_positional_index(positional, idx, num_shards=8)
    qs = spark.createDataFrame([(0, "the of"), (1, "the the")],
                               "query_id int, query string")
    got_open = {(r.phrase_id, r.doc_id, r.n_matches)
                for r in ph.phrase_search(qs, positional).collect()}
    got_pruned = {(r.phrase_id, r.doc_id, r.n_matches)
                  for r in ph.phrase_search_from_index(
                      spark, idx, qs, num_shards=8).collect()}
    assert got_open == got_pruned and len(got_pruned) > 0

    import contextlib
    import io

    from cer_for_mti_spark.functions.hashing import md5_60_py
    from pyspark.sql import functions as F2
    base = spark.read.option("basePath", f"{idx}/positional").parquet(
        f"{idx}/positional")
    probe = base.filter(
        F2.col("shard").isin([md5_60_py("the") % 8])
        & F2.col("term").isin(["the"]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "PushedFilters" in plan


def test_compact_positional_runs_byte_identity(spark, webtext, tmp_path):
    """After several merge-free appends, compaction reduces the index to
    exactly ONE run per (term, bucket) with phrase results — and raw
    decoded streams — identical before/after."""
    from cer_for_mti_spark.operators import index_build as ib
    from pyspark.sql import functions as F2

    idx = str(tmp_path / "compact_idx")
    parts = [webtext.filter((F2.col("doc_id") % 3) == i) for i in range(3)]
    runs0 = ph.build_positional_runs(parts[0], salt=8, n_docs=300)
    ph.write_positional_runs_index(runs0, idx, num_shards=8, docs=parts[0])
    for p in parts[1:]:
        ib.append_positional_runs_index(spark, idx, p, salt=8, n_docs=300,
                                        num_shards=8)

    qs = spark.createDataFrame(
        [(0, "the the"), (1, "of the"), (2, "the of")],
        "query_id int, query string")
    before = {(r.phrase_id, r.doc_id, r.n_matches)
              for r in ph.phrase_search_sharded_from_index(
                  spark, idx, qs, num_shards=8).collect()}
    multi_before = (
        spark.read.option("basePath", f"{idx}/positional_runs")
        .parquet(f"{idx}/positional_runs")
        .groupBy("term", "bucket").count().filter(F2.col("count") > 1)
        .count())
    assert multi_before > 0  # appends really did leave multiple runs

    n_before, n_after = ph.compact_positional_runs(spark, idx, num_shards=8)
    assert n_after < n_before
    runs = spark.read.option("basePath", f"{idx}/positional_runs").parquet(
        f"{idx}/positional_runs")
    assert runs.count() == n_after
    assert runs.groupBy("term", "bucket").count().filter(
        F2.col("count") > 1).count() == 0  # exactly one run per key

    after = {(r.phrase_id, r.doc_id, r.n_matches)
             for r in ph.phrase_search_sharded_from_index(
                 spark, idx, qs, num_shards=8).collect()}
    assert before == after and len(after) > 0
    # the compacted index and a from-scratch build must agree on every
    # (term, bucket)'s decoded (ids, tfs, positions); scratch may carry
    # several runs per key, so merge those first
    scratch = ph.build_positional_runs(webtext, salt=8, n_docs=300)

    def decoded(df):
        out = {}
        for r in df.collect():
            ids, tfs, _s, _e, pos = ph._decode_positional(r)
            key = (r["term"], r["bucket"])
            assert key not in out
            out[key] = (ids.tolist(), tfs.tolist(), pos.tolist())
        return out

    got = decoded(runs)
    want = {}
    rows_by_key = {}
    for r in scratch.collect():
        rows_by_key.setdefault((r["term"], r["bucket"]), []).append(r)
    for key, rows in rows_by_key.items():
        ids, tfs, _s, _e, pos = ph._decode_rows_merged(rows)
        want[key] = (ids.tolist(), tfs.tolist(), pos.tolist())
    assert got == want


def test_phrase_search_posting_bytes_guard(spark, webtext, positional):
    """The merged-path scale caveat is an enforced contract: a phrase
    whose fetched posting bytes exceed max_posting_bytes raises with a
    pointer at phrase_search_sharded instead of silently co-locating an
    unbounded posting in one task."""
    qs = spark.createDataFrame([(0, "the the")],
                               "query_id int, query string")
    with pytest.raises(Exception, match="phrase_search_sharded"):
        ph.phrase_search(qs, positional, max_posting_bytes=64).collect()
    # the default budget (256 MiB) is far above this corpus: same call
    # succeeds, and disabling the guard entirely works too
    assert ph.phrase_search(qs, positional).count() > 0
    assert ph.phrase_search(qs, positional,
                            max_posting_bytes=None).count() > 0


def _brute_near(tokens, terms, slop):
    """Greedy proximity reference: count start positions p0 (occurrences
    of terms[0]) admitting an ordered chain with p_i <= p0 + i + slop."""
    n = 0
    for p0, t in enumerate(tokens):
        if t != terms[0]:
            continue
        last, ok = p0, True
        for i, ti in enumerate(terms[1:], start=1):
            nxt = next((p for p in range(last + 1,
                                         min(p0 + i + slop, len(tokens) - 1)
                                         + 1)
                        if tokens[p] == ti), None)
            if nxt is None:
                ok = False
                break
            last = nxt
        if ok:
            n += 1
    return n


@pytest.mark.parametrize("slop", [1, 2])
def test_phrase_slop_vs_bruteforce(spark, webtext, positional, slop):
    """Proximity search equals a per-doc greedy token-window scan, and
    the sharded path is result-identical to the merged one under slop."""
    queries = ["the of", "of the and", "the the"]
    qs = spark.createDataFrame(list(enumerate(queries)),
                               "query_id int, query string")
    got = {(r.phrase_id, r.doc_id): r.n_matches
           for r in ph.phrase_search(qs, positional, slop=slop).collect()}
    toks = {r.doc_id: r.text.split() for r in webtext.collect()}
    want = {}
    for qid, q in enumerate(queries):
        terms = q.split()
        for d, tk in toks.items():
            c = _brute_near(tk, terms, slop)
            if c:
                want[(qid, d)] = c
    assert got == want and len(got) > 0

    runs = ph.build_positional_runs(webtext, salt=8)
    sharded = {(r.phrase_id, r.doc_id): r.n_matches
               for r in ph.phrase_search_sharded(qs, runs,
                                                 slop=slop).collect()}
    assert sharded == want


def test_phrase_slop_zero_is_adjacency(spark, positional):
    """slop=1 hits are a superset of exact-adjacency hits per doc, and
    the slop matcher at slop=0 (forced through _match_slop) returns
    exactly the adjacency results."""
    qs = spark.createDataFrame([(0, "the of"), (1, "the the")],
                               "query_id int, query string")
    exact = {(r.phrase_id, r.doc_id): r.n_matches
             for r in ph.phrase_search(qs, positional).collect()}
    near = {(r.phrase_id, r.doc_id): r.n_matches
            for r in ph.phrase_search(qs, positional, slop=1).collect()}
    assert set(exact) <= set(near)
    assert all(near[k] >= v for k, v in exact.items())
    # force the slop core at slop=0 by monkey-dispatch: decoded-level
    # equality on a fetched phrase group
    import numpy as np
    rows = positional.filter(F.col("term").isin(["the", "of"])).collect()
    by_term = {r["term"]: ph._decode_positional(r) for r in rows}
    decoded = {0: by_term["the"], 1: by_term["of"]}
    a = ph._match_adjacency(7, 2, decoded)
    b = ph._match_slop(7, 2, decoded, 0)
    assert sorted(map(tuple, a.values.tolist())) == \
        sorted(map(tuple, b.values.tolist()))


def test_kwic_snippets(spark, webtext, positional):
    """KWIC presentation: snippet count per doc equals phrase_search's
    n_matches, every snippet contains the phrase, edge occurrences get
    truncated context, and the hits semi-join prunes the scan to result
    docs only."""
    phrase = "of the"
    qs = spark.createDataFrame([(0, phrase)], "query_id int, query string")
    hits = ph.phrase_search(qs, positional)
    want = {r.doc_id: r.n_matches for r in hits.collect()}
    snips = ph.kwic_snippets(webtext, phrase, width=3).collect()
    got = {}
    for r in snips:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
        assert f"of the" in r.snippet
        assert len(r.snippet.split()) <= 2 + 2 * 3
    assert got == want and len(got) > 0
    # snippet window is exactly the token slice around the match
    toks = {r.doc_id: [t for t in r.text.split() if t]
            for r in webtext.collect()}
    for r in snips[:50]:
        tk = toks[r.doc_id]
        lo = max(0, r.pos - 3)
        hi = min(len(tk), r.pos + 2 + 3)
        assert r.snippet == " ".join(tk[lo:hi])
    # semi-joined variant returns the same rows
    pruned = ph.kwic_snippets(webtext, phrase, width=3, hits=hits).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, snips))


def test_match_slop_property_pure():
    """Hypothesis property (no Spark): the vectorized greedy-DP slop
    matcher equals a per-start brute-force scan on random corpora,
    phrases, and slops; slop=0 equals the adjacency matcher."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def decoded_for(docs, term):
        ids, tfs, pos_all = [], [], []
        for d in sorted(docs):
            ps = [i for i, t in enumerate(docs[d]) if t == term]
            if ps:
                ids.append(d)
                tfs.append(len(ps))
                pos_all.extend(ps)
        ids = np.asarray(ids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        ends = np.cumsum(tfs)
        starts = ends - tfs
        return ids, tfs, starts, ends, np.asarray(pos_all, dtype=np.int64)

    def brute(docs, terms, slop):
        out = {}
        for d, tk in docs.items():
            n = 0
            for p0, t in enumerate(tk):
                if t != terms[0]:
                    continue
                last, ok = p0, True
                for i, ti in enumerate(terms[1:], start=1):
                    nxt = next(
                        (p for p in range(last + 1,
                                          min(p0 + i + slop,
                                              len(tk) - 1) + 1)
                         if tk[p] == ti), None)
                    if nxt is None:
                        ok = False
                        break
                    last = nxt
                if ok:
                    n += 1
            if n:
                out[d] = n
        return out

    tok = st.sampled_from(["a", "b", "c"])

    @settings(max_examples=120, deadline=None)
    @given(
        docs=st.dictionaries(st.integers(0, 9),
                             st.lists(tok, min_size=0, max_size=25),
                             min_size=1, max_size=6),
        terms=st.lists(tok, min_size=1, max_size=4),
        slop=st.integers(0, 4),
    )
    def check(docs, terms, slop):
        decoded = {i: decoded_for(docs, t) for i, t in enumerate(terms)}
        out = ph._match_slop(5, len(terms), decoded, slop)
        got = {int(r.doc_id): int(r.n_matches)
               for _, r in out.iterrows()}
        assert got == brute(docs, terms, slop)
        if slop == 0:
            adj = ph._match_adjacency(5, len(terms), decoded)
            assert got == {int(r.doc_id): int(r.n_matches)
                           for _, r in adj.iterrows()}

    check()


def test_positional_manifest_commit_mode(spark, webtext, tmp_path):
    """Object-store-safe positional index: commit_mode="manifest" writes
    base manifests, appends commit by copy + manifest via the shared
    protocol, readers list committed files only (a planted torn object
    and a killed batch's unmanifested units are invisible), and the
    resumed index is content-identical to a rename-mode twin. Deletes
    and compaction keep working; compaction regenerates the manifests."""
    import os as _os

    from cer_for_mti_spark.operators import index_build as ib
    from pyspark.sql import functions as F2

    old = webtext.filter(F2.col("doc_id") < 200)
    new = webtext.filter(F2.col("doc_id") >= 200)
    runs0 = ph.build_positional_runs(old, salt=8, n_docs=300)
    idx_m = str(tmp_path / "pos_manifest")
    idx_r = str(tmp_path / "pos_rename")
    ph.write_positional_runs_index(runs0, idx_m, num_shards=4, docs=old,
                                   commit_mode="manifest")
    ph.write_positional_runs_index(runs0, idx_r, num_shards=4, docs=old)
    assert ib._index_commit_mode(idx_m) == "manifest"
    assert ib._index_commit_mode(idx_r) == "rename"

    qs = spark.createDataFrame([(0, "the the"), (1, "of the")],
                               "query_id int, query string")

    def hits(idx):
        return {(r.phrase_id, r.doc_id, r.n_matches)
                for r in ph.phrase_search_sharded_from_index(
                    spark, idx, qs, num_shards=4).collect()}

    base_hits = hits(idx_m)
    assert base_hits == hits(idx_r) and base_hits

    # kill after 1 unit commit + plant a torn uncommitted object: both
    # must be invisible to the manifest-aware reader
    ib.append_positional_runs_index(spark, idx_m, new, salt=8, n_docs=300,
                                    num_shards=4, fail_after=1)
    shard_dirs = sorted(
        d for d in _os.listdir(f"{idx_m}/positional_runs")
        if d.startswith("shard="))
    torn = f"{idx_m}/positional_runs/{shard_dirs[0]}/b0000-torn.parquet"
    with open(torn, "wb") as f:
        f.write(b"\x00garbage not parquet")
    assert hits(idx_m) == base_hits  # still serves the pre-append index
    assert ib.read_index_rel(spark, idx_m, "docs").count() == 200
    _os.remove(torn)

    # resume; content must equal the rename-mode append
    ib.append_positional_runs_index(spark, idx_m, new, salt=8, n_docs=300,
                                    num_shards=4)
    ib.append_positional_runs_index(spark, idx_r, new, salt=8, n_docs=300,
                                    num_shards=4)

    def content(idx):
        runs = ib.read_index_rel(spark, idx, "positional_runs",
                                 with_base_path=True)
        rows = {}
        for r in runs.collect():
            ids, tfs, _s, _e, pos = ph._decode_positional(r)
            rows.setdefault((r["shard"], r["term"], r["bucket"]), []).append(
                (ids.tolist(), tfs.tolist(), pos.tolist()))
        for v in rows.values():
            v.sort()
        docs = sorted(r.doc_id for r in
                      ib.read_index_rel(spark, idx, "docs").collect())
        return rows, docs

    assert content(idx_m) == content(idx_r)
    assert hits(idx_m) == hits(idx_r)

    # deletes ride the same commit path; compaction purges and
    # regenerates the base manifests
    victims = sorted({d for _, d, _ in hits(idx_m)})[:2]
    assert victims
    assert ib.delete_docs(spark, idx_m, spark.createDataFrame(
        [(int(v),) for v in victims], "doc_id long")) == len(victims)
    masked = hits(idx_m)
    assert not {d for _, d, _ in masked} & set(victims)
    ph.compact_positional_runs(spark, idx_m, num_shards=4)
    assert not _os.path.isdir(f"{idx_m}/tombstones")
    assert ib._index_commit_mode(idx_m) == "manifest"
    manifests = _os.listdir(f"{idx_m}/{ib.MANIFEST_DIR}")
    assert sorted(manifests) == ["base-docs.json",
                                 "base-positional_runs.json"]
    assert hits(idx_m) == masked
    assert ib.read_index_rel(spark, idx_m, "docs").count() == \
        300 - len(victims)
