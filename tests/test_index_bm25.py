"""Index build + BM25: rank-identity of the three query paths, identity
self-tests, determinism across parallelism (SURVEY.md §5.2)."""

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.operators import index_build as ib


def _key(rows):
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6)) for r in rows
    )


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [
            (0, "insulin"),
            (1, "TNF-α insulin"),
            (2, "the of and"),
            (3, "zzz-not-in-corpus"),
            (4, "dopamine serotonin glutamate hemoglobin"),
        ],
        "query_id int, query string",
    )


def test_rank_identity_three_paths(spark, index_300, queries):
    dt, ds, postings, n, avgdl = index_300
    naive = bm25.bm25_naive(queries, dt, ds, n, avgdl, k=10, mode="chem")
    exh = bm25.bm25_from_postings_naive(queries, postings, n, avgdl, k=10,
                                        mode="chem")
    wand = bm25.bm25_wand(queries, postings, n, avgdl, k=10, mode="chem",
                          scorer="wand")
    taat = bm25.bm25_wand(queries, postings, n, avgdl, k=10, mode="chem",
                          scorer="taat")
    a, b = _key(naive.collect()), _key(exh.collect())
    c, d = _key(wand.collect()), _key(taat.collect())
    assert a == b
    assert a == c
    assert a == d
    assert len(a) > 0


def test_bm25_conjunctive(spark, index_300, queries):
    """AND semantics: conjunctive top-k equals the disjunctive scorer
    restricted to docs containing EVERY query term, re-ranked; a query
    with an OOV term yields nothing; single-term queries match WAND."""
    dt, ds, postings, n, avgdl = index_300
    conj = bm25.bm25_conjunctive(queries, postings, n, avgdl, k=10,
                                 mode="chem")
    got = _key(conj.collect())
    # ground truth: full (unranked) naive scores + all-terms doc filter
    naive_all = bm25.bm25_naive(queries, dt, ds, n, avgdl, k=1 << 30,
                                mode="chem")
    qt = bm25.query_terms(queries, mode="chem")
    nterms = {r["query_id"]: r["n"] for r in
              qt.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    hits = (
        dt.join(qt, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .collect()
    )
    allowed = {(r["query_id"], r["doc_id"]) for r in hits
               if r["nt"] == nterms[r["query_id"]]}
    per_q = {}
    for r in naive_all.collect():
        if (r.query_id, r.doc_id) in allowed:
            per_q.setdefault(r.query_id, []).append(
                (-round(r.score, 6), r.doc_id))
    want = []
    for qid, lst in per_q.items():
        lst.sort()
        for i, (negs, d) in enumerate(lst[:10], start=1):
            want.append((qid, i, d, -negs))
    assert got == sorted(want) and len(got) > 0
    assert not any(q == 3 for q, _, _, _ in got)  # OOV query -> no rows


def test_bm25_conjunctive_sharded(spark, webtext, index_300, queries):
    """Sharded conjunctive == merged conjunctive, including on runs
    built from repartitioned (non-range) input."""
    dt, ds, postings, n, avgdl = index_300
    want = _key(bm25.bm25_conjunctive(queries, postings, n, avgdl, k=10,
                                      mode="chem").collect())
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=5, n_docs=n)
    got = _key(bm25.bm25_conjunctive_sharded(queries, runs, n, avgdl, k=10,
                                             mode="chem").collect())
    assert got == want and len(got) > 0
    # non-range input partitions -> several runs per (term, bucket)
    dt2 = ib.build_doc_terms(webtext.repartition(7), mode="chem")
    runs2 = ib.build_posting_runs(dt2, ds, avgdl, salt=5, n_docs=n)
    got2 = _key(bm25.bm25_conjunctive_sharded(queries, runs2, n, avgdl,
                                              k=10, mode="chem").collect())
    assert got2 == want


def test_identity_rare_term_rank1(spark, webtext, index_300):
    """Indexing a doc and querying a term unique to it returns that doc at
    rank 1 (the engine's analogue of the reference's gold self-eval
    P=R=F1=1.0, run_tool_evaluation.py:855)."""
    dt, ds, postings, n, avgdl = index_300
    # find a term with df == 1
    rare = (
        dt.groupBy("term").agg(F.count("*").alias("df"),
                               F.first("doc_id").alias("d"))
        .filter(F.col("df") == 1)
        .orderBy("term")
        .first()
    )
    q = webtext.sparkSession.createDataFrame(
        [(0, rare["term"])], "query_id int, query string"
    )
    top = bm25.bm25_wand(q, postings, n, avgdl, k=1, mode="chem").collect()
    assert len(top) == 1 and top[0].doc_id == rare["d"] and top[0].rank == 1


def test_postings_invariants(index_300):
    """SPIMI invariants: doc_ids strictly increasing, df == run length,
    block maxes bound the true impacts."""
    import numpy as np

    from cer_for_mti_spark.functions.codecs import delta_decode, varint_decode

    dt, ds, postings, n, avgdl = index_300
    rows = postings.orderBy("term").limit(50).collect()
    assert rows
    for r in rows:
        ids = delta_decode(bytes(r.doc_ids))
        tfs = varint_decode(bytes(r.tfs))
        dls = varint_decode(bytes(r.doclens))
        assert len(ids) == r.df == len(tfs) == len(dls)
        assert np.all(np.diff(ids) > 0)
        imp = ib._impact(tfs, dls, avgdl)
        assert abs(float(imp.max()) - r.max_impact) < 1e-12
        bm = np.asarray(r.block_max)
        assert float(bm.max()) <= r.max_impact + 1e-12


def test_narrow_path_parity(spark, webtext):
    """build_doc_terms_narrow (no-shuffle scale path) must produce the
    exact relation of the declarative groupBy path, for every tokenizer
    mode — and an index built from it must be WAND-identical."""
    for mode in ("simple", "chem", "chem+greek"):
        a = ib.build_doc_terms_with_dl(webtext, mode=mode)
        b = ib.build_doc_terms_narrow(webtext, mode=mode)
        cols = ["doc_id", "term", "tf", "doclen"]
        sa = sorted(map(tuple, a.select(*cols).collect()))
        sb = sorted(map(tuple, b.select(*cols).collect()))
        assert sa == sb and len(sa) > 0


def test_build_index_narrow_vs_shuffle(spark, webtext, queries):
    pn, dsn, n1, av1 = ib.build_index(webtext, mode="chem", plan="narrow")
    ps, dss, n2, av2 = ib.build_index(webtext, mode="chem", plan="shuffle")
    assert (n1, av1) == (n2, av2)
    a = _key(bm25.bm25_wand(queries, pn, n1, av1, k=10, mode="chem").collect())
    b = _key(bm25.bm25_wand(queries, ps, n2, av2, k=10, mode="chem").collect())
    assert a == b and len(a) > 0


def test_build_index_spimi_parity(spark, webtext, queries):
    """The single-pass SPIMI plan (mapInPandas encode, bytes-only shuffle)
    must produce postings byte-identical in content to the shuffle plan:
    same df/doc_ids/tfs, and WAND-identical top-k — including with input
    partitions that are NOT doc-id ranges (overlap fallback re-encode)."""
    ps, dss, n, av = ib.build_index(webtext, mode="chem", plan="shuffle")
    psp, _, n2, av2 = ib.build_index(webtext, mode="chem", plan="spimi")
    assert (n, av) == (n2, av2)
    a = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]))
         for r in ps.collect()}
    b = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]))
         for r in psp.collect()}
    assert a == b and len(a) > 0

    # shuffled input -> overlapping runs -> decode/merge/re-encode path
    shuffled = webtext.repartition(7)
    pso, _, _, _ = ib.build_index(shuffled, mode="chem", plan="spimi")
    x = _key(bm25.bm25_wand(queries, psp, n, av, k=10, mode="chem").collect())
    y = _key(bm25.bm25_wand(queries, pso, n, av, k=10, mode="chem").collect())
    z = _key(bm25.bm25_wand(queries, ps, n, av, k=10, mode="chem").collect())
    assert x == y == z and len(x) > 0

    # SPIMI memory budget: a tiny budget forces many sub-run flushes per
    # partition; postings must still be byte-identical in content
    ds = ib.build_doc_stats(webtext, mode="chem")
    n2, av2 = ib.corpus_stats(ds)
    p_small = ib.build_postings_spimi(webtext, av2, mode="chem",
                                      max_postings_in_memory=500)
    c = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]))
         for r in p_small.collect()}
    assert c == a


def test_salt_invariance(spark, webtext, queries):
    """Salted merge must be transparent: postings built with salt=1 and
    salt=8 give identical WAND results."""
    dt = ib.build_doc_terms(webtext, mode="chem").cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    p1 = ib.build_postings(dt, ds, avgdl, salt=1)
    p8 = ib.build_postings(dt, ds, avgdl, salt=8)
    a = _key(bm25.bm25_wand(queries, p1, n, avgdl, k=10, mode="chem").collect())
    b = _key(bm25.bm25_wand(queries, p8, n, avgdl, k=10, mode="chem").collect())
    assert a == b


def test_pruned_index_query_path(spark, webtext, queries, tmp_path):
    """bm25_wand_from_index (shard+term scan pruning) is rank-identical to
    scoring over the full postings relation, and the physical plan shows
    the shard partition filter + pushed term filter reaching the scan."""
    postings, ds, n, avgdl = ib.build_index(webtext, mode="chem", plan="spimi")
    path = str(tmp_path / "idx")
    ib.write_index(postings, ds, path, num_shards=8)

    full_p = spark.read.option("basePath", f"{path}/postings").parquet(
        f"{path}/postings"
    )
    a = _key(bm25.bm25_wand(queries, full_p, n, avgdl, k=10,
                            mode="chem").collect())
    b = _key(bm25.bm25_wand_from_index(spark, path, queries, n, avgdl, k=10,
                                       mode="chem", num_shards=8).collect())
    assert a == b and len(a) > 0

    pruned = bm25.read_postings_pruned(spark, path, ["insulin"], num_shards=8)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    assert "PushedFilters" in plan and "term" in plan


def test_parallelism_determinism(spark, webtext, index_300, queries):
    """Same input at different partitioning -> identical top-k (the N vs
    4N rank-identity contract, SURVEY.md §4.2.5)."""
    dt, ds, postings, n, avgdl = index_300
    base = _key(bm25.bm25_naive(queries, dt, ds, n, avgdl, k=10,
                                mode="chem").collect())
    re32 = _key(
        bm25.bm25_naive(
            queries, dt.repartition(32), ds.repartition(32), n, avgdl, k=10,
            mode="chem",
        ).collect()
    )
    assert base == re32


def test_wand_sharded_rank_identity(spark, webtext, queries):
    """Doc-range-sharded scoring (per-(query,bucket) top-k + global merge)
    must be rank-identical to single-task-per-query WAND — including on a
    skewed corpus where one stop word appears in every doc."""
    skewed = webtext.withColumn(
        "text", F.concat(F.lit("boilerplate "), F.col("text"),
                         F.lit(" boilerplate boilerplate"))
    )
    dt = ib.build_doc_terms(skewed, mode="chem").cache()
    ds = ib.build_doc_stats(dt).cache()
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=6, n_docs=n)
    postings = ib.build_postings(dt, ds, avgdl, salt=6, n_docs=n)
    qs = queries.union(spark.createDataFrame(
        [(9, "boilerplate insulin")], "query_id int, query string"
    ))
    for scorer in ("taat", "wand"):
        sharded = bm25.bm25_wand_sharded(qs, runs, n, avgdl, k=10,
                                         mode="chem", scorer=scorer)
        merged = bm25.bm25_wand(qs, postings, n, avgdl, k=10, mode="chem",
                                scorer=scorer)
        a, b = _key(sharded.collect()), _key(merged.collect())
        assert a == b and len(a) > 0, scorer


def test_pruned_path_chem_greek_variants(spark, webtext, tmp_path):
    """bm25_wand_from_index must include greek-canonical variant terms in
    the pruned scan for mode='chem+greek' — a query containing a Greek
    letter scores identically on the pruned path and the open postings DF."""
    dt = ib.build_doc_terms(webtext, mode="chem+greek").cache()
    ds = ib.build_doc_stats(dt).cache()
    n, avgdl = ib.corpus_stats(ds)
    postings = ib.build_postings(dt, ds, avgdl, salt=4)
    idx = str(tmp_path / "greek_idx")
    ib.write_index(postings, ds, idx, num_shards=8)
    qs = spark.createDataFrame(
        [(0, "TNF-α"), (1, "α-receptor insulin")], "query_id int, query string"
    )
    full = bm25.bm25_wand(qs, postings, n, avgdl, k=10, mode="chem+greek")
    pruned = bm25.bm25_wand_from_index(spark, idx, qs, n, avgdl, k=10,
                                       mode="chem+greek", num_shards=8)
    a, b = _key(full.collect()), _key(pruned.collect())
    assert a == b and len(a) > 0


def test_compact_index(spark, tmp_path):
    """Streamed-delta compaction: existing postings re-enter the merge as
    runs (postings_to_runs) and delta doc_terms merge in by byte concat.
    The compacted index's avgdl-independent content (df, doc_ids, tfs,
    doclens) must equal a from-scratch build over the full corpus, and
    WAND over it (frozen stats) must be rank-identical to the exhaustive
    scorer on the same inputs."""
    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=11).cache()
    old = full.filter(F.col("doc_id") < 80)
    new = full.filter(F.col("doc_id") >= 80)

    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl_old = ib.corpus_stats(ds_old)
    idx = str(tmp_path / "idx_old")
    ib.write_index(ib.build_postings(dt_old, ds_old, avgdl_old, salt=4),
                   ds_old, idx, num_shards=8)

    delta_dir = str(tmp_path / "deltas")
    ib.build_doc_terms(new).withColumn("batch_id", F.lit(0)).write.parquet(
        delta_dir
    )
    out = str(tmp_path / "idx_compacted")
    n2, avgdl_frozen = ib.compact_index(spark, idx, delta_dir, out,
                                        num_shards=8)
    assert n2 == 120 and avgdl_frozen == avgdl_old

    compacted = spark.read.parquet(f"{out}/postings").cache()
    dt_full = ib.build_doc_terms(full)
    ds_full = ib.build_doc_stats(dt_full)
    rebuilt = ib.build_postings(dt_full, ds_full, avgdl_frozen, salt=4)
    a = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                     bytes(r["doclens"])) for r in compacted.collect()}
    b = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                     bytes(r["doclens"])) for r in rebuilt.collect()}
    assert a == b and len(a) > 0

    qs = spark.createDataFrame(
        [(0, "the data"), (1, "insulin protein"), (2, "zzz")],
        "query_id int, query string",
    )
    w = bm25.bm25_wand(qs, compacted, n2, avgdl_frozen, k=10, scorer="wand")
    e = bm25.bm25_from_postings_naive(qs, compacted, n2, avgdl_frozen, k=10)
    assert _key(w.collect()) == _key(e.collect())

    # out-of-order ingest: a delta whose doc ids INTERLEAVE the existing
    # range must take the overlap fallback and still match the rebuild
    old2 = full.filter(F.col("doc_id") % 3 != 0)
    new2 = full.filter(F.col("doc_id") % 3 == 0)
    dt_old2 = ib.build_doc_terms(old2).cache()
    ds_old2 = ib.build_doc_stats(dt_old2)
    n_o2, avgdl_o2 = ib.corpus_stats(ds_old2)
    idx2 = str(tmp_path / "idx_old2")
    ib.write_index(ib.build_postings(dt_old2, ds_old2, avgdl_o2, salt=4),
                   ds_old2, idx2, num_shards=8)
    delta2 = str(tmp_path / "deltas2")
    ib.build_doc_terms(new2).withColumn("batch_id", F.lit(0)).write.parquet(
        delta2
    )
    out2 = str(tmp_path / "idx_compacted2")
    n3, avgdl_f2 = ib.compact_index(spark, idx2, delta2, out2, num_shards=8)
    assert n3 == 120
    compacted2 = spark.read.parquet(f"{out2}/postings")
    rebuilt2 = ib.build_postings(dt_full, ds_full, avgdl_f2, salt=4)
    a2 = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                      bytes(r["doclens"])) for r in compacted2.collect()}
    b2 = {r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                      bytes(r["doclens"])) for r in rebuilt2.collect()}
    assert a2 == b2 and len(a2) > 0


def test_compact_index_conflicts_and_rebuild(spark, tmp_path):
    """Append-only semantics enforced: a delta re-ingesting an existing
    doc_id raises by default; on_conflict='skip' drops the re-ingested
    docs (result equals compacting the disjoint part alone). Past the
    rebuild threshold compaction upgrades to a stats-refresh full
    rebuild: returned avgdl and posting bytes (incl. block maxes) equal
    a from-scratch build over the union corpus."""
    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=13).cache()
    old = full.filter(F.col("doc_id") < 80)
    new = full.filter(F.col("doc_id") >= 80)

    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl_old = ib.corpus_stats(ds_old)
    idx = str(tmp_path / "idx_old")
    ib.write_index(ib.build_postings(dt_old, ds_old, avgdl_old, salt=4),
                   ds_old, idx, num_shards=8)

    # postings -> doc_terms round-trip is exact (the rebuild's foundation)
    rt = ib.postings_to_doc_terms(
        spark.read.parquet(f"{idx}/postings").drop("shard"))
    a = {(r.doc_id, r.term, r.tf, r.doclen) for r in rt.collect()}
    b = {(r.doc_id, r.term, r.tf, r.doclen)
         for r in ib.build_doc_terms_with_dl(old).collect()}
    assert a == b and len(a) > 0

    # delta overlapping existing doc_ids: error by default
    import pytest as _pytest
    dirty_dir = str(tmp_path / "deltas_dirty")
    ib.build_doc_terms(full.filter(F.col("doc_id") >= 70)).withColumn(
        "batch_id", F.lit(0)).write.parquet(dirty_dir)
    with _pytest.raises(ValueError, match="already exist"):
        ib.compact_index(spark, idx, dirty_dir, str(tmp_path / "x"),
                         num_shards=8)

    # on_conflict='skip' == compacting the disjoint delta alone
    clean_dir = str(tmp_path / "deltas_clean")
    ib.build_doc_terms(new).withColumn("batch_id", F.lit(0)).write.parquet(
        clean_dir)
    out_skip = str(tmp_path / "idx_skip")
    out_clean = str(tmp_path / "idx_clean")
    n_s, av_s = ib.compact_index(spark, idx, dirty_dir, out_skip,
                                 num_shards=8, on_conflict="skip",
                                 rebuild_threshold=None)
    n_c, av_c = ib.compact_index(spark, idx, clean_dir, out_clean,
                                 num_shards=8, rebuild_threshold=None)
    assert (n_s, av_s) == (n_c, av_c) == (120, avgdl_old)
    key = lambda df: {r["term"]: (r["df"], bytes(r["doc_ids"]),
                                  bytes(r["tfs"]), bytes(r["doclens"]))
                      for r in df.collect()}
    assert key(spark.read.parquet(f"{out_skip}/postings")) == \
        key(spark.read.parquet(f"{out_clean}/postings"))

    # past-threshold: 40 new docs > 0.4 * 80 -> stats-refresh rebuild
    out_rb = str(tmp_path / "idx_rebuilt")
    n_rb, avgdl_rb = ib.compact_index(spark, idx, clean_dir, out_rb,
                                      num_shards=8, rebuild_threshold=0.4)
    dt_full = ib.build_doc_terms(full)
    ds_full = ib.build_doc_stats(dt_full)
    n_f, avgdl_f = ib.corpus_stats(ds_full)
    assert n_rb == n_f == 120 and avgdl_rb == avgdl_f != avgdl_old
    scratch = ib.build_postings(dt_full, ds_full, avgdl_f, salt=4,
                                n_docs=n_f)
    key_full = lambda df: {
        r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                    bytes(r["doclens"]), tuple(r["block_last"]),
                    tuple(r["block_max"]), r["max_impact"])
        for r in df.collect()}
    assert key_full(spark.read.parquet(f"{out_rb}/postings")) == \
        key_full(scratch)


def test_append_runs_index(spark, tmp_path):
    """Incremental ingest into the runs layout: appended docs' runs are
    extra cursors; querying the appended index (frozen avgdl) is
    rank-identical to scoring from-scratch runs over the full corpus at
    the same avgdl. Overlapping doc_ids raise."""
    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=17).cache()
    old = full.filter(F.col("doc_id") < 80)
    new = full.filter(F.col("doc_id") >= 80)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl = ib.corpus_stats(ds_old)
    idx = str(tmp_path / "runs_idx")
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl, salt=4,
                                     n_docs=n_old)
    ib.write_runs_index(runs_old, ds_old, idx, num_shards=8)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="already exist"):
        ib.append_runs_index(spark, idx, full.filter(F.col("doc_id") >= 70),
                             avgdl, salt=4, n_docs=120, num_shards=8)
    n_added = ib.append_runs_index(spark, idx, new, avgdl, salt=4,
                                   n_docs=120, num_shards=8)
    assert n_added == 40

    qs = spark.createDataFrame(
        [(0, "the data"), (1, "insulin protein"), (2, "zzz")],
        "query_id int, query string",
    )
    got = bm25.bm25_wand_sharded_from_index(spark, idx, qs, 120, avgdl,
                                            k=10, num_shards=8)
    dt_full = ib.build_doc_terms(full)
    ds_full = ib.build_doc_stats(dt_full)
    runs_full = ib.build_posting_runs(dt_full, ds_full, avgdl, salt=4,
                                      n_docs=120)
    want = bm25.bm25_wand_sharded(qs, runs_full, 120, avgdl, k=10)
    assert _key(got.collect()) == _key(want.collect())
    assert got.count() > 0
    # appended doc_stats complete
    assert spark.read.parquet(f"{idx}/doc_stats").count() == 120


def test_append_positional_runs_index(spark, tmp_path):
    """Positional append is exact (no corpus stats at all): phrase hits
    from the appended index equal the merged-postings search over the
    full corpus. Disjointness is ENFORCED via the docs sidecar: a
    re-ingested doc raises (it would silently double-count n_matches),
    on_conflict='skip' drops it, and an index written without the
    sidecar refuses appends outright."""
    import pytest as _pytest

    from cer_for_mti_spark import datagen
    from cer_for_mti_spark.operators import phrase as ph

    full = datagen.generate_webtext(spark, 120, seed=19).cache()
    old = full.filter(F.col("doc_id") < 80)
    new = full.filter(F.col("doc_id") >= 80)
    idx = str(tmp_path / "pos_idx")
    runs_old = ph.build_positional_runs(old, salt=6, n_docs=120)
    ph.write_positional_runs_index(runs_old, idx, num_shards=8, docs=old)

    # no sidecar -> refuse
    idx_bare = str(tmp_path / "pos_idx_bare")
    ph.write_positional_runs_index(runs_old, idx_bare, num_shards=8)
    with _pytest.raises(ValueError, match="sidecar"):
        ib.append_positional_runs_index(spark, idx_bare, new, salt=6,
                                        n_docs=120, num_shards=8)

    # overlapping doc_ids -> raise
    with _pytest.raises(ValueError, match="already exist"):
        ib.append_positional_runs_index(
            spark, idx, full.filter(F.col("doc_id") >= 70), salt=6,
            n_docs=120, num_shards=8)

    n_added = ib.append_positional_runs_index(spark, idx, new, salt=6,
                                              n_docs=120, num_shards=8)
    assert n_added == 40
    qs = spark.createDataFrame([(0, "the the"), (1, "of the")],
                               "query_id int, query string")
    got = {(r.phrase_id, r.doc_id, r.n_matches)
           for r in ph.phrase_search_sharded_from_index(
               spark, idx, qs, num_shards=8).collect()}
    positional = ph.build_positional_postings(full)
    want = {(r.phrase_id, r.doc_id, r.n_matches)
            for r in ph.phrase_search(qs, positional).collect()}
    assert got == want and len(got) > 0
    # re-running the SAME delta now raises (sidecar was appended too);
    # on_conflict='skip' is a no-op returning 0
    with _pytest.raises(ValueError, match="already exist"):
        ib.append_positional_runs_index(spark, idx, new, salt=6,
                                        n_docs=120, num_shards=8)
    assert ib.append_positional_runs_index(
        spark, idx, new, salt=6, n_docs=120, num_shards=8,
        on_conflict="skip") == 0


def _index_content(spark, idx):
    """Full content snapshot of a runs index (runs + doc_stats rows,
    order-free) for bit-identity comparisons."""
    runs = spark.read.option("basePath", f"{idx}/runs").parquet(
        f"{idx}/runs")
    rows = sorted(
        (r["shard"], r["term"], r["bucket"], r["first_id"], r["last_id"],
         r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
         bytes(r["doclens"]), tuple(r["block_last"]),
         tuple(r["block_max"]), r["max_impact"])
        for r in runs.collect())
    ds = sorted(map(tuple, spark.read.parquet(f"{idx}/doc_stats")
                    .select("doc_id", "doclen").collect()))
    return rows, ds


def test_append_runs_index_resumable(spark, tmp_path):
    """Kill-between-unit-commits crash test: an append aborted after 1
    unit commit leaves runs without their doc_stats; re-calling
    append_runs_index detects the in-flight staged batch and completes
    it — the final index is bit-identical (every run byte + stats row)
    to an uninterrupted append of the same delta."""
    import shutil as _sh

    import pytest as _pytest

    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 100, seed=23).cache()
    old = full.filter(F.col("doc_id") < 70)
    new = full.filter(F.col("doc_id") >= 70)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl = ib.corpus_stats(ds_old)
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl, salt=4,
                                     n_docs=100)

    idx_a = str(tmp_path / "crash")
    idx_b = str(tmp_path / "clean")
    ib.write_runs_index(runs_old, ds_old, idx_a, num_shards=4)
    _sh.copytree(idx_a, idx_b)

    # clean append on the control copy
    ib.append_runs_index(spark, idx_b, new, avgdl, salt=4, n_docs=100,
                         num_shards=4)
    # crashed append: only 1 of the 6 units (4 shards + term_dict +
    # doc_stats) lands
    ib.append_runs_index(spark, idx_a, new, avgdl, salt=4, n_docs=100,
                         num_shards=4, fail_after=1)
    lin = spark.read.parquet(f"{idx_a}/append_lineage")
    assert lin.count() == 1  # torn: stats NOT committed yet
    assert spark.read.parquet(f"{idx_a}/doc_stats").count() == 70
    # starting a DIFFERENT batch while one is in-flight is refused
    with _pytest.raises(ValueError, match="in-flight|staged"):
        ib.append_runs_index(spark, idx_a, new, avgdl, salt=4, n_docs=100,
                             num_shards=4, batch_id="other")
    # resume (new_docs ignored — staged bytes already fixed)
    n = ib.append_runs_index(spark, idx_a, new, avgdl, salt=4, n_docs=100,
                             num_shards=4)
    assert n == 30
    assert _index_content(spark, idx_a) == _index_content(spark, idx_b)
    # all 6 units committed, staging gone
    assert spark.read.parquet(f"{idx_a}/append_lineage").count() == 6
    import os as _os
    assert not _os.path.isdir(f"{idx_a}/.staging") or not any(
        d.startswith("append_") for d in _os.listdir(f"{idx_a}/.staging"))


def test_append_runs_index_novel_delta_after_crash(spark, tmp_path):
    """A novel delta submitted (batch_id=None) while an unrelated crashed
    batch is in flight must NOT be silently dropped: the call finishes
    the crashed batch AND ingests the new delta as its own batch,
    landing on the same content as two clean sequential appends. A pure
    re-send of the crashed delta still reports the resumed count."""
    import shutil as _sh

    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=29).cache()
    old = full.filter(F.col("doc_id") < 70)
    d1 = full.filter((F.col("doc_id") >= 70) & (F.col("doc_id") < 100))
    d2 = full.filter(F.col("doc_id") >= 100)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    _, avgdl = ib.corpus_stats(ds_old)
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl, salt=4,
                                     n_docs=120)
    idx_a = str(tmp_path / "crash_novel")
    idx_b = str(tmp_path / "clean_seq")
    ib.write_runs_index(runs_old, ds_old, idx_a, num_shards=4)
    _sh.copytree(idx_a, idx_b)

    # control: two clean sequential appends
    ib.append_runs_index(spark, idx_b, d1, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    ib.append_runs_index(spark, idx_b, d2, avgdl, salt=4, n_docs=120,
                         num_shards=4)
    # crash d1 mid-commit, then submit the UNRELATED d2 with no batch id
    ib.append_runs_index(spark, idx_a, d1, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)
    n = ib.append_runs_index(spark, idx_a, d2, avgdl, salt=4, n_docs=120,
                             num_shards=4)
    assert n == 20  # the NEW delta's count, not the resumed batch's
    assert _index_content(spark, idx_a) == _index_content(spark, idx_b)
    assert ib._find_inflight_batch(idx_a) is None

    # pure re-send after a crash still reports the resumed batch's count
    idx_c = str(tmp_path / "crash_resend")
    ib.write_runs_index(runs_old, ds_old, idx_c, num_shards=4)
    ib.append_runs_index(spark, idx_c, d1, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)
    assert ib.append_runs_index(spark, idx_c, d1, avgdl, salt=4,
                                n_docs=120, num_shards=4) == 30


def test_repair_interrupted_compaction(spark, tmp_path):
    """A compaction crash between its two directory renames leaves the
    index with NO runs dir (old runs in .runs_old, complete replacement
    in .compact_staging). Readers and appenders roll the swap forward;
    a crash that lost staging rolls BACK to the preserved old dir;
    queries after repair are identical to pre-crash."""
    import os as _os
    import shutil as _sh

    from cer_for_mti_spark import datagen

    docs = datagen.generate_webtext(spark, 80, seed=37).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp_path / "crashy")
    ib.write_runs_index(runs, ds, idx, num_shards=4)
    qs = spark.createDataFrame([(0, "the data")], "query_id int, query string")
    want = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4).collect())

    # simulate the exact mid-swap state: final gone, staging complete,
    # old runs in trash
    _os.makedirs(f"{idx}/.compact_staging", exist_ok=True)
    _sh.copytree(f"{idx}/runs", f"{idx}/.compact_staging/runs")
    _os.rename(f"{idx}/runs", f"{idx}/.runs_old")
    got = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4).collect())
    assert got == want  # reader rolled the swap forward
    assert _os.path.isdir(f"{idx}/runs")
    assert not _os.path.isdir(f"{idx}/.runs_old")
    assert not _os.path.isdir(f"{idx}/.compact_staging")

    # roll-back branch: staging lost, only the trash copy survives
    _os.rename(f"{idx}/runs", f"{idx}/.runs_old")
    assert ib.repair_interrupted_compaction(idx, "runs") is True
    got2 = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=4).collect())
    assert got2 == want
    # healthy index: no-op, stale trash cleared
    _sh.copytree(f"{idx}/runs", f"{idx}/.runs_old")
    assert ib.repair_interrupted_compaction(idx, "runs") is False
    assert not _os.path.isdir(f"{idx}/.runs_old")


def test_bake_stats_frozen_avgdl(spark, tmp_path):
    """write_runs_index persists the bake avgdl in index_meta.json and
    bake_stats returns it FROZEN after appends move the live doc_stats
    avgdl — decoding at a drifted live value can exceed the baked
    block-max bounds and block-max WAND then skips true top-k docs. The
    max_drift policy raise and the legacy (no-sidecar) fallback are also
    covered."""
    import os as _os

    import pytest as _pytest

    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=31).cache()
    old = full.filter(F.col("doc_id") < 80)
    new = full.filter(F.col("doc_id") >= 80)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    _, avgdl0 = ib.corpus_stats(ds_old)
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl0, salt=4,
                                     n_docs=120)
    idx = str(tmp_path / "meta_idx")
    ib.write_runs_index(runs_old, ds_old, idx, num_shards=4)
    assert _os.path.exists(f"{idx}/index_meta.json")
    n, bake = ib.bake_stats(spark, idx)
    assert n == 80 and bake == avgdl0

    # append docs truncated to 1/4 length: live avgdl drifts DOWN, the
    # bake value must not move, and N reflects the live corpus
    short = new.withColumn(
        "text", F.substring(F.col("text"), F.lit(1),
                            (F.length("text") / 4).cast("int")))
    ib.append_runs_index(spark, idx, short, bake, num_shards=4)
    n2, bake2 = ib.bake_stats(spark, idx)
    _, live2 = ib.corpus_stats(spark.read.parquet(f"{idx}/doc_stats"))
    assert n2 == 120 and bake2 == avgdl0 and live2 != avgdl0
    # drift policy: a tight threshold raises with the rebuild message
    drift = abs(live2 - avgdl0) / avgdl0
    with _pytest.raises(ValueError, match="drifted"):
        ib.bake_stats(spark, idx, max_drift=drift / 2)
    # legacy index without the sidecar falls back to live avgdl
    _os.remove(f"{idx}/index_meta.json")
    _, legacy = ib.bake_stats(spark, idx)
    assert legacy == live2


def test_append_positional_runs_index_resumable(spark, tmp_path):
    """Positional twin of the crash test: abort after 2 unit commits,
    resume, and require the appended index's phrase results AND raw run
    bytes to equal an uninterrupted append's."""
    from cer_for_mti_spark import datagen
    from cer_for_mti_spark.operators import phrase as ph

    full = datagen.generate_webtext(spark, 100, seed=29).cache()
    old = full.filter(F.col("doc_id") < 70)
    new = full.filter(F.col("doc_id") >= 70)
    idx_a = str(tmp_path / "pcrash")
    idx_b = str(tmp_path / "pclean")
    runs_old = ph.build_positional_runs(old, salt=6, n_docs=100)
    ph.write_positional_runs_index(runs_old, idx_a, num_shards=4, docs=old)
    import shutil as _sh
    _sh.copytree(idx_a, idx_b)

    ib.append_positional_runs_index(spark, idx_b, new, salt=6, n_docs=100,
                                    num_shards=4)
    ib.append_positional_runs_index(spark, idx_a, new, salt=6, n_docs=100,
                                    num_shards=4, fail_after=2)
    # torn: sidecar (last unit) not committed
    assert spark.read.parquet(f"{idx_a}/docs").count() == 70
    n = ib.append_positional_runs_index(spark, idx_a, new, salt=6,
                                        n_docs=100, num_shards=4)
    assert n == 30
    assert spark.read.parquet(f"{idx_a}/docs").count() == 100

    def content(idx):
        runs = spark.read.option(
            "basePath", f"{idx}/positional_runs"
        ).parquet(f"{idx}/positional_runs")
        return sorted(
            (r["shard"], r["term"], r["bucket"], r["first_id"],
             r["last_id"], r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
             bytes(r["positions"]))
            for r in runs.collect())

    assert content(idx_a) == content(idx_b)


def test_append_runs_index_default_n_docs(spark, tmp_path):
    """The advertised-optional n_docs=None path (ADVICE r03: it crashed
    with AttributeError): derives the bucket-width basis from the index
    + delta max doc_id, and the appended index stays rank-identical to
    from-scratch runs at the frozen avgdl."""
    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 100, seed=31).cache()
    old = full.filter(F.col("doc_id") < 60)
    new = full.filter(F.col("doc_id") >= 60)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl = ib.corpus_stats(ds_old)
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl, salt=4,
                                     n_docs=n_old)
    idx = str(tmp_path / "defaults_idx")
    ib.write_runs_index(runs_old, ds_old, idx, num_shards=8)
    n = ib.append_runs_index(spark, idx, new, avgdl, num_shards=8)
    assert n == 40
    qs = spark.createDataFrame(
        [(0, "the data"), (1, "insulin protein")],
        "query_id int, query string")
    got = bm25.bm25_wand_sharded_from_index(spark, idx, qs, 100, avgdl,
                                            k=10, num_shards=8)
    dt_full = ib.build_doc_terms(full)
    ds_full = ib.build_doc_stats(dt_full)
    runs_full = ib.build_posting_runs(dt_full, ds_full, avgdl, salt=4,
                                      n_docs=100)
    want = bm25.bm25_wand_sharded(qs, runs_full, 100, avgdl, k=10)
    assert _key(got.collect()) == _key(want.collect())
    assert got.count() > 0


def test_wand_sharded_from_index(spark, webtext, queries, tmp_path):
    """Written runs index: shard dirs prune (PartitionFilters), term
    predicates push down (PushedFilters), and the pruned sharded path is
    rank-identical to scoring the open runs DF."""
    dt = ib.build_doc_terms(webtext, mode="chem").cache()
    ds = ib.build_doc_stats(dt).cache()
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=5, n_docs=n)
    idx = str(tmp_path / "runs_idx")
    ib.write_runs_index(runs, ds, idx, num_shards=8)

    open_df = bm25.bm25_wand_sharded(queries, runs, n, avgdl, k=10,
                                     mode="chem")
    pruned = bm25.bm25_wand_sharded_from_index(spark, idx, queries, n, avgdl,
                                               k=10, mode="chem",
                                               num_shards=8)
    assert _key(pruned.collect()) == _key(open_df.collect())
    assert len(pruned.collect()) > 0

    base = spark.read.option("basePath", f"{idx}/runs").parquet(f"{idx}/runs")
    from cer_for_mti_spark.functions.hashing import md5_60_py
    probe = base.filter(
        F.col("shard").isin([md5_60_py("insulin") % 8])
        & F.col("term").isin(["insulin"])
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "shard" in plan
    assert "PushedFilters" in plan and "insulin" in plan


def test_compact_runs_index(spark, tmp_path):
    """BM25 runs-index compaction: after two appended batches the index
    carries one run per (term, bucket, batch); compaction folds it to
    exactly one run per (term, bucket), sharded queries stay
    rank-identical, and appends keep working afterwards."""
    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 120, seed=37).cache()
    # interleaved id classes: the deltas' doc-id ranges overlap the base
    # buckets, so appends really do stack several runs per (term, bucket)
    # and compaction exercises the overlap decode/re-encode merge path
    base = full.filter((F.col("doc_id") < 110) & (F.col("doc_id") % 3 == 0))
    d1 = full.filter((F.col("doc_id") < 110) & (F.col("doc_id") % 3 == 1))
    d2 = full.filter((F.col("doc_id") < 110) & (F.col("doc_id") % 3 == 2))
    d3 = full.filter(F.col("doc_id") >= 110)
    dt = ib.build_doc_terms(base).cache()
    ds = ib.build_doc_stats(dt)
    n0, avgdl = ib.corpus_stats(ds)
    idx = str(tmp_path / "cr_idx")
    ib.write_runs_index(
        ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=120),
        ds, idx, num_shards=4)
    for delta in (d1, d2):
        ib.append_runs_index(spark, idx, delta, avgdl, salt=4, n_docs=120,
                             num_shards=4)
    qs = spark.createDataFrame(
        [(0, "the data"), (1, "insulin protein"), (2, "zzz")],
        "query_id int, query string")
    before = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, 110, avgdl, k=10, num_shards=4).collect())
    runs = spark.read.option("basePath", f"{idx}/runs").parquet(
        f"{idx}/runs")
    assert runs.groupBy("term", "bucket").count().filter(
        F.col("count") > 1).count() > 0

    n_b, n_a = ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    assert n_a < n_b
    runs2 = spark.read.option("basePath", f"{idx}/runs").parquet(
        f"{idx}/runs")
    assert runs2.count() == n_a
    assert runs2.groupBy("term", "bucket").count().filter(
        F.col("count") > 1).count() == 0
    after = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, 110, avgdl, k=10, num_shards=4).collect())
    assert before == after and len(after) > 0

    # the compacted index still accepts (and enforces) appends
    import pytest as _pytest
    with _pytest.raises(ValueError, match="already exist"):
        ib.append_runs_index(spark, idx, d2, avgdl, salt=4, n_docs=120,
                             num_shards=4)
    assert ib.append_runs_index(spark, idx, d3, avgdl, salt=4, n_docs=120,
                                num_shards=4) == 10
    final = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, 120, avgdl, k=10, num_shards=4).collect())
    dt_full = ib.build_doc_terms(full)
    ds_full = ib.build_doc_stats(dt_full)
    runs_full = ib.build_posting_runs(dt_full, ds_full, avgdl, salt=4,
                                      n_docs=120)
    want = _key(bm25.bm25_wand_sharded(qs, runs_full, 120, avgdl,
                                       k=10).collect())
    assert final == want


def test_bm25_exclude(spark, webtext, index_300):
    """Boolean NOT: results equal the disjunctive scorer restricted to
    docs containing NO excluded term, re-ranked AFTER exclusion (an
    excluded doc never eats a top-k slot); OOV/null exclusions are
    no-ops; a term listed both positively and negatively excludes; the
    sharded path is rank-identical."""
    dt, ds, postings, n, avgdl = index_300
    queries = spark.createDataFrame(
        [(0, "insulin", "the"), (1, "dopamine serotonin", "zzz"),
         (2, "the of", "of"), (3, "insulin", None)],
        "query_id int, query string, exclude string")
    got = _key(bm25.bm25_exclude(queries, postings, n, avgdl, k=10,
                                 mode="chem").collect())

    # ground truth from the naive relation: per query, score positive
    # terms (minus negatives) over ALL docs, drop docs containing any
    # negative term, then top-10
    naive_all = bm25.bm25_naive(
        spark.createDataFrame(
            [(0, "insulin"), (1, "dopamine serotonin"), (2, "the"),
             (3, "insulin")],
            "query_id int, query string"),
        dt, ds, n, avgdl, k=1 << 30, mode="chem").collect()
    neg_docs = {}
    for qid, terms in [(0, ["the"]), (1, ["zzz"]), (2, ["of"]), (3, [])]:
        if terms:
            hit = dt.filter(F.col("term").isin(terms)).select(
                "doc_id").distinct().collect()
            neg_docs[qid] = {r.doc_id for r in hit}
        else:
            neg_docs[qid] = set()
    per_q = {}
    for r in naive_all:
        if r.doc_id not in neg_docs[r.query_id]:
            per_q.setdefault(r.query_id, []).append(
                (-round(r.score, 6), r.doc_id))
    want = []
    for qid, lst in per_q.items():
        lst.sort()
        for i, (negs, d) in enumerate(lst[:10], start=1):
            want.append((qid, i, d, -negs))
    assert got == sorted(want) and len(got) > 0
    # the stop-word exclusion really filtered something
    assert neg_docs[0] and all(
        d not in neg_docs[0] for q, _, d, _ in got if q == 0)

    runs = ib.build_posting_runs(dt, ds, avgdl, salt=5, n_docs=n)
    sharded = _key(bm25.bm25_exclude_sharded(queries, runs, n, avgdl, k=10,
                                             mode="chem").collect())
    assert sharded == got

    # conjunctive + NOT: AND over positives, then exclusion
    conj = _key(bm25.bm25_exclude(queries, postings, n, avgdl, k=10,
                                  mode="chem", conjunctive=True).collect())
    conj_sharded = _key(bm25.bm25_exclude_sharded(
        queries, runs, n, avgdl, k=10, mode="chem",
        conjunctive=True).collect())
    assert conj == conj_sharded
    # AND results are a subset of OR results' doc sets per query
    or_docs = {(q, d) for q, _, d, _ in got}
    assert all((q, d) in or_docs for q, _, d, _ in conj)


def test_manifest_commit_mode(spark, tmp_path):
    """Object-store-safe ingest: a manifest-mode index commits appends
    by COPY + manifest (no renames on the data path); readers list files
    from committed manifests, so an uncommitted or torn object is never
    read. Kill-between-units: after a crash the unmanifested unit is
    invisible, queries still serve the pre-append index, and the resume
    lands the identical content a rename-mode append produces."""
    import os as _os
    import shutil as _sh

    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 100, seed=47).cache()
    old = full.filter(F.col("doc_id") < 70)
    new = full.filter(F.col("doc_id") >= 70)
    dt_old = ib.build_doc_terms(old).cache()
    ds_old = ib.build_doc_stats(dt_old)
    n_old, avgdl = ib.corpus_stats(ds_old)
    runs_old = ib.build_posting_runs(dt_old, ds_old, avgdl, salt=4,
                                     n_docs=100)
    idx_m = str(tmp_path / "manifest_idx")
    idx_r = str(tmp_path / "rename_idx")
    ib.write_runs_index(runs_old, ds_old, idx_m, num_shards=4,
                        commit_mode="manifest")
    ib.write_runs_index(runs_old, ds_old, idx_r, num_shards=4)
    assert ib._index_commit_mode(idx_m) == "manifest"
    assert ib._index_commit_mode(idx_r) == "rename"

    qs = spark.createDataFrame([(0, "the data"), (1, "the")],
                               "query_id int, query string")
    base_key = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx_m, qs, n_old, avgdl, k=10, num_shards=4).collect())
    assert base_key == _key(bm25.bm25_wand_sharded_from_index(
        spark, idx_r, qs, n_old, avgdl, k=10, num_shards=4).collect())

    # crash after 1 unit commit: the committed unit is manifested, the
    # rest is staged only; a TORN uncommitted object planted in the data
    # dir must be invisible to readers
    ib.append_runs_index(spark, idx_m, new, avgdl, salt=4, n_docs=100,
                         num_shards=4, fail_after=1)
    with open(f"{idx_m}/runs/shard=3/b0000-torn.parquet", "wb") as f:
        f.write(b"\x00garbage not parquet")
    mid_n, mid_avgdl = ib.bake_stats(spark, idx_m)
    assert mid_n == 70  # doc_stats unit (last) not committed yet
    # queries still run (committed manifests only — the torn file and
    # the unmanifested shard units are not listed)
    mid = bm25.bm25_wand_sharded_from_index(
        spark, idx_m, qs, n_old, avgdl, k=10, num_shards=4)
    assert mid.count() > 0
    _os.remove(f"{idx_m}/runs/shard=3/b0000-torn.parquet")

    # resume, then content must equal the rename-mode append
    ib.append_runs_index(spark, idx_m, new, avgdl, salt=4, n_docs=100,
                         num_shards=4)
    ib.append_runs_index(spark, idx_r, new, avgdl, salt=4, n_docs=100,
                         num_shards=4)
    def _manifest_content(idx):
        runs = ib.read_index_rel(spark, idx, "runs", with_base_path=True)
        rows = sorted(
            (r["shard"], r["term"], r["bucket"], r["first_id"],
             r["last_id"], r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
             bytes(r["doclens"]), tuple(r["block_last"]),
             tuple(r["block_max"]), r["max_impact"])
            for r in runs.collect())
        ds = sorted(map(tuple, ib.read_index_rel(spark, idx, "doc_stats")
                        .select("doc_id", "doclen").collect()))
        return rows, ds
    assert _manifest_content(idx_m) == _manifest_content(idx_r)
    got = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx_m, qs, 100, avgdl, k=10, num_shards=4).collect())
    want = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx_r, qs, 100, avgdl, k=10, num_shards=4).collect())
    assert got == want

    # deletes + compaction keep working in manifest mode (tombstones ride
    # the same commit path; compaction regenerates the base manifests)
    del_df = spark.createDataFrame([(int(i),) for i in range(0, 100, 9)],
                                   "doc_id long")
    assert ib.delete_docs(spark, idx_m, del_df) == del_df.count()
    masked = bm25.bm25_wand_sharded_from_index(
        spark, idx_m, qs, 100, avgdl, k=100, num_shards=4).collect()
    assert not {r.doc_id for r in masked} & set(range(0, 100, 9))
    ib.compact_runs_index(spark, idx_m, avgdl, num_shards=4)
    assert not _os.path.isdir(f"{idx_m}/tombstones")
    assert ib.read_index_rel(spark, idx_m, "doc_stats").count() == \
        100 - del_df.count()
    post = bm25.bm25_wand_sharded_from_index(
        spark, idx_m, qs, 100 - del_df.count(), avgdl, k=100,
        num_shards=4).collect()
    assert post and not {r.doc_id for r in post} & set(range(0, 100, 9))


def test_vacuum_manifest_orphans(spark, tmp_path):
    """vacuum_index removes exactly the data files no committed manifest
    references (torn PUTs from crashed copy-mode commits), leaves every
    referenced file and all query results untouched, raises while a
    batch is in-flight, and is a no-op on rename-mode indexes."""
    import os as _os

    from cer_for_mti_spark import datagen

    full = datagen.generate_webtext(spark, 100, seed=48).cache()
    old = full.filter(F.col("doc_id") < 70)
    new = full.filter(F.col("doc_id") >= 70)
    dt = ib.build_doc_terms(old).cache()
    ds = ib.build_doc_stats(dt)
    n_old, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=100)

    idx_r = str(tmp_path / "vac_rename")
    ib.write_runs_index(runs, ds, idx_r, num_shards=4)
    assert ib.vacuum_index(idx_r) == {"mode": "rename", "removed": 0,
                                      "bytes": 0}

    idx = str(tmp_path / "vac_manifest")
    ib.write_runs_index(runs, ds, idx, num_shards=4,
                        commit_mode="manifest")
    qs = spark.createDataFrame([(0, "the data"), (1, "the")],
                               "query_id int, query string")

    def key(idx_):
        return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                      for r in bm25.bm25_wand_sharded_from_index(
                          spark, idx_, qs, n_old, avgdl, k=10,
                          num_shards=4).collect())

    base = key(idx)

    # in-flight batch: vacuum refuses
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=100,
                         num_shards=4, fail_after=1)
    with pytest.raises(ValueError, match="staged but not fully"):
        ib.vacuum_index(idx)
    ib.append_runs_index(spark, idx, new, avgdl, salt=4, n_docs=100,
                         num_shards=4)  # resume
    full_key = key(idx)
    assert full_key != base  # appended docs visible

    # plant torn objects in two relations; count referenced files first
    shard_dirs = sorted(d for d in _os.listdir(f"{idx}/runs")
                        if d.startswith("shard="))
    torn1 = f"{idx}/runs/{shard_dirs[0]}/b9999-torn.parquet"
    torn2 = f"{idx}/doc_stats/b9999-torn.parquet"
    for t in (torn1, torn2):
        with open(t, "wb") as f:
            f.write(b"\x00garbage" * 100)

    def all_files(idx_):
        out = set()
        for rel in ("runs", "doc_stats"):
            for dp, _dn, fns in _os.walk(f"{idx_}/{rel}"):
                out |= {f"{dp}/{fn}" for fn in fns
                        if not fn.startswith(("_", "."))}
        return out

    before_files = all_files(idx)
    res = ib.vacuum_index(idx)
    assert res["mode"] == "manifest" and res["removed"] == 2
    assert res["bytes"] == 2 * 800
    assert not _os.path.exists(torn1) and not _os.path.exists(torn2)
    assert all_files(idx) == before_files - {torn1, torn2}
    # idempotent, and queries see the appended corpus unchanged
    assert ib.vacuum_index(idx)["removed"] == 0
    assert key(idx) == full_key


def test_compact_refuses_inflight_batch(spark, tmp_path):
    """Compaction must refuse while a crashed append is staged (same
    guard as vacuum/write_fuzzy_dict): folding the batch's committed
    units into a new base would let the later resume double-commit its
    deltas. After the resume, compaction proceeds."""
    from cer_for_mti_spark import datagen
    from cer_for_mti_spark.operators import phrase as ph

    full = datagen.generate_webtext(spark, 120, seed=41).cache()
    base = full.filter(F.col("doc_id") < 80)
    delta = full.filter(F.col("doc_id") >= 80)
    dt = ib.build_doc_terms(base).cache()
    ds = ib.build_doc_stats(dt)
    _, avgdl = ib.corpus_stats(ds)
    idx = str(tmp_path / "cg_idx")
    ib.write_runs_index(
        ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=120),
        ds, idx, num_shards=4)
    ib.append_runs_index(spark, idx, delta, avgdl, salt=4, n_docs=120,
                         num_shards=4, fail_after=1)  # crash mid-batch
    with pytest.raises(ValueError, match="staged but not fully committed"):
        ib.compact_runs_index(spark, idx, avgdl, num_shards=4)
    ib.append_runs_index(spark, idx, delta, avgdl, salt=4, n_docs=120,
                         num_shards=4)  # resume
    ib.compact_runs_index(spark, idx, avgdl, num_shards=4)

    pidx = str(tmp_path / "cg_pos")
    ph.write_positional_runs_index(
        ph.build_positional_runs(base, salt=4, n_docs=120), pidx,
        num_shards=4, docs=base)
    ib.append_positional_runs_index(spark, pidx, delta, salt=4,
                                    n_docs=120, num_shards=4,
                                    fail_after=1)
    with pytest.raises(ValueError, match="staged but not fully committed"):
        ph.compact_positional_runs(spark, pidx, num_shards=4)
    ib.append_positional_runs_index(spark, pidx, delta, salt=4,
                                    n_docs=120, num_shards=4)
    ph.compact_positional_runs(spark, pidx, num_shards=4)


def test_duplicate_query_batch_dedup_identity(spark, webtext, index_300):
    """A batch with repeated query TEXTS must return, for every
    query_id, exactly the rows the same text gets in a duplicate-free
    batch — the dedup_query_batch planning step is invisible in results
    on every scorer path (wand, sharded, conjunctive, naive, phrase)."""
    from cer_for_mti_spark.operators import phrase as ph

    dt, ds, postings, n, avgdl = index_300
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    texts = ["the data", "insulin", "the data", "zzz", "the data",
             "insulin"]
    dup = spark.createDataFrame(list(enumerate(texts)),
                                "query_id int, query string")
    uniq = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts) if t not in texts[:i]],
        "query_id int, query string")

    def rows_by_text(df, qdf):
        txt = {r["query_id"]: r["query"] for r in qdf.collect()}
        out: dict = {}
        for r in df.collect():
            out.setdefault(txt[r["query_id"]], set()).add(
                (r["doc_id"], round(r["score"], 6), r["rank"]))
        return out

    for fn in (
        lambda q: bm25.bm25_wand(q, postings, n, avgdl, k=5, mode="chem"),
        lambda q: bm25.bm25_wand_sharded(q, runs, n, avgdl, k=5,
                                         mode="chem"),
        lambda q: bm25.bm25_conjunctive(q, postings, n, avgdl, k=5,
                                        mode="chem"),
        lambda q: bm25.bm25_naive(q, dt, ds, n, avgdl, k=5, mode="chem"),
    ):
        a = rows_by_text(fn(dup), dup)
        b = rows_by_text(fn(uniq), uniq)
        assert a == b and a
        # every duplicate id carries the full row set
        got = fn(dup).groupBy("query_id").count().collect()
        per_id = {r["query_id"]: r["count"] for r in got}
        base = {r["query_id"]: r["count"]
                for r in fn(uniq).groupBy("query_id").count().collect()}
        for qid, t in enumerate(texts):
            if t in {r["query"] for r in uniq.collect()}:
                want = base.get(
                    min(i for i, x in enumerate(texts) if x == t), 0)
                assert per_id.get(qid, 0) == want

    pos = ph.build_positional_postings(webtext)
    pruns = ph.build_positional_runs(webtext, salt=4, n_docs=300)
    ptexts = ["the the", "of the", "the the", "zzz qqq"]
    pdup = spark.createDataFrame(list(enumerate(ptexts)),
                                 "query_id int, query string")
    puniq = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ptexts) if t not in ptexts[:i]],
        "query_id int, query string")

    def hits_by_text(df, qdf):
        txt = {r["query_id"]: r["query"] for r in qdf.collect()}
        out: dict = {}
        for r in df.collect():
            out.setdefault(txt[r["phrase_id"]], set()).add(
                (r["doc_id"], r["n_matches"]))
        return out

    for fn in (
        lambda q: ph.phrase_search(q, pos),
        lambda q: ph.phrase_search_sharded(q, pruns),
    ):
        assert hits_by_text(fn(pdup), pdup) == hits_by_text(fn(puniq),
                                                            puniq)


def test_build_postings_fusion_parity(spark, webtext):
    """build_postings on a provenance-marked doc_terms relation fuses to
    the single-pass SPIMI plan; its postings must be BYTE-identical to
    the unfused declarative pipeline, for both doc_terms flavors."""
    ds = ib.build_doc_stats(webtext, mode="chem")
    n, avgdl = ib.corpus_stats(ds)

    def _bytes(p):
        # block_last/block_max are RUN-local (valid upper bounds under any
        # run partitioning — see POSTING_SCHEMA docs), so the fused plan's
        # block structure legitimately differs; everything else must be
        # byte-identical
        return {
            r["term"]: (r["df"], bytes(r["doc_ids"]), bytes(r["tfs"]),
                        bytes(r["doclens"]), r["max_impact"])
            for r in p.collect()
        }

    qs = spark.createDataFrame(
        [(0, "insulin the"), (1, "dopamine serotonin")],
        "query_id int, query string")
    for maker in (ib.build_doc_terms_with_dl, ib.build_doc_terms_narrow):
        dt = maker(webtext, mode="chem")
        assert getattr(dt, "_cer_fuse_src", None) is not None
        fused = ib.build_postings(dt, ds, avgdl, n_docs=n)
        unfused = ib.build_postings(dt, ds, avgdl, n_docs=n, fuse=False)
        a, b = _bytes(fused), _bytes(unfused)
        assert a == b and len(a) > 0, maker.__name__
        x = _key(bm25.bm25_wand(qs, fused, n, avgdl, k=10,
                                mode="chem").collect())
        y = _key(bm25.bm25_wand(qs, unfused, n, avgdl, k=10,
                                mode="chem").collect())
        assert x == y and len(x) > 0, maker.__name__
    # derived frames drop the marker: no accidental fusion downstream
    dt2 = ib.build_doc_terms_with_dl(webtext, mode="chem").drop("doclen")
    assert getattr(dt2, "_cer_fuse_src", None) is None
