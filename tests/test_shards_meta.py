"""Recorded shard count (index_meta.json num_shards): writers record
it, index-path readers/appenders/compactors default to it, and an
explicit mismatch RAISES instead of silently pruning/writing the wrong
partition dirs — the shards=32-vs-8 foot-gun that returned partial
results before the metadata existed."""
from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import phrase as ph


def _key(df):
    return sorted((r.query_id, r.doc_id, r.rank, round(r.score, 6))
                  for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shards_meta")
    docs = datagen.generate_webtext(spark, 150, seed=3).cache()
    dt = ib.build_doc_terms(docs).cache()
    ds = ib.build_doc_stats(dt)
    n, avgdl = ib.corpus_stats(ds)
    runs = ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=n)
    idx = str(tmp / "idx")
    ib.write_runs_index(runs, ds, idx, num_shards=8)
    pidx = str(tmp / "pidx")
    ph.write_positional_runs_index(
        ph.build_positional_runs(docs, salt=4), pidx, num_shards=8,
        docs=docs)
    return docs, idx, pidx, n, avgdl


def test_writers_record_and_readers_default(spark, built):
    _docs, idx, pidx, n, avgdl = built
    assert ib.index_num_shards(idx) == 8
    assert ib.index_num_shards(pidx) == 8
    qs = spark.createDataFrame([(0, "the data"), (1, "scan merge")],
                               "query_id int, query string")
    want = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10, num_shards=8))
    got = _key(bm25.bm25_wand_sharded_from_index(
        spark, idx, qs, n, avgdl, k=10))  # default = recorded
    assert got == want and got

    hits_want = sorted(
        (r.phrase_id, r.doc_id, r.n_matches)
        for r in ph.phrase_search_sharded_from_index(
            spark, pidx, qs, num_shards=8).collect())
    hits_got = sorted(
        (r.phrase_id, r.doc_id, r.n_matches)
        for r in ph.phrase_search_sharded_from_index(
            spark, pidx, qs).collect())
    assert hits_got == hits_want and hits_got


def test_explicit_mismatch_raises_everywhere(spark, built):
    docs, idx, pidx, n, avgdl = built
    qs = spark.createDataFrame([(0, "the data")],
                               "query_id int, query string")
    with pytest.raises(ValueError, match="num_shards=8"):
        bm25.bm25_wand_sharded_from_index(
            spark, idx, qs, n, avgdl, k=10, num_shards=32).collect()
    with pytest.raises(ValueError, match="num_shards=8"):
        ph.phrase_search_sharded_from_index(
            spark, pidx, qs, num_shards=32).collect()
    with pytest.raises(ValueError, match="num_shards=8"):
        ib.append_runs_index(spark, idx, docs.limit(0), avgdl,
                             num_shards=32)
    with pytest.raises(ValueError, match="num_shards=8"):
        ib.compact_runs_index(spark, idx, avgdl, num_shards=32)
    with pytest.raises(ValueError, match="num_shards=8"):
        ph.compact_positional_runs(spark, pidx, num_shards=32)


def test_pre_metadata_index_falls_back(spark, built):
    """Indexes written before the key existed keep the old behavior:
    the caller's explicit value wins, no raise."""
    _docs, idx, _pidx, n, avgdl = built
    meta_p = f"{idx}/index_meta.json"
    with open(meta_p) as f:
        meta = json.load(f)
    legacy = dict(meta)
    legacy.pop("num_shards")
    try:
        with open(meta_p, "w") as f:
            json.dump(legacy, f)
        assert ib.index_num_shards(idx) is None
        assert ib.resolve_num_shards(idx, 8) == 8
        assert ib.resolve_num_shards(idx, None) == 32  # documented default
        qs = spark.createDataFrame([(0, "the data")],
                                   "query_id int, query string")
        got = _key(bm25.bm25_wand_sharded_from_index(
            spark, idx, qs, n, avgdl, k=10, num_shards=8))
        assert got
    finally:
        with open(meta_p, "w") as f:
            json.dump(meta, f)


def test_bake_meta_keys_survive_shards_meta(spark, built):
    """write_index_meta and write_shards_meta merge rather than clobber:
    both key families coexist after either write order."""
    _docs, idx, _p, n, avgdl = built
    meta = ib.read_index_meta(idx)
    assert "bake_avgdl" in meta and "num_shards" in meta
    ib.write_shards_meta(idx, 8)
    ib.write_index_meta(idx, bake_avgdl=meta["bake_avgdl"],
                        n_docs_at_bake=meta["n_docs_at_bake"])
    meta2 = ib.read_index_meta(idx)
    assert meta2 == meta
