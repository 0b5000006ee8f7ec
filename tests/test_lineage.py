"""Resumable build: a crash after 2 of 5 buckets resumes with exactly the
remaining buckets and the final index equals a from-scratch build
(FIXTURES.md §6)."""

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.plans import lineage


def _index_key(spark, path):
    postings, doc_stats, n, avgdl = lineage.read_index(spark, path)
    rows = postings.select(
        "term", "df", F.md5(F.col("doc_ids")).alias("ids_md5"),
        F.md5(F.col("tfs")).alias("tfs_md5"),
    ).collect()
    return sorted((r.term, r.df, r.ids_md5, r.tfs_md5) for r in rows)


def test_resume_equals_full_build(spark, webtext, tmp_path):
    full = str(tmp_path / "full")
    part = str(tmp_path / "part")

    done = lineage.build_index_resumable(spark, webtext, full, n_buckets=5,
                                         mode="chem", salt=2)
    assert done == [0, 1, 2, 3, 4]

    # simulated crash after 2 bucket commits
    first = lineage.build_index_resumable(spark, webtext, part, n_buckets=5,
                                          mode="chem", salt=2, fail_after=2)
    assert first == [0, 1]
    assert lineage.committed_buckets(spark, part) == {0, 1}

    # resume processes exactly the remaining buckets
    rest = lineage.build_index_resumable(spark, webtext, part, n_buckets=5,
                                         mode="chem", salt=2)
    assert rest == [2, 3, 4]
    # idempotent: nothing left
    assert lineage.build_index_resumable(spark, webtext, part, n_buckets=5,
                                         mode="chem", salt=2) == []

    assert _index_key(spark, part) == _index_key(spark, full)

    lin = lineage.read_lineage(spark, part)
    assert lin.count() == 5
    assert {r.partition_id for r in lin.collect()} == set(range(5))
    assert lin.filter(F.col("bytes") <= 0).count() == 0


def test_runs_index_resume_bit_identity(spark, webtext, tmp_path):
    """Crash-resume over the RUN-level index: a build killed after 2 of 5
    bucket commits resumes with exactly the remaining buckets, the run
    bytes are bit-identical to a from-scratch resumable build, and the
    result is queryable via the sharded-from-index path rank-identically
    to open-DF sharded scoring."""
    from cer_for_mti_spark.operators import index_build as ib

    full = str(tmp_path / "rfull")
    part = str(tmp_path / "rpart")
    done = lineage.build_runs_index_resumable(spark, webtext, full,
                                              n_buckets=5, mode="chem",
                                              salt=3)
    assert done == [0, 1, 2, 3, 4]
    first = lineage.build_runs_index_resumable(spark, webtext, part,
                                               n_buckets=5, mode="chem",
                                               salt=3, fail_after=2)
    assert first == [0, 1]
    rest = lineage.build_runs_index_resumable(spark, webtext, part,
                                              n_buckets=5, mode="chem",
                                              salt=3)
    assert rest == [2, 3, 4]
    assert lineage.build_runs_index_resumable(
        spark, webtext, part, n_buckets=5, mode="chem", salt=3) == []

    def key(path):
        runs, _, _, _ = lineage.read_runs_index(spark, path)
        rows = runs.select(
            "term", "bucket", "df", F.md5(F.col("doc_ids")).alias("i"),
            F.md5(F.col("tfs")).alias("t"), F.md5(F.col("doclens")).alias("d"),
        ).collect()
        return sorted((r.term, r.bucket, r.df, r.i, r.t, r.d) for r in rows)

    assert key(part) == key(full) and len(key(part)) > 0

    runs, ds, n, avgdl = lineage.read_runs_index(spark, part)
    q = spark.createDataFrame([(0, "insulin"), (1, "the data")],
                              "query_id int, query string")
    got = bm25.bm25_wand_sharded_from_index(spark, part, q, n, avgdl, k=5,
                                            mode="chem", num_shards=5,
                                            base_df=runs)
    dt = ib.build_doc_terms(webtext, mode="chem")
    ds2 = ib.build_doc_stats(dt)
    open_runs = ib.build_posting_runs(dt, ds2, avgdl, salt=3, n_docs=n)
    want = bm25.bm25_wand_sharded(q, open_runs, n, avgdl, k=5, mode="chem")
    k_ = lambda rows: sorted((r.query_id, r.doc_id, r.rank,
                              round(r.score, 6)) for r in rows)
    assert k_(got.collect()) == k_(want.collect()) and got.count() > 0


def test_resumed_index_queryable(spark, webtext, tmp_path):
    path = str(tmp_path / "idx")
    lineage.build_index_resumable(spark, webtext, path, n_buckets=3,
                                  mode="chem", salt=2, fail_after=1)
    lineage.build_index_resumable(spark, webtext, path, n_buckets=3,
                                  mode="chem", salt=2)
    postings, doc_stats, n, avgdl = lineage.read_index(spark, path)
    q = spark.createDataFrame([(0, "insulin")], "query_id int, query string")
    rows = bm25.bm25_wand(q, postings, n, avgdl, k=5, mode="chem").collect()
    assert len(rows) > 0 and rows[0].rank == 1
