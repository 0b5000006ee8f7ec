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
