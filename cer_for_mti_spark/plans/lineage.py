"""Per-partition lineage checkpoints + resumable index builds.

BASELINE.json north_rule: every build stage checkpoints per-partition
lineage (partition id, term range, doc count, bytes) to a metrics table so
index construction resumes from the last committed snapshot.

The sandbox has no Iceberg jar, so the table layer is parquet + an atomic
manifest protocol that gives the same semantics:

- the term space is split into BUCKETS by the portable term hash;
- each bucket's postings are written to ``<path>/postings/bucket=<i>/``
  via a staging dir + atomic rename (the commit point);
- one lineage row per committed bucket is appended as its own parquet
  file under ``<path>/lineage/`` (append-only, idempotent by bucket id);
- resume = planned buckets ANTI-JOIN committed lineage -> pending buckets
  (the reference has no analogue: it restarts from scratch, SURVEY.md §1).

Buckets are a pure function of term -> deterministic: a resumed build is
bit-identical to a from-scratch build (tests/test_lineage.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cer_for_mti_spark.functions.hashing import md5_60
from cer_for_mti_spark.operators import index_build as ib

LINEAGE_SCHEMA = (
    "partition_id int, term_lo string, term_hi string, n_terms long, "
    "doc_count long, bytes long, committed_at timestamp"
)


def committed_buckets(spark: SparkSession, path: str) -> set[int]:
    lineage_dir = f"{path}/lineage"
    if not os.path.isdir(lineage_dir) or not os.listdir(lineage_dir):
        return set()
    rows = spark.read.parquet(lineage_dir).select("partition_id").collect()
    return {r.partition_id for r in rows}


def _commit_bucket(spark: SparkSession, path: str, bucket: int,
                   postings_b: DataFrame) -> None:
    final_dir = f"{path}/postings/bucket={bucket}"
    staging = f"{path}/.staging/bucket={bucket}"
    shutil.rmtree(staging, ignore_errors=True)
    postings_b.write.mode("overwrite").parquet(staging)
    stats = spark.read.parquet(staging).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.min("term").alias("term_lo"),
        F.max("term").alias("term_hi"),
        F.sum("df").alias("doc_count"),
        F.sum(F.length("doc_ids") + F.length("tfs") + F.length("doclens")).alias(
            "bytes"
        ),
    ).collect()[0]
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    os.rename(staging, final_dir)  # atomic commit point
    lineage_row = spark.createDataFrame(
        [(
            bucket, stats["term_lo"], stats["term_hi"],
            int(stats["n_terms"] or 0), int(stats["doc_count"] or 0),
            int(stats["bytes"] or 0),
        )],
        "partition_id int, term_lo string, term_hi string, n_terms long, "
        "doc_count long, bytes long",
    ).withColumn("committed_at", F.current_timestamp())
    # idempotent append: one file per bucket id
    lineage_row.coalesce(1).write.mode("append").parquet(f"{path}/lineage")


def build_index_resumable(spark: SparkSession, docs: DataFrame, path: str,
                          n_buckets: int = 8, mode: str = "simple",
                          salt: int | None = None,
                          fail_after: int | None = None) -> list[int]:
    """Build (or resume) the index at `path`. Returns the bucket ids
    processed THIS run. `fail_after` aborts after that many bucket
    commits (test hook simulating a mid-build crash)."""
    os.makedirs(path, exist_ok=True)
    done = committed_buckets(spark, path)
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return []

    doc_terms = ib.build_doc_terms_narrow(docs, mode=mode)
    doc_stats = ib.build_doc_stats(docs, mode=mode)
    n, avgdl = ib.corpus_stats(doc_stats)
    doc_terms = doc_terms.withColumn(
        "bucket", F.pmod(md5_60(F.col("term")), F.lit(n_buckets)).cast("int")
    ).cache()
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    with open(f"{path}/corpus_stats.txt", "w") as f:
        f.write(f"{n}\n{avgdl!r}\n")

    processed = []
    for i, b in enumerate(pending):
        dt_b = doc_terms.filter(F.col("bucket") == b).drop("bucket")
        postings_b = ib.build_postings(dt_b, doc_stats, avgdl, salt=salt, n_docs=n)
        _commit_bucket(spark, path, b, postings_b)
        processed.append(b)
        if fail_after is not None and i + 1 >= fail_after:
            break
    doc_terms.unpersist()
    return processed


def _commit_runs_bucket(spark: SparkSession, path: str, bucket: int,
                        runs_b: DataFrame) -> None:
    """Same staging + atomic-rename commit protocol as _commit_bucket,
    but for RUN-level rows (term, bucket, first_id..max_impact) under
    <path>/runs/shard=<i>/ — the layout bm25_wand_sharded_from_index
    queries (`shard` prunes directories, `bucket` stays as data)."""
    final_dir = f"{path}/runs/shard={bucket}"
    staging = f"{path}/.staging/runs_shard={bucket}"
    shutil.rmtree(staging, ignore_errors=True)
    runs_b.write.mode("overwrite").parquet(staging)
    stats = spark.read.parquet(staging).agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.min("term").alias("term_lo"),
        F.max("term").alias("term_hi"),
        F.sum("df").alias("doc_count"),
        F.sum(F.length("doc_ids") + F.length("tfs") + F.length("doclens")).alias(
            "bytes"
        ),
    ).collect()[0]
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    os.rename(staging, final_dir)  # atomic commit point
    lineage_row = spark.createDataFrame(
        [(
            bucket, stats["term_lo"], stats["term_hi"],
            int(stats["n_runs"] or 0), int(stats["doc_count"] or 0),
            int(stats["bytes"] or 0),
        )],
        "partition_id int, term_lo string, term_hi string, n_terms long, "
        "doc_count long, bytes long",
    ).withColumn("committed_at", F.current_timestamp())
    lineage_row.coalesce(1).write.mode("append").parquet(f"{path}/lineage")


def build_runs_index_resumable(spark: SparkSession, docs: DataFrame,
                               path: str, n_buckets: int = 8,
                               mode: str = "simple",
                               salt: int | None = None,
                               fail_after: int | None = None) -> list[int]:
    """Build (or resume) a RUN-level index at `path` — the
    bounded-task-bytes query layout (write_runs_index) with the same
    per-bucket lineage + atomic-commit protocol as the merged-postings
    build. Term-hash buckets are deterministic, so a resumed build is
    bit-identical to a from-scratch one; the result is queryable with
    bm25.bm25_wand_sharded_from_index(num_shards=n_buckets)."""
    os.makedirs(path, exist_ok=True)
    done = committed_buckets(spark, path)
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return []

    doc_terms = ib.build_doc_terms_narrow(docs, mode=mode)
    doc_stats = ib.build_doc_stats(docs, mode=mode)
    n, avgdl = ib.corpus_stats(doc_stats)
    doc_terms = doc_terms.withColumn(
        "tshard", F.pmod(md5_60(F.col("term")), F.lit(n_buckets)).cast("int")
    ).cache()
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    with open(f"{path}/corpus_stats.txt", "w") as f:
        f.write(f"{n}\n{avgdl!r}\n")

    processed = []
    for i, b in enumerate(pending):
        dt_b = doc_terms.filter(F.col("tshard") == b).drop("tshard")
        runs_b = ib.build_posting_runs(dt_b, doc_stats, avgdl, salt=salt,
                                       n_docs=n)
        _commit_runs_bucket(spark, path, b, runs_b)
        processed.append(b)
        if fail_after is not None and i + 1 >= fail_after:
            break
    doc_terms.unpersist()
    return processed


def read_runs_index(spark: SparkSession, path: str):
    """-> (runs, doc_stats, n, avgdl); runs carry `shard` as a partition
    column (term-hash pruning) and `bucket` as data (doc-range sharding
    for per-(query, bucket) scoring)."""
    runs = spark.read.option("basePath", f"{path}/runs").parquet(
        f"{path}/runs"
    )
    doc_stats = spark.read.parquet(f"{path}/doc_stats")
    with open(f"{path}/corpus_stats.txt") as f:
        n = int(f.readline())
        avgdl = float(f.readline())
    return runs, doc_stats, n, avgdl


def read_index(spark: SparkSession, path: str):
    """-> (postings, doc_stats, n, avgdl). Postings carry their bucket as
    a partition column (partition-prunable by the term-hash)."""
    postings = spark.read.option("basePath", f"{path}/postings").parquet(
        f"{path}/postings"
    )
    doc_stats = spark.read.parquet(f"{path}/doc_stats")
    with open(f"{path}/corpus_stats.txt") as f:
        n = int(f.readline())
        avgdl = float(f.readline())
    return postings, doc_stats, n, avgdl


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/lineage")
