"""SPIMI-style distributed inverted-index build.

Pipeline (all declarative until the posting-run codec, which is a grouped
pandas UDF over Arrow batches):

    documents (doc_id, text)
      -> tokenize (functions/analyze.py)                    [narrow]
      -> posexplode -> groupBy(doc_id, term).count()        [shuffle 1: by
         (doc_id, term) — skew-free, doc_id spreads hot terms]
      -> doc_stats (doclen, N, avgdl)                       [reuses shuffle 1]
      -> salted groupBy(term, salt).applyInPandas           [shuffle 2: hot
         terms (stop words) split across SALT buckets — explicit skew
         handling per BASELINE.json north_rule; AQE skew handling does not
         cover aggregations]
      -> groupBy(term).applyInPandas merge                  [shuffle 3: moves
         only delta+varint-compressed runs (~8x smaller), ≤SALT rows/term]
      -> postings (term, shard, df, doc_ids:binary, tfs:binary,
         block_last:array<long>, block_max:array<double>, max_impact)
         written hash-sharded by term -> partition pruning at query time.

The reference's analogue is the per-doc term-set dict construction
(run_tool_evaluation.py:472-478) transposed; compression/sharding/salting
are the scale-path additions (SURVEY.md §4.2).

Scale notes (100 TB / 10^12 docs): shuffle 1 keys on (doc_id, term) so no
hot key exists; shuffle 2's worst key holds df_max/SALT entries (a
stop-word appearing in every doc: 10^12/64 ≈ 1.6e10 per bucket — still too
big for one task at full web scale, so SALT scales with corpus size:
salt = pmod(hash(doc_id), salt_for(N))); shuffle 3 moves compressed bytes
only. Block maxes (every BLOCK docs) enable WAND skipping at query time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cer_for_mti_spark.functions import analyze
from cer_for_mti_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)

K1 = 1.2
B = 0.75
BLOCK = 128

RUN_SCHEMA = (
    "term string, salt int, run_df long, doc_ids binary, tfs binary, "
    "doclens binary"
)
POSTING_SCHEMA = (
    "term string, df long, doc_ids binary, tfs binary, doclens binary, "
    "block_last array<long>, block_max array<double>, max_impact double"
)


def build_doc_terms(docs: DataFrame, text_col: str = "text",
                    mode: str = "simple") -> DataFrame:
    """documents -> (doc_id, term, tf). One wide shuffle keyed on
    (doc_id, term): skew-free because doc_id participates in the key.
    Catalyst plans this as partial HashAggregate -> exchange -> final."""
    toks = analyze.tokenize(docs.select("doc_id", text_col), text_col, mode)
    return (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def build_doc_stats(doc_terms: DataFrame) -> DataFrame:
    """(doc_id, doclen). doclen = total token count (sum tf)."""
    return doc_terms.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("doclen"))


def corpus_stats(doc_stats: DataFrame) -> tuple[int, float]:
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def _impact(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 tf/length component (idf applied at query time):
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))


def salt_for(n_docs: int) -> int:
    """Salt bucket count scaling with corpus size so the hottest key
    (a term in every doc) stays ~<= 4M entries per bucket."""
    return int(max(4, min(4096, n_docs // 4_000_000 + 4)))


def build_postings(doc_terms: DataFrame, doc_stats: DataFrame, avgdl: float,
                   salt: int | None = None, n_docs: int | None = None) -> DataFrame:
    """Two-phase salted SPIMI merge -> compressed postings with block maxes."""
    if salt is None:
        salt = salt_for(n_docs or 1_000_000)

    with_dl = doc_terms.join(doc_stats, "doc_id")  # co-keyed shuffle on doc_id
    salted = with_dl.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)).cast("int")
    )

    def make_run(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
        dls = pdf["doclen"].to_numpy()[order].astype(np.uint64)
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "salt": [int(pdf["salt"].iloc[0])],
                "run_df": [len(ids)],
                "doc_ids": [delta_encode(ids)],
                "tfs": [varint_encode(tfs)],
                "doclens": [varint_encode(dls)],
            }
        )

    runs = salted.groupBy("term", "salt").applyInPandas(make_run, RUN_SCHEMA)

    def merge_runs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([delta_decode(b) for b in pdf["doc_ids"]])
        tfs = np.concatenate([varint_decode(b) for b in pdf["tfs"]])
        dls = np.concatenate([varint_decode(b) for b in pdf["doclens"]])
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        imp = _impact(tfs, dls, avgdl)
        nblk = (len(ids) + BLOCK - 1) // BLOCK
        pad = nblk * BLOCK - len(ids)
        block_last = ids[np.minimum(np.arange(1, nblk + 1) * BLOCK - 1, len(ids) - 1)]
        imp_p = np.pad(imp, (0, pad), constant_values=0.0).reshape(nblk, BLOCK)
        block_max = imp_p.max(axis=1)
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "df": [len(ids)],
                "doc_ids": [delta_encode(ids)],
                "tfs": [varint_encode(tfs)],
                "doclens": [varint_encode(dls)],
                "block_last": [block_last.tolist()],
                "block_max": [block_max.tolist()],
                "max_impact": [float(imp.max())],
            }
        )

    return runs.groupBy("term").applyInPandas(merge_runs, POSTING_SCHEMA)


def shard_postings(postings: DataFrame, num_shards: int = 32) -> DataFrame:
    """Persisted shard column = md5-based hash of term (portable,
    partition-prunable: query terms map to shards by the same function)."""
    from cer_for_mti_spark.functions.hashing import md5_60

    return postings.withColumn(
        "shard", F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int")
    )


def write_index(postings: DataFrame, doc_stats: DataFrame, path: str,
                num_shards: int = 32) -> None:
    """Parquet layout partitioned by shard (Iceberg-style table layer —
    the sandbox has no Iceberg jar; plans/lineage.py provides the
    snapshot/manifest + resume semantics on plain parquet)."""
    shard_postings(postings, num_shards).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{path}/postings")
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")


def build_index(docs: DataFrame, mode: str = "simple",
                salt: int | None = None) -> tuple[DataFrame, DataFrame, int, float]:
    """Full build; returns (postings, doc_stats, N, avgdl)."""
    doc_terms = build_doc_terms(docs, mode=mode)
    doc_stats = build_doc_stats(doc_terms)
    n, avgdl = corpus_stats(doc_stats)
    postings = build_postings(doc_terms, doc_stats, avgdl, salt=salt, n_docs=n)
    return postings, doc_stats, n, avgdl
