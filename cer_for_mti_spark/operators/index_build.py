"""SPIMI-style distributed inverted-index build.

Pipeline (all declarative until the posting-run codec, which is a grouped
pandas UDF over Arrow batches):

    documents (doc_id, text)
      -> tokenize (functions/analyze.py)                    [narrow]
      -> posexplode -> groupBy(doc_id, term).count()        [shuffle 1: by
         (doc_id, term) — skew-free, doc_id spreads hot terms]
      -> doc_stats (doclen, N, avgdl)                       [reuses shuffle 1]
      -> salted groupBy(term, salt) collect_list            [shuffle 2: hot
         terms (stop words) split across SALT buckets — explicit skew
         handling per BASELINE.json north_rule; AQE skew handling does not
         cover aggregations]
      -> groupBy(term) merge + array_sort                   [shuffle 3: moves
         pre-aggregated struct arrays, ≤SALT rows/term]
      -> Arrow-batched scalar pandas UDF encode             [narrow: one
         Python crossing per batch of terms, numpy codecs inside]
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
from pyspark.sql import types as T

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


ENCODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("doclens", T.BinaryType()),
        T.StructField("block_last", T.ArrayType(T.LongType())),
        T.StructField("block_max", T.ArrayType(T.DoubleType())),
        T.StructField("max_impact", T.DoubleType()),
    ]
)


def _make_encode_udf(avgdl: float):
    """Scalar pandas UDF (one Arrow batch = thousands of terms) turning a
    term's sorted (ids, tfs, dls) arrays into compressed posting columns +
    block maxes. Much cheaper than per-group applyInPandas: Python is
    crossed once per BATCH, numpy does the per-term work."""

    @F.pandas_udf(ENCODE_SCHEMA)
    def encode(ids_s: pd.Series, tfs_s: pd.Series, dls_s: pd.Series) -> pd.DataFrame:
        out = {k.name: [] for k in ENCODE_SCHEMA.fields}
        for ids_l, tfs_l, dls_l in zip(ids_s, tfs_s, dls_s):
            ids = np.asarray(ids_l, dtype=np.int64)
            tfs = np.asarray(tfs_l, dtype=np.uint64)
            dls = np.asarray(dls_l, dtype=np.uint64)
            imp = _impact(tfs, dls, avgdl)
            nblk = (len(ids) + BLOCK - 1) // BLOCK
            pad = nblk * BLOCK - len(ids)
            block_last = ids[
                np.minimum(np.arange(1, nblk + 1) * BLOCK - 1, len(ids) - 1)
            ]
            imp_p = np.pad(imp, (0, pad), constant_values=0.0).reshape(nblk, BLOCK)
            out["doc_ids"].append(delta_encode(ids))
            out["tfs"].append(varint_encode(tfs))
            out["doclens"].append(varint_encode(dls))
            out["block_last"].append(block_last.tolist())
            out["block_max"].append(imp_p.max(axis=1).tolist())
            out["max_impact"].append(float(imp.max()))
        return pd.DataFrame(out)

    return encode


def build_postings(doc_terms: DataFrame, doc_stats: DataFrame, avgdl: float,
                   salt: int | None = None, n_docs: int | None = None) -> DataFrame:
    """Two-phase salted SPIMI merge -> compressed postings with block maxes.

    Phase 1 groups on (term, salt=hash(doc_id)%S) so a stop-word's posting
    is accumulated by S tasks instead of one (explicit skew handling);
    phase 2 merges the <=S partial runs per term — it moves pre-aggregated
    struct arrays, not raw rows. Both phases are JVM collect_list
    aggregations (partial+final HashAggregate under Catalyst); Python is
    entered exactly once, in the Arrow-batched encode UDF."""
    if salt is None:
        salt = salt_for(n_docs or 1_000_000)

    with_dl = doc_terms.join(doc_stats, "doc_id")  # co-keyed shuffle on doc_id
    salted = with_dl.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)).cast("int")
    )
    runs = salted.groupBy("term", "salt").agg(
        F.collect_list(F.struct("doc_id", "tf", "doclen")).alias("run")
    )
    merged = runs.groupBy("term").agg(
        F.array_sort(F.flatten(F.collect_list("run"))).alias("plist")
    )
    cols = merged.select(
        "term",
        F.size("plist").cast("long").alias("df"),
        F.transform("plist", lambda s: s["doc_id"]).alias("_ids"),
        F.transform("plist", lambda s: s["tf"].cast("long")).alias("_tfs"),
        F.transform("plist", lambda s: s["doclen"]).alias("_dls"),
    )
    encode = _make_encode_udf(avgdl)
    return cols.select(
        "term", "df", encode("_ids", "_tfs", "_dls").alias("p")
    ).select("term", "df", "p.*")


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
    # repartition on the shard key first: without it every input task
    # writes a file into every shard dir (num_shards x tasks tiny files)
    sharded = shard_postings(postings, num_shards).repartition(
        num_shards, "shard"
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/postings"
    )
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")


def build_index(docs: DataFrame, mode: str = "simple",
                salt: int | None = None) -> tuple[DataFrame, DataFrame, int, float]:
    """Full build; returns (postings, doc_stats, N, avgdl).

    doc_terms/doc_stats are cached across the two passes (stats, then
    postings); at cluster scale the equivalent is persisting doc_terms to
    the table layer between passes — see plans/lineage.py, which does
    exactly that for the resumable build."""
    doc_terms = build_doc_terms(docs, mode=mode).persist()
    doc_stats = build_doc_stats(doc_terms).persist()
    n, avgdl = corpus_stats(doc_stats)
    postings = build_postings(doc_terms, doc_stats, avgdl, salt=salt, n_docs=n)
    return postings, doc_stats, n, avgdl
