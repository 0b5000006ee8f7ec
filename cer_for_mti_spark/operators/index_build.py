"""SPIMI-style distributed inverted-index build.

Three result-identical plans (tests assert same posting bytes + same
WAND top-k; pick by where the bottleneck is):

1. ``spimi`` (build_postings_spimi) — classic single-pass in-memory
   indexing: ONE mapInPandas pass per input split does tokenize ->
   per-doc count -> per-term sorted-run ENCODE (delta+varint, block
   maxes). The build's only shuffle moves COMPRESSED RUNS, grouped by
   term and merged by byte concatenation with a one-varint boundary
   patch (merge_encoded_runs). No raw (doc_id, term, tf) row ever
   crosses the network; a hot term's decoded posting is never
   materialized. The 100 TB plan.

2. ``shuffle`` (build_doc_terms_with_dl + build_postings) — JVM codegen
   split + explode + groupBy(doc_id, term) [skew-free: doc_id in the
   key], then range-salted groupBy(term, bucket) run encode + the same
   compressed-run merge. First exchange transports the full doc_terms
   relation; fastest absolute on one machine (memory-speed shuffle,
   JVM tokenizer). The DuckDB-oracle-matched definition.

3. ``narrow`` (build_doc_terms_narrow + build_postings) — Arrow-batched
   per-doc Counter (no first shuffle) feeding the same salted run
   encode + merge.

Output schema (POSTING_SCHEMA): term, df, doc_ids/tfs/doclens as
delta+varint binary, block_last/block_max (per ~128-doc block, run-local
— WAND needs only (last_doc, max) per block, alignment is irrelevant),
max_impact. Hash-sharded on write -> partition pruning at query time.

Skew: a stop word in every one of 10^12 docs is encoded by S range-bucket
tasks (salt_for(n) caps ~4M entries/bucket; under spimi S = the input
partition count) and merged as O(S) byte concats. AQE skew handling does
not cover aggregations, hence the explicit buckets.

The reference's analogue is the per-doc term-set dict construction
(run_tool_evaluation.py:472-478) transposed; compression/sharding/salting
are the scale-path additions (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import re
import shutil

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
    return build_doc_terms_with_dl(docs, text_col, mode).drop("doclen")


def build_doc_terms_with_dl(docs: DataFrame, text_col: str = "text",
                            mode: str = "simple") -> DataFrame:
    """(doc_id, term, tf, doclen) — doclen is size(tokens), computed
    BEFORE the explode and carried through the aggregation via first().
    This removes the doc_terms<->doc_stats join (a full co-keyed shuffle
    of the exploded relation) from the postings build: at 10^12 docs
    that join would reshuffle the entire token relation a second time."""
    toks = analyze.tokenize(docs.select("doc_id", text_col), text_col, mode)
    out = (
        toks.select(
            "doc_id",
            F.size("tokens").cast("long").alias("doclen"),
            F.explode("tokens").alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.first("doclen").alias("doclen"),
        )
    )
    # provenance marker: lets build_postings fuse the whole build back
    # into the single-pass SPIMI plan (result-identical; see build_postings)
    out._cer_fuse_src = (docs, text_col, mode)
    return out


_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
    ]
)

# Java's \s (used by the JVM split in analyze.simple_tokens_col) is
# ASCII-only; mirror it exactly so the narrow and shuffle paths agree
# byte-for-byte (and both agree with the DuckDB oracle's \s+).
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _object_df(out: dict) -> pd.DataFrame:
    """dict-of-lists -> DataFrame with object dtype columns. An EMPTY
    plain DataFrame defaults every column to float64, and pyarrow's
    NumPyConverter refuses float64 -> list<int64> for the array columns —
    empty Arrow batches (shuffle partitions with no groups) then kill the
    task. Object dtype converts correctly whether empty or not."""
    return pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})


def _batch_doc_term_counts(texts, mode: str):
    """Vectorized tokenize + per-(doc, term) counting for one Arrow batch
    (`texts`: a pandas Series or a pyarrow string (Chunked)Array).

    Returns (doc_pos, codes, vocab, tfs, doclens):
      doc_pos : int64 batch-row index of each (doc, term) pair, ascending
      codes   : int64 index into `vocab` of the pair's term
      vocab   : list[str] batch-local dictionary (terms stay dictionary-
                encoded — materializing a per-pair string column costs a
                600k-object np.unique per batch downstream)
      tfs     : int64 term frequency
      doclens : int64 token count per BATCH ROW (len == len(texts))
    Pairs are ordered doc-major, then by FIRST OCCURRENCE within the doc
    (Counter key order — byte-compatible with the scalar path)."""
    import pyarrow as pa

    from cer_for_mti_spark.functions.analyze import _tokenize_codes_pa

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.Array.from_pandas(texts, type=pa.string())
    # codes come straight from the tokenizer's dictionary pass — the
    # per-occurrence normalized strings are never materialized (the old
    # path built the flat token array only to dictionary_encode it again)
    codes, vocab_pa, offs = _tokenize_codes_pa(arr, mode)
    n_rows = len(offs) - 1
    doclens = np.diff(offs)
    if offs[-1] == 0:
        z = np.array([], dtype=np.int64)
        return z, z, [], z, doclens
    vocab = vocab_pa.to_pylist()
    n_dict = len(vocab)
    doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), doclens)
    key = doc_idx * n_dict + codes
    # group by key via a STABLE argsort (radix for ints — equal to
    # np.unique's sort on the nearly-doc-sorted keys here, ~2.3x cheaper
    # when the key order is adversarial). Stability makes the first
    # element of each sorted group the key's first occurrence, which
    # np.unique's return_index also guarantees — same outputs.
    idx = np.argsort(key, kind="stable")
    sk = key[idx]
    starts = np.concatenate(([0], np.flatnonzero(sk[1:] != sk[:-1]) + 1))
    uk = sk[starts]
    tf = np.diff(np.concatenate((starts, [len(sk)])))
    first_idx = idx[starts]
    order = np.argsort(first_idx, kind="stable")  # doc-major, 1st-occurrence
    uk, tf = uk[order], tf[order]
    return uk // n_dict, uk % n_dict, vocab, tf.astype(np.int64), doclens


def _make_term_counts_udf(mode: str):
    """Arrow-batched tokenize + per-doc term counting in ONE Python
    crossing. The per-doc counting replaces the groupBy(doc_id, term)
    shuffle of the declarative path: every token of a doc is already
    co-located in its row, so that shuffle moved the complete doc_terms
    relation while reducing nothing. Tokenize + count are fully
    vectorized (analyze._tokenize_flat_pa + np.unique)."""
    if mode not in ("simple", "chem", "chem+greek"):
        raise ValueError(f"unknown tokenize mode {mode!r}")

    @F.pandas_udf(_COUNTS_SCHEMA)
    def term_counts(text: pd.Series) -> pd.DataFrame:
        doc_pos, codes, vocab, tfs, doclens = _batch_doc_term_counts(
            text, mode)
        n_rows = len(doclens)
        per_doc = np.bincount(doc_pos, minlength=n_rows)
        cuts = np.cumsum(per_doc)[:-1]
        terms = np.asarray(vocab, dtype=object)[codes] if len(codes) \
            else np.array([], dtype=object)
        return _object_df({
            "terms": np.split(terms, cuts),
            "tfs": np.split(tfs.astype(np.int32), cuts),
        })

    return term_counts


def build_doc_terms_narrow(docs: DataFrame, text_col: str = "text",
                           mode: str = "simple") -> DataFrame:
    """(doc_id, term, tf, doclen) with NO shuffle — the scale path.

    The declarative twin (build_doc_terms_with_dl) explodes raw tokens and
    aggregates by (doc_id, term): Catalyst's partial HashAggregate already
    finishes the counts map-side (a doc's tokens never span input splits),
    so its exchange moves the final relation while reducing nothing — pure
    shuffle cost. Here the count happens inside the doc's own row; the
    postings build's salted term merge becomes the build's ONLY full
    shuffle. Tests assert both paths produce identical relations."""
    counted = docs.select("doc_id", _make_term_counts_udf(mode)(text_col).alias("c"))
    out = counted.select(
        "doc_id",
        F.aggregate("c.tfs", F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("doclen"),
        F.explode(F.arrays_zip(F.col("c.terms").alias("term"),
                               F.col("c.tfs").alias("tf"))).alias("e"),
    ).select("doc_id", F.col("e.term").alias("term"),
             F.col("e.tf").alias("tf"), "doclen")
    out._cer_fuse_src = (docs, text_col, mode)  # see build_postings fusion
    return out


def build_doc_stats(doc_terms_or_docs: DataFrame, text_col: str = "text",
                    mode: str = "simple") -> DataFrame:
    """(doc_id, doclen). When given the raw documents table this is a
    NARROW projection (size of the token array — no shuffle at all);
    given a doc_terms relation it falls back to the sum(tf) aggregation."""
    cols = set(doc_terms_or_docs.columns)
    if "tf" in cols:
        return doc_terms_or_docs.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("doclen")
        )
    if mode in ("chem", "chem+greek"):
        # count-only UDF: doclen is all this pass needs — shipping the
        # full token arrays back through Arrow just to F.size them
        # roughly doubled the build's Python-boundary bytes (guide §4.1)
        return doc_terms_or_docs.select(
            "doc_id",
            analyze.make_token_count_udf(mode)(F.col(text_col))
            .alias("doclen"),
        )
    toks = analyze.tokenize(
        doc_terms_or_docs.select("doc_id", text_col), text_col, mode
    )
    return toks.select(
        "doc_id", F.size("tokens").cast("long").alias("doclen")
    )


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


def _range_bucket(doc_id_col: str, width: int):
    """Exact integer floor(doc_id / width) as a Column (see build_postings)."""
    w = int(width)
    return F.expr(
        f"({doc_id_col} - pmod({doc_id_col}, {w}L)) div {w}L"
    ).cast("long")


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

# a run = one doc-id-RANGE bucket's slice of a term's posting, already
# compressed; first_id/last_id let the merge patch delta boundaries
RUN_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("df", T.LongType()),
    ]
    + ENCODE_SCHEMA.fields
)

MERGED_SCHEMA = T.StructType(
    [T.StructField("df", T.LongType())] + ENCODE_SCHEMA.fields
)


def _encode_arrays(ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                   avgdl: float) -> tuple:
    """Sorted posting arrays -> (doc_ids, tfs, doclens, block_last,
    block_max, max_impact). Blocks are run-local and need no 128-alignment
    across runs: WAND only requires (last_doc, max) per block."""
    imp = _impact(tfs, dls, avgdl)
    nblk = (len(ids) + BLOCK - 1) // BLOCK
    pad = nblk * BLOCK - len(ids)
    block_last = ids[np.minimum(np.arange(1, nblk + 1) * BLOCK - 1, len(ids) - 1)]
    imp_p = np.pad(imp, (0, pad), constant_values=0.0).reshape(nblk, BLOCK)
    return (
        delta_encode(ids), varint_encode(tfs), varint_encode(dls),
        block_last.tolist(), imp_p.max(axis=1).tolist(), float(imp.max()),
    )


def _varint_encode_segmented(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a flat array, returning (buffer, per-value byte
    OFFSETS) so callers can slice out contiguous segments — byte-identical
    to concatenating varint_encode over the segments (each value's bytes
    are contiguous and row-major)."""
    from cer_for_mti_spark.functions.codecs import _SHIFTS, _THRESHOLDS

    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        m = v >= t
        if not m.any():
            break
        nbytes += m.astype(np.int64)
    maxb = int(nbytes.max())
    offs = np.empty(len(v) + 1, dtype=np.int64)
    offs[0] = 0
    np.cumsum(nbytes, out=offs[1:])
    if maxb == 1:
        return v.astype(np.uint8).tobytes(), offs
    # scatter each value's j-th byte straight into the output buffer —
    # avoids materializing the n x maxb chunk matrix and its ragged
    # boolean selection (~1.4x cheaper on mixed-width streams)
    out = np.empty(offs[-1], dtype=np.uint8)
    pos = offs[:-1]
    for j in range(maxb):
        sel = nbytes > j
        vv = v[sel] if j else v
        byte = ((vv >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        byte |= ((nbytes[sel] - 1 > j).astype(np.uint8) << 7)
        out[pos[sel] + j] = byte
    return out.tobytes(), offs


def _encode_runs_flush_raw(d: np.ndarray, t: np.ndarray,
                           dl: np.ndarray, starts: np.ndarray,
                           avgdl: float) -> dict:
    """Vectorized twin of calling _encode_arrays per term slice: one set
    of whole-flush numpy passes, instead of ~10 small-array kernel
    launches per term (measured 134us/term, i.e. ~0.7s per 5k-term flush
    — this path does the same work in ~0.1s). Inputs are the flush's
    lexsorted (doc_id, tf, doclen) arrays and the group-slice starts
    (len = n_groups + 1). Byte-identical content.

    Returns raw columnar components (buffers + offsets), which
    _runs_record_batch assembles into Arrow arrays ZERO-COPY."""
    n = len(d)
    lens = np.diff(starts)
    imp = _impact(t, dl, avgdl)
    max_imp = np.maximum.reduceat(imp, starts[:-1])
    # block structure: within-group index // BLOCK; a block's end is the
    # element before the next block start (the next group's first posting
    # starts a new block, so this holds across group boundaries too)
    within = np.arange(n, dtype=np.int64) - np.repeat(starts[:-1], lens)
    bstarts = np.flatnonzero(within % BLOCK == 0)
    bends = np.concatenate((bstarts[1:] - 1, [n - 1]))
    block_last_flat = d[bends]
    block_max_flat = np.maximum.reduceat(imp, bstarts)
    nblk = (lens + BLOCK - 1) // BLOCK
    blk_offs = np.concatenate(([0], np.cumsum(nblk)))
    # delta-gap doc ids (first of each group absolute), then one varint
    # pass per stream with per-group byte offsets
    prev = np.empty_like(d)
    prev[0] = 0
    prev[1:] = d[:-1]
    gaps = np.where(within == 0, d, d - prev)
    id_buf, id_offs = _varint_encode_segmented(gaps.astype(np.uint64))
    tf_buf, tf_offs = _varint_encode_segmented(t.astype(np.uint64))
    dl_buf, dl_offs = _varint_encode_segmented(dl.astype(np.uint64))
    return {
        "first_id": d[starts[:-1]],
        "last_id": d[starts[1:] - 1],
        "df": lens,
        "doc_ids": (id_buf, id_offs[starts]),
        "tfs": (tf_buf, tf_offs[starts]),
        "doclens": (dl_buf, dl_offs[starts]),
        "block_last": (block_last_flat, blk_offs),
        "block_max": (block_max_flat, blk_offs),
        "max_impact": max_imp,
    }


def _runs_record_batch(term_arr, raw: dict, bucket: np.ndarray | None = None):
    """Assemble one Arrow RecordBatch of encoded runs from
    _encode_runs_flush_raw output (zero-copy for the binary and list
    columns). Column order matches the mapInArrow schemas."""
    import pyarrow as pa

    def _bin(buf_offs):
        buf, offs = buf_offs
        return pa.Array.from_buffers(
            pa.binary(), len(offs) - 1,
            [None, pa.py_buffer(offs.astype(np.int32)),
             pa.py_buffer(buf)],
        )

    def _list(vals_offs, typ):
        vals, offs = vals_offs
        return pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(vals, type=typ))

    cols = [term_arr]
    names = ["term"]
    if bucket is not None:
        cols.append(pa.array(bucket, type=pa.int64()))
        names.append("bucket")
    cols += [
        pa.array(raw["first_id"], type=pa.int64()),
        pa.array(raw["last_id"], type=pa.int64()),
        pa.array(raw["df"], type=pa.int64()),
        _bin(raw["doc_ids"]),
        _bin(raw["tfs"]),
        _bin(raw["doclens"]),
        _list(raw["block_last"], pa.int64()),
        _list(raw["block_max"], pa.float64()),
        pa.array(raw["max_impact"], type=pa.float64()),
    ]
    names += ["first_id", "last_id", "df", "doc_ids", "tfs", "doclens",
              "block_last", "block_max", "max_impact"]
    return pa.RecordBatch.from_arrays(cols, names=names)


def isin_sorted(ids: np.ndarray, tomb: np.ndarray) -> np.ndarray:
    """Membership of ids in the SORTED int64 array tomb via searchsorted
    (no per-call re-sort). int64 throughout — mixed-dtype searchsorted
    upcasts to float64 and loses exactness past 2^53."""
    if not len(tomb) or not len(ids):
        return np.zeros(len(ids), dtype=bool)
    ids64 = ids.astype(np.int64, copy=False)
    idx = np.searchsorted(tomb, ids64)
    idx[idx == len(tomb)] = len(tomb) - 1
    return tomb[idx] == ids64


def _varint_prefix_len(buf: bytes) -> int:
    i = 0
    while buf[i] & 0x80:
        i += 1
    return i + 1


def merge_encoded_runs(runs: list[dict], avgdl: float | None = None,
                       tomb: np.ndarray | None = None) -> tuple:
    """Merge compressed runs of one term. Fast path (disjoint, ordered
    doc-id ranges — the normal case): byte-concat with a single varint
    patch per boundary (run k's first gap becomes
    first_id_k - last_id_{k-1}); never materializes the decoded posting.
    Overlapping runs (possible when input partitions are not doc-id
    ranges) fall back to decode + merge + re-encode, which needs avgdl.

    tomb (sorted int64 tombstoned doc ids) forces the decode path and
    PURGES those docs from the merged posting — df, block maxes and
    max_impact are genuinely recomputed without them (the physical half
    of delete_docs). A fully-tombstoned posting returns df == 0; callers
    drop those rows."""
    runs = sorted(runs, key=lambda r: (r["first_id"], r["last_id"]))
    overlap = any(
        r["first_id"] <= prev["last_id"] for prev, r in zip(runs, runs[1:])
    )
    if overlap or (tomb is not None and len(tomb)):
        if avgdl is None:
            raise ValueError("overlapping runs need avgdl to re-encode")
        ids = np.concatenate([delta_decode(bytes(r["doc_ids"])) for r in runs])
        tfs = np.concatenate([varint_decode(bytes(r["tfs"])) for r in runs])
        dls = np.concatenate([varint_decode(bytes(r["doclens"])) for r in runs])
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        if tomb is not None and len(tomb):
            keep = ~isin_sorted(ids, tomb)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if not len(ids):
            return 0, b"", b"", b"", [], [], 0.0
        d, t, dl, bl, bm, mi = _encode_arrays(ids, tfs, dls, avgdl)
        return len(ids), d, t, dl, bl, bm, mi
    ids_parts = [bytes(runs[0]["doc_ids"])]
    for prev, r in zip(runs, runs[1:]):
        b = bytes(r["doc_ids"])
        plen = _varint_prefix_len(b)
        gap = np.asarray([r["first_id"] - prev["last_id"]], dtype=np.uint64)
        ids_parts.append(varint_encode(gap) + b[plen:])
    block_last: list[int] = []
    block_max: list[float] = []
    for r in runs:
        block_last.extend(r["block_last"])
        block_max.extend(r["block_max"])
    return (
        int(sum(r["df"] for r in runs)),
        b"".join(ids_parts),
        b"".join(bytes(r["tfs"]) for r in runs),
        b"".join(bytes(r["doclens"]) for r in runs),
        block_last,
        block_max,
        float(max(r["max_impact"] for r in runs)),
    )


def _make_merge_runs_udf(avgdl: float, tomb_bc=None, tomb_col: bool = False):
    """Merge-runs pandas UDF. Tombstones to purge arrive either as a
    driver broadcast of the WHOLE sorted id array (tomb_bc — fine up to
    TOMBSTONE_MAX_IDS) or, with tomb_col=True, as a per-group sorted
    array<long> SECOND COLUMN (the distributed purge path: ids are
    range-joined to their doc-range bucket upstream, so no single task
    or broadcast ever holds the full tombstone set)."""
    if tomb_col:
        @F.pandas_udf(MERGED_SCHEMA)
        def merge_runs_tomb(runs_s: pd.Series,
                            tomb_s: pd.Series) -> pd.DataFrame:
            out = {k.name: [] for k in MERGED_SCHEMA.fields}
            for runs, tomb_ids in zip(runs_s, tomb_s):
                tomb = (np.asarray(list(tomb_ids), dtype=np.int64)
                        if tomb_ids is not None and len(tomb_ids) else None)
                df, d, t, dl, bl, bm, mi = merge_encoded_runs(
                    list(runs), avgdl, tomb)
                out["df"].append(df)
                out["doc_ids"].append(d)
                out["tfs"].append(t)
                out["doclens"].append(dl)
                out["block_last"].append(bl)
                out["block_max"].append(bm)
                out["max_impact"].append(mi)
            return _object_df(out)

        return merge_runs_tomb

    @F.pandas_udf(MERGED_SCHEMA)
    def merge_runs(runs_s: pd.Series) -> pd.DataFrame:
        tomb = tomb_bc.value if tomb_bc is not None else None
        out = {k.name: [] for k in MERGED_SCHEMA.fields}
        for runs in runs_s:
            df, d, t, dl, bl, bm, mi = merge_encoded_runs(list(runs), avgdl,
                                                          tomb)
            out["df"].append(df)
            out["doc_ids"].append(d)
            out["tfs"].append(t)
            out["doclens"].append(dl)
            out["block_last"].append(bl)
            out["block_max"].append(bm)
            out["max_impact"].append(mi)
        return _object_df(out)

    return merge_runs


RUN_FIELDS = ["first_id", "last_id", "df", "doc_ids", "tfs", "doclens",
              "block_last", "block_max", "max_impact"]


def build_posting_runs(doc_terms: DataFrame, doc_stats: DataFrame,
                       avgdl: float, salt: int | None = None,
                       n_docs: int | None = None) -> DataFrame:
    """Phase 1 of the SPIMI build: salted sorted-run construction.
    Groups on (term, range_bucket(doc_id)) — a stop word's posting is
    accumulated AND compressed by S tasks instead of one (explicit skew
    handling; AQE skew-split does not cover aggregations). Buckets are
    doc-id RANGES, not hashes, so (a) each run is a contiguous sorted
    slice that merges by byte concat, and (b) the bucket is CONSISTENT
    ACROSS TERMS — every posting of doc d, whatever the term, lands in
    bucket d // width. Property (b) is what makes bucket-sharded query
    scoring (bm25.bm25_wand_sharded) correct: a doc's full score is
    computable inside its own bucket.

    Returns (term, bucket, first_id, last_id, df, doc_ids, tfs, doclens,
    block_last, block_max, max_impact) — df is RUN-LOCAL here."""
    if salt is None:
        salt = salt_for(n_docs or 1_000_000)

    if "doclen" in doc_terms.columns:
        with_dl = doc_terms  # doclen carried from tokenize: no join needed
    else:
        with_dl = doc_terms.join(doc_stats, "doc_id")  # co-keyed shuffle
    if n_docs:
        width = max(1, (int(n_docs) + salt - 1) // salt)
    else:
        width = max(
            1, (int(doc_stats.agg(F.max("doc_id")).collect()[0][0]) + salt)
            // salt,
        )
    # doc_id // width: contiguous ranges — runs concat in sorted order.
    # ids beyond n_docs (e.g. synthetic offsets) just make extra buckets.
    # Integer floor-div (pmod is non-negative, so the subtraction is an
    # exact multiple of width): double division would round above 2^53
    # and truncate-toward-zero for negative ids, landing docs in the
    # wrong bucket and breaking the contiguous-run merge invariant.
    salted = with_dl.withColumn("bucket", _range_bucket("doc_id", width))

    run_schema = (
        "term string, bucket long, first_id long, last_id long, df long, "
        "doc_ids binary, tfs binary, doclens binary, "
        "block_last array<long>, block_max array<double>, max_impact double"
    )

    def encode_stream(batches):
        # Streaming group encode over the SORTED (term, bucket, doc_id)
        # stream: group boundaries are adjacent-key changes; a group that
        # spans Arrow batches is carried until its key changes (memory
        # bounded by one group, i.e. the salt's ~4M-posting cap — the
        # same bound the old collect_list cells had, without ever
        # materializing a multi-MB array cell in the JVM heap; those
        # cells were the humongous-allocation GC hazard BENCH.md r05
        # documents). Arrays cross the boundary as flat columns.
        import pyarrow as pa
        import pyarrow.compute as pc

        carry = None  # (term, bucket, [d...], [t...], [dl...]) pending

        def encode_slice(terms, bkt, d, t, dl, starts):
            raw = _encode_runs_flush_raw(d, t, dl, starts, avgdl)
            return _runs_record_batch(terms, raw, bucket=bkt)

        for rb in batches:
            if not rb.num_rows:
                continue
            terms = rb.column(0)
            bkt = rb.column(1).to_numpy(zero_copy_only=False).astype(
                np.int64)
            d = rb.column(2).to_numpy(zero_copy_only=False).astype(
                np.int64)
            t = rb.column(3).to_numpy(zero_copy_only=False).astype(
                np.int64)
            dl = rb.column(4).to_numpy(zero_copy_only=False).astype(
                np.int64)
            n = rb.num_rows
            if n > 1:
                tchg = pc.not_equal(
                    terms.slice(1), terms.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
                chg = tchg | (bkt[1:] != bkt[:-1])
                bounds = np.flatnonzero(chg) + 1
            else:
                bounds = np.zeros(0, dtype=np.int64)
            first_key = (terms[0].as_py(), int(bkt[0]))
            if carry is not None and carry[0] != first_key:
                cd, ct, cdl = (np.concatenate(x) for x in
                               (carry[1], carry[2], carry[3]))
                yield encode_slice(
                    pa.array([carry[0][0]], type=pa.string()),
                    np.array([carry[0][1]], dtype=np.int64),
                    cd, ct, cdl, np.array([0, len(cd)], dtype=np.int64))
                carry = None
            last_start = int(bounds[-1]) if len(bounds) else 0
            last_key = (terms[n - 1].as_py(), int(bkt[n - 1]))
            if len(bounds):
                # complete groups: [0..last_start) (plus any carry prefix)
                starts = np.concatenate(([0], bounds[:-1], [last_start])) \
                    if len(bounds) > 1 else np.array([0, last_start],
                                                     dtype=np.int64)
                gterms = terms.take(pa.array(starts[:-1]))
                gbkt = bkt[starts[:-1]]
                hd, ht, hdl = d[:last_start], t[:last_start], \
                    dl[:last_start]
                if carry is not None:
                    cd = np.concatenate(carry[1] + [hd])
                    ct = np.concatenate(carry[2] + [ht])
                    cdl = np.concatenate(carry[3] + [hdl])
                    pad = len(cd) - len(hd)
                    starts = np.concatenate(([0], starts[1:] + pad))
                    hd, ht, hdl = cd, ct, cdl
                    carry = None
                yield encode_slice(gterms, gbkt, hd, ht, hdl, starts)
            if carry is None:
                carry = (last_key, [d[last_start:]], [t[last_start:]],
                         [dl[last_start:]])
            else:
                carry[1].append(d[last_start:])
                carry[2].append(t[last_start:])
                carry[3].append(dl[last_start:])
        if carry is not None:
            cd, ct, cdl = (np.concatenate(x) for x in
                           (carry[1], carry[2], carry[3]))
            yield encode_slice(
                pa.array([carry[0][0]], type=pa.string()),
                np.array([carry[0][1]], dtype=np.int64),
                cd, ct, cdl, np.array([0, len(cd)], dtype=np.int64))

    stream = (
        salted.select("term", "bucket", "doc_id", "tf", "doclen")
        .repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "doc_id")
    )
    return stream.mapInArrow(encode_stream, run_schema)


def build_postings(doc_terms: DataFrame, doc_stats: DataFrame, avgdl: float,
                   salt: int | None = None, n_docs: int | None = None,
                   fuse: bool = True) -> DataFrame:
    """True SPIMI: salted sorted-run construction (build_posting_runs) ->
    COMPRESSED-run merge.

    PLAN FUSION (guide §2.4 — remove shuffles outright): when doc_terms
    is the DIRECT result of build_doc_terms_with_dl / build_doc_terms_
    narrow (provenance marker `_cer_fuse_src`), the doc_terms relation is
    an intermediate nothing else consumes — so the whole build collapses
    into the single-pass SPIMI plan over the source text: tokenize ->
    count -> encode in ONE Python pass per input split, with the only
    shuffle moving compressed run bytes. Catalyst cannot see through the
    Python boundary to do this fusion itself. Result-identical to the
    unfused pipeline (byte-equality asserted in tests/test_index_bm25.py
    ::test_build_postings_fusion_parity); pass fuse=False (as build_index
    does for its explicit plan= argument) to keep the declarative
    two-exchange pipeline.

    Phase 2 merges each term's <=S runs by BYTE CONCATENATION with a
    one-varint boundary patch (merge_encoded_runs) — the merge exchange
    moves compressed bytes (10-20x smaller than the raw struct arrays it
    previously moved) and never materializes a decoded posting. This is
    what makes the hot-term path scale: before, a 10^6-entry stop-word
    posting was array_sort'ed + encoded inside ONE task; now the heavy
    work happened in phase 1 across S tasks.

    Python is crossed twice per posting (encode run, merge runs), both
    Arrow-batched, both numpy/bytes-level."""
    src = getattr(doc_terms, "_cer_fuse_src", None) if fuse else None
    if src is not None:
        src_docs, text_col, mode = src
        return build_postings_spimi(src_docs, avgdl, mode=mode,
                                    text_col=text_col)
    runs = build_posting_runs(doc_terms, doc_stats, avgdl, salt=salt,
                              n_docs=n_docs)
    merged = runs.groupBy("term").agg(
        F.collect_list(F.struct(*RUN_FIELDS)).alias("runs")
        # compressed bytes move here
    )
    return merged.select(
        "term", _make_merge_runs_udf(avgdl)("runs").alias("p")
    ).select("term", "p.df", "p.doc_ids", "p.tfs", "p.doclens",
             "p.block_last", "p.block_max", "p.max_impact")


def build_spimi_runs(docs: DataFrame, avgdl: float,
                     mode: str = "simple", text_col: str = "text",
                     max_postings_in_memory: int = 20_000_000) -> DataFrame:
    """The SPIMI map pass alone (the runs relation BEFORE the per-term
    merge) — exposed so the merge exchange can be measured/consumed
    separately. See build_postings_spimi."""
    return _spimi_runs(docs, avgdl, mode, text_col, max_postings_in_memory)


def build_postings_spimi(docs: DataFrame, avgdl: float,
                         mode: str = "simple",
                         text_col: str = "text",
                         max_postings_in_memory: int = 20_000_000) -> DataFrame:
    """Classic SPIMI (Heinz/Zobel-style single-pass in-memory indexing,
    the design SURVEY.md §4.2 names): ONE mapInPandas pass per input
    partition does tokenize -> per-doc count -> per-term posting-run
    ENCODE, emitting already-compressed runs (term, first_id, last_id,
    df, bytes, block maxes). The only shuffle in the whole build then
    moves compressed bytes, grouped by term and merged by byte
    concatenation (merge_encoded_runs).

    Scale shape at 10^12 docs: the map pass is embarrassingly parallel
    (state = one partition's in-memory index, the SPIMI memory budget —
    size input splits accordingly); the exchange carries ~1/10th-1/20th
    of the token relation's bytes; the hottest term costs one small
    byte-concat per partition-run. No raw (doc_id, term, tf) row ever
    crosses the network.

    Requires avgdl up front (block maxes bake in the BM25 length norm) —
    pass 1 computes doc_stats/avgdl narrowly; this is pass 2.

    max_postings_in_memory is the classic SPIMI memory budget: when a
    partition's accumulated (term -> postings) state reaches it, the run
    set is FLUSHED (encoded and emitted) and accumulation restarts — a
    term then simply contributes several runs from that partition, all
    disjoint contiguous doc slices (flushes are doc-aligned), so the
    byte-concat merge is unchanged. This bounds executor memory by the
    budget, not the split size.

    The whole pass is vectorized (guide §4.2): tokenize + per-doc term
    counting run through Arrow/numpy kernels (_batch_doc_term_counts),
    accumulation holds flat numpy arrays keyed by a partition-local term
    id, and the flush groups them with one lexsort — no per-token or
    per-posting Python object ever exists."""
    runs = _spimi_runs(docs, avgdl, mode, text_col, max_postings_in_memory)
    merged = runs.groupBy("term").agg(
        F.collect_list(
            F.struct("first_id", "last_id", "df", "doc_ids", "tfs",
                     "doclens", "block_last", "block_max", "max_impact")
        ).alias("runs")
    )
    return merged.select(
        "term", _make_merge_runs_udf(avgdl)("runs").alias("p")
    ).select("term", "p.df", "p.doc_ids", "p.tfs", "p.doclens",
             "p.block_last", "p.block_max", "p.max_impact")


def _spimi_runs(docs: DataFrame, avgdl: float, mode: str, text_col: str,
                max_postings_in_memory: int) -> DataFrame:
    if mode not in ("simple", "chem", "chem+greek"):
        raise ValueError(f"unknown tokenize mode {mode!r}")

    run_schema_str = (
        "term string, first_id long, last_id long, df long, "
        "doc_ids binary, tfs binary, doclens binary, "
        "block_last array<long>, block_max array<double>, max_impact double"
    )

    def spimi_partition(batches):
        import pyarrow as pa

        vocab: dict = {}          # term -> partition-local gid
        gid_terms: list = []      # gid -> term
        parts: list = []          # accumulated (gid, doc_id, tf, dl) arrays
        n_acc = 0                 # postings accumulated since last flush

        def flush():
            nonlocal parts, n_acc
            if not n_acc:
                parts = []
                return None
            g = np.concatenate([p[0] for p in parts])
            d = np.concatenate([p[1] for p in parts])
            t = np.concatenate([p[2] for p in parts])
            dl = np.concatenate([p[3] for p in parts])
            order = np.lexsort((d, g))
            g, d, t, dl = g[order], d[order], t[order], dl[order]
            bounds = np.flatnonzero(g[1:] != g[:-1]) + 1
            starts = np.concatenate(([0], bounds, [len(g)]))
            raw = _encode_runs_flush_raw(d, t, dl, starts, avgdl)
            terms = pa.array(
                np.asarray(gid_terms, dtype=object)[g[starts[:-1]]],
                type=pa.string())
            parts, n_acc = [], 0
            return _runs_record_batch(terms, raw)

        for rb in batches:
            doc_ids = rb.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64)
            doc_pos, codes, b_vocab, tfs, doclens = _batch_doc_term_counts(
                rb.column(1), mode)
            if not len(doc_pos):
                continue
            # partition-local gid per pair: dict lookups only on the
            # batch's ~|vocab| DICTIONARY entries, never per pair
            gmap = np.empty(len(b_vocab), dtype=np.int64)
            for j, term in enumerate(b_vocab):
                gid = vocab.get(term)
                if gid is None:
                    gid = len(gid_terms)
                    vocab[term] = gid
                    gid_terms.append(term)
                gmap[j] = gid
            gids = gmap[codes]
            d_arr = doc_ids[doc_pos]
            dl_arr = doclens[doc_pos]
            # doc-aligned budget flushes, same boundaries as the scalar
            # path: flush right after the doc whose postings reach the
            # budget. doc_pos is ascending, so doc ranges are contiguous.
            per_doc = np.bincount(doc_pos, minlength=len(doclens))
            cum = n_acc + np.cumsum(per_doc)
            lo = 0  # pair-array start of the unflushed remainder
            while cum[-1] >= max_postings_in_memory:
                # first doc at which the running total reaches the budget;
                # flush everything up to and INCLUDING it (scalar semantics)
                j = int(np.searchsorted(cum, max_postings_in_memory))
                hi = int(np.searchsorted(doc_pos, j, side="right"))
                parts.append((gids[lo:hi], d_arr[lo:hi],
                              tfs[lo:hi], dl_arr[lo:hi]))
                n_acc = int(cum[j])
                out = flush()  # resets parts and n_acc
                if out is not None:
                    yield out
                cum = cum - cum[j]
                lo = hi
            if lo < len(gids):
                parts.append((gids[lo:], d_arr[lo:], tfs[lo:], dl_arr[lo:]))
            n_acc = int(cum[-1])
        out = flush()
        if out is not None:
            yield out

    return docs.select("doc_id", text_col).mapInArrow(
        spimi_partition, run_schema_str
    )


def postings_to_runs(postings: DataFrame) -> DataFrame:
    """Merged postings -> run rows (recover first_id/last_id so they can
    re-enter a byte-concat merge). first_id is the stream's leading
    absolute varint; last_id needs the doc_ids stream decoded (numpy, the
    tfs/doclens/positions streams stay untouched). Used by compact_index
    to treat the existing index as 'just more runs'."""

    @F.pandas_udf("first_id long, last_id long")
    def ends(doc_ids_s: pd.Series) -> pd.DataFrame:
        firsts, lasts = [], []
        for b in doc_ids_s:
            ids = delta_decode(bytes(b))
            firsts.append(int(ids[0]))
            lasts.append(int(ids[-1]))
        return pd.DataFrame({"first_id": firsts, "last_id": lasts})

    return postings.withColumn("e", ends("doc_ids")).select(
        "term", F.col("e.first_id").alias("first_id"),
        F.col("e.last_id").alias("last_id"), "df", "doc_ids", "tfs",
        "doclens", "block_last", "block_max", "max_impact",
    )


def postings_to_doc_terms(postings: DataFrame) -> DataFrame:
    """Decode merged postings back to the (doc_id, term, tf, doclen)
    relation — the exact inverse of the build (round-trip tested), used
    by compact_index's stats-refresh rebuild when the delta outgrows the
    frozen-avgdl approximation. One narrow Arrow-batched pass, no
    shuffle; at 10^12 docs this is a full-index scan, which is the point:
    a stats refresh IS a rebuild and is priced as one."""

    def decode(batches):
        empty = {
            "doc_id": pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype="int32"),
            "doclen": pd.Series([], dtype="int64"),
        }
        for pdf in batches:
            ids_l, tfs_l, dls_l, terms_l = [], [], [], []
            for term, d, t, dl in zip(pdf["term"], pdf["doc_ids"],
                                      pdf["tfs"], pdf["doclens"]):
                ids = delta_decode(bytes(d))
                ids_l.append(ids)
                tfs_l.append(varint_decode(bytes(t)).astype(np.int64))
                dls_l.append(varint_decode(bytes(dl)).astype(np.int64))
                terms_l.append(np.repeat(term, len(ids)))
            if not ids_l:
                yield pd.DataFrame(empty)
                continue
            yield pd.DataFrame({
                "doc_id": np.concatenate(ids_l),
                "term": np.concatenate(terms_l),
                "tf": np.concatenate(tfs_l).astype(np.int32),
                "doclen": np.concatenate(dls_l),
            })

    return postings.select("term", "doc_ids", "tfs", "doclens").mapInPandas(
        decode, "doc_id long, term string, tf int, doclen long"
    )


def compact_index(spark, index_path: str, delta_dir: str, out_path: str,
                  num_shards: int = 32, on_conflict: str = "error",
                  rebuild_threshold: float | None = 0.5) -> tuple[int, float]:
    """Merge streamed doc_terms deltas (stream_doc_terms's sink rows:
    doc_id, term, tf, doclen, batch_id) into the sharded index WITHOUT a
    full rebuild: delta rows are encoded into runs and merged with the
    existing per-term postings by the same compressed-byte concat
    (merge_encoded_runs) — deltas really are just more runs. Overlapping
    doc-id ranges (out-of-order ingest) take the decode/re-encode fallback
    automatically.

    Update semantics are APPEND-ONLY and ENFORCED: a delta doc_id already
    present in the index would otherwise yield duplicate posting entries
    (df inflated, the doc scored twice by TAAT/WAND) and an over-counted
    n_new. on_conflict='error' (default) fails loudly listing the overlap
    count; on_conflict='skip' anti-joins the overlapping docs out of the
    delta (re-ingested docs are ignored — true updates require a delete +
    rebuild, which this engine prices as the rebuild it is).

    Stats contract (Lucene-segment style): BM25 impacts and block maxes
    are baked with the index's ORIGINAL avgdl; compaction freezes it so
    the existing bytes stay valid, and queries against the compacted index
    must pass the returned (n, avgdl). The drift of that approximation is
    bounded BY POLICY, not operator discipline: when the delta doc count
    exceeds rebuild_threshold * n_old, compaction upgrades itself to a
    stats-refresh full rebuild (decode existing postings back to
    doc_terms, union the delta, re-encode everything with the NEW avgdl).
    Pass rebuild_threshold=None to always freeze. Returns
    (new_n_docs, avgdl_in_effect)."""
    postings = spark.read.parquet(f"{index_path}/postings").drop("shard")
    ds = spark.read.parquet(f"{index_path}/doc_stats")
    n_old, avgdl = corpus_stats(ds)

    delta = spark.read.parquet(delta_dir)
    # dedupe FIRST (a replayed batch writes identical rows), then doclen =
    # sum(tf) over the deduped relation so replays can't inflate lengths
    if "doclen" in delta.columns:
        delta_dt = delta.select(
            "doc_id", "term", "tf", "doclen"
        ).dropDuplicates(["doc_id", "term"])
    else:
        base = delta.select("doc_id", "term", "tf").dropDuplicates(
            ["doc_id", "term"]
        )
        dl = base.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("doclen")
        )
        delta_dt = base.join(dl, "doc_id")
    old_ids = ds.select("doc_id")
    n_overlap = delta_dt.select("doc_id").distinct().join(
        old_ids, "doc_id", "left_semi"
    ).count()
    if n_overlap:
        if on_conflict == "error":
            raise ValueError(
                f"compact_index: {n_overlap} delta doc_ids already exist in "
                f"the index at {index_path}; append-only compaction would "
                "double-count them. Pass on_conflict='skip' to drop the "
                "re-ingested docs, or rebuild for true updates."
            )
        if on_conflict != "skip":
            raise ValueError(f"unknown on_conflict {on_conflict!r}")
        delta_dt = delta_dt.join(old_ids, "doc_id", "left_anti")
    delta_ds = delta_dt.groupBy("doc_id").agg(F.max("doclen").alias("doclen"))
    n_delta = delta_ds.count()
    n_new = n_old + n_delta

    if rebuild_threshold is not None and n_delta > rebuild_threshold * n_old:
        # past-threshold: the frozen-avgdl approximation is no longer
        # acceptable — refresh stats with a genuine full re-encode
        old_dt = postings_to_doc_terms(postings)
        all_dt = old_dt.unionByName(
            delta_dt.select("doc_id", "term", "tf", "doclen")
        )
        new_ds = ds.select("doc_id", "doclen").unionByName(
            delta_ds.select("doc_id", "doclen")
        )
        n_new, new_avgdl = corpus_stats(new_ds)
        rebuilt = build_postings(all_dt, new_ds, new_avgdl, n_docs=n_new)
        write_index(rebuilt, new_ds, out_path, num_shards=num_shards)
        return n_new, new_avgdl

    delta_runs = build_posting_runs(delta_dt, None, avgdl, n_docs=n_new)
    old_runs = postings_to_runs(postings)
    all_runs = old_runs.select("term", *RUN_FIELDS).union(
        delta_runs.select("term", *RUN_FIELDS)
    )
    merged = all_runs.groupBy("term").agg(
        F.collect_list(F.struct(*RUN_FIELDS)).alias("runs")
    ).select(
        "term", _make_merge_runs_udf(avgdl)("runs").alias("p")
    ).select("term", "p.df", "p.doc_ids", "p.tfs", "p.doclens",
             "p.block_last", "p.block_max", "p.max_impact")
    new_ds = ds.select("doc_id", "doclen").union(
        delta_ds.select("doc_id", "doclen")
    ).dropDuplicates(["doc_id"])
    write_index(merged, new_ds, out_path, num_shards=num_shards)
    return n_new, avgdl


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
    write_shards_meta(path, num_shards)


def write_runs_index(runs: DataFrame, doc_stats: DataFrame, path: str,
                     num_shards: int = 32,
                     bake_avgdl: float | None = None,
                     commit_mode: str = "rename") -> None:
    """Persist the RUN-level index (build_posting_runs output) partitioned
    by term shard — the storage layout for bm25_wand_sharded_from_index:
    shard dirs prune at planning time, term predicates push into row
    groups, and the bucket column survives as data so scoring groups on
    (query_id, bucket) with bounded task bytes. This is the layout to
    prefer at 10^12 docs: the merged-posting layout (write_index) stores a
    hot term's entire posting in one row, which caps the read parallelism
    of that term at 1 task.

    Also persists `index_meta.json` recording the BAKE avgdl (the value
    the runs' impacts/block maxes were encoded with — pass it when the
    runs were baked with something other than this doc_stats' corpus
    avgdl). Appends grow doc_stats, so recomputing avgdl from live
    doc_stats later and decoding with it can push impacts PAST the baked
    block-max/max-impact bounds and make block-max WAND skip true top-k
    docs; every consumer must decode at the frozen bake value
    (bake_stats reads it back)."""
    from cer_for_mti_spark.functions.hashing import md5_60

    sharded = runs.withColumn(
        "shard", F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int")
    ).repartition(num_shards, "shard")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/runs"
    )
    doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    # sorted term-dictionary sidecar: (term, df) derived from the runs
    # just WRITTEN (a two-column columnar read — never re-running the
    # encode pipeline), range-partitioned + sorted by term so prefix
    # probes (query_expand) are range seeks over tight row-group stats
    # instead of scans of the salt-amplified runs relation
    spark = runs.sparkSession
    _write_term_dict_sorted(
        spark.read.parquet(f"{path}/runs").groupBy("term").agg(
            F.sum("df").cast("long").alias("df")),
        f"{path}/term_dict")
    n, live_avgdl = corpus_stats(doc_stats)
    write_index_meta(path, bake_avgdl=(
        float(bake_avgdl) if bake_avgdl is not None else live_avgdl
    ), n_docs_at_bake=n)
    write_shards_meta(path, num_shards)
    if commit_mode == "manifest":
        # object-store ingest mode: readers list files from committed
        # manifests, appends copy + manifest instead of renaming
        _manifest_write(path, "base-runs", _list_data_files(path, "runs"))
        _manifest_write(path, "base-doc_stats",
                        _list_data_files(path, "doc_stats"))
        _manifest_write(path, "base-term_dict",
                        _list_data_files(path, "term_dict"))
    elif commit_mode != "rename":
        raise ValueError(f"unknown commit_mode {commit_mode!r}")


TERM_DICT_RANGE_PARTITIONS = 32


def _write_term_dict_sorted(term_df: DataFrame, out_path: str) -> None:
    """Range-partition by term and sort within partitions — files carry
    disjoint sorted term ranges, so file- and row-group-level min/max
    stats turn a prefix predicate into a genuine range seek."""
    (term_df.repartitionByRange(TERM_DICT_RANGE_PARTITIONS, "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(out_path))


def has_term_dict(index_path: str) -> bool:
    """True when this index carries the term_dict sidecar (indexes
    written before it existed don't; readers then derive the dictionary
    from the runs relation)."""
    files = _manifest_rel_files(index_path, "term_dict")
    if files is not None:
        return bool(files)
    return os.path.isdir(f"{index_path}/term_dict")


def read_term_dict(spark, index_path: str,
                   prefixes: list[str] | None = None) -> DataFrame:
    """Global (term, df) for a written runs index, optionally pruned to
    terms matching ANY of `prefixes` (the predicate pushes into the
    parquet scan BEFORE the per-batch aggregation). Prefers the sorted
    term_dict sidecar — per-batch (term, df) deltas summed at read, the
    same lazy-df convention as the runs themselves (deletes don't
    decrement df until compaction purges) — and falls back to deriving
    from the runs relation for pre-sidecar indexes. Both sources are
    value-identical by construction (tested)."""
    # repair BEFORE probing for the sidecar: a compaction crash between
    # its two renames leaves no term_dict dir (a complete staged
    # replacement instead) and would otherwise read as "no sidecar"
    repair_interrupted_compaction(index_path, "term_dict")
    if has_term_dict(index_path):
        df = read_index_rel(spark, index_path, "term_dict")
    else:
        df = read_index_rel(spark, index_path, "runs",
                            with_base_path=True).select("term", "df")
    if prefixes is not None:
        if not prefixes:
            return (df.select("term").limit(0)
                    .withColumn("df", F.lit(0).cast("long")))
        pred = F.col("term").startswith(prefixes[0])
        for p in prefixes[1:]:
            pred = pred | F.col("term").startswith(p)
        df = df.filter(pred)
    return df.groupBy("term").agg(F.sum("df").cast("long").alias("df"))


def repair_interrupted_compaction(index_path: str,
                                  rel: str = "runs") -> bool:
    """The compactors swap directories with two renames — rename(final ->
    .<rel>_old) then rename(.compact_staging/<rel> -> final) — so a crash
    between them leaves the index with NO <rel> dir but a COMPLETE staged
    replacement (staging is fully written and row-counted before the
    first rename). Readers and the compactors call this first: it rolls
    the swap FORWARD when final is missing and staging is complete,
    rolls BACK to the preserved old dir if only trash survives, and
    clears leftover trash/staging when final exists (crash after the
    second rename). Returns True when final was restored.

    Driver-local rename/rmtree — like the whole append/compact commit
    protocol this is POSIX/HDFS-only; object-store index paths need the
    manifest-commit variant (SCALE.md)."""
    final = f"{index_path}/{rel}"
    staging_root = f"{index_path}/.compact_staging"
    staging = f"{staging_root}/{rel}"
    trash = f"{index_path}/.{rel}_old"
    if os.path.isdir(final):
        # complete (or never-started) compaction: drop stale leftovers
        shutil.rmtree(trash, ignore_errors=True)
        return False
    if os.path.isdir(staging):
        os.rename(staging, final)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(staging_root, ignore_errors=True)
        return True
    if os.path.isdir(trash):
        os.rename(trash, final)
        shutil.rmtree(staging_root, ignore_errors=True)
        return True
    return False


INDEX_META_FILE = "index_meta.json"


def write_index_meta(path: str, bake_avgdl: float,
                     n_docs_at_bake: int) -> None:
    """Tiny JSON sidecar pinning the stats the index bytes were encoded
    with. Written atomically (tmp + rename) so readers never see a torn
    file; other keys already present (num_shards) are preserved."""
    import json as _json

    meta = read_index_meta(path) or {}
    meta.update({"bake_avgdl": float(bake_avgdl),
                 "n_docs_at_bake": int(n_docs_at_bake)})
    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/.{INDEX_META_FILE}.tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, f"{path}/{INDEX_META_FILE}")


def read_index_meta(path: str) -> dict | None:
    import json as _json

    p = f"{path}/{INDEX_META_FILE}"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


def write_shards_meta(path: str, num_shards: int) -> None:
    """Record the layout's shard count in index_meta.json (merged with
    any existing keys, atomic replace). shard = md5(term) % num_shards
    is baked into the DATA at write time; a reader or appender using a
    different count prunes/writes the WRONG partition dirs and silently
    returns partial results — so writers record it, readers default to
    it, and check_num_shards raises on an explicit mismatch."""
    import json as _json

    meta = read_index_meta(path) or {}
    meta["num_shards"] = int(num_shards)
    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/.{INDEX_META_FILE}.tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, f"{path}/{INDEX_META_FILE}")


def index_num_shards(path: str) -> int | None:
    """The shard count this index was written with, or None for indexes
    predating the metadata (callers keep their explicit/default value)."""
    meta = read_index_meta(path)
    if meta is not None and "num_shards" in meta:
        return int(meta["num_shards"])
    return None


def resolve_num_shards(index_path: str, num_shards: int | None,
                       default: int = 32) -> int:
    """Effective shard count for reading/appending a written index:
    None -> the recorded count (index_meta.json), falling back to
    `default` for pre-metadata indexes; an explicit value is validated
    against the recorded one and a mismatch RAISES — shard placement
    (md5(term) % S) is baked into the data, so a wrong S prunes/writes
    the wrong partition dirs and silently returns partial results."""
    rec = index_num_shards(index_path)
    if num_shards is None:
        return rec if rec is not None else int(default)
    if rec is not None and int(num_shards) != rec:
        raise ValueError(
            f"index at {index_path} was written with num_shards={rec} "
            f"but the call passed num_shards={num_shards}; shard "
            "placement is baked into the data — pass the recorded value "
            "(or None to use it) or rebuild."
        )
    return int(num_shards)


def bake_stats(spark, index_path: str,
               max_drift: float | None = None) -> tuple[int, float]:
    """(live N, frozen bake avgdl) for querying/appending a written runs
    index. N is the LIVE doc count (idf is recomputed at query time, so
    a fresher N is strictly better and never violates the baked bounds —
    idf scales a term's scores and its block maxes identically). avgdl
    is the FROZEN bake value from index_meta.json: decoding at any other
    value can exceed the baked block-max/max-impact upper bounds and
    block-max WAND then skips true top-k docs. Legacy indexes without
    the sidecar fall back to live corpus avgdl (correct only before the
    first append at a drifted corpus shape).

    max_drift: when set, raise if |live - bake| / bake exceeds it — the
    frozen-avgdl approximation has degraded past policy and the index
    needs a stats-refresh rebuild (compact_index's rebuild_threshold is
    the merged-layout twin of this check)."""
    repair_interrupted_compaction(index_path, "doc_stats")
    ds = read_index_rel(spark, index_path, "doc_stats")
    n, live_avgdl = corpus_stats(ds)
    meta = read_index_meta(index_path)
    if meta is None:
        return n, live_avgdl
    bake = float(meta["bake_avgdl"])
    if max_drift is not None and bake > 0 and (
        abs(live_avgdl - bake) / bake > max_drift
    ):
        raise ValueError(
            f"bake_stats: live avgdl {live_avgdl:.3f} has drifted "
            f"{abs(live_avgdl - bake) / bake:.1%} from the bake value "
            f"{bake:.3f} at {index_path} (> {max_drift:.0%}); the frozen-"
            "stats approximation has degraded — rebuild the index "
            "(stats refresh) instead of appending further."
        )
    return n, bake


# --- atomic, resumable appends ---------------------------------------------
#
# The non-atomic shape (runs appended, then doc_stats, as two unrelated
# parquet writes) left a crash window where the index's stats disagree
# with its runs. Appends now reuse the lineage protocol of
# plans/lineage.py at file granularity:
#
#   <path>/.staging/append_<batch>/<unit dirs>   staged ONCE (then fixed)
#   <path>/.staging/append_<batch>/_STAGED       marker: staging complete
#   <path>/append_lineage/                       one row per committed unit
#
# Commit = move the staged files of one unit (a shard dir, or the stats
# sidecar — always LAST, so stats never reference runs that are not all
# in) into the final dir, then append the unit's lineage row. Every step
# is idempotent: a crash mid-unit leaves some files moved — the resumed
# commit moves the remainder (each staged file moves exactly once, under
# a batch-prefixed name) and then writes the row. Resume therefore
# reconstructs a BIT-IDENTICAL index: the staged bytes were fixed before
# the first commit (tests/test_index_bm25.py kill-between-units tests).

# --- manifest commit mode (object-store-safe ingest) ------------------------
#
# The rename commit above is atomic on POSIX/HDFS but NOT on object
# stores (an S3 "rename" is copy+delete, and a reader listing the
# directory mid-copy sees a torn object). Manifest mode removes the
# rename from the commit path entirely: data files are COPIED under
# their batch-prefixed names (modelling each object PUT as atomic, which
# S3 guarantees per object), and VISIBILITY comes from a tiny manifest
# written last — readers list files from the committed manifests, never
# from the directory, so a torn or uncommitted object is simply never
# read. The manifest write itself is one small-object atomic replace
# (os.replace locally; a conditional PUT on a real store).
#
# Mode is a property of the INDEX (write_runs_index(commit_mode=
# "manifest") creates the base manifest); appends and readers
# auto-detect. Implemented for the BM25 runs layout (runs + doc_stats +
# tombstones); compaction remains rename-based and regenerates the base
# manifest (offline maintenance — see SCALE.md).

MANIFEST_DIR = "_manifests"


def _index_commit_mode(index_path: str) -> str:
    return ("manifest"
            if os.path.isdir(f"{index_path}/{MANIFEST_DIR}") else "rename")


def _manifest_write(index_path: str, name: str, files: list[str]) -> None:
    """One manifest object listing data files (paths relative to the
    index root). Atomic small-object replace."""
    import json as _json

    d = f"{index_path}/{MANIFEST_DIR}"
    os.makedirs(d, exist_ok=True)
    tmp = f"{d}/.{name}.tmp"
    with open(tmp, "w") as f:
        _json.dump({"files": sorted(files)}, f)
    os.replace(tmp, f"{d}/{name}.json")


def _manifest_rel_files(index_path: str, rel: str) -> list[str] | None:
    """All committed data files under <rel>, from the manifests — or
    None when the index is rename-mode (no manifest dir)."""
    import json as _json

    d = f"{index_path}/{MANIFEST_DIR}"
    if not os.path.isdir(d):
        return None
    out: list[str] = []
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".json"):
            continue
        with open(f"{d}/{fn}") as f:
            for rp in _json.load(f)["files"]:
                if rp.startswith(rel + "/"):
                    out.append(f"{index_path}/{rp}")
    return out


def vacuum_index(index_path: str) -> dict:
    """Manifest-mode hygiene: delete data files in the index's relation
    dirs that NO committed manifest references — the torn/uncommitted
    PUTs a crashed copy-mode append or delete leaves behind. Readers
    never see those files (manifests are the only listing), so vacuum
    is pure storage reclamation and can run any time no batch is
    in-flight (an in-flight batch raises: its resume will re-copy, but
    refusing keeps the contract trivially safe). Only directories some
    manifest actually names are touched; marker files (_*/.*) and the
    protocol dirs (.staging, append_lineage, _manifests) are never.
    Rename-mode indexes have nothing to vacuum (renames are atomic;
    crashed swaps are repaired, not orphaned) and return immediately.

    Returns {"mode", "removed", "bytes"}. On a real object store this
    maps to a LIST + compare + DELETE batch per relation prefix."""
    if _index_commit_mode(index_path) != "manifest":
        return {"mode": "rename", "removed": 0, "bytes": 0}
    inflight = _find_inflight_batch(index_path)
    if inflight is not None:
        raise ValueError(
            f"vacuum_index: batch {inflight!r} at {index_path} is staged "
            "but not fully committed; resume it first."
        )
    import json as _json

    referenced: set[str] = set()
    rels: set[str] = set()
    mdir = f"{index_path}/{MANIFEST_DIR}"
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json"):
            continue
        with open(f"{mdir}/{fn}") as f:
            for rp in _json.load(f)["files"]:
                referenced.add(rp)
                rels.add(rp.split("/", 1)[0])
    removed, freed = 0, 0
    for rel in sorted(rels):
        base = f"{index_path}/{rel}"
        if not os.path.isdir(base):
            continue
        for dirpath, _dn, filenames in os.walk(base):
            for fn in filenames:
                if fn.startswith(("_", ".")):
                    continue
                full = f"{dirpath}/{fn}"
                if os.path.relpath(full, index_path) not in referenced:
                    freed += os.path.getsize(full)
                    os.remove(full)
                    removed += 1
    return {"mode": "manifest", "removed": removed, "bytes": freed}


def _list_data_files(root: str, rel: str) -> list[str]:
    """Relative paths of the data files under <root>/<rel> (recursive,
    skipping markers) — the base-manifest generator."""
    out = []
    base = f"{root}/{rel}"
    for dirpath, _dirnames, filenames in os.walk(base):
        for fn in filenames:
            if fn.startswith(("_", ".")):
                continue
            full = f"{dirpath}/{fn}"
            out.append(os.path.relpath(full, root))
    return sorted(out)


def read_index_rel(spark, index_path: str, rel: str,
                   with_base_path: bool = False) -> DataFrame:
    """Manifest-aware read of one index relation: rename-mode indexes
    read the directory; manifest-mode indexes read EXACTLY the committed
    files (uncommitted/torn objects are invisible by construction)."""
    files = _manifest_rel_files(index_path, rel)
    reader = spark.read
    if with_base_path:
        reader = reader.option("basePath", f"{index_path}/{rel}")
    if files is None:
        return reader.parquet(f"{index_path}/{rel}")
    if not files:
        raise FileNotFoundError(
            f"read_index_rel: no committed files for {rel!r} in the "
            f"manifests at {index_path}")
    return reader.parquet(*files)


APPEND_LINEAGE_SCHEMA = "batch_id string, unit string, n_files long"


def _append_lineage_committed(spark, index_path: str) -> set[tuple[str, str]]:
    d = f"{index_path}/append_lineage"
    if not os.path.isdir(d) or not os.listdir(d):
        return set()
    rows = spark.read.parquet(d).select("batch_id", "unit").collect()
    return {(r.batch_id, r.unit) for r in rows}


def _find_inflight_batch(index_path: str) -> str | None:
    root = f"{index_path}/.staging"
    if not os.path.isdir(root):
        return None
    for d in sorted(os.listdir(root)):
        if d.startswith("append_") and os.path.exists(
            f"{root}/{d}/_STAGED"
        ):
            return d[len("append_"):]
    return None


def _new_batch_id(spark, index_path: str) -> str:
    used = {b for b, _ in _append_lineage_committed(spark, index_path)}
    i = len(used)
    while f"b{i:04d}" in used:
        i += 1
    return f"b{i:04d}"


def _batch_already_committed(spark, index_path: str,
                             batch_id: str | None, stage: str | None) -> bool:
    """True iff an explicitly-named batch has fully committed (staging
    dir removed — the commit loop's last act — and lineage rows exist).
    This is what makes a replayed foreachBatch micro-batch a NO-OP: the
    streaming engine re-delivers the same batch id after a restart, and
    the append must be exactly-once. A partially-committed batch still
    has its staging dir, so it takes the resume path instead."""
    if batch_id is None or (stage and os.path.exists(f"{stage}/_STAGED")):
        return False
    return any(b == batch_id
               for b, _ in _append_lineage_committed(spark, index_path))


def _staged_kind(stage: str) -> str:
    """What family of batch a staging dir holds, by its staged content.
    Distinguishes resume targets: an append must never adopt a crashed
    DELETE batch (its unit list would drop the staged tombstones on the
    floor) and vice versa."""
    for kind, marker in (("delete", "tombstones"),
                         ("positional", "positional_runs"),
                         ("ann", "codes"),
                         ("runs", "runs")):
        if os.path.isdir(f"{stage}/{marker}"):
            return kind
    return "unknown"


def _check_staged_kind(stage: str | None, expected: str, caller: str) -> None:
    if stage is None or not os.path.exists(f"{stage}/_STAGED"):
        return
    kind = _staged_kind(stage)
    if kind != expected:
        resumer = {"delete": "delete_docs",
                   "runs": "append_runs_index",
                   "positional": "append_positional_runs_index",
                   "ann": "similarity.append_ann_index"}.get(kind, kind)
        raise ValueError(
            f"{caller}: the in-flight staged batch at {stage} is a "
            f"{kind!r} batch, not a {expected!r} one — resume it with "
            f"{resumer} first."
        )


def _commit_append_units(spark, index_path: str, batch_id: str,
                         units: list[tuple[str, str, str]],
                         fail_after: int | None) -> bool:
    """units: (unit_name, staged_dir, final_dir), stats sidecar last.
    Returns True when every unit committed (False = fail_after abort)."""
    done = _append_lineage_committed(spark, index_path)
    mode = _index_commit_mode(index_path)
    committed_now = 0
    for unit, src, dst in units:
        if (batch_id, unit) in done:
            continue
        os.makedirs(dst, exist_ok=True)
        n_moved = 0
        unit_files: list[str] = []
        if os.path.isdir(src):
            for fn in sorted(os.listdir(src)):
                if fn.startswith("_") or fn.startswith("."):
                    continue
                if mode == "manifest":
                    # COPY (a per-object atomic PUT on a real store; a
                    # torn local copy is invisible until the manifest
                    # lands and a resume re-copies over it)
                    shutil.copyfile(f"{src}/{fn}", f"{dst}/{batch_id}-{fn}")
                else:
                    os.rename(f"{src}/{fn}", f"{dst}/{batch_id}-{fn}")
                unit_files.append(os.path.relpath(
                    f"{dst}/{batch_id}-{fn}", index_path))
                n_moved += 1
        if mode == "manifest":
            # visibility commit: the manifest object lands AFTER every
            # data object of the unit, named so resumes overwrite it
            _manifest_write(index_path,
                            f"{batch_id}-{unit.replace('/', '~')}",
                            unit_files)
        row = spark.createDataFrame(
            [(batch_id, unit, n_moved)], APPEND_LINEAGE_SCHEMA
        ).withColumn("committed_at", F.current_timestamp())
        row.coalesce(1).write.mode("append").parquet(
            f"{index_path}/append_lineage"
        )
        committed_now += 1
        if fail_after is not None and committed_now >= fail_after:
            return False
    shutil.rmtree(f"{index_path}/.staging/append_{batch_id}",
                  ignore_errors=True)
    return True


def _staged_shard_units(stage: str, rel: str, index_path: str,
                        prefix: str = "shard=") -> list[tuple[str, str, str]]:
    units = []
    runs_stage = f"{stage}/{rel}"
    if os.path.isdir(runs_stage):
        for d in sorted(os.listdir(runs_stage)):
            if d.startswith(prefix):
                units.append((f"{rel}/{d}", f"{runs_stage}/{d}",
                              f"{index_path}/{rel}/{d}"))
    return units


def append_runs_index(spark, index_path: str, new_docs: DataFrame,
                      avgdl: float, mode: str = "simple",
                      salt: int | None = None, n_docs: int | None = None,
                      num_shards: int | None = None,
                      on_conflict: str = "error",
                      batch_id: str | None = None,
                      fail_after: int | None = None) -> int:
    """Incremental ingest for the RUN-level index layout: new documents
    become new runs APPENDED into the existing shard directories — no
    merge at all, because the sharded scorers already treat several runs
    per (term, bucket) as independent cursors (bm25_wand_sharded) or
    merge them at decode time (phrase); a doc's runs all carry its own
    bucket id, so per-bucket completeness — the correctness invariant —
    holds even when the append uses a different bucket width than the
    base build (bucket-id collisions across widths only co-group MORE
    docs per task, never split one).

    Stats contract mirrors compact_index: impacts bake the PASSED avgdl
    (normally the index's original — frozen Lucene-segment-style);
    append-only is ENFORCED (existing doc_ids raise, or are anti-joined
    out with on_conflict='skip'). Periodic stats refresh = full rebuild,
    exactly as for the merged layout.

    ATOMICITY: the whole append (runs + doc_stats) is one staged,
    lineage-committed, RESUMABLE unit — see the protocol note above.
    A crash at any point is repaired by calling append_runs_index again
    (the in-flight batch is detected automatically; new_docs is ignored
    on resume since the staged bytes are already fixed). `fail_after`
    aborts after that many unit commits (crash-test hook). Returns the
    number of docs appended."""
    # a compaction crashed mid-swap leaves no runs/ dir — roll forward
    # BEFORE committing units, or the append would resurrect a bare one
    num_shards = resolve_num_shards(index_path, num_shards)
    repair_interrupted_compaction(index_path, "runs")
    repair_interrupted_compaction(index_path, "doc_stats")
    repair_interrupted_compaction(index_path, "term_dict")
    repair_interrupted_compaction(index_path, "fuzzy_dict")
    repair_interrupted_compaction(index_path, "rev_dict")
    inflight = _find_inflight_batch(index_path)
    if batch_id is None:
        if inflight is not None:
            # A crashed batch is in flight and the caller did not name
            # it. Finish it FIRST (its staged bytes are fixed; this
            # call's new_docs plays no part in it), then decide: if
            # new_docs is fully contained in the now-committed ids the
            # caller just re-sent the crashed delta (the documented
            # call-again-to-repair), so report the resumed count; any
            # genuinely novel docs are staged as their own batch below.
            # Previously a novel delta was silently DROPPED here while
            # the resumed batch's count was reported as if it were its.
            n_resumed = append_runs_index(
                spark, index_path, new_docs, avgdl, mode=mode, salt=salt,
                n_docs=n_docs, num_shards=num_shards,
                on_conflict=on_conflict, batch_id=inflight,
                fail_after=fail_after)
            if _find_inflight_batch(index_path) is not None:
                return 0  # the resume itself aborted (fail_after hook)
            # manifest-aware read: on a manifest-mode index a bare
            # parquet read would count torn/uncommitted doc_stats objects
            # as committed and misclassify a novel delta as a pure resend
            committed = read_index_rel(
                spark, index_path, "doc_stats").select("doc_id")
            novel = new_docs.select("doc_id").distinct().join(
                committed, "doc_id", "left_anti").count()
            if not novel:
                return n_resumed
            # mixed resend+novel delta: restage only the novel remainder
            # (the resumed portion is committed now and must not trip the
            # overlap check under on_conflict='error'), and return the
            # NOVEL count — the pure-resend branch above returns the
            # resumed count, a full-novel delta its own count (tested).
            # Docs that already existed before the crash are
            # indistinguishable from the resumed portion and are skipped.
            remainder = new_docs.join(committed, "doc_id", "left_anti")
            return append_runs_index(
                spark, index_path, remainder, avgdl, mode=mode, salt=salt,
                n_docs=n_docs, num_shards=num_shards,
                on_conflict=on_conflict, fail_after=fail_after)
    elif inflight is not None and inflight != batch_id:
        raise ValueError(
            f"append_runs_index: batch {inflight!r} is staged but not fully "
            f"committed at {index_path}; resume it (call again without "
            "batch_id) before starting a new append — a new batch's "
            "overlap check cannot see the in-flight docs."
        )
    stage = (f"{index_path}/.staging/append_{batch_id}"
             if batch_id is not None else None)
    _check_staged_kind(stage, "runs", "append_runs_index")
    if _batch_already_committed(spark, index_path, batch_id, stage):
        return 0

    if stage is None or not os.path.exists(f"{stage}/_STAGED"):
        ds = read_index_rel(spark, index_path, "doc_stats")
        dt = build_doc_terms_narrow(new_docs, mode=mode)
        old_ids = ds.select("doc_id")
        n_overlap = dt.select("doc_id").distinct().join(
            old_ids, "doc_id", "left_semi"
        ).count()
        if n_overlap:
            if on_conflict == "error":
                raise ValueError(
                    f"append_runs_index: {n_overlap} doc_ids already exist "
                    f"in the index at {index_path}; pass on_conflict='skip' "
                    "to drop the re-ingested docs."
                )
            if on_conflict != "skip":
                raise ValueError(f"unknown on_conflict {on_conflict!r}")
            dt = dt.join(old_ids, "doc_id", "left_anti")
        delta_ds = dt.groupBy("doc_id").agg(
            F.max("doclen").alias("doclen")
        )
        n_delta = delta_ds.count()
        if not n_delta:
            return 0
        if n_docs is None:
            # derive a bucket-width basis when the caller doesn't pass
            # one: max doc id across index + delta. The width need not
            # match the base build's — a differing width only co-groups
            # MORE docs per task, never splits one doc's runs.
            hi = ds.agg(F.max("doc_id")).collect()[0][0] or 0
            hi_d = delta_ds.agg(F.max("doc_id")).collect()[0][0] or 0
            n_docs = int(max(hi, hi_d)) + 1
        runs = build_posting_runs(dt, None, avgdl, salt=salt, n_docs=n_docs)
        from cer_for_mti_spark.functions.hashing import md5_60

        if batch_id is None:
            batch_id = _new_batch_id(spark, index_path)
            stage = f"{index_path}/.staging/append_{batch_id}"
        shutil.rmtree(stage, ignore_errors=True)
        sharded = runs.withColumn(
            "shard",
            F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int"),
        ).repartition(num_shards, "shard")
        sharded.write.mode("overwrite").partitionBy("shard").parquet(
            f"{stage}/runs"
        )
        if has_term_dict(index_path):
            # delta-local (term, df) — readers sum per-batch deltas to
            # the global df (read_term_dict). Indexes written before the
            # sidecar existed stay runs-derived: committing a dict that
            # held only this delta's counts would corrupt their df.
            _write_term_dict_sorted(
                spark.read.parquet(f"{stage}/runs").groupBy("term").agg(
                    F.sum("df").cast("long").alias("df")),
                f"{stage}/term_dict")
        from cer_for_mti_spark.operators import fuzzy_dict as _fz

        if _fz.has_fuzzy_dict(index_path):
            # batch-local delete-variant delta: every batch containing a
            # term stages the SAME variant set for it (deterministic in
            # the term), so readers summing df per (variant, term) get
            # the global df on every variant — same lazy-delta
            # convention as term_dict. Depth comes from the sidecar's
            # baked meta; pre-sidecar indexes stage nothing.
            md = int(_fz.read_fuzzy_dict_meta(index_path)["max_dist"])
            _fz._write_fuzzy_sorted(
                _fz.fuzzy_rows(
                    spark.read.parquet(f"{stage}/runs").groupBy("term").agg(
                        F.sum("df").cast("long").alias("df")),
                    md),
                f"{stage}/fuzzy_dict")
        from cer_for_mti_spark.operators import rev_dict as _rv

        if _rv.has_rev_dict(index_path):
            # reversed-dictionary delta, same batch-local-df convention
            _rv._write_rev_sorted(
                _rv.rev_rows(
                    spark.read.parquet(f"{stage}/runs").groupBy("term").agg(
                        F.sum("df").cast("long").alias("df"))),
                f"{stage}/rev_dict")
        delta_ds.write.mode("overwrite").parquet(f"{stage}/doc_stats")
        with open(f"{stage}/_STAGED", "w") as f:
            f.write(f"{n_delta}\n")
    else:
        with open(f"{stage}/_STAGED") as f:
            n_delta = int(f.readline())

    units = _staged_shard_units(stage, "runs", index_path)
    if os.path.isdir(f"{stage}/term_dict"):
        units.append(("term_dict", f"{stage}/term_dict",
                      f"{index_path}/term_dict"))
    if os.path.isdir(f"{stage}/fuzzy_dict"):
        units.append(("fuzzy_dict", f"{stage}/fuzzy_dict",
                      f"{index_path}/fuzzy_dict"))
    if os.path.isdir(f"{stage}/rev_dict"):
        units.append(("rev_dict", f"{stage}/rev_dict",
                      f"{index_path}/rev_dict"))
    units.append(("doc_stats", f"{stage}/doc_stats",
                  f"{index_path}/doc_stats"))
    _commit_append_units(spark, index_path, batch_id, units, fail_after)
    return int(n_delta)


def append_positional_runs_index(spark, index_path: str,
                                 new_docs: DataFrame, mode: str = "simple",
                                 salt: int | None = None,
                                 n_docs: int | None = None,
                                 num_shards: int | None = None,
                                 on_conflict: str = "error",
                                 batch_id: str | None = None,
                                 fail_after: int | None = None) -> int:
    """Incremental ingest for the positional runs index — EXACT with no
    frozen-stats caveat at all: positional runs carry no corpus
    statistics (positions are doc-local), and phrase_search_sharded
    merges multiple runs per (term, bucket) at decode time, so appended
    docs' phrase hits are identical to a from-scratch build's.

    doc_id disjointness is ENFORCED (same contract as append_runs_index
    — a re-ingested doc would silently double-count n_matches): the
    index must carry the `docs` sidecar written by
    write_positional_runs_index(..., docs=...), existing ids raise or
    are anti-joined out with on_conflict='skip', and the sidecar is
    appended as the batch's last commit unit. Same staged / lineage /
    resumable protocol as append_runs_index; returns docs appended."""
    from cer_for_mti_spark.functions.hashing import md5_60
    from cer_for_mti_spark.operators.phrase import build_positional_runs

    num_shards = resolve_num_shards(index_path, num_shards)
    repair_interrupted_compaction(index_path, "positional_runs")
    repair_interrupted_compaction(index_path, "docs")
    inflight = _find_inflight_batch(index_path)
    if batch_id is None:
        if inflight is not None:
            # Same resume-then-ingest contract as append_runs_index:
            # finish the crashed batch, then a fully-contained new_docs
            # is a pure re-send (return the resumed count) while novel
            # docs fall through to their own batch instead of being
            # silently dropped.
            n_resumed = append_positional_runs_index(
                spark, index_path, new_docs, mode=mode, salt=salt,
                n_docs=n_docs, num_shards=num_shards,
                on_conflict=on_conflict, batch_id=inflight,
                fail_after=fail_after)
            if _find_inflight_batch(index_path) is not None:
                return 0  # the resume itself aborted (fail_after hook)
            committed = read_index_rel(
                spark, index_path, "docs").select("doc_id")
            novel = new_docs.select("doc_id").distinct().join(
                committed, "doc_id", "left_anti").count()
            if not novel:
                return n_resumed
    elif inflight is not None and inflight != batch_id:
        raise ValueError(
            f"append_positional_runs_index: batch {inflight!r} is staged "
            f"but not fully committed at {index_path}; resume it first."
        )
    stage = (f"{index_path}/.staging/append_{batch_id}"
             if batch_id is not None else None)
    _check_staged_kind(stage, "positional",
                       "append_positional_runs_index")
    if _batch_already_committed(spark, index_path, batch_id, stage):
        return 0

    if stage is None or not os.path.exists(f"{stage}/_STAGED"):
        docs_dir = f"{index_path}/docs"
        if not os.path.isdir(docs_dir):
            raise ValueError(
                f"append_positional_runs_index: no doc-id sidecar at "
                f"{docs_dir} — rebuild the index with "
                "write_positional_runs_index(..., docs=<the indexed "
                "docs>) so appends can enforce doc_id disjointness."
            )
        old_ids = read_index_rel(spark, index_path, "docs").select("doc_id")
        delta = new_docs.select("doc_id").distinct()
        n_overlap = delta.join(old_ids, "doc_id", "left_semi").count()
        if n_overlap:
            if on_conflict == "error":
                raise ValueError(
                    f"append_positional_runs_index: {n_overlap} doc_ids "
                    f"already exist in the index at {index_path}; their "
                    "phrase hits would double-count. Pass "
                    "on_conflict='skip' to drop the re-ingested docs."
                )
            if on_conflict != "skip":
                raise ValueError(f"unknown on_conflict {on_conflict!r}")
            new_docs = new_docs.join(old_ids, "doc_id", "left_anti")
        delta = new_docs.select("doc_id").distinct()
        n_delta = delta.count()
        if not n_delta:
            return 0
        runs = build_positional_runs(new_docs, mode=mode, salt=salt,
                                     n_docs=n_docs)
        if batch_id is None:
            batch_id = _new_batch_id(spark, index_path)
            stage = f"{index_path}/.staging/append_{batch_id}"
        shutil.rmtree(stage, ignore_errors=True)
        sharded = runs.withColumn(
            "shard",
            F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int"),
        ).repartition(num_shards, "shard")
        sharded.write.mode("overwrite").partitionBy("shard").parquet(
            f"{stage}/positional_runs"
        )
        delta.write.mode("overwrite").parquet(f"{stage}/docs")
        with open(f"{stage}/_STAGED", "w") as f:
            f.write(f"{n_delta}\n")
    else:
        with open(f"{stage}/_STAGED") as f:
            n_delta = int(f.readline())

    units = _staged_shard_units(stage, "positional_runs", index_path)
    units.append(("docs", f"{stage}/docs", f"{index_path}/docs"))
    _commit_append_units(spark, index_path, batch_id, units, fail_after)
    return int(n_delta)


TOMBSTONE_MAX_IDS = 50_000_000


def delete_docs(spark, index_path: str, doc_ids: DataFrame,
                batch_id: str | None = None,
                fail_after: int | None = None) -> int:
    """Tombstone documents of a written runs/positional index — the
    delete leg of the index lifecycle (build -> append -> DELETE ->
    compact). The reference's set-difference semantics
    (run_tool_evaluation.py:642-652, U4 anti-join) applied to retrieval:
    tombstoned docs are dropped by every query path BEFORE any top-k
    cut (scorers mask decoded cursors, phrase anti-joins hits — per-doc,
    so bucket-exact), and compaction physically purges them.

    Deletes are LAZY, Lucene-style: runs bytes, df, doc_stats and the
    frozen bake avgdl are untouched until compact_runs_index /
    compact_positional_runs rewrites the index without the tombstoned
    docs (df and N then genuinely change — that is the stats-change
    event, priced as the compaction it is).

    The tombstone sidecar (<index>/tombstones, a doc_id parquet) is
    written through the SAME staged + lineage-committed + resumable
    protocol as the appends: a crash at any point is repaired by calling
    delete_docs again; appends refuse to adopt a crashed delete batch
    and vice versa (_check_staged_kind). Ids not in the index and ids
    already tombstoned are ignored (idempotent). Returns the number of
    NEWLY tombstoned docs.

    Works unchanged on an ANN index (membership = the codes ids; pass
    vector ids as doc_id): the ANN query paths mask the same sidecar and
    similarity.compact_ann_index purges it."""
    for rel in ("runs", "positional_runs", "codes", "vectors"):
        repair_interrupted_compaction(index_path, rel)
    inflight = _find_inflight_batch(index_path)
    if batch_id is None:
        if inflight is not None:
            n_resumed = delete_docs(spark, index_path, doc_ids,
                                    batch_id=inflight,
                                    fail_after=fail_after)
            if _find_inflight_batch(index_path) is not None:
                return 0  # the resume itself aborted (fail_after hook)
            committed = read_tombstones(spark, index_path)
            novel = doc_ids.select("doc_id").distinct().join(
                committed, "doc_id", "left_anti").count()
            if not novel:
                return n_resumed
    elif inflight is not None and inflight != batch_id:
        raise ValueError(
            f"delete_docs: batch {inflight!r} is staged but not fully "
            f"committed at {index_path}; resume it first."
        )
    stage = (f"{index_path}/.staging/append_{batch_id}"
             if batch_id is not None else None)
    _check_staged_kind(stage, "delete", "delete_docs")
    if _batch_already_committed(spark, index_path, batch_id, stage):
        return 0

    if stage is None or not os.path.exists(f"{stage}/_STAGED"):
        member = _index_member_ids(spark, index_path)
        tomb = doc_ids.select("doc_id").distinct()
        if member is not None:
            tomb = tomb.join(member, "doc_id", "left_semi")
        existing = read_tombstones(spark, index_path)
        tomb = tomb.join(existing, "doc_id", "left_anti")
        n_delta = tomb.count()
        if not n_delta:
            return 0
        if batch_id is None:
            batch_id = _new_batch_id(spark, index_path)
            stage = f"{index_path}/.staging/append_{batch_id}"
        shutil.rmtree(stage, ignore_errors=True)
        tomb.write.mode("overwrite").parquet(f"{stage}/tombstones")
        with open(f"{stage}/_STAGED", "w") as f:
            f.write(f"{n_delta}\n")
    else:
        with open(f"{stage}/_STAGED") as f:
            n_delta = int(f.readline())

    units = [("tombstones", f"{stage}/tombstones",
              f"{index_path}/tombstones")]
    _commit_append_units(spark, index_path, batch_id, units, fail_after)
    return int(n_delta)


def _index_member_ids(spark, index_path: str) -> DataFrame | None:
    """doc_id membership relation of a written index: doc_stats for the
    BM25 runs layout, the docs sidecar for the positional layout, the
    codes ids for an ANN index (vector deletes share the same sidecar +
    protocol), None when none exists (membership not enforceable)."""
    for rel in ("doc_stats", "docs"):
        d = f"{index_path}/{rel}"
        if os.path.isdir(d):
            return read_index_rel(spark, index_path, rel).select("doc_id")
    if os.path.isdir(f"{index_path}/codes"):
        return read_index_rel(
            spark, index_path, "codes", with_base_path=True
        ).select(F.col("id").alias("doc_id"))
    return None


def read_tombstones(spark, index_path: str) -> DataFrame:
    """The tombstoned doc_id relation (possibly empty). Distinct-safe:
    the committed sidecar only ever receives pre-deduped batches."""
    d = f"{index_path}/tombstones"
    if not os.path.isdir(d) or not any(
        not f.startswith(("_", ".")) for f in os.listdir(d)
    ):
        return spark.createDataFrame([], "doc_id long")
    files = _manifest_rel_files(index_path, "tombstones")
    if files is not None and not files:
        # manifest-mode index whose tombstone objects are not committed
        return spark.createDataFrame([], "doc_id long")
    return read_index_rel(spark, index_path, "tombstones").select("doc_id")


def load_tombstones(spark, index_path: str,
                    max_ids: int = TOMBSTONE_MAX_IDS):
    """Tombstones as a sorted int64 numpy array for decode-time masking
    (None when there are none). Guarded: past max_ids (~8 bytes/id of
    broadcast weight) query-time masking is the wrong tool — raise and
    point at compaction, which physically purges the docs. Same
    guard-or-shard policy as phrase_search's max_posting_bytes."""
    import numpy as _np

    # fast path: no sidecar directory -> no tombstones, no Spark job.
    # (query paths call this once per batch; an empty-relation count()
    # still costs a full job-submit round trip)
    d = f"{index_path}/tombstones"
    if not os.path.isdir(d) or not any(
        not f.startswith(("_", ".")) for f in os.listdir(d)
    ):
        return None
    tomb = read_tombstones(spark, index_path)
    n = tomb.count()
    if not n:
        return None
    if n > max_ids:
        raise ValueError(
            f"load_tombstones: {n} tombstoned docs at {index_path} "
            f"exceeds max_ids={max_ids} (~{8 * n >> 20} MiB broadcast); "
            "run compact_runs_index / compact_positional_runs to purge "
            "them physically instead of masking at query time."
        )
    ids = _np.fromiter((r.doc_id for r in tomb.collect()),
                       dtype=_np.int64, count=n)
    ids.sort()
    return ids


def tombstones_by_bucket(spark, index_path: str,
                         runs: DataFrame) -> DataFrame:
    """(bucket, tomb_ids sorted array<long>) — the DISTRIBUTED purge
    plan: each tombstoned id is range-joined to the doc-range buckets
    whose observed [min(first_id), max(last_id)] span contains it, then
    grouped into one sorted array per bucket. The bucket-range relation
    is tiny (thousands of rows) and broadcast, so the only data motion
    is the tombstone ids themselves, shuffled once on bucket; no driver
    collect and no full-set broadcast anywhere. Assignment is an
    OVER-approximation when append batches used different bucket widths
    (spans can overlap) — harmless, the per-run sorted-intersection
    simply finds no match. Per-bucket array size is bounded by the
    bucket's own doc count, the same bound the bucket's posting bytes
    already obey."""
    ranges = runs.groupBy("bucket").agg(
        F.min("first_id").alias("_lo"), F.max("last_id").alias("_hi"))
    tomb = read_tombstones(spark, index_path)
    return tomb.join(
        F.broadcast(ranges),
        (F.col("doc_id") >= F.col("_lo")) & (F.col("doc_id") <= F.col("_hi")),
    ).groupBy("bucket").agg(
        F.sort_array(F.collect_set("doc_id")).alias("tomb_ids"))


def compact_runs_index(spark, index_path: str, avgdl: float,
                       num_shards: int | None = None,
                       purge_tombstones: bool = True,
                       tombstone_broadcast_max: int = TOMBSTONE_MAX_IDS
                       ) -> tuple[int, int]:
    """Fold appended batches of a BM25 RUNS index back to EXACTLY ONE run
    per (term, bucket) — the BM25 twin of phrase.compact_positional_runs.

    Merge-free appends leave one run per (term, bucket, batch); the
    sharded scorers handle that (independent cursors), but query-time
    decode then touches B tiny runs per key after B batches. The merge
    is merge_encoded_runs per key: disjoint doc-id ranges (the normal
    append shape — new docs get new ids) byte-concat with impacts and
    block maxes UNTOUCHED; interleaved ranges re-encode, which is why
    `avgdl` must be the index's frozen bake value (the avgdl every
    append passed) — re-encoding with anything else would change
    existing docs' impacts. doc_stats and append lineage are untouched
    (layout, not membership). Same staged rewrite + rename swap as the
    positional compactor.

    purge_tombstones (default True): docs tombstoned by delete_docs are
    PHYSICALLY removed — their postings re-encoded away (df, block
    maxes, max_impact genuinely recomputed), their doc_stats rows
    dropped, and the tombstone sidecar cleared, so queries stop paying
    the mask. This is the stats-change event of the delete lifecycle:
    N (and each affected term's df) drop, so scores legitimately move;
    the bake avgdl stays frozen as everywhere.

    Tombstone sets up to tombstone_broadcast_max ride a driver
    broadcast; LARGER sets switch to the distributed purge plan
    (tombstones_by_bucket): ids range-join to their doc-range bucket
    and reach each merge task as that bucket's sorted array column, so
    arbitrarily large delete sets purge without any full-set broadcast
    or driver materialization. Both plans produce identical bytes
    (tested).

    Returns (runs_before, runs_after)."""
    num_shards = resolve_num_shards(index_path, num_shards)
    inflight = _find_inflight_batch(index_path)
    if inflight is not None:
        # same guard as vacuum_index/write_fuzzy_dict: compacting while a
        # crashed append is staged would fold its already-committed run
        # units into the new base, and the later resume would then
        # double-commit the batch's dictionary deltas on top
        raise ValueError(
            f"compact_runs_index: append batch {inflight!r} at "
            f"{index_path} is staged but not fully committed; resume it "
            "first (append_runs_index with batch_id=None completes it)."
        )
    repair_interrupted_compaction(index_path, "runs")
    repair_interrupted_compaction(index_path, "term_dict")
    repair_interrupted_compaction(index_path, "fuzzy_dict")
    repair_interrupted_compaction(index_path, "rev_dict")
    # manifest-aware: a manifest-mode index may hold uncommitted/torn
    # objects in the data dirs; compact only what the manifests commit
    runs = read_index_rel(spark, index_path, "runs", with_base_path=True)
    n_tomb = (read_tombstones(spark, index_path).count()
              if purge_tombstones else 0)
    tomb_bc = None
    tomb_bkt = None
    if n_tomb and n_tomb <= tombstone_broadcast_max:
        tomb_bc = spark.sparkContext.broadcast(
            load_tombstones(spark, index_path))
    elif n_tomb:
        tomb_bkt = tombstones_by_bucket(spark, index_path, runs)
    n_before = runs.count()
    agg = runs.groupBy("term", "bucket").agg(
        F.collect_list(F.struct(*RUN_FIELDS)).alias("runs"),
        F.min("first_id").alias("first_id"),
        F.max("last_id").alias("last_id"),
    )
    if tomb_bkt is not None:
        agg = agg.join(tomb_bkt, "bucket", "left")
        merge_expr = _make_merge_runs_udf(avgdl, tomb_col=True)(
            "runs", "tomb_ids")
    else:
        merge_expr = _make_merge_runs_udf(avgdl, tomb_bc)("runs")
    merged = agg.select(
        "term", "bucket", "first_id", "last_id",
        merge_expr.alias("p"),
    ).select(
        "term", "bucket", "first_id", "last_id", "p.df", "p.doc_ids",
        "p.tfs", "p.doclens", "p.block_last", "p.block_max", "p.max_impact"
    ).filter(F.col("df") > 0)  # fully-tombstoned postings vanish
    from cer_for_mti_spark.functions.hashing import md5_60

    staging = f"{index_path}/.compact_staging"
    shutil.rmtree(staging, ignore_errors=True)
    sharded = merged.withColumn(
        "shard", F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int")
    ).repartition(num_shards, "shard")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{staging}/runs"
    )
    n_after = spark.read.parquet(f"{staging}/runs").count()
    final = f"{index_path}/runs"
    trash = f"{index_path}/.runs_old"
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(final, trash)
    os.rename(f"{staging}/runs", final)
    shutil.rmtree(trash)
    shutil.rmtree(staging, ignore_errors=True)
    if n_tomb:
        _purge_membership_sidecar(spark, index_path, "doc_stats")
    had_dict = os.path.isdir(f"{index_path}/term_dict")
    if had_dict:
        # regenerate the sorted dictionary from the COMPACTED runs:
        # per-batch deltas collapse to one sorted base, and purged docs'
        # df drops land here (the stats-change event of the delete
        # lifecycle). Same staged two-rename swap as every sidecar.
        staging = f"{index_path}/.compact_staging"
        _write_term_dict_sorted(
            spark.read.parquet(f"{index_path}/runs").groupBy("term").agg(
                F.sum("df").cast("long").alias("df")),
            f"{staging}/term_dict")
        final_td = f"{index_path}/term_dict"
        trash_td = f"{index_path}/.term_dict_old"
        shutil.rmtree(trash_td, ignore_errors=True)
        os.rename(final_td, trash_td)
        os.rename(f"{staging}/term_dict", final_td)
        shutil.rmtree(trash_td)
        shutil.rmtree(staging, ignore_errors=True)
    from cer_for_mti_spark.operators import fuzzy_dict as _fz

    had_fuzzy = os.path.isdir(f"{index_path}/fuzzy_dict")
    if had_fuzzy:
        # regenerate the delete-neighborhood sidecar from the compacted
        # dictionary at its baked depth: per-batch deltas collapse to
        # one sorted base and purged docs' df drops land here, exactly
        # like term_dict. Same staged two-rename swap.
        md = int(_fz.read_fuzzy_dict_meta(index_path)["max_dist"])
        staging = f"{index_path}/.compact_staging"
        _fz._write_fuzzy_sorted(
            _fz.fuzzy_rows(
                spark.read.parquet(f"{index_path}/runs").groupBy("term").agg(
                    F.sum("df").cast("long").alias("df")),
                md),
            f"{staging}/fuzzy_dict")
        final_fz = f"{index_path}/fuzzy_dict"
        trash_fz = f"{index_path}/.fuzzy_dict_old"
        shutil.rmtree(trash_fz, ignore_errors=True)
        os.rename(final_fz, trash_fz)
        os.rename(f"{staging}/fuzzy_dict", final_fz)
        shutil.rmtree(trash_fz)
        shutil.rmtree(staging, ignore_errors=True)
    from cer_for_mti_spark.operators import rev_dict as _rv

    had_rev = os.path.isdir(f"{index_path}/rev_dict")
    if had_rev:
        # regenerate the reversed dictionary from the compacted runs —
        # deltas collapse to one sorted base, purged df drops land here
        staging = f"{index_path}/.compact_staging"
        _rv._write_rev_sorted(
            _rv.rev_rows(
                spark.read.parquet(f"{index_path}/runs").groupBy("term").agg(
                    F.sum("df").cast("long").alias("df"))),
            f"{staging}/rev_dict")
        final_rv = f"{index_path}/rev_dict"
        trash_rv = f"{index_path}/.rev_dict_old"
        shutil.rmtree(trash_rv, ignore_errors=True)
        os.rename(final_rv, trash_rv)
        os.rename(f"{staging}/rev_dict", final_rv)
        shutil.rmtree(trash_rv)
        shutil.rmtree(staging, ignore_errors=True)
    if _index_commit_mode(index_path) == "manifest":
        # compaction is offline rename-based maintenance; regenerate the
        # manifests to point at the compacted files (old unit manifests
        # are superseded wholesale)
        shutil.rmtree(f"{index_path}/{MANIFEST_DIR}", ignore_errors=True)
        _manifest_write(index_path, "base-runs",
                        _list_data_files(index_path, "runs"))
        _manifest_write(index_path, "base-doc_stats",
                        _list_data_files(index_path, "doc_stats"))
        if had_dict:
            _manifest_write(index_path, "base-term_dict",
                            _list_data_files(index_path, "term_dict"))
        if had_fuzzy:
            _manifest_write(index_path, "base-fuzzy_dict",
                            _list_data_files(index_path, "fuzzy_dict"))
        if had_rev:
            _manifest_write(index_path, "base-rev_dict",
                            _list_data_files(index_path, "rev_dict"))
        if os.path.isdir(f"{index_path}/tombstones"):
            _manifest_write(index_path, "base-tombstones",
                            _list_data_files(index_path, "tombstones"))
    return int(n_before), int(n_after)


def _purge_membership_sidecar(spark, index_path: str, rel: str) -> None:
    """Post-purge bookkeeping shared by both compactors: rewrite the
    membership sidecar (doc_stats / docs) without the tombstoned ids via
    the same staged two-rename swap the runs use (crashes repaired by
    repair_interrupted_compaction), then clear the tombstone sidecar.
    Ordering keeps every crash window consistent: runs already purged ->
    masking already-absent ids is a no-op until the tombstones dir
    disappears last."""
    tomb_df = read_tombstones(spark, index_path)
    kept = read_index_rel(spark, index_path, rel).join(
        tomb_df, "doc_id", "left_anti"
    )
    staging = f"{index_path}/.compact_staging"
    kept.write.mode("overwrite").parquet(f"{staging}/{rel}")
    final = f"{index_path}/{rel}"
    trash = f"{index_path}/.{rel}_old"
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(final, trash)
    os.rename(f"{staging}/{rel}", final)
    shutil.rmtree(trash)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(f"{index_path}/tombstones", ignore_errors=True)


def build_index(docs: DataFrame, mode: str = "simple",
                salt: int | None = None,
                plan: str = "narrow") -> tuple[DataFrame, DataFrame, int, float]:
    """Full build; returns (postings, doc_stats, N, avgdl).

    plan='narrow' (default, the scale path) computes per-doc term counts
    inside the doc's row — the salted term merge is then the only full
    shuffle. plan='shuffle' is the declarative twin (groupBy(doc_id,term)),
    kept because it is the DuckDB-oracle-matched definition.

    doc_stats is cached across the two passes (stats, then postings); at
    cluster scale the equivalent is persisting doc_terms to the table
    layer between passes — see plans/lineage.py, which does exactly that
    for the resumable build."""
    doc_stats = build_doc_stats(docs, mode=mode).persist()
    n, avgdl = corpus_stats(doc_stats)
    if plan == "spimi":
        postings = build_postings_spimi(docs, avgdl, mode=mode)
        return postings, doc_stats, n, avgdl
    if plan == "narrow":
        doc_terms = build_doc_terms_narrow(docs, mode=mode)
    else:
        doc_terms = build_doc_terms_with_dl(docs, mode=mode).persist()
    # fuse=False: plan= explicitly selects the execution strategy here
    # (the parity tests depend on the three plans being genuinely distinct)
    postings = build_postings(doc_terms, doc_stats, avgdl, salt=salt,
                              n_docs=n, fuse=False)
    return postings, doc_stats, n, avgdl
