"""Positional postings + phrase search.

Positional index: the SPIMI single-pass build extended with per-(term,
doc) token-position lists. Postings carry one extra binary column:

    positions: varint deltas of each doc's sorted position list,
               concatenated in doc order (group sizes = the tfs stream)

Runs merge exactly like the non-positional index (byte concat + one
varint boundary patch for doc_ids; tfs/positions streams concatenate
as-is) — the merge shuffle still moves only compressed bytes.

Phrase match: for a phrase t1..tn, fetch the n positional postings
(scan-pruned by term), co-locate per phrase with applyInPandas, then a
numpy adjacency intersection: doc qualifies when some position p has
p+i ∈ positions(t_{i+1}) for all i. The reference has no phrase operator
(its unit is the whole-document term set); this is the standard
full-text extension of its exact-match semantics.
"""

from __future__ import annotations

import os
import re
import shutil
from collections import defaultdict
from functools import reduce
from operator import or_

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cer_for_mti_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)
from cer_for_mti_spark.operators.index_build import (
    _JAVA_WS_RE,
    _object_df,
    _varint_prefix_len,
)

POSITIONAL_RUN_SCHEMA = (
    "term string, first_id long, last_id long, df long, "
    "doc_ids binary, tfs binary, positions binary"
)
POSITIONAL_RUN_BUCKET_SCHEMA = (
    "term string, bucket long, first_id long, last_id long, df long, "
    "doc_ids binary, tfs binary, positions binary"
)
POSITIONAL_SCHEMA = (
    "term string, df long, doc_ids binary, tfs binary, positions binary"
)
PHRASE_HIT_SCHEMA = "phrase_id int, doc_id long, n_matches int"


def _make_positional_partition(mode: str, text_col: str,
                               max_postings_in_memory: int,
                               width: int | None):
    """Shared vectorized SPIMI positional pass (guide §4.2): tokenize +
    per-occurrence position assignment run through Arrow/numpy kernels;
    accumulation holds flat (gid, doc_id, pos) arrays; the flush groups
    them with one lexsort. width=None emits per-term runs
    (POSITIONAL_RUN_SCHEMA); an int width adds the doc-range bucket
    column (POSITIONAL_RUN_BUCKET_SCHEMA). Flushes are doc-aligned, so
    runs stay contiguous doc slices and the byte-concat merge holds."""
    if mode not in ("simple", "chem", "chem+greek"):
        raise ValueError(f"unknown tokenize mode {mode!r}")
    tok_mode = "simple" if mode == "simple" else "chem"

    def part(batches):
        import pyarrow as pa

        from cer_for_mti_spark.functions.analyze import _tokenize_codes_pa

        vocab: dict = {}
        gid_terms: list = []
        parts: list = []   # accumulated (gid, doc_id, pos) occurrence arrays
        n_acc = 0          # accumulated POSTING count (distinct doc-term)

        def flush():
            nonlocal parts, n_acc
            if width is None:
                out = {
                    "term": [], "first_id": [], "last_id": [], "df": [],
                    "doc_ids": [], "tfs": [], "positions": [],
                }
            else:  # schema order of POSITIONAL_RUN_BUCKET_SCHEMA
                out = {
                    "term": [], "bucket": [], "first_id": [], "last_id": [],
                    "df": [], "doc_ids": [], "tfs": [], "positions": [],
                }
            if parts:
                g = np.concatenate([p[0] for p in parts])
                d = np.concatenate([p[1] for p in parts])
                p_ = np.concatenate([p[2] for p in parts])
                order = np.lexsort((p_, d, g))
                g, d, p_ = g[order], d[order], p_[order]
                docstart = np.empty(len(g), dtype=bool)
                docstart[0] = True
                docstart[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
                gaps = np.where(docstart, p_, p_ - np.roll(p_, 1))
                if width is None:
                    rowstart = g[1:] != g[:-1]
                else:
                    bkt = d // width
                    rowstart = (g[1:] != g[:-1]) | (bkt[1:] != bkt[:-1])
                bounds = np.flatnonzero(rowstart) + 1
                starts = np.concatenate(([0], bounds, [len(g)]))
                ds_idx = np.flatnonzero(docstart)
                # vectorized run encode (byte-identical to the old
                # per-run delta_encode/varint_encode loop): every run
                # start is a doc start (a term/bucket change implies a
                # (term,doc) change), so doc-level streams segment by
                # searchsorted and one whole-flush varint pass per
                # stream replaces ~5 kernel launches per run
                from cer_for_mti_spark.operators.index_build import (
                    _varint_encode_segmented,
                )

                run_doc_lo = np.searchsorted(ds_idx, starts[:-1])
                run_doc_hi = np.searchsorted(ds_idx, starts[1:])
                ids_flat = d[ds_idx]
                first_mask = np.zeros(len(ds_idx), dtype=bool)
                first_mask[run_doc_lo] = True
                prev = np.empty_like(ids_flat)
                if len(ids_flat):
                    prev[0] = 0
                    prev[1:] = ids_flat[:-1]
                gaps_doc = np.where(first_mask, ids_flat, ids_flat - prev)
                tf_flat = np.diff(np.append(ds_idx, len(g)))
                id_buf, id_offs = _varint_encode_segmented(
                    gaps_doc.astype(np.uint64))
                tf_buf, tf_offs = _varint_encode_segmented(
                    tf_flat.astype(np.uint64))
                pos_buf, pos_offs = _varint_encode_segmented(
                    gaps.astype(np.uint64))
                gterms = np.asarray(gid_terms, dtype=object)[g[starts[:-1]]]
                out["term"] = list(gterms)
                if width is not None:
                    out["bucket"] = (d[starts[:-1]] // width).tolist()
                out["first_id"] = ids_flat[run_doc_lo].tolist()
                out["last_id"] = ids_flat[run_doc_hi - 1].tolist()
                out["df"] = (run_doc_hi - run_doc_lo).tolist()
                out["doc_ids"] = [
                    id_buf[id_offs[lo]:id_offs[hi]]
                    for lo, hi in zip(run_doc_lo, run_doc_hi)
                ]
                out["tfs"] = [
                    tf_buf[tf_offs[lo]:tf_offs[hi]]
                    for lo, hi in zip(run_doc_lo, run_doc_hi)
                ]
                out["positions"] = [
                    pos_buf[pos_offs[s]:pos_offs[e]]
                    for s, e in zip(starts[:-1], starts[1:])
                ]
            parts, n_acc = [], 0
            return _object_df(out)

        for pdf in batches:
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            arr = pa.Array.from_pandas(pdf[text_col], type=pa.string())
            codes, vocab_pa, offs = _tokenize_codes_pa(arr, tok_mode)
            total = int(offs[-1])
            if not total:
                continue
            n_rows = len(offs) - 1
            counts = np.diff(offs)
            doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                offs[:-1], counts)
            bdict = vocab_pa.to_pylist()
            gmap = np.empty(len(bdict), dtype=np.int64)
            for j, term in enumerate(bdict):
                gid = vocab.get(term)
                if gid is None:
                    gid = len(gid_terms)
                    vocab[term] = gid
                    gid_terms.append(term)
                gmap[j] = gid
            gids = gmap[codes]
            d_tok = doc_ids[doc_idx]
            # per-doc POSTING counts (distinct terms) for the budget
            upairs = np.unique(doc_idx * len(bdict) + codes)
            per_doc = np.bincount(upairs // len(bdict), minlength=n_rows)
            cum = n_acc + np.cumsum(per_doc)
            lo = 0  # token index of the unflushed remainder
            while cum[-1] >= max_postings_in_memory:
                j = int(np.searchsorted(cum, max_postings_in_memory))
                hi = int(offs[j + 1])
                parts.append((gids[lo:hi], d_tok[lo:hi], pos[lo:hi]))
                yield flush()  # resets parts and n_acc
                cum = cum - cum[j]
                lo = hi
            if lo < total:
                parts.append((gids[lo:], d_tok[lo:], pos[lo:]))
            n_acc = int(cum[-1])
        yield flush()

    return part


def build_positional_postings(docs: DataFrame, mode: str = "simple",
                              text_col: str = "text",
                              max_postings_in_memory: int = 20_000_000,
                              ) -> DataFrame:
    """Single-pass SPIMI positional build: one mapInPandas pass emits
    compressed positional runs; groupBy(term) merges by byte concat."""
    part = _make_positional_partition(mode, text_col,
                                      max_postings_in_memory, width=None)
    runs = docs.select("doc_id", text_col).mapInPandas(
        part, POSITIONAL_RUN_SCHEMA
    )

    @F.pandas_udf("df long, doc_ids binary, tfs binary, positions binary")
    def merge(runs_s: pd.Series) -> pd.DataFrame:
        out = {"df": [], "doc_ids": [], "tfs": [], "positions": []}
        for runs_l in runs_s:
            rs = sorted(runs_l, key=lambda r: (r["first_id"], r["last_id"]))
            if any(r["first_id"] <= prev["last_id"]
                   for prev, r in zip(rs, rs[1:])):
                # overlapping doc-id ranges (repartitioned input / SPIMI
                # memory flush on unsorted rows): the byte-concat boundary
                # gap would go negative and wrap as uint64 — fall back to
                # decode + doc-sort + re-encode, like merge_encoded_runs
                df_, d, t, p = _merge_positional_overlap(rs)
                out["df"].append(df_)
                out["doc_ids"].append(d)
                out["tfs"].append(t)
                out["positions"].append(p)
                continue
            ids_parts = [bytes(rs[0]["doc_ids"])]
            for prev, r in zip(rs, rs[1:]):
                b = bytes(r["doc_ids"])
                plen = _varint_prefix_len(b)
                gap = np.asarray([r["first_id"] - prev["last_id"]],
                                 dtype=np.uint64)
                ids_parts.append(varint_encode(gap) + b[plen:])
            out["df"].append(int(sum(r["df"] for r in rs)))
            out["doc_ids"].append(b"".join(ids_parts))
            out["tfs"].append(b"".join(bytes(r["tfs"]) for r in rs))
            out["positions"].append(
                b"".join(bytes(r["positions"]) for r in rs)
            )
        return _object_df(out)

    merged = runs.groupBy("term").agg(
        F.collect_list(F.struct(
            "first_id", "last_id", "df", "doc_ids", "tfs", "positions"
        )).alias("runs")
    )
    return merged.select("term", merge("runs").alias("p")).select(
        "term", "p.df", "p.doc_ids", "p.tfs", "p.positions"
    )


def _merge_positional_overlap(rs: list) -> tuple[int, bytes, bytes, bytes]:
    """Slow-path merge for overlapping positional runs: decode every run,
    sort doc groups globally by doc_id, re-encode the three streams.
    Doc ids are unique across runs (a doc's tokens live in one input row),
    so a stable group sort is a full merge."""
    all_ids, all_tfs, pos_slices = [], [], []
    for r in rs:
        ids, tfs, starts, ends, pos = _decode_positional(r)
        all_ids.append(ids)
        all_tfs.append(tfs)
        pos_slices.extend(pos[s:e] for s, e in zip(starts, ends))
    ids = np.concatenate(all_ids)
    tfs = np.concatenate(all_tfs)
    order = np.argsort(ids, kind="stable")
    ids, tfs = ids[order], tfs[order]
    pos = np.concatenate([pos_slices[g] for g in order]) if len(order) else \
        np.array([], dtype=np.int64)
    d, t, p = _encode_positional(ids, tfs, pos)
    return int(len(ids)), d, t, p


def _encode_positional(ids: np.ndarray, tfs: np.ndarray, pos: np.ndarray
                       ) -> tuple[bytes, bytes, bytes]:
    """Encode doc-sorted (ids, tfs, absolute positions) into the three
    positional streams: delta doc ids, varint tfs, per-doc position
    deltas (group starts absolute, rest in-group deltas)."""
    gaps = pos.copy()
    if len(pos) > 1:
        gaps[1:] = pos[1:] - pos[:-1]
    starts = np.cumsum(tfs) - tfs
    gaps[starts] = pos[starts]
    return (
        delta_encode(ids),
        varint_encode(tfs.astype(np.uint64)),
        varint_encode(gaps.astype(np.uint64)),
    )


def _decode_positional(row):
    ids = delta_decode(bytes(row["doc_ids"]))
    tfs = varint_decode(bytes(row["tfs"])).astype(np.int64)
    gaps = varint_decode(bytes(row["positions"])).astype(np.int64)
    # undo per-doc delta vectorized: S = global cumsum of gaps; a group's
    # gap sum telescopes to its last position, so subtracting the global
    # prefix S[start-1] from each group's S slice restores absolute
    # positions (first group's prefix is 0)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    s = np.cumsum(gaps)
    base = np.zeros(len(starts), dtype=np.int64)
    if len(starts) > 1:
        base[1:] = s[starts[1:] - 1]
    pos = s - np.repeat(base, tfs)
    return ids, tfs, starts, ends, pos


def write_positional_index(positional: DataFrame, path: str,
                           num_shards: int = 32) -> None:
    """Persist positional postings hash-sharded on term (same layout
    contract as the main index: shard dirs prune at planning time, term
    predicates push into row groups)."""
    from cer_for_mti_spark.operators.index_build import shard_postings

    sharded = shard_postings(positional, num_shards).repartition(
        num_shards, "shard"
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/positional"
    )
    from cer_for_mti_spark.operators.index_build import write_shards_meta

    write_shards_meta(path, num_shards)


def phrase_search_from_index(spark, index_path: str, phrases: DataFrame,
                             mode: str = "simple",
                             num_shards: int | None = None,
                             base_df: DataFrame | None = None,
                             max_posting_bytes: int | None = -1,
                             slop: int = 0, tombstones="auto") -> DataFrame:
    """Scan-pruned phrase search over a written positional index: the
    phrase batch's terms (and their shards — a pure function of the term)
    are literal filters, so only |terms| row groups are touched at query
    time. Result-identical to phrase_search on the open DF."""
    from cer_for_mti_spark.functions.hashing import md5_60_py
    from cer_for_mti_spark.operators.index_build import resolve_num_shards

    num_shards = resolve_num_shards(index_path, num_shards)
    terms = set()
    for r in phrases.collect():
        terms.update(phrase_terms(r["query"], mode))
    if not terms:
        return phrases.sparkSession.createDataFrame([], PHRASE_HIT_SCHEMA)
    shards = sorted({md5_60_py(t) % num_shards for t in terms})
    df = base_df if base_df is not None else (
        spark.read.option("basePath", f"{index_path}/positional").parquet(
            f"{index_path}/positional"
        )
    )
    pruned = df.filter(
        F.col("shard").isin(shards) & F.col("term").isin(sorted(terms))
    )
    if max_posting_bytes == -1:
        hits = phrase_search(phrases, pruned, mode, slop=slop)
    else:
        hits = phrase_search(phrases, pruned, mode,
                             max_posting_bytes=max_posting_bytes, slop=slop)
    return _drop_tombstoned_hits(spark, index_path, hits, tombstones)


def phrase_terms(phrase: str, mode: str = "simple") -> list[str]:
    if mode == "simple":
        return [t for t in _JAVA_WS_RE.split(phrase) if t]
    from cer_for_mti_spark.functions.analyze import chem_tokenize_str

    return chem_tokenize_str(phrase)


_EMPTY_HITS = {
    "phrase_id": pd.Series([], dtype="int64"),
    "doc_id": pd.Series([], dtype="int64"),
    "n_matches": pd.Series([], dtype="int64"),
}


def _union_alternatives(parts: list) -> tuple:
    """Union the decoded postings of ALTERNATIVE terms for one phrase
    slot (Lucene MultiPhraseQuery semantics — a prefix-expanded slot
    matches ANY of its completions). A doc may contain several
    alternatives, so this is a true per-doc merge: occurrence positions
    from every alternative, sorted within each doc; tf = total
    occurrences. Distinct terms never share a position (one token per
    position), so the packed (doc, pos) keys the match cores build stay
    unique, and the slop core's searchsorted sees sorted keys."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        z = np.array([], dtype=np.int64)
        return z, z, z, z, z
    if len(parts) == 1:
        return parts[0]
    # decoded parts are contiguous CSR (starts = ends - tfs), so the
    # per-occurrence doc column is a straight repeat
    all_docs = np.concatenate([np.repeat(p[0], p[1]) for p in parts])
    all_pos = np.concatenate([p[4] for p in parts])
    order = np.lexsort((all_pos, all_docs))
    d, q = all_docs[order], all_pos[order]
    ids, tfs = np.unique(d, return_counts=True)
    tfs = tfs.astype(np.int64)
    ends = np.cumsum(tfs)
    return ids, tfs, ends - tfs, ends, q


def _match_adjacency(qid: int, need: int, decoded: dict) -> pd.DataFrame:
    """Adjacency core shared by the merged and sharded phrase paths.
    decoded: {term_idx: (ids, tfs, starts, ends, pos)} — one decoded
    posting per phrase position (already doc-sorted, unique doc ids)."""
    if len(decoded) < need:
        return pd.DataFrame(_EMPTY_HITS)
    # candidate docs = intersection of all doc lists
    docs_common = decoded[0][0]
    for i in range(1, need):
        docs_common = np.intersect1d(docs_common, decoded[i][0],
                                     assume_unique=True)
    if not len(docs_common):
        return pd.DataFrame(_EMPTY_HITS)
    # fully vectorized adjacency: pack (dense doc rank, shifted pos)
    # into one int64 key per occurrence and intersect the key sets
    # across the phrase's terms — no per-doc Python loop, so stop-word
    # phrases ("the the") cost O(sum posting sizes · log), not
    # O(candidate docs) Python iterations. pos < 2^31 and
    # rank < 2^30 keep the packing exact.
    SHIFT = np.int64(1) << 33
    OFFSET = np.int64(1) << 32
    live = None
    for i in range(need):
        ids, tfs, starts, ends, pos = decoded[i]
        sel = np.searchsorted(ids, docs_common)
        lens = ends[sel] - starts[sel]
        prefix = np.cumsum(lens) - lens
        take = np.arange(int(lens.sum())) + np.repeat(
            starts[sel] - prefix, lens
        )
        ranks = np.repeat(np.arange(len(docs_common), dtype=np.int64),
                          lens)
        keys = ranks * SHIFT + (pos[take] - i) + OFFSET
        live = keys if live is None else np.intersect1d(
            live, keys, assume_unique=True
        )
    hit_ranks, counts = np.unique(live // SHIFT, return_counts=True)
    return pd.DataFrame({
        "phrase_id": np.full(len(hit_ranks), qid, dtype=np.int64),
        "doc_id": docs_common[hit_ranks],
        "n_matches": counts.astype(np.int64),
    })


def _occurrence_keys(decoded_i, docs_common: np.ndarray,
                     shift: np.int64) -> tuple[np.ndarray, np.ndarray]:
    """All occurrences of one term restricted to docs_common, as sorted
    packed keys rank*shift + pos (rank = index into docs_common), plus
    the parallel rank array."""
    ids, tfs, starts, ends, pos = decoded_i
    sel = np.searchsorted(ids, docs_common)
    lens = ends[sel] - starts[sel]
    prefix = np.cumsum(lens) - lens
    take = np.arange(int(lens.sum())) + np.repeat(starts[sel] - prefix, lens)
    ranks = np.repeat(np.arange(len(docs_common), dtype=np.int64), lens)
    return ranks * shift + pos[take], ranks


def _match_slop(qid: int, need: int, decoded: dict,
                slop: int) -> pd.DataFrame:
    """Proximity (slop) core: an occurrence is an ordered position tuple
    p_0 < p_1 < ... < p_{need-1} (p_i a position of term i) with every
    term at most `slop` positions beyond its exact-adjacency slot:
    p_i <= p_0 + i + slop. slop=0 reduces exactly to adjacency.
    n_matches counts the distinct start positions p_0 that admit such a
    tuple.

    Fully vectorized greedy DP over the packed (doc rank, pos) keys:
    for each surviving start, keep the SMALLEST feasible p_i
    (searchsorted for the first occurrence after the current last); the
    upper bound is monotone in p_i, so the greedy choice is optimal and
    a start either survives every step or is dropped. No per-doc Python
    loop — same cost shape as the adjacency core."""
    if len(decoded) < need:
        return pd.DataFrame(_EMPTY_HITS)
    docs_common = decoded[0][0]
    for i in range(1, need):
        docs_common = np.intersect1d(docs_common, decoded[i][0],
                                     assume_unique=True)
    if not len(docs_common):
        return pd.DataFrame(_EMPTY_HITS)
    SHIFT = np.int64(1) << 33
    k0, _ = _occurrence_keys(decoded[0], docs_common, SHIFT)
    live_start = k0          # packed (rank, p_0) of surviving starts
    last = k0.copy()         # packed (rank, p_{i}) of the greedy chain
    for i in range(1, need):
        if not len(live_start):
            break
        ki, _ = _occurrence_keys(decoded[i], docs_common, SHIFT)
        idx = np.searchsorted(ki, last + 1)       # first occurrence > last
        ok = idx < len(ki)
        cand = ki[np.minimum(idx, len(ki) - 1)]
        # bound stays within the start's own rank: pos < 2^31 and
        # slop + need < 2^31 keep rank*SHIFT + p_0 + i + slop < (rank+1)*SHIFT
        ok &= cand <= live_start + np.int64(i + slop)
        live_start, last = live_start[ok], cand[ok]
    hit_ranks, counts = np.unique(live_start // SHIFT, return_counts=True)
    return pd.DataFrame({
        "phrase_id": np.full(len(hit_ranks), qid, dtype=np.int64),
        "doc_id": docs_common[hit_ranks],
        "n_matches": counts.astype(np.int64),
    })


def _phrase_want(phrases: DataFrame, mode: str):
    """phrases -> ((query_id, term_idx, term) rows, {qid: n_terms})."""
    pairs = []
    for r in phrases.collect():
        for i, t in enumerate(phrase_terms(r["query"], mode)):
            pairs.append((int(r["query_id"]), i, t))
    n_terms: dict[int, int] = {}
    for qid, i, _ in pairs:
        n_terms[qid] = max(n_terms.get(qid, 0), i + 1)
    return pairs, n_terms


DEFAULT_MAX_POSTING_BYTES = 256 << 20  # one task's posting-fetch budget


def phrase_search(phrases: DataFrame, positional: DataFrame,
                  mode: str = "simple",
                  max_posting_bytes: int | None = DEFAULT_MAX_POSTING_BYTES,
                  slop: int = 0, _want=None) -> DataFrame:
    """(phrase_id, phrase) x positional postings -> (phrase_id, doc_id,
    n_matches). Terms are broadcast-pruned; each phrase's postings are
    co-located with applyInPandas; adjacency is verified with numpy set
    intersections (positions of term i+1 shifted by -(i+1)).

    slop > 0 relaxes exact adjacency to ordered proximity: term i may
    sit up to `slop` positions beyond its exact slot
    (p_i <= p_0 + i + slop, positions strictly increasing) — the
    standard full-text NEAR/ordered-proximity operator. slop=0 is exact
    adjacency (the default, and the faster set-intersection core).

    Scale contract (ENFORCED, not just documented): groupBy(query_id)
    fetches ALL of a phrase's posting bytes into ONE task — fine while
    postings fit a task, but a stop-word phrase at 10^12 docs does not.
    When a phrase's fetched bytes exceed `max_posting_bytes` (default
    256 MiB — a task-memory budget), the task RAISES with a pointer to
    phrase_search_sharded, the bounded-task-bytes variant with identical
    results, instead of silently OOM-ing the executor. Pass None to
    disable the guard.

    `_want` (internal): a precomputed (pairs, n_terms) want-set — how
    phrase_prefix_search injects MULTIPLE alternative terms per slot."""
    remap = None
    if _want is None:
        from cer_for_mti_spark.operators.bm25 import dedup_query_batch

        phrases, remap = dedup_query_batch(phrases)
    pairs, n_terms = _want if _want is not None else _phrase_want(
        phrases, mode)
    if not pairs:
        return phrases.sparkSession.createDataFrame([], PHRASE_HIT_SCHEMA)
    spark = phrases.sparkSession
    want = spark.createDataFrame(pairs, "query_id int, term_idx int, term string")
    fetched = positional.join(F.broadcast(want), "term")

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        if max_posting_bytes is not None:
            total = int(
                pdf["doc_ids"].map(len).sum() + pdf["tfs"].map(len).sum()
                + pdf["positions"].map(len).sum()
            )
            if total > max_posting_bytes:
                raise RuntimeError(
                    f"phrase_search: phrase {qid} fetches {total} posting "
                    f"bytes into one task (> max_posting_bytes="
                    f"{max_posting_bytes}). Use phrase_search_sharded over "
                    "build_positional_runs — result-identical with bounded "
                    "per-task bytes — or raise/disable the guard."
                )
        # a term may appear at several indices in one phrase, and a
        # prefix-expanded slot carries several ALTERNATIVE terms at one
        # index — group per (idx, term), then union alternatives per idx
        by_idx: dict[int, dict[str, pd.Series]] = {}
        for j in range(len(pdf)):
            row = pdf.iloc[j]
            by_idx.setdefault(int(row["term_idx"]), {}).setdefault(
                str(row["term"]), row)
        decoded = {
            i: _union_alternatives(
                [_decode_positional(r) for _, r in sorted(alts.items())])
            for i, alts in by_idx.items()
        }
        if slop:
            return _match_slop(qid, n_terms[qid], decoded, slop)
        return _match_adjacency(qid, n_terms[qid], decoded)

    hits = fetched.groupBy("query_id").applyInPandas(match, PHRASE_HIT_SCHEMA)
    if remap is None:
        return hits
    from cer_for_mti_spark.operators.bm25 import fanout_query_results

    return fanout_query_results(hits, remap, id_col="phrase_id")


def build_positional_runs(docs: DataFrame, mode: str = "simple",
                          text_col: str = "text",
                          n_docs: int | None = None,
                          salt: int | None = None,
                          max_postings_in_memory: int = 20_000_000,
                          ) -> DataFrame:
    """Single-pass SPIMI positional build that keeps runs keyed by
    doc-id RANGE bucket instead of merging per term — the storage shape
    for bounded-task-bytes phrase search (phrase_search_sharded).

    The bucket contract is the one build_posting_runs establishes
    (index_build.py:370): bucket = doc_id // width with width a pure
    function of (n_docs, salt), so the bucket is CONSISTENT ACROSS TERMS
    — every positional posting of doc d, whatever the term, lands in
    bucket d // width. Positions are doc-local (token offsets within the
    doc), so bucket-local adjacency intersection is EXACT: a phrase hit
    in doc d is computable entirely inside d's bucket.

    A (term, bucket) pair may carry several runs (one per input split
    that contributed docs to the bucket); the sharded matcher merges the
    decoded arrays per term — no pre-merge shuffle of the whole index is
    needed, only query terms are ever decoded."""
    from cer_for_mti_spark.operators.index_build import salt_for

    if n_docs is None:
        n_docs = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    if salt is None:
        salt = salt_for(n_docs)
    width = max(1, (int(n_docs) + salt - 1) // salt)

    part = _make_positional_partition(mode, text_col,
                                      max_postings_in_memory, width=width)
    return docs.select("doc_id", text_col).mapInPandas(
        part, POSITIONAL_RUN_BUCKET_SCHEMA
    )


def _decode_rows_merged(rows: list) -> tuple:
    """Decode + merge several positional run rows of ONE term (one
    bucket's runs from different input splits). Doc ids are unique
    across runs (a doc's text is one input row), so a stable doc-sort
    of the concatenated groups is a full merge."""
    parts = [_decode_positional(r) for r in rows]
    if len(parts) == 1:
        return parts[0]
    ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    slices = []
    for _, _, starts, ends, pos in parts:
        slices.extend(pos[s:e] for s, e in zip(starts, ends))
    order = np.argsort(ids, kind="stable")
    ids, tfs = ids[order], tfs[order]
    pos = np.concatenate([slices[g] for g in order]) if len(order) else \
        np.array([], dtype=np.int64)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    return ids, tfs, starts, ends, pos


def phrase_search_sharded(phrases: DataFrame, pos_runs: DataFrame,
                          mode: str = "simple", slop: int = 0,
                          _want=None) -> DataFrame:
    """Doc-range-sharded phrase search — result-identical to
    phrase_search, with BOUNDED per-task bytes.

    phrase_search groups on query_id alone, so a stop-word phrase
    ("the the") fetches both full positional postings into ONE task —
    at 10^12 docs that is tens of GB, the same single-task OOM shape
    bm25_wand_sharded fixed for BM25 scoring. Here the input is the
    run-level relation from build_positional_runs: grouping on
    (query_id, bucket) fetches only one doc-range slice of each posting
    per task. Positions are doc-local and every posting of doc d lives
    in d's bucket, so bucket-local adjacency is exact and the final
    result is the plain UNION of per-bucket hits (hits are per
    (phrase, doc); docs never span buckets) — no merge step at all.

    `_want` (internal): a precomputed (pairs, n_terms) want-set — how
    phrase_prefix_search_sharded injects alternative terms per slot."""
    remap = None
    if _want is None:
        from cer_for_mti_spark.operators.bm25 import dedup_query_batch

        phrases, remap = dedup_query_batch(phrases)
    pairs, n_terms = _want if _want is not None else _phrase_want(
        phrases, mode)
    if not pairs:
        return phrases.sparkSession.createDataFrame([], PHRASE_HIT_SCHEMA)
    spark = phrases.sparkSession
    want = spark.createDataFrame(pairs, "query_id int, term_idx int, term string")
    fetched = pos_runs.join(F.broadcast(want), "term")

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        # per (idx, term): several RUNS of one term merge doc-disjointly;
        # per idx: several alternative TERMS (prefix expansion) union
        by_idx: dict[int, dict[str, list]] = {}
        for j in range(len(pdf)):
            row = pdf.iloc[j]
            by_idx.setdefault(int(row["term_idx"]), {}).setdefault(
                str(row["term"]), []).append(row)
        decoded = {
            i: _union_alternatives(
                [_decode_rows_merged(rs) for _, rs in sorted(alts.items())])
            for i, alts in by_idx.items()
        }
        if slop:
            # positions are doc-local and a doc never spans buckets, so
            # bucket-local proximity is exact — same union argument as
            # adjacency
            return _match_slop(qid, n_terms[qid], decoded, slop)
        return _match_adjacency(qid, n_terms[qid], decoded)

    hits = fetched.groupBy("query_id", "bucket").applyInPandas(
        match, PHRASE_HIT_SCHEMA
    )
    if remap is None:
        return hits
    from cer_for_mti_spark.operators.bm25 import fanout_query_results

    return fanout_query_results(hits, remap, id_col="phrase_id")


def write_positional_runs_index(pos_runs: DataFrame, path: str,
                                num_shards: int = 32,
                                docs: DataFrame | None = None,
                                commit_mode: str = "rename") -> None:
    """Persist the RUN-level positional index hash-sharded on term (same
    layout contract as index_build.write_runs_index): shard dirs prune at
    planning time, term predicates push into row groups, and the bucket
    column survives as data so phrase matching groups on
    (query_id, bucket) with bounded task bytes.

    Pass `docs` (any DataFrame with the indexed doc_id column) to also
    write the ``<path>/docs`` doc-id sidecar —
    index_build.append_positional_runs_index REQUIRES it to enforce
    doc_id disjointness (a re-ingested doc would silently double-count
    phrase n_matches). Omitting it produces a query-only index that
    refuses appends.

    commit_mode="manifest" makes the index object-store-safe exactly
    like index_build.write_runs_index: base manifests are written for
    every relation, subsequent appends/deletes commit by copy +
    manifest (the shared _commit_append_units auto-detects the mode),
    and readers list files from the committed manifests only."""
    from cer_for_mti_spark.functions.hashing import md5_60
    from cer_for_mti_spark.operators.index_build import (
        _list_data_files,
        _manifest_write,
        write_shards_meta,
    )

    sharded = pos_runs.withColumn(
        "shard", F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int")
    ).repartition(num_shards, "shard")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/positional_runs"
    )
    if docs is not None:
        docs.select("doc_id").distinct().write.mode("overwrite").parquet(
            f"{path}/docs"
        )
    write_shards_meta(path, num_shards)
    if commit_mode == "manifest":
        _manifest_write(path, "base-positional_runs",
                        _list_data_files(path, "positional_runs"))
        if docs is not None:
            _manifest_write(path, "base-docs",
                            _list_data_files(path, "docs"))
    elif commit_mode != "rename":
        raise ValueError(f"unknown commit_mode {commit_mode!r}")


def _drop_tombstoned_hits(spark, index_path: str, hits: DataFrame,
                          tombstones) -> DataFrame:
    """Anti-join phrase hits against the index's delete sidecar. Phrase
    search has no top-k cut, so dropping tombstoned docs from the OUTPUT
    is exactly the decode-time mask the BM25 scorers need — one
    broadcastable anti-join, per-doc and therefore bucket-exact."""
    if isinstance(tombstones, str) and tombstones == "auto":
        from cer_for_mti_spark.operators.index_build import read_tombstones

        tomb = read_tombstones(spark, index_path)
    elif tombstones is None:
        return hits
    else:
        tomb = tombstones
    return hits.join(F.broadcast(tomb.select("doc_id")), "doc_id",
                     "left_anti").select(*hits.columns)


def phrase_search_sharded_from_index(spark, index_path: str,
                                     phrases: DataFrame,
                                     mode: str = "simple",
                                     num_shards: int | None = None,
                                     base_df: DataFrame | None = None,
                                     slop: int = 0,
                                     tombstones="auto") -> DataFrame:
    """Scan-pruned sharded phrase search over a written positional-runs
    index: shard + term literal filters (PartitionFilters + PushedFilters),
    then per-(phrase, bucket) matching — the full 10^12-doc phrase shape:
    touch |terms| row groups, fetch one bucket slice per task."""
    from cer_for_mti_spark.functions.hashing import md5_60_py
    from cer_for_mti_spark.operators.index_build import resolve_num_shards

    num_shards = resolve_num_shards(index_path, num_shards)
    terms = set()
    for r in phrases.collect():
        terms.update(phrase_terms(r["query"], mode))
    if not terms:
        return phrases.sparkSession.createDataFrame([], PHRASE_HIT_SCHEMA)
    shards = sorted({md5_60_py(t) % num_shards for t in terms})
    if base_df is None:
        from cer_for_mti_spark.operators.index_build import (
            read_index_rel,
            repair_interrupted_compaction,
        )

        repair_interrupted_compaction(index_path, "positional_runs")
    df = base_df if base_df is not None else read_index_rel(
        spark, index_path, "positional_runs", with_base_path=True
    )
    pruned = df.filter(
        F.col("shard").isin(shards) & F.col("term").isin(sorted(terms))
    )
    hits = phrase_search_sharded(phrases, pruned, mode, slop=slop)
    return _drop_tombstoned_hits(spark, index_path, hits, tombstones)


# --- phrase prefix (MultiPhraseQuery) -----------------------------------

PHRASE_PREFIX_MAX_EXPANSIONS = 50


def _split_prefix_tokens(query: str) -> list[tuple[str, bool]]:
    """Whitespace tokens of a phrase query as (token, is_glob): a token
    containing '*' (any run) or '?' (one char) ANYWHERE is a glob slot —
    trailing-'*' prefix stems are the common case, but leading/infix
    wildcards work too (same pattern language as
    query_expand.expand_wildcard). A glob with no literal characters is
    refused: a match-any slot admits the whole vocabulary at that
    position, which is a proximity query in disguise, not a phrase."""
    out = []
    for tok in _JAVA_WS_RE.split(query):
        if not tok:
            continue
        if "*" in tok or "?" in tok:
            if not tok.replace("*", "").replace("?", ""):
                raise ValueError(
                    f"phrase glob slot {tok!r} has no literal "
                    "characters — refusing the match-any slot")
            out.append((tok, True))
        else:
            out.append((tok, False))
    return out


def expand_phrase_want(phrases: DataFrame, terms_df: DataFrame,
                       max_expansions: int = PHRASE_PREFIX_MAX_EXPANSIONS):
    """(pairs, n_terms) want-set for a phrase batch whose tokens may
    carry '*'/'?' glob markers — the Lucene MultiPhraseQuery rewrite:
    each glob slot expands to its first `max_expansions` dictionary
    completions in TERM ORDER (the order an FST/sorted-dictionary
    enumeration yields them — deterministic and mirrored by the
    `ORDER BY term LIMIT k` oracle; positional postings carry no
    per-term df to rank by without decoding, so term order is also the
    only cap the dictionary can serve as a pure range seek).

    terms_df: any relation with a `term` column — the positional
    postings/runs themselves (their term column IS the dictionary) or
    the BM25 index's sorted term_dict sidecar. Each glob's literal
    PREFIX is a driver-side literal, so when every glob has one the
    probe is a pushed OR of StringStartsWith filters (file/row-group
    min-max pruning on a term-sorted layout — a range seek); the
    residual glob verifies by anchored regex on the pruned slice. A
    leading-wildcard slot has no seek prefix and falls back to the
    full (vocabulary-sized) enumeration — positional layouts carry no
    reversed sidecar, and MultiPhrase expansion is already
    vocabulary-bounded, so this is allowed rather than refused.

    A glob with no completion leaves its slot EMPTY: the phrase then
    matches nothing (a slot that can't be filled admits no tuple) while
    other phrases in the batch proceed. Only mode='simple' tokens carry
    markers — the chem analyzer may split a stem into several terms,
    which has no single-slot meaning."""
    from pyspark.sql import Window

    from cer_for_mti_spark.operators.query_expand import (
        _wildcard_literal_prefix,
        _wildcard_regex,
    )

    rows = phrases.collect()
    globs = sorted({
        g for r in rows for g, isg in _split_prefix_tokens(r["query"]) if isg
    })
    exp: dict[str, list[str]] = {g: [] for g in globs}
    if globs:
        spark = phrases.sparkSession
        gdf = spark.createDataFrame(
            [(g, _wildcard_regex(g)) for g in globs], "glob string, rx string")
        w = Window.partitionBy("glob").orderBy(F.asc("term"))
        base = terms_df.select("term")
        seeks = [_wildcard_literal_prefix(g) for g in globs]
        if all(seeks):
            base = base.filter(reduce(
                or_, [F.col("term").startswith(F.lit(s)) for s in seeks]))
        hit = (
            base.distinct()
            .join(F.broadcast(gdf), F.expr("rlike(term, rx)"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(max_expansions))
            .select("glob", "term")
        )
        for r in hit.collect():
            exp[r["glob"]].append(r["term"])
    pairs, n_terms = [], {}
    for r in rows:
        qid = int(r["query_id"])
        toks = _split_prefix_tokens(r["query"])
        n_terms[qid] = max(n_terms.get(qid, 0), len(toks))
        for i, (tok, isp) in enumerate(toks):
            for t in (sorted(exp[tok]) if isp else [tok]):
                pairs.append((qid, i, t))
    return pairs, n_terms


def _prefix_hits(phrases: DataFrame, want, search) -> DataFrame:
    pairs, n_terms = want
    spark = phrases.sparkSession
    if not pairs:
        return spark.createDataFrame([], PHRASE_HIT_SCHEMA)
    return search(pairs, n_terms)


def phrase_prefix_search(phrases: DataFrame, positional: DataFrame,
                         terms_df: DataFrame | None = None,
                         max_expansions: int = PHRASE_PREFIX_MAX_EXPANSIONS,
                         max_posting_bytes: int | None =
                         DEFAULT_MAX_POSTING_BYTES,
                         slop: int = 0) -> DataFrame:
    """Phrase search with trailing-'*' prefix slots over the merged
    positional postings ("new yor*"): each prefix slot matches ANY of
    its capped dictionary completions at that position
    (MultiPhraseQuery). Non-prefix phrases in the batch behave exactly
    like phrase_search. terms_df defaults to the positional relation
    itself (its term column is the dictionary)."""
    from cer_for_mti_spark.operators.bm25 import (
        dedup_query_batch,
        fanout_query_results,
    )

    phrases, remap = dedup_query_batch(phrases)
    want = expand_phrase_want(
        phrases, positional if terms_df is None else terms_df,
        max_expansions)
    hits = _prefix_hits(
        phrases, want,
        lambda pairs, n_terms: phrase_search(
            phrases, positional, "simple",
            max_posting_bytes=max_posting_bytes, slop=slop,
            _want=(pairs, n_terms)))
    return fanout_query_results(hits, remap, id_col="phrase_id")


def phrase_prefix_search_sharded(phrases: DataFrame, pos_runs: DataFrame,
                                 terms_df: DataFrame | None = None,
                                 max_expansions: int =
                                 PHRASE_PREFIX_MAX_EXPANSIONS,
                                 slop: int = 0) -> DataFrame:
    """Doc-range-sharded twin of phrase_prefix_search — identical hits,
    bounded per-task bytes (a hot stem like 'th*' expands into stop-word
    completions whose postings must never co-locate in one task)."""
    from cer_for_mti_spark.operators.bm25 import (
        dedup_query_batch,
        fanout_query_results,
    )

    phrases, remap = dedup_query_batch(phrases)
    want = expand_phrase_want(
        phrases, pos_runs if terms_df is None else terms_df, max_expansions)
    hits = _prefix_hits(
        phrases, want,
        lambda pairs, n_terms: phrase_search_sharded(
            phrases, pos_runs, "simple", slop=slop,
            _want=(pairs, n_terms)))
    return fanout_query_results(hits, remap, id_col="phrase_id")


def phrase_prefix_search_sharded_from_index(
        spark, index_path: str, phrases: DataFrame,
        num_shards: int | None = None,
        max_expansions: int = PHRASE_PREFIX_MAX_EXPANSIONS, slop: int = 0,
        tombstones="auto") -> DataFrame:
    """The 10^12-doc phrase-prefix shape over a written positional-runs
    index: the stem probes push StartsWith into the dictionary scan
    (term column of the runs relation), then the EXPANDED term set and
    its shards (a pure function of each term) prune the posting fetch
    exactly like phrase_search_sharded_from_index — touch |expanded
    terms| row groups, one bucket slice per task."""
    from cer_for_mti_spark.operators.index_build import (
        read_index_rel,
        repair_interrupted_compaction,
        resolve_num_shards,
    )
    from cer_for_mti_spark.functions.hashing import md5_60_py

    num_shards = resolve_num_shards(index_path, num_shards)
    repair_interrupted_compaction(index_path, "positional_runs")
    rel = read_index_rel(spark, index_path, "positional_runs",
                         with_base_path=True)
    want = expand_phrase_want(phrases, rel, max_expansions)
    pairs, n_terms = want
    if not pairs:
        return spark.createDataFrame([], PHRASE_HIT_SCHEMA)
    terms = sorted({t for _, _, t in pairs})
    shards = sorted({md5_60_py(t) % num_shards for t in terms})
    pruned = rel.filter(
        F.col("shard").isin(shards) & F.col("term").isin(terms))
    hits = phrase_search_sharded(phrases, pruned, "simple", slop=slop,
                                 _want=want)
    return _drop_tombstoned_hits(spark, index_path, hits, tombstones)


def compact_positional_runs(spark, index_path: str,
                            num_shards: int | None = None,
                            purge_tombstones: bool = True,
                            tombstone_broadcast_max: int | None = None
                            ) -> tuple[int, int]:
    """Re-merge a positional runs index to EXACTLY ONE run per
    (term, bucket).

    Merge-free appends (index_build.append_positional_runs_index)
    accumulate one run per (term, bucket, ingest batch); correctness is
    unaffected (the sharded matcher merges runs at decode time) but
    after many ingests query-time decode touches many tiny runs and the
    parquet row count grows linearly with batches. Compaction is pure
    byte-level per group — decode, stable doc-sort, re-encode; no corpus
    statistics are involved, so phrase results are BYTE-IDENTICAL
    before/after (tested). The docs sidecar and append lineage are left
    untouched: compaction changes layout, not membership.

    The rewrite goes through a staging dir and two directory renames;
    a crash in the short window between them is detected and rolled
    forward by repair_interrupted_compaction (called here and by every
    reader) — run compaction offline, like the merged index's
    compact_index.

    Tombstone sets up to tombstone_broadcast_max (default
    index_build.TOMBSTONE_MAX_IDS) ride a driver broadcast; larger sets
    switch to the distributed purge plan (tombstones_by_bucket): ids
    range-join to their doc-range bucket and reach each merge task as
    that bucket's sorted array column — arbitrarily large delete sets
    purge with no full-set broadcast. Both plans are byte-identical
    (tested). Returns (runs_before, runs_after)."""
    from cer_for_mti_spark.functions.hashing import md5_60
    from cer_for_mti_spark.operators.index_build import (
        repair_interrupted_compaction,
        resolve_num_shards,
    )

    num_shards = resolve_num_shards(index_path, num_shards)
    repair_interrupted_compaction(index_path, "positional_runs")
    repair_interrupted_compaction(index_path, "docs")
    from cer_for_mti_spark.operators.index_build import (
        _purge_membership_sidecar,
        isin_sorted,
        load_tombstones,
    )

    from cer_for_mti_spark.operators.index_build import (
        TOMBSTONE_MAX_IDS,
        read_index_rel,
        read_tombstones,
        tombstones_by_bucket,
    )

    if tombstone_broadcast_max is None:
        tombstone_broadcast_max = TOMBSTONE_MAX_IDS
    from cer_for_mti_spark.operators.index_build import _find_inflight_batch

    inflight = _find_inflight_batch(index_path)
    if inflight is not None:
        # same guard as vacuum/compact_runs_index: folding a crashed
        # append's committed units into a new base lets the later resume
        # double-commit the batch (duplicated postings in manifest mode)
        raise ValueError(
            f"compact_positional_runs: append batch {inflight!r} at "
            f"{index_path} is staged but not fully committed; resume it "
            "first (append_positional_runs_index with batch_id=None "
            "completes it)."
        )
    # manifest-aware: compact only what the manifests commit
    runs = read_index_rel(spark, index_path, "positional_runs",
                          with_base_path=True)
    n_tomb = (read_tombstones(spark, index_path).count()
              if purge_tombstones else 0)
    tomb_bc = None
    tomb_bkt = None
    if n_tomb and n_tomb <= tombstone_broadcast_max:
        tomb_bc = spark.sparkContext.broadcast(
            load_tombstones(spark, index_path))
    elif n_tomb:
        # distributed purge plan — same shape as the BM25 compactor's:
        # ids range-join to their doc-range bucket, each merge task sees
        # only its bucket's sorted array (no full-set broadcast)
        tomb_bkt = tombstones_by_bucket(spark, index_path, runs)
    n_before = runs.count()

    @F.pandas_udf("first_id long, last_id long, df long, doc_ids binary, "
                  "tfs binary, positions binary")
    def merge(runs_s: pd.Series, tomb_s: pd.Series) -> pd.DataFrame:
        out = {"first_id": [], "last_id": [], "df": [], "doc_ids": [],
               "tfs": [], "positions": []}
        for rows, tomb_ids in zip(runs_s, tomb_s):
            if tomb_bc is not None:
                tomb_a = tomb_bc.value
            elif tomb_ids is not None and len(tomb_ids):
                tomb_a = np.asarray(list(tomb_ids), dtype=np.int64)
            else:
                tomb_a = None
            ids, tfs, starts, ends, pos = _decode_rows_merged(list(rows))
            if tomb_a is not None and len(ids):
                # physical purge: drop tombstoned docs' position groups
                keep = ~isin_sorted(ids, tomb_a)
                if not keep.all():
                    kept_idx = np.flatnonzero(keep)
                    pos = (np.concatenate([pos[starts[i]:ends[i]]
                                           for i in kept_idx])
                           if len(kept_idx) else
                           np.array([], dtype=np.int64))
                    ids, tfs = ids[keep], tfs[keep]
            if not len(ids):
                # fully-tombstoned posting: df=0 row, dropped by the
                # caller's filter
                out["first_id"].append(0)
                out["last_id"].append(0)
                out["df"].append(0)
                out["doc_ids"].append(b"")
                out["tfs"].append(b"")
                out["positions"].append(b"")
                continue
            d, t, p = _encode_positional(ids, tfs, pos)
            out["first_id"].append(int(ids[0]))
            out["last_id"].append(int(ids[-1]))
            out["df"].append(int(len(ids)))
            out["doc_ids"].append(d)
            out["tfs"].append(t)
            out["positions"].append(p)
        return _object_df(out)

    agg = runs.groupBy("term", "bucket").agg(
        F.collect_list(F.struct(
            "first_id", "last_id", "df", "doc_ids", "tfs", "positions"
        )).alias("runs")
    )
    if tomb_bkt is not None:
        agg = agg.join(tomb_bkt, "bucket", "left")
    else:
        agg = agg.withColumn("tomb_ids",
                             F.lit(None).cast("array<long>"))
    merged = agg.select(
        "term", "bucket", merge("runs", "tomb_ids").alias("p")).select(
        "term", "bucket", "p.first_id", "p.last_id", "p.df",
        "p.doc_ids", "p.tfs", "p.positions"
    ).filter(F.col("df") > 0)
    staging = f"{index_path}/.compact_staging"
    shutil.rmtree(staging, ignore_errors=True)
    sharded = merged.withColumn(
        "shard", F.pmod(md5_60(F.col("term")), F.lit(num_shards)).cast("int")
    ).repartition(num_shards, "shard")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{staging}/positional_runs"
    )
    n_after = spark.read.parquet(f"{staging}/positional_runs").count()
    final = f"{index_path}/positional_runs"
    trash = f"{index_path}/.positional_runs_old"
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(final, trash)
    os.rename(f"{staging}/positional_runs", final)
    shutil.rmtree(trash)
    shutil.rmtree(staging, ignore_errors=True)
    if n_tomb:
        if os.path.isdir(f"{index_path}/docs"):
            _purge_membership_sidecar(spark, index_path, "docs")
        else:  # query-only index (no docs sidecar): just clear the marks
            shutil.rmtree(f"{index_path}/tombstones", ignore_errors=True)
    from cer_for_mti_spark.operators.index_build import (
        MANIFEST_DIR,
        _index_commit_mode,
        _list_data_files,
        _manifest_write,
    )

    if _index_commit_mode(index_path) == "manifest":
        # offline rename-based maintenance on a manifest-mode index:
        # regenerate the manifests to point at the compacted files
        shutil.rmtree(f"{index_path}/{MANIFEST_DIR}", ignore_errors=True)
        _manifest_write(index_path, "base-positional_runs",
                        _list_data_files(index_path, "positional_runs"))
        if os.path.isdir(f"{index_path}/docs"):
            _manifest_write(index_path, "base-docs",
                            _list_data_files(index_path, "docs"))
        if os.path.isdir(f"{index_path}/tombstones"):
            _manifest_write(index_path, "base-tombstones",
                            _list_data_files(index_path, "tombstones"))
    return int(n_before), int(n_after)


def kwic_snippets(docs: DataFrame, phrase: str, width: int = 3,
                  text_col: str = "text",
                  hits: DataFrame | None = None) -> DataFrame:
    """Keyword-in-context result presentation: every exact-adjacency
    occurrence of `phrase` with up to `width` tokens of context either
    side -> (doc_id, pos, snippet), pos = 0-based token offset of the
    match start.

    Pure codegen column expressions (split / sequence / slice / filter)
    — a narrow per-doc pass, NO shuffle, no Python. At 100 TB you run it
    only over the docs a phrase_search already found: pass its hit
    relation via `hits` and the scan is semi-joined down to result pages
    before any tokenization happens. Whitespace tokenization only (the
    display op should show the user the raw token stream; the analyzer
    modes exist for INDEXING, not presentation)."""
    terms = phrase_terms(phrase, "simple")
    n = len(terms)
    spark = docs.sparkSession
    if not n:
        return spark.createDataFrame([], "doc_id long, pos int, snippet string")
    if hits is not None:
        docs = docs.join(hits.select("doc_id").distinct(), "doc_id",
                         "left_semi")
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("_t")).filter(
        F.size("_t") >= n
    )
    phrase_arr = F.array(*[F.lit(t) for t in terms])
    starts = F.filter(
        F.sequence(F.lit(0), F.size("_t") - n),
        lambda i: F.slice("_t", i + F.lit(1), n) == phrase_arr,
    )
    exploded = base.select("doc_id", "_t", F.explode(starts).alias("pos"))
    start = F.greatest(F.lit(0), F.col("pos") - width)
    end = F.least(F.size("_t"), F.col("pos") + n + width)
    return exploded.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(F.slice("_t", start + 1, end - start), " ").alias(
            "snippet"
        ),
    )
