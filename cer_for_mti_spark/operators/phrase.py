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

import re
from collections import defaultdict

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
POSITIONAL_SCHEMA = (
    "term string, df long, doc_ids binary, tfs binary, positions binary"
)
PHRASE_HIT_SCHEMA = "phrase_id int, doc_id long, n_matches int"


def build_positional_postings(docs: DataFrame, mode: str = "simple",
                              text_col: str = "text",
                              max_postings_in_memory: int = 20_000_000,
                              ) -> DataFrame:
    """Single-pass SPIMI positional build: one mapInPandas pass emits
    compressed positional runs; groupBy(term) merges by byte concat."""
    if mode == "simple":
        def toks(s: str) -> list[str]:
            return [t for t in _JAVA_WS_RE.split(s) if t] if s else []
    elif mode in ("chem", "chem+greek"):
        from cer_for_mti_spark.functions.analyze import chem_tokenize_str

        def toks(s: str) -> list[str]:
            return chem_tokenize_str(s) if s else []
    else:
        raise ValueError(f"unknown tokenize mode {mode!r}")

    def part(batches):
        acc: dict[str, list] = defaultdict(list)  # term -> [(doc, [pos..])]
        n_post = 0

        def flush():
            out = {
                "term": [], "first_id": [], "last_id": [], "df": [],
                "doc_ids": [], "tfs": [], "positions": [],
            }
            for term, entries in acc.items():
                entries.sort(key=lambda e: e[0])
                ids = np.asarray([e[0] for e in entries], dtype=np.int64)
                tfs = np.asarray([len(e[1]) for e in entries], dtype=np.uint64)
                pos_stream = np.concatenate(
                    [np.asarray(e[1], dtype=np.int64) for e in entries]
                )
                # per-doc position deltas: first position absolute
                gaps = pos_stream.copy()
                start = 0
                for n_p in tfs:
                    n_p = int(n_p)
                    gaps[start + 1:start + n_p] = (
                        pos_stream[start + 1:start + n_p]
                        - pos_stream[start:start + n_p - 1]
                    )
                    start += n_p
                out["term"].append(term)
                out["first_id"].append(int(ids[0]))
                out["last_id"].append(int(ids[-1]))
                out["df"].append(len(ids))
                out["doc_ids"].append(delta_encode(ids))
                out["tfs"].append(varint_encode(tfs))
                out["positions"].append(
                    varint_encode(gaps.astype(np.uint64))
                )
            acc.clear()
            return _object_df(out)

        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                per_term: dict[str, list[int]] = defaultdict(list)
                for i, t in enumerate(toks(text)):
                    per_term[t].append(i)
                for t, ps in per_term.items():
                    acc[t].append((int(doc_id), ps))
                n_post += len(per_term)
                if n_post >= max_postings_in_memory:
                    yield flush()
                    n_post = 0
        yield flush()

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
    # re-delta per doc group: group starts absolute, rest in-group deltas
    gaps = pos.copy()
    if len(pos) > 1:
        gaps[1:] = pos[1:] - pos[:-1]
    starts = np.cumsum(tfs) - tfs
    gaps[starts] = pos[starts]
    return (
        int(len(ids)),
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


def phrase_search_from_index(spark, index_path: str, phrases: DataFrame,
                             mode: str = "simple", num_shards: int = 32,
                             base_df: DataFrame | None = None) -> DataFrame:
    """Scan-pruned phrase search over a written positional index: the
    phrase batch's terms (and their shards — a pure function of the term)
    are literal filters, so only |terms| row groups are touched at query
    time. Result-identical to phrase_search on the open DF."""
    from cer_for_mti_spark.functions.hashing import md5_60_py

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
    return phrase_search(phrases, pruned, mode)


def phrase_terms(phrase: str, mode: str = "simple") -> list[str]:
    if mode == "simple":
        return [t for t in _JAVA_WS_RE.split(phrase) if t]
    from cer_for_mti_spark.functions.analyze import chem_tokenize_str

    return chem_tokenize_str(phrase)


def phrase_search(phrases: DataFrame, positional: DataFrame,
                  mode: str = "simple") -> DataFrame:
    """(phrase_id, phrase) x positional postings -> (phrase_id, doc_id,
    n_matches). Terms are broadcast-pruned; each phrase's postings are
    co-located with applyInPandas; adjacency is verified with numpy set
    intersections (positions of term i+1 shifted by -(i+1))."""
    rows = phrases.collect()
    pairs = []
    for r in rows:
        for i, t in enumerate(phrase_terms(r["query"], mode)):
            pairs.append((int(r["query_id"]), i, t))
    if not pairs:
        return phrases.sparkSession.createDataFrame([], PHRASE_HIT_SCHEMA)
    spark = phrases.sparkSession
    want = spark.createDataFrame(pairs, "query_id int, term_idx int, term string")
    n_terms = {qid: 0 for qid, _, _ in pairs}
    for qid, i, _ in pairs:
        n_terms[qid] = max(n_terms[qid], i + 1)
    fetched = positional.join(F.broadcast(want), "term")

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        need = n_terms[qid]
        # a term may appear at several indices in one phrase
        by_idx: dict[int, pd.Series] = {}
        for j in range(len(pdf)):
            row = pdf.iloc[j]
            by_idx.setdefault(int(row["term_idx"]), row)
        if len(by_idx) < need:
            return pd.DataFrame({"phrase_id": [], "doc_id": [],
                                 "n_matches": []}).astype(
                {"phrase_id": "int64", "doc_id": "int64",
                 "n_matches": "int64"})
        decoded = {i: _decode_positional(r) for i, r in by_idx.items()}
        # candidate docs = intersection of all doc lists
        docs_common = decoded[0][0]
        for i in range(1, need):
            docs_common = np.intersect1d(docs_common, decoded[i][0],
                                         assume_unique=True)
        if not len(docs_common):
            return pd.DataFrame({
                "phrase_id": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "n_matches": pd.Series([], dtype="int64"),
            })
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

    return fetched.groupBy("query_id").applyInPandas(match, PHRASE_HIT_SCHEMA)
