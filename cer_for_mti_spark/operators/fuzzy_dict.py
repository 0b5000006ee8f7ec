"""SymSpell-style delete-neighborhood dictionary — fuzzy term expansion
at TRUE vocabulary scale.

The brute-force fuzzy expansion (query_expand.expand_fuzzy) theta-joins
every pattern against the dictionary with a shared-prefix + length-band
predicate and runs Levenshtein on what survives. At a webtext vocabulary
(10^8+ terms under Heaps' law) even a prefix_len=1 guard leaves millions
of candidate distance computations per pattern, and prefix_len=0 (edits
allowed in the first character — Lucene FuzzyQuery's prefixLength=0
default) degenerates to a full-vocabulary scan per batch.

This module trades that scan for an EQUI-JOIN, the classic symmetric-
delete (SymSpell) construction from the public spell-correction
literature: two strings are within Levenshtein distance d only if
deleting at most d characters from each can produce a COMMON string
(take an optimal alignment; drop each side's substituted/inserted
characters — at most d per side — and the aligned common subsequence
remains). So:

- index side: every dictionary term is exploded into its
  <= max_dist-delete variants (term itself included) and persisted as a
  `fuzzy_dict/` sidecar of the BM25 runs index, range-partitioned and
  sorted by variant — vocabulary x (avg_len+1) rows at d=1, still
  dictionary-scale, never postings-scale;
- query side: the pattern's own delete variants (a handful, generated
  driver-side) probe the sidecar with an IN predicate that pushes into
  the parquet scan; sorted disjoint variant ranges turn the probe into
  file- and row-group-level range seeks;
- verification: candidates are a guaranteed SUPERSET of the true
  distance-<= d matches, so one exact F.levenshtein over the (tiny)
  candidate set — never the vocabulary — makes the expansion exact.

Lifecycle: the sidecar follows the index's own protocol. Appends stage a
delta holding the batch terms' variants with BATCH-LOCAL df (readers sum
per (variant, term) across batches: a term's variant set is a
deterministic function of the term, so every batch containing the term
carries the same variants and the per-variant sum equals the global df).
Compaction regenerates one sorted base (purged docs' df drops land
here). Manifest-mode indexes commit it by copy + manifest like every
other relation, and vacuum_index covers it through the same manifests.

Reference anchor: the reference engine's retrieval surface is exact
term lookup (run_tool_evaluation.py); fuzzy retrieval is an engine
addition from the public Lucene feature set, with the delete-index
construction from the public SymSpell algorithm, re-expressed as
DataFrame explode + equi-join.
"""
from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUZZY_DICT_RANGE_PARTITIONS = 32
FUZZY_DICT_META_FILE = "fuzzy_dict_meta.json"
MAX_SUPPORTED_DIST = 2  # delete-variant count is O(len^d); 2 is Lucene's cap too


def delete_variants_py(s: str, max_dist: int) -> set[str]:
    """All strings reachable from `s` by at most `max_dist` single-
    character deletions, `s` itself included — the driver-side twin of
    `_variants_expr` (property-tested equal)."""
    out = {s}
    frontier = {s}
    for _ in range(int(max_dist)):
        nxt = set()
        for u in frontier:
            for i in range(len(u)):
                nxt.add(u[:i] + u[i + 1:])
        frontier = nxt - out
        out |= nxt
    return out


def _one_delete_set(col_expr: str) -> str:
    """SQL array expr: the string itself plus every single-char deletion."""
    return (
        f"array_union(array({col_expr}), "
        f"transform(sequence(1, greatest(length({col_expr}), 1)), "
        f"i -> concat(substr({col_expr}, 1, i - 1), substr({col_expr}, i + 1))))"
    )


def _variants_expr(col: str = "term", max_dist: int = 1) -> str:
    """SQL array expr of all <= max_dist-delete variants of `col` —
    pure built-in functions (sequence/transform/substr), whole-stage
    codegen, no Python in the build path."""
    if not 1 <= int(max_dist) <= MAX_SUPPORTED_DIST:
        raise ValueError(
            f"fuzzy_dict: max_dist must be 1..{MAX_SUPPORTED_DIST}, "
            f"got {max_dist}")
    d1 = _one_delete_set(col)
    if int(max_dist) == 1:
        return d1
    return f"array_distinct(flatten(transform({d1}, u -> {_one_delete_set('u')})))"


def fuzzy_rows(term_dict: DataFrame, max_dist: int) -> DataFrame:
    """(variant, term, df) — every dictionary term exploded into its
    delete neighborhood. `term_dict`: (term, df) — global df when
    building the base sidecar, batch-local df when staging an append
    delta (readers sum either way)."""
    return term_dict.select(
        F.explode(F.expr(_variants_expr("term", max_dist))).alias("variant"),
        "term",
        "df",
    )


def _write_fuzzy_sorted(rows: DataFrame, out_path: str) -> None:
    """Range-partition by variant and sort within partitions — the same
    disjoint-sorted-ranges layout as the term_dict sidecar, so the
    query-side IN probe is a range seek over file/row-group min-max
    stats instead of a scan."""
    (rows.repartitionByRange(FUZZY_DICT_RANGE_PARTITIONS, "variant")
     .sortWithinPartitions("variant", "term")
     .write.mode("overwrite").parquet(out_path))


def _write_fuzzy_meta(index_path: str, max_dist: int) -> None:
    tmp = f"{index_path}/.{FUZZY_DICT_META_FILE}.tmp"
    with open(tmp, "w") as f:
        json.dump({"max_dist": int(max_dist)}, f)
    os.replace(tmp, f"{index_path}/{FUZZY_DICT_META_FILE}")


def read_fuzzy_dict_meta(index_path: str) -> dict | None:
    p = f"{index_path}/{FUZZY_DICT_META_FILE}"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def has_fuzzy_dict(index_path: str) -> bool:
    """True when this runs index carries the fuzzy_dict sidecar
    (manifest-aware, like index_build.has_term_dict)."""
    from cer_for_mti_spark.operators.index_build import _manifest_rel_files

    files = _manifest_rel_files(index_path, "fuzzy_dict")
    if files is not None:
        return bool(files)
    return os.path.isdir(f"{index_path}/fuzzy_dict")


def write_fuzzy_dict(spark, index_path: str, max_dist: int = 1) -> int:
    """Build (or rebuild) the fuzzy_dict sidecar for a written runs
    index from its current global dictionary. Refuses while an append
    batch is in flight: that batch was staged WITHOUT a fuzzy delta, so
    building from the committed dictionary now would lose its terms
    forever once it resumes. Returns the number of (variant, term) rows
    written."""
    from cer_for_mti_spark.operators.index_build import (
        _find_inflight_batch,
        _index_commit_mode,
        _list_data_files,
        _manifest_write,
        read_term_dict,
        repair_interrupted_compaction,
    )

    _variants_expr("term", max_dist)  # validates max_dist
    inflight = _find_inflight_batch(index_path)
    if inflight is not None:
        raise ValueError(
            f"write_fuzzy_dict: batch {inflight!r} at {index_path} is "
            "staged but not fully committed; resume it first (its terms "
            "would be missing from a sidecar built now)."
        )
    repair_interrupted_compaction(index_path, "fuzzy_dict")
    td = read_term_dict(spark, index_path)
    out = f"{index_path}/fuzzy_dict"
    shutil.rmtree(out, ignore_errors=True)
    _write_fuzzy_sorted(fuzzy_rows(td, max_dist), out)
    _write_fuzzy_meta(index_path, max_dist)
    if _index_commit_mode(index_path) == "manifest":
        _manifest_write(index_path, "base-fuzzy_dict",
                        _list_data_files(index_path, "fuzzy_dict"))
    return int(spark.read.parquet(out).count())


def read_fuzzy_candidates(spark, index_path: str, pats: list[str],
                          max_dist: int | None = None) -> DataFrame:
    """(pat, term, df) — the SUPERSET of dictionary terms within
    Levenshtein distance <= max_dist of each pattern, by delete-variant
    intersection; the caller (query_expand.expand_fuzzy_symspell) runs
    the exact distance filter. df is the GLOBAL document frequency:
    per-batch delta rows sum per (variant, term), and every variant of a
    term carries the same sum, so max() over a term's matched variants
    is exact.

    The probe is `variant IN (<pattern delete variants>)` — a pushed In
    filter over the sorted range-partitioned sidecar: file- and
    row-group-level min/max stats prune everything outside the probed
    variant ranges, so cost scales with the candidate neighborhoods, not
    the vocabulary."""
    from cer_for_mti_spark.operators.index_build import (
        read_index_rel,
        repair_interrupted_compaction,
    )

    meta = read_fuzzy_dict_meta(index_path)
    if meta is None:
        raise FileNotFoundError(
            f"read_fuzzy_candidates: no {FUZZY_DICT_META_FILE} at "
            f"{index_path} — build the sidecar with write_fuzzy_dict.")
    baked = int(meta["max_dist"])
    if max_dist is None:
        max_dist = baked
    if int(max_dist) > baked:
        raise ValueError(
            f"read_fuzzy_candidates: query max_dist={max_dist} exceeds "
            f"the sidecar's baked max_dist={baked} (deeper delete "
            "variants were never stored); rebuild with "
            f"write_fuzzy_dict(max_dist={max_dist}).")
    repair_interrupted_compaction(index_path, "fuzzy_dict")
    pairs = [(p, v) for p in dict.fromkeys(pats)
             for v in sorted(delete_variants_py(p, int(max_dist)))]
    if not pairs:
        return spark.createDataFrame([], "pat string, term string, df long")
    all_vars = sorted({v for _, v in pairs})
    rows = read_index_rel(spark, index_path, "fuzzy_dict").filter(
        F.col("variant").isin(all_vars))
    grouped = rows.groupBy("variant", "term").agg(
        F.sum("df").cast("long").alias("df"))
    pv = spark.createDataFrame(pairs, "pat string, variant string")
    return (grouped.join(F.broadcast(pv), "variant")
            .groupBy("pat", "term").agg(F.max("df").alias("df")))


def symspell_candidates(term_dict: DataFrame, pats: list[str],
                        max_dist: int = 1) -> DataFrame:
    """(pat, term, df) candidate superset over an OPEN (term, df)
    dictionary relation — the no-index twin of read_fuzzy_candidates:
    the dictionary side explodes its delete variants on the fly (one
    JVM-side generator pass, no persisted sidecar), the pattern side is
    generated driver-side and broadcast."""
    spark = term_dict.sparkSession
    pairs = [(p, v) for p in dict.fromkeys(pats)
             for v in sorted(delete_variants_py(p, int(max_dist)))]
    if not pairs:
        return spark.createDataFrame([], "pat string, term string, df long")
    pv = spark.createDataFrame(pairs, "pat string, variant string")
    return (fuzzy_rows(term_dict, max_dist)
            .join(F.broadcast(pv), "variant")
            .groupBy("pat", "term").agg(F.max("df").alias("df")))
