"""Reversed term-dictionary sidecar — leading-wildcard queries as range
seeks.

A leading-wildcard pattern ("*tion") has no literal prefix, so the
sorted term_dict cannot prune its expansion: every candidate term must
be enumerated (a vocabulary scan per batch). The classic fix, public in
Solr's ReversedWildcardFilter / Lucene's ReverseStringFilter, is to
index each term REVERSED: "*tion" has the literal SUFFIX "tion", and on
the reversed dictionary that suffix becomes the PREFIX "noit" — a
pushed StartsWith over a rev-sorted layout, i.e. the same file- and
row-group-level range seek the forward dictionary gives trailing
wildcards.

This sidecar stores (rev, term, df) with rev = reverse(term), range-
partitioned and sorted by rev. It is opt-in per index
(write_rev_dict) and rides the exact lifecycle of term_dict /
fuzzy_dict: appends stage a delta with batch-local df (rev is a
deterministic function of the term, so per-(rev, term) sums equal the
global df), compaction regenerates one sorted base (purged docs' df
drops land here), manifest-mode commits cover it, vacuum_index walks it
through the same manifests, and the two-rename compaction swap is crash-
repaired by readers.

Reference anchor: the reference engine's retrieval surface is exact
term lookup (run_tool_evaluation.py); wildcard retrieval is an engine
addition from the public Lucene/Solr feature set, re-expressed as
DataFrame explode-free reverse + equi-range probes.
"""
from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REV_DICT_RANGE_PARTITIONS = 32


def rev_rows(term_dict: DataFrame) -> DataFrame:
    """(rev, term, df) — the dictionary keyed by its reversed term.
    `term_dict`: (term, df), global df for the base build or batch-local
    df for an append delta (readers sum either way)."""
    return term_dict.select(
        F.reverse(F.col("term")).alias("rev"), "term", "df")


def _write_rev_sorted(rows: DataFrame, out_path: str) -> None:
    """Range-partition by rev and sort within partitions — files carry
    disjoint sorted rev ranges, so a reversed-suffix probe is a range
    seek over min/max stats, mirroring term_dict's forward layout."""
    (rows.repartitionByRange(REV_DICT_RANGE_PARTITIONS, "rev")
     .sortWithinPartitions("rev", "term")
     .write.mode("overwrite").parquet(out_path))


def has_rev_dict(index_path: str) -> bool:
    """True when this runs index carries the reversed-dictionary sidecar
    (manifest-aware, like index_build.has_term_dict)."""
    from cer_for_mti_spark.operators.index_build import _manifest_rel_files

    files = _manifest_rel_files(index_path, "rev_dict")
    if files is not None:
        return bool(files)
    return os.path.isdir(f"{index_path}/rev_dict")


def write_rev_dict(spark, index_path: str) -> int:
    """Build (or rebuild) the rev_dict sidecar for a written runs index
    from its current global dictionary. Refuses while an append batch is
    in flight — that batch was staged WITHOUT a rev delta, so a sidecar
    built from the committed dictionary now would lose its terms once it
    resumes. Returns the number of rows written."""
    from cer_for_mti_spark.operators.index_build import (
        _find_inflight_batch,
        _index_commit_mode,
        _list_data_files,
        _manifest_write,
        read_term_dict,
        repair_interrupted_compaction,
    )

    inflight = _find_inflight_batch(index_path)
    if inflight is not None:
        raise ValueError(
            f"write_rev_dict: batch {inflight!r} at {index_path} is "
            "staged but not fully committed; resume it first (its terms "
            "would be missing from a sidecar built now)."
        )
    repair_interrupted_compaction(index_path, "rev_dict")
    td = read_term_dict(spark, index_path)
    out = f"{index_path}/rev_dict"
    shutil.rmtree(out, ignore_errors=True)
    _write_rev_sorted(rev_rows(td), out)
    if _index_commit_mode(index_path) == "manifest":
        _manifest_write(index_path, "base-rev_dict",
                        _list_data_files(index_path, "rev_dict"))
    return int(spark.read.parquet(out).count())


def read_rev_dict_terms(spark, index_path: str,
                        suffixes: list[str]) -> DataFrame:
    """Global (term, df) for dictionary terms ENDING with any of
    `suffixes`, served as a pushed StartsWith range seek over the
    reversed layout (each suffix probes as its reversal). Per-batch df
    deltas sum per term — rev is a function of the term, so the sum is
    the global df, same convention as read_term_dict."""
    from cer_for_mti_spark.operators.index_build import (
        read_index_rel,
        repair_interrupted_compaction,
    )

    repair_interrupted_compaction(index_path, "rev_dict")
    if not suffixes:
        return spark.createDataFrame([], "term string, df long")
    rel = read_index_rel(spark, index_path, "rev_dict")
    pred = F.col("rev").startswith(suffixes[0][::-1])
    for s in suffixes[1:]:
        pred = pred | F.col("rev").startswith(s[::-1])
    return (rel.filter(pred)
            .groupBy("term").agg(F.sum("df").cast("long").alias("df")))
