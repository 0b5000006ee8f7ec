"""Reproduce the reference's golden evaluation table from its own data
files using the engine's parsers + set-algebra operators.

Every number in /root/reference/result_printouts/results_tool_evaluation.txt
("<tool> on nested": precision/recall/F1 over the 200-doc ChEMFAM corpus,
stop words removed, micro-averaged) is reproduced exactly — 13 rows
(tests/test_reference_parity.py asserts all of them to 4 decimals).

Source formats -> engine parsers:
- gold:     BRAT .ann per doc (ChEMFAM_corpus)      -> formats.parse_brat (S2)
- MTI:      {pmid: [terms]} JSON                    -> S6 (driver-side json,
            the file is one small object — spark.read.json would make one
            column per pmid)
- BERT/XLNet families: pmid\\tterm\\tlabel TSV       -> formats.parse_pmid_tsv
            (S3; the reference's run-length grouping is order-dependent in
            principle, but verified order-free-equal on every file)
- PubTator: mixed title/mention rows                -> formats.parse_pubtator
            (S5) + one replicated reference BUG: the parser's final
            unconditional flush (run_tool_evaluation.py:239-240) overwrites
            the LAST document's set with the empty remainder because the
            file ends with a blank line — doc 31011396 scores as empty in
            the golden numbers, so parity requires dropping it
- ChemDataExtractor: blank-line blocks              -> formats.parse_block_format (S4)
- ensembles: per-doc union of two model runs        -> eval_ops.union_sets (J4)
- metrics:  stop-word anti-join (F4) + micro TP/FP/FN -> P/R/F1 (U3/U4/A1-A4)
            via eval_ops.compare_annotations; only docs present in gold are
            scored (the reference iterates gold keys,
            run_tool_evaluation.py:675)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cer_for_mti_spark.functions import analyze
from cer_for_mti_spark.operators import eval_ops
from cer_for_mti_spark.sources import formats

REF = "/root/reference"


def _py_strip(col):
    """Python str.strip() equivalent: strips UNICODE whitespace (the
    corpus contains U+202F / U+2009 around entity surfaces; Spark's trim()
    is ASCII-only and would keep them, shifting the golden counts)."""
    ws = r"[\p{IsWhite_Space}]"
    return F.regexp_replace(
        F.regexp_replace(col, f"^{ws}+", ""), f"{ws}+$", ""
    )

GOLDEN_TOOLS = [
    "Nested", "MTI", "MML + CTB", "PubTator Central", "ChemListem",
    "lstm_char_embed_chemdner", "ChemDataExtractor", "ChemDNER BERT",
    "Gene BERT", "BERT Ensemble", "SciBERT Ensemble", "BioBERT Ensemble",
    "XLNet ensemble",
]


def _ann_dir_df(spark: SparkSession, pattern: str) -> DataFrame:
    """BRAT .ann directory -> (doc_id, term): pmid from filename, term
    trimmed like the reference's ann[2].strip()."""
    lines = formats.read_lines(spark, pattern).withColumn(
        "pmid", F.regexp_extract("file", r"([^/]+)\.[^./]*$", 1)
    )
    parsed = formats.parse_brat(lines)
    return parsed.select(
        F.col("pmid").alias("doc_id"), _py_strip(F.col("term")).alias("term")
    ).dropDuplicates()


def load_gold(spark: SparkSession, ref_dir: str = REF) -> DataFrame:
    """The nested (full) manual gold set: every BRAT T-row term per doc."""
    return _ann_dir_df(spark, f"{ref_dir}/data/ChEMFAM_corpus/*.ann")


def _tsv_df(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    return formats.parse_pmid_tsv(lines).select(
        F.col("pmid").alias("doc_id"), "term"
    )


def _mti_df(spark: SparkSession, ref_dir: str) -> DataFrame:
    with open(f"{ref_dir}/data/tool_annotations/MTI_annotations.json",
              encoding="utf8") as f:
        d = json.load(f)
    rows = [(pmid, t) for pmid, terms in d.items() for t in set(terms)]
    return spark.createDataFrame(rows, "doc_id string, term string")


def _pubtator_df(spark: SparkSession, ref_dir: str) -> DataFrame:
    path = f"{ref_dir}/data/tool_annotations/pubtator_central_export.pubtator"
    lines = spark.read.text(path)
    parsed = formats.parse_pubtator(lines).select(
        F.col("pmid").alias("doc_id"), _py_strip(F.col("term")).alias("term")
    )
    # replicated reference bug: the final unconditional flush empties the
    # last document's set (file ends with a blank line) — find the last
    # title row's pmid and drop that doc
    last_pmid = None
    with open(path, encoding="utf8") as f:
        for ln in f:
            parts = ln.split("|")
            if len(parts[0]) == 8:
                last_pmid = parts[0]
    return parsed.filter(F.col("doc_id") != last_pmid)


def _cde_df(spark: SparkSession, ref_dir: str) -> DataFrame:
    path = f"{ref_dir}/data/tool_annotations/ChemDataExtractor_annotations.txt"
    with open(path, encoding="utf8") as f:
        rows = [(i, ln.rstrip("\n")) for i, ln in enumerate(f)]
    lines = spark.createDataFrame(rows, "line_no long, value string")
    return formats.parse_block_format(lines).select(
        F.col("pmid").alias("doc_id"), "term"
    )


def load_tool(spark: SparkSession, tool: str, ref_dir: str = REF) -> DataFrame:
    """(doc_id, term) for one golden-table row."""
    ta = f"{ref_dir}/data/tool_annotations"
    tsv = {
        "ChemDNER BERT": [f"{ta}/bert_chemdner_test.txt"],
        "Gene BERT": [f"{ta}/bert_gene_mention_test.txt"],
        "BERT Ensemble": [f"{ta}/bert_gene_mention_test.txt",
                          f"{ta}/bert_chemdner_test.txt"],
        "SciBERT Ensemble": [f"{ta}/scibert_chemdner_test.txt",
                             f"{ta}/scibert_gene_mention_test.txt"],
        "BioBERT Ensemble": [f"{ta}/biobert_chemdner_test.txt",
                             f"{ta}/biobert_gene_mentions_test.txt"],
        "XLNet ensemble": [f"{ta}/xlnet_chemdner_test.txt",
                           f"{ta}/xlnet_gm_test.txt"],
    }
    if tool == "Nested":
        return load_gold(spark, ref_dir)
    if tool == "MTI":
        return _mti_df(spark, ref_dir)
    if tool == "PubTator Central":
        return _pubtator_df(spark, ref_dir)
    if tool == "ChemDataExtractor":
        return _cde_df(spark, ref_dir)
    if tool == "MML + CTB":
        return _ann_dir_df(spark, f"{ta}/mml_ctb/*.ann")
    if tool == "ChemListem":
        return _ann_dir_df(spark, f"{ta}/chemical_citations_chemlistem/*.ann")
    if tool == "lstm_char_embed_chemdner":
        return _ann_dir_df(
            spark,
            f"{ta}/chemical_citations_tf_ner_chars_lstm_lstm_crf_ema_chemdner1/*",
        )
    if tool in tsv:
        dfs = [_tsv_df(spark, p) for p in tsv[tool]]
        out = dfs[0]
        for d in dfs[1:]:
            out = eval_ops.union_sets(out, d)
        return out
    raise ValueError(f"unknown tool {tool!r}")


def evaluate_tool(spark: SparkSession, tool: str, ref_dir: str = REF,
                  gold: DataFrame | None = None) -> tuple[float, float, float]:
    """(precision, recall, f1) rounded to 4, exactly as the golden file."""
    gold = gold if gold is not None else load_gold(spark, ref_dir).cache()
    pred = load_tool(spark, tool, ref_dir)
    # only gold docs are scored (reference iterates gold keys)
    pred = pred.join(gold.select("doc_id").distinct(), "doc_id", "left_semi")
    stop = analyze.load_stop_words(f"{ref_dir}/data/stop_words.txt")
    row = eval_ops.compare_annotations(gold, pred, stop_words=stop).collect()[0]
    return row["precision"], row["recall"], row["fscore"]


def golden_table(spark: SparkSession, ref_dir: str = REF) -> DataFrame:
    """The full reproduced table as a DataFrame (tool, precision, recall,
    fscore) — the engine's 'runs the reference's own queries' evidence."""
    gold = load_gold(spark, ref_dir).cache()
    rows = []
    for tool in GOLDEN_TOOLS:
        p, r, f1 = evaluate_tool(spark, tool, ref_dir, gold=gold)
        rows.append((tool, float(p), float(r), float(f1)))
    return spark.createDataFrame(
        rows, "tool string, precision double, recall double, fscore double"
    )


def evaluate_tool_leven(spark: SparkSession, tool: str, ref_dir: str = REF,
                        gold: DataFrame | None = None,
                        ) -> tuple[float, float, float]:
    """The reference's `-l` Levenshtein-relaxed mode for one tool
    (run_tool_evaluation.py:504-552 semantics via
    eval_ops.compare_annotations_levenshtein_ref), reproducing
    results_tool_evaluation_leven.txt to 4 decimals."""
    gold = gold if gold is not None else load_gold(spark, ref_dir).cache()
    pred = load_tool(spark, tool, ref_dir)
    pred = pred.join(gold.select("doc_id").distinct(), "doc_id", "left_semi")
    stop = analyze.load_stop_words(f"{ref_dir}/data/stop_words.txt")
    row = eval_ops.compare_annotations_levenshtein_ref(
        gold, pred, stop_words=stop
    ).collect()[0]
    return row["precision"], row["recall"], row["fscore"]


def golden_leven_table(spark: SparkSession, ref_dir: str = REF,
                       tools: list[str] | None = None) -> DataFrame:
    gold = load_gold(spark, ref_dir).cache()
    rows = []
    for tool in (tools or GOLDEN_TOOLS):
        p, r, f1 = evaluate_tool_leven(spark, tool, ref_dir, gold=gold)
        rows.append((tool, float(p), float(r), float(f1)))
    return spark.createDataFrame(
        rows, "tool string, precision double, recall double, fscore double"
    )


def bootstrap_tool(spark: SparkSession, tool: str, n_iter: int = 300,
                   seed: int = 13, ref_dir: str = REF):
    """Bootstrap mean/std/quantiles for one tool (EvaluateBootstrap,
    run_tool_evaluation.py:905-944: doc resamples with replacement,
    per-iter micro P/R/F rounded to 4, then mean/stdev/quantiles). The
    RNG family differs (numpy default_rng vs random.choices), so parity
    with results_tool_evaluation_bootstrap.txt is statistical: means
    within a few stderr, stddevs within a factor — asserted with ±2σ
    tolerances in tests."""
    gold = load_gold(spark, ref_dir).cache()
    pred = load_tool(spark, tool, ref_dir)
    pred = pred.join(gold.select("doc_id").distinct(), "doc_id", "left_semi")
    stop = analyze.load_stop_words(f"{ref_dir}/data/stop_words.txt")
    return eval_ops.bootstrap_prf(gold, pred, n_iter=n_iter, seed=seed,
                                  stop_words=stop).collect()[0]


def parse_bootstrap_file(ref_dir: str = REF) -> dict[str, dict[str, float]]:
    """results_tool_evaluation_bootstrap.txt -> {tool: {f_mean, f_std,
    p_mean, p_std, r_mean, r_std}}."""
    path = f"{ref_dir}/result_printouts/results_tool_evaluation_bootstrap.txt"
    out: dict[str, dict[str, float]] = {}
    cur = None
    with open(path, encoding="utf8") as f:
        for ln in f:
            ln = ln.strip()
            if ln.endswith(":"):
                cur = ln[:-1]
                out[cur] = {}
            elif cur and "+/-" in ln:
                name, _, rest = ln.partition(":")
                mean_s, _, std_s = rest.partition("+/-")
                key = {"F-score": "f", "Precision": "p", "Recall": "r"}[name]
                out[cur][f"{key}_mean"] = float(mean_s)
                out[cur][f"{key}_std"] = float(std_s)
    return out


def parse_golden_file(ref_dir: str = REF,
                      fname: str = "results_tool_evaluation.txt",
                      ) -> dict[str, tuple[float, float, float]]:
    """Parse a result_printouts golden table (exact or leven variant)
    -> {tool: (precision, recall, f1)} rounded to 4."""
    exp: dict[str, tuple[float, float, float]] = {}
    path = f"{ref_dir}/result_printouts/{fname}"
    cur, vals = None, {}
    with open(path, encoding="utf8") as f:
        for ln in f:
            ln = ln.strip()
            if ln.endswith("on nested"):
                cur, vals = ln[: -len(" on nested")], {}
            elif ln.startswith("Precision:"):
                vals["p"] = round(float(ln.split()[1]), 4)
            elif ln.startswith("Recall:"):
                vals["r"] = round(float(ln.split()[1]), 4)
            elif ln.startswith("F1-score:") and cur is not None:
                vals["f"] = round(float(ln.split()[1]), 4)
                exp[cur] = (vals["p"], vals["r"], vals["f"])
    return exp


def reference_available(ref_dir: str = REF) -> bool:
    return os.path.isdir(f"{ref_dir}/data/ChEMFAM_corpus")


def parse_annotation_set_file(tool: str, ref_dir: str = REF) -> dict[str, set]:
    """Parse data/annotation_sets/<tool>_set.txt — the reference's S12
    sink: one line per doc, 'pmid:{python set repr}', written AFTER
    stop-word removal mutated the tool dict (run_tool_evaluation.py:
    886-888). Set repr order is nondeterministic, so parity is per-doc SET
    equality, not byte equality."""
    import ast

    out: dict[str, set] = {}
    with open(f"{ref_dir}/data/annotation_sets/{tool}_set.txt",
              encoding="utf8") as f:
        for ln in f:
            pmid, _, rest = ln.rstrip("\n").partition(":")
            out[pmid] = set() if rest == "set()" else ast.literal_eval(rest)
    return out


def tool_doc_sets(spark: SparkSession, tool: str,
                  ref_dir: str = REF) -> dict[str, set]:
    """The engine's per-doc term sets for one tool, stop-words removed —
    the relation the reference's annotation-set sink serializes."""
    gold_docs = load_gold(spark, ref_dir).select("doc_id").distinct()
    pred = load_tool(spark, tool, ref_dir)
    pred = pred.join(gold_docs, "doc_id", "left_semi")
    stop = set(analyze.load_stop_words(f"{ref_dir}/data/stop_words.txt"))
    out: dict[str, set] = {}
    for r in pred.collect():
        if r["term"] not in stop:
            out.setdefault(r["doc_id"], set()).add(r["term"])
    return out


def parse_levenshtein_log(ref_dir: str = REF) -> list[tuple]:
    """result_printouts/levenshtein_measurements.txt -> (tool, ann, pred,
    dist, norm) rows. The reference logs the FIRST fuzzy (non-exact) match
    its set-iteration happens to hit (run_tool_evaluation.py:527-531), so
    WHICH row is logged is nondeterministic — but every logged row must be
    a genuine fuzzy match under the engine's relation (one-direction
    parity). Entities contain ', ' and ': ' so parsing is by field labels,
    right to left."""
    import re

    rows = []
    pat = re.compile(
        r"^Tool: (.*?), Annotation: (.*), Prediction: (.*), "
        r"levenshtein distance: (\d+), normalized lev: ([0-9.eE+-]+)$"
    )
    path = f"{ref_dir}/result_printouts/levenshtein_measurements.txt"
    with open(path, encoding="utf8") as f:
        for ln in f:
            m = pat.match(ln.rstrip("\n"))
            if m:
                rows.append((m.group(1), m.group(2), m.group(3),
                             int(m.group(4)), float(m.group(5))))
    return rows


def fuzzy_match_pairs_ref(spark: SparkSession, tool: str,
                          ref_dir: str = REF) -> DataFrame:
    """The engine's relation of loggable fuzzy matches for one tool:
    (doc_id, p_term, g_term, dist) where dist/len(pred) < 1/3, dist > 0,
    and the gold term is NOT itself predicted in that doc (the reference's
    already-predicted guard). Superset of the committed log's rows for
    that tool."""
    gold = load_gold(spark, ref_dir).cache()
    pred = load_tool(spark, tool, ref_dir)
    pred = pred.join(gold.select("doc_id").distinct(), "doc_id", "left_semi")
    stop = analyze.load_stop_words(f"{ref_dir}/data/stop_words.txt")
    pred = pred.filter(~F.col("term").isin(stop))
    g = gold.withColumnRenamed("term", "g_term")
    p = pred.withColumnRenamed("term", "p_term")
    g_flag = g.join(
        p.select("doc_id", F.col("p_term").alias("g_term"))
        .withColumn("_in_pred", F.lit(True)),
        ["doc_id", "g_term"], "left",
    ).withColumn("_in_pred", F.coalesce("_in_pred", F.lit(False)))
    dist = F.levenshtein("p_term", "g_term")
    return (
        p.join(g_flag, "doc_id")
        .filter(
            (dist > 0)
            & (dist / F.length("p_term") < 1.0 / 3.0)
            & ~F.col("_in_pred")
        )
        .select("doc_id", "p_term", "g_term", dist.alias("dist"))
        .dropDuplicates()
    )
