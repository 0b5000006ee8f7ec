"""Set-algebra + evaluation operators (the reference's core query engine).

Re-expresses run_tool_evaluation.py's per-document term-set algebra as
DataFrame relations. The universal shape is the (doc_id, term) relation
with DISTINCT semantics — the reference's ``dict[pmid -> set[str]]``
(run_tool_evaluation.py:472-478) un-nested. Operators (SURVEY.md §2.3-2.5):

- U1 distinct            set construction            -> dropDuplicates
- U2 union               ensemble accumulation       -> union().distinct()
- U3 intersection = TP   _true_positives (:634-640)  -> inner join
- U4 difference = FP/FN  (:642-652)                  -> left-anti join
- J1 gold-vs-pred align  compare_annotations (:665)  -> joins on (doc,term)
- J3 Levenshtein fuzzy   _calculate_levenshtein      -> built-in levenshtein()
                         (:504-552)                     theta-join per doc
- J2 nested spans        _process_offsets (:401-433) -> interval-containment
                                                        self-join per doc
- A1-A4 micro P/R/Fβ     (:610-632, 671-698)         -> agg + column exprs
- A5 bootstrap           (:905-944, seed 13)         -> seeded resample join
- F4 stop-word removal   (:599-608)                  -> case-sensitive anti

Micro-averaging contract: counts are summed over ALL docs before division
(run_tool_evaluation.py:677-697) — never per-doc macro averages.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BETA = 1.0


def distinct_terms(df: DataFrame) -> DataFrame:
    """U1: per-doc term-set construction."""
    return df.select("doc_id", "term").dropDuplicates(["doc_id", "term"])


def union_sets(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2 / J4: per-doc set union of two annotation relations
    (_combine_annotations, run_tool_evaluation.py:84-94)."""
    return distinct_terms(a.select("doc_id", "term").union(b.select("doc_id", "term")))


def intersect_sets(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """U3: true positives = gold ∩ pred per doc."""
    return distinct_terms(gold).join(distinct_terms(pred), ["doc_id", "term"], "inner")


def except_sets(a: DataFrame, b: DataFrame) -> DataFrame:
    """U4: a − b per doc (FP when a=pred,b=gold; FN when a=gold,b=pred)."""
    return distinct_terms(a).join(distinct_terms(b), ["doc_id", "term"], "left_anti")


def tp_fp_fn(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """J1+U3+U4+A1: one-row (tp, fp, fn) micro counts. Missing docs on the
    pred side behave as empty sets automatically (adjust_bert_preds,
    run_tool_evaluation.py:766-773, is the reference's left-outer fill).

    One full-outer join on (doc_id, term) + conditional sums — a single
    Spark job (each input is scanned once), not three separate counts."""
    g = distinct_terms(gold).withColumn("_g", F.lit(1))
    p = distinct_terms(pred).withColumn("_p", F.lit(1))
    j = g.join(p, ["doc_id", "term"], "full_outer")
    def _n(cond):
        # coalesce: empty inputs aggregate to (0,0,0), not NULLs
        return F.coalesce(F.sum(cond.cast("int")), F.lit(0)).cast("long")

    return j.agg(
        _n(F.col("_g").isNotNull() & F.col("_p").isNotNull()).alias("tp"),
        _n(F.col("_g").isNull()).alias("fp"),
        _n(F.col("_p").isNull()).alias("fn"),
    )


def prf_cols(df: DataFrame, beta: float = BETA) -> DataFrame:
    """A3+A4: precision/recall/Fβ from (tp, fp, fn), rounded to 4 places
    like np.round(x, 4) at run_tool_evaluation.py:698."""
    # try_divide: degenerate resamples (all-empty docs) yield NULL metrics
    # instead of the reference's ZeroDivisionError
    p = F.try_divide(F.col("tp"), F.col("fp") + F.col("tp"))
    r = F.try_divide(F.col("tp"), F.col("fn") + F.col("tp"))
    b2 = beta * beta
    f = F.try_divide((1.0 + b2) * p * r, b2 * p + r)
    return (
        df.withColumn("precision", F.round(p, 4))
        .withColumn("recall", F.round(r, 4))
        .withColumn("fscore", F.round(f, 4))
    )


def compare_annotations(gold: DataFrame, pred: DataFrame,
                        stop_words: list[str] | None = None) -> DataFrame:
    """The reference's Evaluate.compare_annotations
    (run_tool_evaluation.py:665-698): stop-word removal (F4, case-sensitive)
    on BOTH sides, then micro tp/fp/fn -> P/R/F1."""
    if stop_words:
        gold = gold.filter(~F.col("term").isin(stop_words))
        pred = pred.filter(~F.col("term").isin(stop_words))
    return prf_cols(tp_fp_fn(gold, pred))


def levenshtein_matches(pred: DataFrame, gold: DataFrame,
                        max_norm: float = 1.0 / 3.0) -> DataFrame:
    """J3: within-doc fuzzy theta-join — pred term matches a gold term when
    levenshtein(pred, gold)/len(pred) < max_norm OR exact equality
    (run_tool_evaluation.py:504-552). Set semantics make the reference's
    first-match `break` order-independent. Returns matched (doc_id, term)
    pred rows."""
    p = distinct_terms(pred).withColumnRenamed("term", "p_term")
    g = distinct_terms(gold).withColumnRenamed("term", "g_term")
    joined = p.join(g, "doc_id").filter(
        (F.col("p_term") == F.col("g_term"))
        | (
            F.levenshtein("p_term", "g_term")
            / F.length("p_term")
            < max_norm
        )
    )
    return joined.select("doc_id", F.col("p_term").alias("term")).dropDuplicates()


def _count_row(tp_df: DataFrame, mg_df: DataFrame, pred: DataFrame,
               gold: DataFrame) -> DataFrame:
    """(tp, fp, fn) as ONE lazy row: tp = |matched pred|, fp = |pred| - tp,
    fn = |gold| - |matched gold|. Four 1-row aggregates cross-joined —
    collected in a single action instead of four."""
    tp = tp_df.agg(F.count(F.lit(1)).alias("tp"))
    mg = mg_df.agg(F.count(F.lit(1)).alias("mg"))
    np_ = pred.agg(F.count(F.lit(1)).alias("np"))
    ng = gold.agg(F.count(F.lit(1)).alias("ng"))
    return (
        tp.crossJoin(np_).crossJoin(mg).crossJoin(ng)
        .select(
            F.col("tp"),
            (F.col("np") - F.col("tp")).alias("fp"),
            (F.col("ng") - F.col("mg")).alias("fn"),
        )
    )


def compare_annotations_levenshtein(gold: DataFrame, pred: DataFrame,
                                    stop_words: list[str] | None = None,
                                    max_norm: float = 1.0 / 3.0) -> DataFrame:
    """Relaxed-match micro P/R/F1: TP = preds fuzzily matching a gold term
    in the same doc (FP pass, :522-537); FN = gold terms with no fuzzy pred
    match (FN pass, :541-551). Lazy single-row result (one job on collect)."""
    if stop_words:
        gold = gold.filter(~F.col("term").isin(stop_words))
        pred = pred.filter(~F.col("term").isin(stop_words))
    matched_pred = levenshtein_matches(pred, gold, max_norm)
    matched_gold = levenshtein_matches(gold, pred, max_norm)
    return prf_cols(_count_row(matched_pred, matched_gold,
                               distinct_terms(pred), distinct_terms(gold)))


def compare_annotations_levenshtein_ref(gold: DataFrame, pred: DataFrame,
                                        stop_words: list[str] | None = None,
                                        max_norm: float = 1.0 / 3.0) -> DataFrame:
    """The reference's `-l` mode EXACTLY (_calculate_levenshtein,
    run_tool_evaluation.py:504-552), as set-translated joins:

    - TP pass (:522-537): pred p matches iff some gold g in the same doc
      has p == g, OR lev(p,g)/len(p) < max_norm AND g NOT itself predicted
      in that doc (no relaxed credit when the gold term is already an
      exact prediction — the Sox1/Sox2 guard).
    - FN pass (:541-551): gold g is found iff some pred p has p == g, OR
      lev(g,p)/len(p) < max_norm (normalized by len(PRED) again) AND p not
      itself a gold term of that doc.

    The reference's first-match `break` is order-dependent only in which
    match it logs, not whether one exists — set semantics are identical.
    Reproduces results_tool_evaluation_leven.txt to 4 decimals
    (tests/test_reference_parity.py)."""
    if stop_words:
        gold = gold.filter(~F.col("term").isin(stop_words))
        pred = pred.filter(~F.col("term").isin(stop_words))
    g = distinct_terms(gold).withColumnRenamed("term", "g_term")
    p = distinct_terms(pred).withColumnRenamed("term", "p_term")
    # membership flags: is this gold term itself predicted in the doc /
    # is this pred term itself a gold term of the doc
    g_flag = g.join(
        p.select("doc_id", F.col("p_term").alias("g_term"))
        .withColumn("_in_pred", F.lit(True)),
        ["doc_id", "g_term"], "left",
    ).withColumn("_in_pred", F.coalesce("_in_pred", F.lit(False)))
    p_flag = p.join(
        g.select("doc_id", F.col("g_term").alias("p_term"))
        .withColumn("_in_gold", F.lit(True)),
        ["doc_id", "p_term"], "left",
    ).withColumn("_in_gold", F.coalesce("_in_gold", F.lit(False)))

    norm_lev = F.levenshtein("p_term", "g_term") / F.length("p_term")
    matched_pred = (
        p.join(g_flag, "doc_id")
        .filter(
            (F.col("p_term") == F.col("g_term"))
            | ((norm_lev < max_norm) & ~F.col("_in_pred"))
        )
        .select("doc_id", "p_term").dropDuplicates()
    )
    matched_gold = (
        g.join(p_flag, "doc_id")
        .filter(
            (F.col("p_term") == F.col("g_term"))
            | ((norm_lev < max_norm) & ~F.col("_in_gold"))
        )
        .select("doc_id", "g_term").dropDuplicates()
    )
    return prf_cols(_count_row(matched_pred, matched_gold, p, g))


def nested_spans(spans: DataFrame) -> DataFrame:
    """J2: interval-containment self-join within doc. Span A is nested in B
    iff (A.start == B.start AND A.end < B.end) OR
        (A.start >  B.start AND A.end <= B.end)
    — _process_offsets, run_tool_evaluation.py:401-433, but as a range
    join instead of the reference's O(n²) Python loop. Spans cluster by
    doc, so the equi-key on doc_id keeps the theta predicate local."""
    a = spans.select(
        "doc_id",
        F.col("term").alias("a_term"),
        F.col("start").alias("a_start"),
        F.col("end").alias("a_end"),
    )
    b = spans.select(
        "doc_id",
        F.col("term").alias("b_term"),
        F.col("start").alias("b_start"),
        F.col("end").alias("b_end"),
    )
    nested = a.join(b, "doc_id").filter(
        (
            (F.col("a_start") == F.col("b_start")) & (F.col("a_end") < F.col("b_end"))
        )
        | (
            (F.col("a_start") > F.col("b_start")) & (F.col("a_end") <= F.col("b_end"))
        )
    )
    return nested.select(
        "doc_id", F.col("a_term").alias("term"), F.col("a_start").alias("start"),
        F.col("a_end").alias("end"),
    ).dropDuplicates()


def unnest_annotations(spans: DataFrame) -> DataFrame:
    """U5: remove nested entities from the span set (run_tool_evaluation.py:
    472-477) — anti-join against the nested set."""
    nested = nested_spans(spans)
    return spans.join(
        nested.select("doc_id", "start", "end"), ["doc_id", "start", "end"],
        "left_anti",
    )


def count_entities(spans: DataFrame, cls_col: str = "cls") -> DataFrame:
    """A2: grouped counts per entity class + distinct-term variant
    (count_entities / count_unique_entities, run_tool_evaluation.py:
    328-390)."""
    return spans.groupBy(cls_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("term").alias("n_unique"),
    )


def bootstrap_prf(gold: DataFrame, pred: DataFrame, n_iter: int = 1000,
                  seed: int = 13, stop_words: list[str] | None = None) -> DataFrame:
    """A5/J5: bootstrap micro P/R/F1 over doc resamples. The resample-key
    relation (iter, doc_id, multiplicity) is built with a seeded generator
    (reference: random.choices seed 13, run_tool_evaluation.py:915-919) and
    joined against the annotation relations — the join DUPLICATES per-doc
    counts by multiplicity, reproducing resampling-with-replacement without
    materializing each resample. Returns mean/stddev of P, R, F1 plus the
    reference's percentile-bootstrap quantiles q=.34/.68
    (run_tool_evaluation.py:933-944 — np.quantile linear interpolation,
    matched by Spark's exact F.percentile).

    Scale note: the seeded-numpy resample keys are built driver-side
    (n_iter x n_docs tuples) for RNG parity with the reference's
    random.choices(seed 13); the hash-resample twin
    (__spark_entry__.q_bootstrap_prf) is the fully distributed shape and
    the one to use on large gold sets."""
    if stop_words:
        gold = gold.filter(~F.col("term").isin(stop_words))
        pred = pred.filter(~F.col("term").isin(stop_words))
    spark = gold.sparkSession
    doc_ids = [r.doc_id for r in
               distinct_terms(gold).select("doc_id").distinct().collect()]
    doc_ids.sort()
    rng = np.random.default_rng(seed)
    n = len(doc_ids)
    rows = []
    for it in range(n_iter):
        sample = rng.integers(0, n, size=n)
        ids, counts = np.unique(sample, return_counts=True)
        rows.extend(
            (it, int(doc_ids[i]), int(c)) for i, c in zip(ids, counts)
        )
    keys = spark.createDataFrame(rows, "iter int, doc_id long, mult int")

    def per_doc_counts(g: DataFrame, p: DataFrame) -> DataFrame:
        tp = intersect_sets(g, p).groupBy("doc_id").agg(F.count("*").alias("tp"))
        fp = except_sets(p, g).groupBy("doc_id").agg(F.count("*").alias("fp"))
        fn = except_sets(g, p).groupBy("doc_id").agg(F.count("*").alias("fn"))
        return (
            tp.join(fp, "doc_id", "full_outer")
            .join(fn, "doc_id", "full_outer")
            .fillna(0)
        )

    per_doc = per_doc_counts(gold, pred)
    resampled = (
        keys.join(F.broadcast(per_doc), "doc_id")
        .groupBy("iter")
        .agg(
            F.sum(F.col("mult") * F.col("tp")).alias("tp"),
            F.sum(F.col("mult") * F.col("fp")).alias("fp"),
            F.sum(F.col("mult") * F.col("fn")).alias("fn"),
        )
    )
    metrics = prf_cols(resampled)

    def _q(col, q):
        return F.round(F.percentile(F.col(col), F.lit(q)), 4)

    return metrics.agg(
        F.round(F.avg("precision"), 4).alias("p_mean"),
        F.round(F.stddev_samp("precision"), 4).alias("p_std"),
        F.round(F.avg("recall"), 4).alias("r_mean"),
        F.round(F.stddev_samp("recall"), 4).alias("r_std"),
        F.round(F.avg("fscore"), 4).alias("f_mean"),
        F.round(F.stddev_samp("fscore"), 4).alias("f_std"),
        _q("precision", 0.34).alias("p_q34"),
        _q("precision", 0.68).alias("p_q68"),
        _q("recall", 0.34).alias("r_q34"),
        _q("recall", 0.68).alias("r_q68"),
        _q("fscore", 0.34).alias("f_q34"),
        _q("fscore", 0.68).alias("f_q68"),
    )
