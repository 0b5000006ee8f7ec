"""Set-algebra / evaluation operators vs analytic expectations (mirrors
the reference's identity self-test and golden-metric strategy,
SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import eval_ops


@pytest.fixture(scope="module")
def gold(spark):
    rows = [
        (1, "iron"), (1, "copper"), (1, "TNF-α"),
        (2, "insulin"), (2, "glucose"),
        (3, "dopamine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string")


@pytest.fixture(scope="module")
def pred(spark):
    rows = [
        (1, "iron"), (1, "TNF-α"), (1, "zinc"),        # 2 TP, 1 FP
        (2, "insulin"), (2, "glucosa"),                # 1 TP, 1 FP (near-miss)
        # doc 3 missing entirely -> 1 FN (left-outer fill semantics)
    ]
    return spark.createDataFrame(rows, "doc_id long, term string")


def test_identity_self_eval(spark, gold):
    """gold vs itself -> P=R=F1=1.0 (run_tool_evaluation.py:855 golden)."""
    m = eval_ops.compare_annotations(gold, gold).collect()[0]
    assert (m.precision, m.recall, m.fscore) == (1.0, 1.0, 1.0)
    assert m.fp == 0 and m.fn == 0 and m.tp == 6


def test_micro_counts(spark, gold, pred):
    m = eval_ops.compare_annotations(gold, pred).collect()[0]
    assert (m.tp, m.fp, m.fn) == (3, 2, 3)
    assert m.precision == round(3 / 5, 4)
    assert m.recall == round(3 / 6, 4)


def test_stopword_removal_case_sensitive(spark, gold):
    pred2 = gold.union(
        spark.createDataFrame([(1, "the"), (1, "The")], "doc_id long, term string")
    )
    m = eval_ops.compare_annotations(gold, pred2, stop_words=["the"]).collect()[0]
    assert m.fp == 1  # 'The' survives the case-sensitive list


def test_levenshtein_relaxed(spark, gold, pred):
    """'glucosa' vs 'glucose': lev=1, 1/7 < 1/3 -> TP under relaxed match."""
    m = eval_ops.compare_annotations_levenshtein(gold, pred).collect()[0]
    assert m.tp == 4 and m.fp == 1
    # recall: gold side matched = iron, TNF-α, insulin, glucose -> fn = 2
    assert m.fn == 2


def test_union_sets(spark, gold, pred):
    u = eval_ops.union_sets(gold, pred)
    assert u.count() == 8  # 6 gold + zinc + glucosa
    assert u.dropDuplicates().count() == u.count()


def test_nested_spans(spark):
    spans = spark.createDataFrame(
        [
            (1, "beta-globulin", 10, 23),
            (1, "globulin", 15, 23),     # nested (same end, later start)
            (1, "beta", 10, 14),         # nested (same start, earlier end)
            (1, "other", 30, 40),
            (2, "globulin", 15, 23),     # same span, different doc: NOT nested
        ],
        "doc_id long, term string, start int, end int",
    )
    nested = eval_ops.nested_spans(spans)
    got = {(r.doc_id, r.term) for r in nested.collect()}
    assert got == {(1, "globulin"), (1, "beta")}
    unnested = eval_ops.unnest_annotations(spans)
    assert unnested.count() == 3


def test_count_entities(spark):
    spans = spark.createDataFrame(
        [
            (1, "iron", "inorganic"), (1, "iron", "inorganic"),
            (2, "ATP", "nucleotides"),
        ],
        "doc_id long, term string, cls string",
    )
    got = {r.cls: (r.n, r.n_unique) for r in eval_ops.count_entities(spans).collect()}
    assert got == {"inorganic": (2, 1), "nucleotides": (1, 1)}


def test_bootstrap_identity(spark, gold):
    """Bootstrapping gold-vs-gold must give mean F1 = 1.0 with zero
    variance regardless of the resample."""
    m = eval_ops.bootstrap_prf(gold, gold, n_iter=20, seed=13).collect()[0]
    assert m.f_mean == 1.0 and m.f_std == 0.0


def test_bootstrap_deterministic(spark, gold, pred):
    a = eval_ops.bootstrap_prf(gold, pred, n_iter=30, seed=13).collect()[0]
    b = eval_ops.bootstrap_prf(gold, pred, n_iter=30, seed=13).collect()[0]
    assert a == b
