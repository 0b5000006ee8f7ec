"""Golden parity: the engine reproduces every row of the reference's
committed evaluation table (result_printouts/results_tool_evaluation.txt)
from the reference's own data files — exact to the 4 decimals the
reference prints. This is the 'matches the reference's results on its own
test queries' gate."""

from __future__ import annotations

import pytest

from cer_for_mti_spark.operators import reference_parity as rp

pytestmark = pytest.mark.skipif(
    not rp.reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def expected():
    exp = rp.parse_golden_file()
    # golden file labels the gold self-eval row plainly "Nested"
    assert "Nested" in exp and exp["Nested"] == (1.0, 1.0, 1.0)
    return exp


@pytest.mark.parametrize("tool", rp.GOLDEN_TOOLS)
def test_golden_row(spark, tool, expected):
    got = rp.evaluate_tool(spark, tool)
    assert got == expected[tool], (
        f"{tool}: engine {got} != golden {expected[tool]}"
    )


@pytest.fixture(scope="module")
def expected_leven():
    exp = rp.parse_golden_file(fname="results_tool_evaluation_leven.txt")
    assert "Nested" in exp and exp["Nested"] == (1.0, 1.0, 1.0)
    return exp


@pytest.mark.parametrize("tool", rp.GOLDEN_TOOLS)
def test_golden_leven_row(spark, tool, expected_leven):
    """The reference's `-l` Levenshtein-relaxed mode
    (run_tool_evaluation.py:504-552): every committed row of
    results_tool_evaluation_leven.txt reproduced to 4 decimals — including
    the already-predicted guard (`ann not in tool_ann`) and the
    normalize-by-len(pred) convention in BOTH passes."""
    got = rp.evaluate_tool_leven(spark, tool)
    assert got == expected_leven[tool], (
        f"{tool}: engine {got} != golden {expected_leven[tool]}"
    )


@pytest.mark.parametrize("tool", ["MTI", "SciBERT Ensemble",
                                  "ChemDataExtractor"])
def test_bootstrap_tolerance(spark, tool):
    """Statistical parity with results_tool_evaluation_bootstrap.txt
    (1000 resamples, random.choices seed 13): the engine's bootstrap uses
    a different RNG family (numpy default_rng), so exact bit-match is
    impossible — assert the engine's means land within 2 bootstrap-σ of
    the committed means and the σ estimates agree within 35% (σ of σ over
    300 iters is ~5%; 35% catches wrong-resampling bugs, not RNG noise)."""
    exp = rp.parse_bootstrap_file()[tool]
    got = rp.bootstrap_tool(spark, tool, n_iter=300, seed=13)
    for m in ("p", "r", "f"):
        assert abs(got[f"{m}_mean"] - exp[f"{m}_mean"]) <= 2 * exp[f"{m}_std"], (
            tool, m, got[f"{m}_mean"], exp)
        assert abs(got[f"{m}_std"] - exp[f"{m}_std"]) <= 0.35 * exp[f"{m}_std"], (
            tool, m, got[f"{m}_std"], exp)
        # quantiles must bracket sensibly: q34 <= mean <= q68 within noise
        assert got[f"{m}_q34"] <= got[f"{m}_mean"] + 0.01
        assert got[f"{m}_q68"] >= got[f"{m}_mean"] - 0.01


@pytest.mark.parametrize("tool", rp.GOLDEN_TOOLS)
def test_annotation_set_parity(spark, tool):
    """S12 golden sink: the committed per-doc normalized term sets
    (data/annotation_sets/<tool>_set.txt, written after stop-word
    removal) are reproduced per-document for every tool — a per-doc-level
    check of every parser, far finer than the aggregate P/R/F rows."""
    expected = rp.parse_annotation_set_file(tool)
    got = rp.tool_doc_sets(spark, tool)
    mismatched = {
        pmid for pmid in expected
        if got.get(pmid, set()) != expected[pmid]
    }
    extra = set(got) - set(expected)
    assert not mismatched and not extra, (
        f"{tool}: {len(mismatched)} docs mismatch, {len(extra)} extra; "
        f"sample: {sorted(mismatched)[:3]}"
    )


def test_nested_all_entities_parity(spark):
    """The committed union-of-gold entity file (nested_all_entities.txt,
    run_tool_evaluation.py:890-894) equals the engine's distinct gold
    terms after stop-word removal."""
    from cer_for_mti_spark.functions import analyze

    with open(f"{rp.REF}/data/annotation_sets/nested_all_entities.txt",
              encoding="utf8") as f:
        expected = {ln.rstrip("\n") for ln in f if ln.rstrip("\n")}
    stop = set(analyze.load_stop_words(f"{rp.REF}/data/stop_words.txt"))
    gold = rp.load_gold(spark)
    got = {r["term"] for r in gold.select("term").distinct().collect()
           if r["term"] not in stop}
    assert got == expected and len(got) > 1200


def test_levenshtein_log_soundness(spark):
    """Every row of the committed levenshtein_measurements.txt (853 fuzzy
    matches across 12 tools) must exist in the engine's fuzzy-match
    relation with the same edit distance. (The reverse direction is
    undefined: the reference logs only the first match its set-iteration
    order happened to hit, which is nondeterministic.)"""
    log = rp.parse_levenshtein_log()
    assert len(log) > 800
    by_tool: dict[str, list] = {}
    for tool, ann, pred, dist, norm in log:
        by_tool.setdefault(tool, []).append((ann, pred, dist, norm))
    for tool, rows in sorted(by_tool.items()):
        rel = {
            (r["g_term"], r["p_term"], r["dist"])
            for r in rp.fuzzy_match_pairs_ref(spark, tool).collect()
        }
        missing = [(a, p, d) for a, p, d, n in rows if (a, p, d) not in rel]
        assert not missing, (tool, len(missing), missing[:3])
        for a, p, d, n in rows:
            assert abs(d / len(p) - n) < 1e-12, (tool, a, p, d, n)
