"""Plan-shape guard: no driver query may contain an ACCIDENTAL
CartesianProduct / BroadcastNestedLoopJoin node. The only allowed
occurrences are the intentional brute-force baselines (exact-cosine
scan with broadcast queries / broadcast centroid assignment), where the
nested-loop side is provably tiny and broadcast. Everything else must be
an equi-join, window, or aggregate — the property that makes the plan
survive a 1000x scale-up."""

from __future__ import annotations

import pytest

import __spark_entry__ as se

SF_DIR = "/root/testdata/sf0.001"

# intentional nested-loop baselines: corpus x BROADCAST(tiny queries /
# centroids). These are the exact-scoring oracles, not the scale paths
# (the scale paths are ann_lsh / ann_ivf probe pruning / LSH dedup).
ALLOWED_NESTED_LOOP = {
    "embedding_topk",      # brute-force cosine baseline (broadcast queries)
    "embedding_near_dup",  # verify stage scores candidate pairs only;
                           # candidate gen is an equi-join on (tbl, bucket)
    "ann_ivf",             # broadcast centroid assignment (16 rows)
    "ann_ivf_kmeans",      # same, refined centroids
    "ann_lsh",             # broadcast final top-k over candidates
    "levenshtein_fuzzy",   # 1-row count aggregates cross-joined
    "bootstrap_prf",       # tiny broadcast of per-doc counts / indexes
    "eval_micro_prf",      # 1-row aggregates
    # expansion oracle twins: BROADCAST(tiny pattern set) theta-joined
    # against the vocabulary-sized dictionary (Heaps-sublinear, never
    # the postings). The scale paths are the from-index variants —
    # StartsWith range seeks on the sorted term_dict / rev_dict
    # sidecars (plan-asserted in test_query_expand / test_rev_dict).
    "bm25_prefix",         # startswith(term, pat) theta-join
    "bm25_wildcard",       # rlike(term, rx) theta-join
    "bm25_regexp",         # rlike(term, rx) theta-join
}

# driver-side-iterative or reference-IO-heavy entries: plan built by
# loops / external files, not a single DataFrame — checked elsewhere
SKIP = {"reference_golden_metrics", "bootstrap_stats", "multimodal_features",
        "ann_ivf_kmeans", "ann_pq"}

_ALL = {**se.queries(), **se.queries_extra()}
NAMES = sorted(set(_ALL) - SKIP)


@pytest.mark.parametrize("name", NAMES)
def test_no_accidental_cross_join(spark, name):
    df = _ALL[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_nested = ("CartesianProduct" in plan
                  or "BroadcastNestedLoopJoin" in plan)
    if name in ALLOWED_NESTED_LOOP:
        return  # intentional broadcast nested-loop baseline
    assert not has_nested, (
        f"{name}: unexpected cartesian/nested-loop node in plan — "
        "this operator would not survive scale-up"
    )
