"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — planted near-duplicates must be found; disjoint docs must not."""

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # 1-token edit
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1
        (4, "completely different content about chemistry and iron compounds"),
        (5, "another unrelated document discussing spark query engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(corpus):
    kept = dedup.exact_dedup(corpus)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == {1, 3, 4, 5}
    groups = dedup.exact_dup_groups(corpus).collect()
    assert len(groups) == 1 and groups[0].n_dups == 2 and groups[0].keep_doc_id == 1


def test_shingles(corpus):
    sh = dedup.token_shingles(corpus.filter("doc_id = 1"), k=3)
    n_tokens = 14
    assert sh.count() <= n_tokens - 2  # distinct shingles


def test_ngram_jaccard(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.5,
                                           max_shingle_df=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (4, 5) not in pairs


def test_minhash_lsh(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(corpus, num_hashes=32, bands=8,
                                         threshold=0.4).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert (4, 5) not in pairs


def test_simhash_near_pairs(corpus):
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_near_pairs(corpus, max_hamming=10).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0
    assert (4, 5) not in pairs


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),       # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    result = dedup.embedding_near_dup(emb, threshold=0.95, dim=4,
                                      n_planes=6, n_tables=4)
    pairs = {(r.id_a, r.id_b) for r in result.collect()}
    assert pairs == {(1, 2)}


def test_embedding_near_dup_no_cross_join(spark):
    """The near-dup plan must be a bucketed equi-join — at 10^12 docs an
    all-pairs plan is fatal, so its physical nodes are banned outright."""
    rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    result = dedup.embedding_near_dup(emb, dim=4, n_planes=4, n_tables=2)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_boilerplate_heavy(spark):
    """Hot boilerplate shingles (df >> max_shingle_df) must stay out of
    BOTH candidate generation and the verification self-join: 60 docs
    share a boilerplate sentence; only the one true near-dup pair with
    shared rare shingles comes out."""
    boiler = "subscribe to our newsletter for daily updates and offers"
    rows = [(i, f"unique{i} token{i} word{i} extra{i} " + boiler)
            for i in range(60)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta eta iota")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5,
                                           max_shingle_df=5).collect()
    }
    assert set(pairs) == {(100, 101)}
    assert pairs[(100, 101)] == round(5 / 7, 6)


def test_dup_components_chain(spark):
    """Transitive closure: a chain a-b, b-c collapses into one component
    even though (a, c) was never a pair; disjoint pairs stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.component
           for r in dedup.dup_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_dup_components_long_chain(spark):
    """Chain diameter >> round budget: a 400-node path converges in
    O(log n) alternating star rounds (the old min-label loop needed
    O(diameter) rounds and silently returned wrong labels past
    max_iter). All nodes must collapse to component 0."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component
           for r in dedup.dup_components(pairs, max_iter=15).collect()}
    assert got == {i: 0 for i in range(401)}


def test_keep_canonical(spark):
    """Keep-one-per-group: chained groups collapse to their min id;
    unpaired docs survive."""
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r.doc_id
           for r in dedup.keep_canonical(docs, pairs).collect()}
    assert got == {0, 1, 4, 5, 7}


def test_dup_components_matches_union_find(spark):
    """Property check: min-label propagation equals a driver-side
    union-find closure on a pseudo-random (seeded) edge set with chains,
    stars, and cycles."""
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        )
        if a != b
    })
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {n for e in edges for n in e}
    expected = {}
    for n in touched:
        root = find(n)
        expected[n] = min(m for m in touched if find(m) == root)

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component
           for r in dedup.dup_components(pairs).collect()}
    assert got == expected
