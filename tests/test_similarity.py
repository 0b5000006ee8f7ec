"""ANN vs brute-force: exactness of the baseline, recall of the LSH path."""

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qs(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_brute_force_self_rank1(emb, qs):
    top = similarity.brute_force_topk(emb, qs, k=3)
    r1 = {r.q_id: r.vec_id for r in top.filter("rank = 1").collect()}
    assert r1 == {q: q for q in range(8)}  # self-match at rank 1, cosine 1.0


def test_brute_force_deterministic(emb, qs):
    a = sorted(map(tuple, similarity.brute_force_topk(emb, qs, k=5).collect()))
    b = sorted(map(tuple, similarity.brute_force_topk(
        emb.repartition(16), qs, k=5).collect()))
    assert a == b


def test_ivf_self_rank1_and_recall(emb, qs):
    """IVF: self-match must be found (a query identical to a corpus vector
    lands in the same cell it was assigned to), and recall vs brute force
    stays useful at nprobe=4/16 cells."""
    k = 5
    brute = similarity.brute_force_topk(emb, qs, k=k).collect()
    approx = similarity.ivf_topk(emb, qs, k=k, n_centroids=16, nprobe=4).collect()
    got = {(r.q_id, r.vec_id) for r in approx}
    assert all((q, q) in got for q in range(8))
    truth = {(r.q_id, r.vec_id) for r in brute}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_lsh_recall(emb, qs):
    k = 5
    brute = similarity.brute_force_topk(emb, qs, k=k).collect()
    # short codes + many tables: these embeddings are near-isotropic, so
    # longer codes shatter true neighbors across buckets
    approx = similarity.lsh_topk(emb, qs, k=k, dim=64, n_planes=4,
                                 n_tables=16, seed=42).collect()
    truth = {(r.q_id, r.vec_id) for r in brute}
    got = {(r.q_id, r.vec_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall}"
    # self-match must always survive (identical vectors share all buckets)
    assert all((q, q) in got for q in range(8))
