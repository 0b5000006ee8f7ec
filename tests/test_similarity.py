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


def _clustered_emb(spark):
    """8 tight clusters, rows ordered cluster-major so naive first-N
    centroid init degenerates (all init vectors land in cluster 0)."""
    import numpy as np

    rng = np.random.default_rng(3)
    dim = 16
    centers = rng.standard_normal((8, dim)) * 3.0
    rows, vid = [], 0
    for ci in range(8):
        for _ in range(25):
            vec = centers[ci] + rng.standard_normal(dim) * 0.1
            rows.append((vid, [float(x) for x in vec]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_centroids_deterministic(spark):
    emb2 = _clustered_emb(spark)
    a = similarity.kmeans_centroids(emb2, n_centroids=8, n_iter=3).collect()
    b = similarity.kmeans_centroids(emb2, n_centroids=8, n_iter=3).collect()
    assert sorted((r.c_id, tuple(r.c_vec)) for r in a) == \
        sorted((r.c_id, tuple(r.c_vec)) for r in b)


def test_ivf_kmeans_beats_first_n(spark):
    """Lloyd-refined centroids must (a) keep recall-vs-brute at least as
    good as first-N init and high in absolute terms, and (b) produce
    BALANCED cells — first-N init on cluster-ordered data puts every
    centroid inside one cluster, so cells degenerate and probe pruning
    stops working at scale (nprobe/n_centroids of the corpus is the whole
    point of IVF)."""
    emb2 = _clustered_emb(spark)
    qs2 = emb2.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = {
        (r.q_id, r.vec_id)
        for r in similarity.brute_force_topk(emb2, qs2, k=5).collect()
    }
    first_n = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk(emb2, qs2, k=5, n_centroids=8,
                                     nprobe=2).collect()
    }
    cents = similarity.kmeans_centroids(emb2, n_centroids=8, n_iter=5)
    km = {
        (r.q_id, r.vec_id)
        for r in similarity.ivf_topk(emb2, qs2, k=5, n_centroids=8, nprobe=2,
                                     centroids=cents).collect()
    }
    recall_first = len(first_n & brute) / len(brute)
    recall_km = len(km & brute) / len(brute)
    assert recall_km >= recall_first
    assert recall_km >= 0.95

    def max_cell(centroids):
        if centroids is None:
            centroids = emb2.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_vec"),
            )
        sizes = (
            similarity.ivf_assign(emb2, centroids)
            .groupBy("cell").count().collect()
        )
        return max(r["count"] for r in sizes)

    # balanced cells: k-means' biggest cell is a fraction of the
    # degenerate init's (which swallows ~the whole corpus)
    assert max_cell(cents) <= 0.5 * max_cell(None)


def test_pq_adc_recall_and_determinism(spark):
    """Product quantization: codebooks train deterministically on the
    hash-ordered sample; ADC top-k over 1-byte-per-subspace codes reaches
    high recall vs exact cosine on clustered data."""
    emb2 = _clustered_emb(spark)
    books = similarity.pq_train(emb2, m=4, ks=16, sample_size=200, n_iter=8)
    books2 = similarity.pq_train(emb2, m=4, ks=16, sample_size=200, n_iter=8)
    import numpy as np

    assert np.array_equal(books, books2)
    assert books.shape == (4, 16, 4)

    codes = similarity.pq_encode(emb2, books).cache()
    assert codes.count() == emb2.count()
    row = codes.first()
    assert len(bytes(row["codes"])) == 4

    qs2 = emb2.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = similarity.pq_topk(codes, books, qs2, k=5)
    rows = got.collect()
    # PQ quantizes every point of a tight cluster to the SAME code, so
    # within-cluster order is tie-broken by id — exact-top-5 recall is
    # undefined at this codebook size. The PQ guarantee is cluster-level:
    # every retrieved neighbor comes from the query's cluster
    # (cluster = vec_id // 25 by construction of _clustered_emb).
    same_cluster = sum(1 for r in rows if r.vec_id // 25 == r.q_id // 25)
    assert same_cluster / len(rows) >= 0.95, same_cluster / len(rows)
    assert len(rows) == qs2.count() * 5
    # determinism of the scan + merge
    again = {(r.q_id, r.vec_id, r.rank) for r in
             similarity.pq_topk(codes, books, qs2, k=5).collect()}
    assert {(r.q_id, r.vec_id, r.rank) for r in got.collect()} == again


def test_ivf_pq_own_cell_exact_under_skew(spark):
    """Regression (round-2 advice): the old implementation cut to a
    per-query global top-(n_centroids*k) over the UNION of all queries'
    probed cells before restricting to own cells — under skewed cells a
    query could lose own-cell candidates and return < k rows. Now the
    own-cell restriction happens inside the scan, before any cut: each
    query's result must EQUAL brute-force ADC over exactly its own
    probed cells' vectors."""
    import numpy as np

    emb2 = _clustered_emb(spark)
    qs2 = emb2.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    n_centroids, nprobe, k = 8, 2, 5
    cents = similarity.kmeans_centroids(emb2, n_centroids=n_centroids,
                                        n_iter=5)
    got = similarity.ivf_pq_topk(emb2, qs2, k=k, n_centroids=n_centroids,
                                 nprobe=nprobe, m=4, ks=16, sample_size=200,
                                 centroids=cents).collect()
    # ground truth: ADC scores recomputed in numpy over own probed cells
    books = similarity.pq_train(emb2, m=4, ks=16, sample_size=200)
    assigned = {r["id"]: int(r["cell"])
                for r in similarity.ivf_assign(emb2, cents).collect()}
    codes = {r["id"]: np.frombuffer(bytes(r["codes"]), dtype=np.uint8)
             for r in similarity.pq_encode(emb2, books).collect()}
    cent_rows = cents.select(
        "c_id", F.transform("c_vec", lambda x: x.cast("double")).alias("cv")
    ).collect()
    q_rows = qs2.select(
        F.col("q_id").alias("qid"),
        F.transform("q_vec", lambda x: x.cast("double")).alias("q"),
    ).collect()
    cells_by_q = similarity._probe_cells(q_rows, cent_rows, nprobe)
    m, ks_, dsub = books.shape
    want = {}
    for r in q_rows:
        q = np.asarray(r["q"], dtype=np.float64)
        q = q / np.linalg.norm(q)
        lut = np.einsum("jd,jcd->jc", q.reshape(m, dsub), books)
        scored = []
        for vid, cell in assigned.items():
            if cell not in cells_by_q[int(r["qid"])]:
                continue
            s = round(float(lut[np.arange(m), codes[vid]].sum()), 6)
            scored.append((-s, vid))
        scored.sort()
        want[int(r["qid"])] = [(vid, -negs) for negs, vid in scored[:k]]
    got_by_q = {}
    for row in sorted(got, key=lambda r: (r.q_id, r.rank)):
        got_by_q.setdefault(row.q_id, []).append((row.vec_id, row.adc_score))
    assert got_by_q == want
    assert all(len(v) == k for v in got_by_q.values())


def test_ann_index_roundtrip_and_pruning(spark, tmp_path):
    """write_ann_index -> ann_topk_from_index: result-identical to the
    in-memory ivf_pq_topk with the same trained artifacts (training is
    deterministic), and the codes scan shows PartitionFilters on the
    cell directory — the probe list IS partition pruning."""
    emb2 = _clustered_emb(spark)
    qs2 = emb2.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    path = str(tmp_path / "ann_idx")
    similarity.write_ann_index(emb2, path, n_centroids=8, m=4, ks=16,
                               sample_size=200, store_vectors=True)
    idx = similarity.read_ann_index(spark, path)
    got = {(r.q_id, r.vec_id, r.adc_score, r.rank)
           for r in similarity.ann_topk_from_index(
               spark, path, qs2, k=5, nprobe=2, index=idx).collect()}
    cents = similarity.kmeans_centroids(emb2, n_centroids=8, n_iter=5)
    want = {(r.q_id, r.vec_id, r.adc_score, r.rank)
            for r in similarity.ivf_pq_topk(
                emb2, qs2, k=5, n_centroids=8, nprobe=2, m=4, ks=16,
                sample_size=200, centroids=cents).collect()}
    assert got == want and len(got) > 0

    import contextlib
    import io

    codes, cent_rows, books = idx
    probe = codes.filter(F.col("cell").isin([0, 1]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell" in plan

    # IVF-Flat layer: exact cosine from the written vectors matches the
    # in-memory ivf_topk with the same (deterministic) centroids
    got_flat = {(r.q_id, r.vec_id, r.cosine, r.rank)
                for r in similarity.ivf_topk_from_index(
                    spark, path, qs2, k=5, nprobe=2).collect()}
    want_flat = {(r.q_id, r.vec_id, r.cosine, r.rank)
                 for r in similarity.ivf_topk(
                     emb2, qs2, k=5, n_centroids=8, nprobe=2,
                     centroids=cents).collect()}
    assert got_flat == want_flat and len(got_flat) > 0


def test_ivf_pq_cluster_recall(spark):
    """IVF-PQ composition: probe-pruned ADC scan still retrieves from the
    query's own cluster, and returns exactly k rows per query."""
    emb2 = _clustered_emb(spark)
    qs2 = emb2.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = similarity.ivf_pq_topk(emb2, qs2, k=5, n_centroids=8, nprobe=2,
                                 m=4, ks=16, sample_size=200).collect()
    same_cluster = sum(1 for r in got if r.vec_id // 25 == r.q_id // 25)
    assert same_cluster / len(got) >= 0.9, same_cluster / len(got)
    per_q = {}
    for r in got:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
    assert all(v == 5 for v in per_q.values())


def test_round6_half_up_matches_spark(spark):
    """_probe_cells' rounding must mirror F.round (HALF_UP) exactly,
    including half-ULP decimal boundaries where np.round (banker's)
    diverges: 25/128 = 0.1953125 is exactly representable and rounds to
    .195313 under HALF_UP but .195312 under half-to-even."""
    import numpy as np

    vals = [25 / 128, -25 / 128, 3 / 256, -3 / 256, 0.123456749,
            1.0, 0.0, -1.0, 7 / 64, 0.9999995]
    got = similarity._round6_half_up(np.asarray(vals))
    rows = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).select(F.round("x", 6).alias("r")).collect()
    want = [r.r for r in rows]
    assert list(got) == want
    # and the banker's divergence is real (the bug the helper fixes)
    assert float(np.round(25 / 128, 6)) != want[0]


def test_pq_adc_scan_half_up_boundary(spark):
    """The ADC scan's score rounding must be HALF_UP like F.round and the
    DuckDB oracle — np.round (banker's) flips scores landing exactly on a
    half-ULP decimal boundary. Constructed case: unit query [1,0], single
    subspace whose codeword 0 is [25/128, 0], so the unrounded ADC score
    is exactly 0.1953125 -> 0.195313 under HALF_UP, 0.195312 under
    banker's (the pre-fix behavior)."""
    import numpy as np

    books = np.zeros((1, 2, 2), dtype=np.float64)
    books[0, 0] = [25 / 128, 0.0]
    books[0, 1] = [0.0, 1.0]
    codes_df = spark.createDataFrame(
        [(1, bytes([0]))], "id long, codes binary")
    q_rows = [{"qid": 7, "q": [1.0, 0.0]}]
    got = similarity._pq_adc_scan(codes_df, books, q_rows, k=1).collect()
    assert len(got) == 1
    assert got[0].adc_score == 0.195313, got[0].adc_score
    assert float(np.round(25 / 128, 6)) == 0.195312  # banker's diverges


def test_append_ann_index(spark, tmp_path):
    """Frozen-quantizer ANN appends: appended codes equal a full
    re-encode with the SAME stored artifacts (content identity),
    disjointness is enforced, a killed append resumes to the identical
    index, and appended vectors are immediately queryable (exact layer
    self-match at rank 1)."""
    import shutil as _sh

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 300)
    delta = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    idx = str(tmp_path / "ann_idx")
    similarity.write_ann_index(base, idx, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    idx2 = str(tmp_path / "ann_idx_crash")
    _sh.copytree(idx, idx2)

    # re-ingest raises; skip drops
    with pytest.raises(ValueError, match="already exist"):
        similarity.append_ann_index(spark, idx, base.limit(10))
    assert similarity.append_ann_index(
        spark, idx, base.limit(10), on_conflict="skip") == 0

    n = similarity.append_ann_index(spark, idx, delta)
    assert n == 100

    # content identity: codes of the appended index == full corpus
    # encoded/assigned with the index's own stored artifacts
    codes_df, cent_rows, books = similarity.read_ann_index(spark, idx)
    got = {r["id"]: (r["cell"], bytes(r["codes"]))
           for r in codes_df.collect()}
    cents = spark.read.parquet(f"{idx}/centroids")
    both = base.unionByName(delta)
    assigned = similarity.ivf_assign(both, cents)
    want_codes = similarity.pq_encode(
        assigned.select(F.col("id").alias("vec_id"),
                        F.col("v").alias("embedding")), books
    ).join(assigned.select("id", "cell"), "id")
    want = {r["id"]: (r["cell"], bytes(r["codes"]))
            for r in want_codes.collect()}
    assert got == want and len(got) == 400
    # vectors layer appended too
    assert spark.read.option("basePath", f"{idx}/vectors").parquet(
        f"{idx}/vectors").count() == 400

    # appended vectors are queryable: exact in-cell cosine self-match
    qs = delta.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    top = similarity.ivf_topk_from_index(spark, idx, qs, k=3, nprobe=2)
    r1 = {r.q_id: r.vec_id for r in top.filter("rank = 1").collect()}
    assert all(q == v for q, v in r1.items()) and len(r1) == 5

    # crash-resume: abort after 1 unit commit, then resume; codes content
    # must equal the uninterrupted append's
    similarity.append_ann_index(spark, idx2, delta, fail_after=1)
    lin = spark.read.parquet(f"{idx2}/append_lineage")
    assert lin.count() == 1
    # torn state is DETECTED, not silently served: both layer readers
    # refuse while the batch is in flight (codes/vectors may disagree)
    with pytest.raises(ValueError, match="not fully committed"):
        similarity.read_ann_index(spark, idx2)
    with pytest.raises(ValueError, match="not fully committed"):
        similarity.ivf_topk_from_index(spark, idx2, qs, k=1)
    similarity.append_ann_index(spark, idx2, delta)  # auto-resume
    codes2, _, _ = similarity.read_ann_index(spark, idx2)
    got2 = {r["id"]: (r["cell"], bytes(r["codes"]))
            for r in codes2.collect()}
    assert got2 == got


def test_append_ann_index_novel_delta_after_crash(spark, tmp_path):
    """A novel delta submitted (batch_id=None) while an unrelated
    crashed ANN batch is in flight finishes the crashed batch AND
    ingests the new vectors as their own batch — previously the novel
    delta was silently dropped. Commit units interleave (vectors,
    codes) per cell, exact layer first."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 300)
    d1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    d2 = emb.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 400))
    idx = str(tmp_path / "ann_novel")
    similarity.write_ann_index(base, idx, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    similarity.append_ann_index(spark, idx, d1, fail_after=1)
    n = similarity.append_ann_index(spark, idx, d2)
    assert n == 50  # the NEW delta's count, not the resumed batch's
    codes_df, _, _ = similarity.read_ann_index(spark, idx)
    assert codes_df.count() == 400
    assert spark.read.option("basePath", f"{idx}/vectors").parquet(
        f"{idx}/vectors").count() == 400
    # per-cell interleaving: the first committed unit was a vectors cell
    lin = spark.read.parquet(f"{idx}/append_lineage").orderBy(
        "committed_at").collect()
    first_units = [r.unit for r in lin if r.batch_id == "b0000"]
    assert first_units[0].startswith("vectors/")


def test_ann_append_drift_guard(spark, tmp_path):
    """Frozen-quantizer appends refuse past the drift threshold (the ANN
    analogue of compact_index's rebuild_threshold): recall under stale
    centroids/codebooks silently decays, so the guard prices the
    recluster as the rebuild it is. Retraining with write_ann_index over
    the full corpus restores the contract (self-recall@1 == 1 through
    the exact layer for the formerly-drifted vectors)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 200)
    small = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 260))
    big = emb.filter((F.col("vec_id") >= 260) & (F.col("vec_id") < 400))
    idx = str(tmp_path / "ann_drift")
    similarity.write_ann_index(base, idx, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    # 60/200 = 30% appended: under the default 50% threshold
    assert similarity.append_ann_index(spark, idx, small) == 60
    # +140 would be 100% appended: refused, message prices the retrain
    with pytest.raises(ValueError, match="[Rr]etrain"):
        similarity.append_ann_index(spark, idx, big)
    # explicit override still works (operator's informed choice)
    assert similarity.append_ann_index(spark, idx, big,
                                       drift_threshold=None) == 140
    # retrain over the full corpus restores the recall contract
    idx2 = str(tmp_path / "ann_retrained")
    full = emb.filter(F.col("vec_id") < 400)
    similarity.write_ann_index(full, idx2, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    qs = big.limit(8).select(F.col("vec_id").alias("q_id"),
                             F.col("embedding").alias("q_vec"))
    top = similarity.ivf_topk_from_index(spark, idx2, qs, k=1, nprobe=2)
    r1 = {r.q_id: r.vec_id for r in top.collect()}
    assert len(r1) == 8 and all(q == v for q, v in r1.items())


def test_ann_vector_deletes(spark, tmp_path):
    """Vector deletes on an ANN index: index_build.delete_docs works
    unchanged (membership = codes ids), both query layers drop the
    tombstoned vectors BEFORE their top-k cuts (ADC mask inside the
    scan, exact-layer anti-join), and compact_ann_index purges them
    physically from codes + vectors and clears the sidecar."""
    from cer_for_mti_spark.operators import index_build as ib

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 400)
    idx = str(tmp_path / "ann_del")
    similarity.write_ann_index(base, idx, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    qs = base.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))

    # before deletes: self-match at rank 1 on both layers
    adc1 = {r.q_id: r.vec_id for r in similarity.ann_topk_from_index(
        spark, idx, qs, k=1, nprobe=2).filter("rank = 1").collect()}
    exact1 = {r.q_id: r.vec_id for r in similarity.ivf_topk_from_index(
        spark, idx, qs, k=1, nprobe=2).filter("rank = 1").collect()}
    assert all(q == v for q, v in exact1.items()) and len(exact1) > 2

    # tombstone the query vectors themselves: self can no longer match
    victims = sorted(exact1)
    n = ib.delete_docs(spark, idx, spark.createDataFrame(
        [(int(v),) for v in victims], "doc_id long"))
    assert n == len(victims)
    # unknown ids are membership-filtered even on ANN (codes ids)
    assert ib.delete_docs(spark, idx, spark.createDataFrame(
        [(999_999,)], "doc_id long")) == 0

    adc2 = similarity.ann_topk_from_index(spark, idx, qs, k=3,
                                          nprobe=2).collect()
    exact2 = similarity.ivf_topk_from_index(spark, idx, qs, k=3,
                                            nprobe=2).collect()
    assert not {r.vec_id for r in adc2} & set(victims)
    assert not {r.vec_id for r in exact2} & set(victims)
    assert adc2 and exact2  # still k results per query from survivors

    # physical purge: ids gone from both layers, sidecar cleared,
    # query results unchanged vs the masked ones
    import os as _os

    key_a = sorted((r.q_id, r.vec_id, r.rank) for r in adc2)
    key_e = sorted((r.q_id, r.vec_id, r.rank) for r in exact2)
    assert similarity.compact_ann_index(spark, idx) == len(victims)
    assert not _os.path.isdir(f"{idx}/tombstones")
    codes_df, _, _ = similarity.read_ann_index(spark, idx)
    assert codes_df.count() == 400 - len(victims)
    assert not {r.id for r in codes_df.select("id").collect()} & set(victims)
    assert spark.read.option("basePath", f"{idx}/vectors").parquet(
        f"{idx}/vectors").count() == 400 - len(victims)
    adc3 = similarity.ann_topk_from_index(spark, idx, qs, k=3,
                                          nprobe=2).collect()
    exact3 = similarity.ivf_topk_from_index(spark, idx, qs, k=3,
                                            nprobe=2).collect()
    assert sorted((r.q_id, r.vec_id, r.rank) for r in adc3) == key_a
    assert sorted((r.q_id, r.vec_id, r.rank) for r in exact3) == key_e
    assert similarity.compact_ann_index(spark, idx) == 0  # idempotent


def test_ann_manifest_commit_mode(spark, tmp_path):
    """Object-store-safe ANN index: commit_mode="manifest" writes base
    manifests for every layer, appends commit by copy + manifest via the
    shared protocol, readers list committed files only (a planted torn
    object is invisible forever — no cleanup needed), a killed batch
    makes readers raise (torn-membership contract), and the resumed
    index is content-identical to a rename-mode twin. Vector deletes +
    compact_ann_index keep working; compaction regenerates manifests."""
    import os as _os

    from cer_for_mti_spark.operators import index_build as ib

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 300)
    delta = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 360))
    idx_m = str(tmp_path / "ann_manifest")
    idx_r = str(tmp_path / "ann_rename")
    similarity.write_ann_index(base, idx_m, n_centroids=8, m=8, ks=16,
                               store_vectors=True, commit_mode="manifest")
    similarity.write_ann_index(base, idx_r, n_centroids=8, m=8, ks=16,
                               store_vectors=True)
    assert ib._index_commit_mode(idx_m) == "manifest"
    assert ib._index_commit_mode(idx_r) == "rename"

    qs = base.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))

    def adc(idx, k=3):
        return sorted((r.q_id, r.vec_id, r.rank)
                      for r in similarity.ann_topk_from_index(
                          spark, idx, qs, k=k, nprobe=2).collect())

    def exact(idx, k=3):
        return sorted((r.q_id, r.vec_id, r.rank)
                      for r in similarity.ivf_topk_from_index(
                          spark, idx, qs, k=k, nprobe=2).collect())

    assert adc(idx_m) == adc(idx_r)
    assert exact(idx_m) == exact(idx_r)

    # kill after 1 unit commit: readers must refuse the torn membership
    similarity.append_ann_index(spark, idx_m, delta, fail_after=1)
    with pytest.raises(ValueError, match="staged but not fully"):
        adc(idx_m)
    # plant a torn uncommitted object; in manifest mode it can stay
    # forever — committed manifests never list it
    cell_dirs = sorted(d for d in _os.listdir(f"{idx_m}/codes")
                       if d.startswith("cell="))
    torn = f"{idx_m}/codes/{cell_dirs[0]}/b0000-torn.parquet"
    with open(torn, "wb") as f:
        f.write(b"\x00garbage not parquet")

    similarity.append_ann_index(spark, idx_m, delta)  # resume
    similarity.append_ann_index(spark, idx_r, delta)
    assert _os.path.exists(torn)  # still there, still invisible
    assert adc(idx_m) == adc(idx_r)
    assert exact(idx_m) == exact(idx_r)

    def codes_content(idx):
        rows = ib.read_index_rel(spark, idx, "codes",
                                 with_base_path=True).collect()
        return sorted((r.cell, r.id, bytes(r.codes)) for r in rows)

    assert codes_content(idx_m) == codes_content(idx_r)

    # vector deletes + physical purge in manifest mode; compaction
    # regenerates the base manifests (the torn object, living in a
    # wholesale-replaced dir, is gone with it)
    victims = sorted({v for _, v, r in exact(idx_m) if r == 1})[:3]
    assert ib.delete_docs(spark, idx_m, spark.createDataFrame(
        [(int(v),) for v in victims], "doc_id long")) == len(victims)
    masked_a, masked_e = adc(idx_m, k=3), exact(idx_m, k=3)
    assert not {v for _, v, _ in masked_a} & set(victims)
    assert not {v for _, v, _ in masked_e} & set(victims)
    assert similarity.compact_ann_index(spark, idx_m) == len(victims)
    assert ib._index_commit_mode(idx_m) == "manifest"
    assert sorted(_os.listdir(f"{idx_m}/{ib.MANIFEST_DIR}")) == [
        "base-centroids.json", "base-codebooks.json", "base-codes.json",
        "base-vectors.json"]
    assert not _os.path.exists(torn)
    assert adc(idx_m, k=3) == masked_a
    assert exact(idx_m, k=3) == masked_e
    assert ib.read_index_rel(
        spark, idx_m, "codes", with_base_path=True).count() == \
        360 - len(victims)
