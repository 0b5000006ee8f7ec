"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. Pure
  declarative: broadcast the query vectors, zip_with dot product, window
  top-k. At 100 TB this is a single scan + broadcast (no shuffle of the
  corpus side until the tiny final top-k exchange).
- lsh_topk: sign-random-projection LSH (deterministic seeded hyperplanes)
  — the scale path: bucket join on band keys prunes the corpus scan to
  candidate buckets, then exact re-scoring. Recall is tested vs brute
  force in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k per query. Ties broken by ascending corpus id
    (deterministic). Scores rounded to 6 before ranking (cross-engine
    float stability, same contract as BM25)."""
    corpus = emb.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    qs = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))
    dot = F.aggregate(
        F.zip_with("v", "q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .withColumn("cosine", F.round(dot / (F.col("vnorm") * F.col("qnorm")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("q_id"), F.col("id").alias("vec_id"),
                "cosine", "rank")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               c_id_col: str = "c_id", c_vec_col: str = "c_vec") -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties -> lower
    centroid id). Broadcast the (small) centroid set; the corpus is scanned
    once, no shuffle of the corpus side. -> (id, v, vnorm, cell)."""
    corpus = emb.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    cents = centroids.select(
        F.col(c_id_col).alias("cid"), _as_double(c_vec_col).alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv")))
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = corpus.join(F.broadcast(cents)).withColumn(
        "csim", F.round(dot / (F.col("vnorm") * F.col("cnorm")), 6)
    )
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "v", "vnorm", F.col("cid").alias("cell"))
    )


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_centroids
    cells (centroids default to the first n_centroids corpus vectors —
    deterministic, SQL-reproducible; a k-means refinement would slot in
    here unchanged), probe each query's nprobe nearest cells, exact-score
    only the probed cells.

    Scale shape: the cell assignment is a one-pass broadcast join (at
    100 TB the assigned table is written once, partitioned BY cell, so a
    query's probe list prunes the scan to nprobe/n_centroids of the
    corpus — the IVF analogue of the postings shard pruning)."""
    if centroids is None:
        centroids = emb.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        )
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)

    qs = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))
    cents = centroids.select(
        F.col("c_id").alias("cid"), _as_double("c_vec").alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv")))
    qdot = F.aggregate(
        F.zip_with("q", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    qcells = (
        qs.join(F.broadcast(cents))
        .withColumn("csim", F.round(qdot / (F.col("qnorm") * F.col("cnorm")), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", "q", "qnorm", F.col("cid").alias("cell"))
    )

    dot = F.aggregate(
        F.zip_with("v", "q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = assigned.join(F.broadcast(qcells), "cell").withColumn(
        "cosine", F.round(dot / (F.col("vnorm") * F.col("qnorm")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("q_id"), F.col("id").alias("vec_id"),
                "cosine", "rank")
    )


def kmeans_centroids(emb: DataFrame, n_centroids: int = 16, n_iter: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> DataFrame:
    """Deterministic Lloyd refinement for IVF coarse quantization
    (plugs into ivf_topk's centroids= hook — the slot its docstring
    reserves). Init = the n_centroids vectors with the smallest portable
    hash of their id (seedless but deterministic and order-free, unlike
    first-N which inherits whatever the insert order clustered together).
    Each iteration: broadcast-assign by cosine (one corpus scan, no corpus
    shuffle), then per-cell element-wise mean via posexplode + avg — a
    k·dim-sized aggregate. Means are rounded to 6 decimals so partial-agg
    summation order cannot leak into assignments (same determinism
    contract as the scorers). Empty cells keep their previous centroid.

    Scale shape: per iteration one narrow corpus pass + one tiny agg;
    centroids (k·dim doubles) collect to the driver between iterations,
    truncating the plan lineage."""
    from cer_for_mti_spark.functions.hashing import md5_60

    spark = emb.sparkSession
    v = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    cents_rows = (
        v.withColumn("_h", md5_60(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(n_centroids)
        .select(F.col("id").cast("long").alias("c_id"), F.col("v").alias("c_vec"))
        .collect()
    )
    schema = "c_id long, c_vec array<double>"
    for _ in range(n_iter):
        cents = spark.createDataFrame(
            [(int(r["c_id"]), list(r["c_vec"])) for r in cents_rows], schema
        )
        assigned = ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("c_id"),
                F.transform("pm", lambda s: s["m"]).alias("c_vec"),
            )
        )
        new = {int(r["c_id"]): list(r["c_vec"]) for r in means.collect()}
        cents_rows = [
            {"c_id": int(r["c_id"]),
             "c_vec": new.get(int(r["c_id"]), list(r["c_vec"]))}
            for r in cents_rows
        ]
    return spark.createDataFrame(
        [(r["c_id"], r["c_vec"]) for r in cents_rows], schema
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int, seed: int):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return bucket


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_planes: int = 12, seed: int = 42, n_tables: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate cosine top-k: n_tables independent sign-LSH tables;
    candidates = corpus vectors sharing a bucket with the query in ANY
    table; exact re-score + window top-k on candidates only.

    Scale shape: corpus side is scanned once per table batch (a single
    projected pass computing all bucket ids), the join key is
    (table, bucket) — a plain equi-join Catalyst can shuffle-hash; no
    cross join ever materializes."""
    corpus = emb.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    qs = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))

    c_tagged = None
    q_tagged = None
    for t in range(n_tables):
        bucket = lsh_bucket_udf(dim, n_planes, seed + t)
        ct = corpus.withColumn("bucket", bucket(F.col("v"))).withColumn(
            "tbl", F.lit(t)
        )
        qt = qs.withColumn("bucket", bucket(F.col("q"))).withColumn(
            "tbl", F.lit(t)
        )
        c_tagged = ct if c_tagged is None else c_tagged.union(ct)
        q_tagged = qt if q_tagged is None else q_tagged.union(qt)

    cand = (
        c_tagged.join(q_tagged, ["tbl", "bucket"])
        .select("qid", "q", "qnorm", "id", "v", "vnorm")
        .dropDuplicates(["qid", "id"])
    )
    dot = F.aggregate(
        F.zip_with("v", "q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = cand.withColumn(
        "cosine", F.round(dot / (F.col("vnorm") * F.col("qnorm")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("q_id"), F.col("id").alias("vec_id"),
                "cosine", "rank")
    )


# --- Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the 10^12-vector memory shape: corpus
# vectors live as m one-byte codes (m*1 bytes vs dim*4), queries score
# against codes via per-subspace lookup tables (ADC), never touching a
# raw corpus vector at query time.

def pq_train(emb: DataFrame, m: int = 8, ks: int = 16,
             sample_size: int = 2048, n_iter: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks -> ndarray (m, ks, dim/m).

    Training runs driver-side on a hash-ordered sample (the FAISS shape:
    codebooks are tiny models fit on a bounded sample, then broadcast);
    deterministic — sample order is the portable hash of the id, Lloyd
    init is the first ks sample rows per subspace, numpy float64
    throughout. Vectors are L2-normalized first so ADC inner product
    approximates cosine."""
    from cer_for_mti_spark.functions.hashing import md5_60

    rows = (
        emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .withColumn("_h", md5_60(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    if len(x) < ks:
        raise ValueError(
            f"pq_train needs >= ks={ks} sample vectors, got {len(x)}"
        )
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    books = np.empty((m, ks, dsub))
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cents = sub[:ks].copy()
        for _ in range(n_iter):
            # assign: nearest codeword by L2 (ties -> lowest index)
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books[j] = cents
    return books


def pq_encode(emb: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Corpus -> (id, codes binary(m)). One narrow mapInPandas pass,
    numpy-vectorized argmin per subspace; codes are one byte per
    subquantizer (ks <= 256). At 10^12 vectors this table is ~m TB where
    the raw vectors are dim*4 TB — the compression that makes exhaustive
    ADC scans feasible."""
    m, ks, dsub = codebooks.shape
    books = codebooks  # captured; Spark broadcasts the closure per task

    def encode(batches):
        for pdf in batches:
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                sub = x[:, j * dsub:(j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame({
                "id": pdf["id"],
                "codes": pd.Series([c.tobytes() for c in codes],
                                   dtype=object),
            })

    v = emb.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    return v.mapInPandas(encode, "id long, codes binary")


def pq_topk(codes_df: DataFrame, codebooks: np.ndarray, queries: DataFrame,
            k: int = 5, q_id_col: str = "q_id",
            q_vec_col: str = "q_vec") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query, a (m, ks) LUT
    of inner products between the normalized query subvector and each
    codeword; a corpus code's score = sum over subspaces of
    LUT[j][code[j]] ~= cosine. One mapInPandas scan of the codes emits a
    per-batch top-k per query (numpy fancy indexing — no Python per row),
    then one tiny window merges partitions. Deterministic: scores rounded
    to 6, ties by ascending id."""
    m, ks, dsub = codebooks.shape
    q_rows = queries.select(F.col(q_id_col).alias("qid"),
                            _as_double(q_vec_col).alias("q")).collect()
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "q_id int, vec_id long, adc_score double, rank int")
    qids = [int(r["qid"]) for r in q_rows]
    qm = np.asarray([r["q"] for r in q_rows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # luts[qi, j, c] = <q_sub, codeword>
    luts = np.einsum("qjd,jcd->qjc",
                     qm.reshape(len(qm), m, dsub), codebooks)

    def scan(batches):
        for pdf in batches:
            codes = np.stack(
                [np.frombuffer(bytes(b), dtype=np.uint8)
                 for b in pdf["codes"]]
            )  # (n, m)
            ids = pdf["id"].to_numpy()
            out = {"q_id": [], "vec_id": [], "adc_score": []}
            for qi, qid in enumerate(qids):
                # scores[n] = sum_j luts[qi, j, codes[:, j]]
                scores = np.round(
                    luts[qi][np.arange(m)[None, :], codes].sum(axis=1), 6
                )
                if len(scores) > k:
                    kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                    mask = scores >= kth
                else:
                    mask = np.ones(len(scores), dtype=bool)
                out["q_id"].extend([qid] * int(mask.sum()))
                out["vec_id"].extend(ids[mask].tolist())
                out["adc_score"].extend(scores[mask].tolist())
            yield pd.DataFrame(out)

    cands = codes_df.select("id", "codes").mapInPandas(
        scan, "q_id int, vec_id long, adc_score double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"),
                                           F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc_score", "rank")
    )


def ivf_pq_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                n_centroids: int = 8, nprobe: int = 2, m: int = 8,
                ks: int = 16, sample_size: int = 2048,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                centroids: DataFrame | None = None) -> DataFrame:
    """IVF-PQ: coarse-quantize into cells (kmeans_centroids), store each
    cell's vectors as PQ codes, probe each query's nprobe cells and ADC-
    score only those codes — the full 10^12-vector serving shape: the scan
    touches nprobe/n_centroids of the corpus AND reads m bytes per vector.
    At table scale the codes table is written partitionBy(cell) so the
    probe list becomes partition pruning (same contract as the postings
    shards)."""
    if centroids is None:
        centroids = kmeans_centroids(emb, n_centroids=n_centroids,
                                     id_col=id_col, vec_col=vec_col)
    books = pq_train(emb, m=m, ks=ks, sample_size=sample_size,
                     id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        assigned.select(F.col("id").alias(id_col),
                        F.col("v").alias(vec_col)),
        books, id_col=id_col, vec_col=vec_col,
    ).join(assigned.select("id", "cell"), "id")

    qs = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).withColumn("qnorm", _norm(F.col("q")))
    cents = centroids.select(
        F.col("c_id").alias("cid"), _as_double("c_vec").alias("cv")
    ).withColumn("cnorm", _norm(F.col("cv")))
    qdot = F.aggregate(
        F.zip_with("q", "cv", lambda x, y: x * y), F.lit(0.0),
        lambda a, x: a + x,
    )
    qcells = (
        qs.join(F.broadcast(cents))
        .withColumn("csim", F.round(qdot / (F.col("qnorm") * F.col("cnorm")), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", F.col("cid").alias("cell"))
    )
    probe_cells = {
        int(r["cell"]): None for r in qcells.select("cell").distinct().collect()
    }
    # per-query probe map drives a semi-join prune of the codes scan;
    # scoring itself is the plain PQ ADC scan on the pruned relation,
    # restricted afterwards to each query's own probed cells
    pruned = codes.filter(F.col("cell").isin(list(probe_cells)))
    scored = pq_topk(pruned, books, queries, k=n_centroids * k,
                     q_id_col=q_id_col, q_vec_col=q_vec_col)
    cell_of = codes.select(F.col("id").alias("vec_id"), "cell")
    own = scored.join(cell_of, "vec_id").join(
        qcells.withColumnRenamed("qid", "q_id"), ["q_id", "cell"], "left_semi"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"), F.asc("vec_id"))
    return (
        own.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc_score", "rank")
    )
