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

import os

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


def _pq_adc_scan(codes_df: DataFrame, codebooks: np.ndarray,
                 q_rows: list, k: int,
                 cells_by_q: dict | None = None,
                 tomb: np.ndarray | None = None) -> DataFrame:
    """Shared ADC scan: per query, a (m, ks) LUT of inner products
    between the normalized query subvector and each codeword; a corpus
    code's score = sum over subspaces of LUT[j][code[j]] ~= cosine. One
    mapInPandas scan of the codes emits a per-batch top-k per query
    (numpy fancy indexing — no Python per row), then one tiny window
    merges partitions. Deterministic: scores rounded to 6, ties by
    ascending id. tomb (sorted int64 ids) drops tombstoned vectors
    BEFORE any per-batch top-k cut (delete_docs semantics).

    cells_by_q ({qid: frozenset(cell ids)}, requires a `cell` column):
    each query scores ONLY rows from its OWN probed cells — the prune
    happens BEFORE any top-k cut, so a query can never lose own-cell
    candidates to other queries' cells (the skewed-cells bug a global
    interim cut has) and gets its exact per-cell-restricted top-k."""
    m, ks, dsub = codebooks.shape
    qids = [int(r["qid"]) for r in q_rows]
    qm = np.asarray([r["q"] for r in q_rows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # luts[qi, j, c] = <q_sub, codeword>
    luts = np.einsum("qjd,jcd->qjc",
                     qm.reshape(len(qm), m, dsub), codebooks)
    use_cells = cells_by_q is not None
    cell_arrays = (
        {qid: np.asarray(sorted(cells_by_q.get(qid, ())), dtype=np.int64)
         for qid in qids}
        if use_cells else None
    )

    def scan(batches):
        from cer_for_mti_spark.operators.index_build import isin_sorted

        for pdf in batches:
            if tomb is not None and len(pdf):
                keep = ~isin_sorted(pdf["id"].to_numpy(), tomb)
                if not keep.all():
                    pdf = pdf[keep]
            if not len(pdf):
                continue
            codes = np.stack(
                [np.frombuffer(bytes(b), dtype=np.uint8)
                 for b in pdf["codes"]]
            )  # (n, m)
            ids = pdf["id"].to_numpy()
            cells = pdf["cell"].to_numpy() if use_cells else None
            out = {"q_id": [], "vec_id": [], "adc_score": []}
            for qi, qid in enumerate(qids):
                if use_cells:
                    rows_mask = np.isin(cells, cell_arrays[qid])
                    if not rows_mask.any():
                        continue
                    sub_codes, sub_ids = codes[rows_mask], ids[rows_mask]
                else:
                    sub_codes, sub_ids = codes, ids
                # scores[n] = sum_j luts[qi, j, codes[:, j]]
                # HALF_UP like F.round / the DuckDB oracle — np.round is
                # banker's and flips on half-ULP boundaries (e.g. 25/128)
                scores = _round6_half_up(
                    luts[qi][np.arange(m)[None, :], sub_codes].sum(axis=1)
                )
                if len(scores) > k:
                    kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                    mask = scores >= kth
                else:
                    mask = np.ones(len(scores), dtype=bool)
                out["q_id"].extend([qid] * int(mask.sum()))
                out["vec_id"].extend(sub_ids[mask].tolist())
                out["adc_score"].extend(scores[mask].tolist())
            yield pd.DataFrame(out)

    sel = ["id", "codes"] + (["cell"] if use_cells else [])
    cands = codes_df.select(*sel).mapInPandas(
        scan, "q_id int, vec_id long, adc_score double"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"),
                                           F.asc("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc_score", "rank")
    )


def pq_topk(codes_df: DataFrame, codebooks: np.ndarray, queries: DataFrame,
            k: int = 5, q_id_col: str = "q_id",
            q_vec_col: str = "q_vec") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — exhaustive ADC scan of
    the whole codes table (see _pq_adc_scan for the scan shape)."""
    q_rows = queries.select(F.col(q_id_col).alias("qid"),
                            _as_double(q_vec_col).alias("q")).collect()
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "q_id int, vec_id long, adc_score double, rank int")
    return _pq_adc_scan(codes_df, codebooks, q_rows, k)


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

    q_rows = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).collect()
    if not q_rows:
        return queries.sparkSession.createDataFrame(
            [], "q_id int, vec_id long, adc_score double, rank int")
    cent_rows = centroids.select("c_id", _as_double("c_vec").alias("cv")
                                 ).collect()
    cells_by_q = _probe_cells(q_rows, cent_rows, nprobe)
    # union of all probed cells prunes the codes scan (at table scale,
    # partition pruning on the cell dir — see ann_topk_from_index); the
    # per-QUERY restriction happens INSIDE the scan, before any top-k
    # cut, so skewed cells / wide probe unions can't displace a query's
    # own-cell candidates
    all_cells = sorted({c for cs in cells_by_q.values() for c in cs})
    pruned = codes.filter(F.col("cell").isin(all_cells))
    return _pq_adc_scan(pruned, books, q_rows, k, cells_by_q=cells_by_q)


def _round6_half_up(x: np.ndarray) -> np.ndarray:
    """Round to 6 decimals with Spark F.round's HALF_UP semantics (half
    away from zero). np.round is half-to-EVEN, which diverges on exact
    half-ULP boundaries — e.g. 25/128 = 0.1953125 rounds to 0.195313
    under HALF_UP but 0.195312 under banker's rounding. Same contract as
    the repetition ppm fix: floor(|x|*1e6 + 0.5) on the magnitude, sign
    restored."""
    return np.sign(x) * (np.floor(np.abs(x) * 1e6 + 0.5) / 1e6)


def _probe_cells(q_rows: list, cent_rows: list, nprobe: int) -> dict:
    """{qid: frozenset(nprobe nearest cells)} — numpy twin of the
    declarative qcells computation (round(cosine, 6) desc, cid asc),
    driver-side because centroids are tiny by construction. Rounding is
    _round6_half_up, mirroring F.round exactly so a cosine on a half-ULP
    decimal boundary cannot produce a different probe set than
    ivf_topk/ivf_assign's declarative twin."""
    cids = np.asarray([int(r["c_id"]) for r in cent_rows], dtype=np.int64)
    cm = np.asarray([r["cv"] for r in cent_rows], dtype=np.float64)
    cnorm = np.maximum(np.linalg.norm(cm, axis=1), 1e-300)
    out = {}
    for r in q_rows:
        q = np.asarray(r["q"], dtype=np.float64)
        qn = max(float(np.linalg.norm(q)), 1e-300)
        csim = _round6_half_up(cm @ q / (cnorm * qn))
        order = np.lexsort((cids, -csim))[:nprobe]
        out[int(r["qid"])] = frozenset(int(cids[i]) for i in order)
    return out


def write_ann_index(emb: DataFrame, path: str, n_centroids: int = 16,
                    m: int = 8, ks: int = 16, sample_size: int = 2048,
                    kmeans_iter: int = 5, pq_iter: int = 8,
                    store_vectors: bool = False,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    commit_mode: str = "rename") -> None:
    """Persist the IVF-PQ index: PQ codes partitioned BY CELL (so a
    query's probe list becomes genuine partition pruning at read time —
    the ANN analogue of the postings shard layout), plus the trained
    centroids and codebooks as tiny parquet side tables. Training is
    deterministic (hash-init k-means, hash-ordered PQ sample), so a
    rewritten index is bit-identical.

    Layout: <path>/codes/cell=<i>/ (id, codes binary(m)),
    <path>/centroids (c_id, c_vec), <path>/codebooks (j, c, vec).
    At 10^12 vectors the codes table is ~m bytes/vector; everything a
    query touches is nprobe cell directories of that.

    store_vectors=True additionally writes <path>/vectors/cell=<i>/
    (id, v array<double>, vnorm) — the EXACT-rerank layer: dim*8
    bytes/vector instead of m, but ivf_topk_from_index then scores true
    cosine inside the probed cells (IVF-Flat). At 10^12 vectors you
    usually keep only codes; the vectors layer is the quality knob for
    corpora that fit dim*8 bytes each.

    commit_mode="manifest" makes the index object-store-safe exactly
    like index_build.write_runs_index: base manifests are written for
    every relation, appends/deletes commit by copy + manifest (the
    shared _commit_append_units auto-detects the mode), and readers
    list files from the committed manifests only."""
    cents = kmeans_centroids(emb, n_centroids=n_centroids,
                             n_iter=kmeans_iter, id_col=id_col,
                             vec_col=vec_col)
    books = pq_train(emb, m=m, ks=ks, sample_size=sample_size,
                     n_iter=pq_iter, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        assigned.select(F.col("id").alias(id_col), F.col("v").alias(vec_col)),
        books, id_col=id_col, vec_col=vec_col,
    ).join(assigned.select("id", "cell"), "id")
    # repartition on the partition key first: without it every input task
    # writes a file into every cell dir
    codes.repartition(n_centroids, "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/codes")
    if store_vectors:
        assigned.select("id", "v", "vnorm", "cell").repartition(
            n_centroids, "cell"
        ).write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/vectors"
        )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    book_rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(books.shape[0]) for c in range(books.shape[1])
    ]
    emb.sparkSession.createDataFrame(
        book_rows, "j int, c int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    _write_ann_meta(path, n_base=emb.count())
    if commit_mode == "manifest":
        from cer_for_mti_spark.operators.index_build import (
            _list_data_files,
            _manifest_write,
        )

        rels = ["codes", "centroids", "codebooks"]
        if store_vectors:
            rels.append("vectors")
        for rel in rels:
            _manifest_write(path, f"base-{rel}", _list_data_files(path, rel))
    elif commit_mode != "rename":
        raise ValueError(f"unknown commit_mode {commit_mode!r}")


ANN_META_FILE = "ann_meta.json"


def _write_ann_meta(path: str, n_base: int) -> None:
    """Pin the corpus size the quantizers were TRAINED on (atomic tmp +
    rename) — the denominator of the append-drift guard."""
    import json as _json

    os.makedirs(path, exist_ok=True)
    tmp = f"{path}/.{ANN_META_FILE}.tmp"
    with open(tmp, "w") as f:
        _json.dump({"n_base": int(n_base)}, f)
    os.replace(tmp, f"{path}/{ANN_META_FILE}")


def _read_ann_meta(path: str) -> dict | None:
    import json as _json

    p = f"{path}/{ANN_META_FILE}"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


def _check_no_inflight_append(path: str, reader: str) -> None:
    """Fail loudly when an ANN index has a partially-committed append
    batch: between a cell's codes and vectors unit commits the two
    layers disagree on membership, so a query would silently return
    stale results from whichever layer is behind. The BM25 appends make
    the torn window safe by committing doc_stats last; the ANN layers
    have no such ordering invariant, so readers refuse instead.

    Also rolls forward/back a compact_ann_index two-rename crash first
    (repair_interrupted_compaction on both cell layers) — same reader-
    entry contract as the posting-index readers."""
    from cer_for_mti_spark.operators import index_build as ib_mod

    for rel in ("codes", "vectors"):
        ib_mod.repair_interrupted_compaction(path, rel)
    inflight = ib_mod._find_inflight_batch(path)
    if inflight is not None:
        raise ValueError(
            f"{reader}: append batch {inflight!r} at {path} is staged but "
            "not fully committed — the codes and vectors layers may "
            "disagree on membership. Resume it first (append_ann_index / "
            "`submit_ann.py append` with no batch id completes it)."
        )


def read_ann_index(spark, path: str):
    """-> (codes DF with cell partition column, centroid rows, codebooks
    ndarray). Open the codes DF once and pass it to repeated
    ann_topk_from_index calls: pruning is planning-time."""
    from cer_for_mti_spark.operators.index_build import read_index_rel

    _check_no_inflight_append(path, "read_ann_index")
    codes = read_index_rel(spark, path, "codes", with_base_path=True)
    cent_rows = read_index_rel(spark, path, "centroids").select(
        "c_id", _as_double("c_vec").alias("cv")
    ).collect()
    brows = read_index_rel(spark, path, "codebooks").collect()
    mm = max(r["j"] for r in brows) + 1
    kk = max(r["c"] for r in brows) + 1
    dsub = len(brows[0]["vec"])
    books = np.empty((mm, kk, dsub))
    for r in brows:
        books[r["j"], r["c"]] = r["vec"]
    return codes, cent_rows, books


def ivf_topk_from_index(spark, path: str, queries: DataFrame, k: int = 5,
                        nprobe: int = 2, q_id_col: str = "q_id",
                        q_vec_col: str = "q_vec",
                        tombstones="auto") -> DataFrame:
    """IVF-Flat top-k over a written index's EXACT-vector layer
    (write_ann_index(store_vectors=True)): probe list -> literal cell
    filter (partition pruning), true cosine inside the probed cells
    only, per-query own-cell restriction via the broadcast qcells join.
    Output matches ivf_topk given the same centroids."""
    from cer_for_mti_spark.operators.index_build import read_index_rel

    _check_no_inflight_append(path, "ivf_topk_from_index")
    vectors = read_index_rel(spark, path, "vectors", with_base_path=True)
    if isinstance(tombstones, str) and tombstones == "auto":
        from cer_for_mti_spark.operators.index_build import read_tombstones

        # anti-join against the sidecar RELATION — the exact layer only
        # needs membership, so there is no reason to round-trip up to
        # TOMBSTONE_MAX_IDS ids through a driver list/createDataFrame
        # (compact_ann_index does the same)
        if os.path.isdir(f"{path}/tombstones"):
            vectors = vectors.join(
                read_tombstones(spark, path).withColumnRenamed(
                    "doc_id", "id"),
                "id", "left_anti")
        tombstones = None
    if tombstones is not None and len(tombstones):
        # caller-supplied id array (tests / ad-hoc masks): small by
        # contract, broadcast anti-join
        tomb_df = spark.createDataFrame(
            [(int(i),) for i in tombstones], "id long")
        vectors = vectors.join(F.broadcast(tomb_df), "id", "left_anti")
    cent_rows = read_index_rel(spark, path, "centroids").select(
        "c_id", _as_double("c_vec").alias("cv")
    ).collect()
    q_rows = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).collect()
    if not q_rows:
        return spark.createDataFrame(
            [], "q_id long, vec_id long, cosine double, rank int")
    cells_by_q = _probe_cells(q_rows, cent_rows, nprobe)
    all_cells = sorted({c for cs in cells_by_q.values() for c in cs})
    pruned = vectors.filter(F.col("cell").isin(all_cells))
    qcells = spark.createDataFrame(
        [(int(r["qid"]), list(r["q"]), int(c))
         for r in q_rows for c in cells_by_q[int(r["qid"])]],
        "qid long, q array<double>, cell long",
    ).withColumn("qnorm", _norm(F.col("q")))
    dot = F.aggregate(
        F.zip_with("v", "q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = pruned.join(F.broadcast(qcells), "cell").withColumn(
        "cosine", F.round(dot / (F.col("vnorm") * F.col("qnorm")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("q_id"), F.col("id").alias("vec_id"),
                "cosine", "rank")
    )


def ann_topk_from_index(spark, path: str, queries: DataFrame, k: int = 5,
                        nprobe: int = 2, q_id_col: str = "q_id",
                        q_vec_col: str = "q_vec",
                        index=None, tombstones="auto") -> DataFrame:
    """IVF-PQ top-k over a WRITTEN index: the probe list is a literal
    `cell IN (...)` filter on the partition column, so only nprobe cell
    DIRECTORIES are read (PartitionFilters — plan-asserted in tests);
    ADC scoring reads m bytes/vector of those. Per-query own-cell
    restriction happens inside the scan, before any top-k cut.
    Result-identical to ivf_pq_topk with the same trained artifacts."""
    codes, cent_rows, books = index if index is not None else read_ann_index(
        spark, path
    )
    q_rows = queries.select(
        F.col(q_id_col).alias("qid"), _as_double(q_vec_col).alias("q")
    ).collect()
    if not q_rows:
        return spark.createDataFrame(
            [], "q_id int, vec_id long, adc_score double, rank int")
    cells_by_q = _probe_cells(q_rows, cent_rows, nprobe)
    all_cells = sorted({c for cs in cells_by_q.values() for c in cs})
    pruned = codes.filter(F.col("cell").isin(all_cells))
    if isinstance(tombstones, str) and tombstones == "auto":
        from cer_for_mti_spark.operators.index_build import load_tombstones

        tombstones = load_tombstones(spark, path)
    return _pq_adc_scan(pruned, books, q_rows, k, cells_by_q=cells_by_q,
                        tomb=tombstones)


def compact_ann_index(spark, path: str) -> int:
    """Physically purge tombstoned vectors (index_build.delete_docs on
    an ANN index) from the codes — and, when present, vectors — layers:
    each layer is rewritten without the deleted ids through the same
    staged two-rename swap the posting compactors use (crashes repaired
    by repair_interrupted_compaction on every reader/append entry), the
    cell partitioning is preserved, and the tombstone sidecar clears
    LAST so every crash window stays consistent (masking an
    already-purged id is a no-op). The trained centroids/codebooks are
    untouched — deletes do not drift the quantizers, so ann_meta's
    n_base (the drift-guard denominator) keeps its meaning. Returns the
    number of vectors purged."""
    import shutil as _shutil

    from cer_for_mti_spark.operators import index_build as ib_mod

    for rel in ("codes", "vectors"):
        ib_mod.repair_interrupted_compaction(path, rel)
    inflight = ib_mod._find_inflight_batch(path)
    if inflight is not None:
        raise ValueError(
            f"compact_ann_index: batch {inflight!r} is staged but not "
            f"fully committed at {path}; resume it first."
        )
    tomb = ib_mod.read_tombstones(spark, path)
    n_tomb = tomb.count()
    if not n_tomb:
        return 0
    # the purge itself is a plain anti-join, so it scales past the
    # query-time masking bound: broadcast only small delete sets, let a
    # shuffled anti-join handle arbitrarily large ones
    tomb_ids = tomb.select(F.col("doc_id").alias("id"))
    if n_tomb <= ib_mod.TOMBSTONE_MAX_IDS:
        tomb_ids = F.broadcast(tomb_ids)
    staging_root = f"{path}/.compact_staging"
    for rel in ("codes", "vectors"):
        final = f"{path}/{rel}"
        if not os.path.isdir(final):
            continue
        # manifest-aware: compact only what the manifests commit
        df = ib_mod.read_index_rel(spark, path, rel, with_base_path=True)
        kept = df.join(tomb_ids, "id", "left_anti")
        n_cells = df.select("cell").distinct().count()
        _shutil.rmtree(staging_root, ignore_errors=True)
        kept.repartition(max(1, n_cells), "cell").write.mode(
            "overwrite").partitionBy("cell").parquet(f"{staging_root}/{rel}")
        trash = f"{path}/.{rel}_old"
        _shutil.rmtree(trash, ignore_errors=True)
        os.rename(final, trash)
        os.rename(f"{staging_root}/{rel}", final)
        _shutil.rmtree(trash)
        _shutil.rmtree(staging_root, ignore_errors=True)
    _shutil.rmtree(f"{path}/tombstones", ignore_errors=True)
    if ib_mod._index_commit_mode(path) == "manifest":
        # offline rename-based maintenance on a manifest-mode index:
        # regenerate the manifests to point at the compacted files
        _shutil.rmtree(f"{path}/{ib_mod.MANIFEST_DIR}", ignore_errors=True)
        for rel in ("codes", "vectors", "centroids", "codebooks"):
            if os.path.isdir(f"{path}/{rel}"):
                ib_mod._manifest_write(path, f"base-{rel}",
                                       ib_mod._list_data_files(path, rel))
    return int(n_tomb)


def append_ann_index(spark, path: str, new_emb: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     on_conflict: str = "error",
                     batch_id: str | None = None,
                     fail_after: int | None = None,
                     drift_threshold: float | None = 0.5) -> int:
    """Incremental vector ingest into a written IVF-PQ index: new vectors
    are assigned to the EXISTING centroids and encoded with the EXISTING
    codebooks, then their codes (and exact vectors, when the index has
    the store_vectors layer) are appended into the cell directories.

    Frozen-quantizer contract — the ANN analogue of the BM25 appends'
    frozen avgdl: the appended index is CONTENT-IDENTICAL to re-encoding
    the full corpus with the same trained artifacts (tested), but cell
    balance and recall drift under distribution shift are not repaired
    by appends; recluster = write_ann_index again, priced as the rebuild
    it is (same policy as compact_index's stats-refresh).

    id disjointness is ENFORCED (a re-ingested id would appear twice in
    ADC top-k): existing ids raise, or are anti-joined out with
    on_conflict='skip'. The write is staged + lineage-committed +
    resumable, reusing index_build's append-unit protocol (one unit per
    cell dir, vectors layer after codes); a crash is repaired by calling
    again. Returns the number of vectors appended."""
    import shutil as _shutil

    from cer_for_mti_spark.operators import index_build as ib_mod

    inflight = ib_mod._find_inflight_batch(path)
    if batch_id is None:
        if inflight is not None:
            # A crashed batch is in flight and the caller did not name
            # it. Finish it FIRST (its staged bytes are fixed; this
            # call's new_emb plays no part in it); a new_emb fully
            # contained in the now-committed ids is a pure re-send of
            # the crashed delta (return the resumed count), while novel
            # vectors fall through to their own batch. Previously a
            # novel delta was silently dropped here while the resumed
            # batch's count was reported as if it were its.
            n_resumed = append_ann_index(
                spark, path, new_emb, id_col=id_col, vec_col=vec_col,
                on_conflict=on_conflict, batch_id=inflight,
                fail_after=fail_after)
            if ib_mod._find_inflight_batch(path) is not None:
                return 0  # the resume itself aborted (fail_after hook)
            committed = ib_mod.read_index_rel(
                spark, path, "codes", with_base_path=True).select("id")
            novel = new_emb.select(
                F.col(id_col).cast("long").alias("id")
            ).distinct().join(committed, "id", "left_anti").count()
            if not novel:
                return n_resumed
    elif inflight is not None and inflight != batch_id:
        raise ValueError(
            f"append_ann_index: batch {inflight!r} is staged but not fully "
            f"committed at {path}; resume it first."
        )
    stage = (f"{path}/.staging/append_{batch_id}"
             if batch_id is not None else None)
    ib_mod._check_staged_kind(stage, "ann", "append_ann_index")
    if ib_mod._batch_already_committed(spark, path, batch_id, stage):
        return 0

    if stage is None or not os.path.exists(f"{stage}/_STAGED"):
        codes = ib_mod.read_index_rel(spark, path, "codes",
                                      with_base_path=True)
        old_ids = codes.select("id")
        delta_ids = new_emb.select(
            F.col(id_col).cast("long").alias("id")
        ).distinct()
        n_overlap = delta_ids.join(old_ids, "id", "left_semi").count()
        if n_overlap:
            if on_conflict == "error":
                raise ValueError(
                    f"append_ann_index: {n_overlap} vector ids already "
                    f"exist in the index at {path}; they would appear "
                    "twice in ADC top-k. Pass on_conflict='skip' to drop "
                    "the re-ingested vectors."
                )
            if on_conflict != "skip":
                raise ValueError(f"unknown on_conflict {on_conflict!r}")
            new_emb = new_emb.join(
                old_ids.withColumnRenamed("id", id_col), id_col, "left_anti"
            )
        n_delta = new_emb.select(id_col).distinct().count()
        if not n_delta:
            return 0
        meta = _read_ann_meta(path)
        if drift_threshold is not None and meta is not None:
            # drift guard — the ANN analogue of compact_index's
            # rebuild_threshold: frozen-quantizer appends are exact vs a
            # re-encode, but recall decays as appended data drifts from
            # the TRAINED centroids/codebooks. Once the appended mass
            # exceeds drift_threshold of the training corpus, refuse and
            # price the recluster as the rebuild it is.
            n_base = int(meta["n_base"])
            n_now = codes.count()
            if n_now + n_delta > (1.0 + drift_threshold) * n_base:
                raise ValueError(
                    f"append_ann_index: appending {n_delta} vectors would "
                    f"put the index at {n_now + n_delta} vectors vs "
                    f"{n_base} at quantizer training time "
                    f"(> {drift_threshold:.0%} appended) — recall under "
                    "the frozen centroids/codebooks is no longer "
                    "trustworthy. Retrain with write_ann_index over the "
                    "full corpus (or pass drift_threshold=None to "
                    "override)."
                )
        cents = ib_mod.read_index_rel(spark, path, "centroids")
        n_cells = cents.count()
        brows = ib_mod.read_index_rel(spark, path, "codebooks").collect()
        mm = max(r["j"] for r in brows) + 1
        kk = max(r["c"] for r in brows) + 1
        books = np.empty((mm, kk, len(brows[0]["vec"])))
        for r in brows:
            books[r["j"], r["c"]] = r["vec"]

        assigned = ivf_assign(new_emb, cents, id_col=id_col, vec_col=vec_col)
        delta_codes = pq_encode(
            assigned.select(F.col("id").alias(id_col),
                            F.col("v").alias(vec_col)),
            books, id_col=id_col, vec_col=vec_col,
        ).join(assigned.select("id", "cell"), "id")

        if batch_id is None:
            batch_id = ib_mod._new_batch_id(spark, path)
            stage = f"{path}/.staging/append_{batch_id}"
        _shutil.rmtree(stage, ignore_errors=True)
        delta_codes.repartition(n_cells, "cell").write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(f"{stage}/codes")
        if os.path.isdir(f"{path}/vectors"):
            assigned.select("id", "v", "vnorm", "cell").repartition(
                n_cells, "cell"
            ).write.mode("overwrite").partitionBy("cell").parquet(
                f"{stage}/vectors"
            )
        with open(f"{stage}/_STAGED", "w") as f:
            f.write(f"{n_delta}\n")
    else:
        with open(f"{stage}/_STAGED") as f:
            n_delta = int(f.readline())

    code_units = ib_mod._staged_shard_units(stage, "codes", path,
                                            prefix="cell=")
    vec_units = ib_mod._staged_shard_units(stage, "vectors", path,
                                           prefix="cell=")
    # Interleave per-cell (vectors, codes) pairs — exact layer first, so
    # a crash can never leave a cell whose ADC candidates are missing
    # from the re-rank layer — instead of committing ALL codes cells and
    # only then the vectors layer (which left every appended cell torn
    # for the whole vectors-commit window). Readers of both layers also
    # fail loudly on an in-flight batch (_check_no_inflight_append).
    by_cell: dict[str, list] = {}
    for u in vec_units + code_units:
        by_cell.setdefault(u[0].split("/", 1)[1], []).append(u)
    units = [u for cell in sorted(by_cell) for u in by_cell[cell]]
    ib_mod._commit_append_units(spark, path, batch_id, units, fail_after)
    return int(n_delta)
