"""Deduplication operators for web-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Design for 10^12 docs: never a raw cross join. Every near-dup variant is
candidate-generation (an equi-join on a bucket key: rare shingle, MinHash
LSH band, SimHash band, sign-LSH band) followed by exact verification on
the candidate pairs only. All hashes are the portable md5-based family
(functions/hashing.py) so DuckDB oracles replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cer_for_mti_spark.functions.analyze import simple_tokens_col
from cer_for_mti_spark.functions.hashing import md5_60, md5_60_seeded


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: portable text hash -> keep the min doc_id per hash.
    One shuffle on the 60-bit hash; at scale the hash is near-unique so
    the aggregation has no skew."""
    w = Window.partitionBy("_h").orderBy("doc_id")
    return (
        docs.withColumn("_h", md5_60(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(hash, n_dups, keep_doc_id) per duplicated text — the audit view."""
    return (
        docs.withColumn("hash", md5_60(F.col(text_col)))
        .groupBy("hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def token_shingles(docs: DataFrame, text_col: str = "text",
                   k: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct k-token shingles, built declaratively
    with transform over token indices (no UDF)."""
    toks = simple_tokens_col(text_col)
    d = docs.select("doc_id", toks.alias("_t"))
    n = F.size("_t")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i + 1, k))
    )
    return (
        d.filter(n >= k)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text", k: int = 3,
                        threshold: float = 0.8,
                        max_shingle_df: int = 50) -> DataFrame:
    """Near-dup pairs by exact k-token-shingle Jaccard, candidate-pruned:
    only doc pairs sharing at least one RARE shingle (document frequency
    <= max_shingle_df) are verified. At web scale rare-shingle join is the
    standard suffix-filtering trick — hot shingles (boilerplate) never
    explode the join because they are excluded from candidate generation;
    true near-dups share many shingles so rare ones suffice."""
    sh = token_shingles(docs, text_col, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    rare = sh.join(df_counts.filter(F.col("sdf") <= max_shingle_df), "shingle")
    a = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verification: semi-join the shingle relation down to CANDIDATE docs
    # FIRST (two cheap semi-joins), then self-join on shingle. Without the
    # pre-prune, a boilerplate shingle with df=10^6 contributes 10^12 join
    # rows before the pair semi-join could drop them; after it, the
    # self-join only ever sees docs that share a rare shingle.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    inter = (
        sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(sh_c.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "sh_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sh_a") + F.col("sh_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 32, k: int = 3) -> DataFrame:
    """(doc_id, sig: array<long>): MinHash over k-token shingles with the
    portable seeded hash family — sig[i] = min over shingles of
    md5_60(i || ':' || shingle)."""
    sh = token_shingles(docs, text_col, k)
    mins = [
        F.min(md5_60_seeded(F.col("shingle"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      num_hashes: int = 32, bands: int = 8, k: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup pairs: band the signature (bands × rows),
    bucket-join on (band, banded-signature hash), then verify candidates
    with the ESTIMATED Jaccard = fraction of agreeing minhashes.
    The band join is the only shuffle that touches all docs; verification
    touches candidates only."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, num_hashes, k).cache()
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(
                        ",", *[F.col("sig")[bi * rows + r].cast("string")
                               for r in range(rows)]
                    ).alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("sig").alias("sig_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("sig").alias("sig_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash(docs: DataFrame, text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """(doc_id, simhash): per-token 60-bit hash, sign-aggregated per bit
    weighted by tf — declarative: explode tokens, then for each bit sum
    (+1/-1) and take the sign. bits<=60 (portable hash width)."""
    bits = min(bits, 60)
    toks = (
        docs.select("doc_id", F.explode(simple_tokens_col(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", md5_60(F.col("term")))
    )
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1,
                       F.col("tf")).otherwise(-F.col("tf"))
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b).cast("long")
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, text_col: str = "text",
                       max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """SimHash near-dup: band the 60-bit hash into `bands` chunks — any
    pair within hamming distance < bands shares at least one exact band
    (pigeonhole) -> equi-join per band, verify with bit_count(xor)."""
    s = simhash(docs, text_col).cache()
    width = 60 // bands
    banded = s.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftright(F.col("simhash"), bi * width)
                    .bitwiseAND((1 << width) - 1)
                    .alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sh_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sh_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def dup_components(pairs: DataFrame, a_col: str = "doc_a",
                   b_col: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pair edges -> (doc_id,
    component) with component = the minimum doc_id reachable. This is the
    step a real dedup pipeline runs between pair generation and
    keep-one-per-group: near-dup is not transitive, so groups are the
    transitive closure of the pair relation.

    Shape: alternating large-star / small-star rounds (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond") — each phase is
    one symmetric-neighbor groupBy + min + equi-join, and the edge set
    contracts toward the star forest (every node pointing at its
    component's minimum) in O(log n) rounds rather than the O(diameter)
    of plain min-label propagation: a 10^12-edge graph with a long-chain
    component converges in ~40 rounds where label propagation would need
    millions. Deterministic (min is order-free). Edges are
    localCheckpoint()ed per round to truncate lineage; convergence is
    detected by an (count, xxhash64-sum) edge-set fingerprint, one tiny
    agg action per phase.

    Raises RuntimeError if max_iter rounds don't converge (a silent exit
    here would return WRONG labels — with O(log n) rounds the default 25
    covers any graph that fits on hardware)."""
    e = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # canonical orientation (u > v); the invariant both phases preserve
    edges = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )

    def fingerprint(df: DataFrame) -> tuple[int, int]:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of xxhash64 values overflows
            # (ANSI mode raises); decimal(38,0) holds ~10^19 hash values
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return int(r["n"]), int(r["h"])

    fp = fingerprint(edges)
    converged = False
    for _ in range(max_iter):
        # large-star: for every center c, m = min(neighbors ∪ {c});
        # re-point every LARGER neighbor n > c at m. (The n < c
        # orientation of an edge is handled when n is the center.)
        sym = edges.select(F.col("u").alias("c"), F.col("v").alias("n")).union(
            edges.select(F.col("v").alias("c"), F.col("u").alias("n"))
        )
        mins = sym.groupBy("c").agg(F.min("n").alias("mn")).select(
            "c", F.least("mn", F.col("c")).alias("m")
        )
        large = (
            sym.join(mins, "c")
            .filter(F.col("n") > F.col("c"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: every edge now points downward (u > v); for each
        # center u, m = min(smaller neighbors) — re-point u AND all its
        # smaller neighbors at m. u > m and v > m keep the orientation.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        j = large.join(mins2, "u")
        small = (
            j.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(j.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        new_fp = fingerprint(small)
        edges = small
        if new_fp == fp:
            # fixed point of both phases = the star forest (every edge is
            # (member, component-min)); large-star can no longer re-point
            converged = True
            break
        fp = new_fp
    if not converged:
        raise RuntimeError(
            f"dup_components did not converge in {max_iter} alternating "
            "star rounds — raise max_iter (labels would be wrong)"
        )
    labels = edges.select(F.col("u").alias("node"),
                          F.col("v").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("component", "node").alias("component"),
        )
    )


def dup_losers(pairs: DataFrame, id_col: str = "doc_id",
               a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """The NON-canonical member set of every near-dup group (everything
    keep_canonical drops): connected components, then every node whose
    component label is not itself. This is the dedup-purge producer for
    index_build.delete_docs — feed it to tombstone near-duplicates out
    of a live index without a rebuild (purged physically at the next
    compaction)."""
    comp = dup_components(pairs, a_col=a_col, b_col=b_col)
    return comp.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )


def keep_canonical(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   a_col: str = "doc_a", b_col: str = "doc_b") -> DataFrame:
    """Keep ONE document per near-dup group — the step after
    dup_components in a real training-data dedup pipeline: the group's
    minimum doc id is canonical, every other member is dropped, and docs
    in no pair survive untouched.

    Shape: connected components (O(log n) star rounds) produce the
    non-canonical id set — at worst the number of dropped duplicates,
    typically a small fraction of the corpus — then ONE anti-join
    against the docs relation. The corpus is scanned once; the only
    corpus-sized shuffle is the anti-join's, and when the loser set is
    small Catalyst broadcasts it (no shuffle at all)."""
    return docs.join(dup_losers(pairs, id_col, a_col, b_col),
                     id_col, "left_anti")


def embedding_near_dup(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.95, dim: int = 64,
                       n_planes: int = 8, seed: int = 42,
                       n_tables: int = 2) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — NEVER all-pairs.

    Candidate generation: n_tables independent sign-random-projection
    tables (seeded hyperplanes shared with similarity.lsh_bucket_udf);
    a pair is a candidate when it shares a bucket in ANY table — the
    standard sign-LSH recall amplifier (P[same bucket] = (1 - theta/pi)^b
    per table; near-dups at cos >= 0.95 nearly always collide). The join
    key is (table, bucket): a plain equi-join Catalyst shuffle-hashes; no
    CartesianProduct / BroadcastNestedLoopJoin node in the plan (asserted
    in tests/test_dedup.py). Verification computes exact cosine on the
    candidate pairs only."""
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)),
    )
    from cer_for_mti_spark.operators.similarity import lsh_bucket_udf

    tagged = None
    for t in range(n_tables):
        bucket = lsh_bucket_udf(dim, n_planes, seed + t)
        bt = v.withColumn("bucket", bucket(F.col("v"))).withColumn(
            "tbl", F.lit(t)
        )
        tagged = bt if tagged is None else tagged.union(bt)
    a = tagged.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      F.col("norm").alias("na"), "tbl", "bucket")
    b = tagged.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("norm").alias("nb"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
