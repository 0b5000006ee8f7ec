"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (whole-stage codegen, no Python in
the hot path) and all exactly expressible in ANSI SQL so the DuckDB
oracle can replay them. The reference analogue is its per-document text
statistics and diagnostics (token counters, BERT_annotator.py:708-752;
stop-word casing diagnostics, run_tool_evaluation.py:578-597).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cer_for_mti_spark.functions.analyze import simple_tokens_col
from cer_for_mti_spark.functions.hashing import md5_60

# Function-word marker lists for the n-gram-free language heuristic.
# Deterministic + tiny so the same lists inline into the oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "was", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "los", "las", "es", "en", "por", "para", "una"],
}

STOPWORD_MARKERS = LANG_MARKERS["en"]


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count (W-split); BPE-ish subword estimate =
    tokens + extra splits at letter/digit and case boundaries."""
    return F.size(simple_tokens_col(text_col))


def bpe_estimate_col(text_col: str = "text") -> Column:
    """Cheap BPE-like token-count estimate: whitespace tokens + boundary
    splits (digit<->alpha transitions, hyphens) — a regex proxy for
    subword tokenizers, JVM-side."""
    c = F.col(text_col)
    extra = F.size(simple_tokens_col(F.regexp_replace(c, r"(\d)([A-Za-z])|([A-Za-z])(\d)|-", r"$1$3 $2$4")))
    return extra


def _raw_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unrounded per-doc feature columns (prefixed _raw)."""
    toks = F.col("_toks")
    return (
        docs.withColumn("_toks", simple_tokens_col(text_col))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "_mean_raw",
            F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t).cast("long")).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
        )
        .withColumn(
            "_stop_raw",
            F.size(F.filter(toks, lambda t: t.isin(STOPWORD_MARKERS))).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
        )
        .withColumn(
            "_noise_raw",
            (F.length(text_col)
             - F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z\s]", "")))
            .cast("double")
            / F.greatest(F.length(text_col), F.lit(1)),
        )
        .drop("_toks")
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, mean token length, stopword
    ratio, non-alpha ratio. Declarative only, rounded for output."""
    return (
        _raw_features(docs, text_col)
        .withColumn("mean_token_len", F.round(F.col("_mean_raw"), 4))
        .withColumn("stopword_ratio", F.round(F.col("_stop_raw"), 4))
        .withColumn("nonalpha_ratio", F.round(F.col("_noise_raw"), 4))
        .drop("_mean_raw", "_stop_raw", "_noise_raw")
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: rewards mid-range doc length and
    healthy stopword presence, penalizes non-alpha noise. Computed from
    UNROUNDED ratios (rounded inputs would park the weighted sum exactly
    on round-half boundaries, where Spark HALF_UP and DuckDB HALF_EVEN
    disagree); rounded once for output."""
    raw = _raw_features(docs, text_col)
    len_score = F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
    stop_score = F.least(F.col("_stop_raw") * 5.0, F.lit(1.0))
    noise_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_noise_raw") * 3.0)
    return (
        raw.withColumn(
            "quality",
            F.round(len_score * 0.4 + stop_score * 0.3 + noise_pen * 0.3, 4),
        )
        .withColumn("mean_token_len", F.round(F.col("_mean_raw"), 4))
        .withColumn("stopword_ratio", F.round(F.col("_stop_raw"), 4))
        .withColumn("nonalpha_ratio", F.round(F.col("_noise_raw"), 4))
        .drop("_mean_raw", "_stop_raw", "_noise_raw")
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count marker hits per language in
    the token multiset; argmax with deterministic tie-break on language
    code. Pure expressions -> codegen; at 100 TB this is a single narrow
    map stage."""
    toks = simple_tokens_col(text_col)
    out = docs.withColumn("_toks", toks)

    def marker_filter(ws: list[str]):
        # one-arg lambda factory: a two-arg lambda (t, ws=ws) would be
        # read by F.filter as its (element, index) variant
        return lambda t: t.isin(ws)

    scores = [
        F.size(F.filter(F.col("_toks"), marker_filter(ws))).alias(lang)
        for lang, ws in LANG_MARKERS.items()
    ]
    out = out.select("*", *scores)
    best = F.greatest(*[F.col(lang) for lang in LANG_MARKERS])
    pred = F.when(F.col("en") == best, "en")
    for lang in ["de", "es", "fr"]:  # deterministic priority order
        pred = pred.when(F.col(lang) == best, lang)
    return out.withColumn(
        "lang_pred", F.when(best == 0, "unknown").otherwise(pred)
    ).drop("_toks")


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: 60-bit portable hash of the sorted distinct
    token set (order-insensitive content identity — the rolling-hash
    family's set variant, robust to token reordering)."""
    toks = F.sort_array(F.array_distinct(simple_tokens_col(text_col)))
    return docs.withColumn(
        "fingerprint", md5_60(F.concat_ws(" ", toks))
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     top_n: int = 2, dup_n: int = 5,
                     as_ppm: bool = False) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1
    uses top-2..4-gram fraction and duplicated-5..10-gram fraction as
    corpus filters) — per doc:

    - top_ngram_frac: occurrences of the MOST FREQUENT top_n-gram times
      top_n, over the token count, clamped to 1 (a boilerplate page
      repeating one phrase scores 1; overlapping n-grams — "a a a" has
      the bigram "a a" twice over 3 tokens — would otherwise push the
      value above 1, so the clamp keeps it a fraction, same contract as
      dup_ngram_frac).
    - dup_ngram_frac: total occurrences of dup_n-grams seen more than
      once, times dup_n, over the token count, clamped to 1 (overlapping
      n-grams can over-count; the clamp keeps it a fraction).

    Both 0 for docs with fewer than n tokens. Fully declarative: one
    posexplode + lead window per doc + two aggregations — a narrow
    per-doc pipeline, no corpus-wide state, the 100 TB shape (the window
    partitions by doc_id, so no global sort).

    as_ppm=True returns integer parts-per-million via floor() instead of
    round(,6) fractions: count/length ratios land EXACTLY on half-ULP
    decimal boundaries (25/128 = 0.1953125), where Spark HALF_UP and
    DuckDB disagree — floor of the identical IEEE division is
    engine-stable, so the oracle-matched driver query uses ppm."""
    from pyspark.sql import Window

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("_t")).select(
        "doc_id", F.size("_t").cast("double").alias("n_tok"),
        F.posexplode("_t").alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")

    def gram_col(n: int):
        parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
        return F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts))

    grams = base.select(
        "doc_id", "n_tok",
        gram_col(top_n).alias("g_top"), gram_col(dup_n).alias("g_dup"),
    )
    if as_ppm:
        # association fixed as ((count * n) * 1e6) / n_tok so both
        # engines compute the identical IEEE double before floor
        top_expr = F.least(
            F.floor(
                F.col("cmax") * F.lit(top_n) * F.lit(1000000.0)
                / F.col("n_tok")
            ).cast("long"),
            F.lit(1000000).cast("long"),
        ).alias("top_ngram_ppm")
        dup_expr = F.least(
            F.floor(
                F.col("d") * F.lit(dup_n) * F.lit(1000000.0) / F.col("n_tok")
            ).cast("long"),
            F.lit(1000000).cast("long"),
        ).alias("dup_ngram_ppm")
        top_name, dup_name = "top_ngram_ppm", "dup_ngram_ppm"
        zero = F.lit(0).cast("long")
    else:
        top_expr = F.round(
            F.least(F.col("cmax") * top_n / F.col("n_tok"), F.lit(1.0)), 6
        ).alias("top_ngram_frac")
        dup_expr = F.round(
            F.least(F.col("d") * dup_n / F.col("n_tok"), F.lit(1.0)), 6
        ).alias("dup_ngram_frac")
        top_name, dup_name = "top_ngram_frac", "dup_ngram_frac"
        zero = F.lit(0.0)
    top = (
        grams.filter(F.col("g_top").isNotNull())
        .groupBy("doc_id", "n_tok", "g_top").agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tok").agg(F.max("c").alias("cmax"))
        .select("doc_id", top_expr)
    )
    dup = (
        grams.filter(F.col("g_dup").isNotNull())
        .groupBy("doc_id", "n_tok", "g_dup").agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n_tok").agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("d")
        )
        .select("doc_id", dup_expr)
    )
    return (
        docs.select("doc_id")
        .join(top, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(top_name, zero).alias(top_name),
            F.coalesce(dup_name, zero).alias(dup_name),
        )
    )


def cap_per_group(docs: DataFrame, group_col: str = "source", cap: int = 10,
                  order_col: str = "doc_id") -> DataFrame:
    """Per-domain document cap — the Common-Crawl anti-domination step: no
    single domain/source may contribute more than `cap` documents to the
    training mix. Deterministic: rows ranked by `order_col` within the
    group. One shuffle on the group key; for a pathologically hot domain
    (10^8 pages) the window sort of that one partition is the bound — at
    that scale use cap_per_group_hashed, which spreads the hot group's
    selection over a salted two-phase top-k (same cardinality per group,
    hash-uniform choice instead of first-by-order_col)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def cap_per_group_hashed(docs: DataFrame, group_col: str = "source",
                         cap: int = 10, id_col: str = "doc_id",
                         n_salts: int = 64) -> DataFrame:
    """Scale-safe per-group cap: keeps EXACTLY min(cap, n) documents per
    group — the cap with the smallest portable hash of (group, id) —
    without ever sorting a whole group in one task.

    Two salted phases (the distributed top-k-per-key pattern):
    1. window over (group, hash % n_salts): each of the hot group's
       n_salts sub-partitions keeps its local smallest-cap hashes — a
       10^8-page domain sorts n/n_salts rows per task, not n;
    2. window over (group) on the surviving <= n_salts*cap rows per
       group keeps the global smallest cap.

    Deterministic (hash ties broken by id), fully SQL-replayable
    (equivalent to one rank over hash order — the oracle's shape), and a
    UNIFORM deterministic choice rather than cap_per_group's
    first-by-order_col — the right semantics for an anti-domination cap,
    where "first cap doc_ids" systematically favours old pages. Kept
    cardinalities per group are identical to cap_per_group's
    (property-tested)."""
    from pyspark.sql import Window

    h = md5_60(F.concat(F.col(group_col), F.lit(":"),
                        F.col(id_col).cast("string")))
    salted = docs.withColumn("_h", h).withColumn(
        "_salt", F.pmod(F.col("_h"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_h", id_col)
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= cap)
        .drop("_h", "_salt", "_rn", "_rn2")
    )


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      precision: int = 10000,
                      default_fraction: float = 0.0) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — the data-mixing step
    of a training pipeline ("keep 50% of en, 20% of de, ..."). A doc is
    kept iff md5_60(stratum ':' id) % precision < fraction*precision:
    pure column expressions (no RNG state, no driver round-trip),
    reproducible across engines, runs and partitionings, and exactly
    replayable in the DuckDB oracle. No shuffle at all — a narrow filter."""
    h = F.pmod(
        md5_60(F.concat(F.col(strata_col), F.lit(":"),
                        F.col(id_col).cast("string"))),
        F.lit(precision),
    )
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        t = F.when(F.col(strata_col) == stratum,
                   F.lit(int(round(frac * precision))))
        thresh = t if thresh is None else thresh.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * precision)))
        )
    thresh = (thresh.otherwise(F.lit(int(round(default_fraction * precision))))
              if thresh is not None
              else F.lit(int(round(default_fraction * precision))))
    return docs.filter(h < thresh)


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        k: int = 4, w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    rolling hash over k-token shingles, keep the MINIMUM hash of every
    w-length window, distinct per doc -> (doc_id, fingerprint). The
    standard local-fingerprint scheme for plagiarism/near-dup detection:
    guarantees any shared run of >= w+k-1 tokens shares a fingerprint.

    Fully declarative (shingle transform + portable hash + sliding-window
    min + distinct) so the DuckDB oracle replays it exactly; one narrow
    pass + the final distinct."""
    from pyspark.sql import Window

    toks = simple_tokens_col(text_col)
    d = docs.select("doc_id", toks.alias("_t"))
    n = F.size("_t")
    idx = F.sequence(F.lit(0), n - k)
    sh = F.transform(
        idx, lambda i: md5_60(F.concat_ws(" ", F.slice(F.col("_t"), i + 1, k)))
    )
    hashed = (
        d.filter(n >= k)
        .select("doc_id", F.posexplode(sh).alias("pos", "h"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        hashed.withColumn("_n", F.count(F.lit(1)).over(win))
        .withColumn("fp", F.min("h").over(win))
        .filter(F.col("_n") == w)  # only complete windows
        .select("doc_id", F.col("fp").alias("fingerprint"))
        .dropDuplicates()
    )
