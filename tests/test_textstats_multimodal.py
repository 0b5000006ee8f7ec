import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import multimodal, textstats


def test_quality_and_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, "x!!! ### 123")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r for r in textstats.quality_score(docs).collect()}
    assert q[1].n_tokens == 8
    assert q[1].stopword_ratio == round(3 / 8, 4)
    assert q[1].quality > q[2].quality
    assert q[2].nonalpha_ratio > 0.5


def test_lang_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat est dans la maison pour une nuit"),
            (4, "qqq www eee"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in textstats.lang_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "unknown"}


def test_fingerprint_order_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in textstats.fingerprint(docs).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_multimodal_features_deterministic(spark):
    media = multimodal.synthetic_media(spark, n=12, seed=42).cache()
    a = sorted(map(tuple, multimodal.extract_features(media)
                   .select("media_id", "feature").collect()))
    b = sorted(map(tuple, multimodal.extract_features(media)
                   .select("media_id", "feature").collect()))
    assert a == b
    assert all(len(f) == multimodal.FEATURE_DIM for _, f in a)


def test_multimodal_strict_raises(spark):
    media = multimodal.synthetic_media(spark, n=4, seed=42)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.extract_features(media, strict=True).collect()


def test_frame_sampling(spark):
    media = multimodal.synthetic_media(spark, n=12, seed=42)
    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=4)
    rows = frames.collect()
    assert rows and all(r.frame_idx < 4 for r in rows)
    # only video rows produce frames
    vids = {r.media_id for r in media.filter("media_type = 'video'").collect()}
    assert {r.media_id for r in rows} <= vids


def test_stratified_sample_properties(spark):
    """Hash-Bernoulli sampling: deterministic, a subset of the input,
    per-stratum keep rate within binomial noise of the target, and
    monotone (a higher fraction keeps a superset)."""
    from cer_for_mti_spark.operators import textstats

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    fr = {"en": 0.5, "de": 0.2}
    kept = textstats.stratified_sample(docs, fr)
    got = {(r.doc_id, r.lang) for r in kept.collect()}
    again = {(r.doc_id, r.lang)
             for r in textstats.stratified_sample(docs, fr).collect()}
    assert got == again
    by_lang = {}
    for _, lang in got:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert "fr" not in by_lang                    # default fraction 0
    assert abs(by_lang["en"] / 1000 - 0.5) < 0.06  # ~3 sigma
    assert abs(by_lang["de"] / 1000 - 0.2) < 0.05
    # monotone: raising en's fraction only adds docs
    more = {(r.doc_id, r.lang) for r in textstats.stratified_sample(
        docs, {"en": 0.8, "de": 0.2}).collect()}
    assert {g for g in got if g[1] == "en"} <= {m for m in more if m[1] == "en"}


def test_cap_per_group_properties(spark):
    """Cap keeps exactly min(cap, group size) rows per group, the
    LOWEST-ordered ones."""
    from cer_for_mti_spark.operators import textstats

    rows = [(i, f"d{i % 7}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = textstats.cap_per_group(docs, "source", cap=5)
    by_src = {}
    for r in kept.collect():
        by_src.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == 5 for v in by_src.values())
    for src, ids in by_src.items():
        all_ids = sorted(i for i, s in rows if s == src)
        assert sorted(ids) == all_ids[:5]
