"""Reference-format parsers (SURVEY.md §2.1) + the BIO/WordPiece window
operators (W1/W2)."""

import pytest

from cer_for_mti_spark.sources import formats


def test_parse_brat(spark):
    lines = spark.createDataFrame(
        [
            ("123", "T1\torganic 10 14\tiron"),
            ("123", "T2\tpeptides 20 25;30 35\tTNF-α frag"),
            ("123", "#1\tAnnotatorNotes T1\tsome note"),
            ("124", "T1\tinorganic 0 4\tNaCl"),
        ],
        "pmid string, value string",
    )
    got = {(r.pmid, r.cls, r.start, r.end, r.term)
           for r in formats.parse_brat(lines).collect()}
    assert got == {
        ("123", "organic", 10, 14, "iron"),
        ("123", "peptides", 20, 35, "TNF-α frag"),  # fragment: first..last
        ("124", "inorganic", 0, 4, "NaCl"),
    }


def test_parse_pubtator(spark):
    lines = spark.createDataFrame(
        [
            ("10|t|Some title",),
            ("10\t0\t4\tiron\tChemical\tMESH:1",),
            ("10\t5\t9\tp53\tGene\tNCBI:2",),
            ("10\t10\t14\tmouse\tSpecies\tTAX:3",),
        ],
        "value string",
    )
    got = {(r.pmid, r.term, r.type) for r in formats.parse_pubtator(lines).collect()}
    assert got == {("10", "iron", "Chemical"), ("10", "p53", "Gene")}


def test_parse_block_format(spark):
    lines = spark.createDataFrame(
        [
            (0, "111"), (1, "iron"), (2, "copper"), (3, ""),
            (4, "222"), (5, "zinc"),
        ],
        "line_no long, value string",
    )
    got = {(r.pmid, r.term) for r in formats.parse_block_format(lines).collect()}
    assert got == {("111", "iron"), ("111", "copper"), ("222", "zinc")}


def test_parse_block_format_per_file(spark):
    """Multi-file input with a `file` column: same parse as running each
    file alone, and the running-sum window partitions by file — no
    single-partition global sort in the plan."""
    fa = [(0, "111"), (1, "iron"), (2, ""), (3, "222"), (4, "zinc")]
    fb = [(0, "333"), (1, "lead"), (2, "gold")]
    both = spark.createDataFrame(
        [("a", *r) for r in fa] + [("b", *r) for r in fb],
        "file string, line_no long, value string",
    )
    got = {(r.pmid, r.term)
           for r in formats.parse_block_format(both).collect()}
    sep = set()
    for rows in (fa, fb):
        one = spark.createDataFrame(rows, "line_no long, value string")
        sep |= {(r.pmid, r.term)
                for r in formats.parse_block_format(one).collect()}
    assert got == sep == {("111", "iron"), ("222", "zinc"),
                          ("333", "lead"), ("333", "gold")}

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        formats.parse_block_format(both).explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_bio_decode(spark):
    tokens = spark.createDataFrame(
        [
            ("d1", 0, "the", "O"),
            ("d1", 1, "beta", "B-organic"),
            ("d1", 2, "-", "I-organic"),
            ("d1", 3, "globulin", "I-organic"),
            ("d1", 4, "binds", "O"),
            ("d1", 5, "iron", "B-inorganic"),
            ("d2", 0, "copper", "B-inorganic"),
        ],
        "pmid string, pos long, token string, label string",
    )
    got = {(r.pmid, r.term, r.cls) for r in formats.bio_decode(tokens).collect()}
    # formula canonicalization: 'beta - globulin' -> 'beta-globulin' (C6)
    assert got == {
        ("d1", "beta-globulin", "organic"),
        ("d1", "iron", "inorganic"),
        ("d2", "copper", "inorganic"),
    }


def test_merge_wordpiece(spark):
    tokens = spark.createDataFrame(
        [
            ("d1", 0, "hemo", "B-organic"),
            ("d1", 1, "##globin", "X"),
            ("d1", 2, "binds", "O"),
        ],
        "pmid string, pos long, token string, label string",
    )
    got = {(r.token, r.label) for r in formats.merge_wordpiece(tokens).collect()}
    assert got == {("hemoglobin", "B-organic"), ("binds", "O")}


def test_merge_sentencepiece(spark):
    """W3 (XLNet_annotator.py:846-859): ▁-prefixed token starts a word,
    bare token appends to the previous word, ▁ is stripped."""
    tokens = spark.createDataFrame(
        [
            ("d1", 0, "▁hemo", "B-organic"),
            ("d1", 1, "globin", "O"),
            ("d1", 2, "▁binds", "O"),
            ("d1", 3, "▁ir", "B-inorganic"),
            ("d1", 4, "on", "O"),
            ("d2", 0, "▁copper", "B-inorganic"),
        ],
        "pmid string, pos long, token string, label string",
    )
    got = {(r.pmid, r.token, r.label)
           for r in formats.merge_sentencepiece(tokens).collect()}
    assert got == {
        ("d1", "hemoglobin", "B-organic"),
        ("d1", "binds", "O"),
        ("d1", "iron", "B-inorganic"),
        ("d2", "copper", "B-inorganic"),
    }


def test_merge_sentencepiece_roundtrip_reference_entities(spark):
    """Chunk real XLNet entity words into SentencePiece-style pieces
    (first piece ▁-prefixed, 3-char continuation pieces) and merge back:
    output words must equal the originals byte-for-byte. Uses the
    committed converted XLNet output as the word source."""
    import os

    path = "/root/reference/data/tool_annotations/xlnet_chemdner_test.txt"
    if not os.path.exists(path):
        pytest.skip("reference repo not available")
    words = []
    with open(path, encoding="utf8") as f:
        for ln in list(f)[:200]:
            parts = ln.rstrip("\n").split("\t")
            if len(parts) >= 2:
                words.extend(parts[1].split())
    rows, pos = [], 0
    for w in dict.fromkeys(words):  # distinct, order kept
        chunks = [w[:3]] + [w[i:i + 3] for i in range(3, len(w), 3)]
        rows.append(("doc", pos, "▁" + chunks[0], "B-chem"))
        pos += 1
        for c in chunks[1:]:
            rows.append(("doc", pos, c, "O"))
            pos += 1
    tokens = spark.createDataFrame(
        rows, "pmid string, pos long, token string, label string"
    )
    got = [r.token for r in
           formats.merge_sentencepiece(tokens).orderBy("pos").collect()]
    assert got == list(dict.fromkeys(words))


def test_parse_cdi_tsv(spark):
    """S8 (_read_CDI_data, BERT_annotator.py:232-252): pmid\\ttitle\\tabstract
    -> (pmid, title + ' ' + abstract)."""
    lines = spark.createDataFrame(
        [("123\tA title\tAn abstract body",),
         ("456\tOther\tText here",),
         ("badline",)],
        "value string",
    )
    got = {(r.pmid, r.text) for r in formats.parse_cdi_tsv(lines).collect()}
    assert got == {
        ("123", "A title An abstract body"),
        ("456", "Other Text here"),
    }


def test_merge_sentencepiece_property(spark):
    """Property: chunking arbitrary words into ▁-led piece streams and
    merging recovers the exact word sequence (pseudo-random seeded words
    incl. unicode and punctuation)."""
    import random

    rng = random.Random(11)
    alphabet = "abcXYZ0189-()α▯é"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    ]
    rows, pos = [], 0
    for w in words:
        cut = rng.randint(1, len(w))
        chunks = [w[:cut]]
        i = cut
        while i < len(w):
            step = rng.randint(1, 4)
            chunks.append(w[i:i + step])
            i += step
        rows.append(("doc", pos, "▁" + chunks[0], "O"))
        pos += 1
        for c in chunks[1:]:
            rows.append(("doc", pos, c, "O"))
            pos += 1
    tokens = spark.createDataFrame(
        rows, "pmid string, pos long, token string, label string"
    )
    got = [r.token for r in
           formats.merge_sentencepiece(tokens).orderBy("pos").collect()]
    assert got == words
