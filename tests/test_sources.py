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
