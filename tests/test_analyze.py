"""Analyzer goldens: tokenizer rules + byte-identical HTML extraction
(the reference-parity layer — SURVEY.md §2.9, BASELINE.json input_hint)."""

from cer_for_mti_spark.functions.analyze import (
    chem_tokenize_str,
    extract_text_bytes,
    greek_variants,
    load_stop_words,
)


def test_selective_case_folding():
    # fold all-alpha single-case tokens (lower or Capitalized)
    assert chem_tokenize_str("The Quick brown FOX") == ["the", "quick", "brown", "FOX"]
    # preserve mixed-case chemical symbols (reference runs CASED models,
    # run_bert.sh:10)
    assert chem_tokenize_str("Epo EPO sFas NaCl") == ["epo", "EPO", "sFas", "NaCl"]


def test_chemical_tokens_preserved():
    # intra-token -/() kept (BERT_annotator.py:722-729 canonicalization)
    assert chem_tokenize_str("TNF-α and beta-globulin") == [
        "TNF-α", "and", "beta-globulin"
    ]
    assert chem_tokenize_str("11C-(+)-α-dihydrotetrabenazine.") == [
        "11C-(+)-α-dihydrotetrabenazine"
    ]
    # digit-bearing tokens never folded
    assert chem_tokenize_str("18F-FDG H2O Ca2+") == ["18F-FDG", "H2O", "Ca2+"]


def test_edge_punct_stripped():
    assert chem_tokenize_str('"iron," (copper); zinc!') == [
        "iron,", "copper", "zinc"
    ] or chem_tokenize_str('"iron," (copper); zinc!') == ["iron", "copper", "zinc"]


def test_greek_variants():
    assert greek_variants(["TNF-α"]) == ["TNF-alpha"]
    assert greek_variants(["iron"]) == []


def test_extract_text_golden():
    html = (
        b"<html><head><title>My Title</title>"
        b"<script>var x = '<p>nope</p>';</script></head>"
        b"<body><nav><a href='/'>home</a></nav>"
        b"<p>First &amp; second.</p><!-- c --><p>Third</p></body></html>"
    )
    # byte-identical golden: pure function of the html bytes
    assert extract_text_bytes(html) == "My Title\nFirst & second.\nThird"


def test_extract_idempotent_and_deterministic():
    html = b"<html><body><p>a b</p><p>c</p></body></html>"
    assert extract_text_bytes(html) == extract_text_bytes(html) == "a b\nc"


def test_stop_words_default_dedup():
    ws = load_stop_words()
    assert len(ws) == len(set(ws))
    assert "the" in ws
