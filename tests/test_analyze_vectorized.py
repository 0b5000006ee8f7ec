"""Byte-identity property tests: the Arrow batch tokenizer twins
(analyze._tokenize_flat_pa / tokenize_arrow) against the scalar spec
(chem_tokenize_str, greek_variants, the Java-\\s simple split).

These are pure-Python (no SparkSession) so they run in seconds and fuzz
widely: the vectorized kernels are the index build's hot path, and any
divergence from the scalar spec silently changes doc_terms/index bytes.
"""

from __future__ import annotations

import random
import re

import pyarrow as pa
import pytest

from cer_for_mti_spark.functions.analyze import (
    _TOKEN_SPLIT_RE,
    GREEK_MAP,
    chem_tokenize_str,
    greek_variants,
    tokenize_arrow,
)

_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")

_POOL = (
    list("ab cZ.µα-β(x)\t\n\xa0'\"«»[]{}<>!?;:,/+=0129")
    + ["é", "é", "Å", "Å", "Ω", "Δ", "π", "TNF-α", "18F-FDG",
       " ", " ", "　", "\x1c", "\x1f", "\x85", " ",
       " ", "  ", " ", "ΑΒΓΩ", "ffi", "ſt", "¼"]
)


def _cases(n: int, seed: int) -> list[str | None]:
    rng = random.Random(seed)
    out: list[str | None] = ["", None, " ", "　\x1c", "plain ascii text"]
    for _ in range(n):
        out.append("".join(rng.choice(_POOL) for _ in range(rng.randint(0, 30))))
    return out


def _arrow_lists(cases, mode):
    arr = pa.array([c for c in cases], type=pa.string())
    return tokenize_arrow(arr, mode).to_pylist()


def test_ws_class_exhaustive():
    """Python \\s has no members above U+3000 (the module scans to it)."""
    for c in range(0x3001, 0x110000):
        assert not _TOKEN_SPLIT_RE.match(chr(c)), hex(c)


def test_chem_parity_fuzz():
    cases = _cases(5000, seed=13)
    got = _arrow_lists(cases, "chem")
    want = [chem_tokenize_str(c) if c is not None else [] for c in cases]
    assert got == want


def test_chem_greek_parity_fuzz():
    cases = _cases(3000, seed=29)
    got = _arrow_lists(cases, "chem+greek")
    want = []
    for c in cases:
        t = chem_tokenize_str(c) if c is not None else []
        want.append(t + greek_variants(t))
    assert got == want


def test_simple_parity_fuzz():
    cases = _cases(3000, seed=37)
    got = _arrow_lists(cases, "simple")
    want = [
        [t for t in _JAVA_WS_RE.split(c) if t] if c else [] for c in cases
    ]
    assert got == want


def test_chem_parity_ascii_ws_fast_path():
    """Batches with NO exotic whitespace take the ascii_split fast path;
    must still match the scalar spec exactly (incl. greek letters and
    NFC cases, which are non-whitespace non-ASCII)."""
    rng = random.Random(41)
    pool = [c for c in _POOL if not any(_TOKEN_SPLIT_RE.match(ch) and
                                        ch not in " \t\n" for ch in c)]
    cases = ["".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
             for _ in range(3000)]
    from cer_for_mti_spark.functions.analyze import _needs_unicode_ws_split
    arr = pa.array(cases, type=pa.string())
    assert not _needs_unicode_ws_split(arr) or any(
        "é" in c or "Å" in c for c in cases)  # C2/E1-E3 leads may appear
    got = _arrow_lists(cases, "chem")
    want = [chem_tokenize_str(c) for c in cases]
    assert got == want


def test_count_only_parity_fuzz():
    from cer_for_mti_spark.functions.analyze import _tokenize_flat_pa

    for mode in ("chem", "chem+greek"):
        cases = _cases(2000, seed=53)
        arr = pa.array(cases, type=pa.string())
        _, offs = _tokenize_flat_pa(arr, mode, count_only=True)
        import numpy as np

        got = list(np.diff(offs))
        want = []
        for c in cases:
            t = chem_tokenize_str(c) if c is not None else []
            if mode == "chem+greek":
                t = t + greek_variants(t)
            want.append(len(t))
        assert got == want, mode


def test_greek_class_covers_map():
    for ch in GREEK_MAP:
        assert len(ch) == 1


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        tokenize_arrow(pa.array(["x"]), "nope")
