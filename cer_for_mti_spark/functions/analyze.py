"""The analyzer chain: HTML->text extraction, unicode + chemical-token
normalization, tokenization, selective case-folding, stop-word policy.

Re-expresses the reference's three tokenizers and normalization rules
(SURVEY.md §2.9) as ONE deterministic analyzer:

- chemtok-style chemistry-aware splitting (convert_chemdner2BIO.py:95-97)
- WordPiece-merge formula canonicalization: the reference removes the
  spaces WordPiece inserts around ``- / ( )`` (BERT_annotator.py:722-729),
  i.e. intra-token ``-/()`` are part of the token -> our tokenizer never
  splits on them
- selective case-folding mirroring the reference's deliberate CASED model
  runs (run_bert.sh:10 --do_lower_case=False) and case-sensitive stop-word
  matching (run_tool_evaluation.py:574,589-595): fold only all-alpha
  single-case tokens; preserve mixed-case chemical symbols (Epo/EPO/sFas),
  digit-bearing and Greek-letter tokens (TNF-α, 18F-FDG)
- Greek-letter canonicalization (α->alpha ...) emitted as an ADDITIONAL
  indexed variant, never replacing the surface form
- stop-word removal is a case-sensitive broadcast anti-join / isin filter
  (run_tool_evaluation.py:599-608), applied at query/eval time, NOT at
  index time (the index keeps stop terms; they are the skew model)

Two execution modes:
- ``simple``: pure built-in expressions (split + filter) — whole-stage
  codegen, the hot path for already-clean text
- ``chem``: vectorized pandas UDF implementing the full rule set

HTML->text extraction is a hand-rolled regex extractor inside a pandas UDF
(pure function of the html bytes — no library-version drift, keeping the
per-url byte-identity invariant from BASELINE.json input_hint).
"""

from __future__ import annotations

import html as _htmllib
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GREEK_MAP = {
    "α": "alpha", "β": "beta", "γ": "gamma", "δ": "delta", "ε": "epsilon",
    "ζ": "zeta", "η": "eta", "θ": "theta", "ι": "iota", "κ": "kappa",
    "λ": "lambda", "μ": "mu", "ν": "nu", "ξ": "xi", "ο": "omicron",
    "π": "pi", "ρ": "rho", "σ": "sigma", "τ": "tau", "υ": "upsilon",
    "φ": "phi", "χ": "chi", "ψ": "psi", "ω": "omega",
    "Α": "Alpha", "Β": "Beta", "Γ": "Gamma", "Δ": "Delta", "Ω": "Omega",
}

# Surrounding punctuation stripped from token edges; ``- / ( ) + .`` kept
# when INSIDE a token (chemical formulas: 11C-(+)-α-dihydrotetrabenazine).
_EDGE_PUNCT = ".,;:!?\"'`«»()[]{}<>"
_TOKEN_SPLIT_RE = re.compile(r"\s+")
_SINGLE_CASE_ALPHA_RE = re.compile(r"^(?:[a-z]+|[A-Z][a-z]*)$")

_SCRIPT_RE = re.compile(rb"(?is)<(script|style|nav|header|footer)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_BLOCK_TAG_RE = re.compile(
    rb"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|title|section|article)\b[^>]*>"
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_BLANK_RE = re.compile(r"\n\s*\n+")


def extract_text_bytes(raw: bytes) -> str:
    """Pure-function HTML->text. Byte-identical per input, no libraries."""
    if raw is None:
        return ""
    s = _SCRIPT_RE.sub(b" ", raw)
    s = _COMMENT_RE.sub(b" ", s)
    s = _BLOCK_TAG_RE.sub(b"\n", s)
    s = _TAG_RE.sub(b" ", s)
    text = s.decode("utf-8", errors="replace")
    text = _htmllib.unescape(text)
    text = unicodedata.normalize("NFC", text)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    text = "\n".join(lines)
    text = _BLANK_RE.sub("\n", text).strip()
    return text


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def _norm_token(tok: str) -> str | None:
    tok = tok.strip(_EDGE_PUNCT)
    if not tok:
        return None
    tok = unicodedata.normalize("NFC", tok)
    if _SINGLE_CASE_ALPHA_RE.match(tok):
        return tok.lower()
    return tok


def chem_tokenize_str(text: str) -> list[str]:
    """Full chemical-aware tokenization of one string (used inside the
    pandas UDF and by driver-side golden tests)."""
    if not text:
        return []
    out: list[str] = []
    for tok in _TOKEN_SPLIT_RE.split(text):
        t = _norm_token(tok)
        if t:
            out.append(t)
    return out


def greek_variants(tokens: list[str]) -> list[str]:
    """Additional canonical variants for Greek-letter tokens (indexed
    alongside the surface form, SURVEY.md §2.9)."""
    extra = []
    for t in tokens:
        if any(c in GREEK_MAP for c in t):
            extra.append("".join(GREEK_MAP.get(c, c) for c in t))
    return extra


@F.pandas_udf(T.ArrayType(T.StringType()))
def chem_tokenize_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda s: chem_tokenize_str(s) if s is not None else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def chem_tokenize_with_variants_udf(text: pd.Series) -> pd.Series:
    def go(s: str | None) -> list[str]:
        toks = chem_tokenize_str(s) if s is not None else []
        return toks + greek_variants(toks)

    return text.map(go)


def simple_tokens_col(text_col: str | Column = "text") -> Column:
    """JVM-side tokenizer for clean text: whitespace split, drop empties.

    Stays inside whole-stage codegen — the hot path for the index build
    when text needs no chemical normalization. Matches ANSI-SQL
    ``regexp_split_to_array(text, '\\s+')`` so DuckDB oracles align.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def tokenize(df: DataFrame, text_col: str = "text", mode: str = "simple",
             out_col: str = "tokens") -> DataFrame:
    if mode == "simple":
        return df.withColumn(out_col, simple_tokens_col(text_col))
    if mode == "chem":
        return df.withColumn(out_col, chem_tokenize_udf(F.col(text_col)))
    if mode == "chem+greek":
        return df.withColumn(out_col, chem_tokenize_with_variants_udf(F.col(text_col)))
    raise ValueError(f"unknown tokenize mode {mode!r}")


# --- stop words (reference: data/stop_words.txt, 450 case-sensitive terms,
#     leading BOM; loader mirrors run_tool_evaluation.py:561-576) -----------

DEFAULT_STOP_WORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "in", "into", "is", "it", "its", "of", "on", "or",
    "that", "the", "their", "these", "this", "to", "was", "were", "which",
    "with",
]


def load_stop_words(path: str | None = None) -> list[str]:
    """Case-sensitive stop list; strips a leading BOM like the reference
    file has (data/stop_words.txt:1). Falls back to a small built-in
    English list when no file is given."""
    if path is None:
        return list(DEFAULT_STOP_WORDS)
    with open(path, encoding="utf-8-sig") as f:
        words = [ln.strip() for ln in f if ln.strip()]
    seen: set[str] = set()
    out = []
    for w in words:
        if w not in seen:  # duplicate-free invariant (run_tool_evaluation.py:574)
            seen.add(w)
            out.append(w)
    return out


def remove_stop_words(df: DataFrame, stop_words: list[str],
                      term_col: str = "term") -> DataFrame:
    """Case-sensitive stop-word subtraction (F4 / U4 in SURVEY.md §2):
    an isin filter for small lists (broadcast literal, codegen'd)."""
    return df.filter(~F.col(term_col).isin(stop_words))
