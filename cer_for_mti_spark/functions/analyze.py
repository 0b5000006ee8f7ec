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


# --- vectorized (Arrow) analyzer twins --------------------------------------
#
# The scalar chem_tokenize_str above is the SPEC (and what golden tests pin);
# the Arrow kernels below are its batch twins, property-tested byte-identical
# (tests/test_analyze_vectorized.py). They exist because the per-token Python
# loop was the index build's dominant CPU cost (~1.4M tokens/s/core); the
# kernel pipeline runs the same rules at ~10x that.

# Every code point Python's \s matches (str patterns): ASCII whitespace,
# \x1c-\x1f, and the Unicode White_Space set. U+3000 is the highest such
# code point (asserted over the full range in tests), so scanning to it is
# exhaustive.
_PY_WS_CHARS = "".join(
    chr(c) for c in range(0x3001) if _TOKEN_SPLIT_RE.match(chr(c))
)
_WS_CLASS_RE2 = "[" + _PY_WS_CHARS + "]+"
_CASE_RE2 = "^([a-z]+|[A-Z][a-z]*)$"
_GREEK_CLASS_RE2 = "[" + "".join(GREEK_MAP) + "]"


def _needs_unicode_ws_split(arr) -> bool:
    """True when the batch can contain a whitespace code point OUTSIDE
    the 6-char ASCII set — i.e. when Python-\\s splitting and Arrow's
    ascii_split_whitespace could disagree. Detected with one vectorized
    scan of the raw UTF-8 buffer (~GB/s) instead of a regex pass: the
    non-ASCII members all encode as 2-3 byte sequences led by
    C2/E1/E2/E3, and the ASCII-range extras are \\x1c-\\x1f."""
    import numpy as np

    buf = arr.buffers()[2]
    if buf is None or len(buf) == 0:
        return False
    b = np.frombuffer(buf, dtype=np.uint8)
    # \x1c..\x1f (Python-only whitespace)
    if bool(((b >= 0x1C) & (b <= 0x1F)).any()):
        return True
    # any lead byte that can start a non-ASCII whitespace sequence:
    # C2 85 / C2 A0, E1 9A 80 (U+1680), E2 80 80..8A / A8 / A9 / AF,
    # E2 81 9F (U+205F), E3 80 80 (U+3000). Chained equality instead of
    # np.isin: isin sorts/uniques its operands per call, measuring ~16x
    # slower on a 20 MB buffer.
    return bool(((b == 0xC2) | (b == 0xE1) | (b == 0xE2)
                 | (b == 0xE3)).any())


def _split_ws_pa(arr, ascii_only: bool = False):
    """Whitespace-split a pyarrow string array exactly like Python \\s+
    (ASCII kernel when provably equivalent; ascii_only=True forces the
    Java-\\s ASCII semantics of mode='simple'). Returns (flat_raw_tokens,
    offsets0: per-row int64 token offsets BEFORE any filtering)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if ascii_only or not _needs_unicode_ws_split(arr):
        # fast path (typical webtext): no code point on which Python-\s
        # and ASCII splitting disagree -> the 5x-cheaper ASCII kernel is
        # exact (the RE2 class split measured ~0.26s vs ~0.05s per 7.8k
        # docs; this one buffer scan costs ~2% of that)
        toks = pc.ascii_split_whitespace(arr)
    else:
        toks = pc.split_pattern_regex(arr, _WS_CLASS_RE2)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    offs0 = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
    return pc.list_flatten(toks), offs0


def _norm_dict_pa(d, count_only: bool = False):
    """Normalize a batch's DISTINCT raw tokens (its Arrow dictionary):
    edge trim, NFC (non-ASCII minority only), selective case folding.
    Returns (norm: pa.StringArray, keep: np.bool_[K]) — keep marks
    entries whose trimmed form is non-empty. count_only skips NFC and
    folding (they never change which entries survive the trim).

    The point of operating on the dictionary instead of the flat token
    stream (guide §4.2): webtext is Zipf-distributed, so a batch's ~10^4
    distinct raw tokens stand in for ~10^7 occurrences — the trim/NFC/
    regex/fold kernels run at 1/1000th of the stream cost and the result
    is attached back through the codes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    trimmed = pc.utf8_trim(d, _EDGE_PUNCT)
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    if count_only:
        return trimmed, keep
    # NFC: ASCII entries are already normal; route only the non-ASCII
    # minority through Python's normalizer (pyarrow's utf8_normalize does
    # not COMPOSE — verified on 16.1 — so it cannot implement NFC here)
    is_ascii = pc.string_is_ascii(trimmed)
    if pc.min(is_ascii).as_py() is False:
        namask = pc.invert(is_ascii)
        na = trimmed.filter(namask)
        na_norm = pa.array(
            [unicodedata.normalize("NFC", s) for s in na.to_pylist()],
            type=pa.string(),
        )
        norm = pc.replace_with_mask(trimmed, namask, na_norm)
    else:
        norm = trimmed
    fold = pc.match_substring_regex(norm, _CASE_RE2)
    return pc.if_else(fold, pc.ascii_lower(norm), norm), keep


def _tokenize_codes_pa(arr, mode: str = "chem"):
    """Dictionary-encoded batch tokenizer: returns (codes: np.int64,
    vocab: pa.StringArray, offsets: np.ndarray[int64]) where row i's
    normalized tokens are vocab.take(codes[offsets[i]:offsets[i+1]]) —
    the same token stream _tokenize_flat_pa yields, without ever
    materializing the per-occurrence strings. Raw tokens that normalize
    to the same term share one vocab id (vocab entries are distinct,
    first-occurrence ordered)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if mode == "simple":
        flat, offs0 = _split_ws_pa(arr, ascii_only=True)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = enc.dictionary
        keep_d = pc.not_equal(d, "").to_numpy(zero_copy_only=False)
        norm_d = d
    elif mode in ("chem", "chem+greek"):
        flat, offs0 = _split_ws_pa(arr)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        norm_d, keep_d = _norm_dict_pa(enc.dictionary)
    else:
        raise ValueError(f"unknown tokenize mode {mode!r}")
    if len(codes):
        keep_np = keep_d[codes]
        ck = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))
        offs = ck[offs0]
        codes = codes[keep_np]
    else:
        offs = np.zeros(len(offs0), dtype=np.int64)
    # unify dictionary entries that normalized to the same term ("The,"
    # and "the" -> one vocab id); kept-entry first-occurrence order
    norm_list = norm_d.to_pylist()
    remap = np.zeros(len(norm_list), dtype=np.int64)
    vocab_idx: dict = {}
    vocab: list = []
    for j, term in enumerate(norm_list):
        if not keep_d[j]:
            continue
        vid = vocab_idx.get(term)
        if vid is None:
            vid = len(vocab)
            vocab_idx[term] = vid
            vocab.append(term)
        remap[j] = vid
    codes = remap[codes] if len(codes) else codes
    vocab_pa = pa.array(vocab, type=pa.string())
    if mode != "chem+greek":
        return codes, vocab_pa, offs
    # greek variants: additional canonical forms appended after the doc's
    # surface tokens, in source-token order (greek_variants semantics)
    gmask = pc.match_substring_regex(vocab_pa, _GREEK_CLASS_RE2)
    g_d = gmask.to_numpy(zero_copy_only=False) if len(vocab) else \
        np.zeros(0, dtype=bool)
    if not g_d.any():
        return codes, vocab_pa, offs
    var_of = np.full(len(vocab), -1, dtype=np.int64)
    for j in np.flatnonzero(g_d):
        v = "".join(GREEK_MAP.get(c, c) for c in vocab[j])
        vid = vocab_idx.get(v)
        if vid is None:
            vid = len(vocab)
            vocab_idx[v] = vid
            vocab.append(v)
        var_of[j] = vid
    g_np = g_d[codes]
    gidx = np.flatnonzero(g_np)
    n_rows = len(offs) - 1
    base_doc = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))
    var_doc = base_doc[gidx]
    all_doc = np.concatenate([base_doc, var_doc])
    all_grp = np.concatenate([np.zeros(len(base_doc), dtype=np.int8),
                              np.ones(len(var_doc), dtype=np.int8)])
    all_src = np.concatenate([np.arange(len(base_doc), dtype=np.int64),
                              gidx])
    order = np.lexsort((all_src, all_grp, all_doc))
    all_codes = np.concatenate([codes, var_of[codes[gidx]]])[order]
    counts = np.bincount(all_doc, minlength=n_rows).astype(np.int64)
    offs2 = np.concatenate(([0], np.cumsum(counts)))
    return all_codes, pa.array(vocab, type=pa.string()), offs2


def _tokenize_flat_pa(arr, mode: str = "chem", count_only: bool = False):
    """Batch tokenizer over a pyarrow string array.

    Returns (flat_tokens: pa.StringArray, offsets: np.ndarray[int64]) —
    row i's normalized tokens are flat[offsets[i]:offsets[i+1]], exactly
    chem_tokenize_str(row_i) (mode='chem'), that plus greek_variants
    appended (mode='chem+greek'), or the raw \\s+ split with empties
    dropped (mode='simple', the Java-\\s JVM-split twin).

    count_only=True skips NFC + case folding (they never change the
    token COUNT; greek-variant counting still runs for chem+greek) —
    the doc_stats doclen pass needs only offsets.

    The chem paths normalize per DISTINCT raw token (dictionary-encode
    first — see _norm_dict_pa) and materialize the flat stream with one
    dictionary take; 'simple' needs no normalization and skips the
    encode entirely."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if mode == "simple":
        flat, offs0 = _split_ws_pa(arr, ascii_only=True)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        ck = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))
        return flat.filter(keep), ck[offs0]
    if mode not in ("chem", "chem+greek"):
        raise ValueError(f"unknown tokenize mode {mode!r}")
    if count_only:
        # NFC and case folding never change the token count, so the
        # stream path stops at trim; no dictionary pass needed. The
        # returned FLAT array is the trimmed un-normalized tokens —
        # only the offsets are contractual (see docstring).
        flat, offs0 = _split_ws_pa(arr)
        trimmed = pc.utf8_trim(flat, _EDGE_PUNCT)
        keep = pc.not_equal(trimmed, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        ck = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))
        offs = ck[offs0]
        kept = trimmed.filter(keep)
        if mode == "chem":
            return kept, offs
        # greek-variant counting: NFC-invariant for the mapped
        # (composition-free) letters, so the un-normalized stream suffices
        gmask = pc.match_substring_regex(kept, _GREEK_CLASS_RE2)
        g_np = gmask.to_numpy(zero_copy_only=False)
        if not g_np.any():
            return kept, offs
        n_rows = len(offs) - 1
        base_doc = np.repeat(np.arange(n_rows, dtype=np.int64),
                             np.diff(offs))
        extra = np.bincount(base_doc[g_np], minlength=n_rows)
        counts = np.diff(offs) + extra
        return kept, np.concatenate(([0], np.cumsum(counts)))
    codes, vocab, offs = _tokenize_codes_pa(arr, mode)
    return vocab.take(pa.array(codes)), offs


def tokenize_arrow(arr, mode: str = "chem"):
    """Batch tokenizer returning a pa.ListArray (one token list per row)."""
    import numpy as np
    import pyarrow as pa

    flat, offs = _tokenize_flat_pa(arr, mode)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if offs[-1] <= np.iinfo(np.int32).max:
        return pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), flat)
    return pa.LargeListArray.from_arrays(
        pa.array(offs, type=pa.int64()), flat)


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
    import pyarrow as pa

    arr = pa.Array.from_pandas(text, type=pa.string())
    return tokenize_arrow(arr, "chem").to_pandas()


@F.pandas_udf(T.ArrayType(T.StringType()))
def chem_tokenize_with_variants_udf(text: pd.Series) -> pd.Series:
    import pyarrow as pa

    arr = pa.Array.from_pandas(text, type=pa.string())
    return tokenize_arrow(arr, "chem+greek").to_pandas()


def make_token_count_udf(mode: str):
    """(text) -> token count, without materializing the token lists
    through the Arrow boundary — the doc_stats fast path (doclen is the
    only thing that pass needs; shipping 100M+ strings back to the JVM
    just to F.size them was pure overhead)."""

    @F.pandas_udf(T.LongType())
    def token_count(text: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa

        arr = pa.Array.from_pandas(text, type=pa.string())
        _, offs = _tokenize_flat_pa(arr, mode, count_only=True)
        return pd.Series(np.diff(offs))

    return token_count


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
