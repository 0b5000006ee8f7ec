"""Deterministic synthetic Common-Crawl-style webtext generator.

Produces the engine's input table per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Fully seeded (doc i's content is a pure function of (seed, i) — no
wall-clock, no RNG state shared across partitions), generated
DISTRIBUTED via ``spark.range(n).mapInPandas`` so the same generator
scales from 64-doc unit fixtures to bench corpora; at 10^12-doc scale the
identical code fans out across executors because each row derives only
from its own id.

Body text: Zipf-distributed common vocabulary (top ranks model stop-word
skew — the reference's own 450-term stop list is the skew model,
SURVEY.md §4.2.1) mixed with chemical-entity hard cases from the
reference's gold set style (TNF-α, 18F-FDG, mixed-case symbols) so the
analyzer's normalization rules are exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WEBTEXT_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)

_COMMON = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "was", "on", "are", "as", "with", "be", "by", "at", "from", "this",
    "data", "web", "page", "system", "time", "new", "use", "can", "which",
    "has", "more", "other", "into", "than", "its", "also", "these", "may",
    "such", "used", "between", "study", "results", "found", "analysis",
    "model", "based", "high", "level", "cell", "protein", "acid", "group",
    "effect", "treatment", "patients", "clinical", "activity", "binding",
    "structure", "compound", "reaction", "method", "sample", "process",
    "surface", "water", "energy", "field", "value", "table", "figure",
]

_CHEM = [
    "TNF-α", "IL-6", "sFas", "18F-FDG", "Epo", "EPO", "NaCl", "H2O",
    "CO2", "beta-globulin", "11C-(+)-α-dihydrotetrabenazine", "ATP",
    "cAMP", "DNA", "mRNA", "Ca2+", "Mg2+", "acetylcholine", "dopamine",
    "serotonin", "glutamate", "insulin", "hemoglobin", "ferritin",
    "methionine", "cysteine", "glutathione", "NADPH", "FeSO4",
]

_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr"]


def _vocab(seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(words, zipf cumulative probs) — ~5k synthetic word vocabulary."""
    rng = np.random.default_rng(seed)
    syll = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    extra = [
        "".join(rng.choice(syll, size=rng.integers(3, 9)))
        for _ in range(5000 - len(_COMMON))
    ]
    words = np.array(_COMMON + extra)
    ranks = np.arange(1, len(words) + 1, dtype=np.float64)
    p = 1.0 / ranks**1.07
    p /= p.sum()
    return words, np.cumsum(p)


def _doc_row(i: int, seed: int, words: np.ndarray, cum: np.ndarray) -> tuple:
    h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
    rng = np.random.default_rng(h)
    n_words = int(rng.integers(40, 400))
    u = rng.random(n_words)
    toks = words[np.searchsorted(cum, u)].tolist()
    # plant 0-6 chemical entities
    for _ in range(int(rng.integers(0, 7))):
        toks[int(rng.integers(0, n_words))] = _CHEM[int(rng.integers(0, len(_CHEM)))]
    title = " ".join(toks[: int(rng.integers(3, 9))])
    body = " ".join(toks)
    text = title + "\n" + body
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    url = f"https://example.org/{lang}/doc-{seed}-{i}"
    boiler = (
        b"<nav><a href='/'>home</a></nav><script>var x=1;</script>"
        if h % 10 == 0
        else b""
    )
    html = (
        b"<html><head><title>" + title.encode() + b"</title></head><body>"
        + boiler
        + b"<p>" + body.encode() + b"</p></body></html>"
    )
    ts = pd.Timestamp("2025-01-01T00:00:00Z") + pd.Timedelta(seconds=h % 31_536_000)
    return (i, url, ts.tz_localize(None), html, text, lang)


def generate_webtext(spark: SparkSession, n_docs: int, seed: int = 42,
                     partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: doc i depends only on (seed, i)."""
    if partitions is None:
        partitions = max(8, min(64, n_docs // 1000 or 1))
    words, cum = _vocab(seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc_row(int(i), seed, words, cum) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "warc_ts", "html", "text", "lang"]
            )

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(
        gen, schema=WEBTEXT_SCHEMA
    )
