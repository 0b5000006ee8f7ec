"""The north_rule's reference-query-set gate: index the reference's own
200-doc ChEMFAM corpus (S1 whole-file scan, chem analyzer) and run the
reference query set (the gold entity strings) as BM25 top-k queries.

Checks:
1. all three scorer paths are rank-identical on every query;
2. results match the FROZEN golden fixture (tests/fixtures/
   chemfam_topk.json) — regenerate with REGEN_CHEMFAM_FIXTURE=1 when the
   analyzer/scorer semantics intentionally change;
3. every single-term query whose term appears verbatim in exactly one
   document returns that document at rank 1 (identity self-test, the
   engine analogue of the reference's gold self-eval P=R=F1=1.0).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import bm25
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.operators import reference_parity as rp
from cer_for_mti_spark.sources import formats

pytestmark = pytest.mark.skipif(
    not rp.reference_available(), reason="/root/reference not present"
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "chemfam_topk.json")
N_QUERIES = 200  # first N entities (sorted) of the 1293-entity gold set
K = 5


@pytest.fixture(scope="module")
def chemfam_index(spark):
    docs = formats.read_whole_files(
        spark, f"{rp.REF}/data/ChEMFAM_corpus/*.txt"
    ).select(
        F.col("pmid").cast("long").alias("doc_id"), "text"
    ).cache()
    assert docs.count() == 200
    postings, ds, n, avgdl = ib.build_index(docs, mode="chem", plan="spimi")
    return docs, postings.cache(), ds, n, avgdl


@pytest.fixture(scope="module")
def gold_queries(spark):
    with open(f"{rp.REF}/data/annotation_sets/nested_all_entities.txt",
              encoding="utf8") as f:
        ents = sorted({ln.strip() for ln in f if ln.strip()})
    sel = ents[:N_QUERIES]
    return spark.createDataFrame(
        list(enumerate(sel)), "query_id int, query string"
    ), sel


def _key(rows):
    return {
        r.query_id: [(r2.rank, r2.doc_id, round(r2.score, 6))
                     for r2 in rows if r2.query_id == r.query_id]
        for r in rows
    }


def test_reference_query_set_rank_identity_and_golden(spark, chemfam_index,
                                                      gold_queries):
    docs, postings, ds, n, avgdl = chemfam_index
    queries, ents = gold_queries
    dt = ib.build_doc_terms(docs, mode="chem")

    wand = bm25.bm25_wand(queries, postings, n, avgdl, k=K, mode="chem",
                          scorer="wand").collect()
    taat = bm25.bm25_wand(queries, postings, n, avgdl, k=K, mode="chem",
                          scorer="taat").collect()
    naive = bm25.bm25_naive(queries, dt, ds, n, avgdl, k=K,
                            mode="chem").collect()
    a, b, c = _key(wand), _key(taat), _key(naive)
    assert a == b == c
    assert len(a) > 0

    got = {
        ents[qid]: sorted(hits) for qid, hits in a.items()
    }
    serial = {
        q: [[r, int(d), s] for r, d, s in hits] for q, hits in got.items()
    }
    if os.environ.get("REGEN_CHEMFAM_FIXTURE"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w", encoding="utf8") as f:
            json.dump(serial, f, indent=0, sort_keys=True, ensure_ascii=False)
        pytest.skip("fixture regenerated")
    with open(FIXTURE, encoding="utf8") as f:
        frozen = json.load(f)
    assert serial == frozen, "top-k drifted from frozen golden fixture"


def test_unique_entity_self_rank1(spark, chemfam_index):
    """Entities that tokenize to a single term with df == 1 must return
    their own document at rank 1 with k=1."""
    docs, postings, ds, n, avgdl = chemfam_index
    dt = ib.build_doc_terms(docs, mode="chem")
    rare = (
        dt.groupBy("term").agg(F.count("*").alias("df"),
                               F.first("doc_id").alias("d"))
        .filter(F.col("df") == 1)
        .orderBy("term")
        .limit(25)
        .collect()
    )
    assert rare
    q = spark.createDataFrame(
        [(i, r["term"]) for i, r in enumerate(rare)],
        "query_id int, query string",
    )
    top = bm25.bm25_wand(q, postings, n, avgdl, k=1, mode="chem").collect()
    want = {i: r["d"] for i, r in enumerate(rare)}
    got = {r.query_id: r.doc_id for r in top if r.rank == 1}
    assert got == want
