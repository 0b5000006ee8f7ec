"""cer_for_mti_spark — a PySpark-native full-text indexing + BM25 retrieval
engine with the query and data-processing capabilities of the reference repo
``saverymax/CER-for-MTI`` (see SURVEY.md), re-imagined Spark-first:

- SPIMI inverted-index build: analyzer pandas-UDFs -> explode -> salted
  groupBy(term) -> sorted docID runs -> delta+varint compressed postings
  range-sharded by term (operators/index_build.py)
- BM25 top-k query: naive declarative DataFrame path (Catalyst-optimized,
  oracle-checkable) and a block-max WAND path via applyInPandas
  (operators/bm25.py)
- the reference's set-algebra / evaluation operators (U1-U5, J1-J5, A1-A8
  in SURVEY.md §2) as DataFrame functions (operators/eval_ops.py)
- training-data-pipeline operators: dedup (exact/MinHash-LSH/SimHash/
  n-gram-Jaccard/embedding-cosine), similarity search, text quality/lang-id/
  token stats, multimodal plumbing (operators/dedup.py, similarity.py,
  textstats.py, multimodal.py)
- per-partition lineage checkpoints + resumable builds (plans/lineage.py)

Everything is DataFrame-declarative; Python appears only in vectorized
pandas/Arrow UDFs (codecs, WAND scorer, analyzer edge rules).
"""

__version__ = "0.1.0"
