from __future__ import annotations

import pytest

from cer_for_mti_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cer_for_mti_spark_tests", cores=8,
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def webtext(spark):
    """Deterministic 300-doc synthetic webtext corpus, cached."""
    from cer_for_mti_spark import datagen

    df = datagen.generate_webtext(spark, 300, seed=7).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def index_300(spark, webtext):
    """(doc_terms, doc_stats, postings, n, avgdl) for the 300-doc corpus."""
    from cer_for_mti_spark.operators import index_build as ib

    dt = ib.build_doc_terms(webtext, mode="chem").cache()
    ds = ib.build_doc_stats(dt).cache()
    n, avgdl = ib.corpus_stats(ds)
    postings = ib.build_postings(dt, ds, avgdl, salt=4).cache()
    return dt, ds, postings, n, avgdl
