"""Structured Streaming: incremental doc_terms deltas equal the batch
relation; windowed event counts respect watermark semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cer_for_mti_spark import datagen
from cer_for_mti_spark.operators import index_build as ib
from cer_for_mti_spark.streaming import ingest


def test_stream_doc_terms_matches_batch(spark, tmp_path):
    """availableNow stream over a docs directory -> appended deltas union
    to exactly the batch doc_terms relation (incremental == full rebuild)."""
    docs = datagen.generate_webtext(spark, 60, seed=11)
    input_dir = str(tmp_path / "docs_in")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    docs.repartition(6).write.parquet(input_dir)

    delta_dir = str(tmp_path / "deltas")
    ckpt = str(tmp_path / "ckpt")
    q = ingest.stream_doc_terms(spark, input_dir, delta_dir, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(delta_dir)
        .select("doc_id", "term", "tf")
    )
    want = ib.build_doc_terms(spark.read.parquet(input_dir))
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, want.collect()))
    assert a == b and len(a) > 0

    # restart with the same checkpoint: no new files -> no new rows
    q2 = ingest.stream_doc_terms(spark, input_dir, delta_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(delta_dir).count() == len(a)


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions separated by more
    than the gap are emitted; aggregates match the batch computation."""
    rows = [
        (1, "2025-01-01 00:00:00", 1.0),
        (1, "2025-01-01 00:10:00", 2.0),
        (1, "2025-01-01 02:00:00", 3.0),   # > 30min gap -> new session
        (2, "2025-01-01 00:05:00", 5.0),
        (1, "2025-01-01 02:05:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    src = str(tmp_path / "sess_in")
    df.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    out = ingest.sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.sql("select * from sessions").collect()
    }
    # the first user-1 session (2 events, value 3.0) is provably closed by
    # the 02:00 event; later sessions wait in state for timeout/more data
    assert (1, 2, 3.0) in got


def test_windowed_event_counts(spark, tmp_path):
    """Watermarked sliding window over a file stream: counts per
    (window, event_type) match a batch groupBy on the same data."""
    rows = [
        ("2025-01-01 00:00:30", "click"),
        ("2025-01-01 00:01:10", "click"),
        ("2025-01-01 00:01:40", "view"),
        ("2025-01-01 00:07:00", "click"),
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
        F.to_timestamp("ts_s").alias("ts"), "event_type",
        F.lit(1.0).alias("value"),
    )
    src = str(tmp_path / "ev_in")
    df.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src)
    )
    agg = ingest.windowed_event_counts(stream, window="5 minutes",
                                       slide="5 minutes")
    out = str(tmp_path / "ev_out")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("ev_counts")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark is max(ts)-10min, so assert against
    # the complete recomputation instead of hand-counted rows
    got = spark.sql("select * from ev_counts")
    batch = (
        df.groupBy(F.window("ts", "5 minutes", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    got_rows = {(r.window.start, r.event_type, r.n) for r in got.collect()}
    batch_rows = {(r.window.start, r.event_type, r.n) for r in batch.collect()}
    assert got_rows <= batch_rows


def test_sessionize_stream_late_events(spark, tmp_path):
    """Cross-batch late events (older than the open session's start):
    within the gap -> the session start extends BACKWARDS; a full gap
    before it -> the event forms its own earlier session instead of being
    silently absorbed. Watermark is set wide so Spark doesn't pre-drop
    the late rows before the stateful operator sees them."""
    src = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "late_ckpt")
    out_dir = str(tmp_path / "late_out")

    def run_batch(rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
        df.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, value double")
            .parquet(src)
        )
        out = ingest.sessionize_stream(stream, gap_seconds=1800,
                                       watermark="12 hours")

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([(1, "2025-01-01 02:00:00", 1.0)])
    # batch 2: one event a full gap before the open session (own session),
    # one within the gap (extends the session backwards), one after the
    # gap (closes and emits the extended session)
    run_batch([
        (1, "2025-01-01 00:00:00", 5.0),
        (1, "2025-01-01 01:45:00", 2.0),
        (1, "2025-01-01 03:00:00", 3.0),
    ])
    got = {
        (r.n_events, r.total_value, str(r.session_start))
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, 5.0, "2025-01-01 00:00:00") in got
    assert (2, 3.0, "2025-01-01 01:45:00") in got


def test_stream_append_runs_index(spark, tmp_path):
    """Streaming straight into the runs index: micro-batches are atomic
    lineage-keyed appends, the final index is query-identical to
    from-scratch runs over base+streamed docs at the frozen avgdl, a
    checkpoint restart with no new files appends nothing, and an
    explicit replay of a committed stream batch id is a no-op."""
    from cer_for_mti_spark.operators import bm25

    full = datagen.generate_webtext(spark, 100, seed=41).cache()
    base = full.filter(F.col("doc_id") < 50)
    new = full.filter(F.col("doc_id") >= 50)
    dt = ib.build_doc_terms(base).cache()
    ds = ib.build_doc_stats(dt)
    _, avgdl = ib.corpus_stats(ds)
    idx = str(tmp_path / "stream_runs_idx")
    ib.write_runs_index(
        ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=100),
        ds, idx, num_shards=4)

    input_dir = str(tmp_path / "stream_docs_in")
    new.repartition(5).write.parquet(input_dir)  # >1 micro-batch at 4/trigger
    ckpt = str(tmp_path / "stream_ckpt")
    sch = "doc_id long, text string, lang string, source string, n_chars long"
    q = ingest.stream_append_runs_index(spark, input_dir, idx, ckpt,
                                        num_shards=4, schema=sch)
    q.awaitTermination(180)

    assert spark.read.parquet(f"{idx}/doc_stats").count() == 100
    qs = spark.createDataFrame(
        [(0, "the data"), (1, "insulin protein")],
        "query_id int, query string")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25.bm25_wand_sharded_from_index(
            spark, idx, qs, 100, avgdl, k=10, num_shards=4).collect())
    dt_f = ib.build_doc_terms(full)
    ds_f = ib.build_doc_stats(dt_f)
    runs_f = ib.build_posting_runs(dt_f, ds_f, avgdl, salt=4, n_docs=100)
    want = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in bm25.bm25_wand_sharded(qs, runs_f, 100, avgdl,
                                        k=10).collect())
    assert got == want and len(got) > 0

    # checkpoint restart, no new files -> no duplicate appends
    q2 = ingest.stream_append_runs_index(spark, input_dir, idx, ckpt,
                                         num_shards=4, schema=sch)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{idx}/doc_stats").count() == 100

    # an explicit replay of a committed stream batch is a lineage no-op
    lin = spark.read.parquet(f"{idx}/append_lineage")
    bids = sorted({r.batch_id for r in lin.select("batch_id").collect()})
    assert bids and all(b.startswith("stream-") for b in bids)
    assert ib.append_runs_index(spark, idx, new, avgdl, num_shards=4,
                                batch_id=bids[0]) == 0
    assert spark.read.parquet(f"{idx}/doc_stats").count() == 100


def test_stream_append_positional_runs_index(spark, tmp_path):
    """Positional streaming twin: micro-batches are lineage-keyed atomic
    appends; streamed phrase hits are identical to a from-scratch
    positional build (no stats caveat at all); restart appends nothing;
    replaying a committed stream batch id is a no-op."""
    from cer_for_mti_spark.operators import phrase as ph

    full = datagen.generate_webtext(spark, 100, seed=43).cache()
    base = full.filter(F.col("doc_id") < 50)
    new = full.filter(F.col("doc_id") >= 50)
    idx = str(tmp_path / "stream_pos_idx")
    ph.write_positional_runs_index(
        ph.build_positional_runs(base, salt=4, n_docs=100), idx,
        num_shards=4, docs=base)

    input_dir = str(tmp_path / "stream_pos_in")
    new.repartition(5).write.parquet(input_dir)
    ckpt = str(tmp_path / "stream_pos_ckpt")
    sch = "doc_id long, text string, lang string, source string, n_chars long"
    q = ingest.stream_append_positional_runs_index(
        spark, input_dir, idx, ckpt, num_shards=4, schema=sch)
    q.awaitTermination(180)

    assert spark.read.parquet(f"{idx}/docs").count() == 100
    phrases = spark.createDataFrame(
        [(0, "the data"), (1, "the")], "query_id int, query string")
    key = lambda rows: sorted((r.phrase_id, r.doc_id, r.n_matches)
                              for r in rows)
    got = key(ph.phrase_search_sharded_from_index(
        spark, idx, phrases, num_shards=4).collect())
    runs_f = ph.build_positional_runs(full, salt=4, n_docs=100)
    want = key(ph.phrase_search_sharded(phrases, runs_f).collect())
    assert got == want and len(got) > 0

    # restart: no new files -> nothing appended
    q2 = ingest.stream_append_positional_runs_index(
        spark, input_dir, idx, ckpt, num_shards=4, schema=sch)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{idx}/docs").count() == 100

    # replay of a committed stream batch id is a lineage no-op
    lin = spark.read.parquet(f"{idx}/append_lineage")
    bids = sorted({r.batch_id for r in lin.select("batch_id").collect()})
    assert bids and all(b.startswith("stream-") for b in bids)
    assert ib.append_positional_runs_index(
        spark, idx, new, num_shards=4, batch_id=bids[0]) == 0


def test_stream_append_ann_index(spark, tmp_path):
    """ANN streaming twin: micro-batches append vectors under the
    frozen-quantizer contract; the streamed index's codes are
    content-identical to a full re-encode with the stored artifacts;
    restart appends nothing; replaying a committed stream batch id is a
    no-op."""
    from cer_for_mti_spark.operators import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()
    base = emb.filter(F.col("vec_id") < 300)
    new = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    idx = str(tmp_path / "stream_ann_idx")
    similarity.write_ann_index(base, idx, n_centroids=8, m=8, ks=16,
                               store_vectors=True)

    input_dir = str(tmp_path / "stream_ann_in")
    new.repartition(5).write.parquet(input_dir)
    ckpt = str(tmp_path / "stream_ann_ckpt")
    q = ingest.stream_append_ann_index(spark, input_dir, idx, ckpt)
    q.awaitTermination(180)

    codes_df, _, books = similarity.read_ann_index(spark, idx)
    got = {r["id"]: (r["cell"], bytes(r["codes"]))
           for r in codes_df.collect()}
    cents = spark.read.parquet(f"{idx}/centroids")
    both = base.unionByName(new)
    assigned = similarity.ivf_assign(both, cents)
    want_codes = similarity.pq_encode(
        assigned.select(F.col("id").alias("vec_id"),
                        F.col("v").alias("embedding")), books
    ).join(assigned.select("id", "cell"), "id")
    want = {r["id"]: (r["cell"], bytes(r["codes"]))
            for r in want_codes.collect()}
    assert got == want and len(got) == 400
    assert spark.read.option("basePath", f"{idx}/vectors").parquet(
        f"{idx}/vectors").count() == 400

    # restart: nothing new
    q2 = ingest.stream_append_ann_index(spark, input_dir, idx, ckpt)
    q2.awaitTermination(120)
    assert spark.read.option("basePath", f"{idx}/codes").parquet(
        f"{idx}/codes").count() == 400

    # replay of a committed stream batch id is a lineage no-op
    from cer_for_mti_spark.operators import index_build as ib_mod
    lin = spark.read.parquet(f"{idx}/append_lineage")
    bids = sorted({r.batch_id for r in lin.select("batch_id").collect()})
    assert bids and all(b.startswith("stream-") for b in bids)
    assert similarity.append_ann_index(spark, idx, new,
                                       batch_id=bids[0]) == 0


def test_stream_append_maintains_dict_sidecars(spark, tmp_path):
    """Micro-batch appends stage fuzzy_dict and rev_dict deltas exactly
    like batch appends (streaming rides append_runs_index), so after a
    stream the sidecars' summed global state equals a from-scratch
    build's — vocabulary-scale fuzzy and leading-wildcard queries stay
    correct on stream-grown indexes without any rebuild."""
    from cer_for_mti_spark.operators import fuzzy_dict as fz
    from cer_for_mti_spark.operators import rev_dict as rv

    full = datagen.generate_webtext(spark, 100, seed=47).cache()
    base = full.filter(F.col("doc_id") < 50)
    new = full.filter(F.col("doc_id") >= 50)
    dt = ib.build_doc_terms(base).cache()
    ds = ib.build_doc_stats(dt)
    _, avgdl = ib.corpus_stats(ds)
    idx = str(tmp_path / "stream_dict_idx")
    ib.write_runs_index(
        ib.build_posting_runs(dt, ds, avgdl, salt=4, n_docs=100),
        ds, idx, num_shards=4)
    fz.write_fuzzy_dict(spark, idx, max_dist=1)
    rv.write_rev_dict(spark, idx)

    input_dir = str(tmp_path / "stream_dict_in")
    new.repartition(3).write.parquet(input_dir)
    ckpt = str(tmp_path / "stream_dict_ckpt")
    sch = "doc_id long, text string, lang string, source string, n_chars long"
    q = ingest.stream_append_runs_index(spark, input_dir, idx, ckpt,
                                        num_shards=4, schema=sch)
    q.awaitTermination(180)
    assert spark.read.parquet(f"{idx}/doc_stats").count() == 100

    dt_f = ib.build_doc_terms(full).cache()
    ds_f = ib.build_doc_stats(dt_f)
    runs_f = ib.build_posting_runs(dt_f, ds_f, avgdl, salt=4, n_docs=100)
    idx_f = str(tmp_path / "stream_dict_scratch")
    ib.write_runs_index(runs_f, ds_f, idx_f, num_shards=4)
    fz.write_fuzzy_dict(spark, idx_f, max_dist=1)
    rv.write_rev_dict(spark, idx_f)

    def fuzzy_state(p):
        return {(r.variant, r.term, r.df)
                for r in ib.read_index_rel(spark, p, "fuzzy_dict")
                .groupBy("variant", "term")
                .agg(F.sum("df").cast("long").alias("df")).collect()}

    def rev_state(p):
        return {(r.rev, r.term, r.df)
                for r in ib.read_index_rel(spark, p, "rev_dict")
                .groupBy("rev", "term")
                .agg(F.sum("df").cast("long").alias("df")).collect()}

    assert fuzzy_state(idx) == fuzzy_state(idx_f) and fuzzy_state(idx)
    assert rev_state(idx) == rev_state(idx_f) and rev_state(idx)
