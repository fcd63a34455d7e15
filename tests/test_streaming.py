"""Structured Streaming parity: the stream path must reproduce the
batch twin's answer (SURVEY.md §2.11). Runs real readStream queries
with availableNow triggers on the events table."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from scarf_spark import streaming as strm


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    from scarf_spark.catalog import DataStore

    return DataStore(spark, sf_dir).events


def _run_stream(df, name, mode=None):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode or ("complete" if name != "sessions" else "append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, sf_dir, events_batch):
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in strm.tumbling_window_counts(events_batch).collect()
    }
    sdf = strm.tumbling_window_counts(
        strm.read_events_stream(spark, sf_dir), streaming=True
    )
    _run_stream(sdf, "tumbling")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    assert got == batch


def test_sliding_stream_matches_batch(spark, sf_dir, events_batch):
    batch = {
        r["window_start"]: r["n_events"]
        for r in strm.sliding_window_counts(events_batch).collect()
    }
    sdf = strm.sliding_window_counts(
        strm.read_events_stream(spark, sf_dir), streaming=True
    )
    _run_stream(sdf, "sliding")
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    assert got == batch


def test_sessionize_stream_closed_sessions(spark, sf_dir, events_batch):
    # batch truth: all sessions; the stream emits only *closed* ones
    # (the final open session per user stays in state), so compare
    # against batch-sessions minus each user's last session.
    batch = strm.sessionize_batch(events_batch, gap_minutes=30)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("session_id"))
    closed = (
        batch.withColumn("_rn", F.row_number().over(w))
        .where("_rn > 1")
        .select("user_id", "session_start", "session_end", "n_events")
    )
    expect = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    sdf = strm.sessionize_stream(
        strm.read_events_stream(spark, sf_dir), gap_minutes=30
    )
    _run_stream(sdf, "sessions")
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == expect


def test_first_event_dedup_stream_matches_batch(spark, sf_dir, events_batch):
    batch = {
        (r["window_start"], r["user_id"], r["event_type"]): (
            r["first_event_id"],
            r["first_ts"],
        )
        for r in strm.first_event_dedup(events_batch).collect()
    }
    sdf = strm.first_event_dedup(
        strm.read_events_stream(spark, sf_dir), streaming=True
    )
    _run_stream(sdf, "dedup_first")
    got = {
        (r["window_start"], r["user_id"], r["event_type"]): (
            r["first_event_id"],
            r["first_ts"],
        )
        for r in spark.sql("SELECT * FROM dedup_first").collect()
    }
    assert got == batch


def test_stream_to_parquet_ingest(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="scarf_ingest_")
    ckpt = tempfile.mkdtemp(prefix="scarf_ckpt_")
    try:
        q = strm.stream_to_parquet(
            strm.read_events_stream(spark, sf_dir), f"{out}/events", f"{ckpt}/c"
        )
        q.awaitTermination(120)
        n_stream = spark.read.parquet(f"{out}/events").count()
        n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert n_stream == n_batch
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_watermark_drops_late_event(spark, tmp_path):
    """Late-data semantics: in append mode a window finalized by the
    watermark is emitted once; an event arriving after the watermark
    passed its window is DROPPED (no re-emit, no state). Parquet sink +
    checkpoint so the second availableNow run resumes the watermark."""
    import datetime as dt

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    sink = tmp_path / "sink"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(
            [(ts, "view", 1.0) for ts in rows],
            "ts timestamp, event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src) + "/*")
        )
        out = strm.tumbling_window_counts(stream, streaming=True)
        q = (
            out.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        df = spark.read.parquet(str(sink))
        return [(r["window_start"], r["n_events"]) for r in df.collect()]

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    ws10 = int(t(10).replace(tzinfo=dt.timezone.utc).timestamp())
    ws12 = int(t(12).replace(tzinfo=dt.timezone.utc).timestamp())
    # run 1: 10:00 and 12:30 -> watermark 11:30 -> window [10,11) closes
    write_batch("b1", [t(10), t(12, 30)])
    got1 = run_once()
    assert (ws10, 1) in got1
    # run 2: LATE event 10:15 (window already finalized) + 15:00 ->
    # watermark 14:00 -> closes [12,13); the late event must not re-emit
    write_batch("b2", [t(10, 15), t(15)])
    got2 = run_once()
    assert got2.count((ws10, 1)) == 1, "late event re-emitted a finalized window"
    assert (ws12, 1) in got2  # only the 12:30 event; late 10:15 dropped
    assert not any(w == ws10 and n != 1 for w, n in got2)


def test_kmv_stream_matches_batch_sketch(spark, sf_dir, events_batch):
    """The streaming KMV sketch's final update per key equals the
    oracle-verified batch sketch (same hash, same estimator)."""
    from scarf_spark.operators.aggregate import kmv_distinct

    batch = {
        r["event_type"]: (r["exact_ndv"], r["h_k"], r["est_ndv"])
        for r in kmv_distinct(events_batch, "event_type", "user_id", k=64).collect()
    }
    stream = strm.kmv_distinct_stream(
        strm.read_events_stream(spark, sf_dir), k=64
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kmv_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # one file -> one trigger -> the last update per key is the total
    got = {
        r["event_type"]: (r["exact_ndv"], r["h_k"], r["est_ndv"])
        for r in spark.sql("SELECT * FROM kmv_updates").collect()
    }
    assert got == batch


def test_hll_stream_matches_batch_sketch(spark, sf_dir, events_batch):
    """The streaming HLL's final update per key equals the
    oracle-verified batch sketch (same md5 register layout, same
    integer-exact estimator; est compared to 1e-6 — the two sides
    round display values with different tie rules)."""
    from scarf_spark.operators.aggregate import hll_distinct

    batch = {
        r["event_type"]: (r["exact_ndv"], r["n_zero_regs"], r["est_ndv"])
        for r in hll_distinct(events_batch, "event_type", "user_id", p=6).collect()
    }
    stream = strm.hll_distinct_stream(strm.read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["exact_ndv"], r["n_zero_regs"], r["est_ndv"])
        for r in spark.sql("SELECT * FROM hll_updates").collect()
    }
    assert got.keys() == batch.keys()
    for k in batch:
        assert got[k][0] == batch[k][0]
        assert got[k][1] == batch[k][1]
        assert abs(got[k][2] - batch[k][2]) < 1e-6


def test_stream_upsert_skips_replayed_keys(spark, sf_dir, tmp_path):
    """Running the same bounded stream twice must not duplicate rows —
    the second run's batches anti-join away every existing key."""
    out = str(tmp_path / "upsert_out")

    def run_once(ckpt_suffix):
        stream = strm.read_events_stream(spark, sf_dir)
        q = (
            strm.stream_upsert_parquet(stream, out)
            .option("checkpointLocation", str(tmp_path / f"ck{ckpt_suffix}"))
            .start()
        )
        q.awaitTermination(120)

    run_once(1)
    n1 = spark.read.parquet(out).count()
    run_once(2)  # fresh checkpoint -> source replays everything
    n2 = spark.read.parquet(out).count()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n1 == total
    assert n2 == total  # no duplicates after the replay


def test_enrich_stream_matches_batch(spark, sf_dir, events_batch):
    from scarf_spark.catalog import DataStore

    cust = DataStore(spark, sf_dir).customer
    batch = {
        (r["segment"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in strm.enrich_events(events_batch, cust).collect()
    }
    sdf = strm.enrich_events(
        strm.read_events_stream(spark, sf_dir), cust, streaming=True
    )
    _run_stream(sdf, "enriched")
    got = {
        (r["segment"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == batch


def test_attribution_stream_matches_batch(spark, sf_dir, events_batch):
    batch = {
        (r["click_id"], r["purchase_id"]): r["delay_s"]
        for r in strm.attribution_join(events_batch, interval_minutes=120).collect()
    }
    sdf = strm.attribution_join(
        strm.read_events_stream(spark, sf_dir),
        strm.read_events_stream(spark, sf_dir),
        interval_minutes=120,
        streaming=True,
    )
    _run_stream(sdf, "attrib", mode="append")
    got = {
        (r["click_id"], r["purchase_id"]): r["delay_s"]
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert len(batch) > 0 and got == batch


def test_incremental_dedup_stream_ingest(spark, tmp_path):
    """foreachBatch corpus maintenance: each microbatch probes the
    PERSISTED bucket store for near-dup candidates and appends its own
    buckets — the O(batch) nightly-ingest dedup loop, run as a real
    stream. A doc in batch 2 duplicating a batch-1 doc must surface as
    a cross-batch candidate pair."""
    src = tmp_path / "docs"
    store = str(tmp_path / "buckets")
    pairs_out = str(tmp_path / "pairs")
    src.mkdir()
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different words about spark shuffles and joins here"
    spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(3, t1 + " extra"), (4, "nothing like the others at all truly")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "b2"))

    from scarf_spark.operators.dedup import incremental_minhash_candidates

    def ingest(batch, _bid):
        sp = batch.sparkSession
        try:
            stored = sp.read.parquet(store)
        except Exception:
            stored = sp.createDataFrame(
                [], "doc_id long, band int, bucket string"
            )
        pairs, new_buckets = incremental_minhash_candidates(batch, stored)
        pairs.write.mode("append").parquet(pairs_out)
        new_buckets.write.mode("append").parquet(store)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_out).collect()}
    assert (1, 3) in got  # cross-batch near-dup found via the store
    assert not any(a == b for a, b in got)
    n_bucket_docs = (
        spark.read.parquet(store).select("doc_id").distinct().count()
    )
    assert n_bucket_docs == 4  # every ingested doc is now in the store


def test_decontaminate_stream_matches_batch(spark, sf_dir):
    """Decontamination at ingest: the streaming form (file-source doc
    stream + static broadcast benchmark shingles + one collect_set
    aggregation) must produce the per-doc verdicts of the batch twin."""
    from pyspark.sql import functions as F

    from scarf_spark.catalog import DataStore
    from scarf_spark.operators.dedup import word_shingles

    docs = DataStore(spark, sf_dir).documents
    bench_sh = word_shingles(docs.where(F.col("source") == "src0"), 4)
    batch = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in strm.decontaminate_stream(
            docs.where(F.col("source") != "src0"), bench_sh, n=4
        ).collect()
    }
    stream_docs = strm.read_documents_stream(spark, sf_dir).where(
        F.col("source") != "src0"
    )
    sdf = strm.decontaminate_stream(stream_docs, bench_sh, n=4)
    _run_stream(sdf, "decon", mode="complete")
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in spark.sql("SELECT * FROM decon").collect()
    }
    assert len(batch) > 0 and got == batch
    assert any(v[1] for v in got.values())  # at least one contaminated doc


def test_attribution_stream_matches_batch(spark, sf_dir, events_batch):
    from scarf_spark.operators.windows import last_touch_attribution

    batch = {
        r["channel"]: (r["n_purchases"], r["revenue_micros"])
        for r in last_touch_attribution(events_batch).collect()
    }
    sdf = strm.attribution_stream(strm.read_events_stream(spark, sf_dir))
    _run_stream(sdf, "attrib_rows", mode="append")
    got = {
        r["channel"]: (r["n"], r["rev"])
        for r in spark.sql(
            "SELECT channel, COUNT(*) AS n, SUM(rev_micros) AS rev "
            "FROM attrib_rows GROUP BY channel"
        ).collect()
    }
    assert got == batch


def test_cms_stream_matches_batch_cells(spark, sf_dir, events_batch):
    """The streaming count-min sketch's final cells (complete mode —
    the CMS update is just a windowless groupBy) equal the batch
    cms_cells table exactly: counts are integers, no tolerance."""
    from scarf_spark.operators.aggregate import cms_cells

    batch = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_cells(events_batch, "event_type").collect()
    }
    stream = strm.cms_sketch_stream(
        strm.read_events_stream(spark, sf_dir), "event_type"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cms_cells_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_cells_t").collect()
    }
    assert got == batch
