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


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "sessions" else "append")
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
