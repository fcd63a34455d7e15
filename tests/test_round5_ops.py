"""Round-5 operator units: document chunking, PII redaction,
deterministic stratified sampling, first-event dedup batch semantics."""

from pyspark.sql import functions as F

from scarf_spark.operators.filters import stratified_sample
from scarf_spark.operators.text import chunk_documents, pii_redact


def test_chunk_documents_windows_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "a" * 500),   # 500 chars -> starts 0,150,300,450
            (2, "xyz"),       # shorter than one chunk
            (3, ""),          # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=200, stride=150)
    rows = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_start"], r["chunk_len"])
        for r in out.collect()
    }
    assert {k[0] for k in rows} == {1, 2}
    assert [rows[(1, i)] for i in range(4)] == [
        (0, 200),
        (150, 200),
        (300, 200),
        (450, 50),  # tail chunk truncated at doc end
    ]
    assert rows[(2, 0)] == (0, 3)
    # overlap: consecutive chunks share chunk_size - stride = 50 chars
    texts = {
        r["chunk_id"]: r["chunk_text"]
        for r in out.where("doc_id = 1").collect()
    }
    assert texts[0][150:] == texts[1][:50]


def test_pii_redact_counts_and_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith99@example.co.uk or call 5551234567 now"),
            (2, "no pii here 12345"),  # 5 digits: below the 6+ threshold
            (3, "two: a@b.de c@d.io"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 1
    # the email's digits were redacted with it -> only the phone counts
    assert out[1]["n_number_runs"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> or call <NUM> now"
    assert out[2]["n_emails"] == 0
    assert out[2]["n_number_runs"] == 0
    assert out[2]["redacted"] == "no pii here 12345"
    assert out[3]["n_emails"] == 2
    assert out[3]["redacted"] == "two: <EMAIL> <EMAIL>"


def test_stratified_sample_exact_counts_and_determinism(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    out = stratified_sample(df, "lang", 0.1, "doc_id")
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # strata sizes: 334 (lang 0), 333, 333 -> ceil(0.1 * n)
    assert per == {"0": 34, "1": 34, "2": 34}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b


def test_chunk_reconstruction_property(spark):
    """With stride == chunk_size (no overlap), concatenating a doc's
    chunks in chunk_id order reproduces the document exactly."""
    import hashlib

    texts = [
        hashlib.md5(str(i).encode()).hexdigest() * (i % 7 + 1)  # 32..224 chars
        for i in range(25)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_size=50, stride=50)
    got = {}
    for r in sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])):
        got[r["doc_id"]] = got.get(r["doc_id"], "") + r["chunk_text"]
    assert got == {i: t for i, t in enumerate(texts)}


def test_pii_redact_idempotent(spark):
    """Redacting already-redacted text changes nothing and counts 0."""
    docs = spark.createDataFrame(
        [(1, "mail bob.smith99@example.co.uk or call 5551234567 now")],
        "doc_id long, text string",
    )
    once = pii_redact(docs).select(
        "doc_id", F.col("redacted").alias("text")
    )
    twice = pii_redact(once).collect()[0]
    assert twice["n_emails"] == 0
    assert twice["n_number_runs"] == 0
    assert twice["redacted"] == "mail <EMAIL> or call <NUM> now"


def test_quantize_int8_reconstruction(spark):
    from scarf_spark.operators.knn import quantize_int8

    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.5]),          # exact grid: codes 0,255,128(127.5->128)
            (2, [3.0, 3.0, 3.0]),          # constant vector -> scale 0, codes 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    assert out[1]["qmin"] == 0.0
    assert abs(out[1]["qscale"] - 1.0 / 255.0) < 1e-15
    assert out[1]["code_sum"] == 0 + 255 + 128
    # max per-element error is half a step: (1/255/2)^2 ~ 3.8e-6 = 3846 ppb
    assert out[1]["mse_ppb"] <= 3846
    assert out[2]["qscale"] == 0.0
    assert out[2]["code_sum"] == 0
    # constant vector reconstructs exactly: qmin + 0*0 = value
    assert out[2]["mse_ppb"] == 0


def test_datastore_events_handles_nanos_and_micros(spark, tmp_path):
    """Round-4 regression: events.parquet has shipped as both
    TIMESTAMP(NANOS) (read as long under nanosAsLong, rebuilt to
    micros) and TIMESTAMP(MICROS) (kept as-is). DataStore must load
    either to the same timestamp values."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scarf_spark.catalog import DataStore

    ts = [dt.datetime(2024, 1, 1, 10, 0, 0), dt.datetime(2024, 1, 1, 11, 30, 0)]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["", ""]),
    }
    got = {}
    for unit in ("ns", "us"):
        d = tmp_path / unit
        d.mkdir()
        table = pa.table({**cols, "ts": pa.array(ts, pa.timestamp(unit))})
        pq.write_table(table, d / "events.parquet")
        df = DataStore(spark, str(d)).events
        assert dict(df.dtypes)["ts"].startswith("timestamp")
        got[unit] = sorted(
            (r["event_id"], r["ts"].replace(tzinfo=None)) for r in df.collect()
        )
    assert got["ns"] == got["us"] == [(1, ts[0]), (2, ts[1])]


def test_first_event_dedup_batch_earliest_wins(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (5, t0.replace(minute=30), 7, "click", 1.0, ""),
        (2, t0.replace(minute=10), 7, "click", 1.0, ""),   # earliest
        (9, t0.replace(minute=10), 7, "click", 1.0, ""),   # ts tie -> smaller id
        (3, t0.replace(hour=11), 7, "click", 1.0, ""),     # next window
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from scarf_spark.streaming.events import first_event_dedup

    out = {
        (r["window_start"], r["user_id"]): r["first_event_id"]
        for r in first_event_dedup(events).collect()
    }
    ws10 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[(ws10, 7)] == 2
    assert out[(ws10 + 3600, 7)] == 3
