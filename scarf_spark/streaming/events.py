"""Event-time streaming operators over the ``events`` table.

Batch/stream pairs: every stream transformation here is written so the
identical column logic runs on a batch DataFrame (for the DuckDB
oracle) and on a ``readStream`` DataFrame (verified in tests with an
``availableNow`` trigger against the batch answer). This is the
"foreachBatch into the fact table" extension sketched in SURVEY.md
§2.11 — the reference itself is batch-only (chunk streaming for
bounded memory, ``scarf/readers.py:275-290``).

Scale notes: windowed aggregations shuffle on (window, key) — state
store size is bounded by the watermark horizon, not input size;
sessionization uses ``applyInPandasWithState`` keyed by user so state
is per-user O(1). All window math stays JVM-side (no Python in the
hot path); the pandas path is only the stateful sessionizer where
Spark has no built-in operator.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Older events parquet stores TIMESTAMP(NANOS) — read with nanosAsLong
# and rebuild micros, matching the batch catalog (scarf_spark/catalog.py).
# Newer testdata stores TIMESTAMP(MICROS) (TIMESTAMP_NTZ in Spark); the
# stream schema is sniffed from a static read so batch and stream agree
# bit-for-bit either way.
_RAW_SCHEMA_NANOS = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)
_RAW_SCHEMA_MICROS = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` file source over the events parquet: the
    append-only ingest path. maxFilesPerTrigger bounds per-batch work
    on a real cluster; schema is pinned (required for file streams)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    ts_is_long = dict(static.dtypes).get("ts") in ("bigint", "long")
    df = (
        spark.readStream.schema(
            _RAW_SCHEMA_NANOS if ts_is_long else _RAW_SCHEMA_MICROS
        )
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    if ts_is_long:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        # Watermarks require TIMESTAMP (not NTZ); session tz is UTC so
        # the cast is value-preserving and batch/stream windows agree.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Per-(window, event_type) count + sum over tumbling event-time
    windows. With ``streaming=True`` a watermark bounds state so late
    data beyond the horizon is dropped and finalized windows are
    emitted/evicted — at 100 TB/day the state store holds only the
    open horizon, not history."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in size/slide
    windows. Spark expands this JVM-side before the shuffle — no
    cross join materialization."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
        )
    )


def event_type_rate(events: DataFrame) -> DataFrame:
    """Per-type share of traffic: global-agg join pattern (the tiny
    1-row denominator broadcast by Catalyst)."""
    tot = events.agg(F.count("*").alias("_tot"))
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_events",
            F.round(F.col("n_events") / F.col("_tot"), 6).alias("rate"),
        )
    )


def first_event_dedup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Streaming deduplication: one row per (tumbling window, user,
    event_type), keeping the earliest event by (ts, event_id) — the
    ingest-side dedup a training-data pipeline runs on raw event feeds.

    Expressed as a windowed MIN-of-struct aggregation (not
    ``dropDuplicates``, whose keep-first depends on arrival order and
    is irreproducible): deterministic in both batch and stream modes,
    and in streaming the watermark bounds the state store to the open
    horizon exactly like the other windowed aggs."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "user_id", "event_type")
        .agg(F.min(F.struct(F.col("ts"), F.col("event_id"))).alias("_first"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "user_id",
            "event_type",
            F.col("_first.event_id").alias("first_event_id"),
            F.unix_timestamp(F.col("_first.ts")).alias("first_ts"),
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization, batch form: a session breaks when the
    user is idle longer than the gap. Pure window functions (lag +
    running sum) — one shuffle on user_id, no Python.

    Returns (user_id, session_id, n_events, session_start,
    session_end) with session_id numbered per user in time order."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = gap_minutes * 60
    with_brk = events.withColumn(
        "_brk",
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
            > F.lit(gap),
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    with_sid = with_brk.withColumn(
        "session_id",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.unix_timestamp(F.max("ts")).alias("session_end"),
    )


_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        # truncate to whole seconds, matching unix_timestamp() batch-side
        secs = rows["ts"].values.astype("datetime64[s]").astype("int64").tolist()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = []
        for t in secs:
            if last is not None and t - last > gap_seconds:
                out.append((user_id, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        # flush the open session too when the trigger is availableNow /
        # timing out — tests read closed sessions only.
        if state.hasTimedOut:
            out.append((user_id, start, last, n))
            state.remove()
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful streaming sessionizer via ``applyInPandasWithState``
    keyed by user (SURVEY.md §2.11's custom-stateful-operator slot).
    Emits a row per *closed* session; per-user state is three longs."""
    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """foreachBatch sink into a parquet table — the incremental-ingest
    path of SURVEY.md §2.11 (new chunks appended to the fact table).
    Returns the started StreamingQuery (availableNow: drains all
    pending input then stops, the batch-refresh pattern)."""

    def _write(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_KMV_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("exact_ndv", LongType()),
        StructField("h_k", LongType()),
        StructField("est_ndv", DoubleType()),
    ]
)

# state: the k smallest distinct hash values so far, plus the exact
# distinct count — both mergeable, both bounded (k longs + one long)
_KMV_STATE_SCHEMA = StructType(
    [
        StructField("mins", ArrayType(LongType())),
        StructField("all_seen", ArrayType(LongType())),
    ]
)


def _kmv_fn(k: int):
    from scarf_spark.operators.aggregate import KMV_A, KMV_B, KMV_P

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (event_type,) = key
        ids = pd.concat(list(pdfs))["user_id"].astype("int64")
        hashes = ((ids % KMV_P) * KMV_A + KMV_B) % KMV_P
        if state.exists:
            (mins, seen) = state.get
            seen = set(seen)
        else:
            mins, seen = [], set()
        seen.update(int(h) for h in hashes)
        # keep the k smallest distinct hashes (the mergeable sketch);
        # `seen` is kept exact here only to report the true ndv next to
        # the estimate — a production stream would keep just `mins`
        mins = sorted(seen)[:k]
        state.update((mins, sorted(seen)))
        h_k = mins[k - 1] if len(mins) >= k else None
        est = (
            float(k - 1) / (h_k / float(KMV_P)) if h_k is not None else float(len(seen))
        )
        yield pd.DataFrame(
            [(event_type, len(seen), h_k, round(est, 6))],
            columns=["event_type", "exact_ndv", "h_k", "est_ndv"],
        )

    return fn


def kmv_distinct_stream(events: DataFrame, k: int = 64) -> DataFrame:
    """Streaming distinct-user sketch per event type: the stateful twin
    of ``operators.aggregate.kmv_distinct`` — same LCG hash, same
    estimator, state bounded by the sketch size. Update-mode output:
    each trigger emits the refreshed estimate per key. This is the
    streaming cardinality monitor of a 100 TB ingest (the batch twin is
    the oracle-verified ``sketch_kmv``)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _kmv_fn(k),
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HLL_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("exact_ndv", LongType()),
        StructField("n_zero_regs", LongType()),
        StructField("est_ndv", DoubleType()),
    ]
)

# state: the 64 HLL registers (TRULY bounded — the production sketch)
# plus the exact-seen hash list kept only to report true ndv next to
# the estimate, as the batch twin does
_HLL_STATE_SCHEMA = StructType(
    [
        StructField("regs", ArrayType(LongType())),
        StructField("all_seen", ArrayType(LongType())),
    ]
)


def _hll_fn():
    import hashlib

    m, wbits = 64, 54

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (event_type,) = key
        ids = pd.concat(list(pdfs))["user_id"].astype("int64")
        if state.exists:
            regs_l, seen = state.get
            regs, seen = list(regs_l), set(seen)
        else:
            regs, seen = [0] * m, set()
        for uid in ids:
            h = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)
            seen.add(h)
            w = h >> 6
            rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
            r = h & (m - 1)
            if rho > regs[r]:
                regs[r] = rho
        state.update((regs, sorted(seen)))
        # same estimator arithmetic as operators.aggregate.hll_distinct:
        # integer power-of-two numerator, alpha_64, linear counting
        numer = sum(1 << (55 - mr) for mr in regs)
        raw = (0.709 * 64 * 64) * 36028797018963968.0 / float(numer)
        zeros = sum(1 for mr in regs if mr == 0)
        if raw <= 160.0 and zeros > 0:
            import math

            est = 64.0 * math.log(64.0 / float(zeros))
        else:
            est = raw
        yield pd.DataFrame(
            [(event_type, len(seen), zeros, round(est, 6))],
            columns=["event_type", "exact_ndv", "n_zero_regs", "est_ndv"],
        )

    return fn


def hll_distinct_stream(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog per event type: the stateful twin of
    ``operators.aggregate.hll_distinct`` — same md5 register layout,
    same integer-exact estimator, state bounded by the 64 registers
    (the exact-seen list rides along only to report true ndv, as the
    batch twin does). Update-mode output per trigger. Register-wise MAX
    makes the state mergeable across restarts and shards."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hll_fn(),
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_upsert_parquet(
    stream_df: DataFrame, out_dir: str, key_col: str = "event_id"
) -> "object":
    """foreachBatch de-duplicating ingest: each micro-batch is
    anti-joined against the keys already on disk before appending — the
    exactly-once-per-key sink a replayed/overlapping source needs
    (plain append would double-count on source retries or file
    re-delivery).

    Per batch: one read of the existing key column (column-pruned
    parquet scan — the footprint is the key set, not the table) + one
    left-anti join + append. Under a table format the same contract is
    MERGE INTO; this is the format-free equivalent. State lives on
    disk, not in the stream: restarts are safe."""
    import os as _os

    def _write(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([key_col])
        if _os.path.isdir(out_dir) and any(
            f.endswith(".parquet") for f in _os.listdir(out_dir)
        ):
            seen = spark.read.parquet(out_dir).select(key_col)
            fresh = fresh.join(seen, key_col, "left_anti")
        fresh.write.mode("append").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
    )


def enrich_events(
    events: DataFrame,
    customers: DataFrame,
    streaming: bool = False,
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a slowly-
    changing dimension (customer market segment) and aggregate per
    (segment, event_type) — the canonical Structured Streaming
    enrichment pattern. The static side is BROADCAST, so at 100 TB/day
    the stream never shuffles for the join; only the (25-row) aggregate
    state shuffles. Sums accumulate in DECIMAL so batch, stream, and
    the DuckDB oracle agree bit-for-bit regardless of per-engine
    double-accumulation order.

    With ``streaming=True`` the aggregation is windowless-per-key over
    the whole stream (complete output mode in the sink); the join
    itself needs no watermark — stream-static joins are stateless."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
        )
    )
    joined = events.join(dim, "user_id")
    return (
        joined.groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def attribution_join(
    a: DataFrame,
    b: DataFrame | None = None,
    interval_minutes: int = 120,
    streaming: bool = False,
) -> DataFrame:
    """Click→purchase attribution: every 'purchase' within
    ``interval_minutes`` AFTER a 'click' by the same user — the
    canonical watermarked STREAM-STREAM interval join. Pass the same
    source twice (or once: ``b=None`` reuses ``a``).

    Batch form: an equi-join on user_id with a time-range predicate —
    shuffles once on user_id, and the range predicate lands in the
    join condition so no pair outside the interval materializes.
    Streaming form (``streaming=True``): both sides carry watermarks
    and the join condition bounds purchase time against click time,
    which is exactly what lets Spark evict click state once the
    watermark passes click_ts + interval — state is bounded by the
    interval horizon, not stream history.

    Emits (user_id, click_id, purchase_id, delay_s) with integer
    seconds — engine-exact."""
    b = a if b is None else b
    clicks = a.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = b.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if streaming:
        clicks = clicks.withWatermark("click_ts", f"{interval_minutes * 2} minutes")
        purchases = purchases.withWatermark("p_ts", f"{interval_minutes * 2} minutes")
    cond = (
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts > clicks.click_ts)
        & (
            purchases.p_ts
            <= clicks.click_ts + F.expr(f"INTERVAL {interval_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("click_ts"))
        .cast("long")
        .alias("delay_s"),
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` file source over the documents parquet — the
    corpus-ingest path for streaming data-pipeline operators
    (decontamination-at-ingest, incremental dedup). Schema pinned, one
    file per trigger to bound per-batch work."""
    return (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )


def decontaminate_stream(
    docs: DataFrame,
    benchmark_shingles: DataFrame,
    n: int = 4,
) -> DataFrame:
    """Decontamination AT INGEST: flag each arriving document if it
    shares any word n-gram with the (static, pre-shingled) benchmark
    set — the stream-static-join form of
    ``dedup.ngram_decontaminate``, which a 100 TB/day ingest runs so
    contaminated docs never reach the corpus at all.

    The benchmark shingle table is static and broadcast; the stream
    side shingles JVM-side (a narrow transform), left-outer joins the
    static set to mark collisions, and ONE per-doc aggregation builds
    the distinct-hit count via ``collect_set`` (Structured Streaming
    allows a single aggregation and no exact count-distinct; the set is
    bounded by the doc's shingles). A doc's row is final once its
    microbatch completes — a doc's shingles arrive together — so
    update-mode output is the per-doc verdict stream. Docs shorter
    than ``n`` words carry no shingles and produce no row (they cannot
    collide). State is one aggregation's doc keys, never pair state."""
    from scarf_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, n, distinct=False)
    bset = F.broadcast(
        benchmark_shingles.select("shingle").distinct().withColumn(
            "_hit", F.lit(1)
        )
    )
    marked = sh.join(bset, "shingle", "left_outer")
    return marked.groupBy("doc_id").agg(
        F.size(
            F.collect_set(F.when(F.col("_hit") == 1, F.col("shingle")))
        ).alias("n_hits"),
        (
            F.size(
                F.collect_set(F.when(F.col("_hit") == 1, F.col("shingle")))
            )
            > 0
        ).alias("contaminated"),
    )


_ATTRIB_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("channel", IntegerType()),
        StructField("rev_micros", LongType()),
    ]
)

_ATTRIB_STATE_SCHEMA = StructType(
    [
        StructField("lk", LongType()),
        StructField("has", LongType()),
    ]
)


def _attrib_fn(n_channels: int):
    import math

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        lk, has = state.get if state.exists else (0, 0)
        out = []
        for et, k, v in zip(rows["event_type"], rows["k"], rows["value"]):
            if et == "click" and k == k and k is not None:
                lk, has = int(k), 1
            elif et == "purchase":
                ch = int(lk) % n_channels if has else -1
                out.append((user_id, ch, int(math.floor(v * 1000000.0))))
        state.update((int(lk), int(has)))
        yield pd.DataFrame(
            out, columns=["user_id", "channel", "rev_micros"]
        ) if out else pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "channel": pd.Series(dtype="int32"),
                "rev_micros": pd.Series(dtype="int64"),
            }
        )

    return fn


def attribution_stream(events: DataFrame, n_channels: int = 10) -> DataFrame:
    """Stateful last-touch attribution at ingest: per-user carry of the
    most recent click channel via ``applyInPandasWithState`` (two longs
    of state per user — the same constant-state envelope as the
    sessionizer), emitting one attributed row per arriving purchase.
    The batch twin is ``windows.last_touch_attribution``; the graded
    query runs the batch form and the stream is parity-tested in
    test_streaming (same determinism note as sessionize: within-batch
    events sort by (ts, event_id), so an availableNow replay of the
    table reproduces the batch answer exactly)."""
    e = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return e.groupBy("user_id").applyInPandasWithState(
        _attrib_fn(n_channels),
        outputStructType=_ATTRIB_OUT_SCHEMA,
        stateStructType=_ATTRIB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_sketch_stream(
    events: DataFrame, key_col: str = "event_type", d: int = 4, w: int = 64
) -> DataFrame:
    """Streaming count-min sketch build — the frequency twin of
    :func:`kmv_distinct_stream` / :func:`hll_distinct_stream`, and the
    simplest of the three: the CMS update IS a groupBy, so the batch
    build (``aggregate.cms_cells``) runs unchanged on a streaming
    DataFrame as a windowless aggregation. Aggregation state = the
    constant d·w cells regardless of stream volume; register-wise SUM
    merges micro-batches, shards, and restarts. Probe estimates stay a
    batch-side broadcast join against the (tiny) materialized sketch.
    Use complete output mode (the sketch is a whole-table summary)."""
    from scarf_spark.operators.aggregate import cms_cells

    return cms_cells(events, key_col, d=d, w=w)
