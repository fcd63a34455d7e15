"""Window / ordered / ranking operators (SURVEY.md §2.6-2.7).

Reference semantics: centered rolling mean over a pseudotime ordering
(``scarf/utils.py:234-252`` numba kernel, used ``assay.py:647-660``),
equal-count pseudotime binning (``assay.py:643-665``), dense/average
ranks for marker scoring (``markers.py:138-139``), top-n selection by a
statistic (``assay.py:1049-1053``, ``assay.py:1193-1197``), per-group
result ordering (``markers.py:246-250``).

The reference's numba kernels become plain SQL window frames — the JVM
executes them inside whole-stage codegen, and partitioning by the group
key keeps each window local to one task (no driver involvement, scales
with the number of groups)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_mean(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    width: int = 5,
    out: str = "rolling_mean",
) -> DataFrame:
    """Centered rolling mean of `width` rows (``utils.py:234-252``):
    frame = width//2 rows either side, shrinking at the edges."""
    half = width // 2
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-half, half)
    )
    return df.withColumn(out, F.round(F.avg(value_col).over(w), 6))


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_bins: int,
    out: str = "bin",
    grid: int = 1 << 16,
    small_threshold: int = 1 << 20,
) -> DataFrame:
    """Distributed EXACT global ntile — same output as
    ``ntile(n_bins).over(Window.orderBy(...))`` without the
    single-partition window collapse.

    Plan: quantize the (numeric, non-null) primary order column onto a
    deterministic fixed grid between its min and max (one agg job),
    count rows per grid bucket (second tiny job, ≤ grid rows to the
    driver), broadcast the cumulative offsets back, and compute
    rank = bucket offset + row_number within the bucket. The ntile is
    then pure arithmetic on the 0-based rank with Spark's
    larger-buckets-first semantics.

    Every step is seedless — unlike repartitionByRange, whose sampled
    range boundaries change between the size job and the final job
    (the sampling seed derives from the RDD id), which would silently
    corrupt the offsets. Windows run per grid bucket, so skew is
    bounded by how many rows share ~1/grid of the key range.

    ``order_cols`` must end in a unique tiebreak column (callers pass
    the row id) so the total order, and therefore the binning, is
    deterministic.

    Adaptive (AQE-style): the first agg job returns the exact row count;
    below ``small_threshold`` rows the single-partition
    ``ntile().over(Window.orderBy(...))`` is strictly cheaper than the
    grid plan (no bucket-count collect, no broadcast join, one window
    over a set that fits comfortably in one task), so use it. The grid
    path is the ≥threshold branch that keeps the operator distributed
    at 100 TB."""
    cols = [F.col(c) for c in order_cols]
    # Timestamps can't cast to double directly; go through unix_micros
    # (session tz is UTC, so NTZ→TZ is monotonic and the grid order
    # matches the window order).
    first_dtype = dict(df.dtypes).get(order_cols[0], "")
    if first_dtype.startswith("timestamp"):
        key = F.unix_micros(F.col(order_cols[0]).cast("timestamp")).cast("double")
    else:
        key = F.col(order_cols[0]).cast("double")
    mm = df.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    n_total = mm["n"]
    if not n_total:
        return df.withColumn(out, F.lit(None).cast("int"))
    if n_total <= small_threshold:
        w = Window.orderBy(*cols)
        return df.withColumn(out, F.ntile(n_bins).over(w))
    lo, span = float(mm["lo"]), float(mm["hi"]) - float(mm["lo"]) or 1.0
    bucket = F.least(
        F.floor((key - F.lit(lo)) / F.lit(span) * grid), F.lit(grid - 1)
    ).cast("long")
    bdf = df.withColumn("_bkt", bucket)
    counts = sorted(
        (r["_bkt"], r["cnt"])
        for r in bdf.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect()
    )
    offs, acc = [], 0
    for b, cnt in counts:
        offs.append((b, acc))
        acc += cnt
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offs, "_bkt long, _off long")
    )
    w = Window.partitionBy("_bkt").orderBy(*cols)
    rn0 = F.row_number().over(w) + F.col("_off") - F.lit(1)  # 0-based global rank
    # ntile semantics: first (N % b) buckets hold ceil(N/b) rows
    q, r = divmod(n_total, n_bins)
    if q == 0:
        bin_expr = rn0 + F.lit(1)  # fewer rows than bins: one row per bin
    else:
        cut = (q + 1) * r
        bin_expr = F.when(
            rn0 < cut, F.floor(rn0 / (q + 1)) + 1
        ).otherwise(F.lit(r) + F.floor((rn0 - cut) / q) + 1)
    return bdf.join(off_df, "_bkt").withColumn(out, bin_expr.cast("int")).drop(
        "_bkt", "_off"
    )


def ntile_bin_agg(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pseudotime binning (``assay.py:643-665``): order rows globally,
    split into n_bins equal-count bins, aggregate per bin. Binning runs
    through :func:`global_ntile` (distributed, no single-partition
    window)."""
    binned = global_ntile(df, order_cols, n_bins)
    keys = (group_cols or []) + ["bin"]
    return binned.groupBy(*keys).agg(
        F.round(F.avg(value_col), 6).alias("mean_value"),
        F.count("*").alias("n"),
    )


def dense_rank_per_group(
    df: DataFrame, part_col: str, value_col: str, out: str = "dense_rank"
) -> DataFrame:
    """rank(method='dense') per feature (``markers.py:138``)."""
    w = Window.partitionBy(part_col).orderBy(value_col)
    return df.withColumn(out, F.dense_rank().over(w))


def avg_rank_per_group(
    df: DataFrame, part_col: str, value_col: str, out: str = "avg_rank"
) -> DataFrame:
    """rank(method='average') — tie-averaged ranks as used by the
    Mann-Whitney U kernel (``markers.py:139``):
    avg_rank = rank + (n_ties - 1)/2, all window expressions."""
    w = Window.partitionBy(part_col).orderBy(value_col)
    wt = Window.partitionBy(part_col, value_col)
    return df.withColumn(
        out,
        F.round(F.rank().over(w) + (F.count("*").over(wt) - F.lit(1)) / F.lit(2.0), 6),
    )


def top_n_by_stat(
    df: DataFrame, stat_col: str, n: int, tiebreak_col: str, desc: bool = True
) -> DataFrame:
    """Top-n selection (``assay.py:1049-1053``): n-th largest statistic
    defines the cut; deterministic tie-break column keeps the oracle
    stable.

    Executed as sort + limit, which Spark plans as TakeOrderedAndProject
    (per-partition top-n, merged once) — distributed, unlike a global
    row_number window."""
    order = [F.col(stat_col).desc() if desc else F.col(stat_col).asc(), F.col(tiebreak_col)]
    return df.orderBy(*order).limit(n)


def top_k_per_group(
    df: DataFrame, part_cols: list[str], stat_col: str, k: int, tiebreak_col: str
) -> DataFrame:
    """Per-group top-k (``markers.py:246-250`` result ordering): the
    canonical Window.partitionBy + row_number ≤ k plan — one shuffle on
    the group key, no global sort."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(stat_col).desc(), F.col(tiebreak_col))
    return df.withColumn("rank_in_group", F.row_number().over(w)).where(
        F.col("rank_in_group") <= k
    )


def event_gaps(events: DataFrame, ts_col: str = "ts", user_col: str = "user_id") -> DataFrame:
    """Per-user inter-event gap statistics via LAG — the lead/lag
    ordered-window surface (sessionization's batch sibling). Gaps are
    computed on exact integer microseconds (``unix_micros``), so sum
    and max are engine-exact; only the final seconds conversion is
    float, with a pinned op order.

    One shuffle keyed by user; the window sort is per-user (bounded by
    the most active user — salt by day for pathological hot users)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us, F.col("event_id"))
    g = events.select(
        F.col(user_col),
        (us - F.lag(us).over(w)).alias("_gap_us"),
    )
    return g.groupBy(user_col).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("_gap_us").cast("double") / F.lit(1000000.0), 6).alias("sum_gap_s"),
        F.round(F.max("_gap_us").cast("double") / F.lit(1000000.0), 6).alias("max_gap_s"),
    )


def rank_distribution(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """percent_rank + cume_dist per group — the relative-standing
    surface next to rank/dense_rank (the reference expresses marker
    ranks as fractional positions, ``scarf/markers.py`` rank
    normalization). Ties broken on id for cross-engine determinism; one
    shuffle keyed by the group."""
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    return df.select(
        F.col(group_col),
        F.col(id_col),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def range_frame_agg(
    events: DataFrame,
    window_seconds: int = 3600,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Value-RANGE window frame: for each event, the count and sum of
    the same user's events in the trailing ``window_seconds`` — the
    "activity in the last hour" frame that ROWS windows cannot express
    (a ROWS frame counts rows, not elapsed time). Frame bounds are on
    exact integer epoch seconds, so the frame membership is
    engine-exact; one shuffle keyed by user."""
    secs = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1_000_000)
    w = (
        Window.partitionBy(user_col)
        .orderBy(secs.cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    return events.select(
        F.col("event_id"),
        F.col(user_col),
        F.count("*").over(w).alias("n_in_window"),
        F.round(F.sum("value").over(w), 6).alias("sum_in_window"),
    )


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many users reached stage k — where
    stage k counts only if it happened strictly AFTER the user's stage
    k-1 (the sequence constraint that separates a funnel from plain
    per-type counts). Returns (stage, stage_name, n_users).

    One cascaded min-timestamp aggregate per stage, each keyed by user
    (dimension-sized intermediates); the event table is scanned once
    per stage with a pushed-down type filter — no window over the full
    stream, no per-user sequence assembly. All stages are counted in a
    SINGLE job (union of tagged per-stage user sets → one tiny agg), so
    the scheduler overhead is one action regardless of funnel depth."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(F.col(user_col).alias("u"), F.col(type_col).alias("t"), us.alias("s"))
    spark = events.sparkSession
    reached = None
    tagged = []
    for i, st in enumerate(stages):
        step = ev.where(F.col("t") == st)
        if reached is None:
            cur = step.groupBy("u").agg(F.min("s").alias("ts_i"))
        else:
            cur = (
                step.join(reached, "u")
                .where(F.col("s") > F.col("ts_i"))
                .groupBy("u")
                .agg(F.min("s").alias("ts_next"))
                .withColumnRenamed("ts_next", "ts_i")
            )
        reached = cur
        tagged.append(
            cur.select(
                F.lit(i + 1).alias("stage"), F.lit(st).alias("stage_name"), "u"
            )
        )
    allst = tagged[0]
    for t in tagged[1:]:
        allst = allst.unionByName(t)
    counted = allst.groupBy("stage", "stage_name").agg(
        F.count("*").alias("n_users")
    )
    # stages nobody reached still get a row (count 0), preserving the
    # fixed funnel-depth output contract
    names = spark.createDataFrame(
        [(i + 1, st) for i, st in enumerate(stages)], "stage int, stage_name string"
    )
    return (
        names.join(counted, ["stage", "stage_name"], "left_outer")
        .select(
            "stage",
            "stage_name",
            F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias("n_users"),
        )
    )


def ewma_final(
    events: DataFrame,
    alpha: float = 0.1,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Final exponentially-weighted moving average of each user's value
    series: y_0 = x_0, y_t = α·x_t + (1−α)·y_{t−1} — the recursive
    smoothing that SQL window frames cannot express (every output
    depends on the full prefix with geometrically decaying weights; a
    closed-form rewrite via r^{-i} cumulative sums overflows for long
    series).

    Expressed as a relational FOLD: sort-collect each user's series
    into an array (one shuffle keyed by user, state bounded by the
    longest single-user series — the same envelope as sessionization),
    then ``aggregate()`` folds it left-to-right JVM-side. The fold body
    ``α·x + (1−α)·acc`` is the exact IEEE op sequence DuckDB's
    ``list_reduce`` replays, so the result is engine-exact before the
    final round."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    arr = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    us.alias("s"), F.col(id_col).alias("i"), F.col(value_col).alias("v")
                )
            )
        ).alias("xs")
    )
    fold = F.aggregate(
        F.slice(F.col("xs"), F.lit(2), F.greatest(F.size("xs") - 1, F.lit(0))),
        F.element_at("xs", 1)["v"].cast("double"),
        lambda acc, x: F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * acc,
    )
    return arr.select(
        F.col(user_col),
        F.size("xs").alias("n_events"),
        F.round(fold, 6).alias("ewma"),
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity period
    (cohort), counted per (cohort, periods-since-cohort) — the
    engagement curve every event product tracks. Integer epoch-second
    bucketing keeps every cell engine-exact.

    Two aggregates: first-activity per user (one row PER USER — an
    unbounded dimension, so the cohort join carries no broadcast hint;
    AQE broadcasts it when small), then a distinct count per
    (cohort, offset)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    period = F.floor(us / F.lit(bucket_seconds * 1_000_000)).cast("long")
    ev = events.select(F.col(user_col).alias("u"), period.alias("p"))
    cohort = ev.groupBy("u").agg(F.min("p").alias("p0"))
    return (
        ev.join(cohort, "u")
        .groupBy(F.col("p0").alias("cohort"), (F.col("p") - F.col("p0")).alias("offset"))
        .agg(F.count_distinct("u").alias("n_users"))
    )


def ohlc_bars(
    events: DataFrame,
    bucket_seconds: int = 86400,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per (user, time-bucket) OHLC bars: the first (open), max (high),
    min (low) and last (close) value of each bucket — the downsampled
    summary every time-series store exposes. First/last are defined by
    the total order (ts, id), so the result is deterministic under
    ties.

    One shuffle keyed by (user, bucket): the two row_number windows and
    the final aggregate all share that partitioning, so Spark reuses
    the exchange; per-task state is one window buffer per (user,
    bucket)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = F.floor(us / F.lit(bucket_seconds * 1_000_000)).cast("long")
    base = events.select(
        F.col(user_col), bucket.alias("bucket"), us.alias("_us"),
        F.col(id_col).alias("_id"), F.col(value_col).alias("v"),
    )
    wa = Window.partitionBy(user_col, "bucket").orderBy("_us", "_id")
    wd = Window.partitionBy(user_col, "bucket").orderBy(
        F.col("_us").desc(), F.col("_id").desc()
    )
    marked = base.select(
        user_col, "bucket", "v",
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wd).alias("_rd"),
    )
    return marked.groupBy(user_col, "bucket").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("v"))).alias("close"),
        F.count("*").alias("n_events"),
    )


def event_transitions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of event types: per
    (prev_type, next_type) the transition count and row-normalized
    probability, with consecutive pairs taken within each user's
    (ts, id)-ordered stream — the behavioural model behind next-event
    prediction and funnel leak analysis.

    One shuffle keyed by user for the LAG window (per-user sort, the
    sessionization envelope), then a transition-matrix-sized aggregate;
    the probability normalizer is a window over the tiny matrix."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us, F.col(id_col))
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    mat = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wr = Window.partitionBy("prev_type")
    return mat.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wr), 6).alias("prob"),
    )


def daily_anomaly(
    events: DataFrame,
    bucket_seconds: int = 86400,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-volume anomaly score: per (type, day) the event count and
    its z-score against that type's own daily distribution — the
    monitoring query that flags traffic spikes and outages. Counts are
    exact integers; mean/stddev are per-type window aggregates over the
    (types × days)-sized table, so after the one count shuffle nothing
    row-scale moves."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    day = F.floor(us / F.lit(bucket_seconds * 1_000_000)).cast("long")
    daily = events.groupBy(F.col(type_col), day.alias("bucket")).agg(
        F.count("*").alias("n")
    )
    wt = Window.partitionBy(type_col)
    mu = F.avg("n").over(wt)
    sd = F.stddev("n").over(wt)
    return daily.select(
        type_col,
        "bucket",
        "n",
        F.round(
            F.when(sd > 0, (F.col("n") - mu) / sd).otherwise(F.lit(0.0)), 6
        ).alias("z"),
    )


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
) -> "DataFrame":
    """Z-order (Morton) clustering key over two numeric columns — the
    multi-dimensional sort key behind file-skipping layouts (Delta/
    Iceberg OPTIMIZE ZORDER): rows close in BOTH dimensions land close
    in the one-dimensional order, so min/max footer pruning works for
    predicates on either column after a range-write on the key.

    Each column is quantized to ``bits`` levels over its [min, max]
    (one tiny agg broadcast back — same shape as qc.psi_drift's bins),
    then bit-interleaved with the 4-step magic-number spread (O(log
    bits) integer ops that stay inside codegen, instead of a 2·bits-
    term unrolled expression that would fall out of it). Pure
    projection + one broadcast: the key derivation adds no shuffle;
    the write that uses it pays the one range-partition sort any
    clustered layout costs. Deterministic integer math end-to-end —
    the oracle replays it bit-for-bit."""
    ext = df.agg(
        F.min(F.col(col_a).cast("double")).alias("_alo"),
        F.max(F.col(col_a).cast("double")).alias("_ahi"),
        F.min(F.col(col_b).cast("double")).alias("_blo"),
        F.max(F.col(col_b).cast("double")).alias("_bhi"),
    )
    top = (1 << bits) - 1

    def quant(c: str, lo: str, hi: str):
        return F.when(
            F.col(hi) > F.col(lo),
            F.least(
                F.floor(
                    (F.col(c).cast("double") - F.col(lo))
                    / (F.col(hi) - F.col(lo))
                    * F.lit(1 << bits)
                ),
                F.lit(top),
            ),
        ).otherwise(F.lit(0)).cast("long")

    def spread(col):  # 16-bit -> even bit positions of 32
        x = col.bitwiseAND(F.lit(0x0000FFFF))
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
        return (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))

    out = df.crossJoin(F.broadcast(ext)).select(
        *df.columns,
        quant(col_a, "_alo", "_ahi").alias("qa"),
        quant(col_b, "_blo", "_bhi").alias("qb"),
    )
    return out.select(
        *df.columns,
        "qa",
        "qb",
        F.shiftleft(spread(F.col("qa")), 1)
        .bitwiseOR(spread(F.col("qb")))
        .alias("zval"),
    )


def kaplan_meier(
    events: DataFrame,
    start_type: str = "signup",
    end_type: str = "purchase",
    horizon_minutes: int = 10080,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-event analysis (the
    product-limit estimator): duration = minutes from a user's first
    ``start_type`` to their first subsequent ``end_type``, censored at
    ``horizon_minutes`` — churn/conversion analysis with the censoring
    handled correctly instead of dropped.

    Relational shape: two per-user MIN aggregates (dimension-sized) →
    one per-distinct-time aggregate (d_t events, c_t censored) → one
    ORDERED window pass building the at-risk count (total − prior
    exits) and the running Σln(1−d/n) whose exp is S(t). The ordered
    running sum accumulates left-to-right identically on every engine,
    so the curve replays exactly under ROUND(6). Integer minutes keep
    every d/n exact. Returns (t_min, n_at_risk, n_events, survival)
    — one row per distinct event time."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), us.alias("s")
    )
    starts = e.where(F.col("t") == start_type).groupBy("u").agg(
        F.min("s").alias("t0")
    )
    ends = (
        e.where(F.col("t") == end_type)
        .join(starts, "u")
        .where(F.col("s") > F.col("t0"))
        .groupBy("u")
        .agg(F.min(F.col("s")).alias("tp"), F.min("t0").alias("_t0"))
        # integer div, not double-divide-then-cast: a double quotient
        # 1 ulp above an integer boundary would truncate differently
        # than the oracle's exact // floor
        .select("u", F.expr("(tp - _t0) div 60000000").alias("d"))
    )
    dur = starts.join(ends, "u", "left_outer").select(
        "u",
        F.least(F.coalesce("d", F.lit(horizon_minutes)), F.lit(horizon_minutes)).alias("obs"),
        (F.col("d").isNotNull() & (F.col("d") <= horizon_minutes)).alias("evt"),
    )
    per_t = dur.groupBy(F.col("obs").alias("t_min")).agg(
        F.sum(F.col("evt").cast("bigint")).alias("n_events"),
        F.sum((~F.col("evt")).cast("bigint")).alias("n_censored"),
    )
    total = dur.agg(F.count("*").alias("_n"))
    w = Window.orderBy("t_min").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("t_min").rowsBetween(Window.unboundedPreceding, 0)
    risked = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            F.col("_n")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w), F.lit(0)
            ),
        )
        .withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            F.greatest(
                                F.lit(1.0)
                                - F.col("n_events") / F.col("n_at_risk"),
                                F.lit(1e-12),
                            )
                        )
                    ).over(wall)
                ),
                6,
            ),
        )
    )
    return risked.where(F.col("n_events") > 0).select(
        "t_min", "n_at_risk", "n_events", "survival"
    )


def _grouped_rank0(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    grid: int = 1 << 12,
) -> DataFrame:
    """Shared core of :func:`grouped_rank` / :func:`grouped_ntile`:
    adds ``_r`` (0-based exact per-group rank by ``order_cols``) and
    ``_n`` (group size) via the distributed fixed-grid plan described
    on :func:`grouped_ntile` — no single-group sort task, no driver
    collect."""
    first_dtype = dict(df.dtypes).get(order_cols[0], "")
    if first_dtype.startswith("timestamp"):
        key = F.unix_micros(F.col(order_cols[0]).cast("timestamp")).cast("double")
    else:
        key = F.col(order_cols[0]).cast("double")
    # NULL / NaN grid keys get dedicated sentinel cells so the
    # equi-join on _cell never drops them and the rank matches the
    # window row_number() it claims bit-equivalence to: Spark's
    # ascending order is nulls-FIRST (cell -1) and NaN-LAST (cell
    # `grid`). min/max see only finite keys so one NaN can't poison
    # the whole group's span.
    finite_key = F.when(key.isNull() | F.isnan(key), F.lit(None)).otherwise(key)
    stats = df.groupBy(*part_cols).agg(
        F.min(finite_key).alias("_lo"),
        F.max(finite_key).alias("_hi"),
        F.count("*").alias("_n"),
    )
    with_stats = df.join(stats, part_cols)
    span = F.when(F.col("_hi") > F.col("_lo"), F.col("_hi") - F.col("_lo")).otherwise(
        F.lit(1.0)
    )
    cell = (
        F.when(key.isNull(), F.lit(-1))
        .when(F.isnan(key), F.lit(grid))
        .otherwise(
            F.least(F.floor((key - F.col("_lo")) / span * grid), F.lit(grid - 1))
        )
        .cast("long")
    )
    binned = with_stats.withColumn("_cell", cell)
    counts = binned.groupBy(*part_cols, "_cell").agg(F.count("*").alias("_c"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0))
    ).drop("_c")
    w_rn = Window.partitionBy(*part_cols, "_cell").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        binned.join(offsets, [*part_cols, "_cell"])
        .withColumn("_r", F.col("_off") + F.row_number().over(w_rn) - 1)
        .drop("_lo", "_hi", "_cell", "_off")
    )


def grouped_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    out: str = "rank",
    grid: int = 1 << 12,
) -> DataFrame:
    """Distributed EXACT per-group ROW_NUMBER — same output as
    ``row_number().over(Window.partitionBy(*part_cols)
    .orderBy(*order_cols))`` via the fixed-grid rank-arithmetic plan
    (see :func:`grouped_ntile`), so one giant group never collapses
    into a single sort task."""
    return (
        _grouped_rank0(df, part_cols, order_cols, grid)
        .withColumn(out, (F.col("_r") + 1).cast("long"))
        .drop("_r", "_n")
    )


def grouped_ntile(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    n_bins: int,
    out: str = "bin",
    grid: int = 1 << 12,
) -> DataFrame:
    """Distributed EXACT per-group ntile — same output as
    ``ntile(n_bins).over(Window.partitionBy(*part_cols)
    .orderBy(*order_cols))`` without collapsing each group into one
    task.

    :func:`global_ntile` solves the single-ordering case with a
    driver-collected bucket histogram; this is the grouped
    generalization and it never touches the driver: per-group min/max/
    count come from one aggregate joined back (Catalyst broadcasts it
    when small), rows land on a deterministic fixed grid, per-(group,
    grid-cell) counts turn into cumulative offsets via a window over
    the COUNTS table (≤ ``grid`` rows per group — always tiny), and
    the final rank is offset + row_number within a (group, cell)
    window whose task size is ~|group|/grid. The ntile is then pure
    arithmetic with Spark's larger-buckets-first semantics.

    ``order_cols`` must end in a unique tiebreak so the total order is
    deterministic; ``order_cols[0]`` must be numeric or timestamp (it
    is the grid key — ties on it stay in one cell, so exactness never
    depends on the grid resolution)."""
    ranked = _grouped_rank0(df, part_cols, order_cols, grid)
    # Spark ntile: first (n % k) buckets get (n/k + 1) rows. With
    # 0-based rank r: r < rem*(q+1) -> bucket 1 + r/(q+1), else
    # 1 + rem + (r - rem*(q+1))/q. q = 0 only when n < k, and then the
    # first branch always holds (rem = n > r) — the GREATEST guard
    # keeps the unevaluated divisor ANSI-safe.
    q = F.col("_n").cast("long") / F.lit(n_bins)
    qi = F.floor(q).cast("long")
    rem = F.col("_n") - qi * n_bins
    thresh = rem * (qi + 1)
    tile = F.when(
        F.col("_r") < thresh, F.lit(1) + F.floor(F.col("_r") / (qi + 1))
    ).otherwise(
        F.lit(1)
        + rem
        + F.floor((F.col("_r") - thresh) / F.greatest(qi, F.lit(1)))
    )
    return ranked.withColumn(out, tile.cast("int")).drop(
        "_lo", "_hi", "_n", "_cell", "_off", "_r"
    )


def rfm_segments(events: DataFrame, n_bins: int = 5) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic event-log marketing rollup, distributed-exact.

    Recency = whole days between the user's last event and the corpus
    maximum (one broadcast scalar); frequency = event count; monetary
    accumulates each value quantized to integer micros (FLOOR(value *
    1e6) — double SUM accumulation order can drift between engines,
    integer sums cannot). Each dimension is scored into ``n_bins``
    exact quintiles by :func:`global_ntile` (user_id tiebreak), and
    the combined code is r*100 + f*10 + m. All shuffles key on
    user_id; the three ntile passes are rank arithmetic, not global
    sorts."""
    per_user = events.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("_tmax"),
        F.count("*").alias("frequency"),
        F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).alias(
            "monetary_micros"
        ),
    )
    gmax = per_user.agg(F.max("_tmax").alias("_g"))
    base = (
        per_user.crossJoin(F.broadcast(gmax))
        .withColumn("recency_days", F.expr("(_g - _tmax) DIV 86400000000"))
        .drop("_tmax", "_g")
    )
    scored = global_ntile(base, ["recency_days", "user_id"], n_bins, out="r_score")
    scored = global_ntile(scored, ["frequency", "user_id"], n_bins, out="f_score")
    scored = global_ntile(
        scored, ["monetary_micros", "user_id"], n_bins, out="m_score"
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micros",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm_code"),
    )


def last_touch_attribution(events: DataFrame, n_channels: int = 10) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the channel (``props.k mod n_channels``) of the user's most recent
    PRECEDING click — the standard event-log attribution rollup.

    The carry-forward is one ``last(..., ignorenulls=True)`` running
    window per user (ordered by (ts, event_id) so the total order is
    deterministic); revenue accumulates integer micros (double SUMs
    drift across engines, integer sums cannot). Purchases with no
    prior click land in channel −1. Windows partition by user_id —
    per-user event counts are bounded, so no single-task collapse.
    The channel is ``pmod(k, n_channels)`` — always non-negative, like
    the stream twin's Python ``%`` — so −1 unambiguously means
    no-prior-click even for negative ``props.k``."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    e = events.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("_ts"),
        "event_id",
        "event_type",
        "value",
        k.alias("_k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = e.withColumn(
        "_lk",
        F.last(
            F.when(F.col("event_type") == "click", F.col("_k")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.where(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.pmod(F.col("_lk"), F.lit(n_channels)), F.lit(-1)
            ).alias("channel"),
            F.floor(F.col("value") * 1000000.0).cast("long").alias("_rev"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("_rev").alias("revenue_micros"),
        )
    )


def active_user_bands(events: DataFrame) -> DataFrame:
    """DAU / WAU / MAU per day — the canonical product-analytics
    rollup, EXACT at any scale without a distinct-over-window.

    A trailing COUNT(DISTINCT) window would re-sort the event log per
    day; instead each distinct (user, active-day) row is expanded to
    the ≤30 future days whose trailing window it falls into (day + 0…6
    for WAU, + 0…29 for MAU) and semi-joined against the observed-day
    list — turning the range join into an equi-join whose volume is a
    CONSTANT 30× the deduped user-day table (not the event log). All
    shuffles key on (day, user); integer day arithmetic is engine-
    portable."""
    act = (
        events.select(
            F.col("user_id"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").alias(
                "day"
            ),
        )
        .distinct()
        # eager localCheckpoint (not persist): act is referenced four
        # times below, and checkpointing both reuses the dedup and
        # avoids leaking executor storage across calls in a long-lived
        # session (persist here had no paired unpersist).
        .localCheckpoint(eager=True)
    )
    days = act.select("day").distinct()
    dau = act.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))

    def band(n_days: int, out: str) -> DataFrame:
        exp = act.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (n_days - 1))
            ).alias("day"),
        )
        return (
            exp.join(days, "day", "left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(out))
        )

    out = (
        dau.join(band(7, "wau"), "day")
        .join(band(30, "mau"), "day")
        .select("day", "dau", "wau", "mau")
    )
    return out


def session_conversion(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Conversion rate by session depth: sessions are the same
    30-minute-gap islands the sessionizer builds (lag + cumulative-sum
    windows per user — partitioned, task-local), a session converts if
    it contains a purchase, and the report groups by session length —
    the does-engagement-convert product read. Exact integer ppm."""
    e = events.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000").alias("_t"),
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("_buy"),
    )
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    brk = F.when(
        F.col("_t") - F.lag("_t").over(w) > gap_seconds, 1
    ).otherwise(0)
    wc = (
        Window.partitionBy("user_id")
        .orderBy("_t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = e.withColumn("_sid", F.sum(brk).over(wc))
    per = sess.groupBy("user_id", "_sid").agg(
        F.count("*").alias("session_len"),
        F.max("_buy").alias("_conv"),
    )
    return per.groupBy("session_len").agg(
        F.count("*").alias("n_sessions"),
        F.sum("_conv").cast("long").alias("n_converted"),
    ).select(
        "session_len",
        "n_sessions",
        "n_converted",
        F.expr("n_converted * 1000000 DIV n_sessions").alias("conv_ppm"),
    )


def rolling_median(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    width: int = 5,
    out: str = "rolling_median",
) -> DataFrame:
    """Exact trailing-window median (lower median of the last ``width``
    rows) — the robust twin of :func:`rolling_mean` for spiky series.
    The window's value multiset is materialized as a sorted array and
    the middle element picked by integer arithmetic — no percentile
    UDAF, no interpolation (element selection is bit-exact on any
    engine), shrinking windows at the partition head use their actual
    size. Window state is ``width`` values per row — constant."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(width - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))
    mid = F.floor((F.size(arr) + 1) / 2).cast("int")
    return df.withColumn(out, F.element_at(arr, mid))


def stage_latency(
    events: DataFrame, stages: list[str] | None = None
) -> DataFrame:
    """Funnel stage-transition latency: for each adjacent stage pair
    (signup→click→purchase by default), the per-user seconds between
    the FIRST qualifying events (strictly ordered, the same cascade as
    the funnel counts) summarized as exact p50/p90 over integer
    seconds. Per-pair state is one duration per converting user; the
    percentile is Spark's exact distributed aggregate over that
    user-sized set (the same envelope as exact_quantiles — switch to
    histogram quantiles if a single pair ever outgrows an executor)."""
    stages = stages or ["signup", "click", "purchase"]
    e = events.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000").alias("_t"),
        "event_type",
    )
    firsts = (
        e.where(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("_t").alias("_t0"))
    )
    out = None
    prev = firsts
    for i, nxt in enumerate(stages[1:], start=1):
        step = (
            e.where(F.col("event_type") == nxt)
            .join(prev, "user_id")
            .where(F.col("_t") > F.col("_t0"))
            .groupBy("user_id")
            .agg(F.min("_t").alias("_t1"), F.min("_t0").alias("_t0b"))
        )
        lat = step.select(
            "user_id", (F.col("_t1") - F.col("_t0b")).alias("_lat")
        )
        row = lat.agg(
            F.lit(f"{stages[i - 1]}->{nxt}").alias("transition"),
            F.count("*").alias("n_users"),
            F.round(F.expr("percentile(_lat, 0.5)"), 6).alias("p50_sec"),
            F.round(F.expr("percentile(_lat, 0.9)"), 6).alias("p90_sec"),
        )
        out = row if out is None else out.unionAll(row)
        prev = step.select("user_id", F.col("_t1").alias("_t0"))
    return out


def cusum_final(
    events: DataFrame,
    ref: float = 50.0,
    threshold: float = 200.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One-sided CUSUM change detection per user (Page 1954): S_0 = 0,
    S_t = max(0, S_{t−1} + x_t − ref) — the sequential drift detector
    EWMA pairs with. Like :func:`ewma_final`, the recursion is a
    relational fold over the sort-collected series (GREATEST + add is
    the exact IEEE op sequence DuckDB's ``list_reduce`` replays), so
    the final statistic and the alarm flag are engine-exact. State per
    user = its own series — the sessionization envelope."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    arr = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    us.alias("s"),
                    F.col(id_col).alias("i"),
                    F.col(value_col).alias("v"),
                )
            )
        ).alias("xs")
    )
    fold = F.aggregate(
        F.col("xs"),
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x["v"] - F.lit(ref)),
    )
    return arr.select(
        user_col,
        F.size("xs").alias("n_events"),
        F.round(fold, 6).alias("cusum"),
        (fold > threshold).alias("drifted"),
    )


def cohort_ltv(events: DataFrame) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by signup week
    (first-event week), revenue accumulated per week offset — the
    retention matrix's revenue twin. Revenue is integer micros (exact
    sums), the cumulative curve is a window over the tiny
    (cohort × offset) aggregate, and the whole plan is two hash
    aggregates + one broadcast-scale window."""
    e = events.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 604800000000").alias(
            "_wk"
        ),
        F.floor(F.col("value") * 1000000.0).cast("long").alias("_rev"),
    )
    cohort = e.groupBy("user_id").agg(F.min("_wk").alias("_c"))
    j = e.join(cohort, "user_id").select(
        F.col("_c").alias("cohort_week"),
        (F.col("_wk") - F.col("_c")).alias("week_offset"),
        "_rev",
        "user_id",
    )
    per = j.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum("_rev").alias("revenue_micros"),
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "cohort_week",
        "week_offset",
        "n_users",
        "revenue_micros",
        F.sum("revenue_micros").over(w).cast("long").alias("cum_revenue_micros"),
    )


def seasonality_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day × day-of-week activity profile — the load/seasonality
    heatmap behind capacity planning and anomaly baselines. Both time
    fields come from INTEGER epoch arithmetic (hour = epoch-hours mod
    24, dow = (epoch-days + 4) mod 7 with Monday = 0 — engine date
    functions disagree on week conventions, integer math cannot);
    revenue in exact micros. One map-side projection + one 168-group
    hash aggregate."""
    e = events.select(
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"
        ).alias("hour"),
        F.expr(
            # epoch day 0 = Thursday; +3 makes Monday 0. Integer DIV —
            # a double division + cast can round across the boundary.
            "((unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000) + 3) % 7"
        ).alias("dow"),
        F.floor(F.col("value") * 1000000.0).cast("long").alias("_rev"),
    )
    return e.groupBy("dow", "hour").agg(
        F.count("*").alias("n_events"),
        F.sum("_rev").alias("revenue_micros"),
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands classic on integer epoch days: within a user,
    day − row_number(day) is constant exactly along a run of
    consecutive days, so one per-user window + one hash aggregate
    yields every streak; report the longest and the active-day count.
    All integer arithmetic; per-user windows are task-local."""
    act = events.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").alias(
            "day"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = act.withColumn("_grp", F.col("day") - F.row_number().over(w))
    streaks = runs.groupBy("user_id", "_grp").agg(
        F.count("*").alias("_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("_len").cast("long").alias("n_active_days"),
        F.max("_len").cast("long").alias("longest_streak"),
    )


def grouped_weighted_median(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    weight_col: str,
    grid: int = 1 << 12,
    p_num: int = 1,
    p_den: int = 2,
) -> DataFrame:
    """Distributed EXACT weighted (lower) p-quantile per group
    (median by default): the smallest value v with
    p_den·Σ{w : value ≤ v} ≥ p_num·W — defined on values, so no row
    tiebreak is needed and the result is engine-portable by
    construction (the output IS an input value, never arithmetic).
    ``p_num/p_den`` is the quantile as an exact INTEGER fraction
    (9/10 = p90) — a float p would put the threshold on a rounding
    knife-edge.

    Plan (the :func:`grouped_ntile` fixed-grid generalization, with
    weights): per-group min/max/total-weight from one aggregate;
    values land on a deterministic grid (monotone in value, so any
    binning partitions the sorted order correctly); per-(group, cell)
    weight sums turn into cumulative offsets via a window over the
    ≤``grid``-row counts table; the threshold-crossing CELL is found
    by pure arithmetic; and only THAT cell's rows (≈|group|/grid) see
    a within-cell cumulative window. Weights must be non-negative
    integers (cast to long; fractional weights are the caller's
    quantization problem — float weight sums drift across engines);
    NULL values are excluded with the standard aggregate convention.
    Returns (part_cols…, w_total, wmedian)."""
    d = df.where(F.col(value_col).isNotNull()).select(
        *part_cols,
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("long").alias("_wt"),
    )
    key = F.col("_v").cast("double")
    stats = d.groupBy(*part_cols).agg(
        F.min(key).alias("_lo"),
        F.max(key).alias("_hi"),
        F.sum("_wt").alias("_W"),
    )
    j = d.join(stats, part_cols)
    span = F.when(F.col("_hi") > F.col("_lo"), F.col("_hi") - F.col("_lo")).otherwise(
        F.lit(1.0)
    )
    cell = F.least(
        F.floor((key - F.col("_lo")) / span * grid), F.lit(grid - 1)
    ).cast("long")
    binned = j.withColumn("_cell", cell)
    cellw = binned.groupBy(*part_cols, "_cell").agg(
        F.sum("_wt").alias("_cw"), F.max("_W").alias("_W")
    )
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cellw.withColumn(
        "_off", F.coalesce(F.sum("_cw").over(w_off), F.lit(0))
    )
    target = (
        offs.where(
            (F.col("_off") + F.col("_cw")) * p_den >= F.lit(p_num) * F.col("_W")
        )
        .groupBy(*part_cols)
        .agg(F.min("_cell").alias("_tc"))
    )
    toff = (
        offs.join(target, part_cols)
        .where(F.col("_cell") == F.col("_tc"))
        .select(*part_cols, "_cell", "_off", "_W")
    )
    # only the target cell's rows get a window; weights aggregate per
    # VALUE first so equal values share one cumulative point. Project
    # the stats columns away first — toff re-supplies _off/_W and a
    # duplicate _W would be ambiguous downstream.
    rows = binned.select(*part_cols, "_v", "_wt", "_cell")
    vals = (
        rows.join(toff, [*part_cols, "_cell"])
        .groupBy(*part_cols, "_v")
        .agg(F.sum("_wt").alias("_vw"), F.max("_off").alias("_off"),
             F.max("_W").alias("_W"))
    )
    w_cum = (
        Window.partitionBy(*part_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vals.withColumn("_cum", F.col("_off") + F.sum("_vw").over(w_cum))
    return (
        cum.where(F.col("_cum") * p_den >= F.lit(p_num) * F.col("_W"))
        .groupBy(*part_cols)
        .agg(
            F.max("_W").alias("w_total"),
            F.min("_v").alias("wmedian"),
        )
    )


def churn_analysis(events: DataFrame, period_us: int = 604800000000) -> DataFrame:
    """Weekly churn / acquisition ledger: per period, how many users
    were active, how many are NEW (not active the previous period),
    RETAINED (active both), and how many of the previous period's
    users CHURNED (absent this period) — the complement of
    :func:`cohort_retention`, reported per calendar period rather than
    per cohort.

    One distinct (user, period) projection; new/retained come from a
    self-join shifted one period forward, churn from the reverse
    direction — all equi-joins on (user, period), integer period
    arithmetic (epoch-micros DIV period), no windows at all. Volume
    never exceeds the deduped user-period table."""
    act = (
        events.select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {int(period_us)}")
            .alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = act.select("user_id", (F.col("p") + 1).alias("p"))
    both = act.join(prev, ["user_id", "p"], "left_semi")
    retained = both.groupBy("p").agg(F.count("*").alias("n_retained"))
    active = act.groupBy("p").agg(F.count("*").alias("n_active"))
    churned = (
        prev.join(act, ["user_id", "p"], "left_anti")
        .groupBy("p")
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        active.join(retained, "p", "left_outer")
        .join(churned, "p", "left_outer")
        .select(
            F.col("p").alias("period"),
            "n_active",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            (F.col("n_active") - F.coalesce("n_retained", F.lit(0))).alias("n_new"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Inter-arrival time statistics per event type: for each user's
    stream of same-type events (deterministic (ts, event_id) order),
    the gaps in exact integer MICROSECONDS, aggregated per type into
    count / mean / exact median / max — the workload-cadence profile
    behind rate limiting and anomaly thresholds.

    Gaps are one lag window partitioned by (user, type) — per-user
    streams are bounded, no single-task collapse; the mean is integer
    division of an integer sum; the MEDIAN is exact and distributed
    via :func:`grouped_weighted_median` with unit weights (the
    threshold-crossing grid plan — never a per-type sort task)."""
    e = events.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("_us", "event_id")
    gaps = (
        e.withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
        .where(F.col("_gap").isNotNull())
        .select("event_type", "_gap")
        .localCheckpoint(eager=True)
    )
    base = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.expr("sum(_gap) div count(*)").alias("mean_gap_us"),
        F.max("_gap").alias("max_gap_us"),
    )
    med = grouped_weighted_median(
        gaps.withColumn("_one", F.lit(1)), ["event_type"], "_gap", "_one"
    ).select("event_type", F.col("wmedian").alias("median_gap_us"))
    return base.join(med, "event_type").select(
        "event_type", "n_gaps", "mean_gap_us", "median_gap_us", "max_gap_us"
    )


def pareto_activity(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Whale curve: rank users into activity deciles (by event count,
    user_id tiebreak) and report each decile's share of total events —
    the classic "top 10% of users drive X% of traffic" concentration
    gauge next to :func:`rfm_segments`.

    The per-user count is one hash agg; the decile is the EXACT
    distributed :func:`global_ntile` (grid path above 1M users, never
    a single-task sort); shares are integer ppm of integer sums."""
    per_user = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    binned = global_ntile(per_user, ["n_events", "user_id"], n_bins, out="decile")
    tot = binned.agg(F.sum("n_events").alias("_tot"))
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            "n_events",
            F.expr("n_events * 1000000 div _tot").alias("events_share_ppm"),
        )
    )


def wow_growth(events: DataFrame, period_us: int = 604800000000) -> DataFrame:
    """Week-over-week growth per event type: weekly event counts with
    the previous OBSERVED week's count and the growth in exact integer
    ppm ((n − prev) · 1e6 div prev; the first observed week has NULL
    prev/growth by the standard lag convention). One hash agg + one
    lag window partitioned by type over the ≤(types × weeks) aggregate
    rows — constant-size window input at any corpus scale."""
    weekly = events.groupBy(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {int(period_us)}")
        .alias("period"),
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("period")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "period",
        "n_events",
        prev.alias("prev_events"),
        F.expr(
            "CASE WHEN prev_events IS NULL THEN NULL "
            "ELSE (n_events - prev_events) * 1000000 div prev_events END"
        ).alias("wow_growth_ppm"),
    )


def hampel_filter(
    events: DataFrame, width: int = 7, k: int = 3
) -> DataFrame:
    """Hampel outlier filter per event type: flag a value when it sits
    more than ``k`` MADs from the trailing-window MEDIAN — the robust
    replacement for z-score spike detection (one outlier can't drag
    the center the way it drags a mean/std). All integer micros: the
    window array's lower median and the lower median of absolute
    deviations are exact array picks, and the flag is the integer
    cross-multiply |x − med| > k·MAD — no float anywhere, bit-exact on
    any engine. Windows partition by event_type and order by (ts,
    event_id); per-row work is two sorts of a ≤``width`` array."""
    e = events.select(
        "event_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
        F.floor(F.col("value") * 1000000.0).cast("long").alias("v_micros"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("_us", "event_id")
        .rowsBetween(-(width - 1), 0)
    )
    arr = F.array_sort(F.collect_list("v_micros").over(w))
    d = e.withColumn("_arr", arr).withColumn(
        "med", F.expr("element_at(_arr, CAST((size(_arr) + 1) div 2 AS INT))")
    )
    dev = F.array_sort(
        F.transform("_arr", lambda x: F.abs(x - F.col("med")))
    )
    d = d.withColumn("_dev", dev).withColumn(
        "mad", F.expr("element_at(_dev, CAST((size(_dev) + 1) div 2 AS INT))")
    )
    return d.select(
        "event_id",
        "event_type",
        "v_micros",
        "med",
        "mad",
        (F.abs(F.col("v_micros") - F.col("med")) > F.lit(k) * F.col("mad"))
        .alias("is_outlier"),
    )


def theilsen_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend of daily event volume per type: the
    MEDIAN of all pairwise slopes (n₂−n₁)/(d₂−d₁) over observed days —
    the estimator one spike day cannot move (unlike OLS). Slopes are
    quantized to integer ppm with truncating division (identical in
    both engines, verified incl. negatives), and the median is the
    exact distributed :func:`grouped_weighted_median` with unit
    weights. The day dimension is calendar-bounded, so the pairwise
    slope set is tiny at ANY corpus scale — the quadratic is over
    days, never events. Returns (event_type, n_days, n_pairs,
    slope_ppm_per_day)."""
    daily = events.groupBy(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").alias("d"),
    ).agg(F.count("*").alias("n")).localCheckpoint(eager=True)
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("n").alias("n1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("n").alias("n2"))
    slopes = (
        a.join(b, "event_type")
        .where(F.col("d2") > F.col("d1"))
        .select(
            "event_type",
            F.expr("(n2 - n1) * 1000000 div (d2 - d1)").alias("slope_ppm"),
        )
    )
    med = grouped_weighted_median(
        slopes.withColumn("_one", F.lit(1)), ["event_type"], "slope_ppm", "_one"
    ).select(
        "event_type",
        F.col("w_total").alias("n_pairs"),
        F.col("wmedian").alias("slope_ppm_per_day"),
    )
    nd = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return nd.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs", "slope_ppm_per_day"
    )


def session_concurrency(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning sweep
    line: every session (the sessionizer's 30-minute-gap islands)
    contributes +1 at its start and −1 one second after its end
    (dropped when that second would cross midnight — the session is
    open through end-of-day and the day-carry rows own later days); the
    running sum over each DAY's time-ordered deltas peaks at the
    day's max concurrency. Sessions spanning midnight carry over via
    an explicit day-start delta (the running sum restarts exact at
    each day boundary with the carried-in open-session count).

    Deterministic: deltas order by (second, delta DESC, user, session)
    — a start and an end at the same instant count as overlapping
    (the max-overlap convention). All integer seconds/counts. The
    sweep window partitions by day — bounded by one day's session
    churn, never the full history."""
    from scarf_spark.streaming.events import sessionize_batch

    s = sessionize_batch(events, gap_minutes=gap_minutes).localCheckpoint(
        eager=True
    )
    day = lambda c: F.expr(f"{c} div 86400")  # noqa: E731 — integer div,
    # never a double quotient (double rounding could flip a midnight)
    # carry-over: a session open at a day boundary adds +1 at that
    # day's first second (and its -1 lands on whatever day it ends)
    deltas = (
        s.select(
            F.col("session_start").alias("sec"), F.lit(1).alias("d"),
            "user_id", "session_id",
        )
        .unionByName(
            # the close delta stays on the session's own end day: when
            # session_end is a day's final second (end+1 crosses
            # midnight) the -1 is dropped — the session is open through
            # end-of-day and the next day's carry logic owns anything
            # beyond, so a stray -1 there would offset that day's sum
            s.where(day("(session_end + 1)") == day("session_end")).select(
                (F.col("session_end") + 1).alias("sec"),
                F.lit(-1).alias("d"), "user_id", "session_id",
            )
        )
        .unionByName(
            # for each midnight a session spans, emit +1 at the day
            # start so per-day running sums are self-contained (there
            # is no matching virtual end-of-day -1: the prior day's
            # max is unaffected by a decrement at its last instant)
            s.where(day("session_end") > day("session_start")).select(
                F.explode(
                    F.sequence(
                        day("session_start") + 1, day("session_end")
                    )
                ).alias("_d"),
                "user_id", "session_id",
            ).select(
                (F.col("_d") * 86400).alias("sec"), F.lit(1).alias("d"),
                "user_id", "session_id",
            )
        )
    )
    deltas = deltas.withColumn("day", F.expr("sec div 86400"))
    w = (
        Window.partitionBy("day")
        .orderBy("sec", F.desc("d"), "user_id", "session_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = deltas.withColumn("_run", F.sum("d").over(w))
    return run.groupBy("day").agg(
        F.max("_run").cast("long").alias("max_concurrent"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_session_starts"),
    )


def max_drawdown(events: DataFrame) -> DataFrame:
    """Maximum drawdown per user over the cumulative event value — the
    classic peak-to-trough gauge (finance's risk staple, equally the
    "how far below its best did this account fall" product metric).
    All integer micros: the cumulative sum, its running max, and the
    drawdown are exact integers over the deterministic (ts, event_id)
    order; windows partition by user. Returns (user_id, final_micros,
    peak_micros, max_drawdown_micros)."""
    e = events.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
        "event_id",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("_v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("_v").over(w)
    d = e.withColumn("_cum", cum).withColumn("_peak", F.max(F.col("_cum")).over(w))
    return d.groupBy("user_id").agg(
        # the final cumulative value is just the total — no argmax-by-
        # time needed (and none of its cross-engine ordering risk)
        F.sum("_v").alias("final_micros"),
        F.max("_cum").alias("peak_micros"),
        F.max(F.col("_peak") - F.col("_cum")).alias("max_drawdown_micros"),
    ).select("user_id", "final_micros", "peak_micros", "max_drawdown_micros")


def welch_t_test(
    events: DataFrame, type_a: str = "purchase", type_b: str = "click"
) -> DataFrame:
    """Welch's unequal-variance t statistic between two event types'
    value distributions — the default two-sample comparison when
    variances differ (A/B-test readout). Sufficient statistics only
    (count / integer-micro sum / integer-micro sum of squares — exact,
    order-free), so the statistic and the Welch-Satterthwaite degrees
    of freedom are each ONE closed-form double expression over exact
    inputs, ROUND(6)-portable. Two rows of aggregate state at any
    scale. Returns (n_a, n_b, mean_diff_micros, t_stat, df_ws)."""
    v = F.floor(F.col("value") * 1000000.0).cast("long")
    side = events.where(F.col("event_type").isin([type_a, type_b])).select(
        (F.col("event_type") == type_a).alias("_a"), v.alias("_v")
    )
    st = side.groupBy("_a").agg(
        F.count("*").alias("n"),
        F.sum("_v").alias("s1"),
        # DECIMAL inside the SUM: micros² reaches 1e18 per row, so an
        # int64 accumulator overflows under ANSI before any cast could
        F.sum(F.col("_v").cast("decimal(38,0)") * F.col("_v")).alias("s2"),
    ).localCheckpoint(eager=True)
    ns = {r["_a"]: r["n"] for r in st.collect()}  # two rows at any scale
    if ns.get(True, 0) < 2 or ns.get(False, 0) < 2:
        # n<2 zeroes a variance denominator (silent NULL t), and an
        # absent side empties the crossJoin — both indistinguishable
        # from "no signal" downstream, so fail loudly like
        # conformal_ridge's empty-calibration guard.
        raise ValueError(
            f"welch_t_test: need >=2 rows per side, got "
            f"n_a={ns.get(True, 0)} ({type_a!r}), "
            f"n_b={ns.get(False, 0)} ({type_b!r})"
        )
    a = st.where(F.col("_a")).select(
        F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = st.where(~F.col("_a")).select(
        F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.crossJoin(b)
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    # unbiased sample variances from exact sums
    va = (F.col("qa").cast("double") - F.col("na") * ma * ma) / (F.col("na") - 1)
    vb = (F.col("qb").cast("double") - F.col("nb") * mb * mb) / (F.col("nb") - 1)
    se2 = va / F.col("na") + vb / F.col("nb")
    t = (ma - mb) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (va / F.col("na")) * (va / F.col("na")) / (F.col("na") - 1)
        + (vb / F.col("nb")) * (vb / F.col("nb")) / (F.col("nb") - 1)
    )
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma - mb, 6).alias("mean_diff_micros"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 6).alias("df_ws"),
    )


def bollinger_outliers(
    events: DataFrame, width: int = 20, k: int = 2
) -> DataFrame:
    """Bollinger-band outlier flags per event type: is the value more
    than ``k`` trailing-window standard deviations from the trailing
    mean? The float-free formulation: with window sum S, sum of
    squares Q, count n (all exact integers over micros),
    |x − S/n| > k·σ_pop  ⇔  (n·x − S)² > k²·(n·Q − S²) —
    an integer cross-multiply with DECIMAL(38,0) squares (micros² can
    pass 2⁶³), so the flag is bit-exact on any engine. One window per
    (event_type); per-row work is O(1)."""
    e = events.select(
        "event_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("_us"),
        F.floor(F.col("value") * 1000000.0).cast("long").alias("v_micros"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("_us", "event_id")
        .rowsBetween(-(width - 1), 0)
    )
    d = e.withColumn("_n", F.count("*").over(w)).withColumn(
        "_s", F.sum("v_micros").over(w)
    ).withColumn(
        "_q",
        F.sum(F.col("v_micros").cast("decimal(38,0)") * F.col("v_micros")).over(w),
    )
    lhs = (
        (F.col("_n") * F.col("v_micros") - F.col("_s")).cast("decimal(38,0)")
    )
    rhs = (
        F.lit(k * k).cast("decimal(38,0)")
        * (
            F.col("_n").cast("decimal(38,0)") * F.col("_q")
            - F.col("_s").cast("decimal(38,0)") * F.col("_s").cast("decimal(38,0)")
        )
    )
    return d.select(
        "event_id",
        "event_type",
        "v_micros",
        F.col("_n").cast("long").alias("window_n"),
        (lhs * lhs > rhs).alias("is_outlier"),
    )


def holt_linear(
    events: DataFrame, alpha: float = 0.5, beta: float = 0.3
) -> DataFrame:
    """Holt's linear-trend exponential smoothing over each event
    type's daily volume — the two-state big sibling of
    :func:`ewma_final` (level + trend instead of level alone), the
    classic short-horizon capacity forecast.

    The recursion l' = α·y + (1−α)(l+b), b' = β(l'−l) + (1−β)b is a
    left fold with a STRUCT accumulator seeded by the first
    observation (l₀ = y₀, b₀ = 0) — every step smooth, the fold order
    is the sorted day sequence, and DuckDB's list_reduce replays the
    identical IEEE op sequence on a struct state, so the final
    level/trend and the h-step forecast l + h·b oracle exactly.
    Observed days fold as consecutive observations (gap days carry no
    row — documented, matching the per-day aggregates elsewhere).
    Returns (event_type, n_days, level, trend, forecast_7d)."""
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("double").alias("y"))
    )
    ys = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("day"), F.col("y")))),
            lambda s: s["y"],
        ).alias("ys")
    )
    a, b1 = F.lit(float(alpha)), F.lit(float(beta))
    zero = F.struct(
        F.col("ys")[0].alias("l"), F.lit(0.0).alias("b")
    )
    merge = lambda acc, x: F.struct(  # noqa: E731
        (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])).alias("l"),
        (
            b1 * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"]) - acc["l"])
            + (F.lit(1.0) - b1) * acc["b"]
        ).alias("b"),
    )
    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        zero,
        merge,
    )
    return ys.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["l"] + F.lit(7.0) * st["b"], 6).alias("forecast_7d"),
    )


def holt_winters(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.2,
    gamma: float = 0.3,
    period: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality) over
    each event type's daily volume — the seasonal completion of
    :func:`holt_linear`. State is a (3 + period)-slot DOUBLE array
    [t, l, b, s_1..s_p] folded left over the sorted day sequence:

        i  = t mod p                  (0-based season of the obs)
        l' = α(y − s_i) + (1−α)(l+b)
        b' = β(l' − l)  + (1−β)b
        s_i' = γ(y − l') + (1−γ)s_i   (other slots carried)

    seeded deterministically (l₀ = y₀, b₀ = 0, s ≡ 0 — the seasonals
    learn over the series). Every step is smooth and the state is a
    plain DOUBLE[] list, so DuckDB's list_reduce replays the identical
    IEEE sequence (struct accumulators mis-thread there; lists are the
    portable encoding). Returns (event_type, n_days, level, trend,
    forecast_1d, seasonal_range) — forecast_1d = l + b + s_next."""
    p = int(period)
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("double").alias("y"))
    )
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("day"), F.col("y")))),
            lambda s: s["y"],
        ).alias("ys")
    )
    a = F.lit(float(alpha))
    bb = F.lit(float(beta))
    g = F.lit(float(gamma))
    one = F.lit(1.0)

    def lp_of(acc, y):
        i0 = acc[0].cast("int") % p
        s_i = F.element_at(acc, i0 + 4)
        return a * (y - s_i) + (one - a) * (acc[1] + acc[2])

    def merge(acc, y):
        i0 = acc[0].cast("int") % p
        s_i = F.element_at(acc, i0 + 4)
        lp = lp_of(acc, y)
        bp = bb * (lp_of(acc, y) - acc[1]) + (one - bb) * acc[2]
        seas = F.transform(
            F.slice(acc, 4, p),
            lambda s, j: F.when(
                j == i0, g * (y - lp_of(acc, y)) + (one - g) * s
            ).otherwise(s),
        )
        return F.concat(F.array(acc[0] + one, lp, bp), seas)

    zero = F.concat(
        F.array(one, F.col("ys")[0], F.lit(0.0)),
        F.array_repeat(F.lit(0.0), p),
    )
    st = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        zero,
        merge,
    )
    n = F.size("ys")
    s_next = F.element_at(st, (n % p) + 4)
    seas_final = F.slice(st, 4, p)
    return ser.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(st[1], 6).alias("level"),
        F.round(st[2], 6).alias("trend"),
        F.round(st[1] + st[2] + s_next, 6).alias("forecast_1d"),
        F.round(F.array_max(seas_final) - F.array_min(seas_final), 6).alias(
            "seasonal_range"
        ),
    )


def volume_acf(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation profile of each event type's daily volume at
    lags 1..max_lag — the seasonality-detection companion of
    :func:`holt_winters` (a weekly cycle shows as a lag-7 peak).

    Integer-exact: with S = Σy and n observations, the mean-centered
    products scale by n² to (n·y_t − S)(n·y_{t−k} − S) — pure integers
    summed as DECIMAL(38,0) (day counts can be 1e9+ at corpus scale,
    so the squares outgrow int64), and the ACF is a truncating integer
    ppm ratio — no float accumulation anywhere. The lag-k partner
    comes from ONE equi-join on the shifted day rank (keys
    (type, rank+lag) = (type, rank)), so pair volume is n·max_lag,
    never n². Lags run over the OBSERVED day sequence (gaps fold as
    consecutive, matching holt_linear). Returns (event_type, lag,
    n_pairs, acf_ppm)."""
    daily = (
        events.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("y"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    d = (
        daily.join(tot, "event_type")
        .select(
            "event_type",
            "day",
            (F.col("n") * F.col("y") - F.col("s")).alias("c"),
        )
        .withColumn("rk", F.row_number().over(w))
        .localCheckpoint(eager=False)  # consumed by both join sides + den
    )
    a = d.select(
        "event_type",
        F.col("c").alias("ca"),
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
        "rk",
    ).withColumn("tgt", F.col("rk") + F.col("lag"))
    b = d.select(
        "event_type", F.col("rk").alias("tgt"), F.col("c").alias("cb")
    )
    num = (
        a.join(b, ["event_type", "tgt"])
        .select(
            "event_type",
            "lag",
            (
                F.col("ca").cast("decimal(38,0)")
                * F.col("cb").cast("decimal(38,0)")
            ).alias("p"),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum("p").alias("num"), F.count("*").alias("n_pairs"))
    )
    den = d.groupBy("event_type").agg(
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("den")
    )
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            # exact integer quotient: `div` on DECIMAL truncates toward
            # zero (matching DuckDB HUGEINT `//`) with no intermediate
            # rounding — a plain `/`+cast rounds HALF_UP at result
            # scale first, which can flip a quotient within ~5e-7 of an
            # integer boundary. |num| <= den (Cauchy-Schwarz) so the
            # ppm always fits in long.
            F.when(
                F.col("den") != 0,
                F.expr("(num * 1000000) div den"),
            )
            .otherwise(F.lit(0))
            .alias("acf_ppm"),
        )
    )
