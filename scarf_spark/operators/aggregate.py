"""Grouped aggregations beyond QC (SURVEY.md §2.5).

Reference semantics: ``make_bulk`` pseudo-bulk matrices
(``scarf/datastore/datastore.py:978-1116``: per-(group, feature)
sum/mean + fraction-expressed, optional pseudo-replicate split), heatmap
group-mean + per-feature z-score (``datastore.py:1904-1923``),
``add_grouped_assay`` per-(cell, feature-cluster) means
(``datastore.py:824-894``), gene-set scoring
(``assay.py:698-745``), crosstab relabeling / ``smart_label``
(``datastore.py:1189-1239``).

Every one is a hash aggregation over the fact table keyed by a small
cross product (groups × features), i.e. the shuffle moves only the
aggregate state. Group labels come from dimension tables via broadcast
joins — the fact table is never re-shuffled for the label."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def make_bulk(
    counts: DataFrame,
    cell_groups: DataFrame,
    group_col: str = "group",
) -> DataFrame:
    """Pseudo-bulk (``datastore.py:978-1116``): per (group, feature)
    raw-sum, mean over the group's cells (dense: absent rows are zero),
    and fraction of cells expressing (``return_fraction``,
    ``datastore.py:1069-1087``).

    cell_groups: (cell_id, group) — node-sized, so no broadcast hint
    (AQE broadcasts when small; group sizes stay hinted)."""
    sizes = cell_groups.groupBy(group_col).agg(F.count("*").alias("_gn"))
    joined = counts.join(cell_groups, "cell_id")
    return (
        joined.groupBy(group_col, "feat_id")
        .agg(
            F.sum("value").cast("double").alias("sum_value"),
            F.sum("value").cast("double").alias("_tot"),
            F.count(F.when(F.col("value") > 0, 1)).alias("_nnz"),
        )
        .join(F.broadcast(sizes), group_col)
        .select(
            group_col,
            "feat_id",
            "sum_value",
            F.round(F.col("_tot") / F.col("_gn"), 6).alias("mean_value"),
            F.round(F.col("_nnz") / F.col("_gn").cast("double"), 6).alias("frac_expressed"),
        )
    )


def pseudo_replicates(
    counts: DataFrame,
    cell_groups: DataFrame,
    n_reps: int = 3,
    group_col: str = "group",
) -> DataFrame:
    """Pseudo-replicate split (``datastore.py:1040-1067``): cells of a
    group are split into n_reps deterministic replicates (the reference
    shuffles with a seeded RNG; we use rank order mod n_reps so the
    oracle can reproduce it), then per-(group, rep, feature) sums."""
    w = Window.partitionBy(group_col).orderBy("cell_id")
    reps = cell_groups.withColumn(
        "rep", F.pmod(F.row_number().over(w) - 1, F.lit(n_reps))
    )
    return (
        counts.join(reps, "cell_id")
        .groupBy(group_col, "rep", "feat_id")
        .agg(F.sum("value").cast("double").alias("sum_value"))
    )


def group_mean_zscore(
    counts: DataFrame, cell_groups: DataFrame, group_col: str = "group"
) -> DataFrame:
    """Heatmap matrix (``datastore.py:1904-1923``): per-(group, feature)
    dense mean, then z-score each feature across groups."""
    sizes = cell_groups.groupBy(group_col).agg(F.count("*").alias("_gn"))
    means = (
        counts.join(cell_groups, "cell_id")
        .groupBy(group_col, "feat_id")
        .agg(F.sum("value").alias("_tot"))
        .join(F.broadcast(sizes), group_col)
        .select(group_col, "feat_id", (F.col("_tot") / F.col("_gn")).alias("mean_value"))
    )
    wf = Window.partitionBy("feat_id")
    mu = F.avg("mean_value").over(wf)
    sd = F.stddev_samp("mean_value").over(wf)
    return means.select(
        group_col,
        "feat_id",
        F.round("mean_value", 6).alias("mean_value"),
        F.round(F.when(sd != 0, (F.col("mean_value") - mu) / sd).otherwise(0.0), 6).alias("z"),
    )


def grouped_assay(
    counts: DataFrame, feat_groups: DataFrame, n_feats_per_group: DataFrame | None = None,
    group_col: str = "feat_group",
) -> DataFrame:
    """``add_grouped_assay`` (``datastore.py:824-894``): new assay =
    per-(cell, feature-group) mean of values over the group's features
    (dense over the group size). feat_groups: (feat_id, feat_group)."""
    sizes = feat_groups.groupBy(group_col).agg(F.count("*").alias("_fn"))
    return (
        counts.join(F.broadcast(feat_groups), "feat_id")
        .groupBy("cell_id", group_col)
        .agg(F.sum("value").alias("_tot"))
        .join(F.broadcast(sizes), group_col)
        .select(
            "cell_id", group_col, F.round(F.col("_tot") / F.col("_fn"), 6).alias("mean_value")
        )
    )


def score_features(
    counts: DataFrame, feats_a: DataFrame, feats_b: DataFrame, out: str = "score"
) -> DataFrame:
    """Gene-set score (``assay.py:698-745``): per-cell dense mean over
    set A minus dense mean over the control set B (the reference draws B
    by expression-matched binned sampling — ``feat_utils.py:48-92``;
    callers supply it here, see ml.binned_sampling)."""
    na = feats_a.count()
    nb = feats_b.count()
    a = (
        counts.join(F.broadcast(feats_a.select("feat_id")), "feat_id", "left_semi")
        .groupBy("cell_id")
        .agg((F.sum("value") / F.lit(float(na))).alias("_ma"))
    )
    b = (
        counts.join(F.broadcast(feats_b.select("feat_id")), "feat_id", "left_semi")
        .groupBy("cell_id")
        .agg((F.sum("value") / F.lit(float(nb))).alias("_mb"))
    )
    return (
        a.join(b, "cell_id", "full_outer")
        .select(
            "cell_id",
            F.round(F.coalesce("_ma", F.lit(0.0)) - F.coalesce("_mb", F.lit(0.0)), 6).alias(out),
        )
    )


def crosstab_counts(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Contingency table in long form (``datastore.py:1189-1239``
    smart_label first half)."""
    return df.groupBy(a_col, b_col).agg(F.count("*").alias("n"))


def smart_label_argmax(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Per-a argmax over the contingency table with deterministic
    tie-break on b (``datastore.py:1189-1239``): which target label each
    source label maps to."""
    ct = crosstab_counts(df, a_col, b_col)
    w = Window.partitionBy(a_col).orderBy(F.col("n").desc(), F.col(b_col))
    return (
        ct.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(a_col, F.col(b_col).alias("best_" + b_col), F.col("n").alias("n_best"))
    )


def pivot_wide(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
) -> DataFrame:
    """Long-to-wide pivot: one output column per ``pivot_values`` entry
    holding SUM(value_col), absent combinations as 0.0 (the dense-matrix
    export surface, e.g. the reference's dense assay views
    (``scarf/assay.py:198-226``) and ``to_pandas`` style tables).

    ``pivot_values`` is explicit: without it Spark runs an extra
    distinct pass to discover the domain, and the output schema would
    depend on the data — fatal for a 100 TB pipeline where the schema
    must be known before the job runs.

    Deliberately NOT ``df.groupBy().pivot()``: the built-in plans TWO
    hash aggregations ((key, pivot) partial-sum, exchange, then
    pivot_first by key — two shuffles). The conditional-aggregate
    rewrite below is the single-shuffle form — one hash aggregate whose
    state is the |values|-wide row, map-side combined — and is what the
    built-in's logical plan should fold into anyway."""
    aggs = [
        F.coalesce(
            F.round(
                F.sum(F.when(F.col(pivot_col) == v, F.col(value_col))), 6
            ),
            F.lit(0.0),
        ).alias(v)
        for v in pivot_values
    ]
    return df.groupBy(key_col).agg(*aggs)


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact linear-interpolation quantiles per group
    (``percentile``, not ``percentile_approx``): the reference computes
    exact percentiles driver-side on small summaries
    (``scarf/utils.py`` fit thresholds); here it is Spark's exact
    distributed percentile aggregate — one shuffle keyed by the group,
    per-group sorted state. For quantiles over a 100 TB UNGROUPED
    column, or when a skewed group's value multiset would not fit an
    executor, switch to :func:`hist_quantiles` (deterministic bounded
    state, oracle-replayable) or ``approx_percentile`` (t-digest,
    engine-private); per-group with bounded group cardinality the
    exact form is the right default."""
    cols = [
        F.round(
            F.expr(f"percentile({value_col}, {q!r})"), 6
        ).alias(f"q{int(q * 100)}")
        for q in qs
    ]
    return df.groupBy(group_col).agg(*cols)


def hist_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    n_bins: int = 1024,
) -> DataFrame:
    """Histogram quantiles — the SCALE path for per-group percentiles:
    exact ``percentile()`` builds a per-group value multiset that a
    skewed hot group can OOM at 100×; this computes quantiles to
    ±(range/n_bins) accuracy with bounded, mergeable state (n_bins
    counts per group) in two hash aggregates and one bin-keyed window.

    Deterministic and oracle-replayable: bin = LEAST(FLOOR((v-lo)/w),
    n_bins-1) on identically shaped double ops; the target rank is the
    integer ``FLOOR(q·n)+1`` (q ∈ {.25,.5,.75} are exact binary
    fractions, so q·n is exact); the answer is the midpoint of the
    first bin whose cumulative count reaches the rank. Returns
    (group, n, q{25,50,75}_est)."""
    mm = df.groupBy(group_col).agg(
        F.min(value_col).alias("_lo"),
        F.max(value_col).alias("_hi"),
        F.count(value_col).alias("n"),
    )
    w_expr = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bin_expr = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_lo")) / w_expr),
            F.lit(n_bins - 1),
        )
    ).cast("long")
    binned = (
        df.join(F.broadcast(mm), group_col)
        .groupBy(group_col, bin_expr.alias("bin"))
        .agg(F.count("*").alias("c"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy(group_col).orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).join(F.broadcast(mm), group_col)
    aggs = []
    for q in qs:
        t = F.least(
            F.floor(F.lit(q) * F.col("n")).cast("long") + 1, F.col("n")
        )
        qbin = F.min(F.when(F.col("cum") >= t, F.col("bin")))
        aggs.append(qbin.alias(f"_b{int(q * 100)}"))
    out = cum.groupBy(group_col, "_lo", "_hi", "n").agg(*aggs)
    w_out = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    sel = [F.col(group_col), F.col("n")]
    for q in qs:
        est = F.col("_lo") + (F.col(f"_b{int(q * 100)}") + F.lit(0.5)) * w_out
        sel.append(F.round(est, 6).alias(f"q{int(q * 100)}_est"))
    return out.select(*sel)


# KMV (k-minimum-values) sketch hash: an explicit LCG over a Mersenne
# prime so Spark and any oracle engine agree bit-for-bit (both sides do
# exact BIGINT arithmetic; (P-1)*A < 2^63 so no overflow).
KMV_P = 2147483647  # 2^31 - 1
KMV_A = 1103515245
KMV_B = 12345


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group: hash each key
    with a fixed LCG, keep the k smallest DISTINCT hash values, estimate
    ndv = (k-1) / (h_(k) / P). The mergeable-sketch building block of a
    100 TB profiling pass (union of sketches = k smallest of the
    union), with a deterministic hash so the estimate is reproducible
    across engines — unlike native HLL implementations (approx_
    count_distinct), whose register layouts never are; see
    :func:`hll_distinct` for a from-scratch HLL that IS.

    Plan shape: distinct (group, hash), then SALTED two-stage top-k —
    a per-(group, salt) window keeps k candidates in 64 parallel
    sub-partitions, and the per-group window ranks only the ≤64k
    survivors. A single per-group window would sort EVERY distinct hash
    in |groups| partitions (one core per group at 20M rows: measured
    ~6x slower in tools/scale_smoke.py); the salted form is the
    standard distributed-top-k rewrite and bounds the serial sort at
    64k rows regardless of cardinality. The exact distinct count is a
    separate hash aggregate (map-side combined) and is emitted next to
    the estimate so the sketch error stays visible."""
    h = ((F.col(key_col).cast("long") % KMV_P) * KMV_A + KMV_B) % KMV_P
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    exact = hashed.groupBy("grp").agg(F.count("*").alias("exact_ndv"))
    w1 = Window.partitionBy("grp", "salt").orderBy("h")
    cand = (
        hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(64)))
        .withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= k)
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    kth = (
        cand.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == k)
        .select("grp", F.col("h").alias("h_k"))
    )
    return (
        exact.join(kth, "grp", "left_outer")
        .select(
            F.col("grp").alias(group_col),
            "exact_ndv",
            "h_k",
            F.round(
                F.when(
                    F.col("h_k").isNotNull(),
                    F.lit(float(k - 1)) / (F.col("h_k") / F.lit(float(KMV_P))),
                ).otherwise(F.col("exact_ndv").cast("double")),
                6,
            ).alias("est_ndv"),
        )
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    p: int = 6,
) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet et al. 2007) that is
    bit-reproducible in ANY engine — the cardinality sketch every
    100 TB profiling pass actually ships (Spark's own
    ``approx_count_distinct`` is HLL++, but its xxhash register layout
    is engine-private; this one is a plain relational program over a
    portable md5 hash, so the DuckDB oracle replays it exactly).

    Layout: 60-bit md5 hash → low ``p`` bits pick one of m = 2^p
    registers (bitwise AND), the remaining 60−p bits are the pattern
    word; register value = MAX over keys of the leading-zero rank
    ``rho = (60−p) − bitlen(w) + 1`` (``bin()``-string length — integer
    exact). The harmonic mean is computed in INTEGER arithmetic:
    ``Σ 2^{-M}`` = ``SUM(1 << (55−M)) / 2^55`` with a BIGINT numerator
    (powers of two summed as integers — exact and order-free, where a
    double SUM's accumulation order is engine-defined). Small-range
    (linear counting) correction included. Execution: one map-side-
    combined hash agg to registers (m rows per group), one tiny final
    agg — the mergeable-sketch shape (register-wise MAX merges shards).

    Emits (group, exact_ndv, n_zero_regs, est_ndv) — exact next to the
    estimate so sketch error stays visible, like :func:`kmv_distinct`."""
    if p != 6:
        raise ValueError("p=6 (64 registers) is the oracle-pinned layout")
    m = 64
    wbits = 60 - p  # 54
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    exact = hashed.groupBy("grp").agg(F.count("*").alias("exact_ndv"))
    w = F.shiftright(F.col("h"), p)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    regs = (
        hashed.select("grp", F.col("h").bitwiseAND(m - 1).alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mreg"))
    )
    agg = regs.groupBy("grp").agg(
        F.count("*").alias("n_present"),
        # pyspark's shiftleft wrapper takes only int shifts; the SQL
        # function accepts a column
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - mreg)")).alias(
            "_numer_present"
        ),
    )
    two55 = F.lit(36028797018963968).cast("long")  # 2^55
    numer = F.col("_numer_present") + (F.lit(m) - F.col("n_present")) * two55
    alpha_m2 = F.lit(0.709 * m * m)  # alpha_64 * m^2
    raw = alpha_m2 * two55.cast("double") / numer.cast("double")
    v_zero = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return (
        exact.join(agg, "grp")
        .select(
            F.col("grp").alias(group_col),
            "exact_ndv",
            v_zero.cast("long").alias("n_zero_regs"),
            F.round(est, 6).alias("est_ndv"),
        )
    )


def cms_cells(df: DataFrame, key_col: str, d: int = 4, w: int = 64) -> DataFrame:
    """The (r, bucket, cnt) count-min sketch table — the shared build
    behind :func:`cms_heavy_hitters` and the STREAMING twin
    (``streaming.events.cms_sketch_stream``): the same groupBy runs
    unchanged on a streaming DataFrame as a windowless aggregation
    whose state is the constant d·w cells, and register-wise SUM
    merges shards/restarts."""

    def bucket(r: int) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}_"), F.col(key_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(w))

    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), bucket(r).alias("bucket")) for r in range(d)
    ])
    return (
        df.select(F.explode(cells).alias("_c"))
        .select("_c.r", "_c.bucket")
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
    n_top: int = 20,
) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005):
    the frequency twin of the cardinality sketches (:func:`hll_distinct`,
    :func:`kmv_distinct`). d independent md5 hash rows of w buckets
    each; a key's estimate is the MIN over rows of its bucket counts —
    never an underestimate, overestimate bounded by collisions.

    Scale shape: the build explodes each occurrence into d cells, but
    the groupBy's map-side partial aggregation collapses every
    partition to ≤ d·w rows before the shuffle — the sketch state
    (d·w = 256 cells) crossing the network is CONSTANT in corpus size,
    which is the entire point of a sketch at 100 TB (and register-wise
    SUM merges shards). The probe side joins the 256-row sketch
    BROADCAST, so looking up every candidate key is shuffle-free past
    the per-key exact count (kept, as in the other sketches, so the
    error stays visible).

    Emits the top ``n_top`` keys by exact count (key tie-break):
    (key, exact_cnt, est_cnt, overestimate)."""
    sketch = cms_cells(df, key_col, d=d, w=w)
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    probes = exact.select(
        "key",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{r}_"), F.col("key").cast("string"))),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(w),
                    ).alias("bucket"),
                )
                for r in range(d)
            ])
        ).alias("_c"),
    ).select("key", "_c.r", "_c.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        exact.join(est, "key")
        .select(
            "key",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.col("exact_cnt").desc(), "key")
        .limit(n_top)
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-profiling pass — the data-quality summary every ingest
    runs before anything else: per column, row count, null count,
    exact NDV, and lexicographic min/max of the string form (binary
    collation in both Spark and DuckDB, so the extremes replay).

    One unpivot projection (array-of-struct explode, JVM-side) + one
    hash aggregate; columns scale the row count ×|cols| but the agg
    state stays |cols| rows. At 100 TB swap the exact NDV for
    :func:`hll_distinct` per column (mergeable registers instead of a
    distinct expand)."""
    cols = columns or df.columns
    pairs = F.array(*[
        F.struct(
            F.lit(c).alias("column"), F.col(c).cast("string").alias("value")
        )
        for c in cols
    ])
    un = df.select(F.explode(pairs).alias("_p")).select("_p.column", "_p.value")
    return un.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_nulls"),
        F.countDistinct("value").alias("ndv"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def json_props_stats(
    events: DataFrame,
    json_col: str = "props",
    path: str = "$.k",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured column surface: extract a typed field from a JSON
    string column (``get_json_object`` — JVM-side Jackson, no Python)
    and aggregate it per group. The schema-on-read pattern every event
    pipeline needs; at scale prefer ``from_json`` with an explicit
    schema so the parse happens once per row for all fields."""
    v = F.get_json_object(F.col(json_col), path).cast("int")
    return (
        events.select(F.col(group_col), v.alias("k"))
        .groupBy(group_col)
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct(F.col("k")).alias("ndv_k"),
        )
    )


def corr_manual(
    df: DataFrame, group_col: str, x_col, y_col, out: str = "corr"
) -> DataFrame:
    """Per-group Pearson correlation from the six raw sums — NOT the
    built-in ``corr`` aggregate, whose online co-moment update order is
    engine-internal; the naive-sum formula has an identical expression
    shape in any engine, so cross-engine agreement is limited only by
    the (well-conditioned) sum accumulation order.

    corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))"""
    x = x_col if isinstance(x_col, Column) else F.col(x_col)
    y = y_col if isinstance(y_col, Column) else F.col(y_col)
    a = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")) * F.sqrt(
        F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    )
    return a.select(
        group_col,
        F.col("_n").cast("long").alias("n"),
        F.round(num / den, 6).alias(out),
    )


def moment_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group mean/population-variance/skewness/excess-kurtosis from
    the four raw power sums — the same pinned-expression-shape contract
    as :func:`corr_manual` (the built-in skewness/kurtosis aggregates
    use engine-internal online central-moment updates that no other
    engine replays):

      m = S1/n,  var = S2/n − m²,
      skew = (S3/n − 3m·S2/n + 2m³) / var^1.5
      kurt = (S4/n − 4m·S3/n + 6m²·S2/n − 3m⁴) / var² − 3
    """
    v = F.col(value_col)
    a = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
        F.sum(v * v * v).alias("_s3"),
        F.sum(v * v * v * v).alias("_s4"),
    )
    n = F.col("_n")
    m = F.col("_s1") / n
    var = F.col("_s2") / n - m * m
    # var^1.5 spelled var·sqrt(var): sqrt and multiply are correctly
    # rounded in IEEE (pow is not), so any engine replays it bit-exactly
    skew = (
        F.col("_s3") / n - F.lit(3.0) * m * (F.col("_s2") / n) + F.lit(2.0) * m * m * m
    ) / (var * F.sqrt(var))
    kurt = (
        F.col("_s4") / n
        - F.lit(4.0) * m * (F.col("_s3") / n)
        + F.lit(6.0) * m * m * (F.col("_s2") / n)
        - F.lit(3.0) * m * m * m * m
    ) / (var * var) - F.lit(3.0)
    return a.select(
        group_col,
        n.cast("long").alias("n"),
        F.round(m, 6).alias("mean"),
        F.round(var, 6).alias("var_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


def group_entropy(
    df: DataFrame, group_col: str, label_col: str
) -> DataFrame:
    """Shannon entropy of the label distribution per group — the
    behavioral-diversity profiling metric (e.g. per-user event-type
    entropy separates bots from organic users; same formula as the
    cluster-purity entropy inside NMI). Two hash aggregates (the
    (group, label) histogram, then the per-group fold) — entropy is
    computed from exact integer counts, ln applied identically on both
    engines."""
    hist = df.groupBy(group_col, label_col).agg(F.count("*").alias("c"))
    tot = hist.groupBy(group_col).agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        hist.join(F.broadcast(tot), group_col)
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


def gini_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Gini coefficient of a value distribution per group, from the
    rank formula over the ascending sort:
    G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) — the concentration
    measure a pipeline uses to spot sources dominated by a few heavy
    documents/users. Ties broken by id so the rank assignment (and
    hence the exact float sums) replays identically on any engine.

    One shuffle keyed by the group; the rank window and the final
    aggregate share that partitioning."""
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(id_col))
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_x"),
        F.row_number().over(w).alias("_i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_i") * F.col("_x")).alias("_six"),
    )
    return agg.select(
        group_col,
        "n",
        F.round(
            (2.0 * F.col("_six") - (F.col("n") + 1) * F.col("_sx"))
            / (F.col("n") * F.col("_sx")),
            6,
        ).alias("gini"),
    )


def equiwidth_histogram(
    df: DataFrame, group_col: str, value_col: str, n_bins: int = 10
) -> DataFrame:
    """Equi-width histogram of a value column per group over the GLOBAL
    [min, max] range (shared bin edges make the per-group histograms
    comparable) — the profiling aggregate behind data-quality dashboards
    and optimizer statistics.

    One tiny global min/max aggregate broadcast back, then one count
    shuffle keyed by (group, bin); output is (groups × bins) rows. Bin
    assignment is a pinned float expression both engines evaluate
    identically; the top edge folds into the last bin."""
    mm = df.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    )
    w = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bin_expr = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("_lo")) / w), F.lit(n_bins - 1)
        )
    )
    return (
        df.crossJoin(F.broadcast(mm))
        .groupBy(F.col(group_col), bin_expr.cast("int").alias("bin"))
        .agg(F.count("*").alias("n"))
    )


def modal_value(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group modal value (most frequent; ties → smallest value) with
    its count — explicit count + deterministic argmax window rather than
    an engine-specific mode() whose tie rule varies. One count shuffle
    keyed by (group, value), then a window over the histogram-sized
    result."""
    cnt = df.groupBy(group_col, value_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col(value_col))
    return (
        cnt.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(group_col, F.col(value_col).alias("modal_value"), "n")
    )


def feature_cooccurrence(
    counts: DataFrame,
    top_n: int = 50,
    max_features: int | None = 2000,
    rank_by: str = "prevalence",
) -> DataFrame:
    """Top co-expressed feature pairs: how many cells express BOTH
    features — the gene-gene co-occurrence screen behind co-expression
    modules (the relational core of the reference's feature-module
    clustering, ``scarf/markers.py:323-439``, without the KNN step).

    A self-join of the COO table on cell_id with a canonical fa < fb
    cut is per-cell quadratic (Σ nnz(cell)² pairs) — at genomics
    densities a single hot cell emits 10⁶-10⁸ pairs, so the screen
    MUST run on a bounded feature subset, exactly as the reference
    runs its module screens on the HVG subset
    (``scarf/markers.py:323-439``). ``max_features`` therefore
    DEFAULTS to a 2000-feature cap (the reference's typical HVG
    count); passing ``None`` explicitly opts into the uncapped path
    and is only safe when the input is already a bounded subset.
    The cap keeps the top-N features by ``rank_by``:

    - ``prevalence`` — cells expressing the feature (exact integer
      key). Safe for the global top-pair screen: a pair seen in K
      cells needs both members at prevalence ≥ K.
    - ``variance`` — integer-exact dense-variance ordering key
      ``N·Σv² − (Σv)²`` (values are integral counts; at extreme scale
      accumulate as decimal(38,0) instead of bigint).

    The subset is a TakeOrdered (no single-partition window) and is
    broadcast into a semi-join on BOTH sides, so pair volume is
    bounded by max_features² per cell. The pair aggregate is map-side
    combined; the final top-n is TakeOrderedAndProject."""
    df = counts
    if max_features is not None:
        if rank_by == "variance":
            n_cells = counts.agg(
                F.countDistinct("cell_id").alias("_N")
            )
            stats = (
                counts.groupBy("feat_id")
                .agg(
                    # cast BEFORE multiplying: the DuckDB oracle twin
                    # casts each value to BIGINT first, and double→
                    # bigint cast truncates in Spark but rounds in
                    # DuckDB — cast-then-multiply is identical in both
                    F.sum(F.col("value").cast("bigint")).alias("_s1"),
                    F.sum(
                        F.col("value").cast("bigint")
                        * F.col("value").cast("bigint")
                    ).alias("_s2"),
                )
                .crossJoin(F.broadcast(n_cells))
                .select(
                    "feat_id",
                    (F.col("_s2") * F.col("_N")
                     - F.col("_s1") * F.col("_s1")).alias("_key"),
                )
            )
        else:
            stats = counts.groupBy("feat_id").agg(
                F.count("*").alias("_key")
            )
        keep = (
            stats.orderBy(F.col("_key").desc(), "feat_id")
            .limit(max_features)
            .select("feat_id")
        )
        df = counts.join(F.broadcast(keep), "feat_id", "semi")
    a = df.select("cell_id", F.col("feat_id").alias("fa"))
    b = df.select("cell_id", F.col("feat_id").alias("fb"))
    pairs = a.join(b, "cell_id").where(F.col("fa") < F.col("fb"))
    return (
        pairs.groupBy("fa", "fb")
        .agg(F.count("*").alias("n_cells"))
        .orderBy(F.col("n_cells").desc(), "fa", "fb")
        .limit(top_n)
    )


def boxplot_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Tukey box-plot summary per group: exact quartiles (via
    :func:`exact_quantiles`), the 1.5·IQR fences, and the outlier
    count beyond them — the standard distribution-health card next to
    the moments/entropy aggregates. Fences derive from the ROUNDED
    quartiles (the cross-engine stable values) and the outlier
    comparison re-scans the fact table once with the fence row
    broadcast — two shuffles total, constant per-group state."""
    qs = exact_quantiles(df, group_col, value_col, (0.25, 0.5, 0.75))
    fences = qs.select(
        group_col,
        "q25",
        "q50",
        "q75",
        F.round(F.col("q75") - F.col("q25"), 6).alias("iqr"),
        (F.col("q25") - 1.5 * (F.col("q75") - F.col("q25"))).alias("_lo"),
        (F.col("q75") + 1.5 * (F.col("q75") - F.col("q25"))).alias("_hi"),
    )
    joined = df.select(group_col, F.col(value_col).alias("_v")).join(
        F.broadcast(fences), group_col
    )
    return joined.groupBy(
        group_col, "q25", "q50", "q75", "iqr"
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when((F.col("_v") < F.col("_lo")) | (F.col("_v") > F.col("_hi")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    )


def log2_histogram(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Power-of-two (HdrHistogram-style) latency/value histogram per
    group: bucket = number of binary digits of the value in integer
    micros (⌊log2⌋+1 without touching libm — ``length(bin(x))`` is
    identical in Spark and DuckDB, so no float log boundary can flip a
    bucket). The constant-state way to see a long-tailed value
    distribution at 100 TB: ≤64 buckets per group through the shuffle,
    with exact min/max per bucket for the drill-down."""
    v = F.floor(F.col(value_col) * 1000000.0).cast("long")
    d = df.select(F.col(group_col), v.alias("_v")).where(F.col("_v") > 0)
    bucket = F.length(F.bin(F.col("_v")))
    return (
        d.withColumn("bucket", bucket.cast("int"))
        .groupBy(group_col, "bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("_v").alias("min_micros"),
            F.max("_v").alias("max_micros"),
        )
    )


def hll_union(df: DataFrame, group_col: str, key_col: str, p: int = 6) -> DataFrame:
    """HLL sketch ALGEBRA demonstration — the property that makes a
    sketch worth shipping at 100 TB: per-group register tables merged
    by register-wise MAX give EXACTLY the sketch built directly over
    the union (so shards/partitions/days can be sketched independently
    and combined without revisiting data). Same md5 layout and
    integer-exact estimator as :func:`hll_distinct`. Returns one row
    (n_groups, exact_ndv, est_merged, est_direct, merge_exact) —
    merge_exact is the structural guarantee and must always be true."""
    if p != 6:
        raise ValueError("p=6 (64 registers) is the oracle-pinned layout")
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    rho = F.when(F.shiftright("h", 6) == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(F.shiftright("h", 6)))
    )
    base = hashed.select(
        "grp", F.col("h").bitwiseAND(63).alias("reg"), rho.alias("rho")
    ).localCheckpoint(eager=False)
    per_grp = base.groupBy("grp", "reg").agg(F.max("rho").alias("mreg"))
    merged = per_grp.groupBy("reg").agg(F.max("mreg").alias("mreg"))
    direct = base.groupBy("reg").agg(F.max("rho").alias("mreg"))
    two55 = 36028797018963968

    def est(regs: DataFrame, name: str) -> DataFrame:
        ag = regs.agg(
            F.count("*").alias("n_p"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - mreg)")).alias("np_"),
        )
        raw = (
            F.lit(0.709 * 64 * 64)
            * F.lit(float(two55))
            / (F.col("np_") + (F.lit(64) - F.col("n_p")) * F.lit(two55)).cast(
                "double"
            )
        )
        e = F.when(
            (raw <= F.lit(160.0)) & (F.col("n_p") < 64),
            F.lit(64.0)
            * F.log(F.lit(64.0) / (F.lit(64) - F.col("n_p")).cast("double")),
        ).otherwise(raw)
        return ag.select(F.round(e, 6).alias(name))

    exact = hashed.select("h").distinct().agg(F.count("*").alias("exact_ndv"))
    ng = hashed.select("grp").distinct().agg(F.count("*").alias("n_groups"))
    return (
        ng.crossJoin(exact)
        .crossJoin(est(merged, "est_merged"))
        .crossJoin(est(direct, "est_direct"))
        .select(
            "n_groups",
            "exact_ndv",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias("merge_exact"),
        )
    )
