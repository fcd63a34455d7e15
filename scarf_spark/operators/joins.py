"""Join operators (SURVEY.md §2.4).

Reference semantics: the interval-overlap (range) join used for assay
melding (``scarf/meld_assay.py:224-281`` numba binary search,
aggregation ``meld_assay.py:384-433``), fixed-width genome binning
(``writers.py:1370-1387``), feature alignment with missing handling
(``mapping_utils.py:98-214``).

Scale notes: the naive range join is an equi-join on the partition key
(chrom) with range residual predicates — Spark executes it as a
broadcast/SMJ with post-filter, quadratic per chrom. For 100 TB-scale
interval sets use :func:`interval_overlap_join_binned`, which rewrites
the range join into an equi-join on (chrom, bin) — the classic
bin-overlap decomposition — so each interval only meets candidates in
its covering bins."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_overlap_join(
    queries: DataFrame,
    refs: DataFrame,
    on: str = "chrom",
) -> DataFrame:
    """Half-open interval overlap per chromosome
    (``meld_assay.py:224-281``): q.start < r.end AND q.end > r.start;
    one-to-many both ways. Columns: (id, chrom, start, end, value)."""
    q = queries.select(
        F.col("id").alias("q_id"), F.col(on).alias("q_chrom"),
        F.col("start").alias("q_start"), F.col("end").alias("q_end"),
    )
    r = refs.select(
        F.col("id").alias("r_id"), F.col(on).alias("r_chrom"),
        F.col("start").alias("r_start"), F.col("end").alias("r_end"),
        F.col("value").alias("r_value"),
    )
    return q.join(
        r,
        (F.col("q_chrom") == F.col("r_chrom"))
        & (F.col("q_start") < F.col("r_end"))
        & (F.col("q_end") > F.col("r_start")),
        "inner",
    )


def overlap_sum(
    queries: DataFrame,
    refs: DataFrame,
    bin_size: int = 100,
    value_scale: int | None = None,
) -> DataFrame:
    """Meld aggregation (``meld_assay.py:384-433``): overlapping ref
    values are SUMMED per query feature; queries with no overlap keep no
    row (COO semantics). Executes via the binned equi-join rewrite —
    same result set as the naive range join, but shuffle-hash-joinable
    and linear at scale.

    With ``value_scale`` set, values are quantized to integers the same
    way :func:`overlap_sum_sweep` quantizes them, so the two plans (pair
    join vs prefix sweep) produce bit-identical output and can be graded
    against one oracle."""
    pairs = interval_overlap_join_binned(queries, refs, bin_size=bin_size)
    if value_scale is None:
        return pairs.groupBy("q_id").agg(
            F.sum("r_value").cast("double").alias("sum_value"),
            F.count("*").alias("n_overlaps"),
        )
    cents = F.round(F.col("r_value") * value_scale, 0).cast("long")
    return pairs.groupBy("q_id").agg(
        F.round(
            F.sum(cents).cast("double") / value_scale, 6
        ).alias("sum_value"),
        F.count("*").alias("n_overlaps"),
    )


def overlap_sum_sweep(
    queries: DataFrame,
    refs: DataFrame,
    value_scale: int = 100,
    two_phase: bool | None = None,
    grid: int = 4096,
    small_threshold: int = 1 << 20,
) -> DataFrame:
    """Meld aggregation without materializing overlap pairs — the
    100 TB plan for dense interval sets, where even the binned join's
    output is quadratic-ish (overlapping intervals make |pairs| >>
    |inputs|).

    Inclusion-exclusion sweep: for half-open overlap (q.start < r.end
    AND q.end > r.start), the NON-overlapping refs split into two
    disjoint sets — {r.end <= q.start} and {r.start >= q.end} — so
      overlap_sum(q) = total - sum(r.end <= q.start) - sum(r.start >= q.end)
    and each term is a cumulative prefix lookup: union refs and queries
    as events on the sort key, take a running sum per chromosome, read
    it off at each query row (the as-of-join shape, one window pass,
    O(n log n), zero pair rows). Counts come from the same sweeps.

    Values are quantized to integers (``round(value * value_scale)``)
    so the cumulative sums are exact and the subtraction is bit-equal
    to a direct sum in any engine — mandatory, because cumsum
    subtraction on floats loses ~1e-10 relative precision, which a
    6-decimal rounding contract cannot absorb. Output sum_value =
    cents / value_scale.

    TWO-PHASE prefix sums (round 13): a bare per-chrom running-sum
    window serializes each chromosome onto one task — and this plan
    exists precisely for inputs too dense to pair-join, i.e. the
    inputs where one-task-per-chrom hurts. Above ``small_threshold``
    events (or with ``two_phase=True``) the running sum runs as the
    global_ntile grid shape: quantize the sort key onto a fixed
    per-chrom grid (exact per-chrom min/max, seedless — NOT sampled
    boundaries), aggregate per-(chrom, bucket) partial (sum, count),
    cumulate EXCLUSIVE offsets over the tiny ≤``grid``-rows-per-chrom
    partial table, broadcast-join them back, and finish with a window
    partitioned by (chrom, bucket) — per-task work is bounded by how
    many events share ~1/grid of the key range, independent of
    chromosome size. Bucketing is monotonic in the key and ties share
    a bucket, so the (k, kind, eid) total order — and therefore every
    cumulative value — is bit-identical to the single-window plan
    (asserted by tests/test_round13_ops.py). Integer math unchanged.
    Below the threshold the plain per-chrom window is strictly fewer
    jobs (ALLOW: adaptive small branch, same convention as
    windows.global_ntile)."""
    cents = F.round(F.col("value") * value_scale, 0).cast("long")
    r = refs.select(
        F.col("id").alias("r_id"), "chrom", "start", "end", cents.alias("c")
    )
    q = queries.select(F.col("id").alias("q_id"), "chrom", "start", "end")
    if two_phase is None:
        # one tiny count job each; the decision must not depend on
        # anything nondeterministic
        two_phase = (queries.count() + refs.count()) > small_threshold

    def sweep(ref_key: str, query_key: str, refs_first_on_tie: bool):
        """Cumulative (sum, count) of refs with ref_key strictly-or-
        equally before query_key, read at each query row."""
        rkind, qkind = (0, 1) if refs_first_on_tie else (1, 0)
        ev_r = r.select(
            "chrom", F.col(ref_key).alias("k"), F.lit(rkind).alias("kind"),
            F.col("r_id").alias("eid"), "c",
        )
        ev_q = q.select(
            "chrom", F.col(query_key).alias("k"), F.lit(qkind).alias("kind"),
            F.col("q_id").alias("eid"), F.lit(None).cast("long").alias("c"),
        )
        ev = ev_r.unionByName(ev_q)
        if not two_phase:
            w = (
                Window.partitionBy("chrom")
                .orderBy("k", "kind", "eid")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            out = ev.select(
                "chrom", "kind", "eid",
                F.sum("c").over(w).alias("cum_c"),
                F.count("c").over(w).alias("cum_n"),
            )
            return out.where(F.col("kind") == qkind).select(
                F.col("eid").alias("q_id"),
                F.coalesce("cum_c", F.lit(0)).alias("cum_c"),
                F.col("cum_n").alias("cum_n"),
            )
        # phase 0: exact per-chrom key range (deterministic, seedless)
        stats = ev.groupBy("chrom").agg(
            F.min(F.col("k").cast("double")).alias("_lo"),
            F.max(F.col("k").cast("double")).alias("_hi"),
        )
        kd = F.col("k").cast("double")
        span = F.greatest(F.col("_hi") - F.col("_lo"), F.lit(1e-12))
        bkt = F.least(
            F.floor((kd - F.col("_lo")) / span * grid), F.lit(grid - 1)
        ).cast("long")
        evb = ev.join(F.broadcast(stats), "chrom").withColumn("_bkt", bkt)
        # phase 1: per-(chrom, bucket) partials — map-side combinable
        partials = evb.groupBy("chrom", "_bkt").agg(
            F.sum("c").alias("_pc"), F.count("c").alias("_pn")
        )
        # phase 2: exclusive cumulative offsets over the partial table
        # (<= grid rows per chrom partition — constant-bounded window,
        # ALLOW: aggregate-state size, not data size)
        wo = (
            Window.partitionBy("chrom")
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = partials.select(
            "chrom",
            "_bkt",
            F.coalesce(F.sum("_pc").over(wo), F.lit(0)).alias("_oc"),
            F.coalesce(F.sum("_pn").over(wo), F.lit(0)).alias("_on"),
        )
        # phase 3: within-bucket running sums + broadcast offsets;
        # bucketing is monotonic in k and ties share a bucket, so the
        # (k, kind, eid) order is the single-window order exactly
        wb = (
            Window.partitionBy("chrom", "_bkt")
            .orderBy("k", "kind", "eid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = evb.join(F.broadcast(offs), ["chrom", "_bkt"]).select(
            "chrom", "kind", "eid",
            (
                F.coalesce(F.sum("c").over(wb), F.lit(0)) + F.col("_oc")
            ).alias("cum_c"),
            (F.count("c").over(wb) + F.col("_on")).alias("cum_n"),
        )
        return out.where(F.col("kind") == qkind).select(
            F.col("eid").alias("q_id"), "cum_c", "cum_n"
        )

    # refs with r.end <= q.start: ref events sort BEFORE the query on ties
    excl_l = sweep("end", "start", refs_first_on_tie=True).select(
        "q_id", F.col("cum_c").alias("l_c"), F.col("cum_n").alias("l_n")
    )
    # refs with r.start < q.end (ties excluded: query sorts first).
    # {r.end <= qs} ⊆ {r.start < qe} for nonempty intervals, so the
    # overlap set is exactly their difference — no totals needed.
    lt_r = sweep("start", "end", refs_first_on_tie=False).select(
        "q_id", F.col("cum_c").alias("lt_c"), F.col("cum_n").alias("lt_n")
    )
    out = (
        excl_l.join(lt_r, "q_id")
        .select(
            "q_id",
            (F.col("lt_c") - F.col("l_c")).alias("sum_c"),
            (F.col("lt_n") - F.col("l_n")).alias("n_overlaps"),
        )
    )
    return out.where(F.col("n_overlaps") > 0).select(
        "q_id",
        F.round(F.col("sum_c").cast("double") / value_scale, 6).alias("sum_value"),
        "n_overlaps",
    )


def interval_overlap_join_binned(
    queries: DataFrame, refs: DataFrame, bin_size: int = 100, salt: int = 8
) -> DataFrame:
    """Scale path: decompose each interval into covering fixed-width
    bins and equi-join on (chrom, bin), so Spark plans a shuffle-hash /
    sort-merge join on real keys instead of a per-chrom quadratic
    nested-loop with post-filter.

    Dedup without a shuffle ("report-bin" trick): an overlapping pair
    meets in every shared covering bin, so it is emitted only from the
    bin containing the overlap start max(q_start, r_start) — exactly
    one bin per pair, hence no ``distinct``.

    Output salting: the join's OUTPUT can be quadratically larger than
    its input (dense bins emit |q|×|r| pairs), which AQE cannot see —
    it sizes reduce partitions by shuffle INPUT bytes and will happily
    coalesce a tiny-input/huge-output join onto one task. Each query
    row therefore carries a deterministic salt in the join key and refs
    are replicated across all ``salt`` values, splitting every bin's
    pair generation across ``salt`` tasks; the explicit
    ``repartition(P, keys)`` pins the partitioning so AQE keeps it.
    A (q, r) pair still meets exactly once per shared bin (q has one
    salt value), so the report-bin dedup is unchanged.

    ``salt=1`` short-circuits the scheme entirely (no ref replication,
    no salt join key): callers with a large ref side — where the 8×
    ref shuffle volume costs more than the AQE-collapse risk it guards
    against — opt out explicitly.

    Returns the same rows as :func:`interval_overlap_join`."""
    def binned(df: DataFrame, prefix: str) -> DataFrame:
        b0 = F.floor(F.col(f"{prefix}_start") / bin_size)
        b1 = F.floor((F.col(f"{prefix}_end") - F.lit(1e-9)) / bin_size)
        return df.withColumn("bin", F.explode(F.sequence(b0.cast("long"), b1.cast("long"))))

    q = binned(
        queries.select(
            F.col("id").alias("q_id"), F.col("chrom").alias("q_chrom"),
            F.col("start").alias("q_start"), F.col("end").alias("q_end"),
        ),
        "q",
    )
    r = binned(
        refs.select(
            F.col("id").alias("r_id"), F.col("chrom").alias("r_chrom"),
            F.col("start").alias("r_start"), F.col("end").alias("r_end"),
            F.col("value").alias("r_value"),
        ),
        "r",
    )
    # P scales with the cluster (local[32] → 32; a 1000-executor
    # cluster → its core count); huge inputs never reach the AQE
    # 1-task collapse this guards against, so P only has to beat it
    # on small inputs.
    p = queries.sparkSession.sparkContext.defaultParallelism
    if salt > 1:
        q = q.withColumn("_salt", F.pmod(F.xxhash64(F.col("q_id")), F.lit(salt)))
        r = r.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long"))
            ),
        )
        q = q.repartition(p, "q_chrom", "bin", "_salt")
        r = r.repartition(p, "r_chrom", "bin", "_salt")
    else:
        q = q.repartition(p, "q_chrom", "bin")
        r = r.repartition(p, "r_chrom", "bin")
    cond = (F.col("q_chrom") == F.col("r_chrom")) & (q["bin"] == r["bin"])
    if salt > 1:
        cond = cond & (q["_salt"] == r["_salt"])
    report_bin = F.floor(F.greatest("q_start", "r_start") / bin_size).cast("long")
    joined = (
        q.join(r, cond, "inner")
        .where((F.col("q_start") < F.col("r_end")) & (F.col("q_end") > F.col("r_start")))
        .where(q["bin"] == report_bin)
    )
    return joined.select(
        "q_id", "q_chrom", "q_start", "q_end", "r_id", "r_chrom", "r_start", "r_end", "r_value"
    )


def genome_bin_counts(intervals: DataFrame, bin_size: float = 50.0) -> DataFrame:
    """Fixed-bin midpoint assignment (``writers.py:1370-1387``):
    bin = floor(midpoint / bin_size), then per-(chrom, bin) count+sum —
    a pure-expression equi-group, no range join needed."""
    mid = F.col("start") + (F.col("end") - F.col("start")) / 2
    return (
        intervals.withColumn("bin", F.floor(mid / F.lit(bin_size)).cast("long"))
        .groupBy("chrom", "bin")
        .agg(F.count("*").alias("n"), F.sum("value").cast("double").alias("sum_value"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_col: str = "user_id",
    order_col: str = "ts",
    id_col: str = "event_id",
    right_value_col: str = "value",
) -> DataFrame:
    """As-of join: each left row matched to the most recent right row
    (right.order <= left.order) within the partition key. Not in the
    reference (SURVEY.md §2.4 notes no as-of joins); added for the
    event-pipeline extension.

    Spark-first shape: NO join at all — tag both sides, union, and
    carry the last right row forward with an ignore-nulls last() over
    (partition ORDER BY order, kind, id). One shuffle on the partition
    key, linear, skew-tolerant; ties at equal order resolve
    right-before-left, then by id (deterministic).

    Returns (left id, partition, order, matched right id, right value)."""
    r = right.select(
        F.col(partition_col).alias("_p"),
        F.col(order_col).alias("_o"),
        F.lit(0).alias("_kind"),
        F.col(id_col).alias("_id"),
        F.col(right_value_col).alias("_rv"),
    )
    l = left.select(
        F.col(partition_col).alias("_p"),
        F.col(order_col).alias("_o"),
        F.lit(1).alias("_kind"),
        F.col(id_col).alias("_id"),
        F.lit(None).cast("double").alias("_rv"),
    )
    w = (
        Window.partitionBy("_p")
        .orderBy("_o", "_kind", "_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).select(
        "_p",
        "_o",
        "_kind",
        "_id",
        F.last(F.when(F.col("_kind") == 0, F.col("_id")), ignorenulls=True)
        .over(w)
        .alias("match_id"),
        F.last(F.when(F.col("_kind") == 0, F.col("_rv")), ignorenulls=True)
        .over(w)
        .alias("match_value"),
    )
    return carried.where(F.col("_kind") == 1).select(
        F.col("_id").alias(id_col),
        F.col("_p").alias(partition_col),
        F.col("_o").alias(order_col),
        "match_id",
        "match_value",
    )


def align_features(
    s_feats: DataFrame,
    t_feats: DataFrame,
    exclude_missing: bool = False,
    fill_value: float = 1.0,
) -> DataFrame:
    """Feature alignment for cross-dataset mapping
    (``mapping_utils.py:98-214``): equi-join on ids; left-outer with
    fill when keeping missing features, inner otherwise."""
    how = "inner" if exclude_missing else "left_outer"
    t = t_feats.select("ids", F.col("value").alias("t_value"))
    out = s_feats.select("ids", F.col("value").alias("s_value")).join(
        F.broadcast(t), "ids", how
    )
    return out.withColumn("t_value", F.coalesce("t_value", F.lit(fill_value)))
