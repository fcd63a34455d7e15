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

from pyspark.sql import DataFrame, Window
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

    cell_groups: (cell_id, group) — broadcast."""
    sizes = cell_groups.groupBy(group_col).agg(F.count("*").alias("_gn"))
    joined = counts.join(F.broadcast(cell_groups), "cell_id")
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
        counts.join(F.broadcast(reps), "cell_id")
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
        counts.join(F.broadcast(cell_groups), "cell_id")
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
