"""Normalization kernels (SURVEY.md §2.10 first block).

Reference semantics: library-size normalization ``sf * x / row_sum``
with optional log1p (``scarf/assay.py:41-64``), subset renormalization
(``assay.py:780-828``: row sums over the selected features only,
zero-sum rows → 1), CLR (``assay.py:67-78``), TF-IDF (``assay.py:81-94``),
z-scaling (``assay.py:659-660``).

Shape: every normalization is (one hash agg for the per-cell or
per-feature denominator) ⋈ (the fact table) → expression. The join is on
the same key as the agg, so with AQE the shuffle output of the agg is
reused and the fact table shuffles once; denominator tables are tiny
(|cells| or |feats| rows) and broadcast when under the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def norm_lib_size(counts: DataFrame, sf: float = 1000.0, log: bool = False,
                  out: str = "norm_value") -> DataFrame:
    """sf * value / cell_total, optionally log1p (``assay.py:41-64``)."""
    totals = counts.groupBy("cell_id").agg(F.sum("value").alias("_tot"))
    expr = F.lit(sf) * F.col("value") / F.col("_tot")
    if log:
        expr = F.log1p(expr)
    return (
        counts.join(totals, "cell_id")
        .select("cell_id", "feat_id", F.round(expr, 6).alias(out))
    )


def renormalize_subset(counts: DataFrame, sel_feats: DataFrame, sf: float = 1000.0,
                       out: str = "norm_value") -> DataFrame:
    """Library-size normalization where row sums run over the selected
    feature subset only; cells whose subset-sum is 0 get divisor 1
    (``assay.py:818-825``). Selection is a broadcast semi-join pushed
    below the arithmetic — the same pushdown the reference hand-codes by
    fancy-indexing the Dask array first (``assay.py:810-814``)."""
    sub = counts.join(F.broadcast(sel_feats.select("feat_id")), "feat_id", "left_semi")
    totals = sub.groupBy("cell_id").agg(F.sum("value").alias("_tot"))
    expr = F.lit(sf) * F.col("value") / F.when(F.col("_tot") != 0, F.col("_tot")).otherwise(1.0)
    return (
        sub.join(totals, "cell_id")
        .select("cell_id", "feat_id", F.round(expr, 6).alias(out))
    )


def norm_clr(counts: DataFrame, n_cells: int, out: str = "norm_value") -> DataFrame:
    """Centered-log-ratio: log1p(x / geo_mean_feature), geometric mean
    over ALL cells incl. absent zeros (``assay.py:67-78``); see
    qc.clr_geo_mean for the dense-mean identity."""
    geo = counts.groupBy("feat_id").agg(
        F.exp(F.sum(F.log1p("value")) / F.lit(float(n_cells))).alias("_geo")
    )
    return (
        counts.join(geo, "feat_id")
        .select(
            "cell_id", "feat_id",
            F.round(F.log1p(F.col("value") / F.col("_geo")), 6).alias(out),
        )
    )


def norm_tf_idf(
    counts: DataFrame, n_cells: int, out: str = "norm_value", rounded: bool = True
) -> DataFrame:
    """TF-IDF (``assay.py:81-94``): tf = x / row_sum;
    idf = log2(1 + N / (doc_freq + 1)); value = tf * idf.

    Two independent single-key aggs (per-cell row sum, per-feature doc
    freq) joined back — the per-feature table broadcasts.
    ``rounded=False`` keeps full precision for downstream consumers
    that aggregate further (prevalence, LSI) and round at the end."""
    row_tot = counts.groupBy("cell_id").agg(F.sum("value").alias("_tot"))
    doc_freq = counts.groupBy("feat_id").agg(
        F.count(F.when(F.col("value") > 0, 1)).alias("_df")
    )
    tf = F.col("value") / F.col("_tot")
    idf = F.log2(F.lit(1.0) + F.lit(float(n_cells)) / (F.col("_df") + F.lit(1.0)))
    val = F.round(tf * idf, 6) if rounded else (tf * idf)
    return (
        counts.join(row_tot, "cell_id")
        .join(F.broadcast(doc_freq), "feat_id")
        .select("cell_id", "feat_id", val.alias(out))
    )


def zscale_per_feature(df: DataFrame, value_col: str = "value",
                       out: str = "z") -> DataFrame:
    """(x - mean)/std per feature over the PRESENT rows
    (``assay.py:659-660``, ``ann.py:191-192``). Pre-agg + broadcast join
    rather than a window: a window over feat_id would shuffle the full
    fact table into per-feature sorted partitions; the agg shuffles only
    aggregate state."""
    stats = df.groupBy("feat_id").agg(
        F.avg(value_col).alias("_mu"), F.stddev_samp(value_col).alias("_sd")
    )
    z = F.when(F.col("_sd") != 0, (F.col(value_col) - F.col("_mu")) / F.col("_sd")).otherwise(0.0)
    return (
        df.join(F.broadcast(stats), "feat_id")
        .select("cell_id", "feat_id", F.round(z, 6).alias(out))
    )


def norm_pearson_residual(
    counts: DataFrame, theta: float = 100.0, out: str = "residual"
) -> DataFrame:
    """Analytic Pearson residuals (Lause/Berens/Kobak, Genome Biology
    2021 — the modern replacement for log-library normalization in
    scRNA pipelines; the reference's CLR/TF-IDF sit in the same slot):

        mu_cg = n_c * f_g / N
        r_cg  = (x_cg - mu_cg) / sqrt(mu_cg + mu_cg^2 / theta)

    computed for the STORED (nonzero) entries of the sparse COO —
    absent entries' residuals are a deterministic function of (c, g)
    alone and are materialized only by densifying consumers, same
    convention as the reference's sparse normalizations.

    Plan: two dimension-sized aggregates (cell totals, feature totals —
    one shuffle of state each), grand total from the feature totals,
    joined back to the fact table. The feature-total join is
    hint-broadcast (features are domain-bounded); the CELL-total join
    is a plain equi-join — cell_tot is one row per cell, so a forced
    broadcast outgrows limits at scale; AQE still broadcasts it when
    genuinely small."""
    cell_tot = counts.groupBy("cell_id").agg(F.sum("value").alias("_nc"))
    feat_tot = counts.groupBy("feat_id").agg(F.sum("value").alias("_fg"))
    grand = feat_tot.agg(F.sum("_fg").alias("_N"))
    mu = F.col("_nc") * F.col("_fg") / F.col("_N")
    r = (F.col("value") - mu) / F.sqrt(mu + mu * mu / F.lit(theta))
    return (
        counts.join(cell_tot, "cell_id")
        .join(F.broadcast(feat_tot), "feat_id")
        .crossJoin(F.broadcast(grand))
        .select("cell_id", "feat_id", F.round(r, 6).alias(out))
    )


def norm_quantile(counts: DataFrame, out: str = "qnorm") -> DataFrame:
    """Quantile normalization (limma-style) over the stored entries:
    rank values within each cell (deterministic (value, feat_id)
    order), average the value at each rank across cells, then give
    every entry the mean of its rank — after this, every cell has an
    identical value distribution.

    Plan: one per-cell ranking window (shuffle keyed by cell — bounded
    by the largest cell), one rank-keyed aggregate whose state is
    |ranks| rows (= max nnz per cell), broadcast the tiny rank→mean map
    back. The fact table is shuffled once; the rank table is
    dimension-sized."""
    w = Window.partitionBy("cell_id").orderBy(F.col("value"), F.col("feat_id"))
    ranked = counts.select(
        "cell_id", "feat_id", "value", F.row_number().over(w).alias("_rk")
    )
    rank_means = ranked.groupBy("_rk").agg(
        (F.sum("value") / F.count("*")).alias("_rm")
    )
    return (
        ranked.join(F.broadcast(rank_means), "_rk")
        .select("cell_id", "feat_id", F.round(F.col("_rm"), 6).alias(out))
    )


def size_factors_mor(counts: DataFrame, out: str = "size_factor") -> DataFrame:
    """Median-of-ratios size factors (DESeq2's estimateSizeFactors —
    the cross-sample normalization standard in count-based genomics;
    sits beside the library-size factor the reference uses,
    ``scarf/assay.py:41-64``): per feature a geometric mean across
    cells (over present rows), per (cell, feature) the ratio
    value/geomean, per cell the exact median ratio.

    Three dimension-keyed aggregates: avg-of-logs per feature
    (broadcast back), then Spark's exact ``percentile`` per cell — the
    same shapes as the QC aggregates, no fact-table reshuffle beyond
    the per-cell median."""
    geo = counts.groupBy("feat_id").agg(F.avg(F.log("value")).alias("_lg"))
    ratio = (
        counts.join(F.broadcast(geo), "feat_id")
        .select("cell_id", (F.col("value") / F.exp(F.col("_lg"))).alias("_r"))
    )
    return ratio.groupBy("cell_id").agg(
        F.round(F.expr("percentile(_r, 0.5)"), 6).alias(out)
    )


def robust_scale_per_feature(
    counts: DataFrame, out: str = "robust_value"
) -> DataFrame:
    """Median/IQR scaling per feature: (x − median) / IQR over the
    feature's present values — the outlier-insensitive sibling of
    z-scaling (``assay.py:659-660``), standard for heavy-tailed counts.
    IQR = 0 collapses the feature to 0.0 (constant features carry no
    signal either way).

    One exact-percentile aggregate per feature (feature-keyed shuffle of
    aggregate state only), broadcast back; the scale expression is a
    projection with a pinned op shape (round the quantiles, then one
    subtraction and one division) the oracle mirrors."""
    med = counts.groupBy("feat_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("_med"),
        F.round(
            F.expr("percentile(value, 0.75)") - F.expr("percentile(value, 0.25)"), 6
        ).alias("_iqr"),
    )
    return (
        counts.join(F.broadcast(med), "feat_id")
        .select(
            "cell_id",
            "feat_id",
            F.round(
                F.when(
                    F.col("_iqr") != 0,
                    (F.col("value") - F.col("_med")) / F.col("_iqr"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(out),
        )
    )
