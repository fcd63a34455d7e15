"""Highly-variable-gene selection (``scarf/assay.py:945-1074``
mark_hvgs + ``assay.py:899-942`` set_summary_stats).

The reference fits a lowess of log-variance vs log-mean over mean-bins
(``feat_utils.py:11-45``) and selects by corrected variance. Without a
lowess dependency we use the same family of trend correction,
deterministically and fully relationally: ntile-bin features by mean,
trend = per-bin median of log-variance, corrected variance = residual
log-variance. Conjunctive thresholds + top-n exactly as the reference
(``assay.py:1023-1060``), including the blacklist regex exclusion.
Every step is a window/agg expression → runs distributed and verifies
against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def feature_mean_var(counts: DataFrame, n_cells: int) -> DataFrame:
    """Dense-semantics per-feature mean and variance over N cells from
    the sparse COO (absent rows are zeros)."""
    n = F.lit(float(n_cells))
    agg = counts.groupBy("feat_id").agg(
        F.sum("value").cast("double").alias("tot"),
        F.sum(F.col("value") * F.col("value")).cast("double").alias("tot_sq"),
    )
    return agg.select(
        "feat_id",
        (F.col("tot") / n).alias("mean"),
        (F.col("tot_sq") / n - (F.col("tot") / n) * (F.col("tot") / n)).alias("variance"),
    )


def mark_hvgs_binned(
    counts: DataFrame,
    n_cells: int,
    n_bins: int = 20,
    top_n: int = 100,
    min_mean: float = 0.0,
    blacklist: DataFrame | None = None,
) -> DataFrame:
    """Binned-trend HVG selection. Returns
    (feat_id, mean, variance, bin, c_var, hvg_rank) for the top_n
    features by corrected variance, mean-threshold and blacklist
    applied first."""
    mv = feature_mean_var(counts, n_cells).where(
        (F.col("mean") > min_mean) & (F.col("variance") > 0)
    )
    if blacklist is not None:
        mv = mv.join(F.broadcast(blacklist.select("feat_id")), "feat_id", "left_anti")
    from scarf_spark.operators.windows import global_ntile

    # persist the (feature-sized) stats table: global_ntile issues two
    # small driver jobs over it, which would otherwise re-run the full
    # fact-table aggregation three times
    mv = mv.localCheckpoint(eager=False)
    binned = global_ntile(mv, ["mean", "feat_id"], n_bins)
    trend = binned.groupBy("bin").agg(F.median(F.log("variance")).alias("trend"))
    corrected = (
        binned.join(F.broadcast(trend), "bin")
        .withColumn("c_var", F.round(F.log("variance") - F.col("trend"), 6))
    )
    # distributed top-n (TakeOrderedAndProject), then rank the ≤ top_n
    # survivors — the only global window runs over a constant-size set
    wr = Window.orderBy(F.col("c_var").desc(), F.col("feat_id"))
    return (
        corrected.orderBy(F.col("c_var").desc(), F.col("feat_id"))
        .limit(top_n)
        .withColumn("hvg_rank", F.row_number().over(wr))
        .select(
            "feat_id",
            F.round("mean", 6).alias("mean"),
            F.round("variance", 6).alias("variance"),
            "bin",
            "c_var",
            "hvg_rank",
        )
    )
