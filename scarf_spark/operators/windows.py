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


def ntile_bin_agg(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pseudotime binning (``assay.py:643-665``): order rows globally,
    split into n_bins equal-count bins, aggregate per bin.

    NOTE: a global ntile is a single-partition sort — fine for the
    cell-table sizes this is used on (≤ millions of rows); for a 100 TB
    fact table use repartitionByRange + per-range ntile instead."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
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
    stable."""
    order = [F.col(stat_col).desc() if desc else F.col(stat_col).asc(), F.col(tiebreak_col)]
    w = Window.orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n).drop("_rn")


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
