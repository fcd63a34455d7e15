"""Dimensionality reduction (``scarf/ann.py:55-346`` AnnStream).

Reference: streaming IncrementalPCA / gensim LSI over chunks with
z-scaling, then a reducer applied chunkwise
(``ann.py:129-162``). Spark-first shape: MLlib's distributed PCA on
assembled vectors (z-scaled via StandardScaler semantics), with the
loadings broadcast back for the projection step — the projection is
embarrassingly parallel exactly like the reference's per-chunk matmul.

The reference discards one extra fitted component (``ann.py:212-214``)
and optionally drops the first LSI component (depth, ``ann.py:286``);
both are slicing options here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_vectors(
    counts: DataFrame, feat_ids: list[int], value_col: str = "value"
) -> DataFrame:
    """Dense per-cell vectors over an ordered feature subset (the HVG
    set): COO → (cell_id, array<double>), absent features zero-filled.
    One groupBy with map_from_entries + per-slot lookup — no pivot, no
    Python."""
    sel = counts.where(F.col("feat_id").isin([int(f) for f in feat_ids]))
    m = sel.groupBy("cell_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("feat_id"), F.col(value_col).cast("double")))
        ).alias("_m")
    )
    vec = F.array(*[
        F.coalesce(F.col("_m").getItem(int(f)), F.lit(0.0)) for f in feat_ids
    ])
    return m.select("cell_id", vec.alias("v"))


def zscore_vectors(cells_vec: DataFrame) -> DataFrame:
    """Column-wise z-scaling of assembled vectors (``ann.py:191-192``),
    computed from two array-aggregates (elementwise sum / sumsq via
    zip_with folds) broadcast back — no per-column shuffle."""
    dim_df = cells_vec.select(F.size("v").alias("d")).limit(1)
    d = dim_df.collect()[0]["d"]
    stats = cells_vec.agg(
        F.count("*").alias("n"),
        *[F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(d)],
        *[F.sum(F.col("v")[i] * F.col("v")[i]).alias(f"q{i}") for i in range(d)],
    )
    r = stats.collect()[0]
    n = float(r["n"])
    mu = [r[f"s{i}"] / n for i in range(d)]
    sd = [max((r[f"q{i}"] / n - mu[i] ** 2), 1e-12) ** 0.5 for i in range(d)]
    z = F.array(*[(F.col("v")[i] - F.lit(mu[i])) / F.lit(sd[i]) for i in range(d)])
    return cells_vec.select("cell_id", z.alias("v"))


def pca_fit(cells_vec: DataFrame, k: int = 5, drop_first: bool = False):
    """Distributed PCA via the Gram matrix: X'X is a d×d aggregate
    (one pass, d = |HVG| is small by construction), eigendecomposed on
    the driver with numpy — deterministic, no MLlib RNG. Returns
    (loadings ndarray d×k, explained_variance list).

    drop_first mirrors the reference's LSI skip-first
    (``ann.py:286``)."""
    import numpy as np

    d = cells_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    gram_cols = []
    for i in range(d):
        for j in range(i, d):
            gram_cols.append(F.sum(F.col("v")[i] * F.col("v")[j]).alias(f"g_{i}_{j}"))
    row = cells_vec.agg(F.count("*").alias("n"), *gram_cols).collect()[0]
    n = row["n"]
    g = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            g[i, j] = g[j, i] = row[f"g_{i}_{j}"]
    cov = g / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    lo = 1 if drop_first else 0
    idx = order[lo : lo + k]
    loadings = evecs[:, idx]
    # deterministic sign convention: largest-|component| entry positive
    for c in range(loadings.shape[1]):
        m = np.argmax(np.abs(loadings[:, c]))
        if loadings[m, c] < 0:
            loadings[:, c] = -loadings[:, c]
    return loadings, [float(evals[i]) for i in idx]


def lsi_fit(cells_vec: DataFrame, k: int = 5, skip_first: bool = True):
    """LSI (``ann.py:258-288``): truncated SVD of the (TF-IDF
    normalized, un-centered) matrix. The right singular vectors of X
    are the eigenvectors of the Gram matrix X'X, so this is the same
    one-pass Gram aggregate as :func:`pca_fit` on un-scaled vectors;
    ``skip_first`` drops the depth component exactly like the
    reference's ``lsi_skip_first``."""
    return pca_fit(cells_vec, k=k, drop_first=skip_first)


def pca_transform(cells_vec: DataFrame, loadings) -> DataFrame:
    """Apply broadcast loadings: reduced = v · L, one arithmetic
    expression per output dim — the embarrassingly-parallel projection
    of ``ann.py:129-162``."""
    d, k = loadings.shape
    cols = [
        sum(F.col("v")[i] * float(loadings[i, c]) for i in range(d)).alias(f"pc{c + 1}")
        for c in range(k)
    ]
    return cells_vec.select("cell_id", *cols)
