"""2-D embedding of the cell graph (``scarf/umap.py``,
``scarf/datastore/graph_datastore.py:1218-1377``).

Split exactly along the reference's own boundary (SURVEY.md §7 "hard
parts"): the *graph-sized* math (fuzzy-simplicial-set symmetrization,
kmeans-PCA initial coordinates) is distributed DataFrame work; the
sequential SGD layout runs driver-side over the collected (n·k)-row
edge list — the same envelope the reference accepts for umap-learn —
with a deterministic seeded numpy loop standing in for
``optimize_layout_euclidean`` (``scarf/umap.py:93-115``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize_edges(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """Fuzzy simplicial set symmetrization ``g + gᵀ − g ∘ gᵀ``
    (``scarf/umap.py:118-123``): a full outer self-join of the edge
    list against its transpose; probabilities combine as
    w = a + b − a·b. One shuffle on (src, dst)."""
    a = edges.select("src", "dst", F.col(weight_col).alias("wa"))
    b = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col(weight_col).alias("wb")
    )
    return (
        a.join(b, ["src", "dst"], "full_outer")
        .select(
            "src",
            "dst",
            F.round(
                F.coalesce("wa", F.lit(0.0))
                + F.coalesce("wb", F.lit(0.0))
                - F.coalesce("wa", F.lit(0.0)) * F.coalesce("wb", F.lit(0.0)),
                6,
            ).alias("weight"),
        )
    )


def ini_embed_kmeans_pca(
    cells_vec: DataFrame, n_centroids: int = 100, seed: int = 4466
) -> DataFrame:
    """Initial 2-D coordinates (``graph_datastore.py:427-457``
    _get_ini_embed): KMeans centroids (distributed, seeded), PCA(2) of
    the tiny k×d centroid matrix on the driver, coordinates broadcast
    back to cells by their cluster label."""
    import numpy as np

    from scarf_spark.ml.cluster import kmeans_mllib

    km = kmeans_mllib(cells_vec, k=n_centroids, seed=seed)
    joined = cells_vec.join(km, "cell_id")
    d = cells_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    cent = (
        joined.groupBy("cluster")
        .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(d)])
        .collect()
    )
    labels = [r["cluster"] for r in cent]
    M = np.array([[r[f"m{i}"] for i in range(d)] for r in cent])
    Mc = M - M.mean(axis=0)
    cov = Mc.T @ Mc / max(len(labels) - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    L = evecs[:, order]
    for c in range(2):  # deterministic sign
        m = int(np.argmax(np.abs(L[:, c])))
        if L[m, c] < 0:
            L[:, c] = -L[:, c]
    xy = Mc @ L
    # rescale to [-1, 1] like the reference's rescaled centroid init
    xy = xy / max(np.abs(xy).max(), 1e-12)
    spark = cells_vec.sparkSession
    coords = spark.createDataFrame(
        [(int(l), float(x), float(y)) for l, (x, y) in zip(labels, xy)],
        ["cluster", "ix", "iy"],
    )
    return joined.select("cell_id", "cluster").join(
        F.broadcast(coords), "cluster"
    ).select("cell_id", "ix", "iy")


def umap_layout_driver(
    edges: DataFrame,
    init: DataFrame,
    n_epochs: int = 50,
    learning_rate: float = 1.0,
    neg_samples: int = 3,
    seed: int = 4466,
) -> DataFrame:
    """driver_compute: seeded SGD layout over the collected graph —
    attraction along weighted edges, repulsion against sampled
    non-neighbors (the ``optimize_layout_euclidean`` contract,
    ``scarf/umap.py:15-164``, reimplemented as a compact deterministic
    numpy loop; the reference itself collects the graph and warns that
    parallel SGD is non-reproducible — this version is single-threaded
    and exactly reproducible).

    edges: (src, dst, weight); init: (cell_id, ix, iy).
    Returns (cell_id, umap1, umap2)."""
    import numpy as np

    e_rows = edges.select("src", "dst", "weight").collect()
    i_rows = init.select("cell_id", "ix", "iy").collect()
    ids = sorted({r["cell_id"] for r in i_rows})
    idx = {n: i for i, n in enumerate(ids)}
    pos = np.zeros((len(ids), 2))
    for r in i_rows:
        pos[idx[r["cell_id"]]] = (r["ix"], r["iy"])
    src = np.array([idx[r["src"]] for r in e_rows if r["src"] in idx])
    dst = np.array([idx[r["dst"]] for r in e_rows if r["src"] in idx])
    w = np.array([r["weight"] for r in e_rows if r["src"] in idx], dtype=float)
    rng = np.random.default_rng(seed)
    n = len(ids)
    for epoch in range(n_epochs):
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        d = pos[src] - pos[dst]
        dist2 = (d * d).sum(axis=1) + 1e-3
        attr = (-2.0 * w / (1.0 + dist2))[:, None] * d
        np.add.at(pos, src, alpha * attr)
        np.add.at(pos, dst, -alpha * attr)
        neg = rng.integers(0, n, size=(len(src), neg_samples))
        for j in range(neg_samples):
            dn = pos[src] - pos[neg[:, j]]
            dist2n = (dn * dn).sum(axis=1) + 1e-3
            rep = (2.0 / ((1.0 + dist2n) * dist2n))[:, None] * dn
            np.add.at(pos, src, alpha * np.clip(rep, -4, 4))
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(nid), round(float(pos[i, 0]), 6), round(float(pos[i, 1]), 6))
         for nid, i in idx.items()],
        ["cell_id", "umap1", "umap2"],
    )
