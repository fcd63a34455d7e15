"""Multi-modality / multi-batch integration (SURVEY.md §2.10).

* WNN — weighted-nearest-neighbor blending of two modality graphs
  (``scarf/knn_utils.py:277-354``): per-cell modality weights from
  within-modality affinities, blended edge weights, re-ranked top-k.
  Pure joins + window functions — fully relational, oracle-checkable.
* CORAL — covariance alignment of a source feature space to a target
  (``scarf/mapping_utils.py:15-95``): two d×d Gram aggregates, the
  fractional matrix powers on the driver (d×d is tiny), the transform
  broadcast back as expressions.
* harmony_lite — soft-kmeans batch correction on the latent space
  (``scarf/harmony.py:10-322``): distributed E/M with per-(cluster,
  batch) offset subtraction; deterministic seeding. The reference
  ports harmonypy (single-node); here every pass is a DataFrame agg
  so it scales with executors, with only k×d centroids on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _affinity(dist_col: str = "distance"):
    return 1.0 / (1.0 + F.col(dist_col))


def wnn_blend(
    edges_a: DataFrame, edges_b: DataFrame, k: int = 5
) -> DataFrame:
    """Blend two KNN graphs over the same nodes into one weighted
    graph. Steps (each one shuffle):

    1. per-node within-modality affinity = mean(1/(1+distance)) over
       the node's edges in each graph;
    2. modality weight w_a = aff_a / (aff_a + aff_b) (per node);
    3. candidate edges = full outer union of both graphs' (src, dst)
       with missing-side affinity 0; blended = w_a·aff_a + w_b·aff_b;
    4. top-k per src by blended weight (ties → smaller dst).

    Returns (src, rank, dst, weight[rounded 6])."""
    # each edge table is consumed twice (affinity agg + candidate join);
    # persist so an expensive upstream (a full KNN build) runs once
    edges_a = edges_a.persist()
    edges_b = edges_b.persist()
    aff_a = edges_a.groupBy("src").agg(F.avg(_affinity()).alias("aff_a"))
    aff_b = edges_b.groupBy("src").agg(F.avg(_affinity()).alias("aff_b"))
    wts = aff_a.join(aff_b, "src", "full_outer").select(
        "src",
        (
            F.coalesce("aff_a", F.lit(0.0))
            / (F.coalesce("aff_a", F.lit(0.0)) + F.coalesce("aff_b", F.lit(0.0)))
        ).alias("w_a"),
    )
    ea = edges_a.select("src", "dst", _affinity().alias("sim_a"))
    eb = edges_b.select("src", "dst", _affinity().alias("sim_b"))
    cand = ea.join(eb, ["src", "dst"], "full_outer").select(
        "src",
        "dst",
        F.coalesce("sim_a", F.lit(0.0)).alias("sim_a"),
        F.coalesce("sim_b", F.lit(0.0)).alias("sim_b"),
    )
    blended = cand.join(wts, "src").select(
        "src",
        "dst",
        (F.col("w_a") * F.col("sim_a") + (1 - F.col("w_a")) * F.col("sim_b")).alias(
            "blend"
        ),
    )
    w = Window.partitionBy("src").orderBy(F.desc("blend"), "dst")
    return (
        blended.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "rank", "dst", F.round("blend", 6).alias("weight"))
    )


def _gram(vec_df: DataFrame, d: int):
    """d×d covariance via one aggregate pass (upper triangle)."""
    import numpy as np

    cols = [F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(d)]
    for i in range(d):
        for j in range(i, d):
            cols.append(F.avg(F.col("v")[i] * F.col("v")[j]).alias(f"g{i}_{j}"))
    row = vec_df.agg(*cols).collect()[0]
    mu = np.array([row[f"m{i}"] for i in range(d)])
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cov[i, j] = cov[j, i] = row[f"g{i}_{j}"] - mu[i] * mu[j]
    return mu, cov


def _mat_pow(cov, power: float, eps: float = 1e-9):
    """Spectral fractional power via the deterministic Jacobi solver
    (``reduction.jacobi_eigh``). V·f(Λ)·Vᵀ is basis- and
    order-invariant, so the SQL oracle's replay needs no sign or
    ordering convention — only the same clamp and exponent."""
    import numpy as np

    from scarf_spark.ml.reduction import jacobi_eigh

    evals, evecs = jacobi_eigh([list(map(float, row)) for row in cov])
    v = np.array(evecs)
    w = np.maximum(np.array(evals), eps)
    return v @ np.diag(w**power) @ v.T


def coral_align(source_vec: DataFrame, target_vec: DataFrame) -> DataFrame:
    """CORAL domain adaptation (``scarf/mapping_utils.py:15-95``):
    whiten the source with Cs^(-1/2), re-color with Ct^(1/2). The two
    covariance estimates are single-pass aggregates; the d×d fractional
    powers run on the driver; the per-cell transform is a broadcast
    matmul expressed as plain arithmetic (embarrassingly parallel)."""
    d = source_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    mu_s, cov_s = _gram(source_vec, d)
    _mu_t, cov_t = _gram(target_vec, d)
    A = _mat_pow(cov_s, -0.5) @ _mat_pow(cov_t, 0.5)
    out_cols = [
        sum(
            (F.col("v")[i] - float(mu_s[i])) * float(A[i, j]) for i in range(d)
        ).alias(f"c{j}")
        for j in range(d)
    ]
    return source_vec.select("cell_id", F.array(*out_cols).alias("v"))


def harmony_lite(
    cells_vec: DataFrame,
    batch_df: DataFrame,
    n_clusters: int = 4,
    n_iter: int = 2,
    sigma: float | None = None,
) -> DataFrame:
    """Batch-correct the latent space: diversity-penalized soft-kmeans
    assignment (the LISI penalty of ``scarf/harmony.py:10-322`` —
    without it, clusters collapse onto batches and the correction
    cancels to zero), then subtract each cell's expected (cluster,
    batch) offset — the ridge step of ``harmony.py:313-322`` reduced
    to its first-order form. Deterministic: centroids seed from the
    lowest cell_ids.

    cells_vec: (cell_id, v array<double>); batch_df: (cell_id, batch).
    Returns corrected (cell_id, v)."""
    import numpy as np

    d = cells_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    df = cells_vec.join(batch_df, "cell_id").persist()
    seeds = df.orderBy("cell_id").limit(n_clusters).collect()
    centroids = np.array([r["v"] for r in seeds], dtype=float)
    eps = 1e-9
    for _ in range(n_iter):
        # E-step: soft assignment (k small -> k literal expressions).
        # dist2 is shifted by its per-cell min so exp never underflows.
        dist2 = [
            sum((F.col("v")[i] - float(centroids[c, i])) ** 2 for i in range(d))
            for c in range(n_clusters)
        ]
        dmin = F.least(*dist2)
        if sigma is None:
            # auto bandwidth: a fraction of the mean excess distance so
            # assignments stay soft at any data scale (a fixed sigma
            # underflows exp() to hard 0/1 when distances are large)
            spread = df.agg(
                F.avg(sum(dist2) / n_clusters - dmin).alias("s")
            ).collect()[0]["s"]
            sig = max(0.3 * float(spread), 1e-6)
        else:
            sig = sigma
        num = [F.exp(-(dc - dmin) / sig) for dc in dist2]
        den = sum(num)
        r_cols = [(n / den).alias(f"r{c}") for c, n in enumerate(num)]
        soft0 = df.select("cell_id", "v", "batch", *r_cols)
        # diversity penalty (harmony's theta term, theta=1): scale each
        # cluster's affinity by expected/observed batch mass so a
        # cluster cannot absorb one batch exclusively
        obs_rows = soft0.groupBy("batch").agg(
            *[F.sum(f"r{c}").alias(f"o{c}") for c in range(n_clusters)],
            F.count("*").alias("nb"),
        ).collect()
        n_total = sum(r["nb"] for r in obs_rows)
        clus_mass = {
            c: sum(r[f"o{c}"] for r in obs_rows) for c in range(n_clusters)
        }
        pen = {
            (c, r["batch"]): (clus_mass[c] * r["nb"] / n_total + eps)
            / (r[f"o{c}"] + eps)
            for r in obs_rows
            for c in range(n_clusters)
        }
        pnum = []
        for c, n in enumerate(num):
            f = None
            for (pc, b), val in pen.items():
                if pc != c:
                    continue
                w = F.when(F.col("batch") == b, float(val))
                f = w if f is None else f.when(F.col("batch") == b, float(val))
            pnum.append(n * F.coalesce(f, F.lit(1.0)))
        pden = sum(pnum)
        r_cols = [(n / pden).alias(f"r{c}") for c, n in enumerate(pnum)]
        soft = df.select("cell_id", "v", "batch", *r_cols)
        # M-step: weighted centroids (k*d aggregate columns)
        aggs = []
        for c in range(n_clusters):
            aggs.append(F.sum(F.col(f"r{c}")).alias(f"n{c}"))
            for i in range(d):
                aggs.append(
                    F.sum(F.col(f"r{c}") * F.col("v")[i]).alias(f"s{c}_{i}")
                )
        row = soft.agg(*aggs).collect()[0]
        centroids = np.array(
            [
                [row[f"s{c}_{i}"] / max(row[f"n{c}"], 1e-12) for i in range(d)]
                for c in range(n_clusters)
            ]
        )
        # correction: per (cluster, batch) mean offset from the cluster
        # centroid, subtracted in expectation (small dim table, broadcast)
        baggs = []
        for c in range(n_clusters):
            baggs.append(F.sum(F.col(f"r{c}")).alias(f"bn{c}"))
            for i in range(d):
                baggs.append(
                    F.sum(F.col(f"r{c}") * F.col("v")[i]).alias(f"bs{c}_{i}")
                )
        boff = soft.groupBy("batch").agg(*baggs)
        brows = boff.collect()
        off = {
            r["batch"]: np.array(
                [
                    [
                        r[f"bs{c}_{i}"] / max(r[f"bn{c}"], 1e-12) - centroids[c, i]
                        for i in range(d)
                    ]
                    for c in range(n_clusters)
                ]
            )
            for r in brows
        }
        corr_exprs = []
        for i in range(d):
            adj = F.lit(0.0)
            for c in range(n_clusters):
                per_batch = None
                for b, m in off.items():
                    term = F.when(F.col("batch") == b, float(m[c, i]))
                    per_batch = term if per_batch is None else per_batch.when(
                        F.col("batch") == b, float(m[c, i])
                    )
                adj = adj + F.col(f"r{c}") * F.coalesce(per_batch, F.lit(0.0))
            corr_exprs.append((F.col("v")[i] - adj).alias(f"_v{i}"))
        df = soft.select(
            "cell_id",
            F.array(*[c for c in corr_exprs]).alias("v"),
            "batch",
        )
    return df.select("cell_id", "v")
