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
* harmony_converge — the reference's FULL algorithm envelope:
  objective-driven windowed convergence, diversity cross-entropy
  penalty, and the moe ridge correction, distributed with one
  aggregate per inner iteration; bit-parity against the deterministic
  numpy twin ``_harmony_numpy`` is unit-tested.
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
    # lazy localCheckpoint so an expensive upstream (a full KNN build)
    # runs once — and the blocks free themselves when the result drops
    # (a bare persist here had no paired unpersist)
    edges_a = edges_a.localCheckpoint(eager=False)
    edges_b = edges_b.localCheckpoint(eager=False)
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

    # SQL-string build (one parse) instead of one py4j round trip per
    # Column — the reduction-family pattern; expressions identical
    cols = [f"avg(v[{i}]) AS m{i}" for i in range(d)]
    cols += [
        f"avg(v[{i}] * v[{j}]) AS g{i}_{j}"
        for i in range(d)
        for j in range(i, d)
    ]
    row = vec_df.selectExpr(*cols).collect()[0]
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


def coral_align(
    source_vec: DataFrame,
    target_vec: DataFrame,
    d: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """CORAL domain adaptation (``scarf/mapping_utils.py:15-95``):
    whiten the source with Cs^(-1/2), re-color with Ct^(1/2). The two
    covariance estimates are single-pass aggregates — independent, so
    they run as concurrent actions; the d×d fractional powers run on
    the driver; the per-cell transform is a broadcast matmul expressed
    as plain arithmetic (embarrassingly parallel).

    ``stats_out``: caller-supplied dict that receives the collected
    moments (``source_mu``, ``target_mu``) so downstream steps that
    need them (pipe_mapping centers the reference with target_mu)
    don't re-aggregate the same table."""
    from concurrent.futures import ThreadPoolExecutor

    if d is None:
        d = source_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_s = pool.submit(_gram, source_vec, d)
        fut_t = pool.submit(_gram, target_vec, d)
        mu_s, cov_s = fut_s.result()
        mu_t, cov_t = fut_t.result()
    if stats_out is not None:
        stats_out["source_mu"] = mu_s
        stats_out["target_mu"] = mu_t
    A = _mat_pow(cov_s, -0.5) @ _mat_pow(cov_t, 0.5)
    from scarf_spark.ml.reduction import _dlit

    # "0D + ..." mirrors Python sum()'s integer start (see pca_transform)
    out_cols = ", ".join(
        "0D + "
        + " + ".join(
            f"(v[{i}] - {_dlit(mu_s[i])}) * {_dlit(A[i, j])}"
            for i in range(d)
        )
        for j in range(d)
    )
    return source_vec.selectExpr("cell_id", f"array({out_cols}) AS v")


def harmony_lite(
    cells_vec: DataFrame,
    batch_df: DataFrame | None = None,
    n_clusters: int = 4,
    n_iter: int = 2,
    sigma: float | None = None,
    d: int | None = None,
) -> DataFrame:
    """Batch-correct the latent space: diversity-penalized soft-kmeans
    assignment (the LISI penalty of ``scarf/harmony.py:10-322`` —
    without it, clusters collapse onto batches and the correction
    cancels to zero), then subtract each cell's expected (cluster,
    batch) offset — the ridge step of ``harmony.py:313-322`` reduced
    to its first-order form. Deterministic: centroids seed from the
    lowest cell_ids.

    Scan-fused (round 12): each iteration materializes the E-step
    distances ONCE (``localCheckpoint``) and derives everything else —
    auto-sigma spread, diversity-penalty batch masses, M-step centroid
    sums, and correction offsets — from that one cached frame, so the
    previous 4-5 full-lineage recomputations per iteration become one
    compute pass plus cheap cached scans. The M-step global sums are
    the per-batch sums added up driver-side (B terms; same smooth math
    the oracle's ROUND(6) already absorbs), merging the two aggregation
    passes into one.

    cells_vec: (cell_id, v array<double>); batch_df: (cell_id, batch),
    or None when cells_vec already carries a ``batch`` column — callers
    whose batch label derives from the id (the entry's vec_id % 2) can
    then skip a full cell-keyed self-join (one Exchange + a second scan
    of the embedding table for values a projection already had).
    Returns corrected (cell_id, v).

    Expression plumbing (r16, guide §7.3): every per-row expression is
    built as a SQL string over LAYERED named columns (_d → _n → _pn →
    r) instead of py4j-composed Column trees — the event-log profile
    showed 3.3s of the 3.8s wall in inter-job driver gaps (expression
    construction + analysis of the inlined trees). The dataflow,
    operations and their order are IDENTICAL (the optimizer collapses
    the projection layers into the same physical stage); only the
    driver-side plumbing changed."""
    import numpy as np

    from scarf_spark.ml.reduction import _dlit

    def _blit(b) -> str:
        if isinstance(b, str):
            return "'" + b.replace("'", "''") + "'"
        return repr(int(b))

    if d is None:
        d = cells_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    df = cells_vec if batch_df is None else cells_vec.join(batch_df, "cell_id")
    seeds = df.orderBy("cell_id").limit(n_clusters).collect()
    centroids = np.array([r["v"] for r in seeds], dtype=float)
    eps = 1e-9
    K = n_clusters
    prev_base = None
    for _ in range(n_iter):
        # E-step: squared distances to the k centroids, computed once
        # into a materialized frame (k small -> k literal expressions).
        dist2 = [
            "(0 + "
            + " + ".join(
                f"POWER(v[{i}] - {_dlit(centroids[c, i])}, 2D)"
                for i in range(d)
            )
            + ")"
            for c in range(K)
        ]
        # LAZY checkpoint (r16): the first collect below (auto-sigma
        # spread, or the penalty-mass agg when sigma is explicit)
        # materializes the E-step distances — the eager variant spent a
        # whole extra driver action per iteration on the same pass.
        base = df.selectExpr(
            "cell_id", "v", "batch",
            *[f"{dc} AS _d{c}" for c, dc in enumerate(dist2)],
        ).localCheckpoint(eager=False)
        dsum = "(0 + " + " + ".join(f"_d{c}" for c in range(K)) + ")"
        dmin = "LEAST(" + ", ".join(f"_d{c}" for c in range(K)) + ")"
        if sigma is None:
            # auto bandwidth: a fraction of the mean excess distance so
            # assignments stay soft at any data scale (a fixed sigma
            # underflows exp() to hard 0/1 when distances are large)
            spread = base.selectExpr(
                f"AVG({dsum} / {K} - {dmin}) AS s"
            ).collect()[0]["s"]
            sig = max(0.3 * float(spread), 1e-6)
        else:
            sig = sigma
        # affinity layer: _n{c} = exp(-(d_c - dmin) / sigma)
        aff = base.selectExpr(
            "cell_id", "v", "batch",
            *[
                f"EXP(-(_d{c} - {dmin}) / {_dlit(sig)}) AS _n{c}"
                for c in range(K)
            ],
        )
        nsum = "(0 + " + " + ".join(f"_n{c}" for c in range(K)) + ")"
        # diversity penalty (harmony's theta term, theta=1): scale each
        # cluster's affinity by expected/observed batch mass so a
        # cluster cannot absorb one batch exclusively
        obs_rows = aff.groupBy("batch").agg(
            *[
                F.expr(f"SUM(_n{c} / {nsum})").alias(f"o{c}")
                for c in range(K)
            ],
            F.count("*").alias("nb"),
        ).collect()
        # the collects above have materialized base, so the previous
        # iteration's frame (which base's now-truncated lineage read) is
        # safe to release — unpersisting BEFORE a collect would free
        # blocks the lazy checkpoint still needs to compute
        if prev_base is not None:
            prev_base.unpersist()
        prev_base = base
        n_total = sum(r["nb"] for r in obs_rows)
        clus_mass = {
            c: sum(r[f"o{c}"] for r in obs_rows) for c in range(K)
        }
        pen = {
            (c, r["batch"]): (clus_mass[c] * r["nb"] / n_total + eps)
            / (r[f"o{c}"] + eps)
            for r in obs_rows
            for c in range(K)
        }
        pcase = []
        for c in range(K):
            whens = " ".join(
                f"WHEN batch = {_blit(b)} THEN {_dlit(val)}"
                for (pc, b), val in pen.items()
                if pc == c
            )
            pcase.append(f"COALESCE(CASE {whens} END, 1.0D)")
        pn = aff.selectExpr(
            "cell_id", "v", "batch",
            *[f"(_n{c} * {pcase[c]}) AS _pn{c}" for c in range(K)],
        )
        pnsum = "(0 + " + " + ".join(f"_pn{c}" for c in range(K)) + ")"
        soft = pn.selectExpr(
            "cell_id", "v", "batch",
            *[f"_pn{c} / {pnsum} AS r{c}" for c in range(K)],
        )
        # M-step + correction offsets in ONE per-batch aggregation pass
        # over the cached frame: the global centroid sums are the
        # per-batch sums added driver-side (B constant-size rows)
        baggs = []
        for c in range(K):
            baggs.append(F.expr(f"SUM(r{c})").alias(f"bn{c}"))
            for i in range(d):
                baggs.append(
                    F.expr(f"SUM(r{c} * v[{i}])").alias(f"bs{c}_{i}")
                )
        brows = soft.groupBy("batch").agg(*baggs).collect()
        centroids = np.array(
            [
                [
                    sum(r[f"bs{c}_{i}"] for r in brows)
                    / max(sum(r[f"bn{c}"] for r in brows), 1e-12)
                    for i in range(d)
                ]
                for c in range(n_clusters)
            ]
        )
        # correction: per (cluster, batch) mean offset from the cluster
        # centroid, subtracted in expectation (small dim table, broadcast)
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
            adj = "0.0D"
            for c in range(n_clusters):
                whens = " ".join(
                    f"WHEN batch = {_blit(b)} THEN {_dlit(m[c, i])}"
                    for b, m in off.items()
                )
                adj = f"{adj} + r{c} * COALESCE(CASE {whens} END, 0.0D)"
            corr_exprs.append(f"(v[{i}] - ({adj}))")
        df = soft.selectExpr(
            "cell_id",
            "array(" + ", ".join(corr_exprs) + ") AS v",
            "batch",
        )
    out = df.select("cell_id", "v")
    if prev_base is not None:
        # materialize the corrected output BEFORE releasing the last
        # iteration's E-step checkpoint it reads from — without this,
        # every call leaked one cell-sized cached frame for the
        # application lifetime (the bench stream calls this repeatedly)
        out = out.localCheckpoint()
        prev_base.unpersist()
    return out


# ---------------------------------------------------------------------------
# Harmony, reference envelope: objective-driven convergence + ridge
# ---------------------------------------------------------------------------


def _harmony_numpy(
    Z,
    batches,
    n_clusters,
    sigma=0.1,
    theta=1.0,
    lamb=1.0,
    max_iter_harmony=10,
    max_iter_kmeans=20,
    epsilon_kmeans=1e-5,
    epsilon_harmony=1e-4,
    window_size=3,
):
    """Driver-side deterministic twin of the reference Harmony
    (``scarf/harmony.py:92-322``): same Z_cos scaling, soft-kmeans
    objective (distance + sigma-weighted entropy + theta cross-entropy),
    windowed kmeans convergence, harmony epsilon, and moe ridge
    correction.  Two documented divergences from harmonypy, both for
    determinism: centroids seed from the first K cells (not seeded
    sklearn KMeans) and R updates full-batch synchronously (not
    shuffled blocks — ``harmony.py:261-266`` np.random.shuffle).

    Z: (d, N) array; batches: length-N int array in [0, B).
    Returns (Z_corr, n_harmony_iters)."""
    import numpy as np

    d, N = Z.shape
    K = n_clusters
    uniq = sorted(set(int(b) for b in batches))
    B = len(uniq)
    Phi = np.zeros((B, N))
    for j, b in enumerate(batches):
        Phi[uniq.index(int(b)), j] = 1.0
    Pr_b = Phi.sum(axis=1) / N
    sig = np.repeat(float(sigma), K)
    th = np.repeat(float(theta), B)
    lamb_mat = np.diag(np.insert(np.repeat(float(lamb), B), 0, 0.0))
    Phi_moe = np.vstack((np.ones(N), Phi))

    Z_orig = Z.copy()
    Z_corr = Z.copy()

    def cosify(M):
        C = M / M.max(axis=0)
        return C / np.linalg.norm(C, ord=2, axis=0)

    Z_cos = cosify(Z_corr)
    Y = Z_cos[:, :K].copy()
    Y = Y / np.linalg.norm(Y, ord=2, axis=0)

    def compute_R(dist_mat, E, O):
        R = -dist_mat / sig[:, None]
        R -= np.max(R, axis=0)
        R = np.exp(R)
        R *= np.dot(np.power((E + 1) / (O + 1), th), Phi)
        return R / R.sum(axis=0)

    dist_mat = 2 * (1 - Y.T @ Z_cos)
    R = -dist_mat / sig[:, None]
    R -= np.max(R, axis=0)
    R = np.exp(R)
    R = R / R.sum(axis=0)
    E = np.outer(R.sum(axis=1), Pr_b)
    O = R @ Phi.T

    def objective(R, dist_mat, E, O):
        kerr = float(np.sum(R * dist_mat))
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = R * np.log(R)
        ent[~np.isfinite(ent)] = 0.0
        entropy = float(np.sum(ent * sig[:, None]))
        cross = float(
            np.sum(O * sig[:, None] * th[None, :] * np.log((O + 1) / (E + 1)))
        )
        return kerr + entropy + cross

    obj_kmeans = [objective(R, dist_mat, E, O)]
    obj_harmony = [obj_kmeans[-1]]
    n_outer = 0
    for outer in range(max_iter_harmony):
        n_outer += 1
        # ---- cluster() ----
        dist_mat = 2 * (1 - Y.T @ Z_cos)
        for it in range(max_iter_kmeans):
            Y = Z_cos @ R.T
            Y = Y / np.linalg.norm(Y, ord=2, axis=0)
            dist_mat = 2 * (1 - Y.T @ Z_cos)
            R = compute_R(dist_mat, E, O)
            E = np.outer(R.sum(axis=1), Pr_b)
            O = R @ Phi.T
            obj_kmeans.append(objective(R, dist_mat, E, O))
            if it > window_size:
                old = sum(obj_kmeans[-2 - i] for i in range(window_size))
                new = sum(obj_kmeans[-1 - i] for i in range(window_size))
                if abs(old - new) / abs(old) < epsilon_kmeans:
                    break
        obj_harmony.append(obj_kmeans[-1])
        # ---- moe_correct_ridge ----
        Z_corr = Z_orig.copy()
        for i in range(K):
            Phi_Rk = Phi_moe * R[i, :]
            x = Phi_Rk @ Phi_moe.T + lamb_mat
            W = np.linalg.inv(x) @ (Phi_Rk @ Z_orig.T)
            W[0, :] = 0
            Z_corr -= W.T @ Phi_Rk
        Z_cos = cosify(Z_corr)
        # ---- harmony convergence ----
        e = (obj_harmony[-2] - obj_harmony[-1]) / abs(obj_harmony[-2])
        if e < epsilon_harmony:
            break
    return Z_corr, n_outer


def harmony_converge(
    cells_vec: DataFrame,
    batch_df: DataFrame,
    n_clusters: int = 4,
    sigma: float = 0.1,
    theta: float = 1.0,
    lamb: float = 1.0,
    max_iter_harmony: int = 10,
    max_iter_kmeans: int = 20,
    epsilon_kmeans: float = 1e-5,
    epsilon_harmony: float = 1e-4,
    window_size: int = 3,
) -> DataFrame:
    """Distributed Harmony with the reference's FULL algorithm envelope
    (``scarf/harmony.py:92-322``): diversity-penalized soft-kmeans run
    to windowed objective convergence inside each harmony iteration,
    mixture-of-experts ridge correction (``harmony.py:310-322``
    moe_correct_ridge), and the harmony epsilon stopping rule —
    vs :func:`harmony_lite`'s fixed-2-iteration first-order analog.

    Execution shape: cells stay distributed; every per-cell quantity
    (Z_cos, soft assignments R, corrections) is a column expression
    parameterized by K×d / K×B / (B+1)×d DRIVER matrices collected
    from one aggregate per inner iteration — the same driver_compute
    boundary the reference draws (its whole state is in-memory numpy).
    R itself is never materialized as rows: it is re-derived from the
    (Y, E, O) literals that defined it, so each pass is one shuffle.
    Per outer iteration the corrected coordinates are
    localCheckpoint()ed, keeping expression depth and lineage constant.
    Parity with :func:`_harmony_numpy` (same deterministic spec) is
    the test contract.

    cells_vec: (cell_id, v array<double>); batch_df: (cell_id, batch).
    Returns corrected (cell_id, v) = Z_corr."""
    import numpy as np

    d = cells_vec.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
    K = n_clusters
    base = (
        cells_vec.join(batch_df, "cell_id")
        .select("cell_id", "v", "batch")
        .persist()
    )
    uniq = sorted(
        r["batch"] for r in base.select("batch").distinct().collect()
    )
    B = len(uniq)
    N = base.count()
    nb = {
        r["batch"]: r["n"]
        for r in base.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    Pr_b = np.array([nb[b] / N for b in uniq])
    sig = np.repeat(float(sigma), K)
    th = np.repeat(float(theta), B)
    lamb_mat = np.diag(np.insert(np.repeat(float(lamb), B), 0, 0.0))

    def _per_batch(mapping: dict, default: float = 0.0):
        expr = None
        for b, val in mapping.items():
            w = F.when(F.col("batch") == b, float(val))
            expr = w if expr is None else expr.when(F.col("batch") == b, float(val))
        return F.coalesce(expr, F.lit(default))

    def _cos_exprs(cols):
        """Z_cos per cell: scale by the cell's max coord, then L2
        normalize (``harmony.py:113-114``)."""
        mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
        scaled = [c / mx for c in cols]
        nrm = F.sqrt(sum(s * s for s in scaled))
        return [s / nrm for s in scaled]

    def _r_exprs(zc, r_def):
        """Soft-assignment expressions for R as defined by r_def:
        ("init", Y) = penalty-free init_cluster form, or
        ("full", Y, E, O) = diversity-penalized update_R form."""
        Y = r_def[1]  # K × d
        dist = [
            2.0 * (1.0 - sum(float(Y[c, i]) * zc[i] for i in range(d)))
            for c in range(K)
        ]
        logits = [-dc / float(sig[c]) for c, dc in enumerate(dist)]
        mxl = F.greatest(*logits) if K > 1 else logits[0]
        raw = [F.exp(lg - mxl) for lg in logits]
        if r_def[0] == "full":
            _, _, E, O = r_def
            pen = [
                _per_batch(
                    {
                        uniq[bi]: float(((E[c, bi] + 1) / (O[c, bi] + 1)) ** th[bi])
                        for bi in range(B)
                    },
                    1.0,
                )
                for c in range(K)
            ]
            raw = [r * p for r, p in zip(raw, pen)]
        den = sum(raw)
        return [n / den for n in raw], dist

    # ---- init (mirrors init_cluster, deterministic first-K seeding) ----
    df = base.select(
        "cell_id", "batch", *[F.col("v")[i].alias(f"z{i}") for i in range(d)]
    ).localCheckpoint(eager=True)
    zcols = [F.col(f"z{i}") for i in range(d)]  # current corrected coords
    zc = _cos_exprs(zcols)

    seed_df = (
        df.orderBy("cell_id")
        .limit(K)
        .select(*[z.alias(f"c{i}") for i, z in enumerate(zc)])
    )
    Y = np.array([[r[f"c{i}"] for i in range(d)] for r in seed_df.collect()])
    Y = (Y.T / np.linalg.norm(Y.T, ord=2, axis=0)).T  # K × d, unit rows

    def _stats(r_exprs, dist_exprs):
        """One groupBy(batch) action → O (K×B), kmeans_error, entropy;
        E and the cross-entropy term derive driver-side (cross =
        Σ O·σ·θ·log((O+1)/(E+1)) because Φ is one-hot)."""
        aggs = [F.sum(r_exprs[c]).alias(f"o{c}") for c in range(K)]
        aggs.append(
            F.sum(sum(r * dc for r, dc in zip(r_exprs, dist_exprs))).alias("kerr")
        )
        ent = sum(
            F.when(r > 0, r * F.log(r) * float(sig[c])).otherwise(0.0)
            for c, r in enumerate(r_exprs)
        )
        aggs.append(F.sum(ent).alias("ent"))
        rows = df.groupBy("batch").agg(*aggs).collect()
        O = np.zeros((K, B))
        kerr = ent_v = 0.0
        for r in rows:
            bi = uniq.index(r["batch"])
            for c in range(K):
                O[c, bi] = r[f"o{c}"]
            kerr += r["kerr"]
            ent_v += r["ent"]
        E = np.outer(O.sum(axis=1), Pr_b)
        cross = float(
            np.sum(O * sig[:, None] * th[None, :] * np.log((O + 1) / (E + 1)))
        )
        return O, E, kerr + ent_v + cross

    r_def = ("init", Y)
    r_cur, dist_cur = _r_exprs(zc, r_def)
    O, E, obj0 = _stats(r_cur, dist_cur)
    obj_kmeans = [obj0]
    obj_harmony = [obj0]

    for _outer in range(max_iter_harmony):
        # ---- cluster(): inner soft-kmeans to windowed convergence ----
        for it in range(max_iter_kmeans):
            y_aggs = [
                F.sum(r_cur[c] * zc[i]).alias(f"y{c}_{i}")
                for c in range(K)
                for i in range(d)
            ]
            row = df.agg(*y_aggs).collect()[0]
            Y = np.array([[row[f"y{c}_{i}"] for i in range(d)] for c in range(K)])
            Y = (Y.T / np.linalg.norm(Y.T, ord=2, axis=0)).T
            r_def = ("full", Y, E, O)
            r_cur, dist_cur = _r_exprs(zc, r_def)
            O, E, obj = _stats(r_cur, dist_cur)
            obj_kmeans.append(obj)
            if it > window_size:
                old = sum(obj_kmeans[-2 - i] for i in range(window_size))
                new = sum(obj_kmeans[-1 - i] for i in range(window_size))
                if abs(old - new) / abs(old) < epsilon_kmeans:
                    break
        obj_harmony.append(obj_kmeans[-1])
        # ---- moe_correct_ridge (Z_corr rebuilt from Z_ORIG cols) ----
        m_aggs = []
        for c in range(K):
            m_aggs.append(F.sum(r_cur[c]).alias(f"m{c}"))
            for i in range(d):
                m_aggs.append(
                    F.sum(r_cur[c] * F.col(f"z{i}")).alias(f"s{c}_{i}")
                )
        rows = df.groupBy("batch").agg(*m_aggs).collect()
        mass = np.zeros((K, B))
        rhs_b = np.zeros((K, B, d))
        for r in rows:
            bi = uniq.index(r["batch"])
            for c in range(K):
                mass[c, bi] = r[f"m{c}"]
                for i in range(d):
                    rhs_b[c, bi, i] = r[f"s{c}_{i}"]
        W_rows = {}
        for c in range(K):
            # x = Phi_Rk @ Phi_moe.T + lamb: closed form via one-hot Φ
            x = np.zeros((B + 1, B + 1))
            x[0, 0] = mass[c].sum()
            for bi in range(B):
                x[0, bi + 1] = x[bi + 1, 0] = x[bi + 1, bi + 1] = mass[c, bi]
            x += lamb_mat
            rhs = np.zeros((B + 1, d))
            rhs[0] = rhs_b[c].sum(axis=0)
            rhs[1:] = rhs_b[c]
            W = np.linalg.inv(x) @ rhs
            W[0, :] = 0  # keep the intercept (harmony.py:318)
            for bi in range(B):
                W_rows[(c, uniq[bi])] = W[bi + 1]
        corr_exprs = []
        for i in range(d):
            adj = F.lit(0.0)
            for c in range(K):
                adj = adj + r_cur[c] * _per_batch(
                    {b: W_rows[(c, b)][i] for b in uniq}, 0.0
                )
            corr_exprs.append((F.col(f"z{i}") - adj).alias(f"zc{i}"))
        # materialize: original coords kept for the next ridge pass,
        # PRE-correction coords kept so the unchanged R (the reference
        # carries R across the correction) can be re-derived exactly
        df = df.select(
            "cell_id",
            "batch",
            *[F.col(f"z{i}") for i in range(d)],
            *[zcols[i].alias(f"zp{i}") for i in range(d)],
            *corr_exprs,
        ).localCheckpoint(eager=True)
        zcols = [F.col(f"zc{i}") for i in range(d)]
        zc = _cos_exprs(zcols)
        # same R values, now expressed over the stored zp columns
        r_cur, _ = _r_exprs(_cos_exprs([F.col(f"zp{i}") for i in range(d)]), r_def)
        # ---- harmony convergence ----
        e = (obj_harmony[-2] - obj_harmony[-1]) / abs(obj_harmony[-2])
        if e < epsilon_harmony:
            break

    out = df.select(
        "cell_id",
        F.array(*[F.col(f"zc{i}") for i in range(d)]).alias("v"),
    )
    base.unpersist()
    return out
