"""Supervised learning on the embedding table (the extension family
next to the reference's unsupervised stack — scarf itself trains no
classifier, but its KNN mapping/label-transfer,
``scarf/mapping_datastore.py:287-364``, is the same label-consuming
role).

Logistic regression by full-batch gradient descent with a FIXED number
of steps and zero init: every quantity is smooth math (dot products,
sigmoid, means), so an unrolled SQL CTE replays the whole training run
— the same determinism contract as the Lloyd/Harmony/Jacobi oracles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_gd(
    emb: DataFrame,
    n_iter: int = 2,
    lr: float = 0.5,
    pos_label: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Full-batch GD for binary logistic regression (y = 1 iff
    label == pos_label), w0 = 0, b0 = 0, fixed ``lr`` and ``n_iter``.
    Returns (d, w): the final weight per dimension, with the bias as
    d = -1 — rounded so the training run is engine-replayable.

    Distribution shape: the weight vector is driver-state (64 floats —
    the same envelope as broadcast KMeans centroids); each step is ONE
    ``mapInPandas`` job: every Arrow batch computes its partial
    gradient with one numpy matmul and emits a single ``double[d+2]``
    row, the driver sums the per-batch partials (count-weighted, so
    the combine is exact in the same way a partial+final hash agg is).
    No explode, no shuffle, no wide codegen expression — the per-step
    plan is constant-size regardless of d, and the executor-side work
    is vectorized BLAS over Arrow batches, the shape that holds at
    2.5T rows."""
    import numpy as np
    import pandas as pd

    e = emb.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        F.when(F.col(label_col) == pos_label, 1.0).otherwise(0.0).alias("y"),
    ).localCheckpoint(eager=False)
    head = e.agg(F.count("*").alias("n"), F.min(F.size("x")).alias("dim")).collect()[0]
    n, dim = head["n"], head["dim"]
    w = [0.0] * dim
    b = 0.0
    schema = "cnt double, se double, g array<double>"
    for _ in range(n_iter):
        wv = np.asarray(w, dtype=np.float64)
        bv = float(b)

        def part_grad(batches, wv=wv, bv=bv):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array([np.asarray(r, dtype=np.float64) for r in pdf["x"]])
                y = pdf["y"].to_numpy(dtype=np.float64)
                err = 1.0 / (1.0 + np.exp(-(X @ wv + bv))) - y
                yield pd.DataFrame(
                    {
                        "cnt": [float(len(y))],
                        "se": [float(err.sum())],
                        "g": [(X.T @ err).tolist()],
                    }
                )

        parts = e.mapInPandas(part_grad, schema=schema).collect()
        se = sum(r["se"] for r in parts)
        gs = np.sum([r["g"] for r in parts], axis=0)
        w = [float(w[d] - lr * gs[d] / float(n)) for d in range(dim)]
        b = float(b - lr * se / float(n))
    spark = emb.sparkSession
    rows = [(-1, b)] + [(d, w[d]) for d in range(dim)]
    # round via Spark (half-up), matching the oracle's ROUND — Python's
    # round() is half-to-even
    return spark.createDataFrame(rows, "d int, w double").select(
        "d", F.round("w", 6).alias("w")
    )


def centroid_classify(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid classification (Rocchio) — the relational twin
    of the reference's KNN label transfer
    (``scarf/mapping_datastore.py:287-364``): per-label mean vector,
    every point assigned to the closest centroid, reported as the
    (true, predicted) confusion matrix.

    Fully relational: one posexplode pass builds the per-(label, dim)
    centroid table (dimension-sized), the distance is a (point, label)
    grouped sum over the exploded join, argmin is MIN(STRUCT(dist,
    label)). The only shuffles carry (n·d) exploded values and
    aggregate state — no vector is ever broadcast whole."""
    e = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("y"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
    )
    ex = e.select("vid", "y", F.posexplode("x").alias("d", "xv"))
    cent = ex.groupBy(F.col("y").alias("cl"), "d").agg(
        (F.sum("xv") / F.count("*")).alias("cv")
    )
    dist = (
        ex.join(F.broadcast(cent), "d")
        .groupBy("vid", "y", "cl")
        .agg(F.sum((F.col("xv") - F.col("cv")) * (F.col("xv") - F.col("cv"))).alias("d2"))
    )
    pred = (
        dist.select(
            "vid", "y", F.struct(F.col("d2"), F.col("cl")).alias("dc")
        )
        .groupBy("vid", "y")
        .agg(F.min("dc").alias("m"))
        .select("vid", "y", F.col("m.cl").alias("pred"))
    )
    return pred.groupBy(F.col("y").alias("true_label"), F.col("pred").alias("pred_label")).agg(
        F.count("*").alias("n")
    )


def naive_bayes_scores(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial naive Bayes with add-one smoothing, trained on the
    labeled corpus and scoring EVERY doc against EVERY class — the
    classic bag-of-words text classifier (McCallum & Nigam 1998) as
    three hash aggregations and one per-(class, term) join. Emits the
    per-(doc, class) log-score rather than an argmax: scores are
    ROUND(6)-stable across engines, argmax on a float knife-edge is
    not (the same determinism boundary SURVEY §8 draws), and the
    classification is a trivial consumer-side top-1.

    Scale shape: the class-conditional term table is |V|·C rows —
    partial-agg'd map-side, joined on term (Catalyst broadcasts it
    while it fits); the corpus-sized word table shuffles once for the
    per-doc score sum. Priors and vocabulary size ride along as
    literals (exact integers)."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("term"),
    ).localCheckpoint(eager=False)
    labs = docs.select(F.col(id_col), F.col(label_col).alias("cls"))
    n_docs = docs.count()
    v = words.select("term").distinct().count()
    priors = labs.groupBy("cls").agg(F.count("*").alias("n_c"))
    wl = words.join(labs, id_col)
    cls_tok = wl.groupBy("cls", "term").agg(F.count("*").alias("ct")).localCheckpoint(eager=False)
    tot_tok = cls_tok.groupBy("cls").agg(F.sum("ct").alias("tc"))
    cls_dim = priors.join(tot_tok, "cls")
    scored = (
        words.crossJoin(F.broadcast(cls_dim))
        .join(cls_tok, ["cls", "term"], "left_outer")
        .select(
            id_col,
            "cls",
            "n_c",
            "tc",
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                / (F.col("tc") + F.lit(v)).cast("double")
            ).alias("_ll"),
        )
    )
    return (
        scored.groupBy(id_col, "cls")
        .agg(
            (
                F.sum("_ll")
                + F.log(F.first("n_c") / F.lit(float(n_docs)))
            ).alias("_s")
        )
        .select(id_col, "cls", F.round("_s", 6).alias("score"))
    )


def logreg_gd_sparse(
    feats: DataFrame,
    labels: DataFrame,
    n_iter: int = 2,
    lr: float = 0.5,
    id_col: str = "doc_id",
    feat_col: str = "feature",
    val_col: str = "tf",
    label_col: str = "y",
) -> DataFrame:
    """Full-batch GD logistic regression over SPARSE hashed features
    (COO input, e.g. :func:`scarf_spark.operators.text.hashing_tf`) —
    the fastText-style quality/domain classifier a data-curation
    pipeline trains over billions of docs. Unlike :func:`logreg_gd`
    (dense, driver-held 64-float weight vector), the weight vector here
    IS a feature-keyed DataFrame: logits are a join + per-doc sum,
    gradients a join + per-feature sum — two shuffles per step, and
    the weights never leave the cluster, which is the shape that holds
    at 2^20+ hashed features where a driver vector would not.

    Only the scalar bias crosses the driver per step (one AVG — the
    collected float re-enters as a literal, the staged-dataflow
    pattern the oracle replays exactly). Missing features stay
    implicitly zero on both the logit and gradient side. The weight
    table is localCheckpoint()ed per step: it feeds two joins in the
    next iteration, the exponential-lineage shape persist cannot cut.

    Returns (d, w): final weight per feature, bias as d = -1,
    ROUND(6) so the run replays across engines."""
    f = feats.select(
        F.col(id_col).alias("_id"),
        F.col(feat_col).cast("long").alias("_f"),
        F.col(val_col).cast("double").alias("_v"),
    ).localCheckpoint(eager=False)
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("double").alias("_y")
    ).localCheckpoint(eager=False)
    n = lab.count()
    w = f.select("_f").distinct().select("_f", F.lit(0.0).alias("_w")).localCheckpoint(eager=False)
    b = 0.0
    for _ in range(n_iter):
        z = (
            f.join(w, "_f")
            .groupBy("_id")
            .agg(F.sum(F.col("_v") * F.col("_w")).alias("_z"))
        )
        err = (
            lab.join(z, "_id", "left_outer")
            .select(
                "_id",
                (
                    1.0
                    / (1.0 + F.exp(-(F.coalesce("_z", F.lit(0.0)) + F.lit(b))))
                    - F.col("_y")
                ).alias("_e"),
            )
            .localCheckpoint(eager=False)
        )
        grad = (
            f.join(err, "_id")
            .groupBy("_f")
            .agg((F.sum(F.col("_v") * F.col("_e")) / F.lit(float(n))).alias("_g"))
        )
        w = (
            w.join(grad, "_f", "left_outer")
            .select(
                "_f",
                (F.col("_w") - F.lit(lr) * F.coalesce("_g", F.lit(0.0))).alias("_w"),
            )
            .localCheckpoint()
        )
        b = float(b - lr * err.agg(F.avg("_e")).collect()[0][0])
    spark = feats.sparkSession
    bias = spark.createDataFrame([(-1, b)], "d long, w double")
    return bias.select("d", F.round("w", 6).alias("w")).unionAll(
        w.select(F.col("_f").alias("d"), F.round("_w", 6).alias("w"))
    )


def ridge_closed_form(
    emb: DataFrame,
    lam: float = 1000.0,
    quant: float = 1000.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Closed-form ridge regression of the label on the first two
    embedding dimensions (plus intercept): β = (XᵀX + λI)⁻¹ Xᵀy solved
    exactly via Cramer's rule on the 3×3 normal-equation system — the
    classical linear-probe baseline over an embedding table.

    Determinism contract: features are quantized to integer units
    (``FLOOR(x·quant)``) so every moment (Σx₁, Σx₁x₂, Σx₁y, …) is an
    EXACT integer sum — double sums drift with accumulation order
    between engines, integer sums cannot. The 3×3 determinant
    arithmetic then runs on doubles converted from exact integers
    (magnitudes ≪ 2⁵³, conversion lossless), so the coefficients
    replay bit-identically in any engine. λ is not applied to the
    intercept, per the standard convention.

    Scale shape: one map-side-combined aggregate produces nine scalar
    moments (constant state regardless of row count), and the solve is
    a constant-size projection on that single row — the exact pattern
    a 100 TB linear probe wants (no gradient iterations, no driver
    collect, one pass)."""
    m = _ridge_moments(emb, quant, vec_col, label_col)
    det, d0, d1, d2 = _cramer_cols(lam)
    solved = m.select(
        F.round(d0 / det, 6).alias("b_intercept"),
        F.round(d1 / det, 6).alias("b_x1"),
        F.round(d2 / det, 6).alias("b_x2"),
        F.col("n").cast("long").alias("n_rows"),
    )
    return solved


def _ridge_moments(
    emb: DataFrame, quant: float, vec_col: str, label_col: str
) -> DataFrame:
    """One-row exact normal-equation moments for the 2-feature ridge
    (see :func:`ridge_closed_form` for the determinism contract)."""
    x1 = F.floor(F.element_at(F.col(vec_col), 1).cast("double") * quant)
    x2 = F.floor(F.element_at(F.col(vec_col), 2).cast("double") * quant)
    y = F.col(label_col).cast("long")

    def s(expr):  # exact wide-sum: per-row products fit long, sums don't
        return F.sum(expr.cast("decimal(38,0)")).cast("double")

    return emb.agg(
        F.count("*").cast("double").alias("n"),
        s(x1).alias("s1"),
        s(x2).alias("s2"),
        s(y).alias("sy"),
        s(x1 * x1).alias("s11"),
        s(x1 * x2).alias("s12"),
        s(x2 * x2).alias("s22"),
        s(x1 * y).alias("s1y"),
        s(x2 * y).alias("s2y"),
    )


def _cramer_cols(lam: float):
    """Cramer determinants over the moment row — the SAME expression
    tree mirrored by the oracle SQL in ``__spark_entry__`` (left-
    associated, same parenthesization), so doubles agree bit-for-bit.
    A = [[n, s1, s2], [s1, s11+λ, s12], [s2, s12, s22+λ]],
    b = [sy, s1y, s2y]."""
    a11, a12, a13 = F.col("n"), F.col("s1"), F.col("s2")
    a22 = F.col("s11") + lam
    a23 = F.col("s12")
    a33 = F.col("s22") + lam
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    b1, b2, b3 = F.col("sy"), F.col("s1y"), F.col("s2y")
    d0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    d1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    d2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    return det, d0, d1, d2


def conformal_ridge(
    emb: DataFrame,
    coverage_num: int = 9,
    coverage_den: int = 10,
    lam: float = 1000.0,
    quant: float = 1000.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Split-conformal prediction interval for the ridge probe
    (Vovk 2005 / Lei 2018): hash-split the table into train /
    calibration / test (the same seedless md5 buckets as hash_split —
    bit-reproducible, zero shuffle), fit the closed-form ridge on
    train, take q̂ = the ⌈(1−α)(n_cal+1)⌉-th smallest absolute
    calibration residual (1−α = coverage_num/coverage_den; the ceil
    runs in INTEGER arithmetic — a float ceil(0.9·(n+1)) can straddle
    an integer differently per engine at exact multiples), and report
    test coverage of ŷ ± q̂ — the
    distribution-free ML-ops guarantee check.

    Determinism: the betas replay exactly (see
    :func:`ridge_closed_form`); every residual is the same double
    expression on both engines, and the q̂ selection is a sort + limit
    on (residual, id) — Spark plans TakeOrderedAndProject (per-
    partition top-k, merged once, no global sort). The single
    ``count()`` of the calibration split is the one driver scalar
    (same envelope as global_ntile's histogram)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    pts = emb.withColumn("_bkt", bucket)
    train = pts.where(F.col("_bkt") < 50)
    calib = pts.where((F.col("_bkt") >= 50) & (F.col("_bkt") < 80))
    test = pts.where(F.col("_bkt") >= 80)
    m = _ridge_moments(train, quant, vec_col, label_col)
    det, d0, d1, d2 = _cramer_cols(lam)
    betas = F.broadcast(
        m.select(
            (d0 / det).alias("_b0"),
            (d1 / det).alias("_b1"),
            (d2 / det).alias("_b2"),
            F.col("n").cast("long").alias("_n_train"),
        )
    )

    def resid(df: DataFrame) -> DataFrame:
        x1 = F.floor(F.element_at(F.col(vec_col), 1).cast("double") * quant)
        x2 = F.floor(F.element_at(F.col(vec_col), 2).cast("double") * quant)
        pred = F.col("_b0") + F.col("_b1") * x1 + F.col("_b2") * x2
        return df.crossJoin(betas).select(
            F.col(id_col),
            F.abs(F.col(label_col).cast("double") - pred).alias("_r"),
        )

    n_cal = calib.count()
    if n_cal == 0:
        # An empty calibration split would make q̂ NULL and every test
        # point silently "uncovered" — the guarantee is undefined
        # without calibration data, so fail loudly.
        raise ValueError("conformal_ridge: calibration split is empty")
    k = (coverage_num * (n_cal + 1) + coverage_den - 1) // coverage_den
    q = (
        resid(calib)
        .orderBy("_r", id_col)
        .limit(min(k, n_cal))
        .agg(F.max("_r").alias("_q"))
    )
    cov = (
        resid(test)
        .crossJoin(F.broadcast(q))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.when(F.col("_r") <= F.col("_q"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(q))
        .crossJoin(betas.select("_n_train"))
        .select(
            F.col("_n_train").alias("n_train"),
            F.lit(n_cal).cast("long").alias("n_calib"),
            "n_test",
            F.round(F.col("_q"), 6).alias("q_hat"),
            "n_covered",
            F.expr("n_covered * 1000000 DIV n_test").alias("coverage_ppm"),
        )
    )
