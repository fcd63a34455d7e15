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
    pass over the data computing all d gradient components via
    posexplode + hash agg (map-side combined, no shuffle of the
    vectors themselves), then a driver update. n_iter scans total."""
    e = emb.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("x"),
        F.when(F.col(label_col) == pos_label, 1.0).otherwise(0.0).alias("y"),
    ).persist()
    n = e.count()
    dim = len(e.first()["x"])
    w = [0.0] * dim
    b = 0.0
    for _ in range(n_iter):
        wlit = F.array(*[F.lit(v) for v in w])
        m = (
            F.aggregate(
                F.zip_with(wlit, F.col("x"), lambda a, c: a * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + F.lit(b)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        err = (p - F.col("y")).alias("err")
        g = (
            e.select(err, F.posexplode("x").alias("d", "xv"))
            .groupBy("d")
            .agg((F.sum(F.col("err") * F.col("xv")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        gb = e.select(err).agg(F.avg("err").alias("g")).collect()[0]["g"]
        grad = {r["d"]: r["g"] for r in g}
        w = [w[d] - lr * grad[d] for d in range(dim)]
        b = b - lr * gb
    spark = emb.sparkSession
    rows = [(-1, b)] + [(d, w[d]) for d in range(dim)]
    # round via Spark (half-up), matching the oracle's ROUND — Python's
    # round() is half-to-even
    return spark.createDataFrame(rows, "d int, w double").select(
        "d", F.round("w", 6).alias("w")
    )
