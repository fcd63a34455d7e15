"""Sample demultiplexing, cell-cycle phases, and sketch downsampling
(SURVEY.md §2.5 HTO demux, §2.10 cell-cycle scoring / TopACeDo).

All three reduce to joins + aggregates + a `when` cascade; the only
driver-side piece is HTO's tiny k×features cluster-mean table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cell_cycle_phase(
    counts: DataFrame,
    feats: DataFrame,
    s_regex: str,
    g2m_regex: str,
    name_col: str = "name",
) -> DataFrame:
    """Cell-cycle phase assignment (``scarf/datastore/datastore.py:744-822``
    run_cell_cycle_scoring, simplified scoring): per-cell mean
    expression over each regex-matched gene set, baseline-corrected by
    the cell's overall mean; phase = S / G2M by the larger positive
    score, else G1 — the reference's argmax-with-threshold cascade.

    Two broadcast semi-joins + three aggregates; no sampling (the
    reference's control-set sampling is in ``agg_score_features``)."""
    s_set = feats.where(F.upper(F.col(name_col)).rlike(s_regex.upper())).select("feat_id")
    g_set = feats.where(F.upper(F.col(name_col)).rlike(g2m_regex.upper())).select("feat_id")
    base = counts.groupBy("cell_id").agg(F.avg("value").alias("base_mean"))
    s_mean = (
        counts.join(F.broadcast(s_set), "feat_id", "left_semi")
        .groupBy("cell_id")
        .agg(F.avg("value").alias("s_raw"))
    )
    g_mean = (
        counts.join(F.broadcast(g_set), "feat_id", "left_semi")
        .groupBy("cell_id")
        .agg(F.avg("value").alias("g_raw"))
    )
    out = (
        base.join(s_mean, "cell_id", "left_outer")
        .join(g_mean, "cell_id", "left_outer")
        .select(
            "cell_id",
            F.round(F.coalesce("s_raw", F.lit(0.0)) - F.col("base_mean"), 6).alias(
                "s_score"
            ),
            F.round(F.coalesce("g_raw", F.lit(0.0)) - F.col("base_mean"), 6).alias(
                "g2m_score"
            ),
        )
    )
    phase = (
        F.when((F.col("s_score") <= 0) & (F.col("g2m_score") <= 0), "G1")
        .when(F.col("s_score") > F.col("g2m_score"), "S")
        .otherwise("G2M")
    )
    return out.withColumn("phase", phase)


def hto_demux(
    counts_hto: DataFrame,
    n_htos: int,
    quantile: float = 0.99,
    seed: int = 4466,
    hto_ids: list[int] | None = None,
) -> DataFrame:
    """HTO demultiplexing (``scarf/feat_utils.py:95-162``): CLR
    normalize per feature, cluster cells (KMeans, k = n_htos + 1),
    find the background cluster (lowest total signal), set per-HTO
    cutoffs at the background cluster's ``quantile``, discretize, then
    Negative / Singlet / Doublet by the count of positives; singlets
    labeled by the argmax HTO. The reference fits a NegativeBinomial
    for cutoffs — a distribution-free quantile keeps the same contract
    without scipy (documented deviation).

    Returns (cell_id, n_positive, assignment)."""
    from scarf_spark.ml.cluster import kmeans_lloyd
    from scarf_spark.ml.reduction import assemble_vectors

    # CLR per feature: ln(1 + x / geometric-mean) (``assay.py:67-78``;
    # written as LN(1+x) rather than log1p so the DuckDB oracle replays
    # the identical libm call — inputs are ≥ 0, so equally conditioned)
    n_cells = counts_hto.select("cell_id").distinct().count()
    geo = counts_hto.groupBy("feat_id").agg(
        F.exp(F.sum(F.log(F.lit(1.0) + F.col("value"))) / n_cells).alias("gm")
    )
    clr = counts_hto.join(F.broadcast(geo), "feat_id").select(
        "cell_id",
        "feat_id",
        F.log(F.lit(1.0) + F.col("value") / F.col("gm")).alias("value"),
    ).localCheckpoint(eager=False)  # consumed by assemble/labeled/pos
    if hto_ids is None:
        # callers that filtered counts_hto by an explicit channel list
        # pass it in and skip this distinct-collect action
        hto_ids = [
            int(r["feat_id"])
            for r in counts_hto.select("feat_id").distinct().orderBy("feat_id").limit(n_htos).collect()
        ]
    vec = assemble_vectors(clr, hto_ids)
    # deterministic Lloyd (md5-order init) — seed kept for signature
    # compatibility but unused; the clustering is seedless-reproducible
    # and replayed exactly by the SQL oracle's recursive CTE
    km = kmeans_lloyd(vec, k=n_htos + 1, n_iter=5)
    labeled = clr.join(km, "cell_id").localCheckpoint(
        eager=False
    )  # consumed twice: background pick + cutoffs
    # background cluster = lowest mean CLR signal
    bg = (
        labeled.groupBy("cluster")
        .agg(F.avg("value").alias("m"))
        .orderBy("m", "cluster")
        .limit(1)
        .collect()[0]["cluster"]
    )
    # exact interpolated percentile (the reference fits a
    # NegativeBinomial; distribution-free quantile keeps the contract —
    # exact, not approx, so any engine reproduces the cutoff)
    cutoffs = (
        labeled.where(F.col("cluster") == bg)
        .groupBy("feat_id")
        .agg(F.round(F.percentile("value", F.lit(quantile)), 6).alias("cut"))
    )
    pos = (
        clr.join(F.broadcast(cutoffs), "feat_id")
        .withColumn(
            "is_pos", (F.round(F.col("value"), 6) > F.col("cut")).cast("int")
        )
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.desc("is_pos"), F.desc("value"), "feat_id"
    )
    per_cell = (
        pos.withColumn("_rn", F.row_number().over(w))
        .groupBy("cell_id")
        .agg(
            F.sum("is_pos").alias("n_positive"),
            F.max(F.when(F.col("_rn") == 1, F.col("feat_id"))).alias("top_hto"),
        )
    )
    assignment = (
        F.when(F.col("n_positive") == 0, F.lit("Negative"))
        .when(F.col("n_positive") == 1, F.concat(F.lit("HTO_"), F.col("top_hto")))
        .otherwise(F.lit("Doublet"))
    )
    return per_cell.select("cell_id", "n_positive", assignment.alias("assignment"))


def downsample_sketch(
    cells: DataFrame,
    label_col: str,
    cap_per_cluster: int = 50,
    id_col: str = "cell_id",
) -> DataFrame:
    """TopACeDo-style sketching (``scarf/graph_datastore.py:1586-1727``):
    per-cluster sampling rates that preserve small clusters and cap
    large ones. rate_c = min(1, cap/|c|); a cell is kept when its
    md5-derived uniform u(id) < rate_c — deterministic, seedless,
    engine-portable (the reference uses density+SNN-penalized seeded
    sampling; the hash sampler is the distributed-reproducible
    equivalent; connectivity repair via Steiner tree is driver-side in
    the reference and out of scope here).

    Returns kept rows (id, label, u rounded) — one broadcast join, no
    shuffle of the big side."""
    sizes = cells.groupBy(label_col).agg(F.count("*").alias("_n"))
    rates = sizes.select(
        label_col,
        F.least(F.lit(1.0), F.lit(float(cap_per_cluster)) / F.col("_n")).alias("_rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(16**15))
    )
    return (
        cells.join(F.broadcast(rates), label_col)
        .withColumn("_u", u)
        .where(F.col("_u") < F.col("_rate"))
        .select(id_col, label_col, F.round("_u", 6).alias("u"))
    )
