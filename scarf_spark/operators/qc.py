"""Per-cell / per-feature QC aggregates (SURVEY.md §2.5).

Reference semantics: per-cell row sums / nonzero counts
(``scarf/datastore/base_datastore.py:345-367``), regex-subset percent
features (``scarf/assay.py:227-270``), per-feature validity stats
(``scarf/assay.py:201-225``) and feature summary stats
(``scarf/assay.py:830-897``).

All are single-shuffle hash aggregations on the COO fact table; Spark
computes them partial+final (map-side combine) automatically, so at
100 TB each is one pass over the fact table with only the (small)
per-key aggregate state shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ncounts_per_cell(counts: DataFrame, out: str = "n_counts") -> DataFrame:
    """Row sum of the raw matrix (``base_datastore.py:345-352``)."""
    return counts.groupBy("cell_id").agg(F.sum("value").cast("double").alias(out))


def nfeatures_per_cell(counts: DataFrame, out: str = "n_features") -> DataFrame:
    """Per-cell nonzero count (``base_datastore.py:360-367``).

    Zeros are absent rows in COO form, but guard value>0 anyway to keep
    exact parity with the dense-matrix semantics.
    """
    return counts.groupBy("cell_id").agg(
        F.count(F.when(F.col("value") > 0, 1)).alias(out)
    )


def cell_qc(counts: DataFrame) -> DataFrame:
    """nCounts + nFeatures in one pass (one shuffle, not two)."""
    return counts.groupBy("cell_id").agg(
        F.sum("value").cast("double").alias("n_counts"),
        F.count(F.when(F.col("value") > 0, 1)).alias("n_features"),
    )


def feat_ncells(counts: DataFrame, n_cells: int, min_cells: int = 0) -> DataFrame:
    """Feature validity stats (``assay.py:201-225``): per-feature nonzero
    cell count, dropOuts = N - nCells, and the I flag nCells > min_cells."""
    return counts.groupBy("feat_id").agg(
        F.count(F.when(F.col("value") > 0, 1)).alias("n_cells_expressed"),
        (F.lit(n_cells) - F.count(F.when(F.col("value") > 0, 1))).alias("dropouts"),
        (F.count(F.when(F.col("value") > 0, 1)) > F.lit(min_cells)).alias("I"),
    )


def percent_feature(
    counts: DataFrame, feats: DataFrame, name_pattern: str, out: str = "percent"
) -> DataFrame:
    """100 * (sum over regex-matched features) / nCounts per cell
    (``assay.py:227-270``).

    Plan: broadcast the matched feature ids (tiny dim subset) into a
    semi-join flag, then a single groupBy — the fact table is scanned
    once and never shuffled twice.
    """
    matched = feats.where(F.upper(F.col("name")).rlike(name_pattern.upper())).select("feat_id")
    flagged = counts.join(
        F.broadcast(matched.withColumn("_m", F.lit(1))), "feat_id", "left_outer"
    )
    return flagged.groupBy("cell_id").agg(
        F.round(
            100.0
            * F.coalesce(F.sum(F.when(F.col("_m") == 1, F.col("value"))), F.lit(0.0))
            / F.sum("value"),
            6,
        ).alias(out)
    )


def _nz(c: Column) -> Column:
    return F.count(F.when(c > 0, 1))


def feature_stats(counts: DataFrame, n_cells: int) -> DataFrame:
    """Per-feature summary stats (``assay.py:830-897``): total, mean over
    all cells (absent rows are zeros), nonzero mean, population variance
    over all cells, nonzero count.

    The dense-semantics variance over N cells with only nnz stored rows:
      mean = tot / N
      var  = sum(v^2)/N - mean^2        (absent rows contribute 0)
    computed as expressions over one hash agg — no densification.
    """
    n = F.lit(float(n_cells))
    agg = counts.groupBy("feat_id").agg(
        F.sum("value").cast("double").alias("tot"),
        F.sum(F.col("value") * F.col("value")).cast("double").alias("tot_sq"),
        _nz(F.col("value")).alias("nnz"),
    )
    return agg.select(
        "feat_id",
        F.round("tot", 6).alias("tot"),
        F.round(F.col("tot") / n, 6).alias("avg_all"),
        F.round(
            F.when(F.col("nnz") > 0, F.col("tot") / F.col("nnz")).otherwise(F.lit(0.0)), 6
        ).alias("nz_mean"),
        F.round(F.col("tot_sq") / n - (F.col("tot") / n) * (F.col("tot") / n), 6).alias(
            "sigma"
        ),
        F.col("nnz"),
    )


def clr_geo_mean(counts: DataFrame, n_cells: int, out: str = "geo_mean") -> DataFrame:
    """Per-feature geometric-mean factor exp(mean(log1p(x))) over ALL
    cells including absent zeros (``assay.py:67-78``): log1p(0)=0, so the
    dense mean is sum(log1p(v)) / N with N the full cell count."""
    return counts.groupBy("feat_id").agg(
        F.round(F.exp(F.sum(F.log1p("value")) / F.lit(float(n_cells))), 6).alias(out)
    )


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    column — the standard train/serve drift monitor. Equal-width bins
    over the UNION's [min, max] (one tiny agg, broadcast back);
    Laplace-smoothed bin shares p, q (+1 on counts, so empty bins stay
    defined); per-bin term (p−q)·ln(p/q).

    Both inputs make one pass each (a bin is a pure projection the scan
    absorbs) into an n_bins-row aggregate — drift over a 100 TB pair of
    snapshots costs two scans and a constant-size state. Emits per-bin
    (bin, n_a, n_b, psi_term); total PSI = SUM(psi_term)."""
    va = a.select(F.col(value_col).cast("double").alias("_v"))
    vb = b.select(F.col(value_col).cast("double").alias("_v"))
    ext = va.unionAll(vb).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        bin_ = F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(n_bins)
                ),
                F.lit(n_bins - 1),
            ),
        ).otherwise(F.lit(0))
        return df.crossJoin(F.broadcast(ext)).select(bin_.alias("bin")).groupBy(
            "bin"
        ).agg(F.count("*").alias(out))

    ca, cb = binned(va, "n_a"), binned(vb, "n_b")
    bins = (
        a.sparkSession.range(n_bins)
        .select(F.col("id").alias("bin"))
        .join(ca, "bin", "left_outer")
        .join(cb, "bin", "left_outer")
        .na.fill({"n_a": 0, "n_b": 0})
    )
    na = va.count()
    nb = vb.count()
    p = (F.col("n_a") + 1) / F.lit(float(na + n_bins))
    qq = (F.col("n_b") + 1) / F.lit(float(nb + n_bins))
    return bins.select(
        "bin",
        "n_a",
        "n_b",
        F.round((p - qq) * F.log(p / qq), 6).alias("psi_term"),
    )


def table_digest(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Order-free content digest of a table — the dataset-versioning /
    lineage primitive: digest = BIT_XOR over rows of a 60-bit md5 row
    hash. XOR is commutative and mergeable, so the digest is invariant
    to partitioning and row order, shards combine by XOR, and comparing
    two 100 TB snapshots costs one scan each and exchanges ONE row.

    Rows are canonicalized per dtype before hashing so the rendering is
    engine-portable: floats/doubles through DECIMAL(18,6) (fixed-point
    string — engines disagree on shortest-round-trip float text),
    timestamps as epoch microseconds, NULL as a sentinel distinct from
    any value, fields joined with the 0x1f unit separator. Emits
    (n_rows, digest)."""
    cols = columns or df.columns
    dt = dict(df.dtypes)
    parts = []
    for c in cols:
        t = dt[c]
        if t in ("double", "float"):
            v = F.col(c).cast("decimal(18,6)").cast("string")
        elif t.startswith("timestamp"):
            v = F.unix_micros(F.col(c).cast("timestamp")).cast("string")
        else:
            v = F.col(c).cast("string")
        parts.append(F.coalesce(v, F.lit("\u2400")))
    row_h = F.conv(
        F.substring(F.md5(F.concat_ws("\u001f", *parts)), 1, 15), 16, 10
    ).cast("long")
    return df.select(row_h.alias("_h")).agg(
        F.count("*").alias("n_rows"), F.expr("bit_xor(_h)").alias("digest")
    )


def embedding_drift(
    a: DataFrame,
    b: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus slices (train vs
    serve, yesterday vs today): the L2 distance and cosine similarity
    of the two slices' per-dimension MEAN vectors — the vector-space
    dual of :func:`psi_drift`, and the cheap first-line monitor for
    "did the encoder or the corpus move" before anything expensive
    (re-clustering, re-indexing) runs.

    Shape: one posexplode per side (narrow), one (dim)-keyed mean agg
    each — n_dims rows of state regardless of corpus size — one
    n_dims-row join, one scalar fold. Means are double AVGs and the
    dim fold is a plain SUM; ROUND(6) absorbs sub-ulp accumulation-
    order differences exactly as the other metric queries do."""
    def dim_means(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(F.posexplode(vec_col).alias("d", "v"))
            .groupBy("d")
            .agg(F.avg("v").alias(out))
        )

    ma = dim_means(a, "ma")
    mb = dim_means(b, "mb")
    na = a.select(F.count("*").alias("n_a"))
    nb = b.select(F.count("*").alias("n_b"))
    j = ma.join(mb, "d")
    agg = j.agg(
        F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))).alias("_d2"),
        F.sum(F.col("ma") * F.col("mb")).alias("_ab"),
        F.sum(F.col("ma") * F.col("ma")).alias("_aa"),
        F.sum(F.col("mb") * F.col("mb")).alias("_bb"),
    )
    return (
        agg.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            F.round(F.sqrt("_d2"), 6).alias("mean_l2"),
            F.round(
                F.col("_ab") / (F.sqrt("_aa") * F.sqrt("_bb")), 6
            ).alias("mean_cosine"),
        )
    )


def table_diff(
    old: DataFrame, new: DataFrame, key: str, payload: str
) -> DataFrame:
    """Row-level snapshot diff — the drill-down companion to
    :func:`table_digest` (digest says the snapshots differ; this says
    HOW): one full-outer join on the key, classifying each key as
    added / removed / changed / same. One shuffle on the key, constant
    output (four counters) — the shape a 100 TB snapshot comparison
    needs (no collect, no second pass).

    Presence is tracked with explicit flags (not payload nullness, so
    a legitimately-null payload never misreads as added/removed), and
    ``payload`` equality is null-safe."""
    o = old.select(
        F.col(key).alias("_k"), F.col(payload).alias("_po"), F.lit(1).alias("_ho")
    )
    nn = new.select(
        F.col(key).alias("_k"), F.col(payload).alias("_pn"), F.lit(1).alias("_hn")
    )
    j = o.join(nn, "_k", "full_outer").select(
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_po").eqNullSafe(F.col("_pn")), F.lit("same"))
        .otherwise(F.lit("changed"))
        .alias("status")
    )
    return j.groupBy("status").agg(F.count("*").alias("n_keys"))


def benford_digits(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data /
    corrupted-feed screen: observed first-significant-digit counts of
    the positive values vs the Benford expectation log10(1 + 1/d),
    with the per-digit chi-squared contribution.

    Engine-portability contract: the first digit comes from INTEGER
    string length (quantize to micros, digit = n // 10^(len−1)) — a
    float log10/floor pair can flip at power-of-ten boundaries between
    libm implementations, an integer rendering cannot. The Benford
    expectations are Python-computed literals inlined identically into
    both engines' expressions."""
    import math

    n_micros = F.floor(F.col(value_col) * 1000000.0).cast("long")
    pos = df.where(n_micros > 0).select(n_micros.alias("_n"))
    digit = F.expr("_n DIV CAST(POWER(10, LENGTH(CAST(_n AS STRING)) - 1) AS BIGINT)")
    counts = pos.select(digit.cast("int").alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n_obs")
    )
    total = pos.agg(F.count("*").alias("_t"))
    rows = counts.crossJoin(F.broadcast(total))
    exp_lit = F.array(
        *[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]
    )
    expected = F.element_at(exp_lit, F.col("digit")) * F.col("_t")
    return rows.select(
        "digit",
        "n_obs",
        F.round(expected, 6).alias("n_expected"),
        F.round(
            (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected,
            6,
        ).alias("chi2_term"),
    )
