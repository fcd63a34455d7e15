"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the large-scale pipeline extensions); each maps to
an ``oracle_sql()`` ANSI-SQL twin that DuckDB runs on the same parquet
tables. The star schema doubles as the single-cell COO model
(FIXTURES.md §4): lineitem → counts(cell_id, feat_id, value),
orders → cells, part → feats.

Float discipline: every derived float column is computed from exact
inputs where possible and ``ROUND(x, 6)``-ed identically on both sides
so the driver's value-hash matches bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scarf_spark.catalog import COUNTS_CTE, DataStore
from scarf_spark.operators import filters, normalize, qc

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


def _ds(spark: SparkSession, sf_dir: str) -> DataStore:
    return DataStore(spark, sf_dir)


_NCELLS_CACHE: dict[str, int] = {}


def _n_cells(ds: DataStore) -> int:
    """Distinct cells in the fact table. On a cluster this is a cached
    catalog statistic; here a one-off distinct-count action."""
    key = ds.sf_dir
    if key not in _NCELLS_CACHE:
        _NCELLS_CACHE[key] = ds.counts().select("cell_id").distinct().count()
    return _NCELLS_CACHE[key]


_N_CELLS_SQL = "(SELECT COUNT(DISTINCT cell_id) FROM counts)"


# ---------------------------------------------------------------------------
# §2.5 QC aggregations
# ---------------------------------------------------------------------------

@q(
    "qc_ncounts",
    f"WITH {COUNTS_CTE} "
    "SELECT cell_id, CAST(SUM(value) AS DOUBLE) AS n_counts FROM counts GROUP BY cell_id",
)
def qc_ncounts(spark, sf_dir):
    return qc.ncounts_per_cell(_ds(spark, sf_dir).counts())


@q(
    "qc_nfeatures",
    f"WITH {COUNTS_CTE} "
    "SELECT cell_id, COUNT(*) FILTER (WHERE value > 0) AS n_features "
    "FROM counts GROUP BY cell_id",
)
def qc_nfeatures(spark, sf_dir):
    return qc.nfeatures_per_cell(_ds(spark, sf_dir).counts())


@q(
    "qc_feat_ncells",
    f"WITH {COUNTS_CTE} "
    "SELECT feat_id, COUNT(*) FILTER (WHERE value > 0) AS n_cells_expressed, "
    f"{_N_CELLS_SQL} - COUNT(*) FILTER (WHERE value > 0) AS dropouts, "
    "COUNT(*) FILTER (WHERE value > 0) > 10 AS I "
    "FROM counts GROUP BY feat_id",
)
def qc_feat_ncells(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return qc.feat_ncells(ds.counts(), n_cells=_n_cells(ds), min_cells=10)


@q(
    "qc_percent_feature",
    f"WITH {COUNTS_CTE} "
    "SELECT c.cell_id, "
    "ROUND(100.0 * COALESCE(SUM(c.value) FILTER (WHERE regexp_matches(UPPER(p.p_name), 'RED|BLUE')), 0.0) "
    "/ SUM(c.value), 6) AS percent "
    "FROM counts c JOIN part p ON c.feat_id = p.p_partkey GROUP BY c.cell_id",
)
def qc_percent_feature(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return qc.percent_feature(ds.counts(), ds.feat_table(), "red|blue")


@q(
    "qc_feature_stats",
    f"WITH {COUNTS_CTE}, "
    "agg AS (SELECT feat_id, CAST(SUM(value) AS DOUBLE) AS tot, "
    "CAST(SUM(value * value) AS DOUBLE) AS tot_sq, "
    "COUNT(*) FILTER (WHERE value > 0) AS nnz FROM counts GROUP BY feat_id) "
    "SELECT feat_id, ROUND(tot, 6) AS tot, "
    f"ROUND(tot / {_N_CELLS_SQL}, 6) AS avg_all, "
    "ROUND(CASE WHEN nnz > 0 THEN tot / nnz ELSE 0.0 END, 6) AS nz_mean, "
    f"ROUND(tot_sq / {_N_CELLS_SQL} - (tot / {_N_CELLS_SQL}) * (tot / {_N_CELLS_SQL}), 6) AS sigma, "
    "nnz FROM agg",
)
def qc_feature_stats(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return qc.feature_stats(ds.counts(), n_cells=_n_cells(ds))


@q(
    "qc_clr_geo_mean",
    f"WITH {COUNTS_CTE} "
    f"SELECT feat_id, ROUND(EXP(SUM(LN(1 + value)) / {_N_CELLS_SQL}), 6) AS geo_mean "
    "FROM counts GROUP BY feat_id",
)
def qc_clr_geo_mean(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return qc.clr_geo_mean(ds.counts(), n_cells=_n_cells(ds))


# ---------------------------------------------------------------------------
# §2.3 filters / predicates
# ---------------------------------------------------------------------------

@q(
    "filt_sift",
    "SELECT * FROM customer WHERE c_acctbal > 1000 AND c_acctbal < 5000",
)
def filt_sift(spark, sf_dir):
    return filters.sift(_ds(spark, sf_dir).customer, "c_acctbal", 1000.0, 5000.0)


@q(
    "filt_sift_bounds",
    "SELECT * FROM customer WHERE c_acctbal >= 1000 AND c_acctbal <= 5000",
)
def filt_sift_bounds(spark, sf_dir):
    return filters.sift(
        _ds(spark, sf_dir).customer, "c_acctbal", 1000.0, 5000.0, keep_bounds=True
    )


@q(
    "filt_multi_sift",
    "SELECT * FROM part WHERE p_size > 5 AND p_size < 40 "
    "AND p_retailprice > 900 AND p_retailprice < 1050",
)
def filt_multi_sift(spark, sf_dir):
    return filters.multi_sift(
        _ds(spark, sf_dir).part, ["p_size", "p_retailprice"], [5, 900], [40, 1050]
    )


@q(
    "filt_filter_cells",
    f"WITH {COUNTS_CTE}, "
    "qc AS (SELECT cell_id, CAST(SUM(value) AS DOUBLE) AS n_counts, "
    "COUNT(*) FILTER (WHERE value > 0) AS n_features FROM counts GROUP BY cell_id) "
    "SELECT o.o_orderkey AS cell_id, "
    "COALESCE(qc.n_counts > 50 AND qc.n_counts < 500, FALSE) "
    "AND COALESCE(qc.n_features > 2, FALSE) AS I "
    "FROM orders o LEFT JOIN qc ON o.o_orderkey = qc.cell_id",
)
def filt_filter_cells(spark, sf_dir):
    """AND-into-I semantics (datastore.py:92-138): cells lacking QC rows
    (no lineitems) fail the predicate, I never resurrects."""
    ds = _ds(spark, sf_dir)
    cells = ds.cell_table().join(qc.cell_qc(ds.counts()), "cell_id", "left_outer")
    out = filters.filter_cells(
        cells,
        (F.col("n_counts") > 50) & (F.col("n_counts") < 500),
        F.col("n_features") > 2,
    )
    return out.select("cell_id", "I")


@q(
    "filt_auto_bounds",
    "SELECT ROUND(MEDIAN(c_acctbal) - 2.0 * STDDEV_SAMP(c_acctbal), 6) AS lo, "
    "ROUND(MEDIAN(c_acctbal) + 2.0 * STDDEV_SAMP(c_acctbal), 6) AS hi FROM customer",
)
def filt_auto_bounds(spark, sf_dir):
    return filters.auto_filter_bounds(_ds(spark, sf_dir).customer, "c_acctbal", 2.0)


@q(
    "filt_auto_filter",
    "WITH b AS (SELECT ROUND(MEDIAN(c_acctbal) - 2.0 * STDDEV_SAMP(c_acctbal), 6) AS lo, "
    "ROUND(MEDIAN(c_acctbal) + 2.0 * STDDEV_SAMP(c_acctbal), 6) AS hi FROM customer) "
    "SELECT c.* FROM customer c, b WHERE c.c_acctbal > b.lo AND c.c_acctbal < b.hi",
)
def filt_auto_filter(spark, sf_dir):
    return filters.auto_filter_cells(_ds(spark, sf_dir).customer, "c_acctbal", 2.0)


@q(
    "filt_grep",
    "SELECT * FROM part WHERE regexp_matches(UPPER(p_name), 'WIDGET|GIZMO')",
)
def filt_grep(spark, sf_dir):
    return filters.grep(_ds(spark, sf_dir).part, "widget|gizmo", name_col="p_name")


@q(
    "filt_get_index_by",
    "SELECT p.* FROM part p JOIN (VALUES ('red widget'), ('SMALL RING'), ('blue bolt')) "
    "t(v) ON UPPER(p.p_name) = UPPER(t.v)",
)
def filt_get_index_by(spark, sf_dir):
    return filters.get_index_by(
        _ds(spark, sf_dir).part,
        ["red widget", "SMALL RING", "blue bolt"],
        col="p_name",
        key_col="p_partkey",
    )


@q(
    "filt_index_to_bool",
    "SELECT p.p_partkey AS feat_id, p.p_size > 30 AS flag FROM part p",
)
def filt_index_to_bool(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    feats = ds.feat_table()
    sel = feats.where(F.col("size") > 30)
    return filters.index_to_bool(feats, sel, "feat_id").select("feat_id", "flag")


@q(
    "filt_clip_fraction",
    "WITH b AS (SELECT quantile_cont(c_acctbal, 0.01) AS lo, "
    "quantile_cont(c_acctbal, 0.99) AS hi FROM customer) "
    "SELECT c.c_custkey, ROUND(LEAST(GREATEST(c.c_acctbal, b.lo), b.hi), 6) AS c_acctbal "
    "FROM customer c, b",
)
def filt_clip_fraction(spark, sf_dir):
    c = _ds(spark, sf_dir).customer.select("c_custkey", "c_acctbal")
    return filters.clip_fraction(c, "c_acctbal", 0.01)


@q(
    "filt_clean_array",
    "SELECT event_id, CASE WHEN isnan(v) OR v = 'Infinity'::DOUBLE OR v = '-Infinity'::DOUBLE "
    "THEN 0.0 ELSE v END AS value FROM (SELECT event_id, "
    "CASE WHEN event_type = 'error' THEN 'NaN'::DOUBLE ELSE value END AS v FROM events)",
)
def filt_clean_array(spark, sf_dir):
    ev = _ds(spark, sf_dir).events.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(float("nan")))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    return filters.clean_array(ev, "value", 0.0)


# ---------------------------------------------------------------------------
# §2.10 normalization
# ---------------------------------------------------------------------------

_LIBSIZE_SQL = (
    f"WITH {COUNTS_CTE}, "
    "tot AS (SELECT cell_id, SUM(value) AS t FROM counts GROUP BY cell_id) "
    "SELECT c.cell_id, c.feat_id, ROUND({expr}, 6) AS norm_value "
    "FROM counts c JOIN tot ON c.cell_id = tot.cell_id"
)


@q("norm_lib_size", _LIBSIZE_SQL.format(expr="1000.0 * c.value / tot.t"))
def norm_lib_size(spark, sf_dir):
    return normalize.norm_lib_size(_ds(spark, sf_dir).counts(), sf=1000.0)


@q("norm_lib_size_log", _LIBSIZE_SQL.format(expr="LN(1 + 1000.0 * c.value / tot.t)"))
def norm_lib_size_log(spark, sf_dir):
    return normalize.norm_lib_size(_ds(spark, sf_dir).counts(), sf=1000.0, log=True)


@q(
    "norm_clr",
    f"WITH {COUNTS_CTE}, "
    f"geo AS (SELECT feat_id, EXP(SUM(LN(1 + value)) / {_N_CELLS_SQL}) AS g "
    "FROM counts GROUP BY feat_id) "
    "SELECT c.cell_id, c.feat_id, ROUND(LN(1 + c.value / geo.g), 6) AS norm_value "
    "FROM counts c JOIN geo ON c.feat_id = geo.feat_id",
)
def norm_clr(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return normalize.norm_clr(ds.counts(), n_cells=_n_cells(ds))


@q(
    "norm_tf_idf",
    f"WITH {COUNTS_CTE}, "
    "tot AS (SELECT cell_id, SUM(value) AS t FROM counts GROUP BY cell_id), "
    "df AS (SELECT feat_id, COUNT(*) FILTER (WHERE value > 0) AS d FROM counts GROUP BY feat_id) "
    "SELECT c.cell_id, c.feat_id, "
    f"ROUND((c.value / tot.t) * LOG2(1 + {_N_CELLS_SQL} / (df.d + 1.0)), 6) AS norm_value "
    "FROM counts c JOIN tot ON c.cell_id = tot.cell_id JOIN df ON c.feat_id = df.feat_id",
)
def norm_tf_idf(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    return normalize.norm_tf_idf(ds.counts(), n_cells=_n_cells(ds))


@q(
    "norm_renorm_subset",
    f"WITH {COUNTS_CTE}, "
    "sel AS (SELECT p_partkey AS feat_id FROM part WHERE p_size > 25), "
    "sub AS (SELECT c.* FROM counts c JOIN sel ON c.feat_id = sel.feat_id), "
    "tot AS (SELECT cell_id, SUM(value) AS t FROM sub GROUP BY cell_id) "
    "SELECT s.cell_id, s.feat_id, "
    "ROUND(1000.0 * s.value / (CASE WHEN tot.t != 0 THEN tot.t ELSE 1 END), 6) AS norm_value "
    "FROM sub s JOIN tot ON s.cell_id = tot.cell_id",
)
def norm_renorm_subset(spark, sf_dir):
    ds = _ds(spark, sf_dir)
    sel = ds.feat_table().where(F.col("size") > 25)
    return normalize.renormalize_subset(ds.counts(), sel, sf=1000.0)


@q(
    "norm_zscale",
    f"WITH {COUNTS_CTE}, "
    "st AS (SELECT feat_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sd "
    "FROM counts GROUP BY feat_id) "
    "SELECT c.cell_id, c.feat_id, "
    "ROUND(CASE WHEN st.sd != 0 THEN (c.value - st.mu) / st.sd ELSE 0.0 END, 6) AS z "
    "FROM counts c JOIN st ON c.feat_id = st.feat_id",
)
def norm_zscale(spark, sf_dir):
    return normalize.zscale_per_feature(_ds(spark, sf_dir).counts())


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship phase-0 spine (SURVEY.md §7): ingest → QC → filter_cells →
    normalize → pseudo-bulk means per (segment, brand)."""
    sf_dir = "/root/testdata/sf0.001"
    ds = DataStore(spark, sf_dir)
    counts = ds.counts()
    cells = ds.cell_table().join(qc.cell_qc(counts), "cell_id", "left_outer")
    cells = filters.filter_cells(cells, F.col("n_counts") > 0)
    valid = cells.where("I").select("cell_id", "custkey")
    normed = normalize.norm_lib_size(counts, sf=1000.0, log=True)
    seg = ds.customer.select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("segment")
    )
    brand = ds.feat_table().select("feat_id", "brand")
    return (
        normed.join(valid, "cell_id")
        .join(F.broadcast(seg), "custkey")
        .join(F.broadcast(brand), "feat_id")
        .groupBy("segment", "brand")
        .agg(F.round(F.avg("norm_value"), 6).alias("mean_norm"),
             F.count("*").alias("n_obs"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
