"""DataStore — the catalog/session object (SURVEY.md §1.1).

The reference's DataStore is a Zarr-hierarchy handle exposing assays +
attribute tables (``scarf/datastore/base_datastore.py:48-104``). Here it
is a thin catalog over parquet tables in a directory: each table is a
DataFrame, lazily loaded and cached, registered as a temp view so both
the DataFrame API and ``spark.sql`` work against it.

The star-schema testdata doubles as the single-cell model via
:meth:`DataStore.counts`: lineitem rows are COO triplets
(cell=l_orderkey, feature=l_partkey, value=l_quantity), orders is the
cell attribute table, part the feature attribute table. All scarf
operators in ``scarf_spark.operators`` are generic over (cell_id,
feat_id, value) column names, so they run unchanged on a real
single-cell COO table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _parquet_ts_is_nanos(path: str) -> bool:
    """True iff the parquet file/dir at ``path`` stores its ``ts``
    column as TIMESTAMP(NANOS) — a footer-only probe (no row reads)."""
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
        field = schema.field("ts") if "ts" in schema.names else None
        return field is not None and str(field.type) == "timestamp[ns]"
    except Exception:  # noqa: BLE001 — fall back to the legacy-safe path
        return True


class DataStore:
    """Catalog over a directory of parquet tables.

    Mirrors the reference DataStore's role as the user-facing session
    object holding assays + attribute tables
    (``scarf/datastore/base_datastore.py:48-104``).
    """

    def __init__(self, spark: SparkSession, sf_dir: str, register_views: bool = False):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        if register_views:
            for t in self.table_names():
                self.table(t).createOrReplaceTempView(t)

    def table_names(self) -> list[str]:
        return [t for t in TABLES if os.path.exists(os.path.join(self.sf_dir, f"{t}.parquet"))]

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if name == "events":
                # events.parquet may store TIMESTAMP(NANOS), which Spark's
                # vectorized reader rejects. Probe the footer first and
                # only flip the legacy conf when nanos are actually
                # present (the conf must then stay set for the lifetime
                # of the session's scans of this file); micros-typed
                # testdata leaves session conf untouched.
                if _parquet_ts_is_nanos(path):
                    self.spark.conf.set(
                        "spark.sql.legacy.parquet.nanosAsLong", "true"
                    )
                df = self.spark.read.parquet(path)
                if dict(df.dtypes).get("ts") in ("bigint", "long"):
                    df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
                self._cache[name] = df
            else:
                self._cache[name] = self.spark.read.parquet(path)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    # ---- single-cell view of the star schema -------------------------------

    def counts(self) -> DataFrame:
        """Canonical sparse COO fact table (SURVEY.md §1.1 Assay).

        lineitem may hold several rows per (order, part); the canonical
        COO has one row per (cell, feature) with summed value — sums of
        small integers stay exact in double.

        Materialized ONCE per store and reused by every operator: the
        reference writes the assay matrix to Zarr a single time
        (``scarf/writers.py:172-266``) and every downstream step reads
        that store, never the raw input again. Here that is a lazy
        ``persist()`` — the first action pays the derivation shuffle,
        every later query reads the columnar cache. At warehouse scale
        the same role is played by the bucketed tables written by
        ``tools/materialize.py`` (disk-backed, shuffle-free joins);
        the in-memory persist is the session-local equivalent.
        """
        if "_counts" not in self._cache:
            li = self.table("lineitem")
            self._cache["_counts"] = (
                li.groupBy(
                    F.col("l_orderkey").alias("cell_id"),
                    F.col("l_partkey").alias("feat_id"),
                )
                .agg(F.sum("l_quantity").cast("double").alias("value"))
                .persist()
            )
        return self._cache["_counts"]

    def cell_table(self) -> DataFrame:
        """Cell attribute table (MetaData, ``scarf/metadata.py:35-54``)."""
        return self.table("orders").select(
            F.col("o_orderkey").alias("cell_id"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("totalprice"),
            F.lit(True).alias("I"),
        )

    def feat_table(self) -> DataFrame:
        """Feature attribute table."""
        return self.table("part").select(
            F.col("p_partkey").alias("feat_id"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
            F.lit(True).alias("I"),
        )


# Oracle-SQL fragment mirroring DataStore.counts for DuckDB checks.
COUNTS_CTE = (
    "counts AS (SELECT l_orderkey AS cell_id, l_partkey AS feat_id, "
    "CAST(SUM(l_quantity) AS DOUBLE) AS value FROM lineitem GROUP BY 1, 2)"
)
