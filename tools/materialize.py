"""Materialize the star schema into a bucketed warehouse.

At 100 TB the COO fact table is not re-derived per query (the reference
stores it once in Zarr); it is written ONCE, bucketed on its join keys,
so every cell-keyed aggregation/join afterwards reads co-located
buckets and skips the shuffle. This tool performs that materialization
for a testdata sf dir:

  * ``counts`` bucketed by cell_id   (QC aggs, cell joins)
  * ``counts_by_feat`` bucketed by feat_id (feature stats, HVG — the
    reference's "prenormed" feature-major projection, SURVEY.md §4)
  * ``cells``/``feats`` dimension tables plain parquet (broadcast-size)

Usage: python tools/materialize.py [sf_dir] [warehouse_dir] [n_buckets]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(spark, sf_dir: str, n_buckets: int = 32) -> dict[str, str]:
    """Write the bucketed tables into the session warehouse; returns
    {logical name: table name}. Idempotent per (sf tag, bucket count)."""
    from scarf_spark.catalog import DataStore

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ds = DataStore(spark, sf_dir)
    counts = ds.counts()
    out = {}
    for name, keys, sort in (
        (f"counts_{tag}", ["cell_id"], ["cell_id", "feat_id"]),
        (f"counts_by_feat_{tag}", ["feat_id"], ["feat_id", "cell_id"]),
    ):
        if not spark.catalog.tableExists(name):
            (
                counts.write.bucketBy(n_buckets, *keys)
                .sortBy(*sort)
                .mode("overwrite")
                .saveAsTable(name)
            )
        out["counts" if keys == ["cell_id"] else "counts_by_feat"] = name
    return out


def main() -> int:
    from scarf_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    warehouse = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_warehouse"
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .getOrCreate()
    )
    tables = materialize(spark, sf_dir, n_buckets)
    for logical, table in tables.items():
        print(f"{logical}: {table} rows={spark.table(table).count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
