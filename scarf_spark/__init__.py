"""scarf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference single-cell engine
(parashardhapola/scarf), re-expressed Spark-first.

Data model (SURVEY.md §1):
  counts(cell_id, feat_id, value)  — sparse COO fact table (zeros absent)
  cells(cell_id, ..., I)           — cell dimension table, boolean validity col
  feats(feat_id, ..., I)           — feature dimension table
  edges(src, dst, rank, distance, weight) — KNN graph

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
column pruning, broadcast selection and AQE; Python touches data only
through Arrow-vectorized pandas UDFs on the few non-relational kernels.
"""

__version__ = "0.1.0"

from scarf_spark.session import get_spark
from scarf_spark.catalog import DataStore
