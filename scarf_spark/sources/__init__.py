"""Scans/sources (SURVEY.md §2.1) and sinks (§2.2).

Every reference reader exposes the same contract — dims + a chunked
COO generator (``scarf/readers.py:64-189``). The Spark-native contract
is: each reader returns a long-form ``(cell_id, feat_id, value)``
DataFrame plus optional attribute DataFrames; Spark's task model
replaces the chunk loop, and writes are ordinary distributed writes.
"""

from scarf_spark.sources.readers import (  # noqa: F401
    bed_to_bins,
    gff_promoters,
    read_dense_csv,
    read_mtx,
    split_assays,
)
from scarf_spark.sources.sinks import (  # noqa: F401
    export_knn_to_mtx,
    subset_assay,
    to_mtx,
    to_wide,
)
