"""Plan/lineage layer (SURVEY.md §4).

The reference has no optimizer; its load-bearing "plan" machinery is
(a) result caching keyed by input identity (``scarf/assay.py:316-377``
subset_hash) and (b) lineage-based parameter defaults reconstructed
from cached paths (``scarf/datastore/graph_datastore.py:63-363``
_set_graph_params, latest_* pointers). Catalyst handles everything
else (pushdown, pruning, fusion) natively; this package supplies only
the custom pieces.
"""

from scarf_spark.plans.registry import (  # noqa: F401
    RunRegistry,
    params_hash,
    selection_hash,
)
