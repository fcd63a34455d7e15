"""Analytical core (SURVEY.md §2.10): dimensionality reduction,
clustering, HVG selection, metrics, pseudotime.

Split by execution locus:
  * distributed (MLlib / DataFrame): PCA, KMeans, HVG selection, label
    propagation, ARI/NMI contingency metrics — scale with the data.
  * driver_compute (explicitly marked): graph layouts, hierarchical
    cuts, pseudotime spectral steps — linear-size inputs (n·k edge
    lists), the same boundary the reference draws (SURVEY.md §7 hard
    parts: sequential SGD layouts and smallest-singular-value SVD are
    not distributable with stock Spark).
"""
