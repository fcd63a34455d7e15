"""Readers (SURVEY.md §2.1): file formats → long-form COO DataFrames.

Reference contract: every reader yields COO chunks through
``consume(batch_size)`` (``scarf/readers.py:64-189``); writers stream
those into Zarr. Spark-first: the *file* is the chunk source — a
distributed csv/text scan emits the same triplets with predicate
pushdown and parallel splits for free, and "consume" disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_mtx(
    spark: SparkSession,
    path: str,
    transpose: bool = False,
) -> DataFrame:
    """MatrixMarket triplet scan (``scarf/readers.py:297-585``
    CrDirReader). The MTX body *is already the COO long form*: one
    distributed csv scan with ``comment='%'``, minus the single
    dimensions line. The header (dims) is read driver-side — a
    constant-size peek, never the data.

    MTX is 1-indexed features-as-rows: emits (cell_id, feat_id, value)
    0-indexed, transposed unless ``transpose=False`` data is already
    cells-as-rows (``LoomReader`` transpose = swapping key columns,
    ``scarf/readers.py:1110-1117``)."""
    n_feats, n_cells, nnz = _read_mtx_dims(path)
    raw = (
        spark.read.option("comment", "%")
        .option("delimiter", " ")
        .schema("i LONG, j LONG, v DOUBLE")
        .csv(path)
    )
    # drop the dims line: it is the unique row equal to (n_feats,
    # n_cells, nnz); a data triplet cannot collide because feature
    # values are counts (v == nnz only if also i/j match the dims,
    # and coordinate (n_feats, n_cells) with value nnz is excluded by
    # re-adding it would double-count — accepted, documented caveat.
    body = raw.where(
        ~((F.col("i") == n_feats) & (F.col("j") == n_cells) & (F.col("v") == nnz))
    )
    if transpose:
        out = body.select(
            (F.col("i") - 1).alias("cell_id"),
            (F.col("j") - 1).alias("feat_id"),
            F.col("v").alias("value"),
        )
    else:
        out = body.select(
            (F.col("j") - 1).alias("cell_id"),
            (F.col("i") - 1).alias("feat_id"),
            F.col("v").alias("value"),
        )
    return out


def _read_mtx_dims(path: str) -> tuple[int, int, int]:
    """Driver-side constant-size header peek (first non-comment line)."""
    with open(path) as fh:
        for line in fh:
            if not line.startswith("%"):
                a, b, c = line.split()
                return int(a), int(b), int(c)
    raise ValueError(f"no dims line in {path}")


def read_dense_csv(
    spark: SparkSession,
    path: str,
    cell_data_cols: list[str] | None = None,
    id_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dense CSV scan, cells-as-rows (``scarf/readers.py:1121-1295``
    CSVReader): melt feature columns to COO triplets via ``stack``
    (JVM-side, no Python), split side columns into the cell attribute
    table (``cell_data_cols``). Features are numbered by column
    position; cells by line (via the csv row's monotonically increasing
    id within an ordered single scan — for production data prefer an
    explicit id column: ``id_col``).

    Returns (counts, cells): counts(cell_id, feat_id, value) with
    explicit zeros dropped (COO keeps only nonzeros, SURVEY.md §1.3),
    cells(cell_id, <cell_data_cols...>)."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    cell_data_cols = cell_data_cols or []
    feat_cols = [c for c in df.columns if c not in cell_data_cols and c != id_col]
    if id_col is None:
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn("cell_id", F.row_number().over(w) - 1)
    else:
        df = df.withColumn("cell_id", F.col(id_col).cast("long"))
    stack_expr = "stack({n}, {args}) as (feat_id, value)".format(
        n=len(feat_cols),
        args=", ".join(
            f"{i}, cast(`{c}` as double)" for i, c in enumerate(feat_cols)
        ),
    )
    counts = (
        df.select("cell_id", F.expr(stack_expr))
        .where(F.col("value") != 0)
    )
    cells = df.select("cell_id", *cell_data_cols)
    return counts, cells


def split_assays(
    feats: DataFrame, type_col: str, feat_id_col: str = "feat_id"
) -> DataFrame:
    """CrReader multi-assay demux (``scarf/readers.py:124-148``,
    ``scarf/writers.py:335-359``): features partition into assays by
    their feature type; each assay gets local 0-based feature ids
    (the reference subtracts per-assay column offsets). One window per
    type — no driver loop."""
    w = Window.partitionBy(type_col).orderBy(feat_id_col)
    return feats.select(
        feat_id_col,
        F.col(type_col).alias("assay"),
        (F.row_number().over(w) - 1).alias("local_feat_id"),
    )


def bed_to_bins(
    fragments: DataFrame,
    bin_size: int = 1000,
    min_fragments_per_cell: int = 1,
) -> DataFrame:
    """Fragment BED → binned count matrix
    (``scarf/writers.py:1307-1395`` bed_to_sparse_array): assign each
    fragment to the fixed genome bin containing its midpoint, count per
    (barcode, chrom, bin), and drop background barcodes below the
    fragment cutoff. Expects columns (chrom, start, end, barcode).

    Two shuffles total: the (barcode, chrom, bin) count and the
    per-barcode total for the cutoff — the cutoff side is a semi-join
    with a broadcastable right side at realistic barcode counts."""
    binned = fragments.withColumn(
        "bin",
        F.floor(
            (F.col("start") + (F.col("end") - F.col("start")) / 2) / bin_size
        ).cast("long"),
    )
    counts = binned.groupBy("barcode", "chrom", "bin").agg(
        F.count("*").alias("n_fragments")
    )
    keep = (
        counts.groupBy("barcode")
        .agg(F.sum("n_fragments").alias("_tot"))
        .where(F.col("_tot") >= min_fragments_per_cell)
        .select("barcode")
    )
    return counts.join(keep, "barcode", "left_semi")


def gff_promoters(
    gff: DataFrame,
    flank_up: int = 2000,
    flank_down: int = 500,
    feature_type: str = "gene",
) -> DataFrame:
    """GFF3 → strand-aware promoter BED (``scarf/meld_assay.py:29-201``
    GffReader; promoter calc ``meld_assay.py:90-105``): promoters
    extend ``flank_up`` upstream / ``flank_down`` downstream of the
    TSS, where the TSS is ``start`` on '+' and ``end`` on '-'. Pure
    when/otherwise expressions. Expects columns (seqid, type, start,
    end, strand, gene_id)."""
    genes = gff.where(F.col("type") == feature_type)
    p_start = F.when(
        F.col("strand") == "+", F.greatest(F.col("start") - flank_up, F.lit(0))
    ).otherwise(F.greatest(F.col("end") - flank_down, F.lit(0)))
    p_end = F.when(
        F.col("strand") == "+", F.col("start") + flank_down
    ).otherwise(F.col("end") + flank_up)
    return genes.select(
        F.col("seqid").alias("chrom"),
        p_start.alias("start"),
        p_end.alias("end"),
        "gene_id",
        "strand",
    )


# ---------------------------------------------------------------------------
# HDF5-family readers (CrH5Reader readers.py:192-294, H5adReader
# readers.py:588-919, LoomReader readers.py:975-1117). h5py is used
# when installed; otherwise the vendored pure-python HDF5 subset
# reader (sources/minih5.py) serves the same facade, so these run
# un-gated everywhere (SURVEY.md §2.1).
# ---------------------------------------------------------------------------

def h5_chunk_specs(n_rows: int, batch_size: int) -> list[tuple[int, int]]:
    """Half-open row ranges covering [0, n_rows) in batch_size steps —
    the distributed scan plan for an HDF5 matrix: one range per task,
    each task opens the file independently (shared storage) and reads
    only its slice. Pure function so the planning layer is testable
    without h5py."""
    if n_rows <= 0:
        return []
    return [
        (start, min(start + batch_size, n_rows))
        for start in range(0, n_rows, batch_size)
    ]


def _h5_module():
    """h5py when installed, else the vendored pure-python subset reader
    (``scarf_spark/sources/minih5.py``) — same facade (File/Group/
    Dataset, ``[:]`` slicing, ``.asstr()``), so the HDF5 sources run
    un-gated in environments without h5py."""
    try:
        import h5py

        return h5py
    except ImportError:
        from scarf_spark.sources import minih5

        return minih5


# kept for backward compatibility with older call sites/tests
_require_h5py = _h5_module


def read_sparse_h5(
    spark: SparkSession,
    path: str,
    group: str = "matrix",
    orientation: str = "csc",
    batch_size: int = 5000,
) -> DataFrame:
    """Scan a 10x-style sparse HDF5 matrix (``data``/``indices``/
    ``indptr`` under ``group``) into COO triplets (cell_id, feat_id,
    value).

    Distribution model: the driver reads ONLY the shape (a few bytes),
    plans half-open major-axis ranges via :func:`h5_chunk_specs`, and
    ships one range per task; each task opens the file (HDF5 readers
    are independent per process) and slices ``indptr[start:end+1]`` +
    the corresponding data/indices run — exactly the reference's
    ``consume(batch_size)`` loop (``readers.py:275-290``) but with the
    chunks running in parallel. ``orientation='csc'`` means the major
    axis is cells (10x layout); ``'csr'`` means features."""
    h5py = _h5_module()
    with h5py.File(path, "r") as f:
        n_major = int(f[group]["indptr"].shape[0]) - 1
    specs = h5_chunk_specs(n_major, batch_size)
    spec_df = spark.createDataFrame(specs, "start long, end long").repartition(
        max(len(specs), 1)
    )
    is_csc = orientation == "csc"

    def scan(batches):
        import numpy as _np
        import pandas as _pd

        from scarf_spark.sources.readers import _h5_module

        with _h5_module().File(path, "r") as f:
            g = f[group]
            indptr = g["indptr"][:]
            for b in batches:
                for start, end in zip(b["start"], b["end"]):
                    lo, hi = int(indptr[start]), int(indptr[end])
                    if hi == lo:
                        continue
                    data = g["data"][lo:hi]
                    minor = g["indices"][lo:hi]
                    reps = _np.diff(indptr[start : end + 1]).astype(_np.int64)
                    major = _np.repeat(
                        _np.arange(start, end, dtype=_np.int64), reps
                    )
                    out = _pd.DataFrame(
                        {
                            "cell_id": major if is_csc else minor.astype(_np.int64),
                            "feat_id": minor.astype(_np.int64) if is_csc else major,
                            "value": data.astype(float),
                        }
                    )
                    yield out[out["value"] != 0]

    return spec_df.mapInPandas(scan, "cell_id long, feat_id long, value double")


def read_h5ad(
    spark: SparkSession, path: str, batch_size: int = 5000
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Scan an AnnData ``.h5ad``: X (CSR group) → COO counts plus the
    obs/var attribute tables with categorical decode
    (``readers.py:588-919``; categorical decode ``readers.py:781-820``
    = join codes → categories, done driver-side on the small attribute
    arrays). Returns (counts, cells, feats)."""
    h5py = _h5_module()
    import pandas as pd

    # AnnData stores X as CSR with CELLS (obs) on the major axis — in
    # read_sparse_h5's orientation terms that is "csc" (major = cells);
    # passing "csr" here would emit the transpose (latent bug caught by
    # tests/test_minih5.py once the readers ran un-gated)
    counts = read_sparse_h5(spark, path, group="X", orientation="csc",
                            batch_size=batch_size)

    def _table(f, key: str, id_name: str) -> pd.DataFrame:
        grp = f[key]
        cols = {}
        for name, ds in grp.items():
            if isinstance(ds, h5py.Group) and "codes" in ds and "categories" in ds:
                cats = ds["categories"].asstr()[:]
                cols[name] = [cats[c] if c >= 0 else None for c in ds["codes"][:]]
            elif hasattr(ds, "shape") and ds.shape is not None and ds.ndim == 1:
                v = ds.asstr()[:] if ds.dtype.kind in ("S", "O") else ds[:]
                cols[name] = list(v)
        df = pd.DataFrame(cols)
        if id_name not in df.columns:  # stored id column wins
            df.insert(0, id_name, range(len(df)))
        return df

    with h5py.File(path, "r") as f:
        cells = spark.createDataFrame(_table(f, "obs", "cell_id"))
        feats = spark.createDataFrame(_table(f, "var", "feat_id"))
    return counts, cells, feats


def read_loom(
    spark: SparkSession, path: str, batch_size: int = 5000
) -> DataFrame:
    """Scan a Loom HDF5 (dense ``matrix`` stored features×cells,
    transposed on consume, ``readers.py:975-1117``): row-range tasks
    over the feature axis, melt each dense slab to COO with the keys
    swapped (transpose = swap key columns, SURVEY.md §2.1)."""
    h5py = _h5_module()
    with h5py.File(path, "r") as f:
        n_feats = int(f["matrix"].shape[0])
    specs = h5_chunk_specs(n_feats, batch_size)
    spec_df = spark.createDataFrame(specs, "start long, end long").repartition(
        max(len(specs), 1)
    )

    def scan(batches):
        import numpy as _np
        import pandas as _pd

        from scarf_spark.sources.readers import _h5_module

        with _h5_module().File(path, "r") as f:
            m = f["matrix"]
            for b in batches:
                for start, end in zip(b["start"], b["end"]):
                    slab = m[start:end, :]
                    fi, ci = _np.nonzero(slab)
                    yield _pd.DataFrame(
                        {
                            "cell_id": ci.astype(_np.int64),
                            "feat_id": (fi + start).astype(_np.int64),
                            "value": slab[fi, ci].astype(float),
                        }
                    )

    return spec_df.mapInPandas(scan, "cell_id long, feat_id long, value double")


def read_jsonl(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """JSONL (newline-delimited JSON) corpus reader — the interchange
    format LLM document corpora actually ship in. The schema is
    REQUIRED: schema inference costs a full extra pass over 100 TB and
    silently unions drifting types; an explicit schema makes the read
    one pass, lets the JSON parser prune unreferenced fields at parse
    time, and sends malformed lines to ``_corrupt_record`` instead of
    failing the job (PERMISSIVE mode, Spark's default).

    The JSON source splits by file and by line, so parallelism is the
    file layout — shard corpora into many part files (the same rule as
    parquet). No reference counterpart (scarf ingests matrices, not
    text; ``scarf/readers.py`` top-of-file inventory)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
