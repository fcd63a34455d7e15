"""Zarr v2 store source/sink — the reference's database format.

The reference engine's "database" IS a Zarr hierarchy: a chunked 2-D
``counts`` array per assay plus 1-D attribute arrays under ``cellData``
/ ``featureData`` (``scarf/utils.py:156-164`` ``load_zarr``;
``scarf/writers.py:58-89`` ``create_zarr_dataset``, matrix creation
``scarf/writers.py:164-204``).  This module lets the Spark engine
ingest that store format directly and write it back:

* **Reader** — pure-python Zarr v2 metadata parse (``.zarray`` JSON) +
  a DISTRIBUTED chunk decode: the chunk grid becomes a small task
  DataFrame (one row per chunk file) and ``mapInPandas`` decodes each
  chunk executor-side into COO triplets, dropping fill-value entries.
  Chunk-range pruning (row/col bounds) prunes tasks BEFORE any byte is
  read — the Zarr analog of parquet partition pruning; at 100 TB the
  task list stays tiny (one row per ~4 MB chunk) while all byte I/O
  and decode happens on executors.
* **Sink** — ``coo_to_zarr`` groups COO triplets by chunk coordinate
  (one shuffle), densifies each chunk in ``applyInPandas``, compresses
  and writes the chunk file from the executor; array metadata is a
  driver-side JSON write.  This mirrors ``CrToZarr.dump``'s streaming
  coordinate writes (``scarf/writers.py:245-364``) with Spark tasks as
  the writers.

Codecs: Zarr ``compressor: null``, ``zlib`` and ``gzip`` decode with
the stdlib; **Blosc (lz4 + byte/bit shuffle) — what every real scarf
store uses (``scarf/writers.py:81``) — decodes and encodes natively**
via the pure-python frame codec in ``sources/blosc.py``; anything else
(zstd) is delegated to ``numcodecs`` when importable and raises a
clearly-gated error otherwise.  No structural limitation — the
chunk-task plan is codec-agnostic.
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import zlib as _zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_zarr_2d_coo",
    "read_zarr_1d",
    "read_zarr_table",
    "read_zarr_store",
    "coo_to_zarr",
    "write_zarr_1d",
    "zarr_array_meta",
]


# ---------------------------------------------------------------------------
# metadata + codec plumbing (pure python, runs driver- or executor-side)
# ---------------------------------------------------------------------------


def zarr_array_meta(array_dir: str) -> dict:
    """Parse a Zarr v2 array's ``.zarray`` metadata file."""
    with open(os.path.join(array_dir, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"not a Zarr v2 array: {array_dir}")
    if meta.get("order", "C") != "C":
        raise NotImplementedError("Fortran-order Zarr arrays not supported")
    if meta.get("filters"):
        raise NotImplementedError("Zarr filter pipelines not supported")
    return meta


def _decompress(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return _zlib.decompress(raw)
    if cid == "gzip":
        return _gzip.decompress(raw)
    if cid == "blosc":
        # what every real scarf store uses (scarf/writers.py:81 —
        # Blosc lz4 + bitshuffle); the frame is self-describing, so
        # the cname/clevel/shuffle fields need no interpretation here
        from scarf_spark.sources.blosc import blosc_decode

        try:
            return blosc_decode(raw)
        except (ValueError, NotImplementedError):
            # frames the from-scratch codec can't handle (zstd/snappy
            # inner codec ids, exotic split layouts) — fall back to the
            # real codec lib when present instead of failing outright
            try:
                import numcodecs
            except ImportError:
                raise
            return numcodecs.get_codec(compressor).decode(raw)
    try:  # zstd etc. — delegate when the real codec lib exists
        import numcodecs

        return numcodecs.get_codec(compressor).decode(raw)
    except ImportError:
        raise NotImplementedError(
            f"Zarr codec {cid!r} needs numcodecs (not installed); "
            "zlib/gzip/blosc-lz4 decode natively"
        ) from None


def _compress(raw: bytes, compressor: dict | None, itemsize: int = 1) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "zlib":
        return _zlib.compress(raw, compressor.get("level", 1))
    if cid == "gzip":
        return _gzip.compress(raw, compressor.get("level", 1))
    if cid == "blosc":
        from scarf_spark.sources.blosc import blosc_encode

        if compressor.get("cname", "lz4") not in ("lz4", "lz4hc"):
            raise NotImplementedError("blosc writer supports cname=lz4 only")
        return blosc_encode(
            raw,
            typesize=itemsize,
            shuffle=int(compressor.get("shuffle", 2)),
            blocksize=int(compressor.get("blocksize", 0)),
        )
    raise NotImplementedError(f"writing Zarr codec {cid!r} not supported")


def _chunk_grid(shape: list[int], chunks: list[int]) -> list[tuple[int, ...]]:
    """All chunk coordinates of the array (missing files = fill_value)."""
    counts = [-(-s // c) for s, c in zip(shape, chunks)]
    if len(counts) == 1:
        return [(i,) for i in range(counts[0])]
    if len(counts) == 2:
        return [(i, j) for i in range(counts[0]) for j in range(counts[1])]
    raise NotImplementedError(">2-D Zarr arrays not supported")


def _chunk_path(array_dir: str, coord: tuple[int, ...], sep: str) -> str:
    return os.path.join(array_dir, sep.join(str(c) for c in coord))


def _decode_chunk(
    path: str, meta: dict, coord: tuple[int, ...]
) -> np.ndarray | None:
    """Decode one chunk file to its (edge-trimmed) ndarray, or None if
    the chunk file is absent (pure fill_value)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = _decompress(raw, meta.get("compressor"))
    arr = np.frombuffer(buf, dtype=np.dtype(meta["dtype"]))
    chunks, shape = meta["chunks"], meta["shape"]
    arr = arr.reshape(chunks)
    # edge chunks are stored full-size and padded; trim to the array
    trim = tuple(
        slice(0, min(chunks[d], shape[d] - coord[d] * chunks[d]))
        for d in range(len(shape))
    )
    return arr[trim]


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------


def read_zarr_2d_coo(
    spark: SparkSession,
    array_dir: str,
    row_range: tuple[int, int] | None = None,
    col_range: tuple[int, int] | None = None,
    drop_fill: bool = True,
) -> DataFrame:
    """Distributed scan of a 2-D Zarr array into COO triplets
    ``(row LONG, col LONG, value DOUBLE)``.

    The driver reads ONLY the ~300-byte ``.zarray`` metadata; chunk
    bytes are opened, decompressed and decoded on executors via
    ``mapInPandas`` over a chunk-task DataFrame (one row per chunk).
    ``row_range``/``col_range`` (half-open) prune chunk tasks before
    any data I/O — partition pruning for the Zarr layout.  Fill-value
    entries (the ~95% zeros of a counts matrix) are dropped inside the
    decode loop, so only the sparse triplets ever hit a shuffle.
    """
    meta = zarr_array_meta(array_dir)
    if len(meta["shape"]) != 2:
        raise ValueError(f"expected 2-D array, got shape {meta['shape']}")
    sep = meta.get("dimension_separator", ".")
    cr, cc = meta["chunks"]
    tasks = _chunk_grid(meta["shape"], meta["chunks"])
    if row_range is not None:
        tasks = [t for t in tasks if t[0] * cr < row_range[1] and (t[0] + 1) * cr > row_range[0]]
    if col_range is not None:
        tasks = [t for t in tasks if t[1] * cc < col_range[1] and (t[1] + 1) * cc > col_range[0]]
    if not tasks:
        return spark.createDataFrame([], "row long, col long, value double")
    # one chunk per task, parallelized at creation: a repartition()
    # here cost a full (sorted) shuffle of the task list per array read
    task_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(i), int(j)) for i, j in tasks], min(len(tasks), 64)
        ),
        "ci int, cj int",
    )
    try:  # meta may carry "NaN"/null/garbage; counts default to 0
        fill = float(meta.get("fill_value") or 0)
    except (TypeError, ValueError):
        fill = 0.0
    meta_b = json.dumps(meta)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = json.loads(meta_b)
        for b in batches:
            for ci, cj in zip(b["ci"], b["cj"]):
                coord = (int(ci), int(cj))
                arr = _decode_chunk(_chunk_path(array_dir, coord, sep), m, coord)
                if arr is None:
                    continue
                a = arr.astype(np.float64, copy=False)
                if drop_fill:
                    rows, cols = np.nonzero(a != fill)
                else:
                    rows, cols = np.meshgrid(
                        np.arange(a.shape[0]), np.arange(a.shape[1]), indexing="ij"
                    )
                    rows, cols = rows.ravel(), cols.ravel()
                yield pd.DataFrame(
                    {
                        "row": rows.astype(np.int64) + coord[0] * m["chunks"][0],
                        "col": cols.astype(np.int64) + coord[1] * m["chunks"][1],
                        "value": a[rows, cols],
                    }
                )

    out = task_df.mapInPandas(decode, "row long, col long, value double")
    if row_range is not None:
        out = out.where((F.col("row") >= row_range[0]) & (F.col("row") < row_range[1]))
    if col_range is not None:
        out = out.where((F.col("col") >= col_range[0]) & (F.col("col") < col_range[1]))
    return out


def read_zarr_1d(spark: SparkSession, array_dir: str, value_type: str | None = None) -> DataFrame:
    """Distributed scan of a 1-D Zarr attribute array into
    ``(idx LONG, value <T>)`` — the cells/feats attribute columns of
    the reference store (``scarf/metadata.py:264-287``: one 1-D array
    per column)."""
    meta = zarr_array_meta(array_dir)
    if len(meta["shape"]) != 1:
        raise ValueError(f"expected 1-D array, got shape {meta['shape']}")
    sep = meta.get("dimension_separator", ".")
    tasks = _chunk_grid(meta["shape"], meta["chunks"])
    np_dtype = np.dtype(meta["dtype"])
    if value_type is None:
        if np_dtype.kind in "iu":
            value_type = "long"
        elif np_dtype.kind == "f":
            value_type = "double"
        elif np_dtype.kind == "b":
            value_type = "boolean"
        else:
            value_type = "string"
    task_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(i),) for i, in tasks], min(len(tasks), 64)
        ),
        "ci int",
    )
    meta_b = json.dumps(meta)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = json.loads(meta_b)
        for b in batches:
            for ci in b["ci"]:
                coord = (int(ci),)
                arr = _decode_chunk(_chunk_path(array_dir, coord, sep), m, coord)
                if arr is None:
                    n_fill = min(m["chunks"][0], m["shape"][0] - ci * m["chunks"][0])
                    dt = np.dtype(m["dtype"])
                    fv = m.get("fill_value")
                    if dt.kind in "iufb":  # numeric/bool: coerce, default 0
                        arr = np.full(n_fill, fv or 0, dtype=dt)
                    else:  # strings etc.: zeros() gives empty values, not "0"
                        arr = (np.full(n_fill, fv, dtype=dt) if fv
                               else np.zeros(n_fill, dtype=dt))
                yield pd.DataFrame(
                    {
                        "idx": np.arange(len(arr), dtype=np.int64)
                        + int(ci) * m["chunks"][0],
                        "value": arr,
                    }
                )

    return task_df.mapInPandas(decode, f"idx long, value {value_type}")


def read_zarr_table(spark: SparkSession, group_dir: str) -> DataFrame:
    """All 1-D arrays under a Zarr group as ONE DataFrame keyed by
    ``idx`` — the reference's MetaData table layout
    (``scarf/metadata.py:264-287``: one array per column, so
    ``cellData/`` holds ids, I, names, per-cell QC columns side by
    side). Each column is a distributed 1-D chunk scan; columns join
    on the dense index (dimension-sized tables — broadcastable; bucket
    by idx if a 10⁸-cell store makes the join chain matter)."""
    cols = sorted(
        d
        for d in os.listdir(group_dir)
        if os.path.exists(os.path.join(group_dir, d, ".zarray"))
    )
    if not cols:
        raise ValueError(f"no 1-D arrays under {group_dir}")
    out = None
    for c in cols:
        df = read_zarr_1d(spark, os.path.join(group_dir, c)).withColumnRenamed(
            "value", c
        )
        out = df if out is None else out.join(df, "idx")
    return out


def read_zarr_store(spark: SparkSession, store_dir: str, assay: str = "RNA") -> dict:
    """Open a reference-shaped Zarr store: returns ``{"counts", "cells",
    "feats"}`` DataFrames with the COO indices resolved to stored ids.

    Layout (mirrors ``scarf/writers.py`` / ``scarf/assay.py:134``):
    ``<store>/<assay>/counts`` 2-D, ``<store>/cellData/ids`` and
    ``<store>/<assay>/featureData/ids`` 1-D.  The feature id array is
    domain-bounded and joins hint-broadcast; the CELL id array is
    node-sized (one row per cell), so it joins without a hint — AQE
    broadcasts it when small, and above the threshold the fact scan
    shuffles on the row key like any n-scaled join.
    """
    counts_idx = read_zarr_2d_coo(spark, os.path.join(store_dir, assay, "counts"))
    cells = read_zarr_1d(spark, os.path.join(store_dir, "cellData", "ids"))
    feats = read_zarr_1d(
        spark, os.path.join(store_dir, assay, "featureData", "ids")
    )
    counts = (
        counts_idx.join(
            cells.select(F.col("idx").alias("row"), F.col("value").alias("cell_id")),
            "row",
        )
        .join(
            F.broadcast(feats.select(F.col("idx").alias("col"), F.col("value").alias("feat_id"))),
            "col",
        )
        .select("cell_id", "feat_id", "value")
    )
    return {"counts": counts, "cells": cells, "feats": feats}


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

_DEF_COMPRESSOR = {"id": "zlib", "level": 1}


def _write_array_meta(
    array_dir: str,
    shape: list[int],
    chunks: list[int],
    dtype: str,
    compressor: dict | None,
    fill_value=0,
) -> None:
    os.makedirs(array_dir, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "compressor": dict(compressor) if compressor else None,
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    with open(os.path.join(array_dir, ".zarray"), "w") as fh:
        json.dump(meta, fh)


def write_zarr_1d(
    array_dir: str, values: np.ndarray, chunk: int = 100_000, compressor: dict | None = _DEF_COMPRESSOR
) -> None:
    """Driver-side 1-D attribute array write (dimension-sized data —
    ids/names/validity columns are one entry per cell/feature, the same
    driver-sized boundary the reference draws for metadata columns)."""
    values = np.asarray(values)
    dtype = values.dtype.str
    _write_array_meta(array_dir, [len(values)], [chunk], dtype, compressor)
    for ci in range(-(-len(values) // chunk)):
        part = values[ci * chunk : (ci + 1) * chunk]
        if len(part) < chunk:  # pad edge chunk to full size per spec
            part = np.concatenate(
                [part, np.zeros(chunk - len(part), dtype=values.dtype)]
            )
        with open(os.path.join(array_dir, str(ci)), "wb") as fh:
            fh.write(_compress(part.tobytes(), compressor, values.dtype.itemsize))


def coo_to_zarr(
    coo: DataFrame,
    array_dir: str,
    shape: tuple[int, int],
    chunks: tuple[int, int] = (1000, 1000),
    row_col: str = "row",
    col_col: str = "col",
    value_col: str = "value",
    dtype: str = "<f8",
    compressor: dict | None = _DEF_COMPRESSOR,
) -> int:
    """Distributed COO → 2-D Zarr sink.

    ONE shuffle: triplets are grouped by chunk coordinate
    ``(floor(row/cr), floor(col/cc))`` and each group densifies its own
    chunk ndarray in ``applyInPandas``, compresses it and writes the
    chunk file from the executor (shared filesystem on a cluster, local
    disk here).  Chunk files for all-fill regions are simply not
    written — the Zarr spec reads them as fill_value, so a 95%-sparse
    100 TB matrix writes only the ~5% occupied chunks.  Mirrors the
    chunked coordinate writes of ``CrToZarr.dump``
    (``scarf/writers.py:335-359``).  Returns the number of chunk files
    written.
    """
    cr, cc = chunks
    _write_array_meta(array_dir, list(shape), list(chunks), dtype, compressor)
    tagged = coo.select(
        F.floor(F.col(row_col) / cr).cast("int").alias("ci"),
        F.floor(F.col(col_col) / cc).cast("int").alias("cj"),
        (F.col(row_col) % cr).cast("int").alias("ri"),
        (F.col(col_col) % cc).cast("int").alias("rj"),
        F.col(value_col).cast("double").alias("v"),
    )
    np_dtype = dtype
    sep = "."

    def write_chunk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ci, cj = int(key[0]), int(key[1])
        arr = np.zeros((cr, cc), dtype=np.dtype(np_dtype))
        arr[pdf["ri"].to_numpy(), pdf["rj"].to_numpy()] = pdf["v"].to_numpy()
        path = _chunk_path(array_dir, (ci, cj), sep)
        with open(path, "wb") as fh:
            fh.write(_compress(arr.tobytes(), compressor, arr.dtype.itemsize))
        return pd.DataFrame({"ci": [ci], "cj": [cj], "nnz": [len(pdf)]})

    written = (
        tagged.groupBy("ci", "cj")
        .applyInPandas(write_chunk, "ci int, cj int, nnz long")
        .count()
    )
    return int(written)
