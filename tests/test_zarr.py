"""Zarr v2 source/sink: metadata parse, distributed chunk decode,
chunk-range pruning, COO sink roundtrip, reference-shaped store."""

import json
import os
import zlib

import numpy as np
import pytest

from scarf_spark.sources import zarr as z


@pytest.fixture(scope="module")
def spark():
    from scarf_spark.session import get_spark

    return get_spark("test-zarr", cpus=4, shuffle_partitions=4)


def _write_dense(tmp, arr, chunks, compressor={"id": "zlib", "level": 1}):
    """Driver-side reference writer used only by tests: writes every
    chunk (including all-zero ones) the plain-spec way."""
    d = str(tmp)
    z._write_array_meta(d, list(arr.shape), list(chunks), arr.dtype.str, compressor)
    cr, cc = chunks
    for ci in range(-(-arr.shape[0] // cr)):
        for cj in range(-(-arr.shape[1] // cc)):
            block = np.zeros((cr, cc), dtype=arr.dtype)
            part = arr[ci * cr : (ci + 1) * cr, cj * cc : (cj + 1) * cc]
            block[: part.shape[0], : part.shape[1]] = part
            with open(os.path.join(d, f"{ci}.{cj}"), "wb") as fh:
                fh.write(z._compress(block.tobytes(), compressor))


def test_roundtrip_2d(spark, tmp_path):
    rng = np.random.RandomState(7)
    a = (rng.rand(37, 23) < 0.2) * rng.randint(1, 9, (37, 23))
    a = a.astype("<u4")
    _write_dense(tmp_path / "arr", a, (16, 16))
    coo = z.read_zarr_2d_coo(spark, str(tmp_path / "arr")).collect()
    got = np.zeros_like(a)
    for r in coo:
        got[r.row, r.col] = r.value
    assert (got == a).all()
    assert len(coo) == int((a != 0).sum())


def test_missing_chunk_is_fill(spark, tmp_path):
    a = np.arange(1, 17, dtype="<f8").reshape(4, 4)
    _write_dense(tmp_path / "arr", a, (2, 2))
    os.remove(tmp_path / "arr" / "1.1")  # absent chunk == fill_value
    coo = z.read_zarr_2d_coo(spark, str(tmp_path / "arr")).collect()
    got = {(r.row, r.col): r.value for r in coo}
    assert (2, 2) not in got and (3, 3) not in got
    assert got[(0, 0)] == 1.0 and got[(1, 3)] == 8.0


def test_chunk_range_pruning(spark, tmp_path):
    a = np.ones((40, 40), dtype="<f8")
    _write_dense(tmp_path / "arr", a, (10, 10))
    df = z.read_zarr_2d_coo(
        spark, str(tmp_path / "arr"), row_range=(0, 10), col_range=(15, 25)
    )
    rows = df.collect()
    # exact bounds applied post-decode
    assert len(rows) == 10 * 10
    assert all(0 <= r.row < 10 and 15 <= r.col < 25 for r in rows)


def test_read_1d_types(spark, tmp_path):
    ids = np.array([10, 20, 30, 40, 50], dtype="<i8")
    z.write_zarr_1d(str(tmp_path / "ids"), ids, chunk=2)
    got = z.read_zarr_1d(spark, str(tmp_path / "ids")).orderBy("idx").collect()
    assert [r.value for r in got] == [10, 20, 30, 40, 50]
    names = np.array(["aa", "bb", "cc"], dtype="<U4")
    z.write_zarr_1d(str(tmp_path / "names"), names, chunk=2)
    got = z.read_zarr_1d(spark, str(tmp_path / "names")).orderBy("idx").collect()
    assert [r.value for r in got] == ["aa", "bb", "cc"]


def test_coo_sink_roundtrip(spark, tmp_path):
    rng = np.random.RandomState(3)
    n, m = 57, 33
    a = ((rng.rand(n, m) < 0.15) * rng.randint(1, 99, (n, m))).astype("<f8")
    rows, cols = np.nonzero(a)
    coo = spark.createDataFrame(
        [(int(r), int(c), float(a[r, c])) for r, c in zip(rows, cols)],
        "row long, col long, value double",
    )
    nchunks = z.coo_to_zarr(coo, str(tmp_path / "out"), (n, m), chunks=(16, 16))
    assert nchunks >= 1
    back = z.read_zarr_2d_coo(spark, str(tmp_path / "out")).collect()
    got = np.zeros_like(a)
    for r in back:
        got[r.row, r.col] = r.value
    assert np.array_equal(got, a)


def test_reference_shaped_store(spark, tmp_path):
    store = tmp_path / "store"
    cells = np.array([100, 200, 300], dtype="<i8")
    feats = np.array([7, 8], dtype="<i8")
    mat = np.array([[1, 0], [0, 5], [2, 3]], dtype="<f8")
    z.write_zarr_1d(str(store / "cellData" / "ids"), cells)
    z.write_zarr_1d(str(store / "RNA" / "featureData" / "ids"), feats)
    _write_dense(store / "RNA" / "counts", mat, (2, 2))
    out = z.read_zarr_store(spark, str(store))
    rows = {(r.cell_id, r.feat_id): r.value for r in out["counts"].collect()}
    assert rows == {(100, 7): 1.0, (200, 8): 5.0, (300, 7): 2.0, (300, 8): 3.0}


def test_unsupported_codec_gated(spark, tmp_path):
    # blosc now decodes natively (sources/blosc.py); zstd is the codec
    # that still needs numcodecs in this container
    d = tmp_path / "arr"
    z._write_array_meta(str(d), [2, 2], [2, 2], "<f8", {"id": "zlib", "level": 1})
    meta = json.load(open(d / ".zarray"))
    meta["compressor"] = {"id": "zstd", "level": 1}
    json.dump(meta, open(d / ".zarray", "w"))
    with open(d / "0.0", "wb") as fh:
        fh.write(zlib.compress(np.zeros((2, 2)).tobytes()))
    with pytest.raises(Exception, match="numcodecs"):
        z.read_zarr_2d_coo(spark, str(d)).collect()


def test_blosc_codec_zarr_chunk_decodes(spark, tmp_path):
    """A chunk written in the exact Blosc lz4+bitshuffle frame layout
    real scarf stores use (scarf/writers.py:81) decodes natively."""
    from scarf_spark.sources.blosc import blosc_encode

    d = tmp_path / "arr"
    z._write_array_meta(
        str(d), [2, 2], [2, 2], "<f8",
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 2},
    )
    vals = np.array([[1.5, 0.0], [0.0, 4.0]])
    with open(d / "0.0", "wb") as fh:
        fh.write(blosc_encode(vals.tobytes(), typesize=8, shuffle=2))
    got = {(r["row"], r["col"]): r["value"]
           for r in z.read_zarr_2d_coo(spark, str(d)).collect()}
    assert got == {(0, 0): 1.5, (1, 1): 4.0}


def test_read_zarr_table_joins_metadata_columns(spark, tmp_path):
    """A reference-shaped metadata group (one 1-D array per column,
    scarf/metadata.py:264-287) reads back as one table keyed by idx."""
    d = tmp_path / "cellData"
    z.write_zarr_1d(str(d / "ids"), np.arange(10, dtype="<i8") * 3, chunk=4)
    z.write_zarr_1d(str(d / "I"), np.array([i % 2 == 0 for i in range(10)]),
                    chunk=4)
    z.write_zarr_1d(str(d / "n_counts"),
                    np.linspace(1.0, 10.0, 10).astype("<f8"), chunk=4)
    t = z.read_zarr_table(spark, str(d))
    assert set(t.columns) == {"idx", "I", "ids", "n_counts"}
    rows = {r["idx"]: r for r in t.collect()}
    assert len(rows) == 10
    assert rows[3]["ids"] == 9 and rows[3]["I"] is False
    assert abs(rows[9]["n_counts"] - 10.0) < 1e-12
