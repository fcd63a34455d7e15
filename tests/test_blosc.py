"""Pure-python Blosc codec tests: LZ4 block format vectors, shuffle
transform semantics (against the published bitshuffle scalar
algorithm), frame roundtrips including the split-block layout default
c-blosc produces, and the Zarr integration path real scarf stores need
(``scarf/writers.py:81`` — Blosc lz4 + bitshuffle)."""

import struct

import numpy as np
import pytest

from scarf_spark.sources.blosc import (
    bit_shuffle,
    bit_unshuffle,
    blosc_decode,
    blosc_encode,
    byte_shuffle,
    byte_unshuffle,
    lz4_compress,
    lz4_decompress,
)


def test_lz4_roundtrip_shapes():
    rng = np.random.RandomState(3)
    cases = [
        b"",
        b"short",
        b"\x00" * 10_000,
        bytes(rng.randint(0, 256, 5_000, dtype=np.uint8)),  # incompressible
        b"abcabcabcabc" * 500 + b"tail",
        bytes(rng.randint(0, 4, 20_000, dtype=np.uint8)),
    ]
    for data in cases:
        assert lz4_decompress(lz4_compress(data), len(data)) == data


def test_lz4_handcrafted_overlapping_match():
    # token: 2 literals, matchlen 10-4=6 -> 0x26; literals "ab";
    # offset 2 -> overlapping copy repeats "ab" five times
    frame = bytes([0x26]) + b"ab" + struct.pack("<H", 2) + bytes([0x00])
    # final sequence: token 0x00 (no literals) is not required; build
    # the canonical form instead: end with a literals-only sequence
    frame = bytes([0x26]) + b"ab" + struct.pack("<H", 2) + bytes([0x10]) + b"Z"
    assert lz4_decompress(frame, 13) == b"ab" + b"ab" * 5 + b"Z"


def test_lz4_long_lengths():
    # literal run > 14 and match run > 18 exercise 255-continued bytes
    data = bytes(range(200)) + b"\x07" * 400
    enc = lz4_compress(data)
    assert lz4_decompress(enc, len(data)) == data
    assert len(enc) < len(data)


def test_byte_shuffle_known_and_tail():
    buf = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])  # 2 elems of 4 + 1 tail byte
    sh = byte_shuffle(buf, 4)
    assert sh == bytes([1, 5, 2, 6, 3, 7, 4, 8, 9])
    assert byte_unshuffle(sh, 4) == buf


def test_bit_shuffle_known_vector():
    # typesize 1, element 3 = 32 (bit 5): plane-5 byte gets bit 3
    buf = bytes([0, 0, 0, 32, 0, 0, 0, 0])
    sh = bit_shuffle(buf, 1)
    assert sh == bytes([0, 0, 0, 0, 0, 8, 0, 0])
    assert bit_unshuffle(sh, 1) == buf


def test_bit_shuffle_roundtrip_typesizes_and_tails():
    rng = np.random.RandomState(7)
    for typesize in (1, 2, 4, 8):
        for n_elem in (8, 64, 71, 1000):  # 71: size % 8 leftover path
            buf = bytes(
                rng.randint(0, 256, n_elem * typesize, dtype=np.uint8)
            ) + b"xy"[: n_elem % 2]  # ragged tail < typesize
            assert bit_unshuffle(bit_shuffle(buf, typesize), typesize) == buf


def test_blosc_frame_roundtrip_all_modes():
    rng = np.random.RandomState(11)
    dense = np.zeros(5000, dtype="<f8")
    dense[rng.choice(5000, 200, replace=False)] = rng.randn(200)
    data = dense.tobytes()
    for shuffle in (0, 1, 2):
        frame = blosc_encode(data, typesize=8, shuffle=shuffle)
        assert blosc_decode(frame) == data
        assert len(frame) < len(data)  # sparse floats must compress
    # multi-block path
    frame = blosc_encode(data, typesize=8, shuffle=2, blocksize=4096)
    assert blosc_decode(frame) == data
    # empty payload
    assert blosc_decode(blosc_encode(b"", typesize=8)) == b""


def test_blosc_decode_memcpy_flag():
    data = b"0123456789abcdef"
    frame = (
        struct.pack("<BBBB", 2, 1, 0x2, 1)
        + struct.pack("<III", len(data), len(data), 16 + len(data))
        + data
    )
    assert blosc_decode(frame) == data


def test_blosc_decode_split_byte_shuffled_block():
    """Default c-blosc splits byte-shuffled blocks into one stream per
    byte lane (no DONT_SPLIT flag); the decoder must reassemble them."""
    rng = np.random.RandomState(5)
    vals = (rng.randn(512) * 3).astype("<f4")
    data = vals.tobytes()
    typesize = 4
    sh = byte_shuffle(data, typesize)
    neblock = len(sh) // typesize
    streams = b""
    for lane in range(typesize):
        part = sh[lane * neblock : (lane + 1) * neblock]
        c = lz4_compress(part)
        if len(c) >= neblock:
            streams += struct.pack("<i", neblock) + part
        else:
            streams += struct.pack("<i", len(c)) + c
    flags = (1 << 5) | 0x1  # lz4, byte-shuffle, splits allowed
    frame = (
        struct.pack("<BBBB", 2, 1, flags, typesize)
        + struct.pack("<III", len(data), len(data), 20 + len(streams))
        + struct.pack("<i", 20)
        + streams
    )
    assert blosc_decode(frame) == data


def _cblosc_frame(data: bytes, typesize: int, blocksize: int, shuffle_flag: int) -> bytes:
    """Build a frame the way REAL c-blosc (FORWARD_COMPAT split mode,
    what numcodecs links) lays it out: every full block is split into
    ``typesize`` lz4 streams regardless of shuffle mode, and the
    trailing partial block is ALWAYS a single stream — even when its
    size divides evenly by typesize (c-blosc's leftoverblock rule)."""
    nbytes = len(data)
    nblocks = -(-nbytes // blocksize)
    shuf = bit_shuffle if shuffle_flag == 0x4 else byte_shuffle
    payload = b""
    bstarts = []
    base = 16 + 4 * nblocks
    for bi in range(nblocks):
        block = data[bi * blocksize : bi * blocksize + blocksize]
        sh = shuf(block, typesize)
        nsplits = typesize if len(block) == blocksize else 1
        neblock = len(block) // nsplits
        bstarts.append(base + len(payload))
        for lane in range(nsplits):
            part = sh[lane * neblock : (lane + 1) * neblock]
            c = lz4_compress(part)
            if len(c) >= neblock:
                payload += struct.pack("<i", neblock) + part
            else:
                payload += struct.pack("<i", len(c)) + c
    flags = (1 << 5) | shuffle_flag  # lz4, splits allowed (no DONT_SPLIT)
    return (
        struct.pack("<BBBB", 2, 1, flags, typesize)
        + struct.pack("<III", nbytes, blocksize, base + len(payload))
        + struct.pack(f"<{nblocks}i", *bstarts)
        + payload
    )


def test_blosc_decode_cblosc_split_bitshuffle_multiblock():
    """Real scarf stores are Blosc lz4 + BITSHUFFLE (scarf/writers.py:81)
    written by c-blosc, whose split decision ignores the shuffle mode:
    bitshuffled blocks are split per byte-lane too. The tail block here
    is 512 bytes (divisible by typesize=4) to pin the leftoverblock
    rule: a partial block is unsplit even when it divides evenly."""
    rng = np.random.RandomState(11)
    vals = (rng.randn(640) * 3).astype("<f4")  # 2560 B = 2×1024 + 512 tail
    data = vals.tobytes()
    frame = _cblosc_frame(data, typesize=4, blocksize=1024, shuffle_flag=0x4)
    assert blosc_decode(frame) == data


def test_blosc_decode_cblosc_split_byteshuffle_even_tail():
    data = np.arange(1280, dtype="<i8").tobytes()  # 10240 B: 2×4096 + 2048 tail
    frame = _cblosc_frame(data, typesize=8, blocksize=4096, shuffle_flag=0x1)
    assert blosc_decode(frame) == data


def test_blosc_decode_zlib_codec():
    import zlib

    data = np.arange(1000, dtype="<i8").tobytes()
    comp = zlib.compress(data, 5)
    flags = (3 << 5) | 0x10  # zlib codec, dont-split, no shuffle
    frame = (
        struct.pack("<BBBB", 2, 1, flags, 8)
        + struct.pack("<III", len(data), len(data), 24 + len(comp))
        + struct.pack("<i", 20)
        + struct.pack("<i", len(comp))
        + comp
    )
    assert blosc_decode(frame) == data


def test_zarr_blosc_roundtrip(spark, tmp_path):
    from scarf_spark.sources import zarr as z

    comp = {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 2}
    ids = np.arange(100, dtype="<i8") * 7
    d1 = str(tmp_path / "ids")
    z.write_zarr_1d(d1, ids, chunk=32, compressor=comp)
    got = {r["idx"]: r["value"] for r in z.read_zarr_1d(spark, d1).collect()}
    assert got == {i: int(v) for i, v in enumerate(ids)}

    rows = [(0, 0, 1.5), (3, 100, 2.0), (1999, 255, 4.0), (512, 40, 9.0)]
    coo = spark.createDataFrame(rows, "row long, col long, value double")
    d2 = str(tmp_path / "mat")
    n = z.coo_to_zarr(coo, d2, (2000, 256), chunks=(1000, 128), compressor=comp)
    assert n == 2  # chunks (0,0) and (1,1) are occupied
    back = {(r["row"], r["col"]): r["value"]
            for r in z.read_zarr_2d_coo(spark, d2).collect()}
    assert back == {(r, c): v for r, c, v in rows}
