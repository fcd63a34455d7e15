"""Pure-python Blosc v1 frame codec (LZ4 + byte/bit shuffle).

Every real scarf store is written with Blosc ``lz4`` + bitshuffle
(``scarf/writers.py:81``: ``Blosc(cname="lz4", clevel=5,
shuffle=Blosc.BITSHUFFLE)``), so ingesting an existing store must
decode that format even where ``numcodecs``/``python-blosc`` are not
installed. This module implements the publicly documented formats from
scratch:

* **LZ4 block format** (lz4.github.io/lz4/lz4_Block_format.html):
  token(4b literal len | 4b match len-4), 255-continued length bytes,
  2-byte LE match offset, overlapping match copies. The compressor is
  a greedy 4-byte hash matcher — spec-valid output, tuned for the
  zero-heavy buffers bitshuffle produces, not for ratio records.
* **Byte / bit shuffle** exactly as c-blosc applies them per block
  (``c-blosc/blosc/shuffle.c``, ``bitshuffle.c`` — the kiyo-masui
  bitshuffle transform: byte-transpose within elements, 8×8 bit
  transpose, bit-row regroup; trailing ``size % 8`` elements and
  ``blocksize % typesize`` bytes are copied unshuffled, matching the
  C reference's leftover handling). Vectorized with
  ``np.unpackbits/packbits(bitorder="little")``.
* **Blosc v1 frame** (``c-blosc/README_HEADER.rst``): 16-byte header
  (version, versionlz, flags, typesize, nbytes, blocksize, cbytes LE)
  + int32 block offsets + per-block split streams, each ``int32
  csize`` then the stream (``csize == neblock`` → stored raw). Flags:
  0x1 byte-shuffle, 0x2 memcpyed, 0x4 bit-shuffle, 0x10 dont-split,
  codec id in bits 5-7 (1 = LZ4/LZ4HC, 3 = zlib).

The encoder always sets DONT_SPLIT and never memcpy-flags whole
frames (incompressible blocks are stored raw per-block), which keeps
the writer simple; the decoder handles split byte-shuffled blocks as
produced by default c-blosc so real stores ingest.
"""

from __future__ import annotations

import struct
import zlib as _zlib

import numpy as np

__all__ = [
    "lz4_compress",
    "lz4_decompress",
    "byte_shuffle",
    "byte_unshuffle",
    "bit_shuffle",
    "bit_unshuffle",
    "blosc_encode",
    "blosc_decode",
]

_MAX_SPLITS = 16  # c-blosc MAX_SPLITS: byte-shuffled blocks split per byte-lane


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 *block* (not frame) of known decompressed size."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        dst += src[i : i + lit]
        i += lit
        if i >= n:
            break  # last sequence: literals only
        off = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = (token & 0xF) + 4
        if token & 0xF == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(dst) - off
        if off == 0 or start < 0:
            raise ValueError("corrupt LZ4 block: bad match offset")
        if off >= mlen:
            dst += dst[start : start + mlen]
        else:  # overlapping match = repeating pattern
            pat = dst[start : start + off]
            dst += (pat * (-(-mlen // off)))[:mlen]
    if len(dst) != dst_size:
        raise ValueError(
            f"corrupt LZ4 block: decoded {len(dst)} bytes, expected {dst_size}"
        )
    return bytes(dst)


def lz4_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block encoder (4-byte hash table).

    Honors the spec's end conditions: the last 5 bytes are literals and
    no match starts within the last 12 bytes."""
    n = len(src)
    out = bytearray()

    def emit(lit_lo: int, lit_hi: int, off: int | None, mlen: int) -> None:
        nonlocal out
        litlen = lit_hi - lit_lo
        t_lit = 15 if litlen >= 15 else litlen
        t_m = 0
        if off is not None:
            m = mlen - 4
            t_m = 15 if m >= 15 else m
        out.append((t_lit << 4) | t_m)
        if litlen >= 15:
            r = litlen - 15
            while r >= 255:
                out.append(255)
                r -= 255
            out.append(r)
        out += src[lit_lo:lit_hi]
        if off is not None:
            out.append(off & 0xFF)
            out.append(off >> 8)
            if mlen - 4 >= 15:
                r = mlen - 4 - 15
                while r >= 255:
                    out.append(255)
                    r -= 255
                out.append(r)

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i < n - 12:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            mlen = 4
            lim = n - 5
            while i + mlen < lim and src[j + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, None, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# shuffles (block-granular, exactly as c-blosc applies them)
# ---------------------------------------------------------------------------


def byte_shuffle(buf: bytes, typesize: int) -> bytes:
    """c-blosc ``shuffle()``: byte-transpose whole elements; the
    ``len % typesize`` tail is copied unshuffled."""
    if typesize <= 1:
        return bytes(buf)
    keep = len(buf) - len(buf) % typesize
    a = np.frombuffer(buf[:keep], np.uint8).reshape(-1, typesize)
    return a.T.tobytes() + bytes(buf[keep:])


def byte_unshuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return bytes(buf)
    keep = len(buf) - len(buf) % typesize
    a = np.frombuffer(buf[:keep], np.uint8).reshape(typesize, -1)
    return a.T.tobytes() + bytes(buf[keep:])


def bit_shuffle(buf: bytes, typesize: int) -> bytes:
    """kiyo-masui ``bshuf_trans_bit_elem`` as c-blosc calls it: shuffle
    ``size - size % 8`` elements, copy the tail raw.

    Layout of the shuffled buffer: for each element-byte ``j``
    (0..typesize-1), 8 bit-planes of ``keep/8`` bytes; bit-plane ``k``
    byte ``i`` bit ``b`` = bit ``k`` of byte ``j`` of element
    ``8·i + b`` (little bit order, per the C scalar reference)."""
    size = len(buf) // typesize
    keep = size - size % 8
    nb = keep * typesize
    if keep == 0:
        return bytes(buf)
    a = np.frombuffer(buf[:nb], np.uint8).reshape(keep, typesize)
    t = a.T.reshape(-1, 8)  # byte-plane-major, 8-element groups
    bits = np.unpackbits(t, axis=1, bitorder="little").reshape(-1, 8, 8)
    # bits[group, elem_in_group, bit] -> bitrow[bit][group] bit elem
    bitrows = np.packbits(
        bits.transpose(2, 0, 1), axis=-1, bitorder="little"
    ).reshape(8, typesize, keep // 8)
    return bitrows.transpose(1, 0, 2).tobytes() + bytes(buf[nb:])


def bit_unshuffle(buf: bytes, typesize: int) -> bytes:
    size = len(buf) // typesize
    keep = size - size % 8
    nb = keep * typesize
    if keep == 0:
        return bytes(buf)
    o = np.frombuffer(buf[:nb], np.uint8).reshape(typesize, 8, keep // 8)
    bitrows = o.transpose(1, 0, 2).reshape(8, -1, 1)
    bits = np.unpackbits(bitrows, axis=-1, bitorder="little")  # [bit, group, elem]
    t = np.packbits(
        bits.transpose(1, 2, 0), axis=-1, bitorder="little"
    ).reshape(typesize, keep)
    return t.T.tobytes() + bytes(buf[nb:])


# ---------------------------------------------------------------------------
# Blosc v1 frame
# ---------------------------------------------------------------------------


def blosc_decode(frame: bytes) -> bytes:
    """Decode a Blosc v1 frame (any shuffle mode; LZ4/zlib codecs, raw
    and memcpy passthrough)."""
    if len(frame) < 16:
        raise ValueError("truncated Blosc frame")
    flags, typesize = frame[2], frame[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", frame, 4)
    if cbytes > len(frame):
        raise ValueError("truncated Blosc frame payload")
    if nbytes == 0:
        return b""
    if flags & 0x2:  # memcpyed: raw payload follows the header
        return bytes(frame[16 : 16 + nbytes])
    codec = flags >> 5
    if codec == 1:  # lz4 / lz4hc share the block format
        decode = lz4_decompress
    elif codec == 3:
        decode = lambda b, sz: _zlib.decompress(b)  # noqa: E731
    else:
        raise NotImplementedError(
            f"Blosc inner codec id {codec} not supported (lz4/zlib are)"
        )
    typesize = max(typesize, 1)
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    byte_sh = bool(flags & 0x1)
    bit_sh = bool(flags & 0x4)
    dont_split = bool(flags & 0x10)
    out = bytearray()
    for bi in range(nblocks):
        bsize = min(blocksize, nbytes - bi * blocksize)
        # c-blosc's blosc_d split rule: a block is split into typesize
        # streams based SOLELY on the DONT_SPLIT header flag (and the
        # typesize bounds) — independent of which shuffle mode is set
        # (FORWARD_COMPAT mode splits lz4 blocks for byte- AND
        # bit-shuffle; numcodecs/real scarf stores use bitshuffle,
        # scarf/writers.py:81). The trailing partial block
        # (bsize < blocksize) is ALWAYS unsplit (c-blosc's
        # leftoverblock rule), even when bsize divides by typesize.
        leftover = bsize < blocksize
        nsplits = (
            typesize
            if not dont_split and not leftover and 1 < typesize <= _MAX_SPLITS
            else 1
        )
        if bsize % nsplits:
            nsplits = 1
        neblock = bsize // nsplits
        pos = bstarts[bi]
        block = bytearray()
        for _ in range(nsplits):
            (csize,) = struct.unpack_from("<i", frame, pos)
            pos += 4
            if csize <= 0 or csize > neblock:
                raise ValueError(f"corrupt Blosc block: stream size {csize}")
            if csize == neblock:  # stored raw (incompressible stream)
                block += frame[pos : pos + neblock]
            else:
                block += decode(frame[pos : pos + csize], neblock)
            pos += csize
        if bit_sh:
            out += bit_unshuffle(bytes(block), typesize)
        elif byte_sh:
            out += byte_unshuffle(bytes(block), typesize)
        else:
            out += block
    return bytes(out[:nbytes])


def blosc_encode(
    data: bytes, typesize: int, shuffle: int = 2, blocksize: int = 0
) -> bytes:
    """Encode a Blosc v1 frame with the LZ4 inner codec.

    ``shuffle``: 0 none, 1 byte, 2 bit (numcodecs' convention). Blocks
    are never split (DONT_SPLIT set) and incompressible blocks are
    stored raw, which every conforming decoder (including c-blosc)
    accepts."""
    nbytes = len(data)
    typesize = typesize if 1 <= typesize <= 255 else 1
    if blocksize <= 0:
        blocksize = min(max(nbytes, 1), 1 << 18)
    step = typesize * 8
    if blocksize % step:
        blocksize += step - blocksize % step
    flags = (1 << 5) | 0x10  # lz4, dont-split
    if shuffle == 1:
        flags |= 0x1
    elif shuffle == 2:
        flags |= 0x4
    nblocks = max(1, -(-nbytes // blocksize))
    streams: list[bytes] = []
    for bi in range(nblocks):
        block = data[bi * blocksize : bi * blocksize + blocksize]
        if shuffle == 1:
            sh = byte_shuffle(block, typesize)
        elif shuffle == 2:
            sh = bit_shuffle(block, typesize)
        else:
            sh = bytes(block)
        c = lz4_compress(sh)
        if len(c) >= len(sh):  # store raw: csize == neblock sentinel
            streams.append(struct.pack("<i", len(sh)) + sh)
        else:
            streams.append(struct.pack("<i", len(c)) + c)
    header_len = 16 + 4 * nblocks
    offs, pos = [], header_len
    for s in streams:
        offs.append(pos)
        pos += len(s)
    frame = bytearray()
    frame += struct.pack("<BBBB", 2, 1, flags, typesize)
    frame += struct.pack("<III", nbytes, blocksize, pos)
    frame += struct.pack(f"<{nblocks}i", *offs)
    for s in streams:
        frame += s
    return bytes(frame)
