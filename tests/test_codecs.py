"""Pure-python PNG/WAV codecs + real-codec multimodal operators."""

import struct
import zlib

import numpy as np
import pytest

from scarf_spark.operators import codecs


def test_png_roundtrip_gray():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (13, 32), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def test_png_roundtrip_rgb():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (7, 9, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def _png_from_filtered(w, h, ch, colortype, filtered_rows):
    raw = b"".join(filtered_rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(raw))
        + codecs._chunk(b"IEND", b"")
    )


def test_png_filters_sub_up_avg_paeth():
    # craft a 4x4 gray image with one row per filter type and check
    # decode against a hand-unfiltered expectation
    img = np.array(
        [
            [10, 20, 30, 40],
            [15, 25, 35, 45],
            [100, 110, 90, 80],
            [7, 8, 9, 10],
        ],
        dtype=np.uint8,
    )
    rows = []
    # row 0: Sub — filtered[i] = x[i] - x[i-1]
    r = img[0].astype(int)
    rows.append(bytes([1]) + bytes([(r[i] - (r[i - 1] if i else 0)) % 256 for i in range(4)]))
    # row 1: Up — filtered[i] = x[i] - prev[i]
    rows.append(bytes([2]) + bytes([(int(img[1][i]) - int(img[0][i])) % 256 for i in range(4)]))
    # row 2: Average — filtered[i] = x[i] - (left + up)//2
    r = img[2].astype(int)
    rows.append(
        bytes([3])
        + bytes(
            [(r[i] - ((r[i - 1] if i else 0) + int(img[1][i])) // 2) % 256 for i in range(4)]
        )
    )
    # row 3: Paeth
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    r = img[3].astype(int)
    prev = img[2].astype(int)
    rows.append(
        bytes([4])
        + bytes(
            [
                (
                    r[i]
                    - paeth(r[i - 1] if i else 0, prev[i], prev[i - 1] if i else 0)
                )
                % 256
                for i in range(4)
            ]
        )
    )
    got = codecs.decode_png(_png_from_filtered(4, 4, 1, 0, rows))
    assert np.array_equal(got, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_png(b"definitely not a png")


def test_wav_roundtrip():
    samples = np.array([0, 1, -1, 32767, -32768, 250], dtype="<i2")
    rate, back = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(back, samples)


@pytest.fixture(scope="module")
def spark():
    from scarf_spark.session import get_spark

    return get_spark("test-codecs", cpus=4, shuffle_partitions=4)


def test_real_image_pipeline(spark):
    from scarf_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "a" * 70), (3, "xy"), (6, "b" * 32)], "doc_id long, text string"
    )
    media = mm.attach_png_payload(docs, width=32)
    out = {r["doc_id"]: r for r in mm.decode_image_real(media).collect()}
    assert out[0]["height"] == 2 and out[0]["n_pixels"] == 64
    assert out[0]["mean_pixel_ppm"] == ord("a") * 1_000_000
    assert out[3]["width"] == 0 and out[3]["n_pixels"] == 0  # too short
    assert out[6]["height"] == 1 and out[6]["min_pixel"] == ord("b")


def test_real_audio_pipeline(spark):
    from scarf_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "c" * 250), (4, "d" * 50)], "doc_id long, text string"
    )
    media = mm.attach_wav_payload(docs)
    rows = mm.audio_energy_real(media, frame_samples=100).collect()
    got = {(r["doc_id"], r["frame_idx"]): r["energy"] for r in rows}
    assert got == {(1, 0): ord("c") * 100, (1, 1): ord("c") * 100}
