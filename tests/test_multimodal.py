"""Multimodal binary-column plumbing: schema, Arrow batch shape,
deterministic fake codecs, and the env-gated real-codec stub."""

import pytest
from pyspark.sql import functions as F

from scarf_spark.catalog import DataStore
from scarf_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.attach_payload(DataStore(spark, sf_dir).documents)


def test_payload_is_binary_with_typed_meta(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<n_bytes:int,checksum:string")


def test_payload_checksum_matches_text(spark, sf_dir, media):
    docs = DataStore(spark, sf_dir).documents
    joined = media.join(docs, "doc_id").where(
        F.col("meta.checksum") != F.md5(F.encode("text", "utf-8"))
    )
    assert joined.count() == 0


def test_decode_stub_exact_toy(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 64), (3, "b" * 70)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in mm.decode_image_stub(mm.attach_payload(docs), width=32).collect()
    }
    # doc 0: 64 bytes of 'a'(97) -> 2 rows of 32
    assert out[0]["height"] == 2 and out[0]["n_pixels"] == 64
    assert out[0]["mean_pixel_ppm"] == 97_000_000
    # doc 3: 70 bytes of 'b'(98) -> trailing 6 bytes dropped
    assert out[3]["height"] == 2 and out[3]["n_pixels"] == 64
    assert out[3]["mean_pixel_ppm"] == 98_000_000


def test_resize_stub_stride(spark):
    docs = spark.createDataFrame([(0, "abcdefgh")], ["doc_id", "text"])
    r = mm.resize_stub(mm.attach_payload(docs), factor=4).collect()[0]
    # bytes a..h, stride 4 -> 'a','e' -> mean (97+101)/2 = 99
    assert r["n_out"] == 2 and r["mean_out"] == 99.0


def test_frame_sample_survives_repartition(media):
    # plumbing must be partition-independent (100 TB = many partitions)
    a = mm.frame_sample(media).collect()
    b = mm.frame_sample(media.repartition(13, "doc_id")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_real_codec_rejects_non_png(media):
    # real codec now ships (operators/codecs.py): non-PNG payloads are
    # a decode error, not a capability gate
    with pytest.raises(Exception, match="PNG|png"):
        mm.decode_image_real(media).collect()


def test_ahash_identical_payloads_collide(spark):
    from pyspark.sql import functions as F

    from scarf_spark.operators.multimodal import ahash16, phash_near_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "zzzzzzzzzzzzzzzzzzzzzzzzaaaaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbbb"),
        ],
        "doc_id long, text string",
    )
    media = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    h = ahash16(media)
    vals = {r["doc_id"]: r["phash"] for r in h.collect()}
    assert vals[1] == vals[2]
    assert 0 <= vals[1] < (1 << 16)
    pairs = phash_near_pairs(h, max_hamming=0).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_ocr_stub_recovers_token_stats(spark):
    from scarf_spark.operators import multimodal as mm

    text = ("hello world  foo" + " " * 16 + "bar baz") * 4  # 39*4=156 chars
    docs = spark.createDataFrame([(0, text), (3, "tiny")],
                                 "doc_id long, text string")
    media = mm.attach_png_payload(docs, width=32)
    got = {r["doc_id"]: (r["n_tokens"], r["n_chars"])
           for r in mm.ocr_stub(media).collect()}
    kept = text[: (len(text) // 32) * 32]
    toks = kept.split()
    assert got[0] == (len(toks), sum(len(t) for t in toks))
    assert got[3] == (0, 0)  # sub-one-row source -> empty payload
