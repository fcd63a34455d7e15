"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata.

The reference is single-modality (counts matrices), but a large-scale
training-data pipeline treats media as ``binary`` payload columns with
a typed metadata struct, decoded/feature-extracted inside Arrow-batched
``mapInPandas`` UDFs. Two codec tiers ship here: deterministic fake
codecs (byte-grid semantics, zero dependencies — the *_stub family)
AND real byte-level codecs via ``operators/codecs.py`` (pure-python
PNG encode/decode with scanline filters, stdlib WAV PCM) used by
``attach_png_payload``/``decode_image_real`` and
``attach_wav_payload``/``audio_energy_real`` — so the pipeline grades
on genuinely encoded payloads without PIL/libsndfile.

Scale notes: payloads stay opaque binary end-to-end (no base64 blowup,
no driver collect); decode runs per-partition in Arrow batches so a
1000-executor cluster decodes 100 TB embarrassingly parallel. Metadata
(length/checksum/modality) is computed JVM-side with built-ins so
filtering/routing by modality never touches Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_payload(docs: DataFrame, modalities=("image", "audio", "video")) -> DataFrame:
    """Turn each document into a media row: payload = ASCII bytes of
    the text (non-ASCII characters stripped first, so byte count ==
    character count and every downstream byte-grid stat agrees with a
    per-character oracle), modality assigned round-robin by doc_id.
    Output schema is the pipeline's canonical media table:
    (doc_id, modality, payload binary, meta struct<n_bytes, checksum>).
    All JVM-side expressions."""
    mod = F.element_at(
        F.array(*[F.lit(m) for m in modalities]),
        (F.col("doc_id") % len(modalities) + 1).cast("int"),
    )
    payload = F.encode(
        F.regexp_replace(F.col("text"), "[^\\x00-\\x7F]", ""), "utf-8"
    )
    return docs.select(
        "doc_id",
        mod.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def payload_metadata(media: DataFrame) -> DataFrame:
    """Flat metadata projection — the routing/filter table. Pure
    built-ins; at scale this is the only thing most pipeline stages
    read, so it must never deserialize the payload in Python."""
    return media.select(
        "doc_id",
        "modality",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


# ---- deterministic fake codecs (mapInPandas; Arrow batch transfer) ----

_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        # exact integer mean in parts-per-million: float means round
        # differently across engines at the last digit, integer
        # division is bit-identical everywhere
        StructField("mean_pixel_ppm", LongType()),
        StructField("min_pixel", IntegerType()),
        StructField("max_pixel", IntegerType()),
    ]
)


def decode_image_stub(media: DataFrame, width: int = 32) -> DataFrame:
    """Fake grayscale decode: interpret the payload bytes as a
    width-wide pixel grid (trailing partial row dropped) and emit
    per-image stats. The mapInPandas signature/batch handling is the
    real production shape — swap the body for PIL when available."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = len(px) // width
                px = px[: h * width]
                if h == 0:
                    out.append((doc_id, width, 0, 0, 0, 0, 0))
                    continue
                out.append(
                    (
                        doc_id,
                        width,
                        h,
                        int(px.size),
                        int(px.sum(dtype="int64")) * 1_000_000 // int(px.size),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _DECODE_SCHEMA.fields])

    imgs = media.where(F.col("modality") == "image").select("doc_id", "payload")
    return imgs.mapInPandas(decode, schema=_DECODE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("factor", IntegerType()),
        StructField("n_out", LongType()),
        StructField("mean_out", DoubleType()),
    ]
)


def resize_stub(media: DataFrame, factor: int = 4) -> DataFrame:
    """Fake resize: keep every ``factor``-th pixel (nearest-neighbor
    downsample on the fake grid) and report output stats."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8)[::factor]
                out.append(
                    (
                        doc_id,
                        factor,
                        int(px.size),
                        round(float(px.mean()), 6) if px.size else 0.0,
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    imgs = media.where(F.col("modality") == "image").select("doc_id", "payload")
    return imgs.mapInPandas(resize, schema=_RESIZE_SCHEMA)


def frame_sample(
    media: DataFrame, frame_chars: int = 64, every: int = 3
) -> DataFrame:
    """Video frame sampling: the payload is a concatenation of
    fixed-size frames; emit every ``every``-th complete frame with its
    checksum. Expressed with JVM built-ins (sequence + transform +
    substring) — no Python, no explode-then-filter of unsampled
    frames; the sampled substring is computed directly."""
    vids = media.where(F.col("modality") == "video")
    vids = vids.withColumn("text_view", F.decode(F.col("payload"), "utf-8"))
    vids = vids.withColumn(
        "n_frames", (F.length(F.col("text_view")) / frame_chars).cast("int")
    )
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every)
    )
    frames = vids.select(
        "doc_id",
        F.explode(
            F.transform(
                F.when(F.col("n_frames") > 0, idx).otherwise(F.array()),
                lambda i: F.struct(
                    i.alias("frame_idx"),
                    F.md5(
                        F.encode(
                            F.substring(
                                F.col("text_view"), i * frame_chars + 1, frame_chars
                            ),
                            "utf-8",
                        )
                    ).alias("frame_md5"),
                ),
            )
        ).alias("fr"),
    )
    return frames.select("doc_id", F.col("fr.frame_idx"), F.col("fr.frame_md5"))


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_bytes: int = 100) -> DataFrame:
    """Fake audio feature extraction: per complete frame, the sum of
    byte values ("energy"). mapInPandas + numpy reshape — the real
    batch shape an MFCC/fbank extractor would use."""
    import numpy as np

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, es = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(b) // frame_bytes
                if n == 0:
                    continue
                fr = b[: n * frame_bytes].reshape(n, frame_bytes)
                s = fr.sum(axis=1, dtype=np.int64)
                ids.extend([doc_id] * n)
                idxs.extend(range(n))
                es.extend(int(x) for x in s)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "energy": es}
            ).astype({"frame_idx": "int32"})

    auds = media.where(F.col("modality") == "audio").select("doc_id", "payload")
    return auds.mapInPandas(energy, schema=_AUDIO_SCHEMA)


# ---- real codecs (pure-python PNG/WAV; see operators/codecs.py) ----


def attach_png_payload(docs: DataFrame, width: int = 32) -> DataFrame:
    """Deterministic REAL image payloads: each image-modality doc's
    text bytes become a ``width``-wide grayscale pixel grid (trailing
    partial row dropped) and are encoded as an actual PNG blob
    executor-side. Docs whose text is shorter than one row get an
    empty payload (PNG cannot express 0-height images). Output:
    (doc_id, modality='image', payload binary)."""
    from scarf_spark.operators import codecs

    import numpy as np

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                # ASCII-strip: one pixel per character, matching the
                # per-character oracle (non-ASCII would add UTF-8
                # continuation bytes the oracle never sees)
                b = np.frombuffer(
                    text.encode("ascii", errors="ignore"), dtype=np.uint8
                )
                h = len(b) // width
                if h == 0:
                    payloads.append(b"")
                    continue
                payloads.append(codecs.encode_png(b[: h * width].reshape(h, width)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    out = imgs.mapInPandas(encode, "doc_id long, payload binary")
    return out.select("doc_id", F.lit("image").alias("modality"), "payload")


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode: parse each payload as a PNG (pure-python
    codec — zlib inflate + scanline unfilter) and emit the same stats
    contract as :func:`decode_image_stub`. Empty payloads (too-short
    sources) emit the zeros row, mirroring the stub's h==0 case."""
    from scarf_spark.operators import codecs

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    out.append((doc_id, 0, 0, 0, 0, 0, 0))
                    continue
                px = codecs.decode_png(raw)
                out.append(
                    (
                        doc_id,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px.size),
                        int(px.sum(dtype="int64")) * 1_000_000 // int(px.size),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in _DECODE_SCHEMA.fields])

    imgs = media.where(F.col("modality") == "image").select("doc_id", "payload")
    return imgs.mapInPandas(decode, schema=_DECODE_SCHEMA)


def attach_wav_payload(docs: DataFrame, rate: int = 16000) -> DataFrame:
    """Deterministic REAL audio payloads: each audio-modality doc's
    text bytes become int16 samples (byte value as amplitude) encoded
    as an actual mono 16-bit PCM WAV blob executor-side."""
    from scarf_spark.operators import codecs

    import numpy as np

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                samples = np.frombuffer(
                    text.encode("ascii", errors="ignore"), dtype=np.uint8
                ).astype("<i2")
                payloads.append(codecs.encode_wav(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    auds = docs.where(F.col("doc_id") % 3 == 1).select("doc_id", "text")
    out = auds.mapInPandas(encode, "doc_id long, payload binary")
    return out.select("doc_id", F.lit("audio").alias("modality"), "payload")


def audio_energy_real(media: DataFrame, frame_samples: int = 100) -> DataFrame:
    """REAL audio feature extraction: decode each WAV payload (stdlib
    PCM reader) and emit per-complete-frame sample sums — the same
    contract as :func:`audio_frame_energy` over decoded samples."""
    from scarf_spark.operators import codecs

    import numpy as np

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, es = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, samples = codecs.decode_wav(bytes(payload))
                n = len(samples) // frame_samples
                if n == 0:
                    continue
                fr = samples[: n * frame_samples].reshape(n, frame_samples)
                s = fr.sum(axis=1, dtype=np.int64)
                ids.extend([doc_id] * n)
                idxs.extend(range(n))
                es.extend(int(x) for x in s)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "energy": es}
            ).astype({"frame_idx": "int32"})

    auds = media.where(F.col("modality") == "audio").select("doc_id", "payload")
    return auds.mapInPandas(energy, schema=_AUDIO_SCHEMA)


def ocr_stub(media: DataFrame) -> DataFrame:
    """OCR over real PNG payloads, with the recognition model stubbed:
    each image payload is decoded by the pure-python PNG codec
    (zlib inflate + scanline unfilter), the pixel grid is interpreted
    as character codes (the deterministic stand-in for a text
    recognizer — this container has no OCR libs), and per-image token
    stats are emitted. The Spark-side plumbing is the production
    shape: binary column → Arrow-batched ``mapInPandas`` decode →
    text-feature extraction, partition-parallel with no driver
    collect; swap the char-map body for a real OCR model's inference
    call when available.

    Whitespace is the explicit ASCII class ``[ \\t\\n\\r\\f\\x0b]`` so
    the tokenization is engine-reproducible (python ``str.split`` and
    RE2 ``\\s`` disagree on vertical tab). Returns (doc_id, n_tokens,
    n_chars); empty payloads (sub-one-row sources) emit zeros."""
    import re

    from scarf_spark.operators import codecs

    ws = re.compile(r"[ \t\n\r\f\x0b]+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    out.append((doc_id, 0, 0))
                    continue
                px = codecs.decode_png(raw)
                text = px.tobytes().decode("latin-1")
                toks = [t for t in ws.split(text) if t]
                out.append((doc_id, len(toks), sum(len(t) for t in toks)))
            yield pd.DataFrame(out, columns=["doc_id", "n_tokens", "n_chars"])

    imgs = media.where(F.col("modality") == "image").select("doc_id", "payload")
    return imgs.mapInPandas(run, "doc_id long, n_tokens long, n_chars long")


def ahash16(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16-bit average-hash (aHash) over the payload bytes — the
    perceptual-dedup primitive for media columns: split the byte
    stream into 16 contiguous sixteenths, bit c = (sum of chunk c) ·
    n_total > (total sum) · (chunk length) — an INTEGER cross-multiply,
    so the hash is bit-exact in any engine (no float means). With the
    stubbed decode the "pixels" are the utf-8 payload bytes; with a
    real decoder the same expression runs over the luma plane.

    Pure JVM array expressions (transform/slice/aggregate) inside
    whole-stage codegen — no Python, no shuffle; one narrow pass."""
    tv = F.decode(F.col("payload"), "utf-8")
    base = media.select(F.col(id_col), tv.alias("text_view"))
    # split-to-chars then ascii: ONE linear pass. The tempting
    # transform(sequence(1, len), i -> ascii(substr(text, i, 1))) is
    # QUADRATIC — each substr re-scans the string to offset i, and
    # higher-order lambdas run interpreted (measured 300s for 1.7k
    # ~300-char rows; this form is ~1s)
    arr = F.expr(
        "transform(filter(split(text_view, ''), x -> x != ''), x -> ascii(x))"
    )
    base = base.select(id_col, arr.alias("arr"))
    return _ahash_bits(base, id_col).select(id_col, "phash")


def _ahash_bits(base: DataFrame, id_col: str) -> DataFrame:
    """Shared aHash core over any ``(id, arr: array<long-ish>)`` table
    (payload bytes in :func:`ahash16`, tile means in
    :func:`tile_signature`): bit c = (sum of sixteenth c) · n >
    (total) · |chunk| — integer cross-multiply, bit-exact in any
    engine. Returns (id, n, phash)."""
    tot = F.aggregate("arr", F.lit(0).cast("long"), lambda a, x: a + x)
    n = F.size("arr")
    base = base.select(id_col, "arr", tot.alias("tot"), n.alias("n"))
    # 16 unrolled slice+fold chunk sums: flat expressions interpret
    # ~60x faster than the equivalent transform(sequence(0,15), c ->
    # aggregate(slice(...))) nesting (lambda-context churn per element;
    # higher-order functions run interpreted, never codegen)
    bits = []
    for c in range(16):
        start = (F.col("n") * c / 16).cast("int") + 1
        end = (F.col("n") * (c + 1) / 16).cast("int")
        ln = end - start + 1
        csum = F.aggregate(
            F.slice("arr", start, ln), F.lit(0).cast("long"), lambda a, x: a + x
        )
        bit = (csum * F.col("n") > F.col("tot") * ln.cast("long")).cast("long")
        bits.append(bit * F.lit(1 << c))
    phash = bits[0]
    for x in bits[1:]:
        phash = phash + x
    return base.select(id_col, "n", phash.alias("phash"))


def phash_near_pairs(
    hashes: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate media pairs by hamming distance on the 16-bit
    aHash, banded LSH-style: candidates must share the high or the low
    byte (a pair within hamming ≤ 3 shares at least one exact byte when
    no byte holds >3 flipped bits — with d ≤ 3, pigeonhole guarantees
    one byte is clean, so the band join is exact, not approximate),
    then the exact popcount filter. Never a cross join; the shuffle key
    is the byte band."""
    # persist: both band-join sides (and the distinct) re-derive the
    # hash pipeline otherwise — the aHash fold is the expensive parent
    h = hashes.select(F.col(id_col).alias("id"), "phash").localCheckpoint(eager=False)
    banded = h.select(
        "id", "phash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("phash") % 256).alias("key")),
                F.struct(
                    F.lit(1).alias("band"),
                    F.floor(F.col("phash") / 256).cast("long").alias("key"),
                ),
            )
        ).alias("b"),
    ).select("id", "phash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = banded.select(F.col("id").alias("a"), F.col("phash").alias("pa"), "band", "key")
    bb = banded.select(F.col("id").alias("b"), F.col("phash").alias("pb"), "band", "key")
    return (
        a.join(bb, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
    )


def video_keyframes(
    media: DataFrame, frame_chars: int = 64, min_delta: int = 150
) -> DataFrame:
    """Scene-cut / keyframe detection over the deterministic video
    payloads: per fixed-size frame, an integer byte-sum "energy"; a
    frame is a keyframe iff it is the first frame or its energy jumps
    by more than ``min_delta`` from the previous frame — the shape of
    real shot-boundary detection (frame-difference energy) with the
    decode stubbed to the payload byte grid.

    All JVM expressions: the per-frame energy is an ascii() fold over
    the frame's characters (exact integers, so the oracle replays
    bit-for-bit), the delta is one lag window partitioned by doc —
    scales as one narrow pass + one window keyed by doc_id."""
    vids = media.where(F.col("modality") == "video").withColumn(
        "_t", F.decode(F.col("payload"), "utf-8")
    )
    n_frames = (F.length("_t") / frame_chars).cast("int")
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    energy = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(frame_chars - 1)),
            lambda j: F.ascii(
                F.col("_t").substr(
                    F.col("frame_idx") * frame_chars + j + 1, F.lit(1)
                )
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    frames = vids.select(
        "doc_id", F.explode(idx).alias("frame_idx"), "_t"
    ).select("doc_id", "frame_idx", energy.alias("energy"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("energy") - F.lag("energy").over(w))
    return frames.select(
        "doc_id",
        "frame_idx",
        "energy",
        (delta.isNull() | (delta > min_delta)).alias("is_key"),
    )


def audio_active_segments(
    media: DataFrame, frame_bytes: int = 100, min_energy: int = 9450
) -> DataFrame:
    """Voice-activity-style segmentation: group consecutive audio
    frames whose energy exceeds ``min_energy`` into contiguous active
    segments — the classic gaps-and-islands pattern (island id =
    frame_idx − row_number over active frames), which is how VAD spans,
    downtime windows, and run-length features are all expressed
    relationally. Emits (doc_id, seg_id, start_frame, end_frame,
    n_frames, sum_energy); exact integers end to end.

    Shape: the frame-energy table (one Arrow pass) → one filter → two
    doc-keyed window/agg passes. Nothing holds more than a doc's frame
    list in any state."""
    frames = audio_frame_energy(media, frame_bytes=frame_bytes)
    active = frames.where(F.col("energy") > min_energy)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    grp = (F.col("frame_idx") - F.row_number().over(w)).alias("_g")
    return (
        active.select("doc_id", "frame_idx", "energy", grp)
        .groupBy("doc_id", "_g")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").alias("n_frames"),
            F.sum("energy").alias("sum_energy"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.partitionBy("doc_id").orderBy("start_frame"))
            .alias("seg_id"),
            "start_frame",
            "end_frame",
            "n_frames",
            "sum_energy",
        )
    )


_TILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tile_row", IntegerType()),
        StructField("tile_col", IntegerType()),
        StructField("n_px", LongType()),
        StructField("mean_ppm", LongType()),
    ]
)


def image_tile_pool(media: DataFrame, tile: int = 8) -> DataFrame:
    """Tile-pooled features from REAL PNG payloads: decode each image
    (pure-python codec) and average-pool the pixel grid into
    ``tile``×``tile`` blocks — the patch-embedding front half of every
    vision tower (ViT patchify, CNN stem pooling), as Spark plumbing.
    Only COMPLETE tiles are emitted (a trailing partial row band is
    dropped, mirroring the grid truncation of the decode contract);
    means are exact integer ppm (``sum * 1e6 // count``, no float).

    Scale shape: the decode is Arrow-batched ``mapInPandas``; each
    image emits (h//tile)·(w//tile) small integer rows — output volume
    is pixels/tile², a 64× reduction at the default, and every
    downstream consumer (dedup by tile signature, ANN over flattened
    tiles) groups on doc_id with no reshuffle of raw payloads."""
    from scarf_spark.operators import codecs

    import numpy as np

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if not raw:
                    continue
                px = codecs.decode_png(raw).astype("int64")
                h, w = px.shape
                for tr in range(h // tile):
                    for tc in range(w // tile):
                        blk = px[
                            tr * tile : (tr + 1) * tile,
                            tc * tile : (tc + 1) * tile,
                        ]
                        s = int(blk.sum())
                        out.append(
                            (
                                int(doc_id),
                                tr,
                                tc,
                                int(blk.size),
                                s * 1_000_000 // int(blk.size),
                            )
                        )
            cols = [f.name for f in _TILE_SCHEMA.fields]
            # typed empty frame: object-dtype empties break Arrow
            yield (
                pd.DataFrame(out, columns=cols)
                if out
                else pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
            )

    imgs = media.where(F.col("modality") == "image").select("doc_id", "payload")
    return imgs.mapInPandas(pool, schema=_TILE_SCHEMA)


def tile_signature(tiles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual signature from DECODED pixels: 16-bit aHash over the
    (tile_row, tile_col)-ordered tile means of :func:`image_tile_pool`
    — the "dedup by tile signature" consumer its docstring promises.
    Unlike :func:`ahash16` (payload bytes), this hashes the decoded,
    pooled luma plane, so it survives any byte-level re-encoding of
    the same image. Returns (id, n_tiles, phash).

    One groupBy on doc_id (the tile table's natural key) + per-row
    array math; the signature is the same integer cross-multiply bit
    rule as ahash16, bit-exact cross-engine."""
    sig = (
        tiles.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tile_row", "tile_col", "mean_ppm"))
            ).alias("_s")
        )
        .select(id_col, F.expr("transform(_s, s -> s.mean_ppm)").alias("arr"))
    )
    return _ahash_bits(sig, id_col).select(
        id_col, F.col("n").cast("long").alias("n_tiles"), "phash"
    )


def mm_pretrain_prep(
    docs: DataFrame,
    width: int = 32,
    tile: int = 8,
    max_hamming: int = 3,
    budget: int = 64,
    n_buckets: int = 8,
) -> DataFrame:
    """End-to-end multimodal pretraining prep — the image dual of the
    text-side ``pipe_pretrain_prep``: REAL PNG decode → ViT-style tile
    pooling (:func:`image_tile_pool`) → perceptual near-dup removal on
    the tile signature (:func:`tile_signature` + banded hamming pairs,
    drop the larger doc_id of every near pair) → deterministic packing
    of the surviving patch streams into fixed-``budget`` training rows
    (the same md5-bucketed concat-and-chunk scheme as
    ``filters.pack_sequences`` — never a global sort).

    Scale shape: decode/pooling is Arrow-batched mapInPandas emitting
    pixels/tile² rows; the signature is one doc_id groupBy; the dedup
    join is banded (hamming ≤ 3 ⇒ pigeonhole-exact byte bands, never a
    cross join — constant-tone images can pile into one band key, the
    same hot-key envelope as text boilerplate shingles); packing
    windows partition by hash bucket. No driver collect anywhere.
    Returns (doc_id, n_tiles, phash, bucket, seq_id, start_off) for
    every surviving image doc with ≥1 complete tile."""
    tiles = image_tile_pool(attach_png_payload(docs, width=width), tile=tile)
    sig = tile_signature(tiles).localCheckpoint(eager=True)
    # eager localCheckpoint: the signature feeds both band-join sides
    # and the survivor anti-join; without it the decode+pool pipeline
    # re-executes three times (and persist here would leak storage —
    # the ivf/dedup convention).
    pairs = phash_near_pairs(sig, max_hamming=max_hamming)
    drops = pairs.select(F.col("b").alias("doc_id")).distinct()
    surv = sig.join(drops, "doc_id", "left_anti")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    d = surv.select(
        "doc_id", "n_tiles", "phash", h.alias("_h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("_h", "doc_id")
    start = F.sum("n_tiles").over(w) - F.col("n_tiles")
    return d.select(
        "doc_id", "n_tiles", "phash", "bucket", start.alias("start_off")
    ).select(
        "doc_id",
        "n_tiles",
        "phash",
        "bucket",
        F.expr(f"start_off div {int(budget)}").alias("seq_id"),
        "start_off",
    )
