"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.K8).

Beyond the reference surface: mandated LLM-data-pipeline extension. The
design for 100 TB multimodal corpora:

- payloads are opaque ``BinaryType`` columns (parquet keeps them
  row-group-compressed; column pruning means metadata-only queries never
  touch the bytes);
- typed metadata travels in a sibling ``StructType`` column
  (media_type/width/height/duration_ms/codec), so filters prune on
  metadata BEFORE any decode;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages sized by bytes (``maxRecordsPerBatch`` tuned
  down for large payloads).

Codec status: COMPRESSED formats (JPEG/PNG/ffmpeg) are stubbed —
their libraries are not in this container — but the UNCOMPRESSED tier
is REAL: a pure-numpy binary-PPM (P6) codec (:func:`encode_ppm` /
:func:`decode_ppm`) runs end-to-end through the distributed path —
encode in ``mapInPandas``, decode + feature extraction in
``mapInPandas``, nearest-neighbor resize on actual pixels — so the
full Spark-side contract (binary payloads, Arrow batches, schema,
partition preservation) is exercised on genuine image bytes, and a
DuckDB oracle can independently recompute the pixel statistics
(``q_multimodal_ppm_stats``). ``decode_stub`` auto-detects the P6
magic and decodes for real; for non-PPM payloads it raises
``NotImplementedError`` unless ``deterministic_fake=True`` (the
hash-based pseudo-feature fallback).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

DECODED_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, feature array<float>"
)

FEATURE_DIM = 16


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a multimodal table from any text table for plumbing tests:
    payload = utf-8 bytes of the text, metadata derived deterministically.
    At ingest time a real pipeline would land these columns directly."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 1024 + 1).cast("int").alias("width"),
        (F.length(text_col) % 768 + 1).cast("int").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
        F.lit("fake0").alias("codec"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


PPM_MAGIC = b"P6"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6) encode of an (h, w, 3) uint8 array — pure
    Python/numpy, no codec library. PPM is the canonical uncompressed
    interchange format: 12-byte-ish ASCII header + raw RGB rows."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) decode to an (h, w, 3) uint8 array. Parses the
    three header tokens (width, height, maxval; comments unsupported —
    this is the interchange subset), then one frombuffer view."""
    if not payload.startswith(PPM_MAGIC):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic + 3 whitespace-separated ints + ONE whitespace byte
    idx, tokens = 2, []
    while len(tokens) < 3:
        while payload[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while not payload[idx : idx + 1].isspace():
            idx += 1
        tokens.append(int(payload[start:idx]))
    idx += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx)
    return raw.reshape(h, w, 3)


def text_to_pixels(text: str, side: int) -> np.ndarray:
    """Deterministic (h=side, w=side, 3) pixel block from a document:
    the utf-8 bytes cycled to fill the raster — the stand-in for real
    image ingest that keeps every byte independently recomputable by
    the SQL oracle (corpus is ASCII, so byte == codepoint)."""
    data = text.encode("utf-8")
    need = side * side * 3
    reps = need // len(data) + 1
    return np.frombuffer(
        (data * reps)[:need], dtype=np.uint8
    ).reshape(side, side, 3)


def attach_ppm_media(
    df: DataFrame, id_col: str, text_col: str, side: int = 16
) -> DataFrame:
    """Build a multimodal table with GENUINE binary-PPM payloads from any
    text table — the encode stage runs distributed in ``mapInPandas``
    (real bytes through the Arrow boundary, not a driver loop)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_ppm(text_to_pixels(t, side)) if t else None
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "image/x-portable-pixmap",
                    "width": np.int32(side),
                    "height": np.int32(side),
                }
            )

    out_schema = (
        "media_id bigint, payload binary, media_type string, "
        "width int, height int"
    )
    media = df.select(id_col, text_col).where(
        F.length(text_col) > 0
    ).mapInPandas(encode, out_schema)
    meta = F.struct(
        "media_type",
        "width",
        "height",
        F.lit(0).cast("long").alias("duration_ms"),
        F.lit("ppm").alias("codec"),
    )
    return media.select("media_id", "payload", meta.alias("meta"))


WAV_RATE = 8000


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Canonical RIFF/WAVE PCM encode (16-bit mono) — pure struct/numpy,
    no audio library. 44-byte header + little-endian PCM frames."""
    import struct

    assert samples.dtype == np.int16
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM decode (16-bit mono): validates the RIFF/WAVE magic
    and fmt chunk, walks chunks to ``data``, returns (rate, samples)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    idx = 12
    rate, bits, channels = None, None, None
    while idx + 8 <= len(payload):
        cid = payload[idx : idx + 4]
        (size,) = struct.unpack("<I", payload[idx + 4 : idx + 8])
        body = payload[idx + 8 : idx + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError("only PCM WAV supported")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise ValueError("only 16-bit mono PCM supported")
            return rate, np.frombuffer(body, dtype="<i2")
        idx += 8 + size + (size & 1)
    raise ValueError("no data chunk")


WAV_SAMPLES = 2048


def text_to_samples(text: str, n: int = WAV_SAMPLES) -> np.ndarray:
    """Deterministic int16 PCM block from a document: utf-8 bytes cycled,
    centered (byte - 128) and scaled ×256 — every sample independently
    recomputable by the SQL oracle (ASCII ⇒ byte == codepoint)."""
    data = text.encode("utf-8")
    reps = n // len(data) + 1
    raw = np.frombuffer((data * reps)[:n], dtype=np.uint8)
    return ((raw.astype(np.int16) - 128) * 256).astype(np.int16)


def attach_wav_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Multimodal table with GENUINE RIFF/WAV payloads from a text table
    — distributed ``mapInPandas`` encode, same pattern as
    :func:`attach_ppm_media`."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(text_to_samples(t)) if t else None
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "audio/wav",
                    "duration_ms": np.int64(WAV_SAMPLES * 1000 // WAV_RATE),
                }
            )

    media = df.select(id_col, text_col).where(F.length(text_col) > 0).mapInPandas(
        encode,
        "media_id bigint, payload binary, media_type string, duration_ms bigint",
    )
    meta = F.struct(
        "media_type",
        F.lit(0).cast("int").alias("width"),
        F.lit(0).cast("int").alias("height"),
        "duration_ms",
        F.lit("pcm_s16le").alias("codec"),
    )
    return media.select("media_id", "payload", meta.alias("meta"))


Y4M_SIDE = 16
Y4M_FRAMES = 4


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """YUV4MPEG2 (y4m) encode — the standard uncompressed video
    interchange container (what ffmpeg pipes): one ASCII stream header,
    then per frame an ASCII ``FRAME`` marker + raw C444 Y,U,V planes.
    ``frames`` is (n, 3, h, w) uint8. Pure Python/numpy."""
    n, c, h, w = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, np.ndarray]:
    """YUV4MPEG2 decode: parse the stream header (W/H/F/C tags), then
    walk FRAME markers; returns (fps, frames (n, 3, h, w) uint8).
    Supports the C444 subset this engine writes."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    for tag in header[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            fps = int(tag[1:].split(b":")[0])
        elif tag[:1] == b"C" and tag != b"C444":
            raise ValueError("only C444 supported")
    frame_bytes = 3 * h * w
    idx, frames = nl + 1, []
    while idx < len(payload):
        fnl = payload.index(b"\n", idx)
        if payload[idx:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        frames.append(
            np.frombuffer(payload, np.uint8, frame_bytes, start).reshape(3, h, w)
        )
        idx = start + frame_bytes
    return fps, np.stack(frames)


def text_to_frames(
    text: str, n_frames: int = Y4M_FRAMES, side: int = Y4M_SIDE
) -> np.ndarray:
    """Deterministic (n, 3, side, side) plane block from a document:
    utf-8 bytes cycled across all frames in order — frame f's planes
    are bytes [f·3·side², (f+1)·3·side²), SQL-recomputable."""
    data = text.encode("utf-8")
    need = n_frames * 3 * side * side
    reps = need // len(data) + 1
    return np.frombuffer((data * reps)[:need], dtype=np.uint8).reshape(
        n_frames, 3, side, side
    )


def attach_y4m_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Multimodal table with GENUINE y4m video payloads (4 frames of
    16×16 C444) from a text table — distributed ``mapInPandas`` encode."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_y4m(text_to_frames(t)) if t else None
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "video/x-yuv4mpeg",
                    "duration_ms": np.int64(Y4M_FRAMES * 1000 // 25),
                }
            )

    media = df.select(id_col, text_col).where(F.length(text_col) > 0).mapInPandas(
        encode,
        "media_id bigint, payload binary, media_type string, duration_ms bigint",
    )
    meta = F.struct(
        "media_type",
        F.lit(Y4M_SIDE).cast("int").alias("width"),
        F.lit(Y4M_SIDE).cast("int").alias("height"),
        "duration_ms",
        F.lit("yuv444p").alias("codec"),
    )
    return media.select("media_id", "payload", meta.alias("meta"))


def _ppm_feature(pixels: np.ndarray) -> np.ndarray:
    """16-dim real image feature: per-quadrant channel means (12) +
    global channel means (3) + global brightness (1), in [0, 1]."""
    h, w, _ = pixels.shape
    p = pixels.astype(np.float64) / 255.0
    quads = [
        p[: h // 2, : w // 2],
        p[: h // 2, w // 2 :],
        p[h // 2 :, : w // 2],
        p[h // 2 :, w // 2 :],
    ]
    feats = [q.mean(axis=(0, 1)) for q in quads]
    feats.append(p.mean(axis=(0, 1)))
    return np.concatenate(feats + [[p.mean()]]).astype(np.float32)


def decode_stub(
    media: DataFrame, deterministic_fake: bool = False, batch_rows: int = 256
) -> DataFrame:
    """Decode payloads into fixed-dim feature vectors via ``mapInPandas``.

    Binary-PPM payloads (P6 magic) decode FOR REAL — pure-numpy parse +
    quadrant-mean feature extraction (:func:`_ppm_feature`). Compressed
    formats plug into ``_decode_one`` the same way (PIL/librosa/ffmpeg
    not in this container); without them, ``deterministic_fake`` hashes
    the payload into a reproducible pseudo-feature so tests exercise
    the full distributed path regardless of codec availability.
    """

    def _decode_one(payload: bytes) -> np.ndarray:
        if payload.startswith(PPM_MAGIC):
            return _ppm_feature(decode_ppm(payload))
        if not deterministic_fake:
            raise NotImplementedError(
                "no codec for this payload in this environment; "
                "pass deterministic_fake=True or plug a real decoder here"
            )
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // len(digest) + 1))[: 4 * FEATURE_DIM], dtype=np.uint32)
        return (raw / np.float64(2**32)).astype(np.float32)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode metadata into per-frame rows
    (timestamps only — decode happens later, after pruning). Shows the
    explode-before-decode pattern that keeps the expensive stage minimal."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return media.where(F.col("meta.duration_ms") > 0).select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = (
    "media_id bigint, width int, height int, out_width int, out_height int"
)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage (aspect-ratio-preserving fit into
    ``max_side``²) via Arrow-batched ``mapInPandas`` — the geometry is
    computed per batch in Python exactly where a real PIL/opencv resize
    would run; only the pixel transform itself is stubbed (no codecs in
    this environment). Payload bytes stay untouched and unread: at
    100 TB the planner prunes the payload column for any consumer that
    needs only the output geometry."""
    import pandas as pd  # noqa: F811

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("int64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("int64")
            scale = (max_side / np.maximum(w, h)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": np.maximum(1, np.floor(w * scale)).astype("int32"),
                    "out_height": np.maximum(1, np.floor(h * scale)).astype("int32"),
                }
            )

    return media.select("media_id", "meta").mapInPandas(_resize, RESIZED_SCHEMA)


def resize_ppm(media: DataFrame, out_side: int = 8) -> DataFrame:
    """REAL image resize on PPM payloads: decode, nearest-neighbor
    downsample on actual pixels, re-encode PPM — all numpy inside one
    Arrow-batched ``mapInPandas`` stage. Returns (media_id, payload)
    with the resized image; the output payloads decode to
    (out_side, out_side, 3)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                px = decode_ppm(p)
                h, w, _ = px.shape
                ys = (np.arange(out_side) * h) // out_side
                xs = (np.arange(out_side) * w) // out_side
                outs.append(encode_ppm(px[np.ix_(ys, xs)]))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": outs})

    return media.select("media_id", "payload").mapInPandas(
        _resize, "media_id bigint, payload binary"
    )
