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

The actual codec work is STUBBED — image/audio libraries are not in this
container. ``decode_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it emits a reproducible fake
feature vector derived from the payload hash, keeping every Spark-side
contract (schema, batching, partitioning) real and testable.
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


def decode_stub(
    media: DataFrame, deterministic_fake: bool = False, batch_rows: int = 256
) -> DataFrame:
    """Decode payloads into fixed-dim feature vectors via ``mapInPandas``.

    Real decoders (PIL/librosa/ffmpeg) plug into ``_decode_one`` — the
    Spark plumbing (Arrow batch shape, schema, partition preservation)
    does not change. Without libraries, ``deterministic_fake`` hashes the
    payload into a reproducible pseudo-feature so tests exercise the full
    distributed path.
    """

    def _decode_one(payload: bytes) -> np.ndarray:
        if not deterministic_fake:
            raise NotImplementedError(
                "media codecs not available in this environment; "
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
