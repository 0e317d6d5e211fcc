"""End-to-end multimodal ingest pipeline on this engine — REAL codecs.

documents → genuine binary payloads in all three modalities (PPM image,
RIFF/WAV audio, YUV4MPEG2 video — pure-numpy codecs, no media library)
→ metadata-pruned decode → real feature extraction → perceptual-hash
(dHash) dedup groups → image resize → partitioned parquet of features.
Every stage is an Arrow-batched mapInPandas or a DataFrame op; payload
columns are pruned for any consumer that reads only features.

Run: ``python examples/multimodal_pipeline.py [sf_dir] [out_dir]``
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.operators.multimodal import (
    attach_ppm_media,
    attach_wav_media,
    attach_y4m_media,
    decode_stub,
    resize_ppm,
)
from flink_quickstart_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="media_")
    spark = get_spark(app_name="multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir).documents

    # 1. ingest: land all three modalities as real binary payloads
    images = attach_ppm_media(docs, "doc_id", "text", side=16)
    audio = attach_wav_media(docs, "doc_id", "text")
    video = attach_y4m_media(docs, "doc_id", "text")

    # 2. metadata-first pruning: payload bytes untouched for this filter
    big = images.where(
        (F.col("meta.width") * F.col("meta.height") >= 256)
        & (F.col("meta.codec") == "ppm")
    )

    # 3. REAL decode → 16-dim features (quadrant/channel means)
    feats = decode_stub(big)

    # 4. perceptual dedup: dHash groups via the registered operator path
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    dh = registry.REGISTRY["q_multimodal_dhash"].builder(spark, sf_dir)
    groups = (
        dh.groupBy("w0", "w1")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep"))
        .where(F.col("n") >= 2)
    )

    # 5. real resize on pixels (16×16 → 8×8 nearest neighbor)
    thumbs = resize_ppm(big, 8)

    # 6. land features partitioned by media_type for pruned reads
    feats.write.mode("overwrite").partitionBy("media_type").parquet(out_dir)

    print(
        f"docs={docs.count()} images={images.count()} audio={audio.count()} "
        f"video={video.count()} features={spark.read.parquet(out_dir).count()} "
        f"dhash_dup_groups={groups.count()} thumbs={thumbs.count()}"
    )
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
