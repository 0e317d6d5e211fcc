"""End-to-end LLM training-corpus pipeline on this engine.

documents → quality filter → exact dedup → MinHash near-dup prune →
deterministic train/test split → partitioned parquet. Every stage is a
declarative DataFrame op from the engine's operator library, so the
whole pipeline is ONE Catalyst plan per output and scales by
partitioning (see docs/SCALE_DESIGN.md).

Run: ``python examples/llm_corpus_pipeline.py [sf_dir] [out_dir]``
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from flink_quickstart_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark(app_name="llm-corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir).documents

    # 1. quality gate: cheap JVM-side heuristics, no Python
    tokens = F.split(F.trim("text"), r"\s+")
    quality = docs.where(
        (F.length("text") >= 20) & (F.size(tokens) >= 5)
    )

    # 2. exact dedup on content hash (one shuffle on sha256)
    keepers = exact_dedup(quality, content_col="text", id_col="doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = quality.join(keepers, "doc_id", "left_semi")

    # 3. near-dup prune: MinHash-LSH candidate pairs, keep the lower id
    pairs = minhash_lsh_pairs(deduped, id_col="doc_id", text_col="text", seed=42)
    losers = pairs.select(F.greatest("d1", "d2").alias("doc_id")).distinct()
    pruned = deduped.join(losers, "doc_id", "left_anti")

    # 4. deterministic hash split (no RNG state, reproducible anywhere)
    h = F.md5(F.col("doc_id").cast("string"))
    final = pruned.withColumn(
        "split",
        F.when(F.substring(h, 1, 1).isin("0", "1"), "test").otherwise("train"),
    )

    # 5. partitioned landing: split/lang directories prune downstream scans
    final.write.mode("overwrite").partitionBy("split", "lang").parquet(out_dir)

    kept = spark.read.parquet(out_dir)
    print(f"input={docs.count()} after_quality={quality.count()} "
          f"after_exact={deduped.count()} after_neardup={pruned.count()}")
    kept.groupBy("split").count().orderBy("split").show()
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
