"""End-to-end LLM training-corpus pipeline on this engine.

documents → quality filter → exact dedup → MinHash near-dup prune →
dedup-group canonical selection → benchmark decontamination → PII scrub
→ unigram cross-entropy quality cut (worst 5% dropped)
→ deterministic train/test split → partitioned parquet. Every stage is
a declarative DataFrame op from the engine's operator library, so the
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
from flink_quickstart_spark.operators.dedup import (
    exact_dedup,
    jaccard_neardup_pairs,
    minhash_lsh_pairs,
    word_shingles,
)
from flink_quickstart_spark.operators.iterative import connected_components
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

    # 4. exact-Jaccard dedup groups: cluster remaining near-dups (with
    # the hot-shingle DF cap bounding candidate cost) and keep one
    # canonical doc per cluster — the lowest id, deterministically.
    jpairs = jaccard_neardup_pairs(
        pruned, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=1000
    )
    comp = connected_components(
        jpairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    )
    non_canonical = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canonical = pruned.join(non_canonical, "doc_id", "left_anti")

    # 5. benchmark decontamination: drop docs overlapping the held-out
    # set (here the md5-rule subset; in production, the eval suite).
    sh = word_shingles(canonical, "doc_id", "text", 3)
    bench_flag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "e", "f"
    )
    bench_ids = canonical.where(bench_flag).select("doc_id")
    bench_sh = sh.join(bench_ids, "doc_id").select("shingle").distinct()
    overlap = (
        sh.join(bench_ids, "doc_id", "left_anti")
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    sizes = (
        sh.join(bench_ids, "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    contaminated = (
        sizes.join(overlap, "doc_id")
        .where(F.col("n_overlap") / F.col("n_sh") >= 0.2)
        .select("doc_id")
    )
    clean = canonical.join(bench_ids, "doc_id", "left_anti").join(
        contaminated, "doc_id", "left_anti"
    )

    # 6. PII scrub (regex redaction — JVM-side, linear)
    clean = clean.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                "text", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"
            ),
            "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}",
            "[EMAIL]",
        ),
    )

    # 7. model-based quality scoring: per-doc cross-entropy under the
    # corpus unigram LM (high = off-distribution); drop the worst 5%.
    # The upstream DAG (dedup + CC + decontamination) is deep and feeds
    # three more actions — materialize it once (at 100 TB: a staged
    # parquet table between pipeline phases).
    clean = clean.localCheckpoint()
    toks = clean.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = toks.select(F.count(F.lit(1)).cast("double").alias("n"))
    xent = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg((-F.avg(F.log(F.col("c") / F.col("n")))).alias("xent"))
    )
    cutoff = xent.approxQuantile("xent", [0.95], 0.01)[0]
    clean = clean.join(
        xent.where(F.col("xent") <= cutoff).select("doc_id"), "doc_id", "left_semi"
    )

    # 8. deterministic hash split (no RNG state, reproducible anywhere)
    h = F.md5(F.col("doc_id").cast("string"))
    final = clean.withColumn(
        "split",
        F.when(F.substring(h, 1, 1).isin("0", "1"), "test").otherwise("train"),
    )

    # 9. deterministic epoch shuffle: global position = two-phase row
    # number over a keyed hash (operators/rank.py — no single-reducer
    # window), so every training run reads the same order.
    from flink_quickstart_spark.operators.rank import global_row_number

    final = final.withColumn(
        "h8",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
    )
    final = global_row_number(
        final, order_by=[F.col("h8").asc(), F.col("doc_id").asc()],
        bucket_col="h8", out_col="pos",
    ).drop("h8")

    # 10. shard assignment audit: hash-mod shards with a balance check
    # before the write fans out (balance ≈ 1.0 per shard = even bytes).
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(8),
    )
    audit = (
        final.withColumn("shard", shard)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
    )

    # 11. partitioned landing: split/lang directories prune downstream scans
    final.write.mode("overwrite").partitionBy("split", "lang").parquet(out_dir)

    # 12. training-example materialization (round-4 ops): chunk the train
    # split into 50-token windows (stride 40) and emit deterministic
    # T5-style span-corruption pairs — masked input + sentinel targets.
    # Both stages are map-only array expressions: the example writer
    # adds NO shuffle beyond the partitioned read.
    toks_arr = F.filter(F.split("text", " "), lambda w: w != "")
    train = (
        spark.read.parquet(out_dir)
        .where(F.col("split") == "train")
        .select("doc_id", toks_arr.alias("t"))
        .where(F.size("t") > 0)
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(40)
    )
    chunks = train.select(
        "doc_id", F.explode(starts).alias("start"), "t"
    ).select(
        "doc_id",
        (F.col("start") / 40).cast("long").alias("chunk_id"),
        F.array_join(F.slice(F.col("t"), F.col("start") + 1, 50), " ").alias(
            "text"
        ),
    )
    mask = F.expr(
        """array_join(filter(transform(split(text, ' '), (w, i) ->
           CASE WHEN i % 20 = 0
                THEN concat('<extra_id_', CAST(i DIV 20 AS STRING), '>')
                WHEN i % 20 < 3 THEN '' ELSE w END),
           w -> w != ''), ' ')"""
    )
    target = F.expr(
        """array_join(filter(transform(split(text, ' '), (w, i) ->
           CASE WHEN i % 20 = 0
                THEN concat('<extra_id_', CAST(i DIV 20 AS STRING), '> ', w)
                WHEN i % 20 < 3 THEN w ELSE '' END),
           w -> w != ''), ' ')"""
    )
    examples = chunks.select(
        "doc_id", "chunk_id", mask.alias("inputs"), target.alias("targets")
    )
    examples.write.mode("overwrite").parquet(f"{out_dir}_examples")

    kept = spark.read.parquet(out_dir)
    print(f"input={docs.count()} after_quality={quality.count()} "
          f"after_exact={deduped.count()} after_neardup={pruned.count()} "
          f"after_groups={canonical.count()} after_decontam+scrub={clean.count()}")
    kept.groupBy("split").count().orderBy("split").show()
    print("shard balance:")
    audit.orderBy("shard").show()
    n_ex = spark.read.parquet(f"{out_dir}_examples").count()
    print(f"span-corruption training examples: {n_ex}")
    print("wrote", out_dir, "and", f"{out_dir}_examples")


if __name__ == "__main__":
    main()
