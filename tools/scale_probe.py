"""Scale probe — empirical check that the engine's partitioning policy
holds as data grows (docs/SCALE_DESIGN.md).

Replicates the sf0.1 fact tables N× with key offsets (so join/group keys
stay distinct — no artificial key collapse), then runs the flagship
aggregate and star join and reports wall time, shuffle partition count,
and per-task input. The claim under test: runtime scales ~linearly with
input while the plan shape (broadcasts, partial aggs) is unchanged —
i.e. nothing in the design depends on the data being small.

Run: ``python tools/scale_probe.py [replication=10]``
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.session import dir_bytes, shuffle_partitions_for_bytes
from flink_quickstart_spark.sources.tables import load_tables

SF_DIR = "/root/testdata/sf0.1"


def replicate(df: DataFrame, key_cols: list[str], n: int, stride: int) -> DataFrame:
    """Union n copies, offsetting key columns so keys stay distinct."""
    copies = []
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * stride))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def timed(label: str, df: DataFrame) -> float:
    t0 = time.time()
    df.collect()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s")
    return dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    est_bytes = dir_bytes(SF_DIR) * n
    parts = shuffle_partitions_for_bytes(est_bytes)
    spark = get_spark(app_name="scale-probe", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)
    print(f"replication={n} est_input={est_bytes/1e6:.0f}MB shuffle_partitions={parts}")

    stride = 10_000_000
    lineitem = replicate(t.lineitem, ["l_orderkey"], n, stride)
    orders = replicate(t.orders, ["o_orderkey", "o_custkey"], n, stride)
    customer = replicate(t.customer, ["c_custkey"], n, stride)

    # flagship agg (TPC-H Q1 shape) at 1× and N×
    def q1(li):
        return (
            li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base"),
                F.avg("l_quantity").alias("avg_qty"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    q1(t.lineitem).collect()  # warm-up: codegen + IO cache out of the timings
    base = timed("q1 1x", q1(t.lineitem))
    big = timed(f"q1 {n}x", q1(lineitem))
    print(f"q1 scaling factor: {big / base:.1f}x for {n}x data")

    # star join at N×: dims still broadcast, facts shuffle
    def star(c, o, li):
        dims = F.broadcast(
            t.nation.join(
                F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
        )
        return (
            c.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
            .join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("n_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    star(t.customer, t.orders, t.lineitem).collect()  # warm-up
    base_j = timed("star 1x", star(t.customer, t.orders, t.lineitem))
    big_j = timed(f"star {n}x", star(customer, orders, lineitem))
    print(f"star scaling factor: {big_j / base_j:.1f}x for {n}x data")

    plan = star(customer, orders, lineitem)._jdf.queryExecution().executedPlan().toString()
    n_bc = plan.count("BroadcastHashJoin")
    print(f"star {n}x plan: BroadcastHashJoin={n_bc} (dims still broadcast at scale)")

    # two-phase global rank at N×: every window stays partitioned (the
    # bucket column), so the sort/rank spreads over `buckets` tasks
    # instead of one — the claim operators/rank.py makes for 100 TB.
    from flink_quickstart_spark.operators.rank import global_row_number

    def ranked(o, buckets):
        return global_row_number(
            o.select("o_orderkey", "o_totalprice"),
            order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
            bucket_col="o_totalprice",
            buckets=buckets,
        )

    ranked(t.orders, 64).collect()  # warm-up
    base_r = timed("rank 1x", ranked(t.orders, 64))
    big_r = timed(f"rank {n}x", ranked(orders, 64 * n))
    print(f"rank scaling factor: {big_r / base_r:.1f}x for {n}x data")
    rplan = (
        ranked(orders, 64 * n)._jdf.queryExecution().executedPlan().toString()
    )
    windows = [ln for ln in rplan.splitlines() if "Window" in ln]
    assert all("_rank_bucket" in ln for ln in windows if "Window" in ln), windows
    print(f"rank {n}x plan: {len(windows)} Window node(s), all bucket-partitioned")

    # Misra-Gries heavy hitters at N×: the wide stage emits ≤ capacity
    # rows per partition REGARDLESS of partition size — the sketch
    # summary (what actually shuffles) must stay bounded while input
    # grows N×, and the verified output must be byte-identical to the
    # 1× answer (replication preserves token frequencies).
    from flink_quickstart_spark.operators.freq import (
        heavy_hitters,
        misra_gries_summaries,
    )

    docs = load_tables(spark, SF_DIR).documents
    docs_big = replicate(docs, ["doc_id"], n, 10_000_000)

    def toks(d):
        return d.select(F.explode(F.split("text", " ")).alias("word")).where(
            F.col("word") != ""
        )

    heavy_hitters(toks(docs), "word", 0.02, 64).collect()  # warm-up
    base_h = timed("heavy-hitters 1x", heavy_hitters(toks(docs), "word", 0.02, 64))
    big_h = timed(
        f"heavy-hitters {n}x", heavy_hitters(toks(docs_big), "word", 0.02, 64)
    )
    print(f"heavy-hitters scaling factor: {big_h / base_h:.1f}x for {n}x data")
    n_parts = toks(docs_big).rdd.getNumPartitions()
    summary_rows = misra_gries_summaries(toks(docs_big), "word", 64).count()
    assert summary_rows <= 64 * n_parts, (summary_rows, n_parts)
    print(
        f"MG summary at {n}x: {summary_rows} rows from {n_parts} partitions "
        f"(bound {64 * n_parts}) — shuffle stays sketch-sized"
    )
    hh_small = {(r.word, r.freq) for r in heavy_hitters(toks(docs), "word", 0.02, 64).collect()}
    hh_big = {(r.word, r.freq) for r in heavy_hitters(toks(docs_big), "word", 0.02, 64).collect()}
    assert hh_small == hh_big, "replication must preserve heavy-hitter frequencies"
    print("heavy-hitter set identical at 1x and N× — exactness preserved")

    # First-occurrence attribution (novelty / vocab-growth core) at N×:
    # the "seen in any earlier doc?" test is one min(doc_id) aggregate
    # over the trigram vocabulary plus a hash join back — runtime must
    # scale ~linearly with trigram mass, never quadratically with the
    # number of doc pairs it implicitly compares.
    def novelty(d):
        toks_arr = F.filter(F.split("text", r"\s+"), lambda x: x != "")
        tri = (
            d.select("doc_id", toks_arr.alias("toks"))
            .where(F.size("toks") >= 3)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(toks) - 3),"
                        " i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
                    )
                ).alias("trigram"),
            )
            .distinct()
        )
        first = tri.groupBy("trigram").agg(F.min("doc_id").alias("first_doc"))
        novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
        return (
            tri.join(first, "trigram")
            .groupBy("doc_id")
            .agg(F.sum(novel).alias("n_novel"))
        )

    novelty(docs).collect()  # warm-up
    base_n = timed("novelty 1x", novelty(docs))
    big_n = timed(f"novelty {n}x", novelty(docs_big))
    print(f"novelty scaling factor: {big_n / base_n:.1f}x for {n}x data")

    # Text-PAIR operators at N× via DISJOINT-UNIVERSE replication: each
    # copy's tokens get a per-copy prefix so vocabularies never collide
    # across copies — pairs only form within a copy, the honest model of
    # "n independent shards of corpus" (plain replication would plant n
    # exact duplicates of every doc and measure the quadratic output of
    # true dup groups, not the operator's scaling). The registered
    # builders run unmodified against a staged sf dir, so the probe
    # exercises the production code path end-to-end.
    staged = stage_disjoint_docs_dir(spark, n)
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    for key in (
        "q_llm_winnowing",
        "q_llm_tfidf_cosine",
        "q_llm_source_overlap",
        "q_text_halves_overlap",
    ):
        b = registry.REGISTRY[key].builder
        b(spark, SF_DIR).collect()  # warm-up
        base_t = timed(f"{key} 1x", b(spark, SF_DIR))
        big_t = timed(f"{key} {n}x", b(spark, staged))
        print(f"{key} scaling factor: {big_t / base_t:.1f}x for {n}x data")
        plan = b(spark, staged)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, key
        n_smj = plan.count("SortMergeJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        print(f"{key} {n}x plan: SortMergeJoin={n_smj} BroadcastHashJoin={n_bhj}")


def stage_disjoint_docs_dir(spark, n: int, stride: int = 10_000_000) -> str:
    """A temp sf-layout dir whose ``documents`` is the N× disjoint-
    universe replication; every other table symlinks to SF_DIR."""
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="fqs_scale_docs_")
    for tbl in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        os.symlink(f"{SF_DIR}/{tbl}.parquet", f"{base}/{tbl}.parquet")
    docs = load_tables(spark, SF_DIR).documents
    copies = []
    for i in range(n):
        tag = F.lit(f"c{i}_")
        pref = F.concat_ws(
            " ",
            F.transform(F.split("text", " "), lambda t: F.concat(tag, t)),
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"),
                pref.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(f"{base}/documents.parquet")
    return base


if __name__ == "__main__":
    main()
