"""Tests for file/collection sources and skew helpers."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.skew import salted_agg, salted_join, with_salt
from flink_quickstart_spark.sources.files import (
    from_collection,
    read_csv,
    read_json,
    read_text,
    write_csv,
    write_parquet,
)


def _tmp(name):
    d = os.path.join(tempfile.gettempdir(), "fqs_scratch", "srctests", name)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    return d


def test_csv_roundtrip_exact_doubles(spark):
    df = from_collection(
        spark, [(1, 0.1 + 0.2), (2, 1e-17), (3, 123456.789012345)], "id long, v double"
    )
    p = _tmp("csv1")
    write_csv(df, p)
    back = read_csv(spark, p, "id long, v double")
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_json_and_text_sources(spark):
    df = from_collection(spark, [(1, "a"), (2, "b")], "id long, s string")
    p = _tmp("json1")
    df.write.mode("overwrite").json(p)
    back = read_json(spark, p, "id long, s string")
    assert back.count() == 2
    txt = read_text(spark, p)
    assert txt.columns == ["value"] and txt.count() == 2


def test_write_parquet_partitioned_prunes(spark):
    df = from_collection(
        spark, [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, part string, v int"
    )
    p = _tmp("pq1")
    write_parquet(df, p, partition_by=["part"])
    assert os.path.isdir(os.path.join(p, "part=a"))
    pruned = spark.read.parquet(p).where(F.col("part") == "a")
    assert pruned.count() == 2


def test_with_salt_deterministic_and_bounded(spark):
    df = from_collection(spark, [(i, i % 3) for i in range(100)], "id long, k int")
    s1 = {r.id: r["__salt"] for r in with_salt(df, 8).collect()}
    s2 = {r.id: r["__salt"] for r in with_salt(df, 8).collect()}
    assert s1 == s2  # no rand(): retry-stable
    assert all(0 <= v < 8 for v in s1.values())


def test_salted_agg_matches_plain_agg(spark):
    df = from_collection(
        spark, [(i % 5, float(i)) for i in range(1000)], "k int, v double"
    )
    plain = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": F.count(F.lit(1)),
                "s": F.sum("v"),
                "mn": F.min("v"),
                "mx": F.max("v"),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain_join(spark):
    big = from_collection(
        spark, [(i % 4, i) for i in range(500)], "k int, payload long"
    )
    small = from_collection(spark, [(0, "a"), (1, "b"), (2, "c")], "k int, tag string")
    plain = sorted(
        (r.k, r.payload, r.tag) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r.k, r.payload, r.tag) for r in salted_join(big, small, "k", n_salts=4).collect()
    )
    assert plain == salted


def test_aqe_splits_skewed_join_partition(spark):
    """The 100 TB skew story's first line of defense: AQE must detect a
    skewed partition at the shuffle boundary and split it
    (SortMergeJoin(skew=true)) — salting (operators/skew.py) is the
    second line for single pathological keys. Thresholds are lowered so
    test-scale data exercises the same code path production data would."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = left.join(right, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
