"""Bucketed-table layout — the shuffle-elimination path for repeated joins.

At 100 TB the dominant cost of a fact⋈fact equi join is shuffling both
sides on the key. Spark's bucketed datasource tables pre-hash-partition
data into a fixed number of buckets AT WRITE TIME; a join between two
tables bucketed on the join key with the same bucket count reads
co-located buckets and plans with NO Exchange on either side (verified by
tests/test_plans.py::test_bucketed_join_has_no_shuffle).

This is the Spark analog of the reference archetype's keyed-stream
co-partitioning (Flink ``keyBy`` guarantees records of one key meet in
one subtask); here the guarantee is baked into the storage layout so it
is paid once per dataset, not once per query. See docs/SCALE_DESIGN.md.

Guidance for the 100 TB deployment:
- bucket count ≈ total_bytes / 512 MB, rounded to a power of two, chosen
  once per table family so it matches across all joinable facts;
- also ``sortBy`` the bucket key so the join is a merge without a sort;
- bucket pruning: equality filters on the bucket column scan 1/N buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and by
    default sorted) on ``bucket_col``. Overwrites any prior table of the
    same name."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required — reading
    the parquet path directly loses the bucket metadata and the no-shuffle
    join property with it)."""
    return spark.table(table)
