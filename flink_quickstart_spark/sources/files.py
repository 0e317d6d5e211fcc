"""File / socket / rate source and sink adapters (SURVEY.md §2.A).

Reference surface [PK]: Flink ``env.readTextFile`` / ``readCsvFile`` /
``socketTextStream`` / datagen sources and ``writeAsText``/``writeAsCsv``
sinks (checkout empty — see SURVEY.md §0).

Batch readers REQUIRE an explicit schema by policy: schema inference
scans data twice and produces SF-dependent types — both unacceptable at
100 TB. Streaming file sources require one by Spark rule anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """A2: CSV with explicit schema (Flink ``readCsvFile``).

    Default parse mode is FAILFAST, not Spark's PERMISSIVE: at pipeline
    scale a schema mismatch silently nullifying a column (observed:
    doubles read as int → 100% nulls) is far costlier than a failed job.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, mode: str = "FAILFAST"
) -> DataFrame:
    """A2: JSON-lines with explicit schema (FAILFAST — see read_csv)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """A2: one string column ``value`` per line (Flink ``readTextFile``)."""
    return spark.read.text(path)


def from_collection(spark: SparkSession, rows, schema: T.StructType | str) -> DataFrame:
    """A3: collection source (Flink ``env.fromElements/fromCollection``)."""
    return spark.createDataFrame(rows, schema)


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """A4: socket text stream (Flink ``socketTextStream``) — demo/debug
    source; one ``value: string`` column, no replay, no exactly-once."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """A5: rate/datagen source — ``(timestamp, value)`` rows for load
    tests and streaming smoke checks."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """A7: Kafka source (Flink ``FlinkKafkaConsumer``).

    The ``spark-sql-kafka-0-10`` package is a DEPLOY-TIME dependency
    (``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``)
    and is not present in this container (verified: no kafka jar in
    /opt/spark/jars) — calling this without it raises Spark's
    MISSING_KAFKA_PACKAGE AnalysisException. Tests use the directory-
    monitoring file source instead (streaming/harness.py). Offline
    acquisition re-attempted and still unavailable r9 (2026-08-15 AM),
    r10 (2026-08-15 PM), r11 (2026-08-16 AM), and r12 (2026-08-16 PM:
    `find / -name '*kafka*.jar'` → nothing, `import google.protobuf`
    → ModuleNotFoundError, PyPI DNS resolution fails): the environment
    contract forbids package installs.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """A9: CSV sink (Flink ``writeAsCsv``). Doubles round-trip losslessly
    (shortest-round-trip repr)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """A9: parquet sink; ``partition_by`` enables partition pruning and
    dynamic partition pruning for downstream readers — the default layout
    choice at scale."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
