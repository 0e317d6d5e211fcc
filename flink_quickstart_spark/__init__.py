"""flink_quickstart_spark — a PySpark-native analytics & stream-processing engine.

A from-scratch re-expression of the capability surface of the reference
``pilillo/flink-quickstart`` (a Flink streaming/batch quickstart project;
the checkout at /root/reference is empty — see SURVEY.md §0 for the
evidence policy) on idiomatic Spark: DataFrame/SQL + Catalyst for batch,
Structured Streaming for streams, Arrow-batched Pandas UDFs where Python
is unavoidable.

Layout:
- ``session``   — SparkSession factory with the engine's required configs
- ``sources``   — batch/streaming source + sink adapters (parquet, csv, json,
                  socket, rate, directory-monitor streams)
- ``operators`` — composed operators Spark lacks natively (as-of join,
                  top-k, dedup family, similarity search, salting)
- ``functions`` — scalar/text-analysis function library (lang-id, quality,
                  tokens, fingerprints)
- ``plans``     — the declared query set from SURVEY.md §2: every query key
                  registered with its Spark builder AND its DuckDB oracle SQL
- ``streaming`` — Structured Streaming harness + stateful processors
"""

from flink_quickstart_spark.session import get_spark
from flink_quickstart_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
