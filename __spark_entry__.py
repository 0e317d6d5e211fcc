"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`flink_quickstart_spark.plans.registry` — every
operator from SURVEY.md §2 registers its Spark builder and its DuckDB
oracle SQL there; this module only re-exports the driver's three entry
points.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from flink_quickstart_spark.plans import registry as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape grouped aggregation) on sf0.001."""
    _ensure_configs(spark)
    return _registry.queries()["q_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    builders = _registry.queries()
    return {name: _with_configs(fn) for name, fn in builders.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (sql-oracle keys only)."""
    return _registry.oracle_sql()


def _ensure_configs(spark: SparkSession) -> None:
    """Apply runtime-settable configs the engine depends on when the driver
    hands us a session built without our factory.

    ``spark.sql.legacy.parquet.nanosAsLong`` is runtime-settable (it is
    read at scan planning time), and UTC rendering keeps timestamps
    engine-portable.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Manifest snapshot reads pass explicit leaf-file lists; keep the
    # distributed listing job for genuinely huge path sets only
    # (see session.py for the measurement).
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")


def _with_configs(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_configs(spark)
        # Size shuffle partitions to the input (runtime-settable): the
        # driver's session may default to 200 partitions, which is pure
        # scheduling overhead at correctness-gate scale and undersized on
        # a real cluster; ~128 MB per partition either way.
        try:
            from flink_quickstart_spark.session import (
                dir_bytes,
                shuffle_partitions_for_bytes,
            )

            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(shuffle_partitions_for_bytes(dir_bytes(sf_dir))),
            )
        except Exception:  # noqa: BLE001 — never fail a query over tuning
            pass
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped
