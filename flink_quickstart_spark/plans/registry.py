"""Query registry — the single source of truth wiring SURVEY.md §2 rows to
the driver contract in ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the ANSI-SQL
oracle string DuckDB runs on the same parquet views. Column names are
aliased identically on both sides (the driver sorts columns by name before
value-hashing), every floating aggregate is ROUNDed on both sides (double
summation order differs between engines), and ``events.ts``-derived outputs
are emitted as epoch-microsecond bigints (exact on both engines).

Keys with ``oracle=None`` are declared rows-only (approx/randomized ops the
driver checks by row count alone).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

from flink_quickstart_spark.sources.tables import load_tables

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

# Per-session cache of loaded table namespaces, keyed by sf_dir. Avoids
# re-deriving the events ts-conversion plan on every query build.
_TABLE_CACHE: dict[tuple[int, str], SimpleNamespace] = {}


def tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    key = (id(spark), sf_dir.rstrip("/"))
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = load_tables(spark, sf_dir.rstrip("/"))
    return _TABLE_CACHE[key]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def queries() -> dict[str, Builder]:
    from flink_quickstart_spark import plans

    plans.load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from flink_quickstart_spark import plans

    plans.load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
