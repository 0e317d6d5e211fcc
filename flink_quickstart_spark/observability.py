"""Pipeline observability — the Flink metrics/accumulators analog.

Flink jobs expose per-operator counters (records in/out, late events)
through the metrics registry [PK]. Spark's idiomatic equivalent for a
DataFrame pipeline is ``DataFrame.observe``: named aggregate metrics
evaluated INSIDE the plan as rows flow through — zero extra passes, no
``.count()`` re-computation, works identically in batch and Structured
Streaming (where metrics surface per micro-batch via
``StreamingQueryListener``).

Usage::

    df, handle = observe_quality(df, "ingest", null_cols=["user_id"])
    df.write...            # any single action
    m = handle()           # {'n_rows': ..., 'n_null_user_id': ...}

The handle reads the observation AFTER an action has run the plan once;
calling it before any action raises.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str,
    null_cols: list[str] | None = None,
    extra: dict[str, "F.Column"] | None = None,
) -> tuple[DataFrame, Callable[[], dict]]:
    """Attach row-count + per-column null-count (+ caller metrics) as an
    in-plan observation. Returns the instrumented frame and a zero-cost
    getter for the metrics dict."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    for alias, col in (extra or {}).items():
        metrics.append(col.alias(alias))
    obs = Observation(name)
    return df.observe(obs, *metrics), lambda: dict(obs.get)
