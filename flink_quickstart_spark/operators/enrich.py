"""External-lookup enrichment — the Spark analog of Flink's
``AsyncDataStream.unorderedWait(stream, AsyncFunction, timeout, capacity)``
(SURVEY.md PARITY row: async I/O).

Flink hides request batching behind per-record async callbacks; the
idiomatic Spark shape is the inverse and strictly more efficient at
scale: ``mapInPandas`` already delivers Arrow BATCHES, so the operator
deduplicates keys within each batch and issues ONE bulk lookup per
batch (what a sane AsyncFunction implementation converges to anyway).
Capacity/in-flight control maps to Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) × task parallelism;
timeout/retry policy belongs to the injected client.

At 100 TB: per-batch dedup bounds the external QPS by
(distinct keys per batch × tasks), not row count; for hot keys,
pre-aggregate or dimension-join instead — an external service should
never see the raw fact cardinality. The lookup client is injected as a
plain callable (keys -> {key: value}) so tests run a deterministic fake
and deployments wrap their real client (with its own pooling/retries).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    key_col: str,
    lookup: Callable[[list], dict],
    out_col: str = "enriched",
    out_type: str = "string",
) -> DataFrame:
    """Append ``out_col`` = lookup(key) to every row.

    ``lookup`` receives the batch's DISTINCT keys (a list) and returns a
    dict key -> value; missing keys yield NULL. One call per Arrow
    batch per task — the bulk-request pattern.
    """
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the frame")
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    # new list — StructType holds the given list by REFERENCE, so an
    # in-place .add() would mutate the input frame's schema object
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, _parse_datatype_string(out_type))]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf[key_col].dropna().unique().tolist()
            mapping = lookup(keys) if keys else {}
            pdf = pdf.copy()
            pdf[out_col] = pdf[key_col].map(mapping)
            yield pdf

    return df.mapInPandas(fn, schema)
