"""Order-theta join AGGREGATES without nested loops.

A theta join on an order predicate (``l.v > r.v``, ``l.v <= r.v``)
plans as BroadcastNestedLoopJoin — O(|L|·|R|) pair work, the 100 TB
anti-pattern. But when the consumer never looks at the pairs, only at a
per-left-row aggregate of matching right rows, the join is a rank
lookup:

    count(r.v < l.v)  ==  position of l.v in the sorted right values
    sum(r.w : r.v < l.v)  ==  prefix sum of w at that position

which the distributed prefix-sum machinery (:mod:`.rank`) evaluates in
linear time: union the probe rows (weight 0) with the value rows
(weight 1 for COUNT, ``w`` for SUM), range-bucket by value, running-sum
the weights with per-bucket offsets, and read each probe's running
total. One hash shuffle, partitioned windows only, O(buckets) driver
state.

Strictness is an ordering decision, not an epsilon hack: at equal
value, a STRICT probe (``<``) sorts BEFORE the value rows (their
weights not yet accumulated), a non-strict probe (``<=``) after. Ties
among same-side rows carry equal weight contributions for every probe,
so the prefix sum is well-defined without a unique total ordering.

This is the sort-merge evaluation of band/inequality joins (classic
merge-count), re-expressed on DataFrames; `q_join_theta` routes through
it, replacing the BNLJ demonstration form that stood waived rounds 3-5.
AVG/MIN/MAX-below follow from the same machinery (avg = sum/count; min
below a probe is the global min for any probe above it — a running-min
window instead of a running sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import global_running_sum, global_running_sums

_V = "_theta_v"
_W = "_theta_w"
_W2 = "_theta_w2"
_SIDE = "_theta_side"
_PROBE = "_theta_probe"
_NB = "_theta_nb"
_NB2 = "_theta_nb2"


def _running_below(
    probes: DataFrame,
    values: DataFrame,
    probe_col: str,
    value_col: str,
    value_weight: Column,
    weight_type: str,
    strict: bool,
    buckets: int,
) -> DataFrame:
    """Shared core: probe rows (weight 0) unioned with value rows
    (weight = ``value_weight``), distributed prefix-sum, probes read
    their running total in ``_NB``.

    Null probe or value keys are dropped (SQL comparison semantics: a
    null never satisfies the predicate, and a null probe matches
    nothing).
    """
    probe_side = 0 if strict else 1
    payload = list(probes.columns)
    payload_types = dict(probes.dtypes)
    # Both union sides get IDENTICAL explicit schemas (null-typed
    # payload literals on the values side). NO null filter at or below
    # the union: predicate pushdown would sink it into the union
    # children, where a filter on a cast/aliased column trips a Spark
    # 4.1 Union constraint-rewrite bug ("key not found: <attr>").
    # Instead, null VALUE rows ride along with weight 0 — nulls sort
    # first under asc so a zero weight makes them invisible to every
    # running sum — and null PROBES are dropped by the output-side
    # filter, which cannot push below the (non-partition-key) window.
    p = probes.select(
        *payload,
        F.col(probe_col).cast("double").alias(_V),
        F.lit(0).cast(weight_type).alias(_W),
        F.lit(probe_side).alias(_SIDE),
        F.lit(True).alias(_PROBE),
    )
    v = values.select(
        *[
            F.lit(None).cast(payload_types[c]).alias(c)
            for c in payload
        ],
        F.col(value_col).cast("double").alias(_V),
        F.when(F.col(value_col).isNotNull(), value_weight)
        .otherwise(F.lit(0))
        .cast(weight_type)
        .alias(_W),
        F.lit(1 - probe_side).alias(_SIDE),
        F.lit(False).alias(_PROBE),
    )
    union = p.unionByName(v)
    running = global_running_sum(
        union,
        _W,
        order_by=[F.col(_V).asc(), F.col(_SIDE).asc()],
        bucket_col=_V,
        out_col=_NB,
        buckets=buckets,
    )
    return running.where(F.col(_PROBE) & F.col(_V).isNotNull())


def theta_count_below(
    probes: DataFrame,
    values: DataFrame,
    probe_col: str,
    value_col: str,
    out_col: str = "n_below",
    strict: bool = True,
    buckets: int = 64,
) -> DataFrame:
    """Append ``out_col`` = count of ``values`` rows with
    ``value_col < probe_col`` (``<=`` when ``strict=False``) to every
    probe row — the scalable form of
    ``probes JOIN values ON value < probe`` + ``GROUP BY probe, COUNT``.
    """
    running = _running_below(
        probes, values, probe_col, value_col,
        value_weight=F.lit(1), weight_type="long",
        strict=strict, buckets=buckets,
    )
    return (
        running.withColumn(out_col, F.col(_NB).cast("long"))
        .drop(_V, _W, _SIDE, _PROBE, _NB)
    )


def theta_sum_below(
    probes: DataFrame,
    values: DataFrame,
    probe_col: str,
    value_col: str,
    sum_col: str | None = None,
    out_col: str = "sum_below",
    strict: bool = True,
    buckets: int = 64,
) -> DataFrame:
    """Append ``out_col`` = SUM of ``sum_col`` (default: ``value_col``
    itself) over the ``values`` rows with ``value_col < probe_col``
    (``<=`` when ``strict=False``) — the scalable form of
    ``probes JOIN values ON value < probe`` + ``GROUP BY probe,
    SUM(w)``. Null weights contribute 0 (SQL SUM semantics). Double
    weights inherit the usual summation-order caveat: round the
    output like any other float aggregate.
    """
    wc = sum_col or value_col
    running = _running_below(
        probes, values, probe_col, value_col,
        value_weight=F.coalesce(F.col(wc), F.lit(0)).cast("double"),
        weight_type="double",
        strict=strict, buckets=buckets,
    )
    return (
        running.withColumn(out_col, F.col(_NB).cast("double"))
        .drop(_V, _W, _SIDE, _PROBE, _NB)
    )


def theta_below_stats(
    probes: DataFrame,
    values: DataFrame,
    probe_col: str,
    value_col: str,
    sum_col: str | None = None,
    count_col: str = "n_below",
    out_sum_col: str = "sum_below",
    strict: bool = True,
    buckets: int = 64,
) -> DataFrame:
    """COUNT and SUM below each probe in ONE pass: a single union /
    bucket assignment / partitioned window evaluates both running
    statistics (rank.global_running_sums), so consumers needing both —
    the `q_join_theta_sum` shape, or any avg-below — pay one shuffle
    instead of two full passes."""
    probe_side = 0 if strict else 1
    wc = sum_col or value_col
    payload = list(probes.columns)
    payload_types = dict(probes.dtypes)
    # identical union-side schemas, no filter below the window — see
    # _running_below for the Catalyst constraint-rewrite rationale
    p = probes.select(
        *payload,
        F.col(probe_col).cast("double").alias(_V),
        F.lit(0).cast("long").alias(_W),
        F.lit(0.0).alias(_W2),
        F.lit(probe_side).alias(_SIDE),
        F.lit(True).alias(_PROBE),
    )
    v = values.select(
        *[F.lit(None).cast(payload_types[c]).alias(c) for c in payload],
        F.col(value_col).cast("double").alias(_V),
        F.when(F.col(value_col).isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias(_W),
        F.when(
            F.col(value_col).isNotNull(),
            F.coalesce(F.col(wc), F.lit(0)),
        )
        .otherwise(0)
        .cast("double")
        .alias(_W2),
        F.lit(1 - probe_side).alias(_SIDE),
        F.lit(False).alias(_PROBE),
    )
    running = global_running_sums(
        p.unionByName(v),
        [_W, _W2],
        order_by=[F.col(_V).asc(), F.col(_SIDE).asc()],
        bucket_col=_V,
        out_cols=[_NB, _NB2],
        buckets=buckets,
    )
    return (
        running.where(F.col(_PROBE) & F.col(_V).isNotNull())
        .withColumn(count_col, F.col(_NB).cast("long"))
        .withColumn(out_sum_col, F.col(_NB2).cast("double"))
        .drop(_V, _W, _W2, _SIDE, _PROBE, _NB, _NB2)
    )
