"""Systematized rounding-trap defense (VERDICT r4 item #5).

Two engine-divergence traps are known from rounds 3-4: the sign of
rounded-to-zero doubles (-0.0 vs +0.0) and exact .xxxx5 halves (banker's
vs half-away-from-zero). Both were found by corpus luck; this property
test sweeps them systematically instead.

For EVERY rounding scale used by any registered oracle (extracted from
the oracle SQL), a synthesized micro-table of boundary doubles — exact
halves at that scale, halves ± 1e-12, negative mirrors, ±1e-9
(rounds-to-zero sign trap), and ±0.0 — is rounded by Spark
``F.round(v, k)`` and DuckDB ``round(v, k)`` side by side. The
invariant the oracle corpus relies on:

1. After the repo's ``+ 0.0`` normalization (the documented convention
   for rounded outputs that can hit zero), the engines agree EXACTLY
   on every boundary value at every scale in use.
2. Any raw disagreement is confined to the zero-sign class (both sides
   == 0.0) — i.e. the ``+ 0.0`` convention is SUFFICIENT, and no new
   divergence class (e.g. a half rounded differently) exists.
"""

from __future__ import annotations

import math
import re
from decimal import Decimal

from pyspark.sql import functions as F

from flink_quickstart_spark.plans import load_all
from flink_quickstart_spark.plans.registry import REGISTRY


def oracle_round_scales() -> set[int]:
    load_all()
    scales: set[int] = set()
    for spec in REGISTRY.values():
        if spec.oracle:
            for m in re.finditer(r"round\s*\([^()]*(?:\([^()]*\)[^()]*)*,\s*(\d+)\s*\)",
                                 spec.oracle, flags=re.IGNORECASE):
                scales.add(int(m.group(1)))
    return scales


def boundary_values(k: int) -> list[float]:
    step = Decimal(1).scaleb(-k)
    half = Decimal(5).scaleb(-(k + 1))
    vals: set[float] = {0.0, -0.0, 1e-9, -1e-9, float(half), -float(half)}
    for base in (Decimal(0), Decimal(1), Decimal(2), Decimal("12345")):
        for mult in (0, 1, 2, 7):
            v = float(base + mult * step + half)
            vals |= {v, -v, v + 1e-12, v - 1e-12, -(v + 1e-12), -(v - 1e-12)}
    return sorted(vals)


def test_round_boundaries_agree_across_engines(spark, duck):
    scales = oracle_round_scales()
    assert scales, "no round() sites found in any oracle?"
    # sweep every scale the corpus uses plus the common range
    scales |= set(range(0, 7))

    raw_mismatches = []
    for k in sorted(scales):
        vals = boundary_values(k)
        sdf = spark.createDataFrame([(v,) for v in vals], "v double").select(
            "v", F.round("v", k).alias("r")
        )
        got_spark = {row["v"]: row["r"] for row in sdf.collect()}
        got_duck = {}
        for v in vals:
            got_duck[v] = duck.execute("SELECT round(?::DOUBLE, ?)", [v, k]).fetchone()[0]
        for v in vals:
            s, d = got_spark[v], got_duck[v]
            assert s is not None and d is not None, (k, v)
            assert not (math.isnan(s) or math.isnan(d)), (k, v)
            # invariant 1: the documented `+ 0.0` normalization makes
            # the engines agree exactly
            assert repr(s + 0.0) == repr(d + 0.0), (
                f"scale {k}, input {v!r}: spark {s!r} vs duckdb {d!r} "
                "— NEW divergence class beyond the zero-sign trap"
            )
            if repr(s) != repr(d):
                raw_mismatches.append((k, v, s, d))

    # invariant 2: every raw mismatch is the known -0.0 class
    for k, v, s, d in raw_mismatches:
        assert s == 0.0 and d == 0.0, (
            f"scale {k}, input {v!r}: raw mismatch {s!r} vs {d!r} is not "
            "the zero-sign class"
        )
