"""Full-registry per-key timing regression gate (VERDICT r4 item #4).

Compares the two most recent committed ``VERIFY_r*.json`` full-gate
timing files: any key that got ≥ 3× slower round-over-round (and is
slow enough for the ratio to be meaningful) fails loudly. This is the
gate that would have caught ``q_graph_pagerank``'s 221 s verify cost a
round earlier — its median-key cost was 0.46 s, so the pathology was a
480× outlier, far beyond timing noise.

Thresholds are generous (3×, ≥ 1 s latest) because the verify gate runs
under varying CPU contention; genuine pathologies are order-of-magnitude
events, not 2× wobbles. A deliberate slow-down (e.g. a key made
stricter) gets a documented waiver below.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

REGRESSION_MAX = 3.0
MIN_LATEST_SEC = 1.0

# key -> reason, for deliberate cost increases
WAIVED: dict[str, str] = {
    "q_join_theta": (
        "r6 rewrite: BroadcastNestedLoopJoin (quadratic, toy-fast at "
        "sf0.01) replaced by the merge-count prefix-sum "
        "(operators/theta.py) — pays a quantile probe + two shuffles at "
        "gate scale, linear instead of O(|L|*|R|) at 100 TB; sf1 probe "
        "in SCALE_CURVE_r6.json certifies the scaling"
    ),
}


def _full_rounds():
    rounds = {}
    for path in sorted(glob.glob(str(REPO / "VERIFY_r*.json"))):
        m = re.search(r"VERIFY_r(\d+)\.json$", path)
        if not m:  # e.g. VERIFY_rX.json — skip, mirroring tools/bench_trend.py
            continue
        data = json.loads(Path(path).read_text())
        secs = {
            k: v["secs"]
            for k, v in (data.get("keys") or {}).items()
            if isinstance(v, dict) and isinstance(v.get("secs"), (int, float))
        }
        if secs:
            rounds[int(m.group(1))] = secs
    return rounds


def test_no_per_key_timing_regression():
    rounds = _full_rounds()
    if len(rounds) < 2:
        pytest.skip("need two rounds of full-registry timings")
    ns = sorted(rounds)
    prev, latest = rounds[ns[-2]], rounds[ns[-1]]
    bad = []
    for k, t in latest.items():
        if k in WAIVED or k not in prev or t < MIN_LATEST_SEC:
            continue
        if prev[k] > 0 and t / prev[k] > REGRESSION_MAX:
            bad.append(f"{k}: {prev[k]:.2f}s -> {t:.2f}s ({t / prev[k]:.1f}x)")
    assert not bad, (
        f"per-key verify-time regressions vs r{ns[-2]} "
        f"(>{REGRESSION_MAX}x): {bad}"
    )
