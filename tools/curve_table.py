"""Print the SCALE_DESIGN.md scaling-curve markdown table from a
SCALE_CURVE_r*.json file (sorted by r12 descending, matching the doc's
convention), so the doc table never drifts from the recorded JSON.

Run: ``python tools/curve_table.py [SCALE_CURVE_r7.json]``
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_CURVE_r7.json"
    keys = json.load(open(path))["keys"]

    def r12(v):
        return v.get("ratio") or 0

    print("| key | sf0.01 s | sf0.1 s | sf1 s | sf3 s | r12 (10×) | accel | e23 | status |")
    print("|---|---|---|---|---|---|---|---|---|")
    n_ok = n_doc = n_other = 0
    for k, v in sorted(keys.items(), key=lambda kv: -r12(kv[1])):
        fit = v.get("fit", {})
        xl = v.get("xl", {})
        status = v.get("status", "?")
        if status == "ok":
            n_ok += 1
        elif status == "superlinear_documented":
            n_doc += 1
        else:
            n_other += 1
        print(
            f"| `{k}` | {fit.get('sf0.01_sec', '—')} | {v.get('sf0.1_sec', '—')} "
            f"| {v.get('sf1_sec', '—')} | {xl.get('sf3_sec', '—')} "
            f"| {v.get('ratio', '—')}× | {fit.get('accel', '—')} "
            f"| {xl.get('e23', '—')} | {status} |"
        )
    print(
        f"\n{len(keys)} keys: {n_ok} ok, {n_doc} superlinear_documented, "
        f"{n_other} other",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
