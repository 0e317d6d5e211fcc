"""Re-apply the e ≥ 1.0 status annotation (VERDICT r7 #7) to a decade
JSON produced before the annotation landed, or recheck one after edits
to the law table. Idempotent: statuses are recomputed from the recorded
numbers + the current DECADE_OUTPUT_LAWS / DOCUMENTED_SUPERLINEAR
tables; measured fields are never touched.

Run: ``python tools/annotate_decade.py SCALE_TEXT_DECADE_r8.json``
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import scale_curve as sc  # noqa: E402
from text_decade_probe import DECADE_OUTPUT_LAWS  # noqa: E402


def main() -> int:
    path = Path(sys.argv[1])
    data = json.loads(path.read_text())
    n = 0
    for key, rec in data.get("keys", {}).items():
        if rec.get("status") not in ("ok", "linear_at_bound", "linear_at_bound_undocumented"):
            continue
        e = rec.get("e_decade")
        if e is None or e < 1.0:
            continue
        if key in DECADE_OUTPUT_LAWS:
            rec["status"] = "linear_at_bound"
            rec["output_law"] = DECADE_OUTPUT_LAWS[key]
        elif key in sc.DOCUMENTED_SUPERLINEAR:
            rec["status"] = "linear_at_bound"
            rec["output_law"] = sc.DOCUMENTED_SUPERLINEAR[key]
        else:
            rec["status"] = "linear_at_bound_undocumented"
        n += 1
        print(f"{key}: e={e} -> {rec['status']}")
    path.write_text(json.dumps(data, indent=1, sort_keys=True))
    print(f"annotated {n} keys in {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
