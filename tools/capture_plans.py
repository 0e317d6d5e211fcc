"""Dump ``.explain("formatted")`` for a list of registry keys into
``plans/<tag>/<key>_<suffix>.txt`` — the before/after plan evidence the
optimization rounds commit (the judge checks plan claims against these
files without running Spark).

Run: ``python tools/capture_plans.py --tag r12 --suffix before --keys k1,k2``
     (``--keys all`` captures every registry key; default sf0.1)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from flink_quickstart_spark import get_spark  # noqa: E402
from flink_quickstart_spark.plans import load_all, registry  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    load_all()
    keys = (
        sorted(registry.REGISTRY)
        if args.keys == "all"
        else [k.strip() for k in args.keys.split(",") if k.strip()]
    )
    out_dir = REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name=f"plan-capture-{args.tag}", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_err = 0
    for key in keys:
        try:
            df = registry.REGISTRY[key].builder(spark, args.sf)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"ERROR building/explaining {key}: {exc}\n"
            n_err += 1
        (out_dir / f"{key}_{args.suffix}.txt").write_text(text)
        print(f"wrote plans/{args.tag}/{key}_{args.suffix}.txt")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
