"""Per-key timing sweep at an arbitrary SF with the noop sink (guide
§1.4) — computation cost without collect()-side row materialization.
Used by the optimization rounds to rank keys by actual plan cost.

Run: ``python tools/time_sweep.py [--sf DIR] [--runs N] [--json OUT]
[--keys k1,k2]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from flink_quickstart_spark import get_spark  # noqa: E402
from flink_quickstart_spark.plans import load_all, registry  # noqa: E402
from flink_quickstart_spark.session import (  # noqa: E402
    dir_bytes,
    shuffle_partitions_for_bytes,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--json", default=None)
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    load_all()
    keys = (
        [k.strip() for k in args.keys.split(",") if k.strip()]
        if args.keys
        else sorted(registry.REGISTRY)
    )
    spark = get_spark(
        app_name="time-sweep",
        shuffle_partitions=shuffle_partitions_for_bytes(dir_bytes(args.sf)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Machine-load self-description (VERDICT r12 #2, mirroring
    # tools/sweep_sf1.py): per-key load1 at start plus file-level load
    # triples make cross-round timing comparisons self-qualifying; a
    # sweep started on a loaded box flags itself not-comparable.
    cpus = os.cpu_count() or 32
    load_start = os.getloadavg()
    load_flagged = load_start[2] > cpus / 2
    if load_flagged:
        print(
            f"WARNING: load15={load_start[2]:.1f} > {cpus}/2 at sweep "
            "start — timings will not be comparable across rounds; "
            "re-run on an idle machine for trend-grade numbers"
        )
    out: dict[str, dict] = {}
    for key in keys:
        builder = registry.REGISTRY[key].builder
        spark.sparkContext.setJobDescription(f"sweep:{key}")
        load1 = round(os.getloadavg()[0], 2)
        try:
            t0 = time.time()
            builder(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            cold = time.time() - t0
            best = cold
            for _ in range(max(0, args.runs - 1)):
                t0 = time.time()
                builder(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            out[key] = {
                "cold": round(cold, 3),
                "best": round(best, 3),
                "load1_at_start": load1,
            }
            print(f"{best:8.3f}s (cold {cold:7.3f})  {key}", flush=True)
        except Exception as exc:  # noqa: BLE001
            out[key] = {"error": str(exc)[:200]}
            print(f"   ERROR  {key}: {str(exc)[:120]}", flush=True)
    spark.sparkContext.setJobDescription(None)
    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {
                    "sf": args.sf,
                    "runs": args.runs,
                    "loadavg_at_start": [round(x, 2) for x in load_start],
                    "loadavg_at_end": [round(x, 2) for x in os.getloadavg()],
                    "cpus": cpus,
                    "load_flagged": load_flagged,
                    "load_note": (
                        "load15 at start exceeded cpus/2 — timings "
                        "reflect a loaded machine; do not compare "
                        "across rounds without a re-measure"
                        if load_flagged
                        else "machine idle at sweep start (load15 ≤ "
                        "cpus/2); timings are trend-comparable"
                    ),
                    "keys": out,
                },
                indent=1,
            )
        )
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
