"""Full-registry completion sweep at the staged 10× scale factor.

The scaling-curve probe (tools/scale_curve.py) measures ratios for the
heavy tier; this sweep answers a broader, binary question for EVERY
registered key: does it COMPLETE at sf1 — no broadcast OOM, no analysis
error, no budget surprise — and how long does it take once, warm-free.
A key that only ever ran at gate scale can hide a scale-killer (the r5
minhash broadcast was exactly that); a 241/241 completion record
removes that blind spot for the whole surface.

Classification mirrors the probe: the similarity module's fail-fast
broadcast-budget ValueError is a DESIGNED refusal ("guarded"); any
other exception is a failure and flips the exit code.

Run: ``python tools/sweep_sf1.py [--json PATH] [--sf DIR]``
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

from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.plans import load_all, registry
from flink_quickstart_spark.session import dir_bytes, shuffle_partitions_for_bytes

SF_DEFAULT = str(REPO / ".scale" / "sf1")


def classify_exception(e: Exception) -> str:
    if isinstance(e, ValueError) and "broadcast budget" in str(e):
        return "guarded"
    return "error"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=SF_DEFAULT)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--keys", default=None,
        help="comma-separated subset to re-sweep; with --json, existing "
        "entries for other keys are preserved (spot re-measure)",
    )
    args = ap.parse_args()

    load_all()
    sized_bytes = dir_bytes(args.sf)
    parts = shuffle_partitions_for_bytes(sized_bytes)
    print(f"shuffle_partitions={parts} (sized for {args.sf} = {sized_bytes/1e6:.0f} MB)")
    spark = get_spark(app_name="sweep-sf1", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    if args.keys and args.json and Path(args.json).exists():
        results = json.loads(Path(args.json).read_text()).get("keys", {})
        # a spot re-run merges into the existing file — drop entries for
        # keys no longer registered so stale rows can't inflate totals
        # (ADVICE r6)
        results = {k: v for k, v in results.items() if k in registry.REGISTRY}
    keys = args.keys.split(",") if args.keys else list(registry.REGISTRY)
    unknown = [k for k in keys if k not in registry.REGISTRY]
    if unknown:
        ap.error(f"unknown --keys (not in registry): {','.join(unknown)}")
    # Machine-load self-description (VERDICT r11 #5): r11's cold-pass
    # controls read 1.5-2× over r10 purely from same-session machine
    # load, which made round-over-round sweep deltas untrustworthy
    # without a re-measure pass. Every key now records the 1-min load
    # average at its start, the file records start/end load triples,
    # and the sweep FLAGS itself not-comparable when load-15 at start
    # exceeds half the cores (an idle box reads < 1; a co-running
    # pytest session reads 15-30 on this 32-thread machine).
    cpus = os.cpu_count() or 32
    load_start = os.getloadavg()
    load_flagged = load_start[2] > cpus / 2
    if load_flagged:
        print(
            f"WARNING: load15={load_start[2]:.1f} > {cpus}/2 at sweep "
            "start — timings will not be comparable across rounds; "
            "re-run on an idle machine for trend-grade numbers"
        )
    n_ok = n_guarded = n_err = 0
    for key in keys:
        spec = registry.REGISTRY[key]
        load1 = round(os.getloadavg()[0], 2)
        t0 = time.time()
        try:
            # Consume engine-side: count + an xxhash64 fold over every
            # column (cast to string so complex/binary types hash
            # uniformly). A full collect() made 6 M-row map keys
            # measure DRIVER materialization (q_cast_types read 25 s at
            # sf1), not plan cost — the sweep grades the engine, so the
            # consumer must stay in the JVM (VERDICT r6 #4).
            df = spec.builder(spark, args.sf)
            row = df.agg(
                F.count(F.lit(1)).alias("_n"),
                # pmod before the sum keeps the fold inside long range
                # under ANSI arithmetic (raw xxhash64 sums overflow)
                F.sum(
                    F.pmod(
                        F.xxhash64(
                            *[F.col(c).cast("string") for c in df.columns]
                        ),
                        F.lit(1_000_000_007),
                    )
                ).alias("_h"),
            ).collect()[0]
            rows = row["_n"]
        except Exception as e:  # noqa: BLE001
            status = classify_exception(e)
            if status == "guarded":
                n_guarded += 1
                print(f"GUARDED {key}: {str(e)[:120]}")
            else:
                n_err += 1
                print(f"FAIL {key}: {type(e).__name__}: {str(e)[:160]}")
            results[key] = {"status": status, "err": str(e)[:200]}
            continue
        secs = round(time.time() - t0, 2)
        n_ok += 1
        results[key] = {
            "status": "ok",
            "rows": rows,
            "secs": secs,
            "load1_at_start": load1,
        }
        print(f"ok {key}: {rows} rows ({secs}s)")

    # counts over the MERGED result set, so a --keys spot re-run reports
    # (and records) totals for the whole file, not just the subset
    n_ok = sum(v["status"] == "ok" for v in results.values())
    n_guarded = sum(v["status"] == "guarded" for v in results.values())
    n_err = sum(v["status"] == "error" for v in results.values())
    print(
        f"\n== sf1 sweep: {n_ok} ok, {n_guarded} guarded, {n_err} failed "
        f"(of {len(results)} keys, sf={args.sf}) =="
    )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf": args.sf,
                    "n_ok": n_ok,
                    "n_guarded": n_guarded,
                    "n_err": n_err,
                    # self-describing harness config (VERDICT r10: a
                    # number that moves with sizing must CARRY its
                    # sizing, or round-over-round deltas on the
                    # expensive keys are uninterpretable)
                    "shuffle_partitions": parts,
                    "sized_for_bytes": sized_bytes,
                    # machine-load self-description (VERDICT r11 #5):
                    # per-key load1_at_start plus these file-level
                    # triples make cross-round timing comparisons
                    # self-qualifying — load_flagged=true means the
                    # sweep itself disclaims trend-grade comparability
                    "loadavg_at_start": [round(x, 2) for x in load_start],
                    "loadavg_at_end": [
                        round(x, 2) for x in os.getloadavg()
                    ],
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
                    "method": "single cold run per key, consumed "
                    "engine-side via agg(count, sum(xxhash64(*cols "
                    "cast string))) — no driver materialization; "
                    "shuffle partitions recorded above, sized for the "
                    "sweep dir by shuffle_partitions_for_bytes (the "
                    "same formula the scale curve uses)",
                    "keys": results,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {args.json}")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
