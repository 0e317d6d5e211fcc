"""Driver-sample STALENESS report (r8, VERDICT r7 #6).

Cumulative driver coverage hit 246/246 in round 7, but coverage is not
recency: a key whose only green driver sample predates a later rewrite
of the code it runs is evidence-stale — the driver has never re-checked
the rewritten path. This tool cross-references, for every registered
key:

- the LAST round the driver sampled it (union of all
  ``CORRECTNESS_r*.json`` files, failing samples ignored for recency —
  a failing sample is a bug, not evidence), against
- the repo files that key's builder depends on (its plan module plus
  every ``operators.*`` module that module references), filtered to
  those actually CHANGED since that round's boundary commit
  (``round N: verdict/...``).

A key is reported when its last sample is ``--min-age`` (default 3)
rounds behind the newest round on file AND at least one of its files
changed after its sample round. Exit 0 always — this is a standing
report, not a gate; the round workflow runs it at close and feeds the
stale keys into the registry's driver-order tier (never-sampled keys
already sort first; stale keys are the next backlog to drain).

Run: ``python tools/staleness_report.py [--min-age 3] [--json PATH]``
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def round_boundaries() -> dict[int, str]:
    """round number -> the commit CLOSING that round (the driver's
    'round N: verdict/advice/correctness/bench' record)."""
    out = _git("log", "--format=%H %s")
    bounds: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            bounds.setdefault(int(m.group(1)), sha)
    return bounds


def last_sampled() -> dict[str, int]:
    """key -> last round with a PASSING driver sample."""
    last: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.loads(path.read_text())
        for key, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = all(
                rec.get(f) in (True, None)
                for f in ("rows_match", "schema_match", "hash_match")
            ) and rec.get("err") in (None, "")
            if ok:
                last[key] = max(last.get(key, 0), rnd)
    return last


def key_files() -> dict[str, set[str]]:
    """key -> repo-relative source files its builder depends on: the
    plan module, plus every operators/streaming module the plan module
    textually references (conservative: module-level attribution)."""
    import inspect

    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    dep_re = re.compile(
        r"flink_quickstart_spark\.(operators|streaming|sources)\.(\w+)"
        r"|from flink_quickstart_spark\.(operators|streaming|sources) import (\w+)"
    )
    module_deps: dict[str, set[str]] = {}
    out: dict[str, set[str]] = {}
    for name, spec in registry.REGISTRY.items():
        mod_file = Path(inspect.getsourcefile(spec.builder))
        rel = str(mod_file.relative_to(REPO))
        if rel not in module_deps:
            deps = {rel}
            text = mod_file.read_text()
            for m in dep_re.finditer(text):
                pkg = m.group(1) or m.group(3)
                sub = m.group(2) or m.group(4)
                cand = REPO / "flink_quickstart_spark" / pkg / f"{sub}.py"
                if cand.exists():
                    deps.add(str(cand.relative_to(REPO)))
            module_deps[rel] = deps
        out[name] = module_deps[rel]
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-age", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--verify-json",
        default=None,
        help="a builder VERIFY_r{N}.json from this round: every stale "
        "key is annotated reverified_this_round (status == 'pass' in "
        "that run) — the r9 round-close discipline (VERDICT r8 #4): the "
        "builder cannot choose the driver's sample, but it CAN re-run "
        "its own stricter exact-value gate over the stale backlog and "
        "record that the rewritten paths were re-checked this round",
    )
    args = ap.parse_args()
    verified: dict[str, bool] = {}
    if args.verify_json:
        vdata = json.loads(Path(args.verify_json).read_text())
        verified = {
            k: rec.get("status") == "pass"
            for k, rec in vdata.get("keys", {}).items()
        }

    bounds = round_boundaries()
    sampled = last_sampled()
    files = key_files()
    newest = max(sampled.values(), default=0)

    changed_since: dict[int, set[str]] = {}
    for rnd, sha in bounds.items():
        changed_since[rnd] = set(
            _git("diff", "--name-only", f"{sha}..HEAD").splitlines()
        )

    stale: dict[str, dict] = {}
    never: list[str] = []
    for key, deps in sorted(files.items()):
        last = sampled.get(key)
        if last is None:
            never.append(key)
            continue
        if newest - last < args.min_age:
            continue
        if last not in changed_since:
            continue  # no boundary commit on file for that round
        touched = sorted(deps & changed_since[last])
        if touched:
            stale[key] = {"last_round": last, "changed_files": touched}
            if verified:
                stale[key]["reverified_this_round"] = verified.get(key, False)

    n_reverified = sum(
        1 for rec in stale.values() if rec.get("reverified_this_round")
    )
    print(
        f"== staleness: {len(stale)} stale keys "
        f"(sampled ≥{args.min_age} rounds ago with deps changed since), "
        f"{len(never)} never sampled, newest round on file r{newest}"
        + (
            f"; {n_reverified}/{len(stale)} re-verified builder-side this round"
            if verified
            else ""
        )
        + " =="
    )
    for key, rec in stale.items():
        print(f"  {key}: last r{rec['last_round']}, changed: "
              f"{', '.join(rec['changed_files'])}")
    if never:
        print(f"  never sampled (will sort first in driver order): {never}")
    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {
                    "min_age": args.min_age,
                    "newest_round": newest,
                    "stale": stale,
                    "never_sampled": never,
                },
                indent=1,
                sort_keys=True,
            )
        )
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
