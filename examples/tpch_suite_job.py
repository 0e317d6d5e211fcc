"""Run the full 22-query TPC-H-shape suite end-to-end and print timings.

Every canonical TPC-H query has a registered analog in this engine
(adapted to the partsupp-less testdata schema — see
plans/sql_surface.py / plans/aggregations.py docstrings). This job runs
all of them against one SparkSession, prints per-query wall time and row
count, and exits non-zero if any query fails — a migration smoke a
Flink/warehouse user can run on day one.

Run: ``python examples/tpch_suite_job.py [sf_dir]``
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.plans import load_all, registry

# Canonical TPC-H number → registered key.
TPCH = {
    1: "q_agg_group",
    2: "q_sql_q2",
    3: "q_sql_q3",
    4: "q_sql_exists",
    5: "q_sql_q5",
    6: "q_sql_q6",
    7: "q_sql_q7",
    8: "q_sql_q8",
    9: "q_sql_q9",
    10: "q_sql_q10",
    11: "q_sql_q11",
    12: "q_sql_q12",
    13: "q_sql_q13",
    14: "q_sql_q14",
    15: "q_sql_q15",
    16: "q_sql_q16",
    17: "q_sql_q17",
    18: "q_sql_q18",
    19: "q_sql_q19",
    20: "q_sql_q20",
    21: "q_sql_q21",
    22: "q_sql_q22",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all()
    spark = get_spark(app_name="tpch-suite")
    failures, total = 0, 0.0
    for n, key in sorted(TPCH.items()):
        t0 = time.time()
        try:
            rows = registry.REGISTRY[key].builder(spark, sf_dir).collect()
            dt = time.time() - t0
            total += dt
            print(f"Q{n:>2} ({key:<22}) {len(rows):>7} rows  {dt:6.2f}s")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"Q{n:>2} ({key:<22}) FAILED: {type(e).__name__}: {e}")
    print(f"total: {total:.2f}s, {len(TPCH) - failures}/{len(TPCH)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
