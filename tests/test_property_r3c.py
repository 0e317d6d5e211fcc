"""Independent-reference checks for the continuation-session statistical
operators: recompute each result with a SECOND implementation (pandas/
NumPy over the same raw parquet) and require agreement — a different
failure surface than the DuckDB oracle (which shares the SQL
formulation) and than the invariant tests (which only bound the range).
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq

from flink_quickstart_spark.plans import load_all, registry
from tests.conftest import SF_DIR

load_all()


def _run(spark, key):
    return registry.REGISTRY[key].builder(spark, SF_DIR)


def _events_pdf() -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()


def test_welch_matches_pandas_reference(spark):
    got = {r.event_type: r for r in _run(spark, "q_ab_welch_ttest").collect()}
    pdf = _events_pdf()
    pdf["variant"] = (pdf.user_id % 2).map({0: "A", 1: "B"})
    for et, g in pdf.groupby("event_type"):
        a = g[g.variant == "A"].value
        b = g[g.variant == "B"].value
        if len(a) < 2 or len(b) < 2:
            assert et not in got
            continue
        # same explicit-moment formulation as the operator
        va = (len(a) / (len(a) - 1)) * ((a * a).mean() - a.mean() ** 2)
        vb = (len(b) / (len(b) - 1)) * ((b * b).mean() - b.mean() ** 2)
        se2 = va / len(a) + vb / len(b)
        if se2 <= 0:
            assert et not in got
            continue
        t_ref = (a.mean() - b.mean()) / math.sqrt(se2)
        df_ref = se2 * se2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        r = got[et]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.t_stat - t_ref) < 1e-4
        assert abs(r.welch_df - df_ref) < 1e-2


def test_cusum_matches_numpy_reference(spark):
    import numpy as np

    got = {r.user_id: r for r in _run(spark, "q_ts_cusum").collect()}
    pdf = _events_pdf().sort_values(["ts", "event_id"])
    checked = 0
    for uid, g in pdf.groupby("user_id"):
        if checked >= 25:
            break
        x = g.value.to_numpy()
        if len(x) < 20:
            assert uid not in got
            continue
        mu = x.mean()
        sigma = math.sqrt((x * x).mean() - mu * mu)
        if sigma <= 0:
            assert uid not in got
            continue
        s = np.round(np.abs(np.cumsum((x - mu) / sigma)), 6)
        r = got[uid]
        assert abs(r.max_cusum - s.max()) < 1e-5
        # argmax position: earliest event achieving the (rounded) max
        idx = int(np.flatnonzero(s == s.max())[0])
        assert r.at_event_id == int(g.event_id.iloc[idx])
        checked += 1
    assert checked > 0


def test_pareto_matches_pandas_reference(spark):
    r = _run(spark, "q_agg_pareto").collect()[0]
    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    per = (
        (orders.groupby("o_custkey").o_totalprice.sum() * 100)
        .round()
        .astype("int64")
        .reset_index(name="cents")
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
    )
    total = int(per.cents.sum())
    running = per.cents.cumsum()
    needed = int(((running - per.cents) * 5 < total * 4).sum())
    assert r.n_customers == len(per)
    assert r.total_rev_cents == total
    assert r.n_top80 == needed


def test_streaks_match_pandas_reference(spark):
    got = {r.user_id: r for r in _run(spark, "q_wf_streaks").collect()}
    pdf = _events_pdf()
    pdf["d"] = pdf.ts.dt.floor("D")
    checked = 0
    for uid, g in pdf.groupby("user_id"):
        if checked >= 25:
            break
        days = sorted(set(g.d))
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            best = max(best, cur)
        r = got[uid]
        assert r.n_active_days == len(days)
        assert r.longest_streak == best
        checked += 1
    assert checked > 0
