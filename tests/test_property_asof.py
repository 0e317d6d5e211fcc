"""Property-based check: the union+window as-of join must agree with
DuckDB's native ASOF JOIN on arbitrary generated data — not just the
driver testdata (SURVEY.md §5.4)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_quickstart_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key, ts_offset_seconds) pairs; duplicates and tie timestamps included
# on purpose — ties are where as-of implementations disagree.
rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=25
)


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-prop")


@given(left=rows, right=rows)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_asof_matches_duckdb(_spark, left, right):
    # Unique row ids; right payload = its own id so matches are checkable.
    lrows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)]
    rrows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(right)]
    ldf = _spark.createDataFrame(lrows or [], "lid int, k int, t timestamp")
    rdf = _spark.createDataFrame(rrows or [], "rid int, k int, t timestamp")
    if not lrows:
        return
    out = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t", right_payload=["rid", "t"])
    got = {r.lid: (r.r_rid, r.r_t) for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid int, k int, t timestamp)")
    con.execute("CREATE TABLE r(rid int, k int, t timestamp)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    if rrows:
        con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = {}
    for lid, rid, rt in con.execute(
        "SELECT lid, r.rid, r.t FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t"
    ).fetchall():
        want[lid] = (rid, rt)
    con.close()

    # DuckDB ASOF picks the max right ts <= left ts but an ARBITRARY row
    # among equal-ts candidates; compare on the matched TS (deterministic),
    # and on rid only when unique.
    assert set(got) == set(want)
    for lid in got:
        assert got[lid][1] == want[lid][1], (lid, got[lid], want[lid], lrows, rrows)


@given(left=rows, right=rows)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_asof_nearest_matches_python_reference(_spark, left, right):
    """asof_join_nearest must pick the minimum |gap| right row per key,
    ties (including exact-equal ts) resolving backward — checked against
    a brute-force Python reference on arbitrary generated data."""
    from flink_quickstart_spark.operators.joins import asof_join_nearest

    lrows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)]
    rrows = [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(right)]
    ldf = _spark.createDataFrame(lrows or [], "lid int, k int, t timestamp")
    rdf = _spark.createDataFrame(rrows or [], "rid int, k int, t timestamp")
    if not lrows:
        return
    out = asof_join_nearest(
        ldf, rdf, on="k", left_ts="t", right_ts="t", right_payload=["t"]
    )
    got = {r.lid: (r.r_t, r.direction) for r in out.collect()}

    by_key: dict[int, list] = {}
    for _rid, k, t in rrows:
        by_key.setdefault(k, []).append(t)
    for lid, k, t in lrows:
        cands = by_key.get(k, [])
        back = [c for c in cands if c <= t]
        fwd = [c for c in cands if c > t]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if b is None and f is None:
            expect = (None, None)
        elif b is not None and (f is None or (t - b) <= (f - t)):
            expect = (b, "backward")
        else:
            expect = (f, "forward")
        assert got[lid] == expect, (lid, got[lid], expect, lrows, rrows)
