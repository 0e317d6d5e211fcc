"""Property-based check for the binned range join (operators/range_join):
on arbitrary inputs, the bucket-replication rewrite must return EXACTLY
the pairs a naive all-pairs scan returns — the rewrite is only a plan
optimization, never a semantics change.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_quickstart_spark.operators.range_join import range_join

# Values across several buckets incl. negatives and exact bucket edges.
vals = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=1,
    max_size=12,
)
epsilons = st.sampled_from([0.5, 1.0, 2.5, 7.0])


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-prop-rj")


@given(a=vals, b=vals, eps=epsilons)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_binned_range_join_equals_all_pairs(_spark, a, b, eps):
    left = _spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(a)], "lid long, lv double"
    )
    right = _spark.createDataFrame(
        [(j, float(v)) for j, v in enumerate(b)], "rid long, rv double"
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(left, right, "lv", "rv", eps=eps).collect()
    }
    expected = {
        (i, j)
        for i, av in enumerate(a)
        for j, bv in enumerate(b)
        if abs(float(av) - float(bv)) <= eps
    }
    assert got == expected


def test_range_join_rejects_nonpositive_eps(_spark):
    df = _spark.createDataFrame([(1, 1.0)], "lid long, lv double")
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="eps must be > 0"):
            range_join(df, df.withColumnRenamed("lv", "rv"), "lv", "rv", eps=bad)
