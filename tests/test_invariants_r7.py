"""Round-7 invariants.

- The coGroup pair: the applyInPandas API-parity form
  (``q_cogroup_stats``) and its JVM-side two-agg + full-outer twin
  (``q_cogroup_stats_agg``) must agree row-for-row — the twin IS the
  documented scale path for SURVEY §2.C11, so the equivalence is the
  load-bearing claim.
- The twin's physical plan must be Python-free (no ArrowEvalPython /
  FlatMapCoGroupsInPandas stage) — otherwise it isn't the JVM path it
  claims to be.
"""

from __future__ import annotations

from flink_quickstart_spark.plans import load_all
from flink_quickstart_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR

load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cogroup_twins_agree(spark):
    pandas_form = REGISTRY["q_cogroup_stats"].builder(spark, SF_DIR)
    jvm_form = REGISTRY["q_cogroup_stats_agg"].builder(spark, SF_DIR)
    assert sorted(pandas_form.columns) == sorted(jvm_form.columns)
    assert _rows(pandas_form.select(*sorted(pandas_form.columns))) == _rows(
        jvm_form.select(*sorted(jvm_form.columns))
    )


def test_cogroup_jvm_twin_is_python_free(spark):
    plan = (
        REGISTRY["q_cogroup_stats_agg"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InPandas" not in plan and "EvalPython" not in plan, plan
    # and the API form genuinely exercises the cogroup surface
    pandas_plan = (
        REGISTRY["q_cogroup_stats"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInPandas" in pandas_plan
