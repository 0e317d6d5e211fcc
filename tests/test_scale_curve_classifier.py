"""Regression lock for the scaling probe's crash classification
(VERDICT r5 item #3): only the repo's explicit broadcast-budget guard
counts as a designed refusal at the big scale factor — every other
exception is a crash that must fail the probe. Round 5's broadcast OOM
was mislabeled "guarded" by a charitable catch-all; this test makes
that class of misclassification impossible to reintroduce silently.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_scale_curve():
    spec = importlib.util.spec_from_file_location(
        "scale_curve", REPO / "tools" / "scale_curve.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_curve"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_only_budget_guard_counts_as_designed_refusal():
    sc = _load_scale_curve()
    classify = sc.classify_big_sf_exception

    # the ONE designed refusal: operators/similarity's fail-fast guard
    guard = ValueError(
        "brute_knn: corpus projection estimated at ~3000 MiB in memory "
        "exceeds the broadcast budget of 2048 MiB."
    )
    assert classify(guard) == "guarded"

    # everything else is a crash — including the r5 broadcast OOM shape
    class Py4JJavaError(Exception):
        pass

    oom = Py4JJavaError(
        "An error occurred while calling o123.collectToPython.\n"
        ": org.apache.spark.SparkException: Not enough memory to build "
        "and broadcast the table to all worker nodes."
    )
    assert classify(oom) == "error_big"
    assert classify(ValueError("events table is empty")) == "error_big"
    assert classify(RuntimeError("broadcast budget")) == "error_big"
    assert classify(KeyError("q_missing")) == "error_big"


def test_message_alone_cannot_fake_the_guard():
    """The guard check is type AND message: a Java-side error whose text
    happens to contain the phrase must still be a crash."""
    sc = _load_scale_curve()

    class Py4JJavaError(Exception):
        pass

    assert (
        sc.classify_big_sf_exception(
            Py4JJavaError("...exceeds the broadcast budget of...")
        )
        == "error_big"
    )


def test_probe_config_is_coherent():
    """r7: every documented-superlinear waiver must actually be probed
    (a waiver on an unprobed key is dead evidence), and component-probe
    names must not shadow registry keys (the main loop resolves
    COMPONENT_PROBES first)."""
    sc = _load_scale_curve()
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    probed = set(sc.DEFAULT_KEYS)
    for key in sc.DOCUMENTED_SUPERLINEAR:
        assert key in probed, f"waiver for unprobed key: {key}"
    for name in sc.COMPONENT_PROBES:
        assert name not in registry.REGISTRY, f"component probe shadows registry key: {name}"
        assert name in probed, f"component probe not in DEFAULT_KEYS: {name}"
    # registry keys in the probe set must exist
    for key in probed - set(sc.COMPONENT_PROBES):
        assert key in registry.REGISTRY, f"probe references unknown key: {key}"
