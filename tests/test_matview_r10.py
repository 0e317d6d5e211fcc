"""Incremental materialized-view maintenance (operators/matview.py).

The contracts mirror the persisted-index lifecycle invariants:

1. refresh == rebuild — after mv_refresh(batch), the finalized view is
   row-identical to mv_build on corpus ∪ batch.
2. Refresh touches ONLY the batch's hash buckets — untouched bucket
   partitions keep their data files byte-for-byte (names/sizes/mtimes).
3. Empty batch is a no-op (no file changes at all).
4. retract == rebuild-on-complement, on BOTH strategies:
   pure-delta (all-subtractable spec, no source access) and
   recompute-affected-groups (spec with min/max, post-delete source).
5. A fully-retracted group vanishes; a fully-emptied bucket's partition
   directory is dropped (dynamic overwrite alone would leave stale
   files).
6. Over-retraction (rows never inserted) fails loudly, store unchanged.
7. Writer lease: concurrent maintenance fails loudly.
8. Distinct-count spec is rejected with the HLL pointer.
9. compact_mv folds delta files to one per bucket, row multiset intact.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.matview import (
    compact_mv,
    mv_build,
    mv_read,
    mv_refresh,
    mv_retract,
)
from flink_quickstart_spark.operators.maintenance import (
    StoreWriterConflict,
    store_data_dir as _sdd,
    store_writer_lease,
)

SPEC = [
    ("count", "*", "n_rows"),
    ("sum", "v", "sum_v"),
    ("min", "v", "min_v"),
    ("max", "v", "max_v"),
    ("avg", "v", "avg_v"),
]
SPEC_SUB = [("count", "*", "n_rows"), ("sum", "v", "sum_v"), ("avg", "v", "avg_v")]


def _rows(spark, lo, hi):
    """Deterministic synthetic source: key k = id % 40, value v."""
    return spark.range(lo, hi).select(
        (F.col("id") % 40).cast("bigint").alias("k"),
        (F.col("id") * 7 % 1000).cast("double").alias("v"),
    )


def _finalized(spark, path):
    return {
        (r.k, r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v, round(r.avg_v, 9))
        for r in mv_read(spark, path).collect()
    }


def _finalized_sub(spark, path):
    return {
        (r.k, r.n_rows, round(r.sum_v, 6), round(r.avg_v, 9))
        for r in mv_read(spark, path).collect()
    }


def _file_stats(base):
    out = {}
    for root, _d, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, base)] = (st.st_size, st.st_mtime_ns)
    return out


def test_refresh_equals_rebuild_and_prunes(spark, tmp_path):
    path, ref = str(tmp_path / "mv"), str(tmp_path / "mv_ref")
    corpus, batch = _rows(spark, 0, 4000), _rows(spark, 4000, 4400)
    mv_build(corpus, path, ["k"], SPEC, n_buckets=16)
    before = _file_stats(_sdd(path, "groups"))

    stats = mv_refresh(spark, path, batch)
    assert 0 < stats["buckets_touched"] <= 16
    assert stats["groups_in_batch"] == 40

    mv_build(corpus.unionByName(batch), ref, ["k"], SPEC, n_buckets=16)
    assert _finalized(spark, path) == _finalized(spark, ref)

    # bucket prune: with 40 groups over 16 buckets all buckets are hit,
    # so re-run with a 2-group batch — only its buckets' files change.
    path2 = str(tmp_path / "mv2")
    mv_build(corpus, path2, ["k"], SPEC, n_buckets=16)
    before2 = _file_stats(_sdd(path2, "groups"))
    small = batch.where(F.col("k").isin(3, 17))
    mv_refresh(spark, path2, small)
    after2 = _file_stats(_sdd(path2, "groups"))
    touched_dirs = {
        os.path.dirname(p)
        for p in (set(before2) ^ set(after2))
        | {p for p in before2 if p in after2 and before2[p] != after2[p]}
    }
    assert 0 < len(touched_dirs) <= 2
    untouched = {p for p in before2 if os.path.dirname(p) not in touched_dirs}
    for p in untouched:
        assert before2[p] == after2[p], f"untouched bucket file changed: {p}"
    assert before  # corpus build wrote files


def test_empty_batch_noop(spark, tmp_path):
    path = str(tmp_path / "mv")
    mv_build(_rows(spark, 0, 1000), path, ["k"], SPEC, n_buckets=8)
    before = _file_stats(_sdd(path, "groups"))
    stats = mv_refresh(spark, path, _rows(spark, 0, 10).where(F.lit(False)))
    assert stats == {"buckets_touched": 0, "groups_in_batch": 0}
    assert _file_stats(_sdd(path, "groups")) == before


def test_retract_delta_equals_rebuild(spark, tmp_path):
    """All-subtractable spec: retraction is a pure delta, no source."""
    path, ref = str(tmp_path / "mv"), str(tmp_path / "mv_ref")
    full = _rows(spark, 0, 4000)
    gone = full.where(F.col("id").isNotNull())  # placeholder lineage
    batch = _rows(spark, 3000, 4000)
    mv_build(full, path, ["k"], SPEC_SUB, n_buckets=16)
    stats = mv_retract(spark, path, batch)  # no source_df needed
    assert stats["buckets_touched"] > 0
    mv_build(_rows(spark, 0, 3000), ref, ["k"], SPEC_SUB, n_buckets=16)
    assert _finalized_sub(spark, path) == _finalized_sub(spark, ref)
    assert gone is not None


def test_retract_minmax_requires_and_uses_source(spark, tmp_path):
    path, ref = str(tmp_path / "mv"), str(tmp_path / "mv_ref")
    full = _rows(spark, 0, 4000)
    batch = _rows(spark, 3000, 4000)
    remaining = _rows(spark, 0, 3000)
    mv_build(full, path, ["k"], SPEC, n_buckets=16)
    with pytest.raises(ValueError, match="min/max"):
        mv_retract(spark, path, batch)  # source required
    stats = mv_retract(spark, path, batch, source_df=remaining)
    assert stats["buckets_touched"] > 0
    mv_build(remaining, ref, ["k"], SPEC, n_buckets=16)
    assert _finalized(spark, path) == _finalized(spark, ref)


def test_group_vanish_and_bucket_drop(spark, tmp_path):
    """Retract every row of some groups: the groups vanish; a bucket
    left with zero groups loses its partition directory entirely."""
    path = str(tmp_path / "mv")
    full = _rows(spark, 0, 2000)
    mv_build(full, path, ["k"], SPEC_SUB, n_buckets=64)
    n_dirs_before = len(
        [d for d in os.listdir(_sdd(path, "groups")) if d.startswith("_gmod=")]
    )
    # retract ALL rows of groups k in {0, 1}
    batch = full.where(F.col("k").isin(0, 1))
    stats = mv_retract(spark, path, batch)
    assert stats["groups_retracted"] == 2
    keys = {r.k for r in mv_read(spark, path).collect()}
    assert 0 not in keys and 1 not in keys and len(keys) == 38
    # with 64 buckets over 40 groups, collisions are rare — at least
    # one of the two vanished groups' buckets should now be gone
    n_dirs_after = len(  # re-resolve: the retract published a new gen
        [d for d in os.listdir(_sdd(path, "groups")) if d.startswith("_gmod=")]
    )
    assert n_dirs_after < n_dirs_before


def test_group_vanish_minmax_path(spark, tmp_path):
    path = str(tmp_path / "mv")
    full = _rows(spark, 0, 2000)
    mv_build(full, path, ["k"], SPEC, n_buckets=64)
    batch = full.where(F.col("k") == 5)
    remaining = full.where(F.col("k") != 5)
    stats = mv_retract(spark, path, batch, source_df=remaining)
    assert stats["groups_retracted"] == 1
    assert 5 not in {r.k for r in mv_read(spark, path).collect()}


def test_over_retraction_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "mv")
    mv_build(_rows(spark, 0, 1000), path, ["k"], SPEC_SUB, n_buckets=8)
    before = _finalized_sub(spark, path)
    # retracting the same slice twice the second time goes negative
    batch = _rows(spark, 0, 1000).where(F.col("k") == 7)
    mv_retract(spark, path, batch)
    with pytest.raises(ValueError, match="never .*inserted|negative"):
        mv_retract(spark, path, batch)
    # store survived the failed retract (first retract applied once)
    after = _finalized_sub(spark, path)
    assert {t for t in before if t[0] != 7} == after


def test_minmax_over_retraction_never_inserted(spark, tmp_path):
    """Non-subtractable (min/max) retract path: a batch group that was
    never inserted must raise, not be silently INSERTED via the
    recompute-and-union (r10 ADVICE)."""
    path = str(tmp_path / "mv")
    full = _rows(spark, 0, 1000)  # groups k = 0..39
    mv_build(full, path, ["k"], SPEC, n_buckets=16)
    phantom = spark.range(0, 10).select(
        F.lit(999).cast("bigint").alias("k"),
        (F.col("id") * 3 % 100).cast("double").alias("v"),
    )
    before = _finalized(spark, path)
    with pytest.raises(ValueError, match="never inserted"):
        mv_retract(spark, path, phantom, source_df=full.unionByName(phantom))
    assert _finalized(spark, path) == before  # store unchanged
    assert 999 not in {t[0] for t in _finalized(spark, path)}


def test_writer_lease_blocks_concurrent_maintenance(spark, tmp_path):
    path = str(tmp_path / "mv")
    mv_build(_rows(spark, 0, 500), path, ["k"], SPEC_SUB, n_buckets=8)
    with store_writer_lease(path, "other_op"):
        with pytest.raises(StoreWriterConflict):
            mv_refresh(spark, path, _rows(spark, 500, 600))
    # lease released → refresh proceeds
    mv_refresh(spark, path, _rows(spark, 500, 600))


def test_distinct_count_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="hll_rollup"):
        mv_build(
            _rows(spark, 0, 10),
            str(tmp_path / "mv"),
            ["k"],
            [("countdistinct", "v", "nd_v")],
        )


def test_compact_mv(spark, tmp_path):
    path = str(tmp_path / "mv")
    corpus = _rows(spark, 0, 2000)
    mv_build(corpus, path, ["k"], SPEC_SUB, n_buckets=4)
    for lo in (2000, 2400, 2800):
        mv_refresh(spark, path, _rows(spark, lo, lo + 400))
    before = _finalized_sub(spark, path)
    rep = compact_mv(spark, path)
    assert rep["files_after"] <= rep["files_before"]
    per_dir: dict[str, int] = {}
    for root, _d, files in os.walk(_sdd(path, "groups")):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            per_dir[root] = n
    assert per_dir and all(n == 1 for n in per_dir.values())
    assert _finalized_sub(spark, path) == before


def test_meta_roundtrip(spark, tmp_path):
    path = str(tmp_path / "mv")
    mv_build(_rows(spark, 0, 100), path, ["k"], SPEC, n_buckets=8)
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["group_cols"] == ["k"]
    assert meta["n_buckets"] == 8
    assert [tuple(a) for a in meta["aggs"]] == [tuple(s) for s in SPEC]
