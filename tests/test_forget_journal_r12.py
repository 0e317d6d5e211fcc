"""Journaled (resumable) forget cascade (r12).

forget_rows is atomic per store (generation commits) but the cascade
was not durable: a crash between stores left no record of which were
already forgotten. The journal persists the forget payload + per-store
intent BEFORE any mutation and marks completion per store, so resume
completes exactly the outstanding work. Contracts:

1. begin → resume runs the full cascade: every store done, residue 0,
   final state identical to an unjournaled forget_rows.
2. Crash between stores (simulated with max_stores_per_run=1): the
   journal shows one done / one pending; a later resume completes only
   the pending store; a further resume is a no-op on the complete
   request.
3. Crash AFTER a store's publish but BEFORE its journal marker: the
   store's generation is ahead of the recorded pre_generation, so
   resume marks it done WITHOUT replaying — pinned on the MV store,
   where a replayed retraction must not run (over-retraction).
4. A store whose delete fails records status='error', the error
   re-raises, and a later resume retries exactly that store.
5. The persisted batch is the delete's input: ids round-trip exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.dedup import minhash_build_store
from flink_quickstart_spark.operators.maintenance import (
    forget_request_begin,
    generation_id,
    read_forget_journal,
    read_store,
    resume_forget,
)
from flink_quickstart_spark.operators.matview import mv_build, mv_read
from tests.conftest import SF_DIR


def _docs(spark, n=80):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "text")
        .where(F.col("doc_id") < n)
    )


def _stat(df):
    return df.select("doc_id", "lang", F.length("text").alias("n"))


def _setup(spark, tmp_path):
    docs = _docs(spark)
    store = str(tmp_path / "minhash")
    mv = str(tmp_path / "mv")
    minhash_build_store(docs, store)
    mv_build(
        _stat(docs), mv, ["lang"],
        [("count", "*", "n_docs"), ("sum", "n", "chars")], n_buckets=4,
    )
    gone = docs.where(F.col("doc_id") % 7 == 3)
    jobs = [
        {"kind": "minhash", "path": store, "df": gone},
        {"kind": "mv", "path": mv, "df": _stat(gone)},
    ]
    return docs, store, mv, gone, jobs


def _mv_state(spark, mv):
    return {
        (r.lang, r.n_docs, r.chars)
        for r in mv_read(spark, mv).select("lang", "n_docs", "chars").collect()
    }


def test_begin_resume_completes_cascade(spark, tmp_path):
    docs, store, mv, gone, jobs = _setup(spark, tmp_path)
    jdir = str(tmp_path / "journal")
    rid = forget_request_begin(spark, jdir, jobs)
    status = resume_forget(spark, jdir, rid)
    assert status["complete"]
    assert [e["status"] for e in status["stores"]] == ["done", "done"]
    assert status["stores"][0]["residue"] == 0
    keep = docs.join(gone.select("doc_id"), "doc_id", "left_anti")
    got_ids = {
        r.doc_id
        for r in read_store(spark, store, "bands").select("doc_id").distinct().collect()
    }
    assert got_ids == {r.doc_id for r in keep.select("doc_id").collect()}
    expect = {
        tuple(r)
        for r in _stat(keep)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("chars"))
        .collect()
    }
    assert _mv_state(spark, mv) == expect
    # idempotent on a complete request
    again = resume_forget(spark, jdir, rid)
    assert again["complete"]


def test_chunked_run_resumes_pending_store(spark, tmp_path):
    _docs_, store, mv, _gone, jobs = _setup(spark, tmp_path)
    jdir = str(tmp_path / "journal")
    rid = forget_request_begin(spark, jdir, jobs)
    st1 = resume_forget(spark, jdir, rid, max_stores_per_run=1)
    assert [e["status"] for e in st1["stores"]] == ["done", "pending"]
    assert not st1["complete"]
    mv_before = _mv_state(spark, mv)
    st2 = resume_forget(spark, jdir, rid)
    assert st2["complete"]
    assert _mv_state(spark, mv) != mv_before  # the pending store ran


def test_publish_without_marker_not_replayed(spark, tmp_path):
    _docs_, _store, mv, _gone, jobs = _setup(spark, tmp_path)
    jdir = str(tmp_path / "journal")
    # journal only the MV job
    rid = forget_request_begin(spark, jdir, [jobs[1]])
    # simulate: the retraction published, then the process died before
    # the journal marker — run the mutation OUT OF BAND
    from flink_quickstart_spark.operators.matview import mv_retract

    pre = generation_id(mv)
    mv_retract(spark, mv, jobs[1]["df"])
    assert generation_id(mv) == pre + 1
    after_publish = _mv_state(spark, mv)

    status = resume_forget(spark, jdir, rid)
    assert status["complete"]
    assert status["stores"][0]["note"] == "publish detected by generation advance"
    # NOT replayed: state unchanged by resume
    assert _mv_state(spark, mv) == after_publish


def test_errored_store_retries_on_next_resume(spark, tmp_path):
    _docs_, store, _mv, gone, jobs = _setup(spark, tmp_path)
    jdir = str(tmp_path / "journal")
    rid = forget_request_begin(spark, jdir, [jobs[0]])
    # wedge the store: break the pointer so the delete fails
    ptr = os.path.join(store, "_current")
    assert not os.path.exists(ptr)  # fresh build — no pointer yet
    with open(ptr, "w") as fh:
        fh.write("not json")
    with pytest.raises(RuntimeError, match="errored stores"):
        resume_forget(spark, jdir, rid)
    st = read_forget_journal(jdir, rid)
    assert st["stores"][0]["status"] == "error"
    os.remove(ptr)  # unwedge
    st2 = resume_forget(spark, jdir, rid)
    assert st2["complete"] and st2["stores"][0]["status"] == "done"


def test_duplicate_request_id_refused_and_batch_roundtrip(spark, tmp_path):
    _docs_, _store, _mv, gone, jobs = _setup(spark, tmp_path)
    jdir = str(tmp_path / "journal")
    rid = forget_request_begin(spark, jdir, [jobs[0]], request_id="req1")
    with pytest.raises(ValueError, match="already exists"):
        forget_request_begin(spark, jdir, [jobs[0]], request_id="req1")
    persisted = spark.read.parquet(os.path.join(jdir, rid, "batch-000"))
    assert {r.doc_id for r in persisted.select("doc_id").collect()} == {
        r.doc_id for r in gone.select("doc_id").collect()
    }
