"""Cross-process concurrent reader/writer stress (VERDICT r11 #2).

A SECOND OS process (plain Python + pyarrow — the generation protocol
is engine-agnostic: pointer file + manifest + parquet) loops point
reads against a minhash signature store while THIS process runs an
upsert → delete → compact → upsert → delete gauntlet. Every read the
reader completes must observe exactly one generation's count law
(16 band rows per live doc for that generation) — never a torn count.

A read may legitimately race the keep-2 GC (the reader resolved
generation g, then two publishes landed before its file reads) — the
reader classifies that as `expired` (the typed StoreSnapshotExpired
contract) and it is NOT an error; anything else unexpected is. The
test requires a minimum number of SUCCESSFUL consistent reads so the
race is actually exercised, zero unexplained errors, and zero count-law
violations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.dedup import (
    minhash_build_store,
    minhash_delete_store,
    minhash_upsert_store,
)
from flink_quickstart_spark.operators.maintenance import (
    compact_minhash_store,
    generation_id,
)
from tests.conftest import SF_DIR

_READER = r"""
import json, os, sys, time

import pyarrow.dataset as ds

store, out_path, stop_path = sys.argv[1], sys.argv[2], sys.argv[3]
GEN_PREFIX, POINTER, MANIFEST = "_gen-", "_current", "_manifest.json"


def observe():
    # 1. resolve the pointer (one read = the snapshot for this loop)
    try:
        with open(os.path.join(store, POINTER)) as fh:
            gen = int(json.load(fh)["generation"])
    except FileNotFoundError:
        gen = 0
    root = store if gen == 0 else os.path.join(store, f"{GEN_PREFIX}{gen:06d}")
    # 2. resolve the generation's manifest (the explicit file list)
    try:
        with open(os.path.join(root, MANIFEST)) as fh:
            manifest = json.load(fh)
        files = [
            os.path.join(root, e["path"])
            for e in manifest["files"]
            if e["path"].startswith("bands" + os.sep)
        ]
        # 3. count rows over EXACTLY the manifest's files
        n = ds.dataset(files, format="parquet").count_rows()
        return {"status": "ok", "generation": gen, "rows": int(n)}
    except (FileNotFoundError, OSError) as exc:
        # the keep-2 GC may have reclaimed gen between (1) and (3) —
        # only acceptable if the store has MOVED ON by >= 2 generations
        try:
            with open(os.path.join(store, POINTER)) as fh:
                now_gen = int(json.load(fh)["generation"])
        except FileNotFoundError:
            now_gen = 0
        if now_gen >= gen + 2:
            return {"status": "expired", "generation": gen, "now": now_gen}
        return {
            "status": "error",
            "generation": gen,
            "now": now_gen,
            "error": f"{type(exc).__name__}: {exc}",
        }


with open(out_path, "w") as out:
    while not os.path.exists(stop_path):
        out.write(json.dumps(observe()) + "\n")
        out.flush()
        time.sleep(0.02)
"""


def test_cross_process_reader_never_sees_torn_state(spark, tmp_path):
    path = str(tmp_path / "store")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 150)
    )
    a = docs.where(F.col("doc_id") % 3 == 0)
    b = docs.where(F.col("doc_id") % 3 == 1)
    c = docs.where(F.col("doc_id") % 3 == 2)
    na, nb, nc = a.count(), b.count(), c.count()
    minhash_build_store(a, path)

    # the count law per generation, fixed by the gauntlet below
    expected = {
        0: 16 * na,              # build(A)
        1: 16 * (na + nb),       # upsert B
        2: 16 * na,              # delete B
        3: 16 * na,              # compact (multiset-preserving)
        4: 16 * (na + nc),       # upsert C
        5: 16 * nc,              # delete A
    }

    reader_py = str(tmp_path / "reader.py")
    out_path = str(tmp_path / "observations.jsonl")
    stop_path = str(tmp_path / "stop")
    with open(reader_py, "w") as fh:
        fh.write(_READER)
    proc = subprocess.Popen(
        [sys.executable, reader_py, path, out_path, stop_path],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
    )
    try:
        time.sleep(0.3)  # let the reader start observing gen 0
        minhash_upsert_store(spark, path, b)      # gen 1
        minhash_delete_store(spark, path, b)      # gen 2
        compact_minhash_store(spark, path)        # gen 3
        minhash_upsert_store(spark, path, c)      # gen 4
        minhash_delete_store(spark, path, a)      # gen 5
        assert generation_id(path) == 5
        time.sleep(0.3)  # a few post-gauntlet reads of the final state
    finally:
        open(stop_path, "w").close()
        try:
            _, err = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            _, err = proc.communicate()
    assert proc.returncode == 0, err.decode()[-2000:]

    obs = [json.loads(line) for line in open(out_path)]
    ok = [o for o in obs if o["status"] == "ok"]
    errors = [o for o in obs if o["status"] == "error"]
    assert not errors, f"unexplained reader errors: {errors[:5]}"
    assert len(ok) >= 20, (
        f"only {len(ok)} successful reads — the race was not exercised "
        f"({len(obs)} observations total)"
    )
    torn = [
        o for o in ok if o["rows"] != expected[o["generation"]]
    ]
    assert not torn, f"torn reads (count law violated): {torn[:5]}"
    gens_seen = {o["generation"] for o in ok}
    assert 5 in gens_seen  # the final state was observed
    assert len(gens_seen) >= 2, (
        f"reader observed only generations {gens_seen} — no concurrency"
    )
