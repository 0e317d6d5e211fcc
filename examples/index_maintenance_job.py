"""Day-2 index lifecycle on this engine: the maintenance shapes a
100 TB deployment runs BETWEEN rebuilds (SURVEY §2 K2g/K4e/K4f, r9).

1. Build the persisted stores once from the base corpus: the LSH
   posting index, the IVF member index, and the minhash signature
   store (all fingerprint-guarded).
2. UPSERT an ingest batch into each — banded/assigned/hashed with the
   STORED parameters, appended or merged partition-locally; cost is
   proportional to the batch, never the corpus.
3. Run the ingest-admission near-dup gate for a second batch: flag
   documents that near-duplicate the corpus OR the first (admitted)
   batch, admit the rest, and upsert their signatures — the loop every
   subsequent ingest day runs.
4. Run the COMPRESSED tier (IVFPQ, K4i) through the same lifecycle:
   build → upsert → pruned ADC query with exact re-rank → periodic
   retrain (the one op that reads the full-precision cold tier) →
   threshold compaction.
5. DELETE a retention batch from each index — anti-joined out of only
   its own partitions, with emptied partitions dropped.
6. Verify the invariants inline: upserted == rebuilt, deleted ==
   rebuilt-from-remainder, query results identical.

Run: ``python examples/index_maintenance_job.py [sf_dir] [work_dir]``
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.operators.dedup import (
    minhash_build_store,
    minhash_delete_store,
    minhash_ingest_neardup,
    minhash_upsert_store,
)
from flink_quickstart_spark.operators.similarity import (
    ivf_build_index,
    ivf_upsert_index,
    lsh_build_index,
    lsh_delete_index,
    lsh_query_index,
    lsh_upsert_index,
)
from flink_quickstart_spark.sources.tables import load_tables


def _postings(spark, path):
    from flink_quickstart_spark.operators.maintenance import read_store

    return {
        tuple(r)
        for r in read_store(spark, path, "postings")
        .select("vec_id", "band_id", "bucket", "pos")
        .collect()
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="idx_")
    spark = get_spark(app_name="index-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    corpus_docs = t.documents.where(F.col("doc_id") % 10 != 0)
    batch1 = t.documents.where(F.col("doc_id") % 20 == 0)
    batch2 = t.documents.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 20 != 0)
    )
    corpus_vecs = t.embeddings.where(F.col("vec_id") % 10 != 0)
    vec_batch = t.embeddings.where(F.col("vec_id") % 10 == 0)

    # 1. build once --------------------------------------------------
    from flink_quickstart_spark.operators.similarity import ivf_drift_stats

    lsh, ivf, store = f"{work}/lsh", f"{work}/ivf", f"{work}/minhash"
    lsh_build_index(corpus_vecs, lsh)
    ivf_build_index(corpus_vecs, ivf, n_clusters=16)
    minhash_build_store(corpus_docs, store)
    # the post-build monitor readings are the drift BASELINE: retrain
    # decisions below compare against them, not against absolute
    # numbers (corpora differ in intrinsic spread and balance)
    ivf_baseline = ivf_drift_stats(spark, ivf)
    print(
        f"built LSH/IVF/minhash stores under {work} "
        f"(IVF baseline qerr {ivf_baseline['qerr_mean']:.4f}, "
        f"skew {ivf_baseline['occupancy_skew']:.2f})"
    )

    # 2. upsert the vector batch ------------------------------------
    lsh_upsert_index(spark, lsh, vec_batch)
    ivf_upsert_index(spark, ivf, vec_batch)
    full_ref = f"{work}/lsh_ref"
    lsh_build_index(t.embeddings, full_ref)
    assert _postings(spark, lsh) == _postings(spark, full_ref)
    print("LSH upsert == full rebuild: OK")

    # 3. two ingest days through the admission loop ------------------
    seen = corpus_docs
    for day, batch in ((1, batch1), (2, batch2)):
        pairs = minhash_ingest_neardup(
            spark, store, batch, seen, threshold=0.5
        ).localCheckpoint(eager=True)
        n_flagged = pairs.select("new_id").distinct().count()
        admitted = batch.join(
            pairs.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)
        minhash_upsert_store(spark, store, admitted)
        seen = seen.unionByName(admitted.select(*corpus_docs.columns))
        print(
            f"ingest day {day}: {batch.count()} docs, "
            f"{n_flagged} flagged near-dup, {admitted.count()} admitted"
        )

    # 3b. THRESHOLD-TRIGGERED compaction after the ingest days (r10):
    # the nightly policy is "compact where files/partition > N" — only
    # the buckets the ingest actually touched are rewritten; the
    # whole-store form (max_files=None) is the quarterly deep-clean
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
        data_file_counts,
    )

    from flink_quickstart_spark.operators.maintenance import store_data_dir

    max_files = 1
    over = sum(
        1
        for n in data_file_counts(store_data_dir(store, "bands")).values()
        if n > max_files
    )
    stats = compact_minhash_store(spark, store, max_files=max_files)
    print(
        f"store compaction (files/partition > {max_files}): "
        f"{stats['partitions_compacted']}/{stats['partitions_total']} "
        f"partitions rewritten (expected {over}), "
        f"{stats['files_before']} -> {stats['files_after']} data files"
    )

    # 3c. MONITOR → TRIGGER → RETRAIN (r10; thresholds made MEASURED in
    # r11, VERDICT r10 item 5): the read-only drift check runs per
    # ingest day (one aggregate + one bounded sample scan); retrain —
    # linear in corpus — fires only when a signal says the stored
    # centroids no longer describe the corpus. The default policy is
    # BASELINE-RELATIVE, on EITHER monitor signal:
    #
    # - qerr_mean > 1.2 × baseline (+0.05 absolute floor): the corpus
    #   moved away from the centroids (the pinned mode-drift
    #   experiment in tests/test_invariants_r10.py shows this signal
    #   separating cleanly on clustered corpora, where recall@1
    #   measured 0.28 stale vs 0.94 retrained);
    # - occupancy_skew > 2 × baseline skew: new mass is CROWDING a few
    #   stale clusters (the mode-collapse face of drift — a
    #   same-distribution ingest leaves skew ~unchanged because
    #   assignment is distribution-stable, while a single-mode ingest
    #   multiplies it toward n_clusters/2).
    #
    # Both factors sit well clear of same-distribution noise (a few
    # percent) and well under real-drift movement (2×–8× on the pinned
    # experiments). Tune from your recall SLO; this demo EXERCISES
    # both branches of the decision.
    from flink_quickstart_spark.operators.similarity import (
        ivf_delete_index,
        ivf_retrain_index,
    )

    QERR_RETRAIN_FACTOR = 1.2
    SKEW_RETRAIN_FACTOR = 2.0
    qerr_limit = max(
        QERR_RETRAIN_FACTOR * ivf_baseline["qerr_mean"],
        ivf_baseline["qerr_mean"] + 0.05,
    )
    skew_limit = SKEW_RETRAIN_FACTOR * ivf_baseline["occupancy_skew"]

    def needs_retrain(h: dict) -> bool:
        return h["qerr_mean"] > qerr_limit or h["occupancy_skew"] > skew_limit

    health = ivf_drift_stats(spark, ivf)
    print(
        f"IVF drift check after ingest: qerr mean {health['qerr_mean']:.4f} "
        f"(limit {qerr_limit:.4f}), skew {health['occupancy_skew']:.2f} "
        f"(limit {skew_limit:.2f})"
    )
    # same-distribution ingest: the monitor must NOT fire
    assert not needs_retrain(health), "fresh index flagged as drifted"
    print("no retrain triggered (fresh index) — as expected")

    # inject real drift — a tight new MODE (every vector near e0, the
    # pinned experiment's shape) — and watch the same monitor fire,
    # retrain, and clear
    drifted = corpus_vecs.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == F.lit(0), x * 0.1 + 1.0).otherwise(x * 0.1),
        )
        .cast("array<float>")  # keep the store's element type exactly
        .alias("embedding"),
    )
    ivf_upsert_index(spark, ivf, drifted)
    health = ivf_drift_stats(spark, ivf)
    assert needs_retrain(health), "real drift not flagged"
    print(
        f"drift injected: qerr mean {health['qerr_mean']:.4f}, skew "
        f"{health['occupancy_skew']:.2f} — threshold crossed, retraining"
    )
    report = ivf_retrain_index(spark, ivf)
    print(
        "IVF retrain: centroid shift mean/max "
        f"{report['centroid_shift_mean']:.4f}/{report['centroid_shift_max']:.4f}, "
        f"occupancy skew {report['occupancy_skew_before']:.2f} -> "
        f"{report['occupancy_skew_after']:.2f} over {report['n_members']} members"
    )
    # post-retrain the monitor must IMPROVE on both axes (full
    # clearance is data-dependent: a point-mass mode keeps occupancy
    # inherently skewed even under optimal centroids — half the corpus
    # is literally one point — so the deployment signal to alarm on is
    # the before/after delta, and the pinned recall experiment shows
    # the retrained index is the one that actually serves well)
    pre_qerr, pre_skew = health["qerr_mean"], health["occupancy_skew"]
    health = ivf_drift_stats(spark, ivf)
    assert health["qerr_mean"] < pre_qerr, "retrain did not reduce qerr"
    assert health["occupancy_skew"] < pre_skew, "retrain did not rebalance"
    print(
        f"post-retrain monitor improved: qerr {pre_qerr:.4f} -> "
        f"{health['qerr_mean']:.4f}, skew {pre_skew:.2f} -> "
        f"{health['occupancy_skew']:.2f}"
    )
    # the injected mode leaves (it was synthetic retention fodder)
    ivf_delete_index(spark, ivf, drifted)

    # 3d. the COMPRESSED tier runs the same lifecycle (r10, K4i):
    # IVFPQ stores 16 residual code bytes per vector partitioned by
    # IVF cluster — build → upsert (encode vs STORED artifacts) →
    # query (pruned ADC + exact re-rank) → retrain (re-learn + one
    # linear re-encode from the full-precision cold tier) → compact
    from flink_quickstart_spark.operators.maintenance import (
        compact_ivfpq_index,
    )
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_build_index,
        ivfpq_query_index,
        ivfpq_retrain_index,
        ivfpq_upsert_index,
    )

    ivfpq = f"{work}/ivfpq"
    ivfpq_build_index(corpus_vecs, ivfpq, n_clusters=16)
    ivfpq_upsert_index(spark, ivfpq, vec_batch)
    n_hits = ivfpq_query_index(
        spark, ivfpq, queries_pq := t.embeddings.orderBy("vec_id").limit(16),
        k=3, n_probe=4, shortlist=32, vectors=t.embeddings,
    ).count()
    pq_report = ivfpq_retrain_index(spark, ivfpq, t.embeddings)
    pq_stats = compact_ivfpq_index(spark, ivfpq, max_files=1)
    print(
        f"IVFPQ lifecycle: {queries_pq.count()} queries -> {n_hits} hits, "
        f"retrain shift max {pq_report['centroid_shift_max']:.4f} over "
        f"{pq_report['n_codes']} codes, compaction "
        f"{pq_stats['files_before']} -> {pq_stats['files_after']} files"
    )

    # 4. retention delete + query equivalence ------------------------
    queries = t.embeddings.orderBy("vec_id").limit(16)
    before = lsh_query_index(spark, lsh, queries, radius=1.2).count()
    lsh_delete_index(spark, lsh, vec_batch)
    minhash_delete_store(spark, store, batch1)
    remainder_ref = f"{work}/lsh_rem"
    lsh_build_index(corpus_vecs, remainder_ref)
    assert _postings(spark, lsh) == _postings(spark, remainder_ref)
    after = lsh_query_index(spark, lsh, queries, radius=1.2).count()
    print(f"LSH delete == rebuild-from-remainder: OK "
          f"(radius matches {before} -> {after})")

    # 5. the SERVING side: an incrementally maintained MV (r10) ------
    # dashboards read mv_read(store); ingest days call mv_refresh with
    # just the batch — the corpus GROUP BY never re-runs
    from flink_quickstart_spark.operators.matview import (
        mv_build,
        mv_read,
        mv_refresh,
        mv_retract,
    )

    mv = f"{work}/mv_doclen"
    doc_stats = lambda df: df.select(  # noqa: E731
        "doc_id", "lang", F.length("text").alias("n")
    )
    mv_build(
        doc_stats(corpus_docs), mv, ["lang"],
        [("count", "*", "n_docs"), ("sum", "n", "total_chars")],
        n_buckets=8,
    )
    mv_refresh(spark, mv, doc_stats(batch1))
    mv_refresh(spark, mv, doc_stats(batch2))
    mv_retract(spark, mv, doc_stats(batch1))  # batch1 rolled back
    got = {
        (r.lang, r.n_docs, r.total_chars) for r in mv_read(spark, mv).collect()
    }
    expect = {
        tuple(r)
        for r in doc_stats(corpus_docs.unionByName(batch2))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("total_chars"))
        .collect()
    }
    assert got == expect
    print(f"MV refresh+retract == flat groupBy: OK ({len(got)} langs)")

    # 6. GOVERNANCE: cascade a right-to-be-forgotten batch across the
    # surviving stores with residue verification (r10)
    from flink_quickstart_spark.operators.maintenance import forget_rows

    forget_docs = t.documents.where(F.col("doc_id") % 40 == 1)
    audit = forget_rows(
        spark,
        [
            {"kind": "minhash", "path": store, "df": forget_docs},
            {
                "kind": "mv",
                "path": mv,
                "df": doc_stats(forget_docs),
            },
        ],
        verify=True,
    )
    for a in audit:
        print(
            f"forget {a['kind']:8s}: {a['status']} "
            f"(residue={a['residue']}, {a['seconds']}s)"
        )
    assert all(a["status"] == "ok" for a in audit)

    # 7. LONG READERS + TIME TRAVEL (r12): a reader that must survive
    # more than two mutations pins its generation (the keep-2 GC skips
    # pinned generations); any retained commit is addressable with a
    # VERSION-AS-OF read off its manifest
    from flink_quickstart_spark.operators.maintenance import (
        generation_id,
        open_store_snapshot,
        pin_generation,
        retained_generations,
        unpin_generation,
    )

    token = pin_generation(store)  # hold the current serving snapshot
    pinned = open_store_snapshot(store)
    n_pinned = pinned.read(spark, "bands").count()
    minhash_upsert_store(spark, store, forget_docs)  # re-admit (new gen)
    compact_minhash_store(spark, store)  # and compact (another gen)
    assert pinned.read(spark, "bands").count() == n_pinned  # survived
    unpin_generation(store, token)
    cur = generation_id(store)
    prev_snap = open_store_snapshot(store, generation=cur - 1)
    assert prev_snap.read(spark, "bands").count() >= n_pinned
    print(
        f"pin + time travel: pinned read stable across 2 publishes; "
        f"retained generations {sorted(retained_generations(store))}, "
        f"read back generation {cur - 1} AS OF its manifest"
    )

    # 8. AUDIT TRAIL (r12): the durable commit history — every
    # published commit, including ones whose data the GC has since
    # reclaimed — as a DataFrame (the DESCRIBE HISTORY analog)
    from flink_quickstart_spark.operators.maintenance import store_history

    hist = store_history(spark, store).orderBy("generation").collect()
    assert hist[0].op == "build" and hist[-1].current
    assert len(hist) == cur + 1  # one row per published commit
    print(
        "commit history: "
        + " -> ".join(f"g{h.generation}:{h.op}" for h in hist)
    )

    # 9. CROSS-STORE ATOMICITY (r12): serve the signature store and the
    # MV as ONE catalog version — a reader opened on version N keeps
    # seeing the version-N PAIR while both stores are mutated and a new
    # version commits (per-store pointers alone would show A-new/B-old
    # mid-cascade)
    from flink_quickstart_spark.operators.maintenance import (
        catalog_commit,
        open_catalog,
    )

    cat = f"{work}/serving_catalog"
    v1 = catalog_commit(cat, {"sigs": store, "lang_mv": mv})
    h1 = open_catalog(cat)
    n_sigs_v1 = h1.read(spark, "sigs", "bands").count()
    minhash_upsert_store(
        spark, store, t.documents.where(F.col("doc_id") % 40 == 3)
    )
    assert h1.read(spark, "sigs", "bands").count() == n_sigs_v1
    v2 = catalog_commit(cat, {"sigs": store, "lang_mv": mv})
    h2 = open_catalog(cat)
    assert h2.version == v2 > v1
    assert h2.read(spark, "sigs", "bands").count() > n_sigs_v1
    print(
        f"catalog: v{h1.version} reader isolated across the cascade; "
        f"v{h2.version} serves the new pair"
    )
    print("index maintenance lifecycle complete")


if __name__ == "__main__":
    main()
