"""Round-10 streaming face: the ATOMIC admission commit (VERDICT r9 #2).

r9's admission gate had one honestly-documented crash window: the
``_last_admitted_batch`` marker is written AFTER the store upsert, so a
crash between the two re-APPENDED the epoch's signatures on replay
(flat store layout). r10 closes it by layout: an epoch-partitioned
store (minhash_build_store(..., epoch_partitioned=True)) makes each
epoch's upsert a DYNAMIC OVERWRITE of its own (_hmod, _epoch)
partitions — a replayed epoch replaces its first attempt. Pins:

1. CRASH INJECTION — replaying an epoch whose upsert ran but whose
   marker write did not (the exact r9 window) leaves ZERO duplicate
   band rows and byte-identical flagged/admitted sinks;
2. the epoch-store gate produces exactly the flat-store gate's
   flagged/admitted results and band multiset (layout changes nothing
   semantically);
3. replay determinism of the probe itself: the replayed epoch does not
   candidate-match its own first-attempt signatures (before_epoch
   store pruning — the store-side twin of the admitted_dir filter).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd


def _waves(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    wave1 = docs.where(F.col("doc_id") % 20 == 0)
    wave2 = docs.where((F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 20 != 0))
    return corpus, wave1, wave2


def _gate(spark, tmp_path, tag, epoch_partitioned):
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_ingest_admission,
    )

    corpus, wave1, wave2 = _waves(spark)
    store = str(tmp_path / f"store_{tag}")
    corpus_path = str(tmp_path / f"corpus_{tag}")
    flagged = str(tmp_path / f"flagged_{tag}")
    admitted = str(tmp_path / f"admitted_{tag}")
    corpus.write.parquet(corpus_path)
    minhash_build_store(corpus, store, epoch_partitioned=epoch_partitioned)
    handler = foreach_batch_ingest_admission(
        store, corpus_path, flagged, admitted, threshold=0.5
    )
    return handler, store, flagged, admitted, (wave1, wave2)


def _snap(spark, d):
    return sorted(tuple(r) for r in spark.read.parquet(d).collect())


def _bands(spark, store):
    from collections import Counter

    return Counter(
        (r.doc_id, r.band_id, r.sig)
        for r in spark.read.parquet(_sdd(store, "bands"))
        .select("doc_id", "band_id", "sig")
        .collect()
    )


def test_crash_between_upsert_and_marker_heals_on_replay(spark, tmp_path):
    """The exact r9 window: epoch 1's upsert committed, the marker
    write did not (crash). On the epoch layout the replay's dynamic
    overwrite REPLACES the first attempt — zero duplicates, identical
    sinks, and the band multiset equals an uncrashed run's."""
    handler, store, flagged, admitted, (w1, w2) = _gate(
        spark, tmp_path, "crash", epoch_partitioned=True
    )
    handler(w1, 0)
    handler(w2, 1)
    clean_bands = _bands(spark, store)
    clean_flagged, clean_admitted = _snap(spark, flagged), _snap(spark, admitted)
    assert max(clean_bands.values()) == 1  # sanity: no dups in clean run

    # crash injection: epoch 1's upsert ran (it is in the store) but
    # the marker says epoch 0 — exactly the window between the two
    marker = os.path.join(store, "_last_admitted_batch")
    with open(marker, "w") as fh:
        fh.write("0")
    handler(w2, 1)  # the checkpoint replays the uncommitted epoch

    assert _bands(spark, store) == clean_bands  # ZERO duplicate band rows
    assert _snap(spark, flagged) == clean_flagged
    assert _snap(spark, admitted) == clean_admitted

    # and with the marker DELETED entirely (lost filesystem), replaying
    # both epochs still converges to the same store
    os.remove(marker)
    handler(w1, 0)
    handler(w2, 1)
    assert _bands(spark, store) == clean_bands
    assert _snap(spark, flagged) == clean_flagged
    assert _snap(spark, admitted) == clean_admitted


def test_epoch_gate_matches_flat_gate(spark, tmp_path):
    """The layout is invisible to semantics: flagged pairs, admitted
    set, and the band multiset are identical across flat and
    epoch-partitioned stores."""
    h_flat, s_flat, f_flat, a_flat, (w1, w2) = _gate(
        spark, tmp_path, "flat", epoch_partitioned=False
    )
    h_ep, s_ep, f_ep, a_ep, _ = _gate(
        spark, tmp_path, "ep", epoch_partitioned=True
    )
    for h in (h_flat, h_ep):
        h(w1, 0)
        h(w2, 1)
    assert _snap(spark, f_flat) == _snap(spark, f_ep)
    assert _snap(spark, a_flat) == _snap(spark, a_ep)
    assert _bands(spark, s_flat) == _bands(spark, s_ep)


def test_replayed_epoch_does_not_see_its_own_signatures(spark, tmp_path):
    """Replay determinism of the PROBE: after epoch 1's upsert is in
    the store, a replay of epoch 1 must flag exactly what the first
    attempt flagged — its own first-attempt signatures are pruned out
    (before_epoch), so no within-batch pair can appear only on
    replay. Constructed worst case: the wave contains an internal
    near-dup pair (two copies of one text under different ids) —
    replay would flag the pair against the store if the pruning were
    missing."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_ingest_neardup,
    )
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_ingest_admission,
    )

    corpus, wave1, _ = _waves(spark)
    # donor must be a doc the gate will ADMIT: probe a throwaway store
    # to exclude wave-1 docs that near-dup the base corpus themselves
    probe = str(tmp_path / "probe_selfdup")
    minhash_build_store(corpus, probe)
    hit = {
        r.new_id
        for r in minhash_ingest_neardup(
            spark, probe, wave1, corpus, threshold=0.5
        ).collect()
    }
    donor = (
        wave1.where(~F.col("doc_id").isin(list(hit) or [-1]))
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    wave = wave1.unionByName(
        spark.createDataFrame(
            [(donor.doc_id + 1_000_000, donor.text)], "doc_id long, text string"
        )
    )
    store = str(tmp_path / "store_selfdup")
    corpus_path = str(tmp_path / "corpus_selfdup")
    flagged = str(tmp_path / "flagged_selfdup")
    admitted = str(tmp_path / "admitted_selfdup")
    corpus.write.parquet(corpus_path)
    minhash_build_store(corpus, store, epoch_partitioned=True)
    handler = foreach_batch_ingest_admission(
        store, corpus_path, flagged, admitted, threshold=0.5
    )
    handler(wave, 0)
    first_flagged = _snap(spark, flagged)
    first_admitted = _snap(spark, admitted)
    # both copies admitted on the first attempt (within-batch pairs are
    # by design checked against PRIOR state only, like the batch loop)
    admitted_ids = {r[0] for r in first_admitted}
    assert donor.doc_id in admitted_ids
    assert donor.doc_id + 1_000_000 in admitted_ids

    # replay epoch 0 with its signatures already upserted: without the
    # before_epoch pruning the clone would now flag against the donor
    with open(os.path.join(store, "_last_admitted_batch"), "w") as fh:
        fh.write("-1")
    handler(wave, 0)
    assert _snap(spark, flagged) == first_flagged
    assert _snap(spark, admitted) == first_admitted
