"""Invariant checks for the round-4 operators — data-independent
mathematical properties on the real testdata (exactness lives in
test_correctness.py; these pin the semantics the SQL twin can't):

- covariance: diagonal is a nonnegative variance; every off-diagonal
  obeys Cauchy-Schwarz |cov(i,j)| <= sqrt(var_i · var_j); the diagonal
  agrees with q_embed_dim_stats' std (same population formula).
- PCA contract: every check the contract row carries must be true.
- Benford: fractions sum to ~1, digits are 1..9, Benford reference
  values are the literal log10(1 + 1/d).
- RRF: scores bounded by 2/(k+1), output sorted desc, every rank
  within [1, 50] or -1, and a doc in both arms outranks the same doc
  counting only one arm.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_quickstart_spark.plans import load_all, registry
from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd

load_all()


def _run(spark, key):
    return registry.REGISTRY[key].builder(spark, SF_DIR)


def test_covariance_psd_bounds(spark):
    rows = _run(spark, "q_embed_covariance").collect()
    var = {r.di: r.cov for r in rows if r.di == r.dj}
    assert len(var) == 64
    assert all(v >= 0 for v in var.values())
    for r in rows:
        if r.di != r.dj:
            bound = math.sqrt(var[r.di] * var[r.dj]) + 1e-6
            assert abs(r.cov) <= bound, (r.di, r.dj, r.cov, bound)


def test_covariance_diagonal_matches_dim_stats(spark):
    cov = {
        r.di: r.cov
        for r in _run(spark, "q_embed_covariance").collect()
        if r.di == r.dj
    }
    stats = {r.dim: r.std_x for r in _run(spark, "q_embed_dim_stats").collect()}
    for d, v in cov.items():
        assert abs(math.sqrt(max(v, 0.0)) - stats[d]) < 1e-4, d


def test_pca_contract_row_all_true(spark):
    r = _run(spark, "q_embed_pca_project").collect()[0]
    assert r.k == 4
    assert r.n_projected > 0
    assert r.orthonormal and r.eigs_sorted
    assert r.projected_var_matches_eigs and r.explained_frac_valid


def test_benford_distribution_consistent(spark):
    rows = _run(spark, "q_dq_benford").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.benford_frac - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        assert abs(r.abs_dev - round(abs(r.frac - r.benford_frac), 5)) < 1e-4


def test_span_mask_reconstructs_original(spark):
    """The masked input and the sentinel target must together carry the
    whole document: replacing each <extra_id_k> in the masked text with
    target's span k reproduces the original token sequence exactly."""
    import re

    rows = _run(spark, "q_llm_span_mask").limit(30).collect()
    t = registry.tables(spark, SF_DIR)
    orig = {
        r.doc_id: [w for w in r.text.split(" ") if w]
        for r in t.documents.collect()
    }
    assert rows
    for r in rows:
        spans = {}
        for m in re.finditer(
            r"<extra_id_(\d+)>((?: (?!<extra_id_)\S+)*)", r.target_text
        ):
            spans[int(m.group(1))] = m.group(2).split()
        out = []
        for w in r.masked_text.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", w)
            out.extend(spans[int(m.group(1))] if m else [w])
        assert out == orig[r.doc_id], r.doc_id
        assert r.n_masked == sum(len(s) for s in spans.values())


def test_chunk_stitch_recovers_all_adjacencies(spark):
    """Every genuine (doc, chunk k -> k+1) adjacency must appear as a
    stitch with true_adjacent = 1 (the overlap construction guarantees
    the fingerprints match); false stitches are collisions, allowed but
    labeled 0."""
    from pyspark.sql import functions as F

    stitches = _run(spark, "q_llm_chunk_stitch").collect()
    chunks = _run(spark, "q_llm_chunk").collect()
    per_doc = {}
    for c in chunks:
        per_doc.setdefault(c.doc_id, []).append((c.chunk_id, c.n_tokens))
    expected = set()
    for d, cs in per_doc.items():
        for cid, ntok in cs:
            # a full 50-token chunk has a 10-token tail overlapping the
            # next chunk's head whenever a successor exists
            if ntok == 50 and any(c2 == cid + 1 for c2, _ in cs):
                nxt = next(n2 for c2, n2 in cs if c2 == cid + 1)
                if nxt >= 10:
                    expected.add((d, cid, d, cid + 1))
    got_true = {
        (s.d1, s.c1, s.d2, s.c2) for s in stitches if s.true_adjacent == 1
    }
    assert expected <= got_true
    # and true_adjacent labeling is sound
    for s in stitches:
        if s.true_adjacent:
            assert s.d1 == s.d2 and s.c2 == s.c1 + 1


def test_grouping_id_levels_consistent(spark):
    rows = _run(spark, "q_sql_grouping_id").collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    statuses = [r for r in rows if r.gid == 1]
    details = [r for r in rows if r.gid == 0]
    assert sum(r.n for r in statuses) == grand[0].n
    assert sum(r.n for r in details) == grand[0].n
    assert abs(sum(r.revenue for r in details) - grand[0].revenue) < 1.0


def test_ppm_codec_roundtrip_and_real_decode(spark):
    """The pure-numpy P6 codec must round-trip bit-exactly, decode_stub
    must take the REAL decode path for PPM payloads (no deterministic
    fake), and the real resize must equal a numpy nearest-neighbor
    reference on actual pixels."""
    import numpy as np

    from flink_quickstart_spark.operators.multimodal import (
        attach_ppm_media,
        decode_ppm,
        decode_stub,
        encode_ppm,
        resize_ppm,
        text_to_pixels,
    )

    px = text_to_pixels("the quick brown fox jumps over the lazy dog", 16)
    assert px.shape == (16, 16, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)

    t = registry.tables(spark, SF_DIR)
    docs = t.documents.limit(20)
    media = attach_ppm_media(docs, "doc_id", "text", side=16)
    # REAL decode path: deterministic_fake stays False and must not raise
    feats = {r.media_id: r.feature for r in decode_stub(media).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(texts)
    for mid, f in feats.items():
        ref = text_to_pixels(texts[mid], 16).astype(np.float64) / 255.0
        assert len(f) == 16
        assert abs(f[15] - ref.mean()) < 1e-6  # global brightness dim
        assert abs(f[12] - ref[:, :, 0].mean()) < 1e-6  # global R mean

    resized = {r.media_id: r.payload for r in resize_ppm(media, 8).collect()}
    for mid, payload in resized.items():
        got = decode_ppm(payload)
        src = text_to_pixels(texts[mid], 16)
        ys = (np.arange(8) * 16) // 8
        assert got.shape == (8, 8, 3)
        assert np.array_equal(got, src[np.ix_(ys, ys)])


def test_wav_codec_roundtrip_and_validation():
    import numpy as np
    import pytest

    from flink_quickstart_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        text_to_samples,
    )

    s = text_to_samples("hello world this is a pcm test")
    rate, back = decode_wav(encode_wav(s))
    assert rate == 8000
    assert np.array_equal(back, s)
    assert s.dtype == np.int16 and len(s) == 2048
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS....")


def test_y4m_codec_roundtrip_and_validation():
    import numpy as np
    import pytest

    from flink_quickstart_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        text_to_frames,
    )

    frames = text_to_frames("yuv4mpeg codec roundtrip text", 4, 16)
    fps, back = decode_y4m(encode_y4m(frames))
    assert fps == 25
    assert np.array_equal(back, frames)
    assert frames.shape == (4, 3, 16, 16)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF....\n")


def test_ppm_codec_rejects_malformed_payloads():
    import pytest

    from flink_quickstart_spark.operators.multimodal import decode_ppm

    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="8-bit"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_ivf_persistent_index_build_then_query(spark, tmp_path):
    """Build-once/probe-many: the persisted IVF index must (a) land as a
    cluster_id-partitioned layout (the on-disk index), (b) answer
    queries with recall@k >= 0.5 vs brute force, and (c) read ONLY the
    probed partitions (input files of the member scan after the
    semi-join stay a strict subset)."""
    import os

    from flink_quickstart_spark.operators.similarity import (
        brute_knn,
        ivf_build_index,
        ivf_query_index,
    )
    from flink_quickstart_spark.plans.registry import tables

    emb = tables(spark, SF_DIR).embeddings
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, n_clusters=16)
    parts = [d for d in os.listdir(_sdd(idx, "members")) if d.startswith("cluster_id=")]
    assert len(parts) >= 2  # partitioned layout exists

    queries = emb.orderBy("vec_id").limit(20)
    got = ivf_query_index(spark, idx, queries, k=3, n_probe=4)
    approx = {}
    for r in got.collect():
        approx.setdefault(r.query_id, set()).add(r.nbr_id)
    exact = {}
    for r in (
        brute_knn(emb, k=3)
        .join(queries.select(F.col("vec_id").alias("query_id")), "query_id", "left_semi")
        .collect()
    ):
        exact.setdefault(r.query_id, set()).add(r.nbr_id)
    hits = total = 0
    for qid, nbrs in exact.items():
        total += len(nbrs)
        hits += len(nbrs & approx.get(qid, set()))
    assert total > 0 and hits / total >= 0.5


def test_asof_nearest_directions_consistent(spark):
    """On the real events data: backward matches have click <= purchase,
    forward strictly after; the chosen side is never farther than the
    registered backward-asof (q_join_asof) match; null direction iff
    no click exists for the user."""
    near = {
        r.purchase_id: r for r in _run(spark, "q_join_asof_nearest").collect()
    }
    back = {r.purchase_id: r for r in _run(spark, "q_join_asof").collect()}
    assert set(near) == set(back)
    for pid, r in near.items():
        if r.direction is None:
            assert r.click_id is None and back[pid].click_id is None
            continue
        if r.direction == "backward":
            assert r.click_ts_us <= r.purchase_ts_us
            assert r.click_id == back[pid].click_id
        else:
            assert r.click_ts_us > r.purchase_ts_us
            b = back[pid]
            if b.click_ts_us is not None:
                # forward was chosen => strictly closer than backward
                assert (r.click_ts_us - r.purchase_ts_us) < (
                    r.purchase_ts_us - b.click_ts_us
                )


def test_rrf_fusion_ordering_and_bounds(spark):
    rows = _run(spark, "q_text_rrf_fusion").collect()
    assert 0 < len(rows) <= 20
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r.rrf <= 2.0 / 61 + 1e-9
        for rk in (r.rank_a, r.rank_b):
            assert rk == -1 or 1 <= rk <= 50
        assert not (r.rank_a == -1 and r.rank_b == -1)
