"""Vector-index lifecycle on this engine: the build-once / query-many
ANN production shapes (SURVEY §2 K4c/K4d).

1. Build a persisted IVF index (centroid-partitioned members) and a
   persisted LSH index ((band,bucket)-partitioned, pos-capped postings)
   from the embeddings table — both fingerprint-guarded, so a re-run
   with unchanged data reuses them.
2. Query a fixed batch against each: IVF top-k (probe-pruned member
   scan) and LSH radius search (static bucket pruning + posting cap).
3. Grade both against exact truth (brute kNN / linear radius_search)
   and print recall — the same contracts the registry keys carry.

Run: ``python examples/vector_index_job.py [sf_dir] [index_dir]``
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.operators.similarity import (
    brute_knn,
    ensure_ivf_index,
    ensure_lsh_index,
    ivf_query_index,
    lsh_query_index,
    radius_search,
)
from flink_quickstart_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    idx_root = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="vecidx_")
    spark = get_spark(app_name="vector-index-job")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir).embeddings
    src = f"{sf_dir}/embeddings.parquet"

    t0 = time.time()
    built_ivf = ensure_ivf_index(emb, f"{idx_root}/ivf", src, n_clusters=16)
    built_lsh = ensure_lsh_index(emb, f"{idx_root}/lsh", src)
    print(
        f"indexes {'built' if built_ivf or built_lsh else 'reused'} "
        f"in {time.time() - t0:.1f}s under {idx_root}"
    )

    queries = emb.orderBy("vec_id").limit(64)

    # IVF top-k: probe 4 of 16 clusters vs exact brute force
    approx = {
        (r.query_id, r.nbr_id)
        for r in ivf_query_index(
            spark, f"{idx_root}/ivf", queries, k=3, n_probe=4
        ).collect()
    }
    qids = {r.vec_id for r in queries.select("vec_id").collect()}
    exact = {
        (r.query_id, r.nbr_id)
        for r in brute_knn(emb, k=3).collect()
        if r.query_id in qids
    }
    print(
        f"IVF top-3, probe 4/16: recall {len(approx & exact) / len(exact):.3f} "
        f"({len(approx)} results)"
    )

    # LSH radius search vs exact linear truth
    got = {
        (r.query_id, r.nbr_id)
        for r in lsh_query_index(
            spark, f"{idx_root}/lsh", queries, radius=1.2, cap_per_bucket=4096
        ).collect()
    }
    truth = {
        (r.query_id, r.nbr_id)
        for r in radius_search(emb, queries, radius=1.2).collect()
    }
    print(
        f"LSH radius 1.2, cap 4096: recall {len(got & truth) / len(truth):.3f}, "
        f"false positives {len(got - truth)} (exact rescore: always 0)"
    )

    # PQ (r10): compressed-scan top-k — 16 code bytes per vector instead
    # of 256, ADC shortlist + exact re-rank of 32 candidates
    from flink_quickstart_spark.operators.quantization import (
        pq_build_index,
        pq_query_index,
    )
    from flink_quickstart_spark.operators.similarity import _ensure_index

    _ensure_index(
        lambda: pq_build_index(emb, f"{idx_root}/pq"),
        f"{idx_root}/pq",
        src,
        "codebooks",
    )
    pq = {
        (r.query_id, r.nbr_id)
        for r in pq_query_index(
            spark, f"{idx_root}/pq", queries, k=3, shortlist=32, vectors=emb
        ).collect()
    }
    print(
        f"PQ ADC->rerank top-3 (16x compressed scan): "
        f"recall {len(pq & exact) / len(exact):.3f}"
    )


if __name__ == "__main__":
    main()
