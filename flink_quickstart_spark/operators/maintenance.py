"""Store maintenance: small-file compaction for the persisted indexes.

Every APPEND-shaped maintenance op (minhash_upsert_store,
ivf_upsert_index, the admission gate's per-epoch upserts) adds a new
file per touched partition per batch — after N ingest days a partition
holds N small files, and scan cost starts paying per-file open/footer
overhead instead of bytes (the classic small-file problem; at 100 TB
the file COUNT, not the data, becomes the bottleneck). Compaction
rewrites each partition's row set as one sorted file, preserving the
row multiset and the partition layout exactly — the same operation a
lakehouse runs as OPTIMIZE.

Safety note on in-place rewrite: the dynamic-partition-overwrite write
stages output under a temporary attempt directory and swaps partition
directories only at JOB COMMIT, after every task has finished reading
its input files — the same read-rewrite shape the upsert/delete ops use,
pinned by their row-identity tests (tests/test_invariants_r9.py). A
crash mid-job leaves the original files in place (the staging dir is
uncommitted); compaction is idempotent and can simply re-run.
"""

from __future__ import annotations

import os


def data_file_counts(base_dir: str) -> dict[str, int]:
    """parquet data files per partition directory (fs metadata only)."""
    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(base_dir):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            counts[os.path.relpath(root, base_dir)] = n
    return counts


def compact_partitions(
    spark,
    data_dir: str,
    partition_cols: list[str],
    sort_cols: list[str],
) -> dict[str, int]:
    """Rewrite every partition of a Hive-partitioned parquet dir as ONE
    file, rows sorted by ``sort_cols`` within it (restores page-level
    min/max pruning on the sort key — e.g. the LSH ``pos`` cap — that
    interleaved append files dilute). Row multiset is preserved exactly;
    no partition is added or removed (every partition appears in the
    rewritten data, so dynamic overwrite replaces all and drops none).
    Returns {'files_before': n, 'files_after': m}.

    Work is one shuffle of the store on its partition key — linear, run
    it per maintenance window, optionally on a partition SUBSET by
    compacting a filtered copy at the caller (the generic op stays
    whole-store; the stores are already partition-pruned on read)."""
    before = sum(data_file_counts(data_dir).values())
    df = spark.read.parquet(data_dir)
    (
        df.repartition(*partition_cols)
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(data_dir)
    )
    after = sum(data_file_counts(data_dir).values())
    return {"files_before": before, "files_after": after}


def compact_minhash_store(spark, path: str) -> dict[str, int]:
    """OPTIMIZE for the signature store: one sorted file per ``_hmod``
    bucket (sort (band_id, sig) — the band-join probe key)."""
    return compact_partitions(
        spark, f"{path}/bands", ["_hmod"], ["band_id", "sig"]
    )


def compact_lsh_index(spark, path: str) -> dict[str, int]:
    """OPTIMIZE for the LSH posting index: one file per (band, bucket),
    pos-sorted — restores the page-level ``pos <= cap`` pruning that
    multiple append/merge files dilute."""
    return compact_partitions(
        spark, f"{path}/postings", ["band_id", "bucket"], ["pos"]
    )


def compact_ivf_index(spark, path: str) -> dict[str, int]:
    """OPTIMIZE for the IVF member index: one file per cluster."""
    return compact_partitions(
        spark, f"{path}/members", ["cluster_id"], ["vec_id"]
    )


__all__ = [
    "compact_partitions",
    "compact_minhash_store",
    "compact_lsh_index",
    "compact_ivf_index",
    "data_file_counts",
]
