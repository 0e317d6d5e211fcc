"""Synthesize a larger scale-factor directory from sf0.1 by key-shifted
replication — the 10× measurement substrate VERDICT r4 item #1 asks for.

Model: N disjoint "shards" of the sf0.1 universe. Every key column is
offset per copy by ``i * stride`` CONSISTENTLY across tables (lineitem's
``l_suppkey`` shifts with supplier's ``s_suppkey``, etc.), so referential
integrity holds, join fan-outs per key are UNCHANGED, and group-key
cardinality grows 10× — i.e. the data grows the way a real corpus grows
(more keys), not by planting duplicates that would inflate true-dup /
self-join outputs quadratically. Specifics:

- ``region``/``nation`` stay 5/25 rows (dims are scale-invariant; the
  nationkey foreign keys are NOT shifted) — exactly why broadcast plans
  must keep holding at scale.
- ``events``: user_id/event_id shift; ``ts`` is kept, so time windows see
  10× users per window (10× throughput, the honest stream-growth model).
- ``documents``: disjoint-universe token prefixing (``c{i}_`` per copy)
  on top of the doc_id shift — vocabularies never collide across copies,
  so pair-forming text ops scale by corpus mass, not by planted dups
  (scale_probe.py's established method); ``n_chars`` is recomputed.
- ``embeddings``: vec_id shifts; vectors get a tiny deterministic
  per-copy rotation-free perturbation on dim 0 (+i * 1e-4) so exact-dup
  neighbor structure isn't planted 10-fold.

Run: ``python tools/make_sf.py [N=10] [out=/root/repo/.scale/sf1]
[tables=csv] [fill_from=dir]``

``tables=`` stages only the named tables at N× (r7b: the text-decade
point — ``make_sf.py 100 .scale/sf10text documents,embeddings
fill_from=.scale/sf1`` gives the text/embedding tier a TRUE 10× decade
above sf1, where fixed overhead is negligible); the remaining tables
are symlinked from ``fill_from`` so ``load_tables``'s eager footer
reads still resolve — only probe keys that touch the N× tables are
meaningful against such a directory.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.sources.tables import load_tables

SF_DIR = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# table -> key columns shifted by i*STRIDE per copy
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, key_cols: list[str], n: int) -> DataFrame:
    copies = []
    for i in range(n):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * STRIDE))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        __file__
    ).resolve().parents[1] / ".scale" / "sf1"
    only: set[str] | None = None
    fill_from: Path | None = None
    for arg in sys.argv[3:]:
        if arg.startswith("fill_from="):
            fill_from = Path(arg.split("=", 1)[1]).resolve()
        else:
            only = set(arg.removeprefix("tables=").split(","))
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="make-sf")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)

    def wanted(name: str) -> bool:
        return only is None or name in only

    t0 = time.time()
    for name in ("region", "nation"):
        if wanted(name):
            getattr(t, name).write.mode("overwrite").parquet(
                str(out_dir / f"{name}.parquet")
            )
    for name, keys in SHIFT_KEYS.items():
        if not wanted(name):
            continue
        if name == "embeddings":
            df = replicate_embeddings(t.embeddings, n)
        else:
            df = replicate(getattr(t, name), keys, n)
        df.write.mode("overwrite").parquet(str(out_dir / f"{name}.parquet"))
        print(f"{name}: written ({time.time() - t0:.1f}s)")

    if wanted("documents"):
        docs = disjoint_documents(t.documents, n)
        docs.write.mode("overwrite").parquet(str(out_dir / "documents.parquet"))
        print(f"documents: written ({time.time() - t0:.1f}s)")

    if only is not None and fill_from is not None:
        import os

        for name in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            dst = out_dir / f"{name}.parquet"
            src = fill_from / f"{name}.parquet"
            if name not in only and not dst.exists() and src.exists():
                os.symlink(src, dst)
                print(f"{name}: symlinked from {src}")
    print(f"staged {n}x replica of {SF_DIR} at {out_dir}" + (f" (tables={sorted(only)})" if only else ""))


def replicate_embeddings(emb: DataFrame, n: int) -> DataFrame:
    copies = []
    for i in range(n):
        bump = F.lit(float(i) * 1e-4)
        copies.append(
            emb.select(
                (F.col("vec_id") + i * STRIDE).alias("vec_id"),
                F.concat(
                    F.array(F.col("embedding")[0] + bump),
                    F.slice("embedding", 2, 100000),
                ).alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def disjoint_documents(docs: DataFrame, n: int) -> DataFrame:
    copies = []
    for i in range(n):
        tag = F.lit(f"c{i}_")
        text = F.concat_ws(
            " ", F.transform(F.split("text", " "), lambda w: F.concat(tag, w))
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + i * STRIDE).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


if __name__ == "__main__":
    main()
