"""Round-5 additions: BPE-merge vocabulary training and Z-order data
layout maintenance.

Reference surface [PK — SURVEY.md §0, checkout empty]: BPE merge
learning is the standard tokenizer-training step of an LLM corpus
pipeline (K-tier); Z-order clustering is the multi-column layout
companion to small-files compaction (``q_maintenance_compact``) — the
table-maintenance job that makes two-predicate scans prune row groups
on BOTH columns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.bpe import learn_bpe_merges
from flink_quickstart_spark.plans.registry import register, tables

_N_MERGES = 16


def _bpe_training_ctes(n_merges: int = _N_MERGES) -> tuple[str, list[str]]:
    """Shared CTE body for the unrolled BPE training chain — used by
    the training oracle here and the tokenizer-application oracle in
    plans/analytics_r6.py. Returns (with_body, per-step top selects);
    the final merged vocabulary table is ``w{n_merges}`` and each
    step's winning pair is the 1-row ``p{k}``."""
    steps, tops = [], []
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        steps.append(f"""
    p{k} AS MATERIALIZED (
      SELECT syms[i] AS lhs, syms[i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT syms, cnt, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM (SELECT string_split(substring(s, 2, length(s) - 2), ')(') AS syms, cnt
              FROM {prev})
      )
      GROUP BY lhs, rhs
      ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    ),
    w{k} AS MATERIALIZED (
      SELECT replace(w.s, '(' || t.lhs || ')(' || t.rhs || ')',
                     '(' || t.lhs || t.rhs || ')') AS s, w.cnt
      FROM {prev} w CROSS JOIN p{k} t
    )""")
        tops.append(
            f"SELECT {k} AS step, lhs, rhs, lhs || rhs AS merged, pair_count FROM p{k}"
        )
    body = f"""
    vocab AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
            FROM documents)
      WHERE length(word) >= 2
      GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT regexp_replace(word, '(.)', '(\\1)', 'g') AS s, cnt FROM vocab
    ),
    {",".join(steps)}"""
    return body, tops


def _bpe_oracle(n_merges: int = _N_MERGES) -> str:
    """Unrolled BPE training in SQL: each step's top pair and merged
    word table are chained MATERIALIZED CTEs (DuckDB would otherwise
    inline the chain and the plan grows exponentially — the PageRank
    oracle lesson, plans/graph.py). The greedy merge is a literal
    ``replace`` over the ``(sym)(sym)`` wrapped form — byte-identical
    semantics to the Spark side (operators/bpe.py docstring)."""
    body, tops = _bpe_training_ctes(n_merges)
    return f"""
    WITH
    {body}
    SELECT CAST(step AS INT) AS step, lhs, rhs, merged, pair_count
    FROM ({" UNION ALL ".join(tops)})
    """


@register(
    "q_llm_bpe_merges",
    oracle=_bpe_oracle(),
    tags=("batch", "llm", "iterative", "text"),
)
def q_llm_bpe_merges(spark, sf_dir):
    """K-tier: BPE-merge vocabulary training — the first 16 merges
    learned from the documents corpus (weighted by word frequency,
    deterministic (count DESC, lhs, rhs) tie-break). Output is the
    merge table ``(step, lhs, rhs, merged, pair_count)`` a tokenizer
    replays in order.

    Scale shape: tokenization + word counting is ONE explode + hash
    aggregate over the corpus; every merge iteration then runs on the
    vocabulary-sized word-frequency table (pair explode + hash agg +
    top-1 pull + literal-replace map, lineage checkpointed per step) —
    the corpus is never re-read. See operators/bpe.py."""
    t = tables(spark, sf_dir)
    words = (
        t.documents.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return learn_bpe_merges(spark, words, _N_MERGES)


def _interleave_bits(u: Column, v: Column, bits: int = 10) -> Column:
    """Z-value: interleave the low ``bits`` bits of two bucket ids
    (u-bit above v-bit per position) — pure JVM-side shift/mask
    expressions, whole-stage-codegen friendly."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        u_bit = F.shiftrightunsigned(u, i).bitwiseAND(F.lit(1))
        v_bit = F.shiftrightunsigned(v, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(u_bit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(v_bit, 2 * i)
        )
    return z


@register(
    "q_maintenance_zorder",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)      AS n_rows,
           round(sum(value), 2)          AS sum_value,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE user_id  BETWEEN (SELECT max(user_id)  // 4 FROM events)
                       AND (SELECT max(user_id)  // 2 - 1 FROM events)
      AND event_id BETWEEN (SELECT max(event_id) // 4 FROM events)
                       AND (SELECT max(event_id) // 2 - 1 FROM events)
    """,
    tags=("batch", "source", "maintenance"),
)
def q_maintenance_zorder(spark, sf_dir):
    """A-ext: Z-order (Morton-curve) clustering — rewrite events sorted
    by the bit-interleaved (user_id, event_id) bucket key via
    ``repartitionByRange`` + ``sortWithinPartitions``, so every output
    file covers a compact range in BOTH columns and parquet min/max
    footer stats prune two-predicate scans on either dimension. (A
    single-column sort prunes only its own column: an event_id-range
    scan over a user_id-sorted table touches every file.)

    The key returns the same filter+aggregate over the clustered copy
    that the oracle runs on the original table (layout losslessness,
    same contract as ``q_maintenance_compact``), and ASSERTS the layout
    claim from the parquet footers: the quarter-width predicate box
    must stats-overlap at most half the files on EACH dimension alone
    and at most a quarter combined, and the plan must carry
    PushedFilters. At 100 TB the same job targets row groups within
    ~1 GB files; the bucket grid (1024²) and z computation are pure
    map-side expressions — the only shuffle is the range partitioner's."""
    t = tables(spark, sf_dir)
    # 1-row bounds scalar: the bucket grid needs the column maxima (the
    # same bounded concession as the iterative loops; plan-audit waiver)
    mx = t.events.agg(
        F.max("user_id").alias("mu"), F.max("event_id").alias("me")
    ).first()
    if mx is None or mx["mu"] is None:
        raise ValueError("q_maintenance_zorder: events table is empty")
    umax, emax = int(mx["mu"]), int(mx["me"])
    u_bucket = F.floor(F.col("user_id") * 1024 / (umax + 1)).cast("long")
    v_bucket = F.floor(F.col("event_id") * 1024 / (emax + 1)).cast("long")
    # per-application scratch dir: concurrent runs on the same sf
    # (verify gate vs bench/scale_curve) must not overwrite each
    # other's clustered copy mid-footer-read (r5 ADVICE)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch",
        f"zorder_{spark.sparkContext.applicationId}",
        os.path.basename(sf_dir),
    )
    (
        t.events.select("event_id", "user_id", "event_type", "value")
        .withColumn("z", _interleave_bits(u_bucket, v_bucket))
        .repartitionByRange(32, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(out)
    )

    u_lo, u_hi = umax // 4, umax // 2 - 1
    e_lo, e_hi = emax // 4, emax // 2 - 1

    # ---- layout assertion from parquet footers (exact, deterministic)
    import pyarrow.parquet as pq

    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]

    def overlaps(path, col, lo, hi):
        meta = pq.ParquetFile(path).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                return True  # no stats → cannot prune
            if st.min <= hi and st.max >= lo:
                return True
        return False

    n = len(files)
    n_user = sum(overlaps(f, "user_id", u_lo, u_hi) for f in files)
    n_event = sum(overlaps(f, "event_id", e_lo, e_hi) for f in files)
    n_both = sum(
        overlaps(f, "user_id", u_lo, u_hi) and overlaps(f, "event_id", e_lo, e_hi)
        for f in files
    )
    assert n_user <= n // 2, f"user-dim pruning failed: {n_user}/{n} files overlap"
    assert n_event <= n // 2, f"event-dim pruning failed: {n_event}/{n} files overlap"
    assert n_both <= n // 4, f"2-D pruning failed: {n_both}/{n} files overlap"

    scan = spark.read.parquet(out).where(
        F.col("user_id").between(u_lo, u_hi)
        & F.col("event_id").between(e_lo, e_hi)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan, "filters not pushed"

    return scan.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )
