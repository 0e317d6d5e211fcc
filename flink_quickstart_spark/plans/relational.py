"""Row-transform, sort/limit, set-op, and scan query keys
(SURVEY.md §2.B, §2.F, §2.G, §2.A2).

Reference surface [PK]: Flink ``map`` / ``flatMap`` / ``filter`` row
transforms, ``DataSet.sortPartition`` / ``first(n)``, union/distinct set
ops, and ``readTextFile``/``readCsvFile`` sources (checkout empty — see
SURVEY.md §0).

All keys here are narrow transformations (no shuffle) except the sorts and
set ops; Catalyst pushes the filters and projections into the parquet scan
(verified via ``.explain`` — PushedFilters / ReadSchema show the pruning).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4)) AS DOUBLE) AS disc_price,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS DOUBLE) AS charge
    FROM lineitem
    """,
    tags=("batch", "transform"),
)
def q_project_arith(spark, sf_dir):
    """B1: map/1→1 transform as a projection expression (stays in codegen).

    Money arithmetic is done in DECIMAL: the products have exactly 6
    decimal digits, so double-rounding at 4 digits hits exact ``…5`` ties
    where Spark (HALF_UP on shortest repr) and DuckDB (binary value)
    disagree. Decimal math at full natural scale (4 for the 2dp×2dp
    product, 6 for the three-factor product) is exact — no rounding at
    all, hence engine-portable. The FINAL columns are cast to DOUBLE on
    both sides: values ≤6 fractional digits are exactly representable, and
    the driver's value-hash stringifies Decimal('65002.2870') and float
    65002.287 differently even when numerically identical.
    """
    t = tables(spark, sf_dir)
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = ep * (F.lit(1).cast("decimal(18,2)") - disc)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        disc_price.cast("decimal(18,4)").cast("double").alias("disc_price"),
        (disc_price * (F.lit(1).cast("decimal(18,2)") + tax))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("charge"),
    )


@register(
    "q_flatmap_tokenize",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    tags=("batch", "transform"),
)
def q_flatmap_tokenize(spark, sf_dir):
    """B2: flatMap/1→N — the canonical word-count tokenizer via explode."""
    t = tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events
    WHERE event_type = 'purchase' AND value > 100
    """,
    tags=("batch", "transform"),
)
def q_filter_pred(spark, sf_dir):
    """B3: filter — predicate pushed to the parquet scan by Catalyst."""
    t = tables(spark, sf_dir)
    return t.events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")


@register(
    "q_cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR)   AS orderkey_str,
           CAST(l_quantity AS INTEGER)   AS qty_int,
           CAST(l_linenumber AS DOUBLE)  AS linenum_d,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS shipdate_str
    FROM lineitem
    """,
    tags=("batch", "transform"),
)
def q_cast_types(spark, sf_dir):
    """B4: type casts / schema projection (Flink map-to-POJO analog)."""
    t = tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("linenum_d"),
        F.col("l_shipdate").cast("date").cast("string").alias("shipdate_str"),
    )


@register(
    "q_sort",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS pos
    FROM orders
    """,
    tags=("batch", "sort"),
)
def q_sort(spark, sf_dir):
    """F1: global total sort. The ``pos`` column makes ordering observable
    under the driver's order-insensitive hash — computed with the
    two-phase distributed rank (operators/rank.py), NOT a global-window
    row_number, so no single-partition WindowExec exists in the plan."""
    from flink_quickstart_spark.operators.rank import global_row_number

    t = tables(spark, sf_dir)
    ranked = global_row_number(
        t.orders.select("o_orderkey", "o_totalprice"),
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        bucket_col="o_totalprice",
        out_col="pos",
    )
    return ranked.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total"), "pos"
    )


@register(
    "q_limit_topn",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("batch", "sort"),
)
def q_limit_topn(spark, sf_dir):
    """F2: global top-N — planned as TakeOrderedAndProject (per-partition
    top-N then merge, no total sort: the scalable shape)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "q_union",
    oracle="""
    SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type, user_id FROM events WHERE event_type = 'view'
    """,
    tags=("batch", "setop"),
)
def q_union(spark, sf_dir):
    """G1: union all (Flink ``stream.union``) — no shuffle, partition concat."""
    t = tables(spark, sf_dir)
    cols = ["event_id", "event_type", "user_id"]
    clicks = t.events.where(F.col("event_type") == "click").select(*cols)
    views = t.events.where(F.col("event_type") == "view").select(*cols)
    return clicks.unionByName(views)


@register(
    "q_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    """,
    tags=("batch", "setop"),
)
def q_intersect(spark, sf_dir):
    """G2: intersect — rewritten by Catalyst to a left-semi join + distinct."""
    t = tables(spark, sf_dir)
    a = t.orders.select(F.col("o_custkey").alias("custkey"))
    b = t.customer.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    WHERE c_acctbal > 9950
    """,
    tags=("batch", "setop"),
)
def q_except(spark, sf_dir):
    """G3: except — nations with no near-cap-balance customer (left-anti
    under the hood). The 9950 threshold is tuned so the result is
    NON-EMPTY at every testdata scale factor (every nation has customers,
    so the unfiltered form hash-matches vacuously on empty sets)."""
    t = tables(spark, sf_dir)
    a = t.nation.select(F.col("n_nationkey").alias("nationkey"))
    b = t.customer.where(F.col("c_acctbal") > 9950).select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.exceptAll(b.distinct())


@register(
    "q_scan_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_total
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("batch", "source"),
)
def q_scan_csv_roundtrip(spark, sf_dir):
    """A2: CSV write → read with explicit schema → aggregate; the oracle
    runs the same aggregate on the original parquet, proving lossless
    round-trip (Spark CSV doubles use shortest-round-trip repr).

    Exercises the text-file source surface (Flink ``readCsvFile``).
    """
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "csv_roundtrip", os.path.basename(sf_dir)
    )
    t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice").write.mode(
        "overwrite"
    ).option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@register(
    "q_scan_orc_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value,
           CAST(min(event_id) AS BIGINT) AS min_id
    FROM events GROUP BY event_type
    """,
    tags=("batch", "source"),
)
def q_scan_orc_roundtrip(spark, sf_dir):
    """A-family widening: ORC write → read → aggregate; the oracle runs
    the same aggregate on the original parquet, proving the columnar
    round-trip is lossless. ORC is Spark-native (no extra jar) and, like
    parquet, supports predicate pushdown + column pruning — the second
    columnar lake format a migrating user would bring."""
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "orc_roundtrip", os.path.basename(sf_dir)
    )
    t.events.select(
        "event_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    ).write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("event_id").alias("min_id"),
        )
    )


@register(
    "q_scan_json_corrupt",
    # Corruption is injected by a deterministic rule (event_id % 50 == 0),
    # so the oracle derives expected good/corrupt counts from the clean
    # parquet without parsing any JSON.
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE event_id % 50 <> 0) AS BIGINT) AS n_good,
           CAST(count(*) FILTER (WHERE event_id % 50 = 0)  AS BIGINT) AS n_corrupt,
           round(sum(value) FILTER (WHERE event_id % 50 <> 0), 2)     AS sum_good
    FROM events
    """,
    tags=("batch", "source"),
)
def q_scan_json_corrupt(spark, sf_dir):
    """A-family robustness: JSON-lines ingest with malformed rows under
    PERMISSIVE mode — bad records land whole in ``_corrupt_record``
    instead of killing the job or silently vanishing, and the pipeline
    counts/quarantines them (the dirty-data contract every production
    ingest needs). Every 50th event is written as truncated JSON; the
    reader must recover exactly the other 49/50."""
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "json_corrupt", os.path.basename(sf_dir)
    )
    good = F.to_json(F.struct("event_id", "value"))
    line = F.when(
        F.col("event_id") % 50 == 0, F.concat(F.lit('{"event_id": '), F.lit("oops"))
    ).otherwise(good)
    t.events.select(line.alias("value")).write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema("event_id long, value double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    bad = F.col("_corrupt_record").isNotNull()
    return parsed.agg(
        F.count(F.when(~bad, 1)).alias("n_good"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
        F.round(F.sum(F.when(~bad, F.col("value"))), 2).alias("sum_good"),
    )


@register(
    "q_scan_partitioned_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    tags=("batch", "source"),
)
def q_scan_partitioned_roundtrip(spark, sf_dir):
    """A-family: hive-style partitioned parquet layout — write events
    ``partitionBy(event_type)``, read the directory back, filter to two
    partition values, aggregate. The filter resolves at PLANNING time
    from directory names (partition pruning: the scan's
    ``PartitionFilters`` carries it and unselected directories are never
    opened) — THE mechanism that turns a 100 TB table scan into a
    per-partition read. The oracle runs the same aggregate+filter on the
    original un-partitioned parquet, proving the layout is lossless."""
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(),
        "fqs_scratch",
        "part_roundtrip",
        os.path.basename(sf_dir),
    )
    t.events.select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(out)
    return (
        spark.read.parquet(out)
        .where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_maintenance_compact",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)      AS n_events,
           round(sum(value), 2)          AS sum_value,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events GROUP BY event_type
    """,
    tags=("batch", "source", "maintenance"),
)
def q_maintenance_compact(spark, sf_dir):
    """A-ext: small-files compaction — the table-maintenance job every
    100 TB lake runs. Stage 1 simulates a streaming sink's fragmentation
    (repartition(64) → 64 small files); stage 2 compacts with
    ``coalesce(4)`` — a NARROW dependency: partitions concatenate with
    NO shuffle, so compaction cost is one read+write pass. The oracle
    aggregates the ORIGINAL table, proving the compacted copy is
    row-identical. At scale the same job targets ~1 GB files via
    input_bytes/target_size partitions."""
    t = tables(spark, sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "compact", os.path.basename(sf_dir)
    )
    frag_dir, compact_dir = base + "/frag", base + "/compacted"
    src = t.events.select("event_id", "event_type", "value")
    src.repartition(64).write.mode("overwrite").parquet(frag_dir)
    spark.read.parquet(frag_dir).coalesce(4).write.mode("overwrite").parquet(
        compact_dir
    )
    n_frag = len([f for f in os.listdir(frag_dir) if f.endswith(".parquet")])
    n_compact = len(
        [f for f in os.listdir(compact_dir) if f.endswith(".parquet")]
    )
    assert n_compact < n_frag, f"compaction failed: {n_frag} -> {n_compact}"
    return (
        spark.read.parquet(compact_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


@register(
    "q_scan_merge_schema",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)  AS n_rows,
           CAST(count(value) AS BIGINT) AS n_with_value,
           CAST(count(user_id) AS BIGINT) AS n_with_user,
           round(sum(value), 2) AS sum_value
    FROM (SELECT event_type, value, NULL AS user_id FROM events
          WHERE event_id % 2 = 0
          UNION ALL
          SELECT event_type, NULL AS value, user_id FROM events
          WHERE event_id % 2 = 1)
    GROUP BY event_type
    """,
    tags=("batch", "source"),
)
def q_scan_merge_schema(spark, sf_dir):
    """A-ext: schema evolution across file generations — generation 1
    wrote (event_type, value), generation 2 added user_id and dropped
    value. ``mergeSchema`` unions the physical schemas at read time and
    NULL-fills missing columns per file — the lake behavior that lets a
    100 TB table evolve without rewriting history. The oracle builds the
    same union logically from the original table."""
    t = tables(spark, sf_dir)
    base = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "evolve", os.path.basename(sf_dir)
    )
    t.events.where(F.expr("event_id % 2 = 0")).select(
        "event_type", "value"
    ).write.mode("overwrite").parquet(base + "/gen=1")
    t.events.where(F.expr("event_id % 2 = 1")).select(
        "event_type", "user_id"
    ).write.mode("overwrite").parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_with_value"),
        F.count("user_id").alias("n_with_user"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "q_join_dpp",
    oracle="""
    WITH dim(event_type, category) AS (
      VALUES ('click', 'engage'), ('view', 'engage'),
             ('purchase', 'convert'), ('signup', 'convert'),
             ('error', 'ops')
    )
    SELECT category,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE d.category = 'convert'
    GROUP BY category
    """,
    tags=("batch", "source", "join"),
)
def q_join_dpp(spark, sf_dir):
    """A/C-ext: dynamic partition pruning — the fact table is laid out
    hive-partitioned on the join key, the dimension carries the filter,
    and Spark derives the fact-side partition filter AT RUNTIME from
    the broadcast dim (``dynamicpruningexpression`` in the scan's
    PartitionFilters — asserted in tests/test_invariants_r3b.py). This
    is the star-schema contract that lets a 100 TB fact scan open only
    the partitions the filtered dimension names, without the user
    repeating the filter on the fact side. The oracle inlines the dim
    as VALUES over the unpartitioned original — proving layout + DPP
    change nothing semantically."""
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "dpp", os.path.basename(sf_dir)
    )
    t.events.select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [
            ("click", "engage"),
            ("view", "engage"),
            ("purchase", "convert"),
            ("signup", "convert"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    return (
        fact.join(dim.where(F.col("category") == "convert"), "event_type")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_scan_text_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
    tags=("batch", "source"),
)
def q_scan_text_roundtrip(spark, sf_dir):
    """A2c: line-oriented TEXT write → spark.read.text → parse →
    aggregate — the Flink ``readTextFile``/``writeAsText`` pair as a
    value-checked roundtrip (csv/orc/json cover the structured formats;
    this is the raw-line surface word-count jobs start from). Each doc
    serializes to one tab-separated line (text has no tabs in the
    testdata — asserted by the parse producing no NULLs); the reader
    splits it back and re-aggregates, matching the parquet oracle.

    Scale shape: text write/read is per-partition and embarrassingly
    parallel; the aggregate is the usual partial+final hash agg."""
    t = tables(spark, sf_dir)
    out = os.path.join(
        tempfile.gettempdir(), "fqs_scratch", "text_roundtrip",
        os.path.basename(sf_dir),
    )
    t.documents.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            "lang",
            F.col("n_chars").cast("string"),
        ).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.split("value", "\t").alias("parts")
    ).select(
        F.element_at("parts", 2).alias("lang"),
        F.element_at("parts", 3).cast("long").alias("n_chars"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
