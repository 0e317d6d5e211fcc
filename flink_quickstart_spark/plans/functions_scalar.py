"""Scalar function library + UDF/UDTF query keys (SURVEY.md §2.H, §2.J).

Reference surface [PK]: Flink Table API built-in functions and
``ScalarFunction`` / ``TableFunction`` / ``ProcessWindowFunction`` UDFs
(checkout empty — see SURVEY.md §0).

Every function key computes several family members as aliased columns so
one oracle row-set covers the family. Portability notes baked in below:
- DuckDB 1.0 lacks ``initcap``/``try_divide``/``soundex`` — excluded.
- ``ceil``/``floor`` return BIGINT in Spark but DOUBLE in DuckDB → CAST.
- Spark ``weekday()+1`` == DuckDB ``isodow`` (Mon=1..Sun=7).
- Transcendentals (ln/exp/log10) can differ by 1 ulp across libm
  implementations → ROUND(…, 6) on both sides.

UDF keys stay Arrow-vectorized (pandas_udf / applyInPandas); the scalar
UDF emits the RAW double product — both engines execute the identical
IEEE-754 multiply on identical inputs, so no rounding is needed at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS up,
           lower(c_name)                         AS lo,
           substring(c_name, 1, 8)               AS sub8,
           CAST(length(c_name) AS BIGINT)        AS len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           concat(c_mktsegment, ':', c_name)     AS tagged,
           regexp_extract(c_name, '[0-9]+')      AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
           reverse(c_mktsegment)                 AS rev,
           repeat(c_mktsegment, 2)               AS rep2,
           CAST(strpos(c_name, 'e') AS BIGINT)   AS pos_e,
           trim(concat(' ', c_name, ' '))        AS trimmed,
           (c_mktsegment LIKE 'B%')              AS is_b
    FROM customer
    """,
    tags=("batch", "function"),
)
def q_fn_string(spark, sf_dir):
    """H1: string function family over customer names."""
    t = tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_name").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.length("c_name").cast("long").alias("len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long").alias("lev"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat("c_mktsegment", 2).alias("rep2"),
        F.instr("c_name", "e").cast("long").alias("pos_e"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit(" "))).alias("trimmed"),
        F.col("c_mktsegment").like("B%").alias("is_b"),
    )


@register(
    "q_fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS yr,
           CAST(month(o_orderdate) AS BIGINT)   AS mo,
           CAST(day(o_orderdate) AS BIGINT)     AS dom,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT)  AS dow_iso,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
           CAST(epoch(o_orderdate) AS BIGINT)   AS epoch_s,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    """,
    tags=("batch", "function"),
)
def q_fn_datetime(spark, sf_dir):
    """H2: date/time family over order dates (µs timestamps, tz-free)."""
    t = tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.quarter(d).cast("long").alias("qtr"),
        (F.weekday(d) + 1).cast("long").alias("dow_iso"),
        F.date_trunc("month", d).cast("date").cast("string").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.unix_timestamp(d).cast("long").alias("epoch_s"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)          AS abs_c,
           CAST(ceil(l_extendedprice) AS BIGINT)     AS ceil_p,
           CAST(floor(l_extendedprice) AS BIGINT)    AS floor_p,
           round(sqrt(l_extendedprice), 6)           AS sqrt_p,
           round(ln(l_extendedprice), 6)             AS ln_p,
           round(log10(l_extendedprice), 6)          AS log10_p,
           round(exp(l_tax), 6)                      AS exp_tax,
           pow(l_quantity, 2)                        AS qty_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE)   AS sgn,
           CAST(mod(l_orderkey, 7) AS BIGINT)        AS mod7,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_tax / l_discount, 6) END AS tax_over_disc
    FROM lineitem
    """,
    tags=("batch", "function"),
)
def q_fn_math(spark, sf_dir):
    """H3: math family. ceil/floor CAST to BIGINT on the DuckDB side
    (type divergence); transcendentals rounded to 6 (libm ulp drift);
    try_divide expressed as a CASE in the oracle (absent in DuckDB 1.0)."""
    t = tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_c"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_p"),
        F.floor("l_extendedprice").cast("long").alias("floor_p"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.exp("l_tax"), 6).alias("exp_tax"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("mod7"),
        F.round(F.try_divide("l_tax", F.nullif("l_discount", F.lit(0))), 6).alias(
            "tax_over_disc"
        ),
    )


@register(
    "q_fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END                         AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           least(o_totalprice, 250000.0)                AS capped,
           greatest(o_totalprice, 50000.0)              AS floored,
           (o_orderstatus = 'F')                        AS is_f
    FROM orders
    """,
    tags=("batch", "function"),
)
def q_fn_conditional(spark, sf_dir):
    """H4: CASE / coalesce / nullif / least / greatest."""
    t = tables(spark, sf_dir)
    p = F.col("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        F.when(p >= 300000, "high").when(p >= 100000, "mid").otherwise("low").alias(
            "bucket"
        ),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.least(p, F.lit(250000.0)).alias("capped"),
        F.greatest(p, F.lit(50000.0)).alias("floored"),
        (F.col("o_orderstatus") == "F").alias("is_f"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(emb) AS BIGINT)            AS n_dims,
           round(CAST(list_sum(emb) AS DOUBLE), 4) AS sum_elems,
           round(emb[1], 6)                    AS first_elem,
           round(CAST(list_max(emb) AS DOUBLE), 6) AS max_elem,
           round(list_sort(emb)[1], 6)         AS min_via_sort,
           CAST(len(list_distinct(emb)) AS BIGINT) AS n_distinct,
           round(list_sum(list_transform(emb, x -> x * x)), 4) AS sum_sq
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    """,
    tags=("batch", "function"),
)
def q_fn_array(spark, sf_dir):
    """H5: array family incl. higher-order transform/aggregate over the
    64-dim embedding vectors (cast float→double to match DuckDB math)."""
    t = tables(spark, sf_dir)
    emb = F.col("embedding").cast("array<double>")
    zero = F.lit(0.0)
    return t.embeddings.select(
        "vec_id",
        F.size(emb).cast("long").alias("n_dims"),
        F.round(F.aggregate(emb, zero, lambda a, x: a + x), 4).alias("sum_elems"),
        F.round(F.element_at(emb, 1), 6).alias("first_elem"),
        F.round(F.array_max(emb), 6).alias("max_elem"),
        F.round(F.element_at(F.sort_array(emb), 1), 6).alias("min_via_sort"),
        F.size(F.array_distinct(emb)).cast("long").alias("n_distinct"),
        F.round(
            F.aggregate(F.transform(emb, lambda x: x * x), zero, lambda a, x: a + x), 4
        ).alias("sum_sq"),
    )


@register(
    "q_fn_map",
    oracle="""
    WITH counted AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           string_agg(event_type || ':' || cnt, ',' ORDER BY event_type)
             AS type_counts_str,
           max(CASE WHEN event_type = 'click' THEN cnt END) AS n_clicks,
           CAST(count(*) AS BIGINT) AS n_types
    FROM counted GROUP BY user_id
    """,
    tags=("batch", "function"),
)
def q_fn_map(spark, sf_dir):
    """H6: map family — per-user map<event_type, count> built with
    create-map machinery (map_from_entries), then read back via
    map_entries / element_at / map_keys. A raw MapType column cannot
    value-hash portably (key order is engine-specific), so the map is
    emitted as its canonical sorted ``k:v,...`` rendering — the map ops
    still run; the oracle rebuilds the same rendering relationally."""
    t = tables(spark, sf_dir)
    counted = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    with_map = counted.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    entries = F.map_entries("type_counts")  # insertion order = sorted
    return with_map.select(
        "user_id",
        F.array_join(
            F.transform(
                entries,
                lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
            ),
            ",",
        ).alias("type_counts_str"),
        F.element_at("type_counts", "click").alias("n_clicks"),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY k
    """,
    tags=("batch", "function", "headline"),
)
def q_fn_json(spark, sf_dir):
    """H7: JSON extraction — ``get_json_object`` on the ``props`` string
    column, aggregated by the extracted key."""
    t = tables(spark, sf_dir)
    return (
        t.events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "q_fn_hash",
    oracle="""
    SELECT doc_id, sha256(text) AS sha, md5(text) AS md5h,
           CAST(length(to_base64(CAST(substring(text, 1, 12) AS BLOB))) AS BIGINT) AS b64len
    FROM documents
    """,
    tags=("batch", "function"),
)
def q_fn_hash(spark, sf_dir):
    """H8: hash/binary family — the content-addressing building block for
    exact dedup (K1). xxhash64 exists Spark-side but is engine-specific,
    so the portable pair sha256/md5 carries the oracle."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.sha2("text", 256).alias("sha"),
        F.md5("text").alias("md5h"),
        F.length(F.base64(F.substring("text", 1, 12).cast("binary")))
        .cast("long")
        .alias("b64len"),
    )


@register(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
    tags=("batch", "udf"),
)
def q_udf_scalar(spark, sf_dir):
    """J1: scalar pandas UDF (Arrow series→series) computing the
    discounted price. Emits the RAW double — numpy and DuckDB run the
    identical IEEE multiply on identical inputs, so results are
    bit-equal with no rounding."""
    t = tables(spark, sf_dir)

    @F.pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@register(
    "q_udtf_split",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) - 1 AS INTEGER) AS pos,
           unnest(parts) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents)
    """,
    tags=("batch", "udf"),
)
def q_udtf_split(spark, sf_dir):
    """J2: table function (UDTF / lateral) — one row per token with its
    position, via posexplode (the JVM-side form; a Python ``@udtf`` would
    add an Arrow hop for no semantic gain)."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@register(
    "q_grouped_map_zscore",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN stddev_pop(value) OVER w = 0 THEN NULL
                ELSE round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 4)
           END AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    tags=("batch", "udf"),
)
def q_grouped_map_zscore(spark, sf_dir):
    """J3: grouped-map transform (Flink ``ProcessWindowFunction`` analog)
    — per-user z-score of event values. One shuffle on user_id.

    r13-opt (guide §4.1, the r12 sliding_znorm precedent): the
    ``groupBy().applyInPandas`` surface paid a per-GROUP invocation +
    serialization round (~2 ms × 1.5 k users dominated the key), so the
    same per-group function now runs inside ``mapInArrow`` over
    hash-partitioned, (user_id, event_id)-sorted partitions with
    key-carry across Arrow batches. The per-group MATH is the identical
    pandas calls on the identical value sequence — events arrive from
    the scan in event_id order, so the explicit sort reproduces the old
    shuffle-arrival order within each group bit-for-bit (and pins a
    deterministic order for multi-mapper inputs at scale, where arrival
    order was arbitrary)."""
    import pyarrow as pa

    t = tables(spark, sf_dir)

    def group_z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        z = (pdf["value"] - pdf["value"].mean()) / std if std > 0 else None
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": z.round(4) if std > 0 else float("nan"),
            }
        )

    def _emit(pdf: pd.DataFrame) -> pa.RecordBatch:
        out = pd.concat(
            [group_z(g) for _, g in pdf.groupby("user_id", sort=False)],
            ignore_index=True,
        )
        return pa.RecordBatch.from_pydict(
            {
                "event_id": pa.array(out["event_id"], pa.int64()),
                "user_id": pa.array(out["user_id"], pa.int64()),
                "zscore": pa.array(out["zscore"], pa.float64()),
            }
        )

    def zscores(batches):
        carry = None
        for b in batches:
            pdf = b.to_pandas()
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # the partition is sorted on user_id: only the LAST user can
            # straddle the batch boundary — hold it back
            last_mask = pdf["user_id"] == pdf["user_id"].iat[-1]
            carry = pdf[last_mask]
            head = pdf[~last_mask]
            if len(head):
                yield _emit(head)
        if carry is not None and len(carry):
            yield _emit(carry)

    return (
        t.events.select("event_id", "user_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "event_id")
        .mapInArrow(
            zscores, "event_id bigint, user_id bigint, zscore double"
        )
    )


@register(
    "q_udf_sql_registered",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           round(c_acctbal, 2) AS acctbal
    FROM customer
    """,
    tags=("batch", "udf"),
)
def q_udf_sql_registered(spark, sf_dir):
    """J-ext: UDF registered into the SQL catalog and invoked from SQL
    TEXT — Flink's ``CREATE TEMPORARY FUNCTION`` / Table API
    ``createTemporarySystemFunction`` surface. The function is a pandas
    UDF (Arrow-vectorized, not row-at-a-time), registered under a name
    and called from a plain SQL string, proving parser → catalog lookup
    → vectorized Python execution end to end."""
    from flink_quickstart_spark.sources.tables import register_views

    register_views(spark, sf_dir)

    @F.pandas_udf("string")
    def _acct_tier(bal: pd.Series) -> pd.Series:
        out = pd.Series("standard", index=bal.index)
        out[bal < 0] = "debtor"
        out[bal >= 5000] = "premium"
        return out

    spark.udf.register("acct_tier", _acct_tier)
    return spark.sql(
        """
        SELECT c_custkey, acct_tier(c_acctbal) AS tier,
               round(c_acctbal, 2) AS acctbal
        FROM customer
        """
    )


@register(
    "q_fn_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_extendedprice / l_discount, 4) END AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(CAST(floor(l_extendedprice) AS BIGINT)
                          % CAST(floor(l_quantity) AS BIGINT)
                     AS BIGINT) END AS price_mod_qty,
           try_cast(l_returnflag AS INTEGER) AS flag_as_int
    FROM lineitem
    """,
    tags=("batch", "function"),
)
def q_fn_try_safe(spark, sf_dir):
    """H-ext: error-safe arithmetic under ANSI mode — Spark 4 ships
    ANSI ON, so bare division/modulo by zero and invalid casts THROW and
    kill the job; ``try_divide`` / ``try_mod`` / ``try_cast`` return
    NULL instead, the behavior a 100 TB pipeline needs when one dirty
    row must not abort a 6-hour job. The oracle encodes the same
    semantics with explicit CASE guards (DuckDB division semantics
    differ, so the guard IS the portable contract)."""
    t = tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_discount")), 4
        ).alias("price_per_disc"),
        F.try_mod(
            F.floor("l_extendedprice"), F.floor("l_quantity")
        ).alias("price_mod_qty"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("flag_as_int"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)        AS low_byte,
           CAST(o_orderkey | 15 AS BIGINT)         AS with_flags,
           CAST(xor(o_orderkey, 21845) AS BIGINT)  AS toggled,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS popcount,
           CAST(o_orderkey << 2 AS BIGINT)         AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT)         AS shr3
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    tags=("batch", "function"),
)
def q_fn_bitwise(spark, sf_dir):
    """H-ext: bitwise function family — AND/OR/XOR masks, popcount,
    shifts. The building blocks of bitmap flags, bloom-filter probes
    and feature hashing; all JVM-side integer ops inside whole-stage
    codegen (no UDF). Filtered to a deterministic key subset to keep
    the oracle output small."""
    t = tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return t.orders.where(k % 97 == 0).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(15)).cast("long").alias("with_flags"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("toggled"),
        F.bit_count(k.cast("long")).alias("popcount"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
    )


@register(
    "q_fn_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
             CAST(doc_id % 7 AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https?://([^/]+)', 1)  AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1)  AS lang_param
    FROM urls
    """,
    tags=("batch", "function", "text"),
)
def q_fn_url(spark, sf_dir):
    """H-ext: URL parsing — host / path / query-parameter extraction,
    the first step of web-corpus curation (domain blocklists, per-site
    dedup, crawl-source stats). Spark side uses the native ``parse_url``
    (JVM, codegen-friendly); the oracle re-derives the same parts with
    anchored regexes. URLs are synthesized deterministically from
    document attributes (the corpus itself carries none), which also
    pins the parse_url ↔ regex semantics to the same strings."""
    t = tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    d = t.documents.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity / 10.0), 6)                 AS sin_q,
           round(cos(l_discount * 3.141592653589793), 6)    AS cos_d,
           round(atan2(l_tax, l_discount + 0.01), 6)        AS heading,
           round(degrees(atan2(l_tax, l_discount + 0.01)), 4) AS heading_deg,
           round(radians(l_quantity), 6)                    AS rad_q
    FROM lineitem
    WHERE l_orderkey % 191 = 0
    """,
    tags=("batch", "function"),
)
def q_fn_trig(spark, sf_dir):
    """H-ext: trigonometric family — sin/cos/atan2/degrees/radians, the
    building blocks of geo math (haversine), cyclical time-of-day
    feature encodings, and signal work. All JVM intrinsics inside
    whole-stage codegen; both engines evaluate IEEE doubles with libm
    semantics, aligned by the 6-decimal round. Deterministic key subset
    keeps the oracle output small."""
    t = tables(spark, sf_dir)
    return t.lineitem.where(F.col("l_orderkey") % 191 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(F.col("l_quantity") / 10.0), 6).alias("sin_q"),
        F.round(F.cos(F.col("l_discount") * 3.141592653589793), 6).alias("cos_d"),
        F.round(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01), 6).alias(
            "heading"
        ),
        F.round(
            F.degrees(F.atan2(F.col("l_tax"), F.col("l_discount") + 0.01)), 4
        ).alias("heading_deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
    )


@register(
    "q_fn_string_extended",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')    AS padded_key,
           split_part(c_name, '#', 2)                   AS name_num,
           strpos(c_name, '#')                          AS hash_pos,
           reverse(c_mktsegment)                        AS seg_rev,
           translate(c_name, '#', '-')                  AS name_dashed,
           repeat(left(c_mktsegment, 1), 3)             AS seg_initials,
           right(c_name, 4)                             AS name_tail
    FROM customer
    """,
    tags=("batch", "function"),
)
def q_fn_string_extended(spark, sf_dir):
    """H1b: the second string-function tier — padding, field splitting,
    position search, reversal, character translation, repetition, and
    edge slicing: the ETL-normalization vocabulary beyond H1's
    substr/concat/trim basics. All JVM-side built-ins inside
    whole-stage codegen; each maps 1:1 to an ANSI/DuckDB function
    (instr→strpos being the one rename).

    Scale shape: pure per-row projection — no shuffle, fully
    pushdown-compatible, reads only the 4 referenced columns."""
    t = tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias(
            "padded_key"
        ),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias(
            "name_num"
        ),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.translate(F.col("c_name"), "#", "-").alias("name_dashed"),
        F.repeat(F.substring(F.col("c_mktsegment"), 1, 1), 3).alias(
            "seg_initials"
        ),
        F.substring(F.col("c_name"), -4, 4).alias("name_tail"),
    )
