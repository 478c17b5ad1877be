"""Scalar function coverage: string / date / math / conditional / JSON.

The reference's scalar surface is a single TIMESTAMP_SUB in BigQuery SQL
(``verifica_carga_slmandicprd.py:77``). Here each family is exercised as a
whole-stage-codegen-friendly projection (no UDFs — everything stays JVM-side,
SURVEY.md §4) and paired with the exact DuckDB equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


@register(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           length(p_name)                                  AS name_len,
           substr(p_name, 1, 5)                            AS name_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           replace(p_type, 'A', '_')                       AS type_repl,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_pad,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END   AS has_a,
           trim('  ' || p_brand || ' ')                    AS trimmed
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string-functions"),
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part (all JVM built-ins, codegen'd)."""
    (pt,) = _t(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", "A", "_").alias("type_repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    ).orderBy("p_partkey")


@register(
    "scalar_date_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                    AS yr,
           month(o_orderdate)                                   AS mo,
           day(o_orderdate)                                     AS dy,
           quarter(o_orderdate)                                 AS qtr,
           isodow(o_orderdate)                                  AS iso_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS plus_30d,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_2000
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "date-functions"),
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction, truncation, interval arithmetic, diffs."""
    (od,) = _t(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dy"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus_30d"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), "o_orderdate")
        .cast("bigint")
        .alias("days_to_2000"),
    ).orderBy("o_orderkey")


@register(
    "scalar_math_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)        AS abs_disc_diff,
           CAST(ceil(l_quantity / 7) AS BIGINT)       AS qty_ceil7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           round(sqrt(l_extendedprice), 4)         AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)       AS price_ln,
           round(log10(l_extendedprice + 1), 6)    AS price_log10,
           round(pow(1 + l_tax, 2), 6)             AS tax_sq,
           CAST(l_partkey % 16 AS BIGINT)          AS part_bucket,
           CAST(sign(l_discount - 0.05) AS BIGINT)    AS disc_sign,
           round(greatest(l_discount, l_tax), 2)   AS max_rate,
           round(least(l_discount, l_tax), 2)      AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math-functions"),
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (abs/ceil/floor/sqrt/ln/log10/pow/mod/sign/least/greatest)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc_diff"),
            F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
            F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
            F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
            (F.col("l_partkey") % 16).alias("part_bucket"),
            F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
            F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
            F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_json_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band,
           coalesce(nullif(event_type, 'error'), 'ERR') AS etype_clean
    FROM events
    ORDER BY event_id
    """,
    tags=("scalar", "json-functions", "conditional"),
)
def scalar_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props + conditional scalars
    (the events table's props column exercises semi-structured access)."""
    (ev,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias(
            "etype_clean"
        ),
    ).orderBy("event_id")


@register(
    "arrays_posexplode_leading_tokens",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    idx AS (SELECT unnest([1, 2, 3]) AS i)
    SELECT p.doc_id,
           CAST(x.i - 1 AS BIGINT) AS pos,
           p.toks[x.i] AS token
    FROM parts p JOIN idx x ON x.i <= len(p.toks)
    ORDER BY p.doc_id, pos
    """,
    tags=("arrays", "explode", "lateral", "udtf"),
)
def arrays_posexplode_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function: ``posexplode`` (lateral-view style) flattens
    each document's token array to (position, token) rows, keeping the first
    three. The early positional filter lands right above the generator, so the
    row explosion never exceeds 3x the input regardless of document length."""
    (dc,) = _t(spark, sf_dir, "documents")
    return (
        dc.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .where(F.col("pos") < 3)
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "token")
        .orderBy("doc_id", "pos")
    )


@register(
    "nested_json_shred",
    oracle="""
    SELECT l_orderkey AS id,
           o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_quantity), 2) AS qty_sum
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey <= 200
    GROUP BY 1, 2
    ORDER BY id
    """,
    tags=("json-functions", "nested", "from_json", "to_json", "arrays"),
)
def nested_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested semi-structured round trip: per-order JSON documents with a
    nested struct + array-of-structs are BUILT (collect_list -> to_json),
    then SHREDDED back (from_json with an explicit schema — the
    streaming-safe form, no schema inference) and re-aggregated with
    higher-order functions over the parsed array. The oracle computes the
    same result relationally, so parity proves the JSON round trip is
    lossless — the ingest shape for API/event payloads landing as JSON
    strings. All JVM-side: json codecs and the array fold stay in codegen."""
    li, od = _t(spark, sf_dir, "lineitem", "orders")
    nested = (
        li.where(F.col("l_orderkey") <= 200)
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("lines")
        )
        .join(od.select("o_orderkey", "o_orderstatus"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.col("o_orderkey").alias("id"),
                        F.col("o_orderstatus").alias("status"),
                    ).alias("order"),
                    F.col("lines"),
                )
            ).alias("doc")
        )
    )
    schema = (
        "STRUCT<`order`: STRUCT<id: BIGINT, status: STRING>, "
        "lines: ARRAY<STRUCT<ln: INT, qty: DOUBLE>>>"
    )
    parsed = nested.select(F.from_json("doc", schema).alias("p"))
    return (
        parsed.select(
            F.col("p.order.id").alias("id"),
            F.col("p.order.status").alias("status"),
            F.size("p.lines").cast("bigint").alias("n_lines"),
            F.round(
                F.aggregate(
                    "p.lines", F.lit(0.0), lambda acc, x: acc + x["qty"]
                ),
                2,
            ).alias("qty_sum"),
        )
        .orderBy("id")
    )


@register(
    "variant_props_events",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    WHERE json_valid(props)
    GROUP BY 1
    ORDER BY k_mod
    """,
    tags=("variant", "semi-structured", "spark4", "groupby-agg"),
)
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` shreds the props JSON into the
    binary variant encoding once, ``variant_get`` then extracts typed paths
    without re-parsing — the engine-native semi-structured column (vs
    ``get_json_object``'s string re-parse per access, see
    ``scalar_json_events``). ``try_parse_json`` nulls malformed documents
    instead of failing the scan — the ingest-safe default."""
    (ev,) = _t(spark, sf_dir, "events")
    v = F.expr("try_parse_json(props)")
    k = F.expr("variant_get(try_parse_json(props), '$.k', 'bigint')")
    return (
        ev.select(v.alias("var"), k.alias("k"))
        .where(F.col("var").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("k_mod")
    )


@register(
    "arrays_setops_adjacent_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(string_split(lower(text), ' ')) AS tset
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.tset AS ta, b.tset AS tb
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(ta, tb)) AS BIGINT) AS n_common,
           CAST(len(list_distinct(list_concat(ta, tb))) AS BIGINT) AS n_union,
           round(len(list_intersect(ta, tb))::DOUBLE
                 / len(list_distinct(list_concat(ta, tb))), 6) AS jaccard,
           (len(list_filter(ta, x -> list_contains(tb, x))) > 0) AS any_shared,
           (len(list_filter(ta, x -> NOT list_contains(tb, x))) = 0) AS all_shared
    FROM pairs
    ORDER BY doc_a
    """,
    tags=("arrays", "set-ops", "higher-order", "documents"),
)
def arrays_setops_adjacent_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra + higher-order predicates, row-wise and JVM-side:
    token-set intersect/union/Jaccard between adjacent same-language docs,
    plus ``exists``/``forall`` membership tests — the per-row (non-shuffle)
    complement of the inverted-index dedup family."""
    (dc,) = _t(spark, sf_dir, "documents")
    toks = dc.select(
        "doc_id",
        "lang",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("tset"),
    )
    a = toks.alias("a")
    b = toks.select(
        (F.col("doc_id") - 1).alias("join_id"), F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"), F.col("tset").alias("tb"),
    ).alias("b")
    inter = F.array_intersect("tset", "tb")
    union = F.array_distinct(F.concat("tset", "tb"))
    return (
        a.join(b, (F.col("doc_id") == F.col("join_id")) & (F.col("lang") == F.col("lang_b")))
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.size(inter).cast("bigint").alias("n_common"),
            F.size(union).cast("bigint").alias("n_union"),
            F.round(F.size(inter).cast("double") / F.size(union), 6).alias("jaccard"),
            F.exists("tset", lambda x: F.array_contains("tb", x)).alias("any_shared"),
            F.forall("tset", lambda x: F.array_contains("tb", x)).alias("all_shared"),
        )
        .orderBy("doc_a")
    )
