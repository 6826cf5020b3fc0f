"""Scalar-function surface (SURVEY §2.B scalar rows): string, regex,
date/time, epoch-micros conversions (the reference's load-bearing
timestamp semantic, SURVEY §1.2), JSON extraction (the core of the
reference's consumer, consumer.py:53-55), math, conditionals, and the
distinct-values probe (reference O7, consumer.py:69).

All expressions are JVM-side Catalyst built-ins — whole-stage-codegen
eligible, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table
from . import register

_STR_ORACLE = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_type, ' ', '_') AS type_snake,
       reverse(p_brand) AS brand_rev
FROM part
"""


@register("scalar_string_functions", oracle=_STR_ORACLE, tags=("scalar", "string"))
def scalar_string_functions(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
    )


_REGEX_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_type, '^([A-Za-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
       CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END AS starts_lower_word
FROM part
"""


@register("scalar_regex_functions", oracle=_REGEX_ORACLE, tags=("scalar", "regex"))
def scalar_regex_functions(spark, sf_dir):
    """Regex family — patterns restricted to the RE2/Java-common subset."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.when(F.col("p_name").rlike("^[a-z]+ "), F.lit(1))
        .otherwise(F.lit(0))
        .alias("starts_lower_word"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       quarter(o_orderdate) AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
       dayofweek(o_orderdate) + 1 AS dow
FROM orders
"""


@register("scalar_date_functions", oracle=_DATE_ORACLE, tags=("scalar", "datetime"))
def scalar_date_functions(spark, sf_dir):
    """Date/time family. Note dow convention differs (Spark: 1=Sunday;
    DuckDB: 0=Sunday) — the oracle normalizes with +1."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias("days_to_eoy"),
        F.dayofweek(d).alias("dow"),
    )


_EPOCH_ORACLE = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       epoch_us(ts) // 1000 AS ts_ms,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
FROM events
"""


@register("scalar_epoch_micros_roundtrip", oracle=_EPOCH_ORACLE, tags=("scalar", "datetime", "cdc"))
def scalar_epoch_micros_roundtrip(spark, sf_dir):
    """The reference's micros-since-epoch convention (Debezium
    MicroTimestamp, SURVEY §1.2): long <-> timestamp round-trip,
    truncation, formatting. Golden test: 1713192083639740 <->
    2024-04-15T14:41:23.639740Z (tests/test_cdc_apply.py)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.expr("ts DIV 1000")
    tstamp = F.timestamp_micros(us)
    return ev.select(
        "event_id",
        us.alias("ts_us"),
        F.expr("ts DIV 1000000").cast("long").alias("ts_ms_wrong_name"),
        F.date_format(tstamp, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.date_format(F.date_trunc("hour", tstamp), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        ),
    ).withColumnRenamed("ts_ms_wrong_name", "ts_ms")


_JSON_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_val
FROM events
"""


@register("scalar_json_extraction", oracle=_JSON_ORACLE, tags=("scalar", "json", "cdc"))
def scalar_json_extraction(spark, sf_dir):
    """JSON path extraction — the core of the reference consumer
    (get_json_object on $.payload.*, consumer.py:53-55), both the
    string-preserving form and the typed from_json upgrade."""
    ev = load_table(spark, sf_dir, "events")
    typed = F.from_json(
        F.col("props"), T.StructType([T.StructField("k", T.IntegerType())])
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        typed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(round(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(4,2)), 2) AS DOUBLE) AS disc_amount,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor7,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       sqrt(l_quantity) AS qty_sqrt,
       l_orderkey % 7 AS key_mod7,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       CAST(sign(l_discount - l_tax) AS INTEGER) AS rate_sign
FROM lineitem
"""


@register("scalar_math_functions", oracle=_MATH_ORACLE, tags=("scalar", "math"))
def scalar_math_functions(spark, sf_dir):
    """Math family. Only IEEE-deterministic ops (sqrt, round, abs,
    floor/ceil, mod) — no libm-divergent transcendentals in
    oracle-checked output."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice").cast("decimal(15,2)")
            * F.col("l_discount").cast("decimal(4,2)"),
            2,
        )
        .cast("double")
        .alias("disc_amount"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("qty_floor7"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qty_ceil7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).cast("int").alias("rate_sign"),
    )


_COND_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debtor'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
       CASE WHEN c_nationkey IN (1, 2, 3) THEN 1 ELSE 0 END AS in_focus_nations,
       CASE WHEN c_name LIKE '%0001%' THEN 1 ELSE 0 END AS name_has_0001,
       CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null,
       CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 1 ELSE 0 END AS bal_0_1000
FROM customer
"""


@register("scalar_conditionals_predicates", oracle=_COND_ORACLE, tags=("scalar", "predicate"))
def scalar_conditionals_predicates(spark, sf_dir):
    """CASE/coalesce/nullif plus the predicate family the engine exposes
    (IN, LIKE, IS NULL, BETWEEN, boolean composition) — SURVEY §2.B
    projection/filter row."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.when(bal < 0, "debtor")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT"))
        .alias("seg_or_default"),
        F.when(F.col("c_nationkey").isin(1, 2, 3), 1).otherwise(0).alias("in_focus_nations"),
        F.when(F.col("c_name").like("%0001%"), 1).otherwise(0).alias("name_has_0001"),
        F.when(bal.isNull(), 1).otherwise(0).alias("bal_is_null"),
        F.when(bal.between(0, 1000), 1).otherwise(0).alias("bal_0_1000"),
    )


_DISTINCT_ORACLE = """
SELECT DISTINCT event_type FROM events
"""


@register("distinct_event_types", oracle=_DISTINCT_ORACLE, tags=("distinct",))
def distinct_event_types(spark, sf_dir):
    """The reference's topic-discovery probe (distinct + collect,
    consumer.py:69) minus the legacy .rdd round-trip — a plain distinct
    the driver materializes."""
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


_ARRAY_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5_vocab
FROM documents
"""


@register("scalar_array_functions", oracle=_ARRAY_ORACLE, tags=("scalar", "array", "text"))
def scalar_array_functions(spark, sf_dir):
    """Array family (split / distinct / sort / slice / join) over document
    text — also the tokenization primitive the text-analysis operators
    build on."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_vocab"
        ),
    )


# ---------------------------------------------------------------------------
# Data profiling: per-column stats in ONE scan (unpivoted)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

_PROFILE_ORACLE = """
SELECT 'l_orderkey' AS column_name, CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(l_orderkey) AS VARCHAR) AS max_val,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
FROM lineitem
UNION ALL
SELECT 'l_quantity', CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR),
       CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR),
       CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'), strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S'),
       CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""


@register("profile_lineitem_columns", oracle=_PROFILE_ORACLE, tags=("agg", "profiling"))
def profile_lineitem_columns(spark, sf_dir):
    """Data profiling: min/max/exact-NDV/null-count for N columns in a
    SINGLE scan + aggregate (one job, 4N agg expressions), unpivoted to
    one row per column. The one-pass form is what profiling 100 TB
    permits — per-column loops re-scan the table N times. Timestamps are
    formatted (not raw cast) so both engines print identically."""
    li = load_table(spark, sf_dir, "lineitem")

    def fmt(c):
        col = F.col(c)
        if c == "l_shipdate":
            return lambda agg: F.date_format(agg(col), "yyyy-MM-dd HH:mm:ss")
        return lambda agg: agg(col).cast("string")

    aggs, pieces = [], []
    for c in _PROFILE_COLS:
        f = fmt(c)
        aggs += [
            f(F.min).alias(f"{c}__min"),
            f(F.max).alias(f"{c}__max"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
        ]
        pieces.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__nulls").alias("n_nulls"),
            )
        )
    return (
        li.agg(*aggs)
        .select(F.explode(F.array(*pieces)).alias("p"))
        .select("p.column_name", "p.min_val", "p.max_val", "p.n_distinct", "p.n_nulls")
    )


# ---------------------------------------------------------------------------
# Map functions: build/lookup/transform (outputs scalarized for parity)
# ---------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT r_regionkey,
       r_name AS k1,
       CAST(r_regionkey * 10 AS BIGINT) AS v1,
       2 AS map_size,
       CAST(r_regionkey * 10 + 1 AS BIGINT) AS bumped
FROM region
"""


@register("scalar_map_functions", oracle=_MAP_ORACLE, tags=("scalar", "map"))
def scalar_map_functions(spark, sf_dir):
    """MapType surface: map_from_arrays -> element_at / map_keys /
    size / transform_values. Outputs are scalarized (the oracle computes
    the same values map-free) because map cells do not compare cleanly
    across engines — the point is the Spark map ops run and agree."""
    region = load_table(spark, sf_dir, "region")
    m = F.map_from_arrays(
        F.array(F.col("r_name"), F.lit("twice")),
        F.array(
            (F.col("r_regionkey") * 10).cast("long"),
            (F.col("r_regionkey") * 20).cast("long"),
        ),
    )
    with_m = region.select("r_regionkey", "r_name", m.alias("m"))
    bumped = F.transform_values(F.col("m"), lambda k, v: v + 1)
    return with_m.select(
        "r_regionkey",
        F.element_at(F.map_keys("m"), 1).alias("k1"),
        F.element_at(F.col("m"), F.col("r_name")).alias("v1"),
        F.size("m").alias("map_size"),
        F.element_at(bumped, F.col("r_name")).alias("bumped"),
    )


_HASH_ORACLE = """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       base64(encode(c_name)) AS name_b64,
       decode(from_base64(base64(encode(c_name)))) AS roundtrip
FROM customer
WHERE c_custkey <= 100
"""


@register("scalar_hash_functions", oracle=_HASH_ORACLE, tags=("scalar", "hash"))
def scalar_hash_functions(spark, sf_dir):
    """Cryptographic digests + base64 codec (content addressing,
    fingerprints, cache keys). md5/sha256/base64 are bit-identical
    across engines — the property the dedup fingerprints and the
    deterministic split/sample operators build on."""
    c = load_table(spark, sf_dir, "customer").filter("c_custkey <= 100")
    b64 = F.base64(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        b64.alias("name_b64"),
        F.unbase64(b64).cast("string").alias("roundtrip"),
    )


# ---------------------------------------------------------------------------
# Bitwise / binary-integer functions (round 5)
# ---------------------------------------------------------------------------

_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS set_bit,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2 AS shifted_l,
       o_orderkey >> 3 AS shifted_r,
       CAST(bit_count(o_orderkey) AS INT) AS popcount,
       CAST(bit_count(xor(o_orderkey, o_custkey)) AS INT) AS hamming_to_cust
FROM orders WHERE o_orderkey % 97 = 0
"""


@register("scalar_bitwise_functions", oracle=_BITWISE_ORACLE, tags=("scalar", "bitwise"))
def scalar_bitwise_functions(spark, sf_dir):
    """Bitwise scalar surface: AND/OR/XOR, shifts, popcount, and the
    Hamming distance between two key columns — the primitives the
    SimHash banding and Morton/Z-order operators are built from
    (operators/dedup.py:simhash, operators/scale.py:zorder_by),
    exposed as a first-class query. Pure map-side expressions inside
    whole-stage codegen; the filter prunes at the scan."""
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 97 = 0")
    x = F.expr("o_orderkey ^ o_custkey")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 4096").alias("set_bit"),
        x.alias("key_xor"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shifted_l"),
        F.expr("shiftright(o_orderkey, 3)").alias("shifted_r"),
        F.bit_count("o_orderkey").alias("popcount"),
        F.bit_count(x).alias("hamming_to_cust"),
    )


# ---------------------------------------------------------------------------
# Interval / calendar arithmetic (round 5)
# ---------------------------------------------------------------------------

_INTERVAL_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
       strftime(o_orderdate - INTERVAL 90 DAY, '%Y-%m-%d') AS minus_90d,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', o_orderdate, DATE '1998-12-01') AS BIGINT) AS days_to_close,
       CAST(datepart('quarter', o_orderdate) AS INT) AS qtr,
       CAST(datepart('dayofweek', o_orderdate) AS INT) AS dow
FROM orders WHERE o_orderkey % 101 = 0
"""


@register("scalar_interval_arithmetic", oracle=_INTERVAL_ORACLE, tags=("scalar", "datetime"))
def scalar_interval_arithmetic(spark, sf_dir):
    """Calendar/interval arithmetic beyond the epoch-micros surface:
    month-safe addition (add_months, not day-86400 math), day offsets,
    month boundaries, day-difference to a fixed close date, quarter and
    day-of-week extraction — the retention/cohort date algebra. All
    map-side; dates emitted as formatted strings (the cross-engine date
    convention tables.py documents). DuckDB dayofweek is 0=Sunday;
    Spark dayofweek is 1=Sunday — normalized to DuckDB's 0-based form."""
    o = load_table(spark, sf_dir, "orders").filter("o_orderkey % 101 = 0")
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd")
    return o.select(
        "o_orderkey",
        fmt(F.add_months("o_orderdate", 3)).alias("plus_3m"),
        fmt(F.date_sub("o_orderdate", 90)).alias("minus_90d"),
        fmt(F.last_day("o_orderdate")).alias("month_end"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_close"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    )


_STRUCT_ORACLE = """
SELECT o_orderkey,
       struct_pack(status := o_orderstatus, pri := o_orderpriority).status AS s_status,
       struct_pack(status := o_orderstatus, pri := o_orderpriority).pri AS s_pri,
       struct_pack(outer_k := o_orderkey,
                   inner_s := struct_pack(c := o_custkey, p := o_totalprice)
                  ).inner_s.c AS nested_custkey,
       ((o_orderstatus, o_orderpriority) < ('O', '3-MEDIUM')) AS lt_mark,
       list_sort([struct_pack(f1 := CAST(o_custkey % 7 + 1 AS INTEGER), f2 := 'modkey'),
                  struct_pack(f1 := CAST(length(o_orderpriority) AS INTEGER), f2 := 'prilen')
                 ])[1].f2 AS min_tag
FROM orders
"""


@register("scalar_struct_functions", oracle=_STRUCT_ORACLE, tags=("scalar",))
def scalar_struct_functions(spark, sf_dir):
    """Struct/row scalar surface: construction (named_struct), field
    access, NESTED struct traversal, lexicographic struct comparison
    (field order = comparison order in both engines), and sorting an
    array of structs (array_sort's lexicographic row ordering) with
    positional field extraction. Output columns are plain scalars, so
    the cross-engine struct representations never reach the comparator.
    All Catalyst built-ins — whole-stage codegen, no shuffle beyond the
    scan."""
    o = load_table(spark, sf_dir, "orders")
    s = F.named_struct(
        F.lit("status"), F.col("o_orderstatus"), F.lit("pri"), F.col("o_orderpriority")
    )
    nested = F.named_struct(
        F.lit("outer_k"),
        F.col("o_orderkey"),
        F.lit("inner_s"),
        F.named_struct(F.lit("c"), F.col("o_custkey"), F.lit("p"), F.col("o_totalprice")),
    )
    arr = F.array_sort(
        F.array(
            F.struct(
                (F.col("o_custkey") % 7 + 1).cast("int").alias("f1"),
                F.lit("modkey").alias("f2"),
            ),
            F.struct(
                F.length("o_orderpriority").cast("int").alias("f1"),
                F.lit("prilen").alias("f2"),
            ),
        )
    )
    mark = F.struct(F.lit("O").alias("a"), F.lit("3-MEDIUM").alias("b"))
    pair = F.struct(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    )
    return o.select(
        "o_orderkey",
        s.getField("status").alias("s_status"),
        s.getField("pri").alias("s_pri"),
        nested.getField("inner_s").getField("c").alias("nested_custkey"),
        (pair < mark).alias("lt_mark"),
        arr.getItem(0).getField("f2").alias("min_tag"),
    )


# ---------------------------------------------------------------------------
# Round-6: IPv4 / CIDR arithmetic (web-corpus provenance analytics).
# ---------------------------------------------------------------------------

_IP_ORACLE = """
WITH ip AS (
  SELECT CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
           AS ip32
  FROM customer
), o AS (
  SELECT ip32,
         ip32 // 16777216 AS o1,
         (ip32 // 65536) % 256 AS o2,
         (ip32 // 256) % 256 AS o3,
         ip32 % 256 AS o4
  FROM ip
), c AS (
  SELECT *,
         (o1 = 10) OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
           OR (o1 = 192 AND o2 = 168) AS is_private
  FROM o
)
SELECT CAST(o1 AS BIGINT) AS first_octet,
       CAST(COUNT(*) AS BIGINT) AS n_ips,
       CAST(COUNT(DISTINCT o1 * 256 + o2) AS BIGINT) AS n_slash16,
       CAST(count_if(is_private) AS BIGINT) AS n_private,
       CAST(MIN(ip32) AS BIGINT) AS min_ip32,
       MIN(CASE WHEN ip32 = m THEN dotted END) AS min_ip_dotted
FROM (
  SELECT c.*, MIN(ip32) OVER (PARTITION BY o1) AS m,
         CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
           || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS dotted
  FROM c
)
GROUP BY o1
"""


@register("scalar_ip_cidr_functions", oracle=_IP_ORACLE, tags=("scalar",))
def scalar_ip_cidr_functions(spark, sf_dir):
    """IPv4 / CIDR arithmetic over a deterministic md5-derived address
    per customer (the fixture carries no IP column; the derivation is
    part of the query, computed identically in both engines — the
    jittered-arrival precedent): octet extraction by integer shifts,
    dotted-quad rendering, RFC-1918 private classification, /16 prefix
    cardinality — the provenance rollup a web-corpus pipeline runs per
    crawl. Pure integer div/mod + string concat, one first-octet
    rollup."""
    cust = load_table(spark, sf_dir, "customer")
    ip = cust.select(
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("ip32")
    )
    o = ip.select(
        "ip32",
        (F.col("ip32") / 16777216).cast("long").alias("o1"),
        ((F.col("ip32") / 65536).cast("long") % 256).alias("o2"),
        ((F.col("ip32") / 256).cast("long") % 256).alias("o3"),
        (F.col("ip32") % 256).alias("o4"),
    )
    c = o.withColumn(
        "is_private",
        (F.col("o1") == 10)
        | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
        | ((F.col("o1") == 192) & (F.col("o2") == 168)),
    ).withColumn(
        "dotted",
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.col("o4").cast("string"),
        ),
    )
    from pyspark.sql import Window as W

    m = c.withColumn("m", F.min("ip32").over(W.partitionBy("o1")))
    return m.groupBy(F.col("o1").alias("first_octet")).agg(
        F.count(F.lit(1)).alias("n_ips"),
        F.countDistinct(F.col("o1") * 256 + F.col("o2")).alias("n_slash16"),
        F.count(F.when(F.col("is_private"), 1)).alias("n_private"),
        F.min("ip32").alias("min_ip32"),
        F.min(F.when(F.col("ip32") == F.col("m"), F.col("dotted"))).alias(
            "min_ip_dotted"
        ),
    )


# ---------------------------------------------------------------------------
# Round-6: great-circle (haversine) distance.
# ---------------------------------------------------------------------------

_HAVERSINE_ORACLE = """
WITH geo AS (
  SELECT n_nationkey, n_name, n_regionkey,
         (CAST(('0x' || substring(md5('lat:' || CAST(n_nationkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 140000000) / 1000000.0 - 70.0 AS lat,
         (CAST(('0x' || substring(md5('lon:' || CAST(n_nationkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 360000000) / 1000000.0 - 180.0 AS lon
  FROM nation
)
SELECT a.n_name AS nation_a, b.n_name AS nation_b,
       round(2 * 6371.0088 * asin(sqrt(
         pow(sin(radians(b.lat - a.lat) / 2), 2)
         + cos(radians(a.lat)) * cos(radians(b.lat))
           * pow(sin(radians(b.lon - a.lon) / 2), 2)
       )), 3) AS km
FROM geo a JOIN geo b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
"""


@register("scalar_haversine_distance", oracle=_HAVERSINE_ORACLE, tags=("scalar", "geo"))
def scalar_haversine_distance(spark, sf_dir):
    """Great-circle (haversine) distance between same-region nation
    pairs over deterministic md5-derived coordinates (the fixture has
    no geo columns; the derivation is part of the query, identical in
    both engines) — the geo-distance primitive of store-radius /
    shipping analytics. One region-keyed self equi-join over the tiny
    dim; the distance is a single trig expression per pair (sin/cos/
    asin/radians — identical IEEE sequences), rounded to meters."""
    nat = load_table(spark, sf_dir, "nation")
    geo = nat.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("lat:"), F.col("n_nationkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 140000000
            / 1000000.0
            - 70.0
        ).alias("lat"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("lon:"), F.col("n_nationkey").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 360000000
            / 1000000.0
            - 180.0
        ).alias("lon"),
    )
    a = geo.select(
        F.col("n_regionkey").alias("rk"),
        F.col("n_nationkey").alias("ka"),
        F.col("n_name").alias("nation_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = geo.select(
        F.col("n_regionkey").alias("rk"),
        F.col("n_nationkey").alias("kb"),
        F.col("n_name").alias("nation_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    hav = (
        F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
        + F.cos(F.radians("lat_a"))
        * F.cos(F.radians("lat_b"))
        * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
    )
    return (
        a.join(b, "rk")
        .filter(F.col("ka") < F.col("kb"))
        .select(
            "nation_a",
            "nation_b",
            F.round(2 * 6371.0088 * F.asin(F.sqrt(hav)), 3).alias("km"),
        )
    )


# ---------------------------------------------------------------------------
# Round-6: VARIANT semi-structured type (Spark 4).
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(count_if(json_extract(props, '$.missing') IS NULL) AS BIGINT)
         AS n_missing_null,
       TRUE AS schema_ok
FROM events GROUP BY event_type
"""


@register("scalar_variant_functions", oracle=_VARIANT_ORACLE, tags=("scalar", "variant"))
def scalar_variant_functions(spark, sf_dir):
    """Spark 4 VARIANT semi-structured type over the events props JSON:
    parse_json -> typed variant_get extraction, try_variant_get on an
    absent path (NULL, not error), and an in-engine schema_of_variant
    contract (the schema string itself is engine-specific, so the
    ORACLED column is the all-rows-match flag — the
    approx-count-distinct contract pattern). VARIANT is the
    shredded-JSON scale path: at 100 TB a parsed-once VARIANT column
    replaces per-query get_json_object re-parsing."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("parse_json(props)").alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'long')").alias("missing"),
        (F.expr("schema_of_variant(v)") == F.lit("OBJECT<k: BIGINT>")).alias(
            "schema_match"
        ),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("k_sum"),
        F.max("k").alias("k_max"),
        F.count(F.when(F.col("missing").isNull(), 1)).alias("n_missing_null"),
        F.bool_and("schema_match").alias("schema_ok"),
    )


# ---------------------------------------------------------------------------
# Round-6: generator functions (explode/posexplode_outer/inline/stack).
# ---------------------------------------------------------------------------

_GENERATOR_ORACLE = """
WITH t AS (
  SELECT n_nationkey, n_name, string_split(n_name, ' ') AS toks FROM nation
), pos AS (
  SELECT n_nationkey, s.i - 1 AS tok_pos, toks[s.i] AS tok
  FROM t, LATERAL unnest(generate_series(1, len(toks))) AS s(i)
), outer_part AS (
  -- posexplode_outer: nations with NO multi-word name still emit one
  -- NULL-position row (LEFT JOIN against the >=2-token explosion)
  SELECT t.n_nationkey,
         CAST(p.tok_pos AS BIGINT) AS tok_pos, p.tok
  FROM t LEFT JOIN (SELECT * FROM pos WHERE tok_pos >= 1) p
    ON p.n_nationkey = t.n_nationkey
), stacked AS (
  SELECT n_nationkey, 'name_len' AS metric, CAST(length(n_name) AS BIGINT) AS v
  FROM t
  UNION ALL
  SELECT n_nationkey, 'n_tokens', CAST(len(toks) AS BIGINT) FROM t
)
SELECT o.n_nationkey,
       CAST(COUNT(o.tok) AS BIGINT) AS n_extra_tokens,
       CAST(MIN(o.tok_pos) AS BIGINT) AS first_extra_pos,
       CAST(MAX(s1.v) AS BIGINT) AS name_len,
       CAST(MAX(s2.v) AS BIGINT) AS n_tokens
FROM outer_part o
JOIN stacked s1 ON s1.n_nationkey = o.n_nationkey AND s1.metric = 'name_len'
JOIN stacked s2 ON s2.n_nationkey = o.n_nationkey AND s2.metric = 'n_tokens'
GROUP BY o.n_nationkey
"""


@register("scalar_generator_functions", oracle=_GENERATOR_ORACLE, tags=("scalar", "generator"))
def scalar_generator_functions(spark, sf_dir):
    """Generator-function surface: posexplode_OUTER (rows with nothing
    to explode survive as NULL rows — the left-join semantic plain
    explode silently drops), plus stack() wide→long unpivot, rolled
    back up per nation so the output is generator-shape-sensitive but
    compact. The oracle spells the outer/inner distinction explicitly
    as a LEFT JOIN."""
    nat = load_table(spark, sf_dir, "nation")
    t = nat.select(
        "n_nationkey", "n_name", F.split("n_name", " ").alias("toks")
    )
    outer_part = t.select(
        "n_nationkey",
        F.posexplode_outer(F.expr("slice(toks, 2, size(toks))")).alias(
            "p0", "tok"
        ),
    ).select(
        "n_nationkey",
        (F.col("p0") + 1).cast("long").alias("tok_pos"),
        "tok",
    )
    stacked = t.select(
        "n_nationkey",
        F.expr(
            "stack(2, 'name_len', CAST(length(n_name) AS LONG),"
            " 'n_tokens', CAST(size(toks) AS LONG)) AS (metric, v)"
        ),
    )
    s1 = stacked.filter("metric = 'name_len'").select(
        "n_nationkey", F.col("v").alias("name_len")
    )
    s2 = stacked.filter("metric = 'n_tokens'").select(
        "n_nationkey", F.col("v").alias("n_tokens")
    )
    return (
        outer_part.groupBy("n_nationkey")
        .agg(
            F.count("tok").alias("n_extra_tokens"),
            F.min("tok_pos").alias("first_extra_pos"),
        )
        .join(F.broadcast(s1), "n_nationkey")
        .join(F.broadcast(s2), "n_nationkey")
        .select(
            "n_nationkey", "n_extra_tokens", "first_extra_pos", "name_len", "n_tokens"
        )
    )


_B64_ORACLE = """
SELECT n_name,
       base64(CAST(n_name AS BLOB)) AS b64,
       CAST(length(base64(CAST(n_name AS BLOB))) AS BIGINT) AS b64_len,
       CAST(CAST(from_base64(base64(CAST(n_name AS BLOB))) AS VARCHAR)
            = n_name AS BOOLEAN) AS roundtrip_ok
FROM nation
"""


@register("scalar_base64_functions", oracle=_B64_ORACLE, tags=("scalar",))
def scalar_base64_functions(spark, sf_dir):
    """Base64 encode/decode scalar surface (RFC 4648 standard alphabet
    in both engines): encode, padded length ((n+2) DIV 3 * 4 — visible
    in b64_len), and an in-engine decode roundtrip flag. The binary-
    payload transport codec the multimodal columns use at the
    boundary."""
    nat = load_table(spark, sf_dir, "nation").select("n_name")
    b64 = F.base64(F.col("n_name").cast("binary"))
    return nat.select(
        "n_name",
        b64.alias("b64"),
        F.length(b64).cast("long").alias("b64_len"),
        (F.unbase64(b64).cast("string") == F.col("n_name")).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Round-7: XML functions (Spark 4 built-in XML support).
# ---------------------------------------------------------------------------

_XML_ORACLE = """
WITH x AS (
  SELECT s_nationkey,
         '<s><id>' || s_suppkey || '</id><nk>' || s_nationkey
           || '</nk><name>' || s_name || '</name></s>' AS doc,
         s_suppkey, s_name
  FROM supplier
), p AS (
  -- the oracle re-extracts THROUGH the XML string (regex, an
  -- independent parser), not from the raw columns, so a Spark-side
  -- parse defect cannot cancel out
  SELECT s_nationkey,
         CAST(regexp_extract(doc, '<id>([0-9]+)</id>', 1) AS BIGINT) AS pid,
         CAST(regexp_extract(doc, '<nk>([0-9]+)</nk>', 1) AS BIGINT) AS pnk,
         regexp_extract(doc, '<name>(.*)</name>', 1) AS pname,
         s_suppkey, s_name
  FROM x
)
SELECT CAST(pnk AS BIGINT) AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(pid) AS BIGINT) AS sum_parsed_ids,
       CAST(SUM(length(pname)) AS BIGINT) AS sum_name_len,
       bool_and(pid = s_suppkey AND pname = s_name) AS parse_ok,
       TRUE AS roundtrip_ok
FROM p GROUP BY pnk
"""


@register("scalar_xml_functions", oracle=_XML_ORACLE, tags=("scalar", "xml"))
def scalar_xml_functions(spark, sf_dir):
    """Spark 4 built-in XML: from_xml typed extraction, xpath_* path
    queries, and a to_xml -> from_xml round-trip contract, driven over
    XML documents BUILT from the supplier rows (deterministic, so both
    engines see identical strings). The ORACLED aggregates flow
    THROUGH the XML path — sum of from_xml-extracted ids, xpath-keyed
    grouping, xpath-extracted name lengths — so a parse defect changes
    the hash, not just a flag; the oracle re-extracts with regex (an
    independent parser). XML lands beside JSON/VARIANT as the third
    semi-structured ingestion surface: feeds/sitemaps/enterprise
    exports at 100 TB parse map-side with no shuffle."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    doc = F.concat(
        F.lit("<s><id>"),
        F.col("s_suppkey").cast("string"),
        F.lit("</id><nk>"),
        F.col("s_nationkey").cast("string"),
        F.lit("</nk><name>"),
        F.col("s_name"),
        F.lit("</name></s>"),
    )
    x = sup.select("s_suppkey", "s_name", doc.alias("doc"))
    p = x.select(
        "s_suppkey",
        "s_name",
        F.expr(
            "from_xml(doc, 'id BIGINT, nk BIGINT, name STRING')"
        ).alias("s"),
        F.expr("xpath_long(doc, '/s/nk/text()')").alias("xnk"),
        F.expr("xpath_string(doc, '/s/name/text()')").alias("xname"),
    ).select(
        F.col("xnk").alias("nationkey"),  # grouped by the XPATH value
        F.col("s.id").alias("pid"),
        F.col("s.name").alias("pname"),
        "xname",
        "s_suppkey",
        "s_name",
        # to_xml -> from_xml round-trip must reproduce the id
        (
            F.expr(
                "from_xml(to_xml(named_struct('id', s.id)), 'id BIGINT').id"
            )
            == F.col("s.id")
        ).alias("rt"),
    )
    return p.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("pid").alias("sum_parsed_ids"),
        F.sum(F.length("xname")).cast("long").alias("sum_name_len"),
        F.bool_and(
            (F.col("pid") == F.col("s_suppkey"))
            & (F.col("pname") == F.col("s_name"))
            & (F.col("xname") == F.col("s_name"))
        ).alias("parse_ok"),
        F.bool_and("rt").alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Round-7: try_* safety valves — ANSI mode's error paths, exercised.
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT n_nationkey,
       CASE WHEN n_regionkey = 0 THEN NULL
            ELSE CAST(n_nationkey AS BIGINT) / n_regionkey END AS safe_div,
       TRY_CAST(n_name AS BIGINT) AS name_as_number,
       TRY_CAST(substring(n_name, 1, 1) AS INTEGER) AS head_digit,
       CASE WHEN n_nationkey > 18
            THEN NULL
            ELSE CAST(power(10, n_nationkey) AS BIGINT) END AS pow_guard
FROM nation
"""


@register("scalar_try_functions", oracle=_TRY_ORACLE, tags=("scalar", "ansi"))
def scalar_try_functions(spark, sf_dir):
    """ANSI-mode SAFETY VALVES: this engine runs with ANSI semantics
    (overflow/cast/divide errors RAISE — the loud-failure discipline
    every exactness rule here depends on), so the try_* family is the
    sanctioned per-expression opt-out: try_divide(x, 0) -> NULL,
    try_cast('HELLO' AS BIGINT) -> NULL, try_multiply overflow ->
    NULL — each exercised over nation rows where the unguarded form
    WOULD raise (regionkey 0 divisors exist, names are non-numeric).
    The oracle expresses the same semantics with CASE/TRY_CAST (DuckDB
    never raises on these, so its plain forms + guards are the
    equivalent). The division result stays exact: both engines compute
    BIGINT/BIGINT as double only after the NULL guard."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.expr(
            "try_divide(CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT))"
        ).alias("safe_div"),
        F.expr("try_cast(n_name AS BIGINT)").alias("name_as_number"),
        F.expr("try_cast(substring(n_name, 1, 1) AS INT)").alias("head_digit"),
        # overflow -> NULL via try_cast (10^k exceeds BIGINT past k=18;
        # the unguarded CAST raises under ANSI — that raise is what this
        # column demonstrates the valve for). The oracle's explicit
        # CASE > 18 is the equivalent: 10^18 is an exactly-representable
        # double, so the in-range casts are exact in both engines.
        F.expr(
            "try_cast(power(10, CAST(n_nationkey AS DOUBLE)) AS BIGINT)"
        ).alias("pow_guard"),
    )


_LAMBDA_ORACLE = """
WITH q AS (
  SELECT l_orderkey,
         list_sort(list(CAST(round(CAST(l_quantity AS DECIMAL(8,1)) * 10)
                             AS BIGINT))) AS qs
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qs) AS BIGINT) AS n_items,
       CAST(list_reduce(qs, (a, b) -> a + b) AS BIGINT) AS total_tenths,
       CAST(len(list_filter(qs, x -> x % 20 = 0)) AS BIGINT) AS n_even_qty,
       CAST(list_reduce(list_transform(list_zip(qs, list_reverse_sort(qs)),
                                       p -> p[1] * p[2]), (a, b) -> a + b)
            AS BIGINT) AS minmax_dot,
       (len(list_filter(qs, x -> x >= 400)) > 0) AS has_bulk_item,
       CAST(list_transform(qs, x -> x * x)[1] AS BIGINT) AS min_qty_sq
FROM q
"""


@register("scalar_lambda_functions", oracle=_LAMBDA_ORACLE, tags=("scalar",))
def scalar_lambda_functions(spark, sf_dir):
    """Higher-order LAMBDA functions over arrays — the Catalyst
    feature family that keeps per-row collection logic JVM-side where
    a row-at-a-time Python UDF would otherwise creep in: aggregate
    (fold), filter, exists, transform, zip_with, element indexing —
    all over each order's sorted quantity vector. zip_with pairs the
    ascending and descending sorts (the rearrangement-inequality
    minimum dot product — a real reranking primitive). Everything is
    exact integer tenths; the only shuffle is the one groupBy that
    builds the vectors."""
    li = load_table(spark, sf_dir, "lineitem")
    q = (
        li.select(
            "l_orderkey",
            F.round(F.col("l_quantity").cast("decimal(8,1)") * 10)
            .cast("long")
            .alias("qt"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("qt")).alias("qs"))
    )
    return q.select(
        "l_orderkey",
        F.size("qs").cast("long").alias("n_items"),
        F.expr("aggregate(qs, 0L, (a, b) -> a + b)").cast("long").alias("total_tenths"),
        F.size(F.expr("filter(qs, x -> x % 20 = 0)")).cast("long").alias("n_even_qty"),
        F.expr(
            "aggregate(zip_with(qs, reverse(qs), (x, y) -> x * y), 0L, (a, b) -> a + b)"
        ).cast("long").alias("minmax_dot"),
        F.expr("exists(qs, x -> x >= 400)").alias("has_bulk_item"),
        F.expr("transform(qs, x -> x * x)[0]").cast("long").alias("min_qty_sq"),
    )
