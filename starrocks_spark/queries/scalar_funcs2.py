"""Second scalar-function sweep (SURVEY.md §2.10): conditional, bit,
IP/net, advanced string, JSON construction, geo. Everything stays in
built-in expressions (whole-stage codegen); no Python in the row path.

Reference files: condition_expr.cpp / case_expr.cpp (conditional),
bit_functions.cpp, inet_aton.cpp (IP), string_functions.cpp
(substring_index/locate/translate/repeat), json_functions.cpp
(json_object/to_json), geo_functions.cpp (st_distance_sphere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.functions.geo import st_distance_sphere
from starrocks_spark.functions.net import inet_aton, inet_ntoa


def func_conditional_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """if / ifnull / nullif / coalesce / multi-branch CASE
    (condition_expr.cpp, case_expr.cpp)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.expr("if(o_totalprice > 200000, 'big', 'small')").alias("sz"),
            F.expr("ifnull(nullif(o_orderstatus, 'O'), 'OPEN')").alias("st"),
            F.expr(
                "coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP')"
            ).alias("pri"),
            F.expr(
                "CASE WHEN o_totalprice < 50000 THEN 'S'"
                "     WHEN o_totalprice < 150000 THEN 'M'"
                "     WHEN o_totalprice < 300000 THEN 'L'"
                "     ELSE 'XL' END"
            ).alias("bucket"),
        )
        .groupBy("sz", "st", "pri", "bucket")
        .agg(F.count("*").alias("n"))
    )


_CONDITIONAL_SQL = """
SELECT if(o_totalprice > 200000, 'big', 'small') AS sz,
       ifnull(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP') AS pri,
       CASE WHEN o_totalprice < 50000 THEN 'S'
            WHEN o_totalprice < 150000 THEN 'M'
            WHEN o_totalprice < 300000 THEN 'L'
            ELSE 'XL' END AS bucket,
       COUNT(*) AS n
FROM orders
GROUP BY sz, st, pri, bucket
"""


def func_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitand/bitor/bitxor/shifts/bit_count (bit_functions.cpp)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        orders.select(
            (k.bitwiseAND(F.lit(255))).alias("k_and"),
            (k.bitwiseOR(F.lit(4096))).alias("k_or"),
            (k.bitwiseXOR(F.col("o_custkey"))).alias("k_xor"),
            F.shiftleft(k, 3).alias("k_shl"),
            F.shiftright(k, 2).alias("k_shr"),
            F.bit_count(k).alias("k_bits"),
        )
        .agg(
            F.sum("k_and").alias("sum_and"),
            F.sum("k_or").alias("sum_or"),
            F.sum("k_xor").alias("sum_xor"),
            F.sum("k_shl").alias("sum_shl"),
            F.sum("k_shr").alias("sum_shr"),
            F.sum("k_bits").alias("sum_bits"),
        )
    )


_BIT_SQL = """
SELECT CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_and,
       CAST(SUM(o_orderkey | 4096) AS BIGINT) AS sum_or,
       CAST(SUM(xor(o_orderkey, o_custkey)) AS BIGINT) AS sum_xor,
       CAST(SUM(o_orderkey << 3) AS BIGINT) AS sum_shl,
       CAST(SUM(o_orderkey >> 2) AS BIGINT) AS sum_shr,
       CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS sum_bits
FROM orders
"""


def func_inet_aton_ntoa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inet_aton/inet_ntoa round-trip over synthetic per-user IPs
    (inet_aton.cpp). The IP string is derived from user_id, encoded
    to int, decoded back — all three must agree."""
    events = load_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    ip = F.concat_ws(
        ".",
        F.lit(10),
        (uid / 65536).cast("long") % 256,
        (uid / 256).cast("long") % 256,
        uid % 256,
    )
    df = events.select(uid.alias("user_id"), ip.alias("ip")).distinct()
    return df.select(
        "user_id",
        "ip",
        inet_aton(F.col("ip")).alias("ip_num"),
        inet_ntoa(inet_aton(F.col("ip"))).alias("ip_back"),
    )


_INET_SQL = """
WITH u AS (
  SELECT DISTINCT user_id,
         concat_ws('.', '10',
                   CAST((user_id // 65536) % 256 AS VARCHAR),
                   CAST((user_id // 256) % 256 AS VARCHAR),
                   CAST(user_id % 256 AS VARCHAR)) AS ip
  FROM events
)
SELECT user_id, ip,
       10 * 16777216
         + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
         + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
         + CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_num,
       ip AS ip_back
FROM u
"""


def func_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring_index / locate / translate / repeat / reverse /
    ascii / initcap-adjacent ops (string_functions.cpp:5514)."""
    part = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        F.substring_index(name, " ", 2).alias("first_two_words"),
        F.locate("a", name).alias("first_a"),
        F.translate(name, "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.ascii(name).alias("first_byte"),
        F.length(F.trim(name)).alias("trim_len"),
    )


_STRING_ADV_SQL = """
SELECT array_to_string(string_split(p_name, ' ')[1:2], ' ')
         AS first_two_words,
       CASE WHEN contains(p_name, 'a') THEN position('a' IN p_name)
            ELSE 0 END AS first_a,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       repeat(p_brand, 2) AS brand_x2,
       reverse(p_type) AS type_rev,
       ascii(p_name) AS first_byte,
       length(trim(p_name)) AS trim_len
FROM part
"""


def func_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_object / to_json round-trip: build JSON from columns,
    extract scalars back out (json_functions.cpp json_object,
    jsonpath.cpp). Comparing the re-extracted scalars (not the raw
    JSON text) keeps the check serialization-agnostic."""
    supplier = load_table(spark, sf_dir, "supplier")
    built = supplier.select(
        F.to_json(
            F.struct(
                F.col("s_suppkey").alias("k"),
                F.col("s_name").alias("name"),
                F.col("s_nationkey").alias("nat"),
            )
        ).alias("j")
    )
    return built.select(
        F.get_json_object("j", "$.k").cast("long").alias("k"),
        F.get_json_object("j", "$.name").alias("name"),
        F.get_json_object("j", "$.nat").cast("long").alias("nat"),
    )


_JSON_CONSTRUCT_SQL = """
WITH built AS (
  SELECT to_json(struct_pack(k := s_suppkey, name := s_name,
                             nat := s_nationkey)) AS j
  FROM supplier
)
SELECT CAST(j ->> '$.k' AS BIGINT) AS k,
       j ->> '$.name' AS name,
       CAST(j ->> '$.nat' AS BIGINT) AS nat
FROM built
"""


def func_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_distance_sphere over synthetic coordinates derived from
    nation keys (geo_functions.cpp). No cross-engine oracle — libm vs
    JVM trig differ in the last ulp — correctness is unit-tested
    against known city-pair distances instead (rows-only check
    here)."""
    nation = load_table(spark, sf_dir, "nation")
    lon1 = (F.col("n_nationkey") * 13.7) % 360 - 180
    lat1 = (F.col("n_nationkey") * 7.3) % 170 - 85
    return nation.select(
        "n_name",
        F.round(
            st_distance_sphere(lon1, lat1, F.lit(0.0), F.lit(0.0)) / 1000.0, 1
        ).alias("km_to_null_island"),
    )


QUERIES = {
    "func_conditional_family": func_conditional_family,
    "func_bit_ops": func_bit_ops,
    "func_inet_aton_ntoa": func_inet_aton_ntoa,
    "func_string_advanced": func_string_advanced,
    "func_json_construct": func_json_construct,
    "func_geo_haversine": func_geo_haversine,
}

ORACLE = {
    "func_conditional_family": _CONDITIONAL_SQL,
    "func_bit_ops": _BIT_SQL,
    "func_inet_aton_ntoa": _INET_SQL,
    "func_string_advanced": _STRING_ADV_SQL,
    "func_json_construct": _JSON_CONSTRUCT_SQL,
    # func_geo_haversine intentionally has no oracle (trig ulp drift)
}


def func_ngram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram_search similarity of part names against a probe string
    (be/src/exprs/ngram.cpp) — distinct 4-gram containment score."""
    from starrocks_spark.functions.text import ngram_search

    part = load_table(spark, sf_dir, "part")
    score = ngram_search(F.col("p_name"), F.lit("small widget"), 4)
    return (
        part.select(
            "p_partkey",
            F.floor(score * 10000 + 0.5).cast("long").alias("sim_bp"),
        )
        .filter(F.col("sim_bp") > 0)
    )


def _sql_ngram_search() -> str:
    from starrocks_spark.functions.text import sql_ngram_search

    score = sql_ngram_search("p_name", "'small widget'", 4)
    return f"""
SELECT p_partkey,
       CAST(FLOOR(({score}) * 10000 + 0.5) AS BIGINT) AS sim_bp
FROM part
WHERE CAST(FLOOR(({score}) * 10000 + 0.5) AS BIGINT) > 0
"""


QUERIES["func_ngram_search"] = func_ngram_search
ORACLE["func_ngram_search"] = _sql_ngram_search()
