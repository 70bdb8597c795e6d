"""TPC-DS-shaped queries, sixth batch — the 11 query numbers the
registry did not yet cover (q20 q26 q42 q52 q55 q60 q62 q63 q79 q80
q82), closing the full 1–99 family surface the reference publishes
(docs/en/benchmarking/TPC_DS_Benchmark.md:35-66; golden plans
fe/fe-core/src/test/java/com/starrocks/sql/plan/TPCDS1TTestBase.java).
Same fixture derivation as `queries/tpcds.py`: three-channel fact over
lineitem (channel := l_linenumber mod 3), item := part, warehouse /
store := supplier, geography := nation.

Shape families (TPC-DS number → plan pattern exercised):
  q20  catalog revenue per (type, brand) in a ship window with
       ratio-to-report: rev·100 / SUM(rev) OVER (PARTITION BY type)
       (q98's catalog twin — windowed share over a filtered agg)
  q26  catalog per-brand averages (qty, price, discount) gated by a
       customer-balance "demographic" — dimension-gated multi-AVG
  q42  store revenue per (year, type) for one month across years —
       plain reaggregation ordered by revenue
  q52  q42 at brand grain: (year, brand) revenue, one month
  q55  single-month brand revenue report (no year grouping)
  q60  per-item total extended sales summed ACROSS the three channel
       aggregates for one category — UNION ALL of channel aggs,
       re-aggregated by item
  q62  web shipping-latency buckets per (warehouse := supplier
       nation, month): days(l_shipdate - o_orderdate) banded into
       30/60/90/120-day counts — conditional-count matrix
  q63  manager monthly brand sales vs the brand's yearly average —
       AVG OVER (PARTITION BY brand, year) deviation filter
  q79  per-(customer, order) store basket with a supplier-nation
       gate: quantity + net profit per basket, largest first
  q80  channel ROLLUP of sales / returned amount / net profit —
       three-measure rollup with channel totals and a grand total
  q82  items whose windowed average on-hand quantity (per-part AVG
       of l_quantity in a date window) sits in [15, 25] within a
       retail-price band — decorrelated per-part aggregate joined
       back to the item dim (q37's catalog twin)

Determinism policy identical to batches 1–5: fixed-point dsum/davg
for every double aggregate, CAST counts to BIGINT in the DuckDB twin,
full ORDER BY tiebreakers before every LIMIT.

Scale notes: the only fact-fact shuffle is lineitem⋈orders inside
``_sales(with_cust=True)`` / the q62 latency join, co-partitioned on
the order key; per-part / per-brand aggregates reduce BEFORE any
join-back (q82, q63); dimension joins go through ``maybe_broadcast``
(SF-scaling part/supplier frames stay unhinted for AQE); ROLLUP adds
one exchange over an already-reduced frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from starrocks_spark.catalog import load_table
from starrocks_spark.queries._util import (
    davg, dsum, fixed, maybe_broadcast, sql_davg, sql_dec2dbl,
    sql_dsum, sql_fixed,
)
from starrocks_spark.queries.tpcds import (_SQL_SALES, _SQL_SALES_CUST,
                                           _sales)

QUERIES: dict = {}
ORACLE: dict = {}

_FIXED_NET = sql_fixed("l_extendedprice * (1 - l_discount)")


def _dbl(col):
    return col.cast("double")


def _part(spark, sf_dir):
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")


# ---------------------------------------------------------------------------
# q20: catalog revenue share per (type, brand) in a ship window

def tpcds_q20_catalog_ratio(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-DS q20 shape: catalog-channel revenue per (type, brand) in
    a 30-day ship window, with each row's share of its type's total
    via ratio-to-report (SUM OVER PARTITION BY type)."""
    s = _sales(spark, sf_dir).filter(
        (F.col("channel") == "catalog")
        & F.col("l_shipdate").between("1996-02-01", "1996-03-01"))
    part = maybe_broadcast(_part(spark, sf_dir))
    agg = (
        s.join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy("p_type", "p_brand")
        .agg(F.sum(fixed(F.col("net_price"))).alias("_fx"))
    )
    w = Window.partitionBy("p_type")
    return (
        agg.select(
            "p_type", "p_brand",
            (_dbl(F.col("_fx")) / 1e4).alias("itemrevenue"),
            (_dbl(F.col("_fx")) * 100.0 / _dbl(F.sum("_fx").over(w)))
            .alias("revenueratio"))
        .orderBy("p_type", F.desc("revenueratio"), "p_brand")
        .limit(100)
    )


ORACLE["tpcds_q20_catalog_ratio"] = f"""
WITH s AS (SELECT * FROM ({_SQL_SALES})
           WHERE channel = 'catalog'
             AND l_shipdate BETWEEN DATE '1996-02-01'
                                AND DATE '1996-03-01'),
agg AS (
  SELECT p_type, p_brand, SUM({_FIXED_NET}) AS fx
  FROM s JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_type, p_brand,
       {sql_dec2dbl('fx')} / 10000.0 AS itemrevenue,
       {sql_dec2dbl('fx')} * 100.0
         / {sql_dec2dbl('SUM(fx) OVER (PARTITION BY p_type)')}
         AS revenueratio
FROM agg
ORDER BY p_type, revenueratio DESC, p_brand
LIMIT 100
"""
QUERIES["tpcds_q20_catalog_ratio"] = tpcds_q20_catalog_ratio


# ---------------------------------------------------------------------------
# q26: catalog per-brand demographic averages

def tpcds_q26_catalog_demo_avgs(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-DS q26 shape (q7's catalog twin): average quantity, list
    price and discount per brand on the catalog channel, restricted
    to "demographic-gated" customers (positive account balance)."""
    s = _sales(spark, sf_dir, with_cust=True).filter(
        F.col("channel") == "catalog")
    cust = maybe_broadcast(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0).select("c_custkey"))
    part = maybe_broadcast(_part(spark, sf_dir))
    return (
        s.join(cust, s["o_custkey"] == cust["c_custkey"], "left_semi")
        .join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(davg(F.col("l_quantity")).alias("agg1"),
             davg(F.col("l_extendedprice")).alias("agg2"),
             davg(F.col("l_discount")).alias("agg3"))
        .orderBy("p_brand")
        .limit(100)
    )


ORACLE["tpcds_q26_catalog_demo_avgs"] = f"""
SELECT p_brand,
       {sql_davg('l_quantity')} AS agg1,
       {sql_davg('l_extendedprice')} AS agg2,
       {sql_davg('l_discount')} AS agg3
FROM ({_SQL_SALES_CUST}) s
JOIN part ON s.l_partkey = p_partkey
WHERE channel = 'catalog'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
"""
QUERIES["tpcds_q26_catalog_demo_avgs"] = tpcds_q26_catalog_demo_avgs


# ---------------------------------------------------------------------------
# q42: store revenue per (year, type) for one calendar month

def tpcds_q42_month_category(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-DS q42 shape: store-channel revenue per (ship year, item
    type) for all Novembers, biggest revenue first."""
    s = _sales(spark, sf_dir).filter(
        (F.col("channel") == "store")
        & (F.month("l_shipdate") == 11))
    part = maybe_broadcast(_part(spark, sf_dir))
    return (
        s.join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy(F.year("l_shipdate").alias("d_year"),
                 F.col("p_type"))
        .agg(dsum(F.col("net_price")).alias("sum_net"))
        .orderBy(F.desc("sum_net"), "d_year", "p_type")
        .limit(100)
    )


ORACLE["tpcds_q42_month_category"] = f"""
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS d_year, p_type,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_net
FROM ({_SQL_SALES}) s JOIN part ON l_partkey = p_partkey
WHERE channel = 'store' AND EXTRACT(MONTH FROM l_shipdate) = 11
GROUP BY 1, 2
ORDER BY sum_net DESC, d_year, p_type
LIMIT 100
"""
QUERIES["tpcds_q42_month_category"] = tpcds_q42_month_category


# ---------------------------------------------------------------------------
# q52: q42 at brand grain

def tpcds_q52_month_brand(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """TPC-DS q52 shape: store-channel revenue per (ship year, brand)
    for all Decembers, biggest revenue first."""
    s = _sales(spark, sf_dir).filter(
        (F.col("channel") == "store")
        & (F.month("l_shipdate") == 12))
    part = maybe_broadcast(_part(spark, sf_dir))
    return (
        s.join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy(F.year("l_shipdate").alias("d_year"),
                 F.col("p_brand").alias("brand"))
        .agg(dsum(F.col("net_price")).alias("ext_price"))
        .orderBy("d_year", F.desc("ext_price"), "brand")
        .limit(100)
    )


ORACLE["tpcds_q52_month_brand"] = f"""
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS d_year,
       p_brand AS brand,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS ext_price
FROM ({_SQL_SALES}) s JOIN part ON l_partkey = p_partkey
WHERE channel = 'store' AND EXTRACT(MONTH FROM l_shipdate) = 12
GROUP BY 1, 2
ORDER BY d_year, ext_price DESC, brand
LIMIT 100
"""
QUERIES["tpcds_q52_month_brand"] = tpcds_q52_month_brand


# ---------------------------------------------------------------------------
# q55: single-month brand revenue report

def tpcds_q55_brand_month(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """TPC-DS q55 shape: store-channel brand revenue for one specific
    month (1997-05), biggest first — the minimal manager report."""
    s = _sales(spark, sf_dir).filter(
        (F.col("channel") == "store")
        & (F.year("l_shipdate") == 1997)
        & (F.month("l_shipdate") == 5))
    part = maybe_broadcast(_part(spark, sf_dir))
    return (
        s.join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(dsum(F.col("net_price")).alias("ext_price"))
        .orderBy(F.desc("ext_price"), "brand")
        .limit(100)
    )


ORACLE["tpcds_q55_brand_month"] = f"""
SELECT p_brand AS brand,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS ext_price
FROM ({_SQL_SALES}) s JOIN part ON l_partkey = p_partkey
WHERE channel = 'store'
  AND EXTRACT(YEAR FROM l_shipdate) = 1997
  AND EXTRACT(MONTH FROM l_shipdate) = 5
GROUP BY 1
ORDER BY ext_price DESC, brand
LIMIT 100
"""
QUERIES["tpcds_q55_brand_month"] = tpcds_q55_brand_month


# ---------------------------------------------------------------------------
# q60: per-item category totals across the three channel aggregates

def tpcds_q60_category_channel_union(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-DS q60 shape (q33/q56's category sibling): per-item
    extended-sales totals for one category (SMALL), computed as three
    independent per-channel aggregates UNION ALL'd and re-aggregated
    by item name."""
    part = maybe_broadcast(
        _part(spark, sf_dir).filter(F.col("p_type") == "SMALL")
        .select("p_partkey", "p_name"))
    s = _sales(spark, sf_dir).filter(
        F.col("l_shipdate").between("1996-09-01", "1996-12-01"))
    per_channel = []
    for ch in ("store", "catalog", "web"):
        per_channel.append(
            s.filter(F.col("channel") == ch)
            .join(part, s["l_partkey"] == part["p_partkey"])
            .groupBy("p_name")
            .agg(F.sum(fixed(F.col("l_extendedprice"))).alias("_fx")))
    u = per_channel[0].unionAll(per_channel[1]) \
        .unionAll(per_channel[2])
    return (
        u.groupBy(F.col("p_name").alias("i_item_id"))
        .agg((_dbl(F.sum("_fx")) / 1e4).alias("total_sales"))
        .orderBy("i_item_id", F.desc("total_sales"))
        .limit(100)
    )


ORACLE["tpcds_q60_category_channel_union"] = f"""
WITH s AS (SELECT * FROM ({_SQL_SALES})
           WHERE l_shipdate BETWEEN DATE '1996-09-01'
                                AND DATE '1996-12-01'),
item AS (SELECT p_partkey, p_name FROM part WHERE p_type = 'SMALL'),
u AS (
  SELECT p_name, SUM({sql_fixed('l_extendedprice')}) AS fx
  FROM s JOIN item ON l_partkey = p_partkey
  WHERE channel = 'store' GROUP BY 1
  UNION ALL
  SELECT p_name, SUM({sql_fixed('l_extendedprice')}) AS fx
  FROM s JOIN item ON l_partkey = p_partkey
  WHERE channel = 'catalog' GROUP BY 1
  UNION ALL
  SELECT p_name, SUM({sql_fixed('l_extendedprice')}) AS fx
  FROM s JOIN item ON l_partkey = p_partkey
  WHERE channel = 'web' GROUP BY 1
)
SELECT p_name AS i_item_id,
       {sql_dec2dbl('SUM(fx)')} / 10000.0 AS total_sales
FROM u GROUP BY 1
ORDER BY i_item_id, total_sales DESC
LIMIT 100
"""
QUERIES["tpcds_q60_category_channel_union"] = \
    tpcds_q60_category_channel_union


# ---------------------------------------------------------------------------
# q62: web shipping-latency bucket matrix

def tpcds_q62_web_latency_buckets(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-DS q62 shape (q50's web twin): per (warehouse := supplier
    nation, ship month) counts of web lines shipped within 30 / 31-60
    / 61-90 / 91-120 / >120 days of the order date — a conditional-
    count latency matrix over the one fact-fact join."""
    s = _sales(spark, sf_dir).filter(F.col("channel") == "web")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderdate")
    supp = maybe_broadcast(load_table(spark, sf_dir, "supplier")
                           .select("s_suppkey", "s_nationkey"))
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(lo, hi=None):
        c = (lat > lo) if hi is None else lat.between(lo, hi)
        return F.sum(F.when(c, 1).otherwise(0)).cast("long")

    return (
        s.join(orders, s["l_orderkey"] == orders["o_orderkey"])
        .join(supp, s["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("warehouse"),
                 F.month("l_shipdate").alias("ship_month"))
        .agg(band(0, 30).alias("d30"),
             band(31, 60).alias("d60"),
             band(61, 90).alias("d90"),
             band(91, 120).alias("d120"),
             band(120).alias("d_over"))
        .orderBy("warehouse", "ship_month")
        .limit(200)
    )


ORACLE["tpcds_q62_web_latency_buckets"] = f"""
SELECT s_nationkey AS warehouse,
       CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS ship_month,
       CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate)
                          BETWEEN 0 AND 30 THEN 1 ELSE 0 END)
            AS BIGINT) AS d30,
       CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate)
                          BETWEEN 31 AND 60 THEN 1 ELSE 0 END)
            AS BIGINT) AS d60,
       CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate)
                          BETWEEN 61 AND 90 THEN 1 ELSE 0 END)
            AS BIGINT) AS d90,
       CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate)
                          BETWEEN 91 AND 120 THEN 1 ELSE 0 END)
            AS BIGINT) AS d120,
       CAST(SUM(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate)
                          > 120 THEN 1 ELSE 0 END)
            AS BIGINT) AS d_over
FROM ({_SQL_SALES}) s
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE channel = 'web'
GROUP BY 1, 2
ORDER BY warehouse, ship_month
LIMIT 200
"""
QUERIES["tpcds_q62_web_latency_buckets"] = tpcds_q62_web_latency_buckets


# ---------------------------------------------------------------------------
# q63: monthly brand sales vs the brand-year average

def tpcds_q63_month_vs_avg(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-DS q63 shape (q53's manager twin): monthly store-channel
    brand sales that deviate more than 10% from that brand's yearly
    monthly average — AVG OVER (PARTITION BY brand, year) filter."""
    s = _sales(spark, sf_dir).filter(F.col("channel") == "store")
    part = maybe_broadcast(_part(spark, sf_dir)
                           .filter(F.col("p_size") < 20))
    monthly = (
        s.join(part, s["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand"),
                 F.year("l_shipdate").alias("d_year"),
                 F.month("l_shipdate").alias("d_moy"))
        .agg(F.sum(fixed(F.col("net_price"))).alias("_fx"))
    )
    w = Window.partitionBy("p_brand", "d_year")
    # exact integer window sum / window count, one IEEE division each
    # — bit-identical in DuckDB (AVG over DECIMAL would round
    # engine-specifically)
    out = monthly.select(
        "p_brand", "d_year", "d_moy",
        (_dbl(F.col("_fx")) / 1e4).alias("sum_sales"),
        (_dbl(F.sum(F.col("_fx")).over(w)) / 1e4
         / _dbl(F.count(F.lit(1)).over(w))).alias("avg_monthly"))
    return (
        out.filter(
            (F.col("avg_monthly") > 0)
            & (F.abs(F.col("sum_sales") - F.col("avg_monthly"))
               / F.col("avg_monthly") > 0.1))
        .orderBy("p_brand", "d_year", "d_moy")
        .limit(100)
    )


ORACLE["tpcds_q63_month_vs_avg"] = f"""
WITH monthly AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS d_year,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS d_moy,
         SUM({_FIXED_NET}) AS fx
  FROM ({_SQL_SALES}) s JOIN part ON l_partkey = p_partkey
  WHERE channel = 'store' AND p_size < 20
  GROUP BY 1, 2, 3
),
win AS (
  SELECT p_brand, d_year, d_moy,
         {sql_dec2dbl('fx')} / 10000.0 AS sum_sales,
         {sql_dec2dbl('SUM(fx) OVER (PARTITION BY p_brand, d_year)')}
           / 10000.0
           / CAST(COUNT(*) OVER (PARTITION BY p_brand, d_year)
                  AS DOUBLE) AS avg_monthly
  FROM monthly
)
SELECT * FROM win
WHERE avg_monthly > 0
  AND ABS(sum_sales - avg_monthly) / avg_monthly > 0.1
ORDER BY p_brand, d_year, d_moy
LIMIT 100
"""
QUERIES["tpcds_q63_month_vs_avg"] = tpcds_q63_month_vs_avg


# ---------------------------------------------------------------------------
# q79: per-(customer, order) store basket with a nation gate

def tpcds_q79_customer_baskets(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-DS q79 shape (q73's measure twin): per (customer, order)
    quantity and net amount on the store channel where the supplying
    nation key is under 10, biggest baskets first."""
    s = _sales(spark, sf_dir, with_cust=True).filter(
        F.col("channel") == "store")
    supp = maybe_broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 10).select("s_suppkey"))
    cust = maybe_broadcast(load_table(spark, sf_dir, "customer")
                           .select("c_custkey", "c_name"))
    return (
        s.join(supp, s["l_suppkey"] == supp["s_suppkey"], "left_semi")
        .join(cust, s["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", F.col("l_orderkey").alias("order_id"))
        .agg(dsum(F.col("l_quantity")).alias("basket_qty"),
             dsum(F.col("net_price")).alias("basket_amt"))
        .orderBy(F.desc("basket_amt"), "c_name", "order_id")
        .limit(100)
    )


ORACLE["tpcds_q79_customer_baskets"] = f"""
SELECT c_name, l_orderkey AS order_id,
       {sql_dsum('l_quantity')} AS basket_qty,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS basket_amt
FROM ({_SQL_SALES_CUST}) s
JOIN customer ON o_custkey = c_custkey
WHERE channel = 'store'
  AND l_suppkey IN (SELECT s_suppkey FROM supplier
                    WHERE s_nationkey < 10)
GROUP BY 1, 2
ORDER BY basket_amt DESC, c_name, order_id
LIMIT 100
"""
QUERIES["tpcds_q79_customer_baskets"] = tpcds_q79_customer_baskets


# ---------------------------------------------------------------------------
# q80: channel ROLLUP of sales / returns / profit

def tpcds_q80_channel_rollup(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-DS q80 shape: sales, returned amount and net profit per
    (channel, brand) with ROLLUP channel subtotals and a grand total
    — the three-measure rollup over an already-reduced frame."""
    s = _sales(spark, sf_dir).filter(
        F.col("l_shipdate").between("1997-01-01", "1997-04-01"))
    part = maybe_broadcast(_part(spark, sf_dir)
                           .select("p_partkey", "p_brand"))
    j = s.join(part, s["l_partkey"] == part["p_partkey"])
    ret = F.when(F.col("returned"), F.col("net_price")) \
        .otherwise(F.lit(0.0))
    profit = F.col("net_price") - F.lit(0.6) * F.col("l_extendedprice")
    return (
        j.rollup("channel", "p_brand")
        .agg(dsum(F.col("net_price")).alias("sales"),
             dsum(ret).alias("returns_amt"),
             dsum(profit).alias("profit"))
        .orderBy(F.col("channel").asc_nulls_first(),
                 F.col("p_brand").asc_nulls_first())
        .limit(200)
    )


ORACLE["tpcds_q80_channel_rollup"] = f"""
SELECT channel, p_brand,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sales,
       {sql_dsum("CASE WHEN returned THEN "
                 "l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         AS returns_amt,
       {sql_dsum('l_extendedprice * (1 - l_discount) '
                 '- 0.6 * l_extendedprice')} AS profit
FROM ({_SQL_SALES}) s JOIN part ON l_partkey = p_partkey
WHERE l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1997-04-01'
GROUP BY ROLLUP (channel, p_brand)
ORDER BY channel ASC NULLS FIRST, p_brand ASC NULLS FIRST
LIMIT 200
"""
QUERIES["tpcds_q80_channel_rollup"] = tpcds_q80_channel_rollup


# ---------------------------------------------------------------------------
# q82: on-hand band within a retail-price band

def tpcds_q82_onhand_price_band(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-DS q82 shape (q37's twin on the store channel): distinct
    items whose average shipped quantity in a 60-day window lies in
    [15, 25] and whose retail price sits in a 50-wide band — the
    per-part aggregate decorrelates and joins back to the item dim."""
    s = _sales(spark, sf_dir).filter(
        (F.col("channel") == "store")
        & F.col("l_shipdate").between("1997-03-01", "1997-05-01"))
    onhand = (
        s.groupBy("l_partkey")
        .agg(davg(F.col("l_quantity")).alias("qoh"))
        .filter(F.col("qoh").between(15, 25))
    )
    part = _part(spark, sf_dir).filter(
        F.col("p_retailprice").between(930, 980))
    return (
        part.join(maybe_broadcast(onhand),
                  part["p_partkey"] == onhand["l_partkey"])
        .select("p_name", "p_brand", "p_retailprice")
        .distinct()
        .orderBy("p_name", "p_brand", "p_retailprice")
        .limit(100)
    )


ORACLE["tpcds_q82_onhand_price_band"] = f"""
WITH onhand AS (
  SELECT l_partkey, {sql_davg('l_quantity')} AS qoh
  FROM ({_SQL_SALES})
  WHERE channel = 'store'
    AND l_shipdate BETWEEN DATE '1997-03-01' AND DATE '1997-05-01'
  GROUP BY 1
)
SELECT DISTINCT p_name, p_brand, p_retailprice
FROM part JOIN onhand ON p_partkey = l_partkey
WHERE p_retailprice BETWEEN 930 AND 980
  AND qoh BETWEEN 15 AND 25
ORDER BY p_name, p_brand, p_retailprice
LIMIT 100
"""
QUERIES["tpcds_q82_onhand_price_band"] = tpcds_q82_onhand_price_band
