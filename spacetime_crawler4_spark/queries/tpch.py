"""TPC-H-shaped relational benchmark queries.

Split from the former single-module queries.py (round 5); definition
order within this file is preserved from the original.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import resources as _res
import math
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from spacetime_crawler4_spark.operators.dedup import (
    connected_components,
    containment_pairs,
    dup_cluster_stats,
    duplicated_span_stats,
    remove_duplicated_spans,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    oph_lsh_pairs,
    simhash_docs,
    simhash_near_pairs,
    sql_tokens,
    word_shingles,
)
from spacetime_crawler4_spark.operators.multimodal import extract_media_meta
from spacetime_crawler4_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    train_test_split,
    weighted_sample,
)
from spacetime_crawler4_spark.operators.webfilter import (
    DOC_GOOD_RULES,
    HOST_BLOCK_MEAN_RULES,
    c4_clean_lines,
    gopher_quality,
    host_reputation,
    repetition_stats,
)
from spacetime_crawler4_spark.operators.asof import asof_join
from spacetime_crawler4_spark.operators.decontam import (
    decontaminate,
    incremental_dedup,
)
from spacetime_crawler4_spark.operators.pii import (
    PII_PATTERNS,
    inject_pii,
    pii_report,
)
from spacetime_crawler4_spark.crawl.schema import FINISH, STATUS
from spacetime_crawler4_spark.operators.graph import hits, pagerank, triangle_count
from spacetime_crawler4_spark.operators.quantize import int8_fidelity
from spacetime_crawler4_spark.operators.sketch import (
    CMS_DEPTH,
    cms_pairs_sql,
    cms_point_estimates,
    cms_registers,
    hll_estimate,
    hll_register_expr,
    hll_sql,
)
from spacetime_crawler4_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_near_pairs,
    ivf_assign,
    ivf_topk,
    ivf_topk_multiprobe,
    ivf_train,
    srp_near_pairs,
    srp_planes,
)
from spacetime_crawler4_spark.operators.textstats import (
    BACKOFF_ALPHA,
    LANG_MARKERS,
    QUALITY_STOPWORDS,
    bigram_bits_per_token,
    doc_fingerprint,
    langid_heuristic,
    quality_features,
    token_stats,
    unigram_bits_per_token,
)
import os as _os

from ._shared import Q17_BRAND, Q8_NATION, Q8_REGION, Q8_TYPE, _Q7_NATIONS, _t  # noqa: F401



def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate with map-side partial agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join shape: orders ⋈ customer, top-10 by revenue."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


SQL_TPCH_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey ASC LIMIT 10
"""


def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercised through the spark.sql surface (temp view + SQL text) —
    same Catalyst plan as the DataFrame form."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM v_orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


SQL_TPCH_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_tpch_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star shape: region ⋈ nation ⋈ customer ⋈ orders (dims
    broadcast, fact streams)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("r_name")
    )


SQL_TPCH_REGION_REVENUE = """
SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_tpch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping: revenue by (priority, status) with subtotals and a
    grand total — grouping-set aggregation shape."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
        .orderBy("priority", "status")
    )


SQL_TPCH_ROLLUP = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY priority, status
"""


def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    chosen nations by ship year, supplier-side and customer-side nations
    resolved through two broadcast dimension joins on the streamed fact.
    The nation/supplier/customer dims broadcast; only lineitem⋈orders
    shuffles (on orderkey) — the canonical big-fact/small-dims plan."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    n1 = na.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == _Q7_NATIONS[0])
                & (F.col("cust_nation") == _Q7_NATIONS[1])
            )
            | (
                (F.col("supp_nation") == _Q7_NATIONS[1])
                & (F.col("cust_nation") == _Q7_NATIONS[0])
            )
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            rev,
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{_Q7_NATIONS[0]}' AND n2.n_name = '{_Q7_NATIONS[1]}')
   OR (n1.n_name = '{_Q7_NATIONS[1]}' AND n2.n_name = '{_Q7_NATIONS[0]}')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): monthly share of revenue from
    PROMO-type parts. part broadcasts onto the streamed lineitem; one
    month-keyed aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .select(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            rev.alias("rev"),
            F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)).alias("promo_rev"),
        )
        .groupBy("month")
        .agg(
            F.round(F.lit(100.0) * F.sum("promo_rev") / F.sum("rev"), 4).alias(
                "promo_share_pct"
            ),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("month")
    )


SQL_TPCH_PROMO_SHARE = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""


def q_tpch_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/ABC) by customer decile: customers
    ranked by revenue into ntile(10) buckets, per-decile revenue and the
    cumulative share — the 80/20 audit. Deciles over the REDUCED
    per-customer aggregate (window input = customers, never line items)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_r")
        )
    )
    dec = rev.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("_r"), F.asc("o_custkey")))
    )
    per = dec.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("_r").alias("_dr"),
    )
    tot = per.agg(F.sum("_dr").alias("_t"))
    cum = F.sum("_dr").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.round("_dr", 2).alias("decile_revenue"),
            F.round(cum / F.col("_t"), 6).alias("cum_share"),
        )
        .orderBy("decile")
    )


SQL_TPCH_REVENUE_PARETO = """
WITH rev AS (SELECT o_custkey,
                    sum(l_extendedprice * (1 - l_discount)) AS r
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_custkey),
dec AS (SELECT o_custkey, r,
               ntile(10) OVER (ORDER BY r DESC, o_custkey ASC) AS decile
        FROM rev),
per AS (SELECT decile, count(*) AS n_customers, sum(r) AS dr
        FROM dec GROUP BY decile),
tot AS (SELECT sum(dr) AS t FROM per)
SELECT CAST(decile AS INTEGER) AS decile, n_customers,
       round(dr, 2) AS decile_revenue,
       round(sum(dr) OVER (ORDER BY decile
                           ROWS UNBOUNDED PRECEDING) / t, 6) AS cum_share
FROM per CROSS JOIN tot ORDER BY decile
"""


def q_tpch_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders per customer INCLUDING
    zero-order customers (the left join a naive groupBy silently drops),
    then a histogram over that count — two aggregates on different keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_ORDERS_PER_CUSTOMER = """
WITH per AS (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM per GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20 — the three-table join chain (lineitem ⋈ orders ⋈ broadcast
    customer ⋈ broadcast nation) with the RETURN-flag filter pushed to
    the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_RETURNED_ITEMS = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q_tpch_shipyear_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship year, line counts split by order
    priority class (URGENT/HIGH vs the rest) — the classic fact⋈fact
    join whose aggregate is two conditional counts, so the map-side
    partial agg carries exactly two longs per group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


SQL_TPCH_SHIPYEAR_PRIORITY = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY year(l_shipdate) ORDER BY ship_year
"""


def q_tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    line quantity clears a threshold, joined back to orders + broadcast
    customer. The HAVING runs on the REDUCED per-order aggregate before
    any join — the probe side shrinks from |lineitem| to the few
    qualifying orderkeys, which is the whole point of the shape."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.round("_q", 2).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_LARGE_ORDERS = """
WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity) > 300)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q_tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand+size from part, quantity from lineitem).
    Catalyst splits the disjunction: the common join key stays a plain
    hash join and the per-branch conjuncts evaluate post-join, while
    single-side implications (brand IN (...), quantity bounds) push to
    the scans — the plan-audit case for disjunctive pushdown."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & q.between(5, 20)
         & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 30)
           & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 40)
           & F.col("p_size").between(1, 30))
    )
    return (
        j.filter(branch)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("p_brand")
    )


SQL_TPCH_DISJUNCTIVE_REVENUE = """
SELECT p_brand, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 5 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30
       AND p_size BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 40
       AND p_size BETWEEN 1 AND 30)
GROUP BY p_brand ORDER BY p_brand
"""


def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): a pure filter-aggregate
    whose entire predicate set — date range, discount band, quantity cap
    — must reach the parquet scan as pushed filters, making it the
    canonical pushdown/pruning benchmark: zero joins, one map-side
    partial sum, and a 4-of-11-column ReadSchema (the three filter
    columns + the measure; plan verified in PLANS.md)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


SQL_TPCH_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= CAST(0.04 AS DOUBLE) AND l_discount <= CAST(0.06 AS DOUBLE)
  AND l_quantity < 24
"""


def q_tpch_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (top unshipped-revenue orders, no shippriority
    column in this schema): segment-filtered customer dim BROADCAST into
    orders, fact⋈fact on orderkey, group on the reduced key set, top-10
    via TakeOrderedAndProject — never a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = "1997-06-01"
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(od.filter(F.col("o_orderdate") < cutoff), li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SQL_TPCH_UNSHIPPED_ORDERS = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND l_shipdate > TIMESTAMP '1997-06-01'
  AND o_orderdate < TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""


def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers SOLELY to blame in multi-supplier
    finalized orders — adapted to the synthetic schema (it carries no
    receipt/commit dates, so ``l_returnflag = 'R'`` stands in for the
    late-delivery predicate): count, per supplier, its returned lines
    in 'F' orders where ANOTHER supplier participated (EXISTS → left
    semi join) but NO other supplier had a returned line (NOT EXISTS →
    left anti join). The semi/anti pair against the same fact table is
    Q21's defining physical shape and the reason it is the classic
    stress test for join planning."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "leftanti",
        )
    )
    return (
        sole.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


SQL_TPCH_WAITING_SUPPLIERS = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25
"""


def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: for PROMO-type parts
    sold to ASIA-region customers, the share of yearly revenue supplied
    by NATION_2's suppliers. The richest join tree the synthetic schema
    supports (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders ⋈ customer
    ⋈ nation ⋈ region — two independent nation lookups), with every
    dim broadcast and both selective predicates (p_type, r_name)
    pushed to their scans; the share is a conditional-sum ratio inside
    one aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("s_nation")
    )
    nc = (
        nation.join(
            region.filter(F.col("r_name") == Q8_REGION).select("r_regionkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("c_nk"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(
            F.broadcast(
                part.filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nation") == Q8_NATION, rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


SQL_TPCH_MARKET_SHARE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN ns.n_name = '{Q8_NATION}'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = '{Q8_TYPE}'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ns ON ns.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation nc ON nc.n_nationkey = c_nationkey
JOIN region ON r_regionkey = nc.n_regionkey AND r_name = '{Q8_REGION}'
GROUP BY o_year ORDER BY o_year
"""


def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small-quantity orders of one
    brand's parts: lineitems with quantity below half the PART'S OWN
    average quantity (the correlated scalar subquery, decorrelated
    into a per-part aggregate joined back — the rewrite every modern
    planner performs). l_quantity is integral so the per-part average
    is an exact-integer ratio and the threshold compare is
    engine-exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bparts = part.filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    avg_qty = (
        li.join(F.broadcast(bparts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
        .select(F.col("l_partkey").alias("ap_key"), "avg_qty")
    )
    small = (
        li.join(F.broadcast(bparts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    )
    return small.agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )


SQL_TPCH_SMALL_QTY_REVENUE = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}'),
aq AS (SELECT l_partkey, avg(l_quantity) AS avg_qty
       FROM lineitem JOIN bp ON p_partkey = l_partkey
       GROUP BY l_partkey)
SELECT count(*) AS n_lines,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN bp ON bp.p_partkey = l_partkey
JOIN aq ON aq.l_partkey = lineitem.l_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


# --------------------------------------------------------------------------
# CUBE grouping sets; range-frame moving average (session 14)
# --------------------------------------------------------------------------


def q_tpch_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (l_returnflag, l_linestatus): all four grouping sets in
    ONE pass (Catalyst expands the cube into a single Expand + hash
    aggregate — no union of four scans), with grouping_id
    disambiguating the NULL-as-ALL rows. Completes the grouping-sets
    surface next to tpch_rollup; at scale the Expand multiplies rows
    by the set count BEFORE the map-side combine, which is still one
    scan cheaper than re-reading the fact table per set."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


SQL_TPCH_CUBE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       count(*) AS n,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_tpch_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the classic
    fabricated-data screen (Newcomb 1881; Benford 1938): naturally
    scaled magnitudes put digit d first with probability
    log10(1+1/d); a synthetic or truncated column diverges. Reports
    observed vs expected share per digit and the chi-square total —
    map-only digit extraction plus a 9-group aggregate."""
    orders = _t(spark, sf_dir, "orders")
    # integer-cents path: floor(x*100) is the same IEEE product + floor
    # in both engines, and BIGINT-to-string rendering is identical, so
    # the leading digit is engine-exact (×100 never changes it)
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    out = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("observed"),
        F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("expected"),
        F.round(
            F.pow(
                F.col("n") / F.col("total") - F.log10(1 + 1 / F.col("digit")),
                2,
            )
            / F.log10(1 + 1 / F.col("digit"))
            * F.col("total"),
            4,
        ).alias("chi2_term"),
    )
    return out.orderBy("digit")


SQL_TPCH_BENFORD_AUDIT = """
WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
           FROM orders WHERE o_totalprice >= 1),
obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / total, 6) AS observed,
       round(log10(1 + 1.0 / digit), 6) AS expected,
       round(pow(CAST(n AS DOUBLE) / total - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit) * total, 4) AS chi2_term
FROM obs CROSS JOIN tot
ORDER BY digit
"""


def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) whose quarterly revenue equals
    the maximum: a reduced per-supplier aggregate, a 1-row max scalar
    subquery, and the equality join back (the 'view + max' pattern).
    Revenue is rounded to 2 BEFORE the max comparison in both engines
    so the argmax is boundary-stable under summation-order drift."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_TPCH_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape (session 14)
# --------------------------------------------------------------------------


TPCH_LAPSE_CUTOFF = "2000-01-01"


def q_tpch_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — positive-balance customers above the global
    positive-balance average with NO ORDER since the cutoff (lapsed
    high-value accounts), tallied per nation: a scalar-subquery
    broadcast (1-row average) gating a LEFT ANTI join against the
    date-filtered fact table, then a broadcast dim join. The anti join
    + scalar-aggregate pair is Q22's defining shape (the original's
    7-year no-order window and phone-country grouping map to the
    synthetic schema's date cutoff and nation key); the date predicate
    pushes to the orders scan before the anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(TPCH_LAPSE_CUTOFF).cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, "c_custkey", "leftanti")
    )
    return (
        rich.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


SQL_TPCH_IDLE_RICH_CUSTOMERS = f"""
SELECT n_name, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{TPCH_LAPSE_CUTOFF}')
GROUP BY n_name ORDER BY n_name
"""
