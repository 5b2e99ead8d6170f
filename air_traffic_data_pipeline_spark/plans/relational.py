"""Relational-core query library (SURVEY.md §2 Part B / §7 M1).

Every query exists twice: as an idiomatic Spark DataFrame/SQL plan and as a
DuckDB oracle. Numeric determinism rules (so the driver's value-hash matches
bitwise):

- Sums over 2-decimal money columns go through exact DECIMAL(18,2)
  arithmetic and are cast back to DOUBLE at the end: float summation order
  differs between engines, decimal summation is exact. The 2-dp inputs have
  no representable half-ties, so the double->decimal cast agrees across
  rounding modes.
- Averages are exact-decimal sums cast to double, divided by the count
  (one deterministic double division).
- Dates/timestamps are projected as formatted strings.
- Time bucketing uses integer division on epoch values.

At 100 TB the same plans hold: Catalyst picks broadcast joins for the dim
tables (region/nation/supplier are tiny), sort-merge + AQE for fact-fact
joins, and partial aggregation makes the groupBys shuffle only the distinct
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from .sqlutil import dlit
from .tables import load

# --- determinism helpers ---------------------------------------------------


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum of a 2-dp double column, returned as double."""
    return F.sum(col.cast("decimal(18,2)")).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    return (
        F.sum(col.cast("decimal(18,2)")).cast("double") / F.count(col)
    ).alias(alias)


def SQL_DSUM(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    return f"(CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / count({expr}))"


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,2)")


SQL_REVENUE = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))"


def fmt_date(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd").alias(alias)


# --- aggregation queries ---------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate with partial (map-side) combine."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {SQL_DSUM('l_extendedprice')} AS sum_base_price,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
       {SQL_DAVG('l_quantity')} AS avg_qty,
       {SQL_DAVG('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-10 (sort/limit).

    lineitem is pre-aggregated to (l_orderkey, revenue) BEFORE the join:
    map-side partial aggregation means the shuffle carries one decimal per
    distinct orderkey instead of every lineitem row, and the groupBy's hash
    partitioning on l_orderkey is reused by the subsequent orderkey join
    (no second lineitem-side shuffle). The orders side is pre-filtered by
    the broadcast customer dimension, shrinking the join's probe input.
    Decimal sums are associative, so pre-aggregating per orderkey then
    projecting is value-identical to aggregating after the join.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    li_rev = li.groupBy("l_orderkey").agg(F.sum(revenue_col()).alias("rev_dec"))
    o_f = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        li_rev.join(o_f, li_rev.l_orderkey == o_f.o_orderkey)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT o_orderkey, o_orderpriority,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'MACHINERY'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through region->nation->customer->orders->lineitem->supplier."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(r.r_name.isin("ASIA", "EUROPE"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


Q5_SQL = f"""
SELECT r_name, n_name, CAST(sum({SQL_REVENUE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        davg(F.col("c_acctbal"), "avg_bal"),
        dsum(F.col("c_acctbal"), "sum_bal"),
    )


AGG_STATS_SQL = f"""
SELECT c_mktsegment, count(*) AS n,
       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
       {SQL_DAVG('c_acctbal')} AS avg_bal,
       {SQL_DSUM('c_acctbal')} AS sum_bal
FROM customer GROUP BY c_mktsegment
"""


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority", "o_custkey").alias("n_prio_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_CD_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT (o_orderpriority, o_custkey)) AS n_prio_cust,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice"), "total"),
    )


AGG_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       {SQL_DSUM('o_totalprice')} AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


AGG_GSETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("bigint"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


HISTOGRAM_SQL = """
SELECT CAST(floor(o_totalprice / CAST(50000.0 AS DOUBLE)) AS BIGINT) AS bucket, count(*) AS n
FROM orders GROUP BY 1
"""


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("bigint")))
    )


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS "O",
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS "F"
FROM lineitem GROUP BY l_returnflag
"""


def unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer vs supplier balance totals, unpivoted to rows."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cb = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        dsum(F.col("c_acctbal"), "cust_bal")
    )
    sb = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        dsum(F.col("s_acctbal"), "supp_bal")
    )
    joined = cb.join(sb, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )
    return joined.selectExpr(
        "nationkey", "stack(2, 'customer', cust_bal, 'supplier', supp_bal) AS (side, bal)"
    )


UNPIVOT_SQL = f"""
WITH cb AS (SELECT c_nationkey AS nationkey, {SQL_DSUM('c_acctbal')} AS cust_bal FROM customer GROUP BY 1),
sb AS (SELECT s_nationkey AS nationkey, {SQL_DSUM('s_acctbal')} AS supp_bal FROM supplier GROUP BY 1),
j AS (SELECT coalesce(cb.nationkey, sb.nationkey) AS nationkey,
             coalesce(cust_bal, CAST(0.0 AS DOUBLE)) AS cust_bal,
             coalesce(supp_bal, CAST(0.0 AS DOUBLE)) AS supp_bal
      FROM cb FULL OUTER JOIN sb ON cb.nationkey = sb.nationkey)
SELECT nationkey, 'customer' AS side, cust_bal AS bal FROM j
UNION ALL
SELECT nationkey, 'supplier' AS side, supp_bal AS bal FROM j
"""


# --- joins -----------------------------------------------------------------


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "spend")
    )
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    )


JOIN_LEFT_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders, {SQL_DSUM('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(spend, CAST(0.0 AS DOUBLE)) AS spend
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
"""


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", F.coalesce("s_name", F.lit("<none>")).alias("s_name")
    )


JOIN_RIGHT_SQL = """
SELECT n_name, coalesce(s_name, '<none>') AS s_name
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = load(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


JOIN_FULL_SQL = """
WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > CAST(450000.0 AS DOUBLE))
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    st = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


JOIN_CROSS_SQL = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
"""


# --- window functions ------------------------------------------------------


def win_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WIN_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


WIN_RANK_SQL = """
SELECT s_suppkey, s_nationkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
"""


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    prev = F.lag(d).over(w)
    nxt = F.lead(d).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, prev).cast("bigint").alias("days_since_prev"),
        F.datediff(nxt, d).cast("bigint").alias("days_to_next"),
    )


WIN_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), lead(CAST(o_orderdate AS DATE)) OVER w) AS BIGINT) AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


WIN_RUNSUM_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec).over(w).cast("double") / F.count(dec).over(w)).alias("mavg_3"),
    )


WIN_MAVG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / count(o_totalprice) OVER w AS mavg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def win_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest customer per nation (deterministic argmax via window)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


WIN_ARGMAX_SQL = """
SELECT c_nationkey, c_custkey, c_acctbal FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) t
WHERE rn = 1
"""


# --- sort / limit / set ops / distinct ------------------------------------


def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20
"""


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


SET_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SET_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.exceptAll(s.distinct())


SET_EXCEPT_SQL = """
SELECT n_nationkey AS nationkey FROM nation
EXCEPT ALL
SELECT DISTINCT s_nationkey FROM supplier
"""


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --- scalar function surface ----------------------------------------------


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").cast("bigint").alias("len"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat_ws("-", "p_brand", "p_type").alias("cat"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad("p_partkey", 8, "0").alias("padded"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


STRING_SQL = r"""
SELECT p_partkey,
       upper(p_name) AS up, lower(p_type) AS lo,
       CAST(length(p_name) AS BIGINT) AS len,
       substring(p_name, 1, 5) AS sub5,
       concat_ws('-', p_brand, p_type) AS cat,
       coalesce(regexp_extract(p_brand, '(\d+)', 1), '') AS brand_num,
       replace(p_name, ' ', '_') AS snake,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
       trim('  x  ') AS trimmed
FROM part WHERE p_partkey < 200
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.date_format(d, "yyyy-MM-dd").alias("iso"),
    )


DATE_SQL = """
SELECT o_orderkey,
       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
       CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
       CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dom,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
       strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso
FROM orders WHERE o_orderkey < 300
"""


def from_unixtime_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seconds handling (reference ingests epoch longs, F:77-78)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    epoch_s = (F.col("ts") / F.lit(1000000000)).cast("bigint")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.from_unixtime(epoch_s, "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


FROM_UNIXTIME_SQL = """
SELECT event_id,
       CAST(floor(epoch_ns(ts) / 1000000000) AS BIGINT) AS epoch_s,
       strftime(to_timestamp(CAST(floor(epoch_ns(ts) / 1000000000) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str
FROM events WHERE event_id < 200
"""


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    x = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.abs(x - 1000.0).alias("absdev"),
        F.ceil(x / 100.0).cast("bigint").alias("ceil_h"),
        F.floor(x / 100.0).cast("bigint").alias("floor_h"),
        F.sqrt(x).alias("root"),
        (x * x).alias("sq"),
        F.round(F.log10(x), 6).alias("lg"),
        F.round(x / 7.0, 4).alias("div7"),
        (F.col("p_size") % 5).cast("bigint").alias("szmod"),
        F.greatest(x, F.lit(950.0)).alias("hi"),
        F.least(x, F.lit(950.0)).alias("lo"),
        F.sign(x - 1000.0).alias("sgn"),
    )


MATH_SQL = """
SELECT p_partkey,
       abs(p_retailprice - CAST(1000.0 AS DOUBLE)) AS absdev,
       CAST(ceil(p_retailprice / CAST(100.0 AS DOUBLE)) AS BIGINT) AS ceil_h,
       CAST(floor(p_retailprice / CAST(100.0 AS DOUBLE)) AS BIGINT) AS floor_h,
       sqrt(p_retailprice) AS root,
       p_retailprice * p_retailprice AS sq,
       round(log10(p_retailprice), 6) AS lg,
       round(p_retailprice / CAST(7.0 AS DOUBLE), 4) AS div7,
       CAST(p_size % 5 AS BIGINT) AS szmod,
       greatest(p_retailprice, CAST(950.0 AS DOUBLE)) AS hi,
       least(p_retailprice, CAST(950.0 AS DOUBLE)) AS lo,
       CAST(sign(p_retailprice - CAST(1000.0 AS DOUBLE)) AS DOUBLE) AS sgn
FROM part WHERE p_partkey < 500
"""


def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000.0, "small")
        .when(F.col("o_totalprice") < 300000.0, "mid")
        .otherwise("big")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


CASE_SQL = """
SELECT CASE WHEN o_totalprice < CAST(100000.0 AS DOUBLE) THEN 'small'
            WHEN o_totalprice < CAST(300000.0 AS DOUBLE) THEN 'mid'
            ELSE 'big' END AS bucket,
       count(*) AS n
FROM orders GROUP BY 1
"""


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    nn = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.groupBy(F.coalesce(nn, F.lit("was_P")).alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(nn).alias("n_nonnull"),
        F.sum(F.when(nn.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
    )


NULL_SQL = """
SELECT coalesce(nullif(o_orderstatus, 'P'), 'was_P') AS status,
       count(*) AS n,
       count(nullif(o_orderstatus, 'P')) AS n_nonnull,
       CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
FROM orders GROUP BY 1
"""


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.array_join(F.sort_array(words), "|").alias("sorted_words"),
    )


ARRAY_SQL = """
SELECT p_partkey,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
       list_contains(string_split(p_name, ' '), 'red') AS has_red,
       string_split(p_name, ' ')[1] AS first_word,
       string_split(p_name, ' ')[-1] AS last_word,
       array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words
FROM part WHERE p_partkey < 300
"""


def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


EXPLODE_SQL = """
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
GROUP BY word
"""


def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k"), (k % 7).alias("k_mod7"))


JSON_SQL = """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k,
       CAST(props->>'k' AS BIGINT) % 7 AS k_mod7
FROM events WHERE event_id < 500
"""


# --- subqueries ------------------------------------------------------------


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                     / count(*) FROM orders)
        GROUP BY o_orderstatus
        """
    )


SUBQ_SCALAR_SQL = """
SELECT o_orderstatus, count(*) AS n_above_avg
FROM orders
WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                             / count(*) FROM orders)
GROUP BY o_orderstatus
"""


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > CAST(480000.0 AS DOUBLE))
        """
    )


SUBQ_IN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > CAST(480000.0 AS DOUBLE))
"""


def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= CAST(49.0 AS DOUBLE))
        """
    )


SUBQ_EXISTS_SQL = """
SELECT p_partkey, p_name FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= CAST(49.0 AS DOUBLE))
"""


# --- as-of join ------------------------------------------------------------


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'error' event: the most recent 'click' by the same user at or
    before it (ties -> larger click event_id). Spark lacks a native as-of
    join; composition = union both sides + per-user running ``last(clk_id,
    ignorenulls)`` ordered by (ts, kind, clk_id).

    Scale rationale: the obvious ranged join (user equi-key + ts range +
    window) materializes err x preceding-clicks per user before ranking —
    quadratic on hot users. The union-window form is ONE shuffle on user_id
    and linear scan per user, no pair fan-out, and AQE-safe. Sort order
    (ts, kind=click<error, clk_id) makes 'click at the same ts counts' and
    'larger clk_id wins ties' exact.
    """
    ev = load(spark, sf_dir, "events")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("clk_id"),
        F.lit(None).cast("long").alias("err_id"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("clk_id"),
        F.col("event_id").alias("err_id"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "clk_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clk.unionByName(err)
        .withColumn("last_clk", F.last("clk_id", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("err_id", "user_id", F.col("last_clk").alias("clk_id"))
    )


ASOF_SQL = """
WITH err AS (SELECT event_id AS err_id, user_id, epoch_ns(ts) AS err_ts
             FROM events WHERE event_type = 'error'),
clk AS (SELECT event_id AS clk_id, user_id, epoch_ns(ts) AS clk_ts
        FROM events WHERE event_type = 'click'),
j AS (SELECT err.err_id, err.user_id, clk.clk_id, clk.clk_ts
      FROM err LEFT JOIN clk ON err.user_id = clk.user_id AND clk.clk_ts <= err.err_ts),
r AS (SELECT *, row_number() OVER (PARTITION BY err_id ORDER BY clk_ts DESC NULLS LAST, clk_id DESC) AS rn
      FROM j)
SELECT err_id, user_id, clk_id FROM r WHERE rn = 1
"""


# --- time bucketing (batch shape of the streaming tumbling window) ---------


def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hour = F.expr("ts div 3600000000000").cast("bigint")
    return (
        ev.groupBy(hour.alias("hour_bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "total_value"))
    )


TIME_BUCKET_SQL = f"""
SELECT CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket, event_type,
       count(*) AS n, {SQL_DSUM('value')} AS total_value
FROM events GROUP BY 1, 2
"""


def ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS per l_returnflag — price_cents ~ quantity +
    discount_pct — the distributed-ML primitive done with the EXACT
    MOMENT discipline: every feature is already (or is losslessly scaled
    to) an integer, the ten normal-equation moments (n, Σx, ΣxᵀX, Σy,
    Σxy, Σy²) accumulate as DECIMAL(38,0) sums — exact and order-free at
    any parallelism where a double accumulation would drift with shuffle
    order — and the 3×3 solve (Cramer's rule) + R² happen ONCE per group
    on the final exact moments, every engine seeing identical doubles.

    This is how regression actually scales on Spark: one
    map-side-combining aggregate over the fact table (the moments are the
    sufficient statistic), solve on the driver-sized result — no
    per-iteration passes, no gradient loop.
    """
    return ols_solve_from_moments(_ols_moments(spark, sf_dir))


def _ols_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten exact normal-equation moments per l_returnflag — the
    sufficient statistic shared by OLS, the ridge sweep, and the
    streaming regression mirror."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(38,0)").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("decimal(38,0)").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)").alias("y"),
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        *[
            F.sum(expr).cast("decimal(38,0)").alias(name)
            for name, expr in [
                ("sx1", F.col("x1")),
                ("sx2", F.col("x2")),
                ("sx11", F.col("x1") * F.col("x1")),
                ("sx22", F.col("x2") * F.col("x2")),
                ("sx12", F.col("x1") * F.col("x2")),
                ("sy", F.col("y")),
                ("sx1y", F.col("x1") * F.col("y")),
                ("sx2y", F.col("x2") * F.col("y")),
                ("syy", F.col("y") * F.col("y")),
            ]
        ],
    )


def ols_solve_from_moments(m: DataFrame) -> DataFrame:
    """Cramer's-rule solve + R² from exact per-group normal-equation
    moments — shared by the batch query and the streaming mirror (moments
    are distributive sums, so per-batch partials merge exactly)."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11, a12, a13 = d("n"), d("sx1"), d("sx2")
    a22, a23, a33 = d("sx11"), d("sx12"), d("sx22")
    b1, b2, b3 = d("sy"), d("sx1y"), d("sx2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    c0, c1, c2 = det0 / det, det1 / det, det2 / det
    # R² from the same exact moments: SSE = Σy² - c·(X'y) with X'y exact;
    # SST = Σy² - (Σy)²/n
    sse = d("syy") - (c0 * b1 + c1 * b2 + c2 * b3)
    sst = d("syy") - b1 * b1 / a11
    return m.select(
        "l_returnflag",
        F.round(c0, 6).alias("coef_intercept"),
        F.round(c1, 6).alias("coef_quantity"),
        F.round(c2, 6).alias("coef_discount_pct"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"),
    ).orderBy("l_returnflag")


OLS_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DECIMAL(38,0)) AS x1,
         CAST(round(l_discount * 100) AS DECIMAL(38,0)) AS x2,
         CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS y
  FROM lineitem),
m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x1) AS DECIMAL(38,0)) AS sx1,
         CAST(sum(x2) AS DECIMAL(38,0)) AS sx2,
         CAST(sum(x1 * x1) AS DECIMAL(38,0)) AS sx11,
         CAST(sum(x2 * x2) AS DECIMAL(38,0)) AS sx22,
         CAST(sum(x1 * x2) AS DECIMAL(38,0)) AS sx12,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x1 * y) AS DECIMAL(38,0)) AS sx1y,
         CAST(sum(x2 * y) AS DECIMAL(38,0)) AS sx2y,
         CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM li GROUP BY l_returnflag),
s AS (
  SELECT l_returnflag,
         CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12,
         CAST(sx2 AS DOUBLE) AS a13, CAST(sx11 AS DOUBLE) AS a22,
         CAST(sx12 AS DOUBLE) AS a23, CAST(sx22 AS DOUBLE) AS a33,
         CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
         CAST(sx2y AS DOUBLE) AS b3, CAST(syy AS DOUBLE) AS syy
  FROM m),
c AS (
  SELECT l_returnflag, b1, b2, b3, syy, a11,
         (b1 * (a22 * a33 - a23 * a23)
          - a12 * (b2 * a33 - a23 * b3)
          + a13 * (b2 * a23 - a22 * b3))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c0,
         (a11 * (b2 * a33 - a23 * b3)
          - b1 * (a12 * a33 - a23 * a13)
          + a13 * (a12 * b3 - b2 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c1,
         (a11 * (a22 * b3 - b2 * a23)
          - a12 * (a12 * b3 - b2 * a13)
          + b1 * (a12 * a23 - a22 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c2
  FROM s)
SELECT l_returnflag,
       round(c0, 6) AS coef_intercept,
       round(c1, 6) AS coef_quantity,
       round(c2, 6) AS coef_discount_pct,
       round(1.0 - (syy - (c0 * b1 + c1 * b2 + c2 * b3))
                   / (syy - b1 * b1 / a11), 6) AS r2
FROM c ORDER BY l_returnflag
"""


RIDGE_LAMBDAS = (0, 1_000_000, 100_000_000)  # L2 sweep incl. the OLS limit


def ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form RIDGE regression sweep per l_returnflag — the exact-
    moment discipline generalized: (XᵀX + λD)β = Xᵀy with D = diag(0,1,1)
    (intercept unpenalized, Hoerl & Kennard 1970), solved by the same
    3×3 Cramer kernel with λ added to the two slope diagonals. One row
    per (group, λ) with λ ∈ RIDGE_LAMBDAS — λ=0 IS OLS, so the sweep
    shows shrinkage against its own unregularized limit. R² is computed
    from the full quadratic form (syy − 2βᵀXᵀy + βᵀXᵀXβ, with the
    UNPENALIZED XᵀX), which reduces to the OLS shortcut only at λ=0 —
    ridge solutions don't satisfy the normal equations.

    Scale: ZERO additional passes — the moments are the same sufficient
    statistic `_ols_moments` already accumulates (one map-side-combining
    aggregate); the λ sweep is a broadcast crossJoin on the |groups|-row
    moment frame, so sweeping 100 λs costs the same scan as one."""
    m = _ols_moments(spark, sf_dir)
    lam = spark.createDataFrame([(l,) for l in RIDGE_LAMBDAS], "lam bigint")
    ml = m.crossJoin(F.broadcast(lam))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lamd = d("lam")
    a11, a12, a13 = d("n"), d("sx1"), d("sx2")
    a22, a23, a33 = d("sx11") + lamd, d("sx12"), d("sx22") + lamd
    b1, b2, b3 = d("sy"), d("sx1y"), d("sx2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    c0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    ) / det
    c1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    ) / det
    c2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    ) / det
    # SSE via the full quadratic form with the UNpenalized XtX
    u22, u33 = d("sx11"), d("sx22")
    quad = (
        c0 * c0 * a11
        + c1 * c1 * u22
        + c2 * c2 * u33
        + 2.0 * (c0 * c1 * a12 + c0 * c2 * a13 + c1 * c2 * a23)
    )
    sse = d("syy") - 2.0 * (c0 * b1 + c1 * b2 + c2 * b3) + quad
    sst = d("syy") - b1 * b1 / a11
    return ml.select(
        "l_returnflag",
        "lam",
        F.round(c0, 6).alias("coef_intercept"),
        F.round(c1, 6).alias("coef_quantity"),
        F.round(c2, 6).alias("coef_discount_pct"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"),
    ).orderBy("l_returnflag", "lam")


_RIDGE_MOMENTS_SQL = """
li AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DECIMAL(38,0)) AS x1,
         CAST(round(l_discount * 100) AS DECIMAL(38,0)) AS x2,
         CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS y
  FROM lineitem),
m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x1) AS DECIMAL(38,0)) AS sx1,
         CAST(sum(x2) AS DECIMAL(38,0)) AS sx2,
         CAST(sum(x1 * x1) AS DECIMAL(38,0)) AS sx11,
         CAST(sum(x2 * x2) AS DECIMAL(38,0)) AS sx22,
         CAST(sum(x1 * x2) AS DECIMAL(38,0)) AS sx12,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x1 * y) AS DECIMAL(38,0)) AS sx1y,
         CAST(sum(x2 * y) AS DECIMAL(38,0)) AS sx2y,
         CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM li GROUP BY l_returnflag)"""

RIDGE_SQL = f"""
WITH {_RIDGE_MOMENTS_SQL},
s AS (
  SELECT l_returnflag, CAST(lam AS BIGINT) AS lam,
         CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12,
         CAST(sx2 AS DOUBLE) AS a13,
         CAST(sx11 AS DOUBLE) + CAST(lam AS DOUBLE) AS a22,
         CAST(sx12 AS DOUBLE) AS a23,
         CAST(sx22 AS DOUBLE) + CAST(lam AS DOUBLE) AS a33,
         CAST(sx11 AS DOUBLE) AS u22, CAST(sx22 AS DOUBLE) AS u33,
         CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
         CAST(sx2y AS DOUBLE) AS b3, CAST(syy AS DOUBLE) AS syy
  FROM m CROSS JOIN (VALUES {", ".join(f"({v})" for v in RIDGE_LAMBDAS)}) ls(lam)),
c AS (
  SELECT *,
         (b1 * (a22 * a33 - a23 * a23)
          - a12 * (b2 * a33 - a23 * b3)
          + a13 * (b2 * a23 - a22 * b3))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c0,
         (a11 * (b2 * a33 - a23 * b3)
          - b1 * (a12 * a33 - a23 * a13)
          + a13 * (a12 * b3 - b2 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c1,
         (a11 * (a22 * b3 - b2 * a23)
          - a12 * (a12 * b3 - b2 * a13)
          + b1 * (a12 * a23 - a22 * a13))
         / (a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c2
  FROM s)
SELECT l_returnflag, lam,
       round(c0, 6) AS coef_intercept,
       round(c1, 6) AS coef_quantity,
       round(c2, 6) AS coef_discount_pct,
       round(1.0 - (syy - 2.0 * (c0 * b1 + c1 * b2 + c2 * b3)
                    + (c0 * c0 * a11 + c1 * c1 * u22 + c2 * c2 * u33
                       + 2.0 * (c0 * c1 * a12 + c0 * c2 * a13 + c1 * c2 * a23)))
                   / (syy - b1 * b1 / a11), 6) AS r2
FROM c ORDER BY l_returnflag, lam
"""


KMV_KS = (16, 32, 64)  # K sweep: estimate accuracy vs sketch size
KMV_KMAX = max(KMV_KS)


# --- AMS F2 (second-moment) sketch (round 13) ---------------------------------

AMS_R = 256  # sign estimators; median of AMS_G groups of AMS_R/AMS_G
AMS_G = 8


def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch (Alon, Matias & Szegedy 1996) estimating
    the self-join size F2 = sum_i f_i^2 of the (user_id, event_type)
    frequency vector — the moment-estimation sketch family next to
    HLL/KMV (distinct), count-min (point frequency), and the quantile
    sketch. Sixteen sign estimators Z_r = sum_events s_r(item), with
    s_r = +-1 from the parity of an md5-derived u16 (the explicit
    strpos-arithmetic hash both engines evaluate bit-identically);
    estimate = median of AMS_G group means of Z_r^2 (the standard
    median-of-means; median of 4 = mean of the middle two). One row:
    exact F2 and item count (from the item aggregate), the estimate,
    and the relative error — the accuracy number, oracle-checked, that
    turns the sketch from folklore into a measured tool.

    Scale: the Z_r pass is ITEM-KEY-FREE — a 16x map-side explode
    collapsing to 16 rows before the shuffle (one pass, O(R) state: the
    true AMS streaming shape); only the exact-F2 comparison pays an
    item-keyed aggregate, and a production deployment drops it.
    """
    ev = load(spark, sf_dir, "events").select(
        F.concat_ws("#", F.col("user_id").cast("string"), "event_type").alias("item")
    )
    from ..functions.hashes import hex4_to_int

    r = F.explode(F.sequence(F.lit(0), F.lit(AMS_R - 1))).alias("r")
    signed = ev.select("item", r).select(
        "r",
        F.when(
            hex4_to_int(F.md5(F.concat(F.col("item"), F.lit("@ams"), F.col("r").cast("string")))) % 2
            == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("s"),
    )
    z = signed.groupBy("r").agg(F.sum("s").cast("bigint").alias("z"))
    grp = z.groupBy(F.expr(f"r div {AMS_R // AMS_G}").alias("g")).agg(
        (F.sum(F.col("z") * F.col("z")).cast("double") / F.lit(float(AMS_R // AMS_G)))
        .alias("gm")
    )
    w = W.orderBy("gm")
    med = (
        grp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").isin(AMS_G // 2, AMS_G // 2 + 1))
        .agg((F.sum("gm") / F.lit(2.0)).alias("f2_est"))
    )
    exact = ev.groupBy("item").agg(F.count(F.lit(1)).alias("f")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2_exact"),
    )
    return exact.crossJoin(med).select(
        "n_items",
        "f2_exact",
        F.round(F.col("f2_est"), 6).alias("f2_est"),
        F.round(
            F.abs(F.col("f2_est") - F.col("f2_exact").cast("double"))
            / F.col("f2_exact").cast("double"),
            6,
        ).alias("rel_error"),
    )


def _ams_f2_sql() -> str:
    from ..functions.hashes import hex4_to_int_sql

    item = "CAST(user_id AS VARCHAR) || '#' || event_type"
    return f"""
WITH ev AS (SELECT {item} AS item FROM events),
signed AS (
  SELECT r, CASE WHEN {hex4_to_int_sql("md5(item || '@ams' || CAST(r AS VARCHAR))")} % 2 = 0
            THEN 1 ELSE -1 END AS s
  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, {AMS_R - 1})) AS r) rs),
z AS (SELECT r, CAST(sum(s) AS BIGINT) AS z FROM signed GROUP BY r),
grp AS (
  SELECT r // {AMS_R // AMS_G} AS g,
         CAST(sum(z * z) AS DOUBLE) / {float(AMS_R // AMS_G)} AS gm
  FROM z GROUP BY 1),
med AS (
  SELECT sum(gm) / 2.0 AS f2_est
  FROM (SELECT gm, row_number() OVER (ORDER BY gm) AS rn FROM grp)
  WHERE rn IN ({AMS_G // 2}, {AMS_G // 2 + 1})),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(f * f) AS BIGINT) AS f2_exact
  FROM (SELECT item, count(*) AS f FROM ev GROUP BY item))
SELECT n_items, f2_exact,
       round(f2_est, 6) AS f2_est,
       round(abs(f2_est - CAST(f2_exact AS DOUBLE)) / f2_exact, 6) AS rel_error
FROM exact, med
"""


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch over l_partkey (Bar-Yossef
    et al. 2002; Beyer et al. 2007) — the mergeable distinct sketch that,
    unlike HLL (rel_hll_partial_merge / rel_approx_distinct, whose
    engine-internal registers differ by design and get banded-boolean
    oracles), is VALUE-ORACLE-CHECKABLE end to end: the hash is an
    explicit md5-derived u32, the sketch is the K smallest distinct hash
    values, and the estimate DV̂ = (K-1)/u_(K) is one divide of exactly
    agreed numbers — bitwise across engines. One row per K in KMV_KS,
    showing estimate convergence as the sketch grows.

    Mergeability (the sketch property the streaming mirror exercises):
    the K smallest of a union are contained in the union of per-part K
    smallest, so per-batch K-min partials merge by distinct-union +
    re-take-K — no rescan of history.

    Scale: distinct() is hash-keyed with map-side combine; the K-min is
    orderBy(u).limit(KMAX) which Spark executes as per-partition top-K +
    merge (TakeOrdered — NO global sort); everything after operates on
    ≤KMAX rows."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    return kmv_from_values(li.select(_kmv_u32(F.col("l_partkey")).alias("u")))


def _kmv_u32(key: Column) -> Column:
    """md5-derived u32 in [0, 2^32): the first 8 hex chars of the digest.

    Defined (and oracle-evaluated) as two hex4 strpos blocks
    (hi * 65536 + lo); the Spark side evaluates the same integer with ONE
    base-16 parse of the 8-char prefix — bitwise identical, one string op
    instead of eight."""
    h = F.md5(key.cast("string"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def _kmv_u32_sql(expr: str) -> str:
    from ..functions.hashes import hex4_to_int_sql

    h = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"(CAST({hex4_to_int_sql(h, 0)} AS BIGINT) * 65536"
        f" + CAST({hex4_to_int_sql(h, 4)} AS BIGINT))"
    )


def kmv_from_values(vals: DataFrame) -> DataFrame:
    """The sketch tail of :func:`kmv_distinct` over a (possibly
    duplicated) u32 hash column — shared with the streaming mirror, whose
    merged per-batch K-min partials feed the identical take-K + estimate."""
    from pyspark.sql import Window

    kmins = vals.select("u").distinct().orderBy("u").limit(KMV_KMAX)
    ranked = kmins.select(
        "u",
        F.row_number()
        .over(Window.orderBy("u"))
        .cast("int")
        .alias("rn"),  # ≤KMAX rows: the single-partition window is bounded
    )
    ks = vals.sparkSession.createDataFrame(
        [(k,) for k in KMV_KS], "k int"
    )
    est = F.round(
        (F.col("k") - 1).cast("double")
        / (F.col("u").cast("double") / F.lit(4294967296.0)),
        6,
    )
    return (
        ks.join(ranked, F.col("rn") == F.col("k"))
        .select("k", F.col("u").alias("kth_u32"), est.alias("kmv_estimate"))
        .orderBy("k")
    )


KMV_SQL = f"""
WITH h AS (SELECT DISTINCT {_kmv_u32_sql('l_partkey')} AS u FROM lineitem),
r AS (SELECT u, CAST(row_number() OVER (ORDER BY u) AS INTEGER) AS rn FROM h)
SELECT k, u AS kth_u32,
       round(CAST(k - 1 AS DOUBLE) / (CAST(u AS DOUBLE)
             / CAST(4294967296.0 AS DOUBLE)), 6) AS kmv_estimate
FROM (VALUES {", ".join(f"({k})" for k in KMV_KS)}) ks(k)
JOIN r ON r.rn = ks.k
ORDER BY k
"""


KMV_SETOP_QTY = (10, 40)  # A: orders with a line qty <= 10; B: qty >= 40


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches (Beyer et al.
    2007; the Theta Sketch framework) — the reason mergeable distinct
    sketches exist: estimate |A∪B|, |A∩B| and Jaccard between two sets
    from their K-min sketches alone, never materializing either set.
    A = orders holding a line with qty <= 10, B = orders holding a
    line with qty >= 40 (genuinely overlapping sets: J ~ 0.4 at sf0.01);
    θ = min(θ_A, θ_B)
    (each sketch's K-th smallest hash), the combined sample is every
    sketch hash below θ, and each estimate is |sample| / (θ/2^32). The
    row carries the EXACT counterparts next to the estimates, so the
    driver hash pins both the sketch math and the accuracy context.

    Scale: two K-min sketches (per-partition top-K + merge, no global
    sort), then everything operates on ≤2K rows; the exact legs are
    distinct-aggregates included for audit (drop them at 100 TB — the
    sketch is the product)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    q_lo, q_hi = KMV_SETOP_QTY
    pred_a, pred_b = F.col("l_quantity") <= q_lo, F.col("l_quantity") >= q_hi

    def sk(pred):
        return (
            li.filter(pred)
            .select(_kmv_u32(F.col("l_orderkey")).alias("u"))
            .distinct()
            .orderBy("u")
            .limit(KMV_KMAX)
        )

    sa, sb = sk(pred_a), sk(pred_b)
    tha = sa.agg(F.max("u").alias("tha"))
    thb = sb.agg(F.max("u").alias("thb"))
    th = tha.crossJoin(thb).select(
        F.least("tha", "thb").alias("theta")
    )
    ua = sa.crossJoin(F.broadcast(th)).filter(F.col("u") < F.col("theta"))
    ub = sb.crossJoin(F.broadcast(th)).filter(F.col("u") < F.col("theta"))
    n_union = (
        ua.select("u").unionByName(ub.select("u")).distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_union_sample"))
    )
    n_inter = (
        ua.select("u").join(ub.select("u"), "u", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter_sample"))
    )
    exact = li.groupBy().agg(
        F.count_distinct(
            F.when(pred_a | pred_b, F.col("l_orderkey"))
        ).cast("bigint").alias("exact_union")
    )
    ea = li.filter(pred_a).select("l_orderkey").distinct()
    eb = li.filter(pred_b).select("l_orderkey").distinct()
    exact_i = ea.join(eb, "l_orderkey", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_inter")
    )
    frac = F.col("theta").cast("double") / F.lit(4294967296.0)
    est = lambda c: F.round(F.col(c).cast("double") / frac, 6)  # noqa: E731
    return (
        th.crossJoin(n_union)
        .crossJoin(n_inter)
        .crossJoin(exact)
        .crossJoin(exact_i)
        .select(
            F.col("theta").alias("theta_u32"),
            "n_union_sample",
            "n_inter_sample",
            est("n_union_sample").alias("union_est"),
            est("n_inter_sample").alias("inter_est"),
            F.round(
                F.col("n_inter_sample").cast("double")
                / F.col("n_union_sample").cast("double"),
                6,
            ).alias("jaccard_est"),
            "exact_union",
            "exact_inter",
        )
    )


KMV_SETOP_SQL = f"""
WITH sa AS (
  SELECT DISTINCT {_kmv_u32_sql('l_orderkey')} AS u FROM lineitem
  WHERE l_quantity <= {KMV_SETOP_QTY[0]} ORDER BY u LIMIT {KMV_KMAX}),
sb AS (
  SELECT DISTINCT {_kmv_u32_sql('l_orderkey')} AS u FROM lineitem
  WHERE l_quantity >= {KMV_SETOP_QTY[1]} ORDER BY u LIMIT {KMV_KMAX}),
th AS (SELECT least((SELECT max(u) FROM sa), (SELECT max(u) FROM sb)) AS theta),
ua AS (SELECT u FROM sa CROSS JOIN th WHERE u < theta),
ub AS (SELECT u FROM sb CROSS JOIN th WHERE u < theta),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_union_sample
       FROM (SELECT u FROM ua UNION ALL SELECT u FROM ub)),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_inter_sample
       FROM ua SEMI JOIN ub ON ua.u = ub.u),
ex AS (SELECT CAST(count(DISTINCT CASE WHEN l_quantity <= {KMV_SETOP_QTY[0]}
                 OR l_quantity >= {KMV_SETOP_QTY[1]}
                 THEN l_orderkey END) AS BIGINT) AS exact_union
       FROM lineitem),
exi AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM
        (SELECT DISTINCT l_orderkey FROM lineitem
         WHERE l_quantity <= {KMV_SETOP_QTY[0]}) a
        SEMI JOIN
        (SELECT DISTINCT l_orderkey FROM lineitem
         WHERE l_quantity >= {KMV_SETOP_QTY[1]}) b
        ON a.l_orderkey = b.l_orderkey)
SELECT theta AS theta_u32, n_union_sample, n_inter_sample,
       round(CAST(n_union_sample AS DOUBLE)
             / (CAST(theta AS DOUBLE) / CAST(4294967296.0 AS DOUBLE)), 6)
         AS union_est,
       round(CAST(n_inter_sample AS DOUBLE)
             / (CAST(theta AS DOUBLE) / CAST(4294967296.0 AS DOUBLE)), 6)
         AS inter_est,
       round(CAST(n_inter_sample AS DOUBLE)
             / CAST(n_union_sample AS DOUBLE), 6) AS jaccard_est,
       exact_union, exact_inter
FROM th CROSS JOIN nu CROSS JOIN ni CROSS JOIN ex CROSS JOIN exi
"""


BOOT_B = 64  # bootstrap replicates
# Poisson(1) CDF breakpoints scaled to u32: floor(P(X<=k) * 2^32) for k=0..5.
# A row's weight in replicate b is the pseudo-Poisson draw CASE(u < T[k]) -> k
# — exact integer comparisons, so the resample is bitwise across engines.
BOOT_POIS_T = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
)
# CI ranks are DERIVED from the surviving replicate count n (zero-weight
# replicates drop): lo = ceil(0.025·n) = (n+39)//40, hi = ceil(0.975·n)
# = (39n+39)//40 — at full survival of B=64 these are 2 and 63.


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for mean lineitem revenue per
    l_returnflag via the POISSON BOOTSTRAP (Hanley & MacGibbon 2006; the
    bag-of-little-bootstraps lineage) — the way uncertainty is actually
    estimated over data too large to resample: a multinomial resample
    needs the global row count and a shuffle per replicate; the Poisson
    approximation gives every row an independent Poisson(1) weight per
    replicate, so ALL B resamples ride ONE pass over the fact table and
    collapse immediately into a map-side-combining aggregate of
    |groups|·B partial sums. No resample ever materializes.

    Determinism discipline: the per-(row, replicate) weight is a pseudo-
    Poisson draw from the md5-u32 of (orderkey, linenumber, b) compared
    against integer CDF breakpoints (BOOT_POIS_T) — exact integer
    comparisons, no doubles; revenue is exact cent-hundredths
    (price_cents · (100 - disc_pct)); each replicate mean is ONE divide
    of two exact BIGINTs; the CI bounds are nearest-rank order statistics
    (ranks ceil(0.025·n)/ceil(0.975·n) of the n SURVIVING replicate
    means — 2/63 at full survival of B=64 — ties broken by replicate id)
    — bitwise across engines and shuffle orders end to end.

    Scale: explode factor B is the only cost and it never reaches an
    Exchange — the groupBy(flag, b) partials combine inside the scan
    stage; the rank window runs over |flags|·B ≤ a few hundred rows."""
    from .tables import fan_out

    # fan_out before the x64 explode: a narrow parquet scan would pin all
    # 64·|rows| hash evaluations to its few input splits (measured 56s ->
    # ~8s at sf0.1; the explode inherits scan partitioning)
    li = boot_rev_projection(fan_out(load(spark, sf_dir, "lineitem")))
    return bootstrap_ci_from_partials(
        boot_exact_partial(li), boot_rep_partial(li)
    )


def boot_rev_projection(df: DataFrame) -> DataFrame:
    """Exact cent-hundredth revenue with the (orderkey, linenumber) row
    identity the pseudo-Poisson draws hash — shared by the batch query
    and the streaming mirror's per-batch partials."""
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("rev"),
    )


def boot_exact_partial(li: DataFrame) -> DataFrame:
    """Per-group point-estimate partial (count + exact revenue sum) —
    distributive, merges by addition. The revenue sums are DECIMAL(38,0):
    cent-hundredths × corpus rows passes 2^63 around 1e10 rows, well
    inside the 100 TB design point."""
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("rev").cast("decimal(18,0)")).cast("decimal(38,0)").alias("s_rev"),
    )


def boot_rep_partial(li: DataFrame) -> DataFrame:
    """Per-(group, replicate) weighted-sum partial. The weight of a row
    in replicate b depends only on the row's identity and b — never on
    which batch carried it — so partials merge by exact BIGINT addition
    under any arrival slicing."""
    u = _kmv_u32(
        F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("b").cast("string"),
        )
    )
    w = F.lit(len(BOOT_POIS_T))
    for k in reversed(range(len(BOOT_POIS_T))):
        w = F.when(F.col("u") < F.lit(BOOT_POIS_T[k]), F.lit(k)).otherwise(w)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "rev",
            F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        )
        .withColumn("u", u)
        .groupBy("l_returnflag", "b")
        .agg(
            F.sum((w.cast("bigint") * F.col("rev")).cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("s_wy"),
            F.sum(w.cast("bigint")).cast("bigint").alias("s_w"),
        )
    )


def bootstrap_ci_from_partials(exact: DataFrame, reps: DataFrame) -> DataFrame:
    """Merge (sum) the distributive partials and take the nearest-rank
    order statistics — the tail shared by the batch query and the
    streaming mirror."""
    exact = exact.groupBy("l_returnflag").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("s_rev").cast("decimal(38,0)").alias("s_rev"),
    )
    rep_means = (
        reps.groupBy("l_returnflag", "b")
        .agg(
            F.sum("s_wy").cast("decimal(38,0)").alias("s_wy"),
            F.sum("s_w").cast("bigint").alias("s_w"),
        )
        .filter(F.col("s_w") > 0)
        .select(
            "l_returnflag",
            "b",
            (F.col("s_wy").cast("double") / F.col("s_w").cast("double")).alias(
                "rep_mean"
            ),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy("rep_mean", "b")
    )
    # ranks derive from the SURVIVING replicate count, not a fixed B:
    # lo = ceil(0.025·n) = (n+39)//40, hi = ceil(0.975·n) = (39n+39)//40,
    # exact integer arithmetic; at full survival (n=64) these are the
    # documented 2/63, so the common case is unchanged, but a group whose
    # zero-weight replicates were dropped still reports true 2.5/97.5
    # nearest-rank percentiles of what survived.
    n_reps = F.count(F.lit(1)).over(W.partitionBy("l_returnflag"))
    counted = rep_means.select(
        "l_returnflag", "rep_mean", "b", n_reps.cast("bigint").alias("n_reps")
    )
    ranked = counted.select(
        "l_returnflag",
        "rep_mean",
        rn.alias("rn"),
        ((F.col("n_reps") + F.lit(39)) / F.lit(40)).cast("bigint").alias(
            "lo_rank"
        ),
        ((F.lit(39) * F.col("n_reps") + F.lit(39)) / F.lit(40))
        .cast("bigint")
        .alias("hi_rank"),
    )
    bounds = (
        ranked.filter(
            (F.col("rn") == F.col("lo_rank")) | (F.col("rn") == F.col("hi_rank"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.max(
                F.when(F.col("rn") == F.col("lo_rank"), F.col("rep_mean"))
            ).alias("lo"),
            F.max(
                F.when(F.col("rn") == F.col("hi_rank"), F.col("rep_mean"))
            ).alias("hi"),
        )
    )
    cents = lambda c: F.round(c / F.lit(100.0), 6)  # noqa: E731
    return (
        exact.join(bounds, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            cents(
                F.col("s_rev").cast("double") / F.col("n_rows").cast("double")
            ).alias("mean_cents"),
            cents(F.col("lo")).alias("ci_lo_cents"),
            cents(F.col("hi")).alias("ci_hi_cents"),
            cents(F.col("hi") - F.col("lo")).alias("ci_width_cents"),
        )
        .orderBy("l_returnflag")
    )


def _boot_w_sql() -> str:
    branches = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(BOOT_POIS_T)
    )
    return f"CASE {branches} ELSE {len(BOOT_POIS_T)} END"


POISSON_BOOTSTRAP_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
  FROM lineitem),
exact AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(rev AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s_rev
  FROM li GROUP BY 1),
hashed AS (
  SELECT l_returnflag, rev, b,
         {_kmv_u32_sql("l_orderkey || ':' || l_linenumber || ':' || b")} AS u
  FROM li CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) bs),
reps AS (
  SELECT l_returnflag, b,
         CAST(CAST(sum(CAST(CAST({_boot_w_sql()} AS BIGINT) * rev
                            AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(sum(CAST({_boot_w_sql()} AS BIGINT)) AS DOUBLE) AS rep_mean
  FROM hashed GROUP BY 1, 2
  HAVING sum(CAST({_boot_w_sql()} AS BIGINT)) > 0),
ranked AS (
  SELECT l_returnflag, rep_mean,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY rep_mean, b) AS rn,
         (count(*) OVER (PARTITION BY l_returnflag) + 39) // 40 AS lo_rank,
         (39 * count(*) OVER (PARTITION BY l_returnflag) + 39) // 40 AS hi_rank
  FROM reps),
bounds AS (
  SELECT l_returnflag,
         max(CASE WHEN rn = lo_rank THEN rep_mean END) AS lo,
         max(CASE WHEN rn = hi_rank THEN rep_mean END) AS hi
  FROM ranked WHERE rn IN (lo_rank, hi_rank) GROUP BY 1)
SELECT e.l_returnflag, e.n_rows,
       round(CAST(s_rev AS DOUBLE) / CAST(n_rows AS DOUBLE)
             / CAST(100.0 AS DOUBLE), 6) AS mean_cents,
       round(lo / CAST(100.0 AS DOUBLE), 6) AS ci_lo_cents,
       round(hi / CAST(100.0 AS DOUBLE), 6) AS ci_hi_cents,
       round((hi - lo) / CAST(100.0 AS DOUBLE), 6) AS ci_width_cents
FROM exact e JOIN bounds USING (l_returnflag)
ORDER BY l_returnflag
"""


SEAS_ANCHOR = "1994-12-26"  # a Monday before the lake's first order date


def daily_revenue_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily order-revenue series as (dn, cents) — day number from
    the Monday anchor, exact BIGINT cent sum. The shared base of the
    time-series family (seasonal decomposition, Mann-Whitney, changepoint
    detection): ONE map-side-combining pass over orders, reduced to a
    calendar-bounded frame (~2.4k rows for a 7-year lake at ANY corpus
    scale) on which ordered windows are then trivially safe."""
    return daily_revenue_partial(load(spark, sf_dir, "orders"))


def daily_revenue_partial(o: DataFrame) -> DataFrame:
    """The (dn, cents, n_orders) aggregate over any orders-shaped frame —
    a whole lake or one micro-batch. Plain BIGINT sums keyed by day, so
    per-batch partials merge by addition into the exact corpus series;
    shared by the batch time-series family (seasonal, Mann-Whitney,
    changepoint, Spearman, ACF, Theil-Sen) and their streaming mirrors."""
    dn = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit(SEAS_ANCHOR))
    ).cast("bigint")
    return (
        o.select(
            dn.alias("dn"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("dn")
        .agg(
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )


_DAILY_SQL = f"""
daily AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '{SEAS_ANCHOR}' AS dn,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1)"""

_DAILY_SQL_NORD = f"""
daily AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '{SEAS_ANCHOR}' AS dn,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1)"""


def seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily order-
    revenue series (trend via centered 7-day moving average, day-of-week
    seasonal as the mean detrended value, Cleveland/Makridakis textbook
    form) — the time-series capability next to rel_ewma_per_user /
    rel_decayed_trending: "is Monday systematically below trend?".

    Exactness discipline: daily revenue is an exact BIGINT cent sum; the
    centered moving average is kept as its NUMERATOR (the 7-day sum) so
    the detrended series is computed in SEVENTHS — detr7 = 7·daily −
    trend_sum7, an exact BIGINT — and the one divide per output row
    happens on final exact sums. Calendar gaps are handled honestly: a
    window only yields a trend when all 7 ROWS are 7 CONSECUTIVE days
    (count = 7 AND max(day)−min(day) = 6); sparse stretches contribute
    no detrended samples rather than a silently-wrong mix of
    non-adjacent days. Day-of-week is anchor-Monday modular arithmetic
    (dn % 7, 0 = Monday), not an engine dayofweek() whose numbering
    differs across systems.

    Scale: the daily aggregate is the only pass over orders (map-side
    combine); the ordered window runs over |distinct days| rows — ~2.4k
    for a 7-year lake, bounded by the CALENDAR, not data volume, at any
    corpus scale. The final group-by reduces to 7 rows."""
    return seasonal_from_daily(daily_revenue_cents(spark, sf_dir))


def seasonal_from_daily(daily: DataFrame) -> DataFrame:
    """The decomposition tail over any (dn, cents) daily frame — shared
    with the streaming mirror, whose per-batch daily cent partials merge
    by exact addition into the same series."""
    w = W.orderBy("dn").rowsBetween(-3, 3)
    trended = daily.select(
        "dn",
        "cents",
        F.sum("cents").over(w).alias("trend_sum7"),
        F.count(F.lit(1)).over(w).alias("c7"),
        (F.max("dn").over(w) - F.min("dn").over(w)).alias("span"),
    ).filter((F.col("c7") == 7) & (F.col("span") == 6))
    agg = (
        trended.select(
            F.pmod(F.col("dn"), F.lit(7)).alias("dow_idx"),
            "cents",
            (F.lit(7) * F.col("cents") - F.col("trend_sum7")).alias("detr7"),
        )
        .groupBy("dow_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("cents").cast("bigint").alias("s_cents"),
            F.sum("detr7").cast("bigint").alias("s_detr7"),
        )
    )
    return agg.select(
        "dow_idx",
        "n_days",
        F.round(
            F.col("s_cents").cast("double") / F.col("n_days").cast("double"), 6
        ).alias("mean_daily_cents"),
        F.round(
            F.col("s_detr7").cast("double")
            / (F.lit(7).cast("double") * F.col("n_days").cast("double")),
            6,
        ).alias("seasonal_cents"),
    ).orderBy("dow_idx")


def _seasonal_sql_from(daily_cte: str) -> str:
    """The decomposition SQL over any `daily AS (...)` CTE — shared by the
    batch oracle and the retraction mirror's surviving-orders oracle."""
    return f"""
WITH {daily_cte},
trended AS (
  SELECT dn, cents,
         sum(cents) OVER win AS trend_sum7,
         count(*) OVER win AS c7,
         max(dn) OVER win - min(dn) OVER win AS span
  FROM daily
  WINDOW win AS (ORDER BY dn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
agg AS (
  SELECT dn % 7 AS dow_idx,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS s_cents,
         CAST(sum(7 * cents - trend_sum7) AS BIGINT) AS s_detr7
  FROM trended WHERE c7 = 7 AND span = 6 GROUP BY 1)
SELECT CAST(dow_idx AS BIGINT) AS dow_idx, n_days,
       round(CAST(s_cents AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
         AS mean_daily_cents,
       round(CAST(s_detr7 AS DOUBLE)
             / (CAST(7 AS DOUBLE) * CAST(n_days AS DOUBLE)), 6)
         AS seasonal_cents
FROM agg ORDER BY dow_idx
"""


SEASONAL_SQL = _seasonal_sql_from(_DAILY_SQL)


def _seasonal_retract_sql() -> str:
    """Oracle for the retraction-aware seasonal mirror: the net effect of
    inserts minus cancellations is the decomposition over the surviving
    orders — including the day-granularity consequence that a
    fully-cancelled day leaves the series (and can break a 7-day trend
    window)."""
    return _seasonal_sql_from(
        f"""daily AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '{SEAS_ANCHOR}' AS dn,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % {RETRACT_MOD} <> {RETRACT_RES} GROUP BY 1)"""
    )


MW_WEEKEND = (5, 6)  # dow_idx of Saturday/Sunday under the Monday anchor


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947): is weekend
    daily revenue distributed differently from weekday revenue? The
    nonparametric two-sample test the parametric rel_ab_test_zscore
    can't replace when the distribution is skewed — it compares RANKS,
    so a single whale order can't swing it.

    Exactness discipline: tie-corrected average ranks are kept in
    HALF-UNITS — for a tie group occupying ranks [r, r+t-1] the average
    rank is r + (t-1)/2, so 2·avg = 2r + t − 1, an exact integer from
    one rank() + one count() window — and the rank sum / U statistic
    stay exact BIGINTs (U2 = 2·U). The tie-corrected normal
    approximation (z, with the Σ(t³−t) correction) is a fixed DAG of
    doubles derived from those exact integers — bitwise across engines.
    The rank-biserial effect size r = 1 − U2/(n_a·n_b) rides along.

    Scale: runs on the calendar-bounded daily series
    (daily_revenue_cents), so the global rank window is over ~2.4k rows
    at any corpus scale; the heavy pass is the shared one-scan
    aggregate."""
    return mann_whitney_from_daily(daily_revenue_cents(spark, sf_dir))


def mann_whitney_from_daily(base: DataFrame) -> DataFrame:
    """The rank-sum tail over any (dn, cents) daily frame — shared with
    the streaming mirror (ranks are corpus-global order statistics, so
    emission must re-rank the merged series)."""
    daily = base.select(
        "dn", "cents", F.pmod(F.col("dn"), F.lit(7)).alias("dow")
    )
    is_a = F.col("dow").isin(*MW_WEEKEND)  # sample A: weekend days
    ranked = daily.select(
        is_a.alias("in_a"),
        "cents",
        (
            F.lit(2) * F.rank().over(W.orderBy("cents"))
            + F.count(F.lit(1)).over(W.partitionBy("cents"))
            - F.lit(1)
        ).cast("bigint").alias("rank2"),
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie3")
        )
    )
    agg = ranked.agg(
        F.sum(F.when(F.col("in_a"), F.lit(1)).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(~F.col("in_a"), F.lit(1)).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("rank2")).otherwise(0))
        .cast("bigint")
        .alias("r2_a"),
    ).crossJoin(F.broadcast(ties))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u2_a = F.col("r2_a") - n_a * (n_a + 1)  # 2x the U statistic, exact
    d = lambda c: c.cast("double")  # noqa: E731
    mean_u2 = d(n_a) * d(n_b)  # 2 * (n_a n_b / 2)
    var_u2 = (
        F.lit(4.0)
        * (d(n_a) * d(n_b) / F.lit(12.0))
        * ((d(n) + F.lit(1.0)) - d(F.col("tie3")) / (d(n) * (d(n) - F.lit(1.0))))
    )
    z = (d(u2_a) - mean_u2) / F.sqrt(var_u2)
    return agg.select(
        "n_a",
        "n_b",
        u2_a.alias("u2_a"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(1.0) - d(u2_a) / (d(n_a) * d(n_b)), 6).alias(
            "rank_biserial"
        ),
    )


MANN_WHITNEY_SQL = f"""
WITH {_DAILY_SQL},
dowd AS (SELECT dn, cents, dn % 7 AS dow FROM daily),
ranked AS (
  SELECT dow IN ({", ".join(str(k) for k in MW_WEEKEND)}) AS in_a, cents,
         CAST(2 * rank() OVER (ORDER BY cents)
              + count(*) OVER (PARTITION BY cents) - 1 AS BIGINT) AS rank2
  FROM dowd),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM dowd GROUP BY cents)),
agg AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN rank2 ELSE 0 END) AS BIGINT) AS r2_a
  FROM ranked)
SELECT n_a, n_b,
       r2_a - n_a * (n_a + 1) AS u2_a,
       round((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / sqrt(CAST(4.0 AS DOUBLE)
                    * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       / CAST(12.0 AS DOUBLE))
                    * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
                       - CAST(tie3 AS DOUBLE)
                         / (CAST(n_a + n_b AS DOUBLE)
                            * (CAST(n_a + n_b AS DOUBLE)
                               - CAST(1.0 AS DOUBLE))))), 6) AS z,
       round(CAST(1.0 AS DOUBLE)
             - CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
         AS rank_biserial
FROM agg CROSS JOIN ties
"""


CHG_MIN_SEG = 7  # a split needs >= this many days on each side


def changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single most-likely changepoint in the daily-revenue series by
    binary segmentation (Scott & Knott 1974; the first split of every
    BinSeg/PELT stack): for each admissible split t, the Welch-style
    statistic |mean_L − mean_R| / sqrt(var_L/n_L + var_R/n_R), maximized
    with deterministic ties (earliest day). Means and variances at EVERY
    split come from ONE pair of cumulative windows — prefix Σx and Σx²
    as exact DECIMAL(38,0) sums (the squares overflow BIGINT) — so the
    n-candidate sweep costs one pass over the calendar-bounded series,
    not n passes; every candidate's statistic is the same fixed double
    DAG of exact integers on both engines.

    Output: one row — the argmax split (last day of the left segment),
    segment means, and the statistic. Guards: CHG_MIN_SEG days minimum
    per side; a zero pooled variance (constant series) yields no row
    rather than a division artifact.

    Scale: identical posture to the seasonal/Mann-Whitney family — the
    orders scan is the only data-sized pass; windows run on ~2.4k rows
    bounded by the calendar."""
    return changepoint_from_daily(daily_revenue_cents(spark, sf_dir))


def changepoint_from_daily(daily: DataFrame) -> DataFrame:
    """The BinSeg sweep tail over any (dn, cents) daily frame — shared
    with the streaming mirror (prefix sums are order statistics of the
    merged series, recomputed at emission)."""
    wcum = W.orderBy("dn").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdec = F.col("cents").cast("decimal(18,0)")
    # prefix Σx² overflows BIGINT (squares of daily cents accumulate past
    # 2^63 already at sf0.01) — the exact-moment DECIMAL(38,0) discipline
    pre = daily.select(
        "dn",
        F.row_number().over(W.orderBy("dn")).cast("bigint").alias("i"),
        F.sum(cdec).over(wcum).cast("decimal(38,0)").alias("s"),
        F.sum(cdec * cdec).over(wcum).cast("decimal(38,0)").alias("ss"),
    )
    tot = pre.agg(
        F.max("i").alias("n"), F.max("s").alias("sn"), F.max("ss").alias("ssn")
    )
    c = pre.crossJoin(F.broadcast(tot)).filter(
        (F.col("i") >= CHG_MIN_SEG) & (F.col("n") - F.col("i") >= CHG_MIN_SEG)
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    nl, nr = d("i"), d("n") - d("i")
    ml = d("s") / nl
    mr = (d("sn") - d("s")) / nr
    varl = d("ss") / nl - ml * ml
    varr = (d("ssn") - d("ss")) / nr - mr * mr
    se2 = varl / nl + varr / nr
    stat = F.abs(ml - mr) / F.sqrt(se2)
    scored = c.filter(se2 > 0).select(
        "dn", ml.alias("ml"), mr.alias("mr"), stat.alias("stat")
    )
    best = scored.agg(
        F.max(F.struct(F.col("stat"), (-F.col("dn")).alias("nd"))).alias("b")
    )
    return (
        best.filter(F.col("b").isNotNull())
        .select((-F.col("b.nd")).alias("dn"))
        .join(scored, ["dn"])
        .select(
            F.date_format(
                F.date_add(F.to_date(F.lit(SEAS_ANCHOR)), F.col("dn").cast("int")),
                "yyyy-MM-dd",
            ).alias("split_last_left_day"),
            F.round(F.col("ml"), 6).alias("mean_left_cents"),
            F.round(F.col("mr"), 6).alias("mean_right_cents"),
            F.round(F.col("stat"), 6).alias("welch_stat"),
        )
    )


CHANGEPOINT_SQL = f"""
WITH {_DAILY_SQL},
pre AS (
  SELECT dn,
         CAST(row_number() OVER (ORDER BY dn) AS BIGINT) AS i,
         CAST(sum(CAST(cents AS DECIMAL(18,0)))
              OVER (ORDER BY dn ROWS UNBOUNDED PRECEDING)
              AS DECIMAL(38,0)) AS s,
         CAST(sum(CAST(cents AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0)))
              OVER (ORDER BY dn ROWS UNBOUNDED PRECEDING)
              AS DECIMAL(38,0)) AS ss
  FROM daily),
tot AS (SELECT max(i) AS n, max(s) AS sn, max(ss) AS ssn FROM pre),
c AS (
  SELECT dn,
         CAST(i AS DOUBLE) AS nl, CAST(n - i AS DOUBLE) AS nr,
         CAST(s AS DOUBLE) / CAST(i AS DOUBLE) AS ml,
         (CAST(sn AS DOUBLE) - CAST(s AS DOUBLE)) / CAST(n - i AS DOUBLE) AS mr,
         CAST(ss AS DOUBLE) / CAST(i AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(i AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(i AS DOUBLE)) AS varl,
         (CAST(ssn AS DOUBLE) - CAST(ss AS DOUBLE)) / CAST(n - i AS DOUBLE)
           - ((CAST(sn AS DOUBLE) - CAST(s AS DOUBLE)) / CAST(n - i AS DOUBLE))
             * ((CAST(sn AS DOUBLE) - CAST(s AS DOUBLE)) / CAST(n - i AS DOUBLE))
           AS varr
  FROM pre CROSS JOIN tot
  WHERE i >= {CHG_MIN_SEG} AND n - i >= {CHG_MIN_SEG}),
scored AS (
  SELECT dn, ml, mr,
         abs(ml - mr) / sqrt(varl / nl + varr / nr) AS stat
  FROM c WHERE varl / nl + varr / nr > 0),
best AS (
  SELECT max(struct_pack(stat := stat, nd := -dn)) AS b FROM scored)
SELECT strftime(DATE '{SEAS_ANCHOR}' + CAST(-(b.nd) AS INTEGER), '%Y-%m-%d')
         AS split_last_left_day,
       round(s.ml, 6) AS mean_left_cents,
       round(s.mr, 6) AS mean_right_cents,
       round(s.stat, 6) AS welch_stat
FROM best JOIN scored s ON s.dn = -(best.b.nd)
WHERE best.b IS NOT NULL
"""


def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between l_returnflag and
    l_linestatus, with Cramér's V effect size — the categorical
    counterpart to rel_ab_test_zscore/rel_mann_whitney. Each cell's term
    is kept EXACT as long as possible: (n·n_ij − r_i·c_j)² and
    n·r_i·c_j are DECIMAL(38,0) integer products (the squared numerator
    overflows BIGINT at sf1), one divide per cell, and the ≤|R|·|C|
    cell terms fold in (flag, status) order via a sorted-array aggregate
    so the double sum is arrival-order-free.

    Scale: one map-side-combining count over the fact table; row/col
    totals and n broadcast; everything after operates on ≤9 rows."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    cell = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    rowt = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("r_i")
    )
    colt = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_j")
    )
    tot = li.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dd(F.col("n")) * dd(F.col("n_ij")) - dd(F.col("r_i")) * dd(F.col("c_j"))
    # term = (n*n_ij - r_i*c_j)^2 / (n * r_i * c_j); the extra /n of the
    # textbook (o-e)^2/e cancels against the n^2 in the squared numerator.
    # The difference is computed EXACTLY in DECIMAL(38,0) (products stay
    # under 1e38 to ~1e18 rows), then squared in DOUBLE — squaring in
    # decimal would overflow 38 digits already at ~3e9 rows, and past
    # 2^53 the square carries no extra information the double lacks
    term = (num.cast("double") * num.cast("double")) / (
        dd(F.col("n")) * dd(F.col("r_i")) * dd(F.col("c_j"))
    ).cast("double")
    terms = (
        cell.join(F.broadcast(rowt), "l_returnflag")
        .join(F.broadcast(colt), "l_linestatus")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.struct("l_returnflag", "l_linestatus", term.alias("t")).alias("s"),
        )
    )
    folded = terms.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.aggregate(
            F.sort_array(F.collect_list("s")),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("chi2"),
    )
    r = rowt.agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    c = colt.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    return (
        folded.crossJoin(F.broadcast(r))
        .crossJoin(F.broadcast(c))
        .select(
            "n",
            "r",
            "c",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            F.round(F.col("chi2"), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (d("n") * F.least(d("r") - 1.0, d("c") - 1.0))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


CHI_SQUARE_SQL = """
WITH li AS (SELECT l_returnflag, l_linestatus FROM lineitem),
cell AS (SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_ij
         FROM li GROUP BY 1, 2),
rowt AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS r_i FROM li GROUP BY 1),
colt AS (SELECT l_linestatus, CAST(count(*) AS BIGINT) AS c_j FROM li GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li),
terms AS (
  SELECT n,
         struct_pack(l_returnflag := cell.l_returnflag,
                     l_linestatus := cell.l_linestatus,
                     t := CAST(CAST(n AS DECIMAL(38,0)) * n_ij
                               - CAST(r_i AS DECIMAL(38,0)) * c_j AS DOUBLE)
                          * CAST(CAST(n AS DECIMAL(38,0)) * n_ij
                                 - CAST(r_i AS DECIMAL(38,0)) * c_j AS DOUBLE)
                          / CAST(CAST(n AS DECIMAL(38,0)) * r_i * c_j
                                 AS DOUBLE)) AS s
  FROM cell JOIN rowt USING (l_returnflag)
            JOIN colt USING (l_linestatus) CROSS JOIN tot),
folded AS (
  SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  [x.t for x in list_sort(list(s))]),
                     (acc, x) -> acc + x) AS chi2
  FROM terms GROUP BY n),
rc AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rowt) AS r,
              (SELECT CAST(count(*) AS BIGINT) FROM colt) AS c)
SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       round(chi2, 6) AS chi2,
       round(sqrt(chi2 / (CAST(n AS DOUBLE)
                          * least(CAST(r AS DOUBLE) - 1.0,
                                  CAST(c AS DOUBLE) - 1.0))), 6) AS cramers_v
FROM folded CROSS JOIN rc
"""


def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily order
    count — "do busier days make proportionally more money?" asked
    robustly: Pearson on RANKS is immune to the revenue distribution's
    tail. Tie-corrected average ranks in exact HALF-UNITS (the
    mann_whitney device: 2·avgrank = 2·rank() + count_equal − 1), then
    the Pearson moments of the half-unit ranks as exact BIGINTs — the
    factor 2 cancels in the correlation — and rho is one fixed double
    DAG. Runs on the calendar-bounded daily frame."""
    return spearman_from_daily(daily_revenue_cents(spark, sf_dir))


def spearman_from_daily(daily: DataFrame) -> DataFrame:
    """The rank-correlation tail over any (dn, cents, n_orders) daily
    frame — shared with the streaming mirror (ranks are corpus-global,
    so emission re-ranks the merged series)."""
    rank2 = lambda col: (  # noqa: E731
        F.lit(2) * F.rank().over(W.orderBy(col))
        + F.count(F.lit(1)).over(W.partitionBy(col))
        - F.lit(1)
    ).cast("bigint")
    ranked = daily.select(
        rank2(F.col("cents")).alias("rx"), rank2(F.col("n_orders")).alias("ry")
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return m.select(
        F.col("n").alias("n_days"), F.round(num / den, 6).alias("spearman_rho")
    )


SPEARMAN_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '{SEAS_ANCHOR}' AS dn,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
ranked AS (
  SELECT CAST(2 * rank() OVER (ORDER BY cents)
              + count(*) OVER (PARTITION BY cents) - 1 AS BIGINT) AS rx,
         CAST(2 * rank() OVER (ORDER BY n_orders)
              + count(*) OVER (PARTITION BY n_orders) - 1 AS BIGINT) AS ry
  FROM daily),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy
  FROM ranked)
SELECT n AS n_days,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS spearman_rho
FROM m
"""


ACF_LAGS = (1, 7, 30)  # daily, weekly, monthly autocorrelation


def autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at ACF_LAGS — the
    time-series diagnostic that quantifies what seasonal_decompose
    models (a 7-day rhythm shows up as elevated ACF(7)). Textbook ACF:
    numerator Σ(x_t−μ)(x_{t+k}−μ) over available pairs, denominator
    Σ(x−μ)² over the full series, with the corpus mean μ.

    Exactness: μ = S/n is rational, so both sums are multiplied through
    by n² — n²·num = n²·Σx_t·x_{t+k} − n·S·(Σx_t + Σx_{t+k}) + m·S² and
    n²·den = n²·Σx² − n·S², all DECIMAL(38,0) integer arithmetic — and
    ACF(k) is ONE divide of exact numbers. Calendar gaps: a pair exists
    only when both days do (m is reported).

    Scale: the lag join is dn-keyed on the calendar-bounded frame; the
    lag dimension broadcasts."""
    return acf_from_daily(daily_revenue_cents(spark, sf_dir))


def acf_from_daily(daily: DataFrame) -> DataFrame:
    """The ACF tail over any (dn, cents) daily frame — shared with the
    streaming mirror (a late batch moves μ and every lag pair, so
    emission recomputes over the merged series)."""
    spark = daily.sparkSession
    lags = spark.createDataFrame([(k,) for k in ACF_LAGS], "k bigint")
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("cents").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum(
            F.col("cents").cast("decimal(18,0)")
            * F.col("cents").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    a = daily.select(F.col("dn").alias("dn_a"), F.col("cents").alias("xa"))
    b = daily.select(F.col("dn").alias("dn_b"), F.col("cents").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("dn_b") == F.col("dn_a") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
            F.sum(
                F.col("xa").cast("decimal(18,0)")
                * F.col("xb").cast("decimal(18,0)")
            )
            .cast("decimal(38,0)")
            .alias("sab"),
            F.sum(F.col("xa").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("sa"),
            F.sum(F.col("xb").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("sb"),
        )
    )
    j = pairs.crossJoin(F.broadcast(tot))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = (
        d("n") * d("n") * d("sab")
        - d("n") * d("s") * (d("sa") + d("sb"))
        + d("m") * d("s") * d("s")
    )
    den = d("n") * d("n") * d("sxx") - d("n") * d("s") * d("s")
    return j.select(
        F.col("k").cast("bigint").alias("lag"),
        F.col("m").cast("bigint").alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    ).orderBy("lag")


ACF_SQL = f"""
WITH {_DAILY_SQL},
tot AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(CAST(cents AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s,
         CAST(sum(CAST(cents AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS sxx
  FROM daily),
pairs AS (
  SELECT k,
         CAST(count(*) AS DECIMAL(38,0)) AS m,
         CAST(sum(CAST(a.cents AS DECIMAL(18,0))
                  * CAST(b.cents AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sab,
         CAST(sum(CAST(a.cents AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sa,
         CAST(sum(CAST(b.cents AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sb
  FROM daily a
  CROSS JOIN (VALUES {", ".join(f"({k})" for k in ACF_LAGS)}) ls(k)
  JOIN daily b ON b.dn = a.dn + k
  GROUP BY k),
j AS (SELECT * FROM pairs CROSS JOIN tot)
SELECT CAST(k AS BIGINT) AS lag, CAST(m AS BIGINT) AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
              + CAST(m AS DOUBLE) * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(n AS DOUBLE) * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)),
             6) AS acf
FROM j ORDER BY lag
"""


def theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the daily-revenue series
    (Theil 1950; Sen 1968): slope = median of all pairwise slopes,
    intercept = median of (y − slope·x) — the regression that tolerates
    up to ~29% outliers where rel_ols_regression's least squares would
    chase a single corrupted day. The within-series complement to the
    robust-scale rel_robust_stats_mad.

    Determinism: each pairwise slope is ONE divide of exact BIGINTs (Δ
    cents / Δ days) — the same double on every engine — and both medians
    are exact interpolated order statistics (Spark `percentile` and
    DuckDB `quantile_cont` share the h = (n−1)·q rule, parity probed);
    no accumulation of doubles anywhere.

    Scale: the pair set is CALENDAR² — ~2.9M pairs for a 7-year lake at
    ANY corpus scale (the one data-sized pass is the shared daily
    aggregate), grouped exact-median reduction after. A series that
    grows with data volume (per-key trends over billions of keys) would
    need the sampled variant; for the calendar series the exact kernel
    is the right call."""
    return theil_sen_from_daily(daily_revenue_cents(spark, sf_dir))


def theil_sen_from_daily(daily: DataFrame) -> DataFrame:
    """The pairwise-slope-median tail over any (dn, cents) daily frame —
    shared with the streaming mirror (every pair involving a new day
    changes the median, so emission re-pairs the merged series)."""
    a = daily.select(F.col("dn").alias("dn_a"), F.col("cents").alias("ya"))
    b = daily.select(F.col("dn").alias("dn_b"), F.col("cents").alias("yb"))
    slopes = (
        a.join(b, F.col("dn_b") > F.col("dn_a"))
        .select(
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("dn_b") - F.col("dn_a")).cast("double")
            ).alias("slope")
        )
    )
    med = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("sen_slope"),
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        "n_pairs",
        "sen_slope",
        (
            F.col("cents").cast("double")
            - F.col("sen_slope") * F.col("dn").cast("double")
        ).alias("r"),
    )
    return resid.groupBy("n_pairs", "sen_slope").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("percentile(r, 0.5)").alias("intercept"),
    ).select(
        "n_days",
        "n_pairs",
        F.round(F.col("sen_slope"), 6).alias("sen_slope_cents_per_day"),
        F.round(F.col("intercept"), 6).alias("intercept_cents"),
    )


THEIL_SEN_SQL = f"""
WITH {_DAILY_SQL},
slopes AS (
  SELECT CAST(b.cents - a.cents AS DOUBLE)
         / CAST(b.dn - a.dn AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.dn > a.dn),
med AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         quantile_cont(slope, 0.5) AS sen_slope
  FROM slopes),
resid AS (
  SELECT n_pairs, sen_slope,
         CAST(cents AS DOUBLE) - sen_slope * CAST(dn AS DOUBLE) AS r
  FROM daily CROSS JOIN med)
SELECT CAST(count(*) AS BIGINT) AS n_days, n_pairs,
       round(sen_slope, 6) AS sen_slope_cents_per_day,
       round(quantile_cont(r, 0.5), 6) AS intercept_cents
FROM resid GROUP BY n_pairs, sen_slope
"""


TS_SAMPLE_K = 8  # deterministic sampled partners generated per day
TS_SALT = 16  # parallelism salt for the audit-only exact pair joins


def _seg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(c_mktsegment, day) exact cent totals + order counts — the
    keyed analogue of daily_revenue_cents, shared by the sampled-pairs
    trend family (Theil-Sen, Kendall)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )
    dn = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit(SEAS_ANCHOR))
    ).cast("bigint")
    return (
        o.join(c, "o_custkey")
        .select(
            "seg",
            dn.alias("dn"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("seg", "dn")
        .agg(
            F.sum("cents").cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )


def _seg_ranked(daily: DataFrame) -> DataFrame:
    """Adds the per-segment 0-based day index i and segment day count n —
    the coordinates the deterministic pair sampler draws over."""
    return daily.select(
        "*",
        (F.row_number().over(W.partitionBy("seg").orderBy("dn")) - 1)
        .cast("bigint")
        .alias("i"),
        F.count(F.lit(1))
        .over(W.partitionBy("seg"))
        .cast("bigint")
        .alias("n"),
    )


def _seg_sampled_pairs(ranked: DataFrame) -> DataFrame:
    """The deterministic-hash sampled pair set (seg, lo, hi): each indexed
    day draws TS_SAMPLE_K partners j = (i + 1 + u32(md5(seg:i:r)) mod
    (n−1)) mod n — a pure hash of row identity, so the pair SET is a
    deterministic function of the data alone (replayable in any engine,
    arrival-order-free). O(n·K) pairs per key instead of n·(n−1)/2."""
    gen = ranked.filter(F.col("n") >= 2).select(
        "seg",
        "i",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(TS_SAMPLE_K - 1))).alias("r"),
    )
    u = _kmv_u32(F.concat_ws(":", F.col("seg"), F.col("i"), F.col("r")))
    j = (F.col("i") + F.lit(1) + (u % (F.col("n") - F.lit(1)))) % F.col("n")
    return gen.select(
        "seg",
        F.least(F.col("i"), j).alias("lo"),
        F.greatest(F.col("i"), j).alias("hi"),
    ).distinct()


_SEG_SAMPLED_CTES = f"""sdaily AS (
  SELECT c.c_mktsegment AS seg,
         CAST(CAST(o.o_orderdate AS DATE) - DATE '{SEAS_ANCHOR}' AS BIGINT) AS dn,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT seg, dn, cents, n_orders,
         CAST(row_number() OVER (PARTITION BY seg ORDER BY dn) - 1 AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS n
  FROM sdaily),
gen AS (
  SELECT seg, i, n, r
  FROM ranked CROSS JOIN (SELECT unnest(generate_series(0, {TS_SAMPLE_K - 1})) AS r) rs
  WHERE n >= 2),
jj AS (
  SELECT seg, i,
         (i + 1 + ({_kmv_u32_sql("seg || ':' || i || ':' || r")} % (n - 1))) % n AS j
  FROM gen),
pairs AS (
  SELECT DISTINCT seg, least(i, j) AS lo, greatest(i, j) AS hi FROM jj)"""


TS_SEL_BUCKETS = 4096  # value-range buckets for distributed median selection


def _exact_median_by_selection(slopes: DataFrame) -> DataFrame:
    """Exact per-key interpolated median of a (seg, slope) frame by
    DISTRIBUTED SELECTION — the r11-VERDICT floor fix for the
    theil-sen audit branch: Spark's `percentile` UDAF buffers every
    group value in one task's heap (PercentileBase keeps a value→count
    map and materializes the sorted scan at eval — the measured ~14 s
    sf-independent floor, and an OOM under default executor heap),
    which caps exact medians at per-group-fits-in-memory. Selection
    replaces it with three bounded relational steps, none of which
    ever holds a group in one place:

      1. one narrow pass for per-key (count, min, max) — the target
         ranks k_lo = floor(0.5·(n−1)), k_hi = ceil of the 0-based
         sorted order, exactly Spark percentile's interpolation inputs;
      2. a TS_SEL_BUCKETS-way value-range histogram (floor of the
         affine map is monotone under IEEE, so bucket order = value
         order and equal values share a bucket) + a keys×B running sum
         to locate the bucket(s) holding k_lo/k_hi;
      3. a sort of ONLY those buckets (expected n/B rows each,
         partitioned by (key, bucket)) to read off the two order
         statistics, then Spark's own formula
         (k_hi − rank)·v_lo + (rank − k_lo)·v_hi verbatim.

    The result is the identical multiset median — same value, not an
    approximation — with the one data-sized structure (the slope frame)
    localCheckpointed so the histogram and candidate passes reuse it.
    Pathological skew (≫n/B of a key's mass in one bucket) would just
    make step 3's sort bigger; a second bucketing level inside the hot
    bucket is the standard escalation if a lake ever exhibits it.

    Returns (seg, n_pairs_exact, slope_exact)."""
    from ..operators.checkpoints import tracked_local_checkpoint

    slopes, _ = tracked_local_checkpoint(slopes, register=True)
    rank = F.lit(0.5) * (F.col("n_pairs_exact") - 1).cast("double")
    stats = (
        slopes.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs_exact"),
            F.min("slope").alias("mn"),
            F.max("slope").alias("mx"),
        )
        .select(
            "seg",
            "n_pairs_exact",
            "mn",
            "mx",
            rank.alias("rk"),
            F.floor(rank).cast("bigint").alias("k_lo"),
            F.ceil(rank).cast("bigint").alias("k_hi"),
        )
    )
    bkt = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor(
                (F.col("slope") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(float(TS_SEL_BUCKETS))
            ).cast("bigint"),
            F.lit(TS_SEL_BUCKETS - 1).cast("bigint"),
        )
    )
    bucketed = slopes.join(F.broadcast(stats), "seg").select(
        "seg", "slope", bkt.alias("bkt")
    )
    before = W.partitionBy("seg").orderBy("bkt").rowsBetween(
        W.unboundedPreceding, -1
    )
    sel = (
        bucketed.groupBy("seg", "bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn(
            "base",
            F.coalesce(F.sum("c").over(before), F.lit(0).cast("bigint")),
        )
        .join(stats.select("seg", "k_lo", "k_hi"), "seg")
        .filter(
            (
                (F.col("k_lo") >= F.col("base"))
                & (F.col("k_lo") < F.col("base") + F.col("c"))
            )
            | (
                (F.col("k_hi") >= F.col("base"))
                & (F.col("k_hi") < F.col("base") + F.col("c"))
            )
        )
        .select("seg", "bkt", "base")
    )
    wrn = W.partitionBy("seg", "bkt").orderBy("slope")
    cand = bucketed.join(F.broadcast(sel), ["seg", "bkt"]).select(
        "seg",
        "slope",
        (F.row_number().over(wrn) - 1 + F.col("base"))
        .cast("bigint")
        .alias("r"),
    )
    vals = cand.join(
        F.broadcast(stats.select("seg", "k_lo", "k_hi")), "seg"
    ).filter((F.col("r") == F.col("k_lo")) | (F.col("r") == F.col("k_hi")))
    med = vals.groupBy("seg").agg(
        F.min(F.when(F.col("r") == F.col("k_lo"), F.col("slope"))).alias(
            "v_lo"
        ),
        F.min(F.when(F.col("r") == F.col("k_hi"), F.col("slope"))).alias(
            "v_hi"
        ),
    )
    # Spark PercentileBase's interpolation, verbatim
    interp = F.when(F.col("k_lo") == F.col("k_hi"), F.col("v_lo")).otherwise(
        (F.col("k_hi").cast("double") - F.col("rk")) * F.col("v_lo")
        + (F.col("rk") - F.col("k_lo").cast("double")) * F.col("v_hi")
    )
    return (
        stats.join(med, "seg")
        .select("seg", "n_pairs_exact", interp.alias("slope_exact"))
    )


def theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Theil-Sen via DETERMINISTIC-HASH PAIR SAMPLING, audited
    against the exact per-key fit — the scale path rel_theil_sen's
    docstring promises for series that grow with data volume: the exact
    estimator needs all n·(n−1)/2 pairwise slopes per key, quadratic in
    series length and hopeless over billions of keys; the sampled
    variant generates O(n·K) pairs per key instead — each indexed day i
    picks K partners j = (i + 1 + u32(md5(key:i:r)) mod (n−1)) mod n,
    a pure hash of row identity (the stratified-sample gate / Poisson
    bootstrap discipline), so the pair SET is a deterministic function
    of the data alone: replayable in any engine, arrival-order-free,
    no RNG state. Median-of-sampled-slopes converges to the true Sen
    slope (it is a U-statistic subsample estimate; Dillencourt/Matoušek
    lineage of sampled Theil-Sen).

    Audited, not asserted: the lake's per-segment series are
    calendar-bounded, so the EXACT per-segment fit is computable here
    and rides along — one row per c_mktsegment with exact vs sampled
    slope, both pair volumes, and the absolute error. On a true
    billions-of-keys workload only the sampled columns survive; this
    query is the measured evidence for trusting them.

    Determinism discipline: every slope is one divide of exact BIGINTs;
    both medians are exact interpolated order statistics (percentile /
    quantile_cont parity); the sampled pair set is DISTINCT normalized
    (lo, hi) index pairs — identical in both engines by construction.

    Scale: the one data-sized pass is the (seg, day) aggregate; pair
    generation is an explode(K) over the per-seg day table joined back
    by (seg, index) equi-keys — never a quadratic join; the exact-fit
    audit columns are the only CALENDAR²-bounded stage and are exactly
    what the billions-of-keys deployment drops."""
    from ..operators.checkpoints import tracked_local_checkpoint

    # the calendar-bounded (seg, day) frame feeds four branches (ranked,
    # exact a/b sides, ndays) — checkpoint once so orders+customer scan once
    daily, _ = tracked_local_checkpoint(_seg_daily(spark, sf_dir), register=True)
    return theil_sen_sampled_from_seg_daily(daily)


def theil_sen_sampled_from_seg_daily(daily: DataFrame) -> DataFrame:
    """The sampler + dual-median tail over any (seg, dn, cents, …) daily
    frame — shared with the streaming mirror, whose per-batch keyed daily
    cent partials merge by exact addition into the same frame."""
    ranked = _seg_ranked(daily)
    pairs = _seg_sampled_pairs(ranked)
    pa = ranked.select(
        "seg",
        F.col("i").alias("lo"),
        F.col("dn").alias("dn_a"),
        F.col("cents").alias("ya"),
    )
    pb = ranked.select(
        "seg",
        F.col("i").alias("hi"),
        F.col("dn").alias("dn_b"),
        F.col("cents").alias("yb"),
    )
    slope = (F.col("yb") - F.col("ya")).cast("double") / (
        F.col("dn_b") - F.col("dn_a")
    ).cast("double")
    samp = (
        pairs.join(pa, ["seg", "lo"])
        .join(pb, ["seg", "hi"])
        .select("seg", slope.alias("slope"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs_sampled"),
            F.expr("percentile(slope, 0.5)").alias("slope_sampled"),
        )
    )
    # the audit-only exact branch joins on just |segments| keys — salt the
    # a-side by dn mod TS_SALT (b-side replicated TS_SALT x) so the pair
    # build runs |segments|·TS_SALT-way parallel instead of |segments|-way;
    # the pair set (and thus the exact median) is unchanged
    a = daily.select(
        "seg",
        F.col("dn").alias("dn_a"),
        F.col("cents").alias("ya"),
        F.pmod(F.col("dn"), F.lit(TS_SALT)).alias("salt"),
    )
    b = daily.select(
        "seg", F.col("dn").alias("dn_b"), F.col("cents").alias("yb")
    ).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(TS_SALT - 1))).alias("salt")
    )
    slopes = (
        a.join(b, ["seg", "salt"])
        .filter(F.col("dn_b") > F.col("dn_a"))
        .select("seg", slope.alias("slope"))
    )
    exact = _exact_median_by_selection(slopes)
    ndays = daily.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        ndays.join(exact, "seg")
        .join(samp, "seg")
        .select(
            "seg",
            "n_days",
            "n_pairs_exact",
            "n_pairs_sampled",
            F.round(F.col("slope_exact"), 6).alias("slope_exact"),
            F.round(F.col("slope_sampled"), 6).alias("slope_sampled"),
            F.round(F.abs(F.col("slope_sampled") - F.col("slope_exact")), 6).alias(
                "slope_abs_err"
            ),
        )
        .orderBy("seg")
    )


THEIL_SEN_SAMPLED_SQL = f"""
WITH {_SEG_SAMPLED_CTES},
samp AS (
  SELECT p.seg,
         CAST(count(*) AS BIGINT) AS n_pairs_sampled,
         quantile_cont(CAST(pb.cents - pa.cents AS DOUBLE)
                       / CAST(pb.dn - pa.dn AS DOUBLE), 0.5) AS slope_sampled
  FROM pairs p
  JOIN ranked pa ON pa.seg = p.seg AND pa.i = p.lo
  JOIN ranked pb ON pb.seg = p.seg AND pb.i = p.hi
  GROUP BY 1),
exact AS (
  SELECT a.seg,
         CAST(count(*) AS BIGINT) AS n_pairs_exact,
         quantile_cont(CAST(b.cents - a.cents AS DOUBLE)
                       / CAST(b.dn - a.dn AS DOUBLE), 0.5) AS slope_exact
  FROM sdaily a JOIN sdaily b ON b.seg = a.seg AND b.dn > a.dn
  GROUP BY 1),
nd AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_days FROM sdaily GROUP BY 1)
SELECT nd.seg AS seg, n_days, n_pairs_exact, n_pairs_sampled,
       round(slope_exact, 6) AS slope_exact,
       round(slope_sampled, 6) AS slope_sampled,
       round(abs(slope_sampled - slope_exact), 6) AS slope_abs_err
FROM nd JOIN exact ON exact.seg = nd.seg JOIN samp ON samp.seg = nd.seg
ORDER BY seg
"""


def kendall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Kendall τ-b (daily revenue vs order count, per
    c_mktsegment) from the SAME deterministic-hash sampled pair set as
    rel_theil_sen_sampled — the second consumer that makes the sampler a
    family: concordance statistics are pair-set aggregates, so the
    identical O(n·K) pair generation feeds a different kernel with zero
    new state. The exact per-segment τ-b rides along as audit columns
    (the lake's segments are calendar-bounded; a billions-of-keys
    deployment keeps only the sampled columns) — τ-b over a sampled pair
    set is a U-statistic subsample estimate of the population τ.

    Same determinism discipline as the parent queries: signs are exact
    integer signum products, counts are BIGINTs, the one double is the
    final τ-b divide, and the sampled pair SET is a pure function of the
    data (md5-u32 row-identity draws, DISTINCT normalized index pairs).

    Scale: the one data-sized pass is the shared (seg, day) aggregate;
    sampled pair generation is explode(K) + (seg, index) equi-joins; the
    exact branch is the audit-only CALENDAR²-bounded stage."""
    from ..operators.checkpoints import tracked_local_checkpoint

    daily, _ = tracked_local_checkpoint(_seg_daily(spark, sf_dir), register=True)
    return kendall_sampled_from_seg_daily(daily)


def kendall_sampled_from_seg_daily(daily: DataFrame) -> DataFrame:
    """The sampler + dual-concordance tail over any (seg, dn, cents,
    n_orders) daily frame — shared with the streaming mirror."""
    ranked = _seg_ranked(daily)
    pairs = _seg_sampled_pairs(ranked)

    def tau_agg(p: DataFrame, n_name: str, tau_name: str) -> DataFrame:
        agg = p.groupBy("seg").agg(
            F.count(F.lit(1)).cast("bigint").alias("n0"),
            F.sum(F.when((F.col("sx") * F.col("sy")) == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
            F.sum(F.when((F.col("sx") * F.col("sy")) == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("d"),
            F.sum(F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1).otherwise(0))
            .cast("bigint")
            .alias("tx"),
            F.sum(F.when((F.col("sy") == 0) & (F.col("sx") != 0), 1).otherwise(0))
            .cast("bigint")
            .alias("ty"),
            F.sum(F.when((F.col("sx") == 0) & (F.col("sy") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("txy"),
        )
        dd = lambda c: F.col(c).cast("double")  # noqa: E731
        tau = (dd("c") - dd("d")) / F.sqrt(
            (dd("n0") - dd("tx") - dd("txy")) * (dd("n0") - dd("ty") - dd("txy"))
        )
        return agg.select(
            "seg",
            F.col("n0").alias(n_name),
            F.round(tau, 6).alias(tau_name),
        )

    sx = F.signum((F.col("xb") - F.col("xa")).cast("double")).cast("bigint")
    sy = F.signum((F.col("yb") - F.col("ya")).cast("double")).cast("bigint")
    pa = ranked.select(
        "seg",
        F.col("i").alias("lo"),
        F.col("cents").alias("xa"),
        F.col("n_orders").alias("ya"),
    )
    pb = ranked.select(
        "seg",
        F.col("i").alias("hi"),
        F.col("cents").alias("xb"),
        F.col("n_orders").alias("yb"),
    )
    samp = tau_agg(
        pairs.join(pa, ["seg", "lo"])
        .join(pb, ["seg", "hi"])
        .select("seg", sx.alias("sx"), sy.alias("sy")),
        "n_pairs_sampled",
        "tau_b_sampled",
    )
    a = daily.select(
        "seg",
        F.col("dn").alias("dn_a"),
        F.col("cents").alias("xa"),
        F.col("n_orders").alias("ya"),
    )
    b = daily.select(
        "seg",
        F.col("dn").alias("dn_b"),
        F.col("cents").alias("xb"),
        F.col("n_orders").alias("yb"),
    )
    exact = tau_agg(
        a.join(b, "seg")
        .filter(F.col("dn_b") > F.col("dn_a"))
        .select("seg", sx.alias("sx"), sy.alias("sy")),
        "n_pairs_exact",
        "tau_b_exact",
    )
    ndays = daily.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        ndays.join(exact, "seg")
        .join(samp, "seg")
        .select(
            "seg",
            "n_days",
            "n_pairs_exact",
            "n_pairs_sampled",
            "tau_b_exact",
            "tau_b_sampled",
            F.round(F.abs(F.col("tau_b_sampled") - F.col("tau_b_exact")), 6).alias(
                "tau_abs_err"
            ),
        )
        .orderBy("seg")
    )


def _kendall_tau_sql_frag(src: str, cond: str) -> str:
    return f"""
  SELECT seg, CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN sx = 0 AND sy != 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN sy = 0 AND sx != 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS txy
  FROM ({src}) {cond} GROUP BY seg"""


KENDALL_SAMPLED_SQL = f"""
WITH {_SEG_SAMPLED_CTES},
sp AS ({_kendall_tau_sql_frag(
    f'''SELECT p.seg AS seg,
        CAST(sign(pb.cents - pa.cents) AS BIGINT) AS sx,
        CAST(sign(pb.n_orders - pa.n_orders) AS BIGINT) AS sy
    FROM pairs p
    JOIN ranked pa ON pa.seg = p.seg AND pa.i = p.lo
    JOIN ranked pb ON pb.seg = p.seg AND pb.i = p.hi''', '')}),
ex AS ({_kendall_tau_sql_frag(
    '''SELECT a.seg AS seg,
        CAST(sign(b.cents - a.cents) AS BIGINT) AS sx,
        CAST(sign(b.n_orders - a.n_orders) AS BIGINT) AS sy
    FROM sdaily a JOIN sdaily b ON b.seg = a.seg AND b.dn > a.dn''', '')}),
nd AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_days FROM sdaily GROUP BY 1),
taus AS (
  SELECT nd.seg AS seg, n_days,
         ex.n0 AS n_pairs_exact, sp.n0 AS n_pairs_sampled,
         round(CAST(ex.c - ex.d AS DOUBLE)
               / sqrt(CAST(ex.n0 - ex.tx - ex.txy AS DOUBLE)
                      * CAST(ex.n0 - ex.ty - ex.txy AS DOUBLE)), 6) AS tau_b_exact,
         round(CAST(sp.c - sp.d AS DOUBLE)
               / sqrt(CAST(sp.n0 - sp.tx - sp.txy AS DOUBLE)
                      * CAST(sp.n0 - sp.ty - sp.txy AS DOUBLE)), 6) AS tau_b_sampled
  FROM nd JOIN ex ON ex.seg = nd.seg JOIN sp ON sp.seg = nd.seg)
SELECT seg, n_days, n_pairs_exact, n_pairs_sampled,
       tau_b_exact, tau_b_sampled,
       round(abs(tau_b_sampled - tau_b_exact), 6) AS tau_abs_err
FROM taus ORDER BY seg
"""


def numeric_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group numeric distribution summary (mean, population variance,
    skewness, excess kurtosis) of order value — the moments companion to
    rel_table_profile's categorical profile, done in the OLS moment
    discipline: ONE map-side-combining pass accumulates exact
    DECIMAL(38,0) raw power sums S1..S4 of integer cents, and the four
    shape statistics are a fixed DAG of doubles derived from those exact
    integers (identical in both engines):

        mean = S1/n;  var = S2/n − mean²
        skew = (S3/n − 3·mean·S2/n + 2·mean³) / var^1.5
        kurt = (S4/n − 4·mean·S3/n + 6·mean²·S2/n − 3·mean⁴) / var² − 3

    Integer bound, stated: cents ≤ ~6e7, so S4 terms reach ~1.3e31 and a
    DECIMAL(38,0) sum holds to ~7.6e6 rows PER GROUP at the max price —
    fine for this lake's groups; beyond that the documented widening is
    hierarchical two-limb decimal accumulation (same plan, two columns),
    not doubles. Degenerate groups (var = 0) report NULL shape stats.

    Scale: one scan, |groups|-sized output, no second pass — the reason
    raw moments beat the two-pass centered formulas at 100 TB."""
    o = load(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d38 = "decimal(38,0)"
    agg = (
        o.select(F.col("o_orderpriority").alias("grp"), c.alias("c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("c").cast(d38)).cast(d38).alias("s1"),
            F.sum((F.col("c") * F.col("c")).cast(d38)).cast(d38).alias("s2"),
            F.sum(
                (F.col("c").cast(d38) * F.col("c") * F.col("c")).cast(d38)
            )
            .cast(d38)
            .alias("s3"),
            F.sum(
                (
                    F.col("c").cast(d38)
                    * F.col("c")
                    * F.col("c")
                    * F.col("c")
                ).cast(d38)
            )
            .cast(d38)
            .alias("s4"),
        )
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd
    m3 = F.col("s3").cast("double") / nd
    m4 = F.col("s4").cast("double") / nd
    var = m2 - m1 * m1
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / F.pow(
        var, F.lit(1.5)
    )
    kurt = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / (var * var) - F.lit(3.0)
    return agg.select(
        "grp",
        "n",
        F.round(m1, 6).alias("mean_cents"),
        F.round(var, 6).alias("var_cents2"),
        F.when(var > 0, F.round(skew, 6)).alias("skewness"),
        F.when(var > 0, F.round(kurt, 6)).alias("excess_kurtosis"),
    ).orderBy("grp")


NUMERIC_SUMMARY_SQL = """
WITH agg AS (
  SELECT o_orderpriority AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s2,
         CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c) AS DECIMAL(38,0)) AS s3,
         CAST(sum(CAST(c AS DECIMAL(38,0)) * c * c * c) AS DECIMAL(38,0)) AS s4
  FROM (SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders) t
  GROUP BY 1),
m AS (
  SELECT grp, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS m3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS m4
  FROM agg)
SELECT grp, n,
       round(m1, 6) AS mean_cents,
       round(m2 - m1 * m1, 6) AS var_cents2,
       CASE WHEN m2 - m1 * m1 > 0 THEN
         round((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
               / pow(m2 - m1 * m1, 1.5), 6) END AS skewness,
       CASE WHEN m2 - m1 * m1 > 0 THEN
         round((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
                - 3.0 * m1 * m1 * m1 * m1)
               / ((m2 - m1 * m1) * (m2 - m1 * m1)) - 3.0, 6) END
         AS excess_kurtosis
FROM m ORDER BY grp
"""


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over the orders table — the DESCRIBE/SUMMARY class
    of warehouse operator (per column: row count, null count, exact
    distinct count, lexicographic min/max, modal value + its support)
    done as ONE scan: every column is projected to a canonical string,
    the projections explode into (column, value) rows inside the scan
    stage, and everything downstream aggregates the (column, value)
    count table. The modal value breaks count ties by value ascending —
    deterministic in both engines.

    Canonicalization is part of the operator contract: doubles render as
    exact cent BIGINTs and timestamps as yyyy-MM-dd strings, because
    engine-native double→string casts are NOT portable (Spark prints
    scientific notation where DuckDB prints decimals) and a profiler
    whose output depends on the engine is not a profiler.

    Scale: one scan; the explode multiplies rows by |columns| but
    collapses immediately into the map-side-combining (column, value)
    aggregate — the same cost class as |columns| separate GROUP BYs
    fused into one pass; per-column reductions then run over
    distinct-value-sized frames."""
    o = load(spark, sf_dir, "orders")
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("o_orderstatus", F.col("o_orderstatus")),
        (
            "o_totalprice_cents",
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        ),
        (
            "o_orderdate",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
        ),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    vals = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("c"), e.alias("v"))
                    for n, e in cols
                ]
            )
        ).alias("cv")
    ).select(F.col("cv.c").alias("c"), F.col("cv.v").alias("v"))
    counts = vals.groupBy("c", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    nn = counts.filter(F.col("v").isNotNull())
    rn = F.row_number().over(
        W.partitionBy("c").orderBy(F.col("cnt").desc(), F.col("v").asc())
    )
    top = (
        nn.select("c", "v", "cnt", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .select("c", F.col("v").alias("top_val"), F.col("cnt").alias("top_count"))
    )
    per = counts.groupBy("c").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.count(F.when(F.col("v").isNotNull(), F.lit(1)))
        .cast("bigint")
        .alias("n_distinct"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
    return (
        per.join(top, "c", "left")
        .select(
            F.col("c").alias("column_name"),
            "n_rows",
            "n_null",
            "n_distinct",
            "min_val",
            "max_val",
            "top_val",
            "top_count",
        )
        .orderBy("column_name")
    )


def _table_profile_sql() -> str:
    projections = [
        ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
        ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        ("o_orderstatus", "o_orderstatus"),
        (
            "o_totalprice_cents",
            "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)",
        ),
        ("o_orderdate", "strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')"),
        ("o_orderpriority", "o_orderpriority"),
    ]
    union = " UNION ALL ".join(
        f"SELECT '{n}' AS c, {e} AS v FROM orders" for n, e in projections
    )
    return f"""
WITH vals AS ({union}),
counts AS (SELECT c, v, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY 1, 2),
top AS (
  SELECT c, v AS top_val, cnt AS top_count
  FROM (SELECT c, v, cnt,
               row_number() OVER (PARTITION BY c ORDER BY cnt DESC, v ASC) AS rn
        FROM counts WHERE v IS NOT NULL) t
  WHERE rn = 1),
per AS (
  SELECT c,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
         CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
         min(v) AS min_val,
         max(v) AS max_val
  FROM counts GROUP BY c)
SELECT per.c AS column_name, n_rows, n_null, n_distinct,
       min_val, max_val, top_val, top_count
FROM per LEFT JOIN top ON top.c = per.c
ORDER BY column_name
"""


GINI_TOP_PCTS = (1, 10)  # top-share cutoffs reported next to the Gini


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across customers: the Gini coefficient plus
    top-1%/top-10% revenue shares — "how unequal is our customer base"
    (CR-k / Lorenz analytics). Gini from the rank form of the Lorenz
    integral: G = (2·Σ i·x_(i) )/(n·Σx) − (n+1)/n over customers sorted
    ascending by exact cent totals (ties broken by custkey, which leaves
    G invariant because equal values commute in Σ i·x_(i)).

    Exactness: per-customer totals are exact BIGINT cents; Σ i·x_(i) is
    a DECIMAL(38,0) sum of integer products; top-k% cutoffs are integer
    ranks (ceil division); every reported number is one divide of exact
    integers.

    Scale: the ranking window runs over the CUSTOMER DIMENSION — the
    same posture as rel_rfm_segments' quintile boundaries: orders of
    magnitude smaller than the fact table and already what a warehouse
    materializes. At a customer dimension too large for one sort, the
    rel_rfm_sketch_boundaries route (mergeable quantile sketch) is the
    documented approximation path."""
    return gini_from_per_customer(
        customer_cents_partial(load(spark, sf_dir, "orders"))
    )


def customer_cents_partial(o: DataFrame) -> DataFrame:
    """Per-customer exact cent totals over any orders-shaped frame — a
    whole lake or one micro-batch; BIGINT sums merge by addition (the
    rfm_partial posture), shared with the streaming Gini mirror."""
    return o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )


def gini_from_per_customer(per: DataFrame) -> DataFrame:
    """The Lorenz/Gini tail over any (o_custkey, cents) frame — shared
    with the streaming mirror (ranks are global order statistics over
    the merged customer dimension)."""
    ranked = per.select(
        "cents",
        F.row_number().over(W.orderBy("cents", "o_custkey")).cast("bigint").alias("i"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("cents").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("six"),
    )
    # top-k% share: the k% highest-ranked customers (ceil(n*k/100) of them)
    shares = []
    for pct in GINI_TOP_PCTS:
        cut = F.ceil(F.col("n") * pct / 100).cast("bigint")
        shares.append(
            F.sum(F.when(F.col("i") > F.col("n") - cut, F.col("cents")).otherwise(0))
            .cast("decimal(38,0)")
            .alias(f"top{pct}_cents")
        )
    topc = ranked.crossJoin(
        F.broadcast(agg.select("n"))
    ).agg(*shares)
    j = agg.crossJoin(F.broadcast(topc))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    gini = (
        F.lit(2.0) * d("six") / (d("n") * d("sx"))
        - (d("n") + F.lit(1.0)) / d("n")
    )
    sel = [
        F.col("n").alias("n_customers"),
        F.round(gini, 6).alias("gini"),
    ]
    for pct in GINI_TOP_PCTS:
        sel.append(
            F.round(d(f"top{pct}_cents") / d("sx"), 6).alias(f"top{pct}pct_share")
        )
    return j.select(*sel)


def _gini_sql() -> str:
    share_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN i > n - CAST(ceil(n * {pct} / 100.0) AS BIGINT)"
        f" THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS top{pct}_cents"
        for pct in GINI_TOP_PCTS
    )
    share_sel = ",\n       ".join(
        f"round(CAST(top{pct}_cents AS DOUBLE) / CAST(sx AS DOUBLE), 6)"
        f" AS top{pct}pct_share"
        for pct in GINI_TOP_PCTS
    )
    return f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
  FROM per),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(i AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS six
  FROM ranked),
topc AS (
  SELECT {share_cols}
  FROM ranked CROSS JOIN (SELECT n FROM agg) a)
SELECT n AS n_customers,
       round(2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
       {share_sel}
FROM agg CROSS JOIN topc
"""


KM_CENSOR_DAYS = 90  # still ordering within this window of lake end = alive


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer LIFETIME (days between a
    customer's first and last order), right-censored (Kaplan & Meier
    1958): a customer whose last order falls within KM_CENSOR_DAYS of
    the lake's end is still "alive" — their lifetime is a lower bound,
    exactly what the KM estimator exists to handle and what a naive
    average-lifetime metric silently gets wrong. One row per distinct
    lifetime with an observed churn: at-risk count, churned, censored,
    and S(t) = Π(1 − dᵤ/nᵤ).

    Determinism: lifetimes / at-risk / churn counts are exact integers
    (at-risk via one reverse cumulative window — no per-t rescan); the
    product is exp(Σ ln(1 − d/n)) folded CUMULATIVELY IN t-ORDER, so
    both engines evaluate the identical ln/exp chain (the
    lm_logprob_from_pairs ordered-fold discipline); an S(t) that
    reaches exactly zero (everyone churns at the max lifetime) is
    emitted as 0 rather than exp(ln 0).

    Scale: one map-side-combining pass over orders to the customer
    dimension, one count-aggregate to distinct lifetimes (bounded by
    the CALENDAR — ≤ ~2.4k rows at any corpus scale), cumulative
    windows over that bounded frame."""
    return km_from_spans(km_span_partial(load(spark, sf_dir, "orders")))


def km_span_partial(o: DataFrame) -> DataFrame:
    """Per-customer (first, last) order-date span over any orders-shaped
    frame — min/max are distributive, so per-batch partials merge by
    min-of-mins / max-of-maxes; shared with the streaming KM mirror."""
    return o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("f"),
        F.max(F.col("o_orderdate").cast("date")).alias("l"),
    )


def km_from_spans(spans: DataFrame) -> DataFrame:
    """The product-limit tail over any (o_custkey, f, l) span frame —
    merges partials first (so the batch query and the mirror share one
    code path), then lifetimes, censoring against the lake end, at-risk
    reverse window and the ordered ln fold."""
    spans = spans.groupBy("o_custkey").agg(
        F.min("f").alias("f"), F.max("l").alias("l")
    )
    lake_end = spans.agg(F.max("l").alias("end"))
    per = spans.crossJoin(F.broadcast(lake_end)).select(
        F.datediff("l", "f").cast("bigint").alias("t"),
        (F.datediff("end", "l") < F.lit(KM_CENSOR_DAYS)).alias("alive"),
    )
    by_t = per.groupBy("t").agg(
        F.sum(F.when(~F.col("alive"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.sum(F.when(F.col("alive"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    w_at_risk = W.orderBy("t").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    risky = by_t.select(
        "t",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(w_at_risk).cast("bigint").alias("n"),
    )
    term = F.when(
        F.col("d") > 0,
        F.log(
            (F.col("n") - F.col("d")).cast("double") / F.col("n").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    curved = risky.select(
        "t",
        "n",
        "d",
        "c",
        F.sum(term).over(w_cum).alias("lns"),
        F.max(F.when(F.col("d") == F.col("n"), 1).otherwise(0))
        .over(w_cum)
        .alias("hit_zero"),
    )
    return (
        curved.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("t_days"),
            F.col("n").alias("n_at_risk"),
            F.col("d").alias("d_churned"),
            F.col("c").alias("c_censored"),
            F.round(
                F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                    F.exp(F.col("lns"))
                ),
                6,
            ).alias("survival"),
        )
        .orderBy("t_days")
    )


KAPLAN_MEIER_SQL = f"""
WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
lake_end AS (SELECT max(d) AS e FROM o),
per AS (
  SELECT CAST(max(d) - min(d) AS BIGINT) AS t,
         (SELECT e FROM lake_end) - max(d) < {KM_CENSOR_DAYS} AS alive
  FROM o GROUP BY o_custkey),
by_t AS (
  SELECT t,
         CAST(sum(CASE WHEN alive THEN 0 ELSE 1 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN alive THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM per GROUP BY t),
risky AS (
  SELECT t, d, c,
         CAST(sum(d + c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
  FROM by_t),
curved AS (
  SELECT t, n, d, c,
         sum(CASE WHEN d > 0
                  THEN ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
                  ELSE 0.0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lns,
         max(CASE WHEN d = n THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hit_zero
  FROM risky)
SELECT t AS t_days, n AS n_at_risk, d AS d_churned, c AS c_censored,
       round(CASE WHEN hit_zero = 1 THEN 0.0 ELSE exp(lns) END, 6) AS survival
FROM curved WHERE d > 0 ORDER BY t_days
"""


MARKOV_ROUNDS = 20  # lazy-walk power iterations (delta column audits)
MARKOV_SCALE = 1_000_000_000_000  # total stationary mass in micro-units
MARKOV_QSCALE = 1_000_000  # transition probs quantized to 1e-6 units


def markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain over
    event types — "where do users spend their time in the long run",
    the chain-level summary behind rel_session_paths' raw paths: build
    the transition matrix from consecutive events per user, then
    MARKOV_ROUNDS lazy-walk power iterations π' = ½π + ½πP (laziness
    guarantees aperiodicity, so oscillating chains still converge).

    INTEGER MICRO-UNIT discipline, with a twist that improves on
    pagerank_integer's overflow bound: transition probabilities are
    pre-quantized to MARKOV_QSCALE units (q = c·1e6 // r ≤ 1e6 BY
    CONSTRUCTION), so π·q ≤ 1e12·1e6 < 2^63 for ANY transition-count
    magnitude. The one remaining integer bound is the quantization
    itself: c·QSCALE < 2^63 ⇒ per-cell transition counts below ~9.2e12
    (beyond that, count transitions in coarser units first). Each
    round leaks ≤1 unit per edge (floor division) — bias ~1e-6·|E| of
    total mass, irrelevant at distribution granularity. States with no
    outgoing transitions (a type seen only at session ends) get an
    explicit self-loop — the standard absorbing-sink fix, applied
    identically in the oracle. The max |π₂₀ − π₁₉| delta rides along as
    the convergence audit.

    Scale: the transition matrix is |types|² (tiny); the one data-sized
    pass is the per-user lead() window (user-keyed partitions — no
    global order); all iterations run on broadcast-sized frames."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c0 = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    states = ev.select(F.col("event_type").alias("s")).distinct()
    return markov_stationary_from_counts(c0, states)


def markov_stationary_from_counts(c0: DataFrame, states: DataFrame) -> DataFrame:
    """Everything downstream of the transition-count build (self-loop
    injection, quantization, the 20 lazy power iterations, the delta
    audit) — the tail shared by the one-shot query and the streaming
    mirror, which merges per-batch boundary-stitched transition partials
    into the same (src, dst, c) frame before calling here."""
    from ..operators.checkpoints import tracked_local_checkpoint

    loops = (
        states.join(c0.select("src").distinct(), states["s"] == c0["src"], "left_anti")
        .select(F.col("s").alias("src"), F.col("s").alias("dst"), F.lit(1).cast("bigint").alias("c"))
    )
    cm = c0.unionByName(loops)
    rt = cm.groupBy("src").agg(F.sum("c").cast("bigint").alias("r"))
    q = (
        cm.join(rt, "src")
        .select(
            "src",
            "dst",
            # exact BIGINT floor division (DIV) — a double `/` would lose
            # exactness past 2^53 and drift from the oracle's `//`
            F.expr(f"(c * CAST({MARKOV_QSCALE} AS BIGINT)) DIV r").alias("q"),
        )
    )
    q, _ = tracked_local_checkpoint(q, register=True)
    # state count rides along as a broadcast 1-row frame — no driver-side
    # action, the plan stays fully lazy (r10 verdict note)
    nn = states.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pi = states.crossJoin(F.broadcast(nn)).select(
        F.col("s").alias("state"),
        F.expr(f"CAST({MARKOV_SCALE} AS BIGINT) DIV n").alias("pi"),
    )
    pi, _ = tracked_local_checkpoint(pi, register=True)
    prev = None
    for _k in range(MARKOV_ROUNDS):
        contrib = (
            pi.join(q, pi["state"] == q["src"])
            .groupBy("dst")
            .agg(
                F.sum(F.expr(f"(pi * q) DIV {MARKOV_QSCALE}"))
                .cast("bigint")
                .alias("s")
            )
        )
        nxt = (
            pi.join(contrib, pi["state"] == contrib["dst"], "left")
            .select(
                "state",
                F.expr("(pi + coalesce(s, CAST(0 AS BIGINT))) DIV 2").alias("pi"),
            )
        )
        nxt, _ = tracked_local_checkpoint(nxt, register=True)
        prev, pi = pi, nxt
    delta = (
        pi.join(
            prev.select(F.col("state").alias("pstate"), F.col("pi").alias("ppi")),
            pi["state"] == F.col("pstate"),
        )
        .agg(
            F.max(F.abs(F.col("pi") - F.col("ppi"))).cast("bigint").alias("max_delta_micro")
        )
    )
    return (
        pi.crossJoin(F.broadcast(delta))
        .select(
            "state",
            F.col("pi").alias("pi_micro"),
            F.round(
                F.col("pi").cast("double") / F.lit(float(MARKOV_SCALE)), 6
            ).alias("pi_prob"),
            "max_delta_micro",
        )
        .orderBy("state")
    )


def _markov_sql(where: str = "") -> str:
    # `where` narrows the event set (e.g. the retraction mirror's
    # survivors-only view: "WHERE event_id % 10 <> 7"); empty = all events.
    ctes = [
        f"""ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
       FROM events {where})""",
        """tr AS MATERIALIZED (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY tsn, event_id) AS dst
  FROM ev)""",
        """c0 AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c
       FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2)""",
        """states AS (SELECT DISTINCT event_type AS s FROM ev)""",
        """cm AS MATERIALIZED (
  SELECT * FROM c0
  UNION ALL
  SELECT s, s, CAST(1 AS BIGINT) FROM states st
  WHERE NOT EXISTS (SELECT 1 FROM c0 WHERE c0.src = st.s))""",
        """rt AS (SELECT src, CAST(sum(c) AS BIGINT) AS r FROM cm GROUP BY src)""",
        f"""q AS MATERIALIZED (
  SELECT cm.src, cm.dst,
         CAST((c * {MARKOV_QSCALE}) // r AS BIGINT) AS q
  FROM cm JOIN rt USING (src))""",
        """nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM states)""",
        f"""p0 AS MATERIALIZED (
  SELECT s AS state, CAST({MARKOV_SCALE} AS BIGINT) // nn.n AS pi
  FROM states, nn)""",
    ]
    for k in range(1, MARKOV_ROUNDS + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
  SELECT p.state,
         CAST((p.pi + coalesce(s.s, CAST(0 AS BIGINT))) // 2 AS BIGINT) AS pi
  FROM p{k - 1} p LEFT JOIN (
    SELECT q.dst AS state,
           CAST(sum((r.pi * q.q) // {MARKOV_QSCALE}) AS BIGINT) AS s
    FROM p{k - 1} r JOIN q ON r.state = q.src
    GROUP BY q.dst) s ON p.state = s.state)"""
        )
    last, prev = f"p{MARKOV_ROUNDS}", f"p{MARKOV_ROUNDS - 1}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
delta AS (
  SELECT CAST(max(abs(a.pi - b.pi)) AS BIGINT) AS max_delta_micro
  FROM {last} a JOIN {prev} b ON a.state = b.state)
SELECT state, pi AS pi_micro,
       round(CAST(pi AS DOUBLE) / CAST({MARKOV_SCALE} AS DOUBLE), 6) AS pi_prob,
       max_delta_micro
FROM {last} CROSS JOIN delta
ORDER BY state"""
    )


def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between daily revenue and daily order count — the
    concordance view of the association rel_spearman_corr measures by
    ranks: τ-b = (C − D) / √((n₀ − t_x)(n₀ − t_y)) from exact pair
    counts (Kendall 1945 tie correction). Unlike Spearman (one double
    rho), EVERYTHING here is an exact BIGINT until the final divide:
    concordant/discordant/tied counts come from one pair join with
    integer sign comparisons — the most oracle-robust correlation in
    the family.

    Scale: the pair set is CALENDAR² (the rel_theil_sen posture, ~2.9M
    bounded pairs at any corpus scale); the one data-sized pass is the
    shared daily aggregate."""
    return kendall_from_daily(daily_revenue_cents(spark, sf_dir))


def kendall_from_daily(daily: DataFrame) -> DataFrame:
    """The concordance tail over any (dn, cents, n_orders) daily frame —
    eighth member of the shared-daily-state mirror family (every pair
    involving a new day changes the counts, so emission re-pairs)."""
    a = daily.select(
        F.col("dn").alias("dn_a"), F.col("cents").alias("xa"), F.col("n_orders").alias("ya")
    )
    b = daily.select(
        F.col("dn").alias("dn_b"), F.col("cents").alias("xb"), F.col("n_orders").alias("yb")
    )
    sx = F.signum((F.col("xb") - F.col("xa")).cast("double")).cast("bigint")
    sy = F.signum((F.col("yb") - F.col("ya")).cast("double")).cast("bigint")
    pairs = a.join(b, F.col("dn_b") > F.col("dn_a")).select(
        sx.alias("sx"), sy.alias("sy")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.sum(F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tx"),
        F.sum(F.when((F.col("sy") == 0) & (F.col("sx") != 0), 1).otherwise(0))
        .cast("bigint")
        .alias("ty"),
        F.sum(F.when((F.col("sx") == 0) & (F.col("sy") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("txy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    tau_b = (dd("c") - dd("d")) / F.sqrt(
        (dd("n0") - dd("tx") - dd("txy")) * (dd("n0") - dd("ty") - dd("txy"))
    )
    return agg.select(
        "n0",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x_only"),
        F.col("ty").alias("ties_y_only"),
        F.col("txy").alias("ties_both"),
        F.round(tau_b, 6).alias("kendall_tau_b"),
    )


KENDALL_SQL = f"""
WITH {_DAILY_SQL_NORD},
pairs AS (
  SELECT CAST(sign(b.cents - a.cents) AS BIGINT) AS sx,
         CAST(sign(b.n_orders - a.n_orders) AS BIGINT) AS sy
  FROM daily a JOIN daily b ON b.dn > a.dn),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN sx = 0 AND sy != 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN sy = 0 AND sx != 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS txy
  FROM pairs)
SELECT n0, c AS concordant, d AS discordant,
       tx AS ties_x_only, ty AS ties_y_only, txy AS ties_both,
       round(CAST(c - d AS DOUBLE)
             / sqrt(CAST(n0 - tx - txy AS DOUBLE)
                    * CAST(n0 - ty - txy AS DOUBLE)), 6) AS kendall_tau_b
FROM agg
"""


TREND_TAU_DAYS = 7.0  # decay half-scale: weight = exp(-age_days / tau)


def decayed_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed trending leaderboard — "what is hot NOW", the
    recency-weighted popularity rank every feed/monitoring stack runs:
    each event contributes exp(-age/τ) with age measured from the
    newest event in the lake, summed per event_type and ranked.

    The INTEGER MICRO-UNIT discipline makes the decayed sum order-free:
    the per-event weight is one exp of an exactly-derived double (age =
    exact nanosecond delta / one double literal), quantized to 1e9
    micro-units by round() — so the per-type total is an exact BIGINT
    fold, bitwise across engines and shuffle orders, where a naive
    double sum would depend on reduction order. Scale: one 1-row max
    broadcast, one map-side-combining sum per type, a ≤|types|-row
    ranking window."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    ref = ev.agg(F.max("ts").alias("ref"))
    age_days = (F.col("ref") - F.col("ts")).cast("double") / F.lit(86400e9)
    w_micro = F.round(F.exp(-age_days / F.lit(TREND_TAU_DAYS)) * F.lit(1e9)).cast(
        "bigint"
    )
    per = (
        ev.crossJoin(F.broadcast(ref))
        .select("event_type", w_micro.alias("w"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("w").cast("bigint").alias("decayed_micro"),
        )
    )
    w_rank = Window.orderBy(F.col("decayed_micro").desc(), F.col("event_type"))
    return per.select(
        "event_type",
        "n_events",
        "decayed_micro",
        F.row_number().over(w_rank).cast("int").alias("trend_rank"),
    ).orderBy("trend_rank")


DECAYED_TRENDING_SQL = f"""
WITH ref AS (SELECT max(epoch_ns(ts)) AS ref FROM events),
per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(exp(-(CAST(ref - epoch_ns(ts) AS DOUBLE)
                                   / CAST(86400e9 AS DOUBLE))
                                 / CAST({TREND_TAU_DAYS} AS DOUBLE))
                             * CAST(1e9 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS decayed_micro
  FROM events CROSS JOIN ref
  GROUP BY event_type)
SELECT event_type, n_events, decayed_micro,
       CAST(row_number() OVER (ORDER BY decayed_micro DESC, event_type)
            AS INTEGER) AS trend_rank
FROM per
ORDER BY trend_rank
"""


# --- approx (rows-only: engines' sketches differ by design) ---------------


# Accuracy band for the approximate-sketch acceptance booleans. Spark's
# approx_count_distinct at rsd=0.01 (~1% std err), its default-accuracy
# percentile_approx, DuckDB's HLL approx_count_distinct, and DuckDB's
# t-digest approx_quantile all sit far inside ±5% on these lakes, so both
# engines deterministically compute TRUE — which is what makes the banded
# boolean a real value oracle for an approximate operator (r7 VERDICT
# item 2: the estimates themselves are engine-specific byte-for-byte, the
# accuracy CLAIM is not).
SKETCH_BAND = 0.05


def _approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw estimates next to their exact counterparts — the pytest accuracy
    bounds consume this; the registered query reduces it to exact values +
    banded booleans so the driver can hash-compare across engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
    )


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-count + approximate median per group, graded by
    a DETERMINISTIC acceptance band: output = exact per-group distinct
    (integer, engine-portable) plus booleans asserting each engine's own
    estimate lands within ±SKETCH_BAND of exact. Engines' sketch internals
    differ by design; the banded claim is identical — so this query is
    fully value-oracled (DuckDB runs its approx_count_distinct /
    approx_quantile through the same band) instead of rows-only.
    Scale: one map-side-combining aggregate; HLL partials are tiny and
    mergeable, exact countDistinct is the only shuffle-heavy leg."""
    g = _approx_distinct_raw(spark, sf_dir)
    band = F.lit(float(SKETCH_BAND))
    return g.select(
        "l_returnflag",
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        (
            F.abs(
                F.col("approx_parts").cast("double")
                / F.col("exact_parts").cast("double")
                - F.lit(1.0)
            )
            <= band
        ).alias("parts_est_within_band"),
        (
            F.abs(
                F.col("approx_median_price") / F.col("exact_median_price")
                - F.lit(1.0)
            )
            <= band
        ).alias("median_est_within_band"),
    )


APPROX_DISTINCT_SQL = f"""
WITH g AS (
  SELECT l_returnflag,
         approx_count_distinct(l_partkey) AS approx_parts,
         count(DISTINCT l_partkey) AS exact_parts,
         approx_quantile(l_extendedprice, 0.5) AS approx_median_price,
         quantile_cont(l_extendedprice, 0.5) AS exact_median_price
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(exact_parts AS BIGINT) AS exact_parts,
       abs(CAST(approx_parts AS DOUBLE) / CAST(exact_parts AS DOUBLE)
           - CAST(1.0 AS DOUBLE)) <= CAST({SKETCH_BAND} AS DOUBLE)
         AS parts_est_within_band,
       abs(CAST(approx_median_price AS DOUBLE)
           / CAST(exact_median_price AS DOUBLE)
           - CAST(1.0 AS DOUBLE)) <= CAST({SKETCH_BAND} AS DOUBLE)
         AS median_est_within_band
FROM g
"""


# --- statistical moments (decimal-exact partial sums => deterministic) -----


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/correlation per group WITHOUT order-dependent float
    summation: all five power sums accumulate in exact DECIMAL (associative
    and commutative -> identical under any partitioning/merge order, i.e.
    deterministic on a 1000-executor cluster), then one fixed double-math
    formula at the end. The native stddev/corr aggregates are fine when
    last-ulp reproducibility doesn't matter; this is the reproducible form.
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - F.lit(1.0))
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return g.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


STATS_MOMENTS_SQL = """
WITH g AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)), 6) AS var_qty,
       round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE))), 6) AS stddev_qty,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price
FROM g
"""


def agg_median_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (selection, not summation -> engine-deterministic) and
    max_by/min_by (no extreme-value ties in this data; the tie-free window
    arg-max form is rel_win_arg_max)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.median("o_totalprice").alias("median_price"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
    )


MEDIAN_ARGMAX_SQL = """
SELECT o_orderstatus,
       median(CAST(o_totalprice AS DOUBLE)) AS median_price,
       arg_max(o_orderkey, o_totalprice) AS priciest_order,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order
FROM orders GROUP BY 1
"""


def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value / last_value / nth_value with
    explicit frames (full-partition frame for last_value — the default
    running frame is the classic gotcha)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    wo = W.partitionBy("o_orderstatus").orderBy("o_orderkey")
    full = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(wo), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wo), 6).alias("cume"),
        F.first_value(F.col("o_totalprice")).over(wo).alias("first_price"),
        F.last_value(F.col("o_totalprice")).over(full).alias("last_price"),
        F.nth_value(F.col("o_totalprice"), 2).over(full).alias("second_price"),
    )


WIN_FRAMES_SQL = """
SELECT o_orderkey, o_orderstatus,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER wf AS last_price,
       nth_value(o_totalprice, 2) OVER wf AS second_price
FROM orders WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey),
       wf AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.left(F.col("p_name"), F.lit(5)).alias("name_l5"),
        F.right(F.col("p_name"), F.lit(3)).alias("name_r3"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.contains(F.col("p_name"), F.lit("gold")).alias("has_gold"),
    )


STRING2_SQL = """
SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       repeat(p_brand, 2) AS brand_x2,
       reverse(p_type) AS type_rev,
       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
       left(p_name, 5) AS name_l5,
       right(p_name, 3) AS name_r3,
       starts_with(p_type, 'PROMO') AS is_promo,
       contains(p_name, 'gold') AS has_gold
FROM part WHERE p_partkey < 500
"""


def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3mo"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        (F.weekday(d) + F.lit(1)).cast("bigint").alias("iso_dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"),
    )


DATE2_SQL = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
       CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_dow,
       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders WHERE o_orderkey < 2000
"""


def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + slicing/search/flatten, all built-ins.

    Array-valued results are serialized with ``to_json`` in the final
    projection (both engines emit e.g. ``[1,2,3]``): the driver's
    correctness canonicalizer hashes cell values and cannot hash raw list
    cells — the array *operations* all still run on real arrays.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    arr = F.sequence(F.lit(1), (F.col("p_size") % 5 + 2).cast("int"))
    return p.select(
        "p_partkey",
        F.to_json(arr).alias("seq"),
        F.to_json(F.slice(arr, 2, 2)).alias("mid"),
        F.array_position(arr, 3).alias("pos3"),
        F.to_json(F.array(arr, arr)).alias("nested"),
        F.to_json(F.flatten(F.array(arr, arr))).alias("flat"),
        F.array_max(arr).cast("bigint").alias("amax"),
        F.to_json(F.reverse(arr)).alias("rev"),
    )


ARRAY2_SQL = """
WITH t AS (
  SELECT p_partkey,
         [CAST(i AS INTEGER) for i in generate_series(1, p_size % 5 + 2)] AS seq
  FROM part WHERE p_partkey < 500
)
SELECT p_partkey,
       to_json(seq)::VARCHAR AS seq,
       to_json(seq[2:3])::VARCHAR AS mid,
       CAST(list_position(seq, 3) AS BIGINT) AS pos3,
       to_json([seq, seq])::VARCHAR AS nested,
       to_json(flatten([seq, seq]))::VARCHAR AS flat,
       CAST(list_max(seq) AS BIGINT) AS amax,
       to_json(list_reverse(seq))::VARCHAR AS rev
FROM t
"""


def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/skew.py) + aggregate. The salt is
    internal: the result is identical to the plain join, which is exactly
    what the oracle checks."""
    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = salted_join(ev, cust, "user_id", "c_custkey", n_salts=8)
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "total_value")
    )


SALTED_JOIN_SQL = f"""
SELECT c.c_nationkey, count(*) AS n_events, {SQL_DSUM('e.value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` into a typed struct over events.props (SURVEY §2 Part B
    names from_json explicitly; rel_json_funcs covers get_json_object), plus
    a to_json round trip and a struct-field predicate."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    s = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        s.getField("k").cast("bigint").alias("k"),
        F.to_json(s).alias("props_rt"),
        (s.getField("k") >= 50).alias("k_high"),
    )


FROM_JSON_SQL = """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k,
       to_json(struct_pack(k := CAST(props->>'k' AS INTEGER)))::VARCHAR AS props_rt,
       CAST(props->>'k' AS BIGINT) >= 50 AS k_high
FROM events WHERE event_id < 500
"""


def range_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via the binned equi-join operator (operators/range_join.py):
    orders matched to NON-uniform price bands [b^2, (b+1)^2) * 20000. The
    oracle uses the naive theta join — equivalence proves the binned plan.
    """
    from ..operators.range_join import range_bin_join

    o = load(spark, sf_dir, "orders")
    bands = spark.range(0, 6).select(
        F.col("id").alias("band_id"),
        (F.col("id") * F.col("id") * F.lit(20000.0)).alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1) * F.lit(20000.0)).alias("hi"),
    )
    j = range_bin_join(o, bands, "o_totalprice", "lo", "hi", bin_size=25000.0)
    return j.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum(F.col("o_totalprice"), "sum_price"),
    )


RANGE_BUCKET_SQL = f"""
WITH bands AS (
  SELECT i AS band_id,
         CAST(i * i AS DOUBLE) * CAST(20000.0 AS DOUBLE) AS lo,
         CAST((i + 1) * (i + 1) AS DOUBLE) * CAST(20000.0 AS DOUBLE) AS hi
  FROM generate_series(0, 5) t(i)
)
SELECT band_id, count(*) AS n,
       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       {SQL_DSUM('o_totalprice')} AS sum_price
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id
"""


def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (selection + one linear
    interpolation; rounded to 4 dp to absorb last-ulp formula differences
    between engines' interpolation orderings)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile("o_totalprice", q), 4).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.5, 0.75, 0.9)
        ],
        F.count(F.lit(1)).alias("n"),
    )


PERCENTILES_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
       count(*) AS n
FROM orders GROUP BY 1
"""


QS_BINS = 512  # equi-width histogram resolution
QS_PCTS = (25, 50, 75, 90, 99)  # integer percents -> exact rational targets


def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate global quantiles via the two-pass equi-width histogram
    sketch — the MERGEABLE scale path next to percentiles_exact (whose
    exact selection needs a per-group sort): pass 1 takes (min, max, n),
    pass 2 builds QS_BINS integer bin counts (map-side combining — bin
    partials merge by addition, the sketch property), and each requested
    percentile interpolates inside the first bin whose cumulative count
    reaches the EXACT integer rank ceil(n*p/100) (computed as
    (n*p + 99) div 100 — no float ceil). One row per percentile with the
    estimate, the exact interpolated percentile, and the guarantee
    boolean |est - exact| <= one bin width — the banded-accuracy
    treatment the HLL sketches established, so accuracy itself is
    value-checked.

    Determinism: bins from floor() on identical doubles; ranks and
    cumulative counts exact integers; the winning bin is a lexicographic
    struct MIN; the estimate is a fixed double dag. The cumulative sum
    windows over the <=QS_BINS-row bin table, never the data (the
    two-level discipline). Streaming variant would freeze [lo, hi] like
    semdedup's frozen quantizer — bin partials then merge across batches
    by plain addition."""
    x = load(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("x"))
    return quantile_sketch_from(x)


def quantile_sketch_from(x: DataFrame) -> DataFrame:
    """The estimate + one-bin-flag tail over a value frame ``x(x)`` —
    shared with the streaming mirror, whose exact (value, count) partials
    reconstruct this frame at emission."""
    est = histogram_quantile_estimates(x, QS_PCTS)
    wexpr = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    return est.select(
        "q_pct",
        "rank",
        "est_q",
        "exact_q",
        (F.abs(F.col("est_q") - F.col("exact_q")) <= wexpr)
        .cast("int")
        .alias("within_one_bin"),
    )


def histogram_quantile_estimates(x: DataFrame, pcts) -> DataFrame:
    """The histogram-sketch quantile kernel over a single-column frame
    ``x(x)``: one row per requested integer percent with the sketch
    estimate, the exact interpolated percentile, the integer rank, and
    the [lo, hi] range (for bin-width guarantees downstream). Shared by
    the standalone sketch query and the RFM boundary-tradeoff audit."""
    mm = x.agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.round(F.percentile("x", p / 100.0), 4).alias(f"ex{p}")
            for p in pcts
        ],
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    binned = (
        x.crossJoin(F.broadcast(mm.select("lo", "hi")))
        .select(
            F.least(
                F.floor((F.col("x") - F.col("lo")) / w).cast("bigint"),
                F.lit(QS_BINS - 1).cast("bigint"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = W.orderBy("bin")
    bins = binned.select(
        "bin",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).cast("bigint").alias("cumb"),
    )
    targets = mm.select(
        "lo",
        "hi",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).cast("bigint").alias("q_pct"),
                        F.col(f"ex{p}").alias("exact_q"),
                    )
                    for p in pcts
                ]
            )
        ).alias("t"),
    ).select(
        "lo",
        "hi",
        "n",
        F.col("t.q_pct").alias("q_pct"),
        F.col("t.exact_q").alias("exact_q"),
        F.expr("(n * t.q_pct + 99) div 100").alias("rank"),
    )
    hit = (
        targets.join(F.broadcast(bins), F.col("cumb") + F.col("c") >= F.col("rank"))
        .groupBy("q_pct", "lo", "hi", "n", "exact_q", "rank")
        .agg(F.min(F.struct("bin", "cumb", "c")).alias("b"))
    )
    wexpr = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    est = F.col("lo") + wexpr * (
        F.col("b.bin").cast("double")
        + (F.col("rank") - F.col("b.cumb")).cast("double")
        / F.col("b.c").cast("double")
    )
    return hit.select(
        "q_pct", "rank", F.round(est, 4).alias("est_q"), "exact_q", "lo", "hi"
    )


def _hist_q_ctes(pcts) -> str:
    """CTE chain (expects ``xs(x)``) ending in ``hq(q_pct, rank, est_q,
    exact_q, lo, hi)`` — the SQL mirror of histogram_quantile_estimates."""
    ex_cols = ", ".join(
        f"round(quantile_cont(x, CAST({p} AS DOUBLE) / CAST(100.0 AS DOUBLE)), 4) AS ex{p}"
        for p in pcts
    )
    t_structs = ", ".join(
        f"struct_pack(q_pct := CAST({p} AS BIGINT), exact_q := ex{p})"
        for p in pcts
    )
    return f"""mm AS (
  SELECT min(x) AS lo, max(x) AS hi, CAST(count(*) AS BIGINT) AS n, {ex_cols}
  FROM xs),
binned AS (
  SELECT least(CAST(floor((x - lo) / ((hi - lo) / CAST({QS_BINS}.0 AS DOUBLE)))
                    AS BIGINT),
               CAST({QS_BINS - 1} AS BIGINT)) AS bin
  FROM xs, mm),
bc AS (SELECT bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bin),
bins AS (
  SELECT bin, c,
         CAST(sum(c) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
              AS BIGINT) AS cumb
  FROM bc),
targets AS (
  SELECT lo, hi, n, t.q_pct AS q_pct, t.exact_q AS exact_q,
         (n * t.q_pct + 99) // 100 AS rank
  FROM mm, LATERAL (SELECT unnest([{t_structs}]) AS t) u),
hit AS (
  SELECT q_pct, lo, hi, n, exact_q, rank,
         min(struct_pack(bin := bin, cumb := cumb, c := c)) AS b
  FROM targets JOIN bins ON cumb + c >= rank
  GROUP BY 1, 2, 3, 4, 5, 6),
hq AS (
  SELECT q_pct, CAST(rank AS BIGINT) AS rank,
         round(lo + ((hi - lo) / CAST({QS_BINS}.0 AS DOUBLE))
                    * (CAST(b.bin AS DOUBLE)
                       + CAST(rank - b.cumb AS DOUBLE) / CAST(b.c AS DOUBLE)),
               4) AS est_q,
         exact_q, lo, hi
  FROM hit)"""


def _quantile_sketch_sql_from(xs_sql: str) -> str:
    """The sketch-vs-exact tail over an arbitrary value source — shared
    by the plain sketch oracle and the retraction-mirror oracle (same
    tail, different xs)."""
    return f"""
WITH xs AS ({xs_sql}),
{_hist_q_ctes(QS_PCTS)}
SELECT q_pct, rank, est_q, exact_q,
       CAST(CASE WHEN abs(est_q - exact_q)
                      <= (hi - lo) / CAST({QS_BINS}.0 AS DOUBLE)
            THEN 1 ELSE 0 END AS INTEGER) AS within_one_bin
FROM hq
"""


def _quantile_sketch_sql() -> str:
    return _quantile_sketch_sql_from("SELECT o_totalprice AS x FROM orders")


RETRACT_MOD = 10
RETRACT_RES = 7  # o_orderkey % 10 = 7: the deterministic cancellation set


def _quantile_sketch_retract_sql() -> str:
    """Oracle for the retraction-aware streaming mirror: the NET effect of
    inserts minus cancellations is simply the sketch over the surviving
    orders — the signed-partial state must land exactly here."""
    return _quantile_sketch_sql_from(
        "SELECT o_totalprice AS x FROM orders"
        f" WHERE o_orderkey % {RETRACT_MOD} <> {RETRACT_RES}"
    )


def _rfm_retract_sql() -> str:
    """Oracle for the KEYED retraction mirror: the identical RFM scoring
    over the surviving orders."""
    return _rfm_sql(
        "(SELECT * FROM orders"
        f" WHERE o_orderkey % {RETRACT_MOD} <> {RETRACT_RES})"
    )


RFM_SK_PCTS = (20, 40, 60, 80)  # the RFM quintile boundaries as int percents


def rfm_sketch_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-vs-sketch percentile-boundary tradeoff, measured (the
    question the streaming RFM mirror's design raised: incremental
    boundaries from a mergeable sketch vs exact recompute): quintile
    boundaries on the RFM monetary dimension from BOTH estimators — the
    exact interpolated percentile rfm_segments ships and the mergeable
    histogram sketch — plus the decision-relevant number: how many
    customers land in a DIFFERENT monetary quintile if the sketch
    boundaries replace the exact ones (n_rescored out of n_customers).
    One row per boundary: exact, sketch, |diff|, one-bin guarantee, and
    the constant rescore columns.

    Determinism: both boundary sets are 4-dp rounds of identical doubles;
    quintile assignment is the same count-of-boundaries-below dag
    rfm_segments uses; the rescore count is an exact integer aggregate.
    Note the flag's honest reading: the sketch's one-bin bound holds vs
    the rank ORDER STATISTIC; vs the INTERPOLATED percentile compared
    here it can exceed one bin when customers are sparse relative to the
    bins (n << QS_BINS — visible at sf0.001 with 150 customers), which
    is itself the diagnostic: sparse bins mean the corpus is too small
    to need the sketch. Scale: the per-customer aggregate + the sketch's
    bin table + two 1-row broadcasts — the sketch side never sorts; at
    stream time its bin partials merge by addition while the exact side
    must re-sort, the tradeoff this table quantifies."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    per = o.groupBy("o_custkey").agg(
        F.sum("p").cast("double").alias("monetary")
    )
    hq = histogram_quantile_estimates(
        per.select(F.col("monetary").alias("x")), RFM_SK_PCTS
    )
    bw = hq.agg(
        *[
            F.max(F.when(F.col("q_pct") == p, F.col("exact_q"))).alias(f"e{p}")
            for p in RFM_SK_PCTS
        ],
        *[
            F.max(F.when(F.col("q_pct") == p, F.col("est_q"))).alias(f"s{p}")
            for p in RFM_SK_PCTS
        ],
    )
    above = lambda pfx: sum(  # noqa: E731
        (F.col("monetary") > F.col(f"{pfx}{p}")).cast("int") for p in RFM_SK_PCTS
    )
    res = (
        per.crossJoin(F.broadcast(bw))
        .select((above("e") != above("s")).cast("int").alias("moved"))
        .agg(
            F.sum("moved").cast("bigint").alias("n_rescored"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
    )
    wexpr = (F.col("hi") - F.col("lo")) / F.lit(float(QS_BINS))
    return hq.crossJoin(F.broadcast(res)).select(
        "q_pct",
        F.col("exact_q").alias("exact_b"),
        F.col("est_q").alias("sketch_b"),
        F.round(F.abs(F.col("est_q") - F.col("exact_q")), 4).alias("abs_diff"),
        (F.abs(F.col("est_q") - F.col("exact_q")) <= wexpr)
        .cast("int")
        .alias("within_one_bin"),
        "n_rescored",
        "n_customers",
    )


def _rfm_sketch_sql() -> str:
    e_cols = ", ".join(
        f"max(CASE WHEN q_pct = {p} THEN exact_q END) AS e{p}" for p in RFM_SK_PCTS
    )
    s_cols = ", ".join(
        f"max(CASE WHEN q_pct = {p} THEN est_q END) AS s{p}" for p in RFM_SK_PCTS
    )
    above_e = " + ".join(
        f"(CASE WHEN monetary > e{p} THEN 1 ELSE 0 END)" for p in RFM_SK_PCTS
    )
    above_s = " + ".join(
        f"(CASE WHEN monetary > s{p} THEN 1 ELSE 0 END)" for p in RFM_SK_PCTS
    )
    return f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY 1),
xs AS (SELECT monetary AS x FROM per),
{_hist_q_ctes(RFM_SK_PCTS)},
bw AS (SELECT {e_cols}, {s_cols} FROM hq),
res AS (
  SELECT CAST(sum(CASE WHEN ({above_e}) != ({above_s}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rescored,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM per, bw)
SELECT q_pct, exact_q AS exact_b, est_q AS sketch_b,
       round(abs(est_q - exact_q), 4) AS abs_diff,
       CAST(CASE WHEN abs(est_q - exact_q)
                      <= (hi - lo) / CAST({QS_BINS}.0 AS DOUBLE)
            THEN 1 ELSE 0 END AS INTEGER) AS within_one_bin,
       n_rescored, n_customers
FROM hq, res
"""


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map from arrays, access/lookup/
    size/keys; map values are projected to scalars or JSON so the driver
    can hash them."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type"), F.lit("size")),
        F.array(F.col("p_brand"), F.col("p_type"), F.col("p_size").cast("string")),
    )
    return p.select(
        "p_partkey",
        F.size(m).cast("bigint").alias("n_entries"),
        F.element_at(m, "brand").alias("brand"),
        F.element_at(m, "missing").alias("missing_is_null"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.map_contains_key(m, "type").alias("has_type"),
    )


MAP_SQL = """
WITH t AS (
  SELECT p_partkey,
         MAP {'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)} AS m
  FROM part WHERE p_partkey < 300
)
SELECT p_partkey,
       CAST(cardinality(m) AS BIGINT) AS n_entries,
       m['brand'][1] AS brand,
       m['missing'][1] AS missing_is_null,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
       list_contains(map_keys(m), 'type') AS has_type
FROM t
"""


def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery: transform / filter / exists /
    forall / aggregate / zip_with over a derived int array. HOF lambdas run
    interpreted (not codegen) — fine off the hot path; hot-path folds live
    in functions/vectors.py with the same primitives."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    arr = F.sequence(F.lit(1), (F.col("p_size") % 6 + 3).cast("int"))
    return p.select(
        "p_partkey",
        F.to_json(F.transform(arr, lambda x: x * x)).alias("squares"),
        F.to_json(F.filter(arr, lambda x: x % 2 == 0)).alias("evens"),
        F.exists(arr, lambda x: x > 5).alias("any_gt5"),
        F.forall(arr, lambda x: x < 100).alias("all_lt100"),
        F.aggregate(arr, F.lit(0), lambda acc, x: acc + x).cast("bigint").alias("total"),
        F.to_json(
            F.zip_with(arr, F.reverse(arr), lambda a, b: a * b)
        ).alias("palindrome_products"),
    )


HOF_SQL = """
WITH t AS (
  SELECT p_partkey,
         [CAST(i AS INTEGER) for i in generate_series(1, p_size % 6 + 3)] AS arr
  FROM part WHERE p_partkey < 300
)
SELECT p_partkey,
       to_json(list_transform(arr, x -> x * x))::VARCHAR AS squares,
       to_json(list_filter(arr, x -> x % 2 = 0))::VARCHAR AS evens,
       len(list_filter(arr, x -> x > 5)) > 0 AS any_gt5,
       len(list_filter(arr, x -> NOT (x < 100))) = 0 AS all_lt100,
       CAST(list_reduce(list_prepend(0, arr), (acc, x) -> acc + x) AS BIGINT) AS total,
       to_json([arr[i] * arr[len(arr) - i + 1] for i in generate_series(1, len(arr))])::VARCHAR AS palindrome_products
FROM t
"""


# --- TPC-H-shape fill (adapted to the synthetic lake's narrower columns) ---


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders with EXISTS a matching
    lineitem (here: a returned item — the lake has no commit/receipt dates).
    Left-semi join, so lineitem contributes at most one match per order and
    only l_orderkey crosses the shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q6_revenue_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filtered aggregate. All three predicates
    reach the parquet scan as PushedFilters; the agg is a one-row partial+
    final with no join — the pushdown showcase."""
    li = load(spark, sf_dir, "lineitem")
    disc_rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.03 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24 AS DOUBLE)
"""


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on returned items.

    Returned lineitems are pre-aggregated per order BEFORE joining orders
    (decimal sums are associative), so the order join carries one row per
    order; the final customer join is a broadcast of the dimension."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    li_rev = li.groupBy("l_orderkey").agg(
        F.sum(revenue_col()).alias("rev_dec"), F.count(F.lit(1)).alias("n_items")
    )
    per_cust = (
        li_rev.join(o, li_rev.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_dec").alias("rev_dec"), F.sum("n_items").alias("n_items"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE) counts over a fact-fact join,
    grouped by return flag (the lake has no shipmode column)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — two exact decimal sums and ONE
    double division at the end (deterministic across engines). Part is a
    broadcast dimension."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", revenue_col()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    agg = j.agg(
        F.sum(promo).alias("promo_dec"), F.sum(revenue_col()).alias("total_dec")
    )
    return agg.select(
        (
            F.lit(100.0) * F.col("promo_dec").cast("double")
            / F.col("total_dec").cast("double")
        ).alias("promo_revenue_pct"),
        F.col("promo_dec").cast("double").alias("promo_revenue"),
        F.col("total_dec").cast("double").alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT CAST(100.0 AS DOUBLE) * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum({SQL_REVENUE}) AS DOUBLE) AS promo_revenue_pct,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING on a pre-aggregated fact), joined back to orders + broadcast
    customer. The heavy lineitem aggregation happens before any join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            fmt_date("o_orderdate", "o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 150) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join on partkey with a residual OR-of-ANDs
    bracket predicate — Catalyst keeps the equi-join (broadcast part) and
    evaluates the disjunction as a post-join filter, instead of a cross
    product."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return j.filter(bracket).agg(
        F.sum(revenue_col()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = f"""
SELECT CAST(sum({SQL_REVENUE}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size <= 15 AND l_quantity >= CAST(1 AS DOUBLE) AND l_quantity <= CAST(11 AS DOUBLE))
   OR (p_brand = 'Brand#12' AND p_size <= 25 AND l_quantity >= CAST(10 AS DOUBLE) AND l_quantity <= CAST(20 AS DOUBLE))
   OR (p_brand = 'Brand#13' AND p_size <= 35 AND l_quantity >= CAST(20 AS DOUBLE) AND l_quantity <= CAST(30 AS DOUBLE))
"""


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other, unlike plain equi-join. Derived nullable keys on both sides;
    still hash-partitionable (NULL is one key), so the scale path is a
    normal shuffled hash join."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 60)
    a = c.select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("k")
    )
    b = s.select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("k")
    )
    return (
        a.join(b, a.k.eqNullSafe(b.k))
        .groupBy(a.k.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


JOIN_NULL_SAFE_SQL = """
WITH a AS (SELECT c_custkey, nullif(c_nationkey % 5, 4) AS k FROM customer WHERE c_custkey <= 200),
     b AS (SELECT s_suppkey, nullif(s_nationkey % 5, 4) AS k FROM supplier WHERE s_suppkey <= 60)
SELECT a.k, count(*) AS n_pairs,
       count(DISTINCT c_custkey) AS n_cust, count(DISTINCT s_suppkey) AS n_supp
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
"""


NANOS_PER_DAY = 86_400_000_000_000


def date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap fill): a generated day spine spanning the
    events table's range, left-joined to per-day counts, emitting zeros for
    missing days. The spine comes from sequence() over the 1-row min/max
    aggregate — generated on executors, no driver loop; at scale a few
    thousand spine rows broadcast to join the daily aggregate."""
    ev = load(spark, sf_dir, "events")
    day = F.expr(f"ts div {NANOS_PER_DAY}").cast("bigint")
    daily = ev.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "day_value")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.date_format(
                F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd"
            ).alias("day_date"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("day_value"), F.lit(0.0)).alias("day_value"),
            (F.col("n").isNull()).alias("is_gap"),
        )
    )


DATE_SPINE_SQL = f"""
WITH daily AS (
  SELECT CAST(epoch_ns(ts) // {NANOS_PER_DAY} AS BIGINT) AS day,
         count(*) AS n, {SQL_DSUM('value')} AS day_value
  FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds)
SELECT s.day,
       strftime(to_timestamp(s.day * 86400), '%Y-%m-%d') AS day_date,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
       coalesce(d.day_value, CAST(0.0 AS DOUBLE)) AS day_value,
       d.n IS NULL AS is_gap
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


def posexplode_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode + struct-array inline battery: posexplode keeps
    the element index; inline expands an array of structs into columns.
    Both are narrow generators — no shuffle."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 120)
    arr = F.sequence(F.lit(10), F.lit(10) + (F.col("p_size") % 4).cast("int"))
    exploded = p.select(
        "p_partkey", F.posexplode(arr).alias("pos", "val")
    )
    structs = p.select(
        "p_partkey",
        F.inline(
            F.array(
                F.struct(F.lit("lo").alias("tag"), (F.col("p_size") % 10).alias("v")),
                F.struct(F.lit("hi").alias("tag"), (F.col("p_size") % 10 + 100).alias("v")),
            )
        ),
    ).select("p_partkey", F.lit(-1).alias("pos"), F.concat(F.col("tag"), F.lit(":"), F.col("v").cast("string")).alias("tagged"))
    return (
        exploded.select(
            "p_partkey",
            F.col("pos").cast("bigint").alias("pos"),
            F.col("val").cast("string").alias("tagged"),
        )
        .unionAll(structs.select("p_partkey", F.col("pos").cast("bigint"), "tagged"))
    )


POSEXPLODE_SQL = """
WITH base AS (SELECT p_partkey, p_size FROM part WHERE p_partkey < 120),
ex AS (
  SELECT p_partkey, CAST(i - 1 AS BIGINT) AS pos,
         CAST(10 + i - 1 AS VARCHAR) AS tagged
  FROM base, LATERAL (SELECT unnest(generate_series(1, p_size % 4 + 1)) AS i) t
),
st AS (
  SELECT p_partkey, CAST(-1 AS BIGINT) AS pos, 'lo:' || CAST(p_size % 10 AS VARCHAR) AS tagged FROM base
  UNION ALL
  SELECT p_partkey, CAST(-1 AS BIGINT) AS pos, 'hi:' || CAST(p_size % 10 + 100 AS VARCHAR) AS tagged FROM base
)
SELECT * FROM ex UNION ALL SELECT * FROM st
"""


def _hll_partial_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL estimates (per-flag partials + the merged global) next to
    exact counts — pytest accuracy bounds consume this; the registered
    query reduces it to exact + banded booleans for the driver oracle."""
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg(F.col("l_partkey")).alias("sk"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    g_exact = li.agg(F.countDistinct("l_partkey").alias("g_exact"))
    merged = (
        per_flag.agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est_parts")
        )
        .crossJoin(g_exact)
        .select(
            F.lit("ALL").alias("l_returnflag"),
            F.col("est_parts").cast("bigint").alias("est_parts"),
            F.col("g_exact").cast("bigint").alias("exact_parts"),
        )
    )
    per = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate(F.col("sk")).cast("bigint").alias("est_parts"),
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
    )
    return per.unionAll(merged)


def hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — the 100 TB cardinality pattern: per-group
    sketch partials (hll_sketch_agg), re-aggregated with hll_union_agg into
    a global estimate WITHOUT touching raw data again. Engines' sketch
    bytes differ by design, so the oracle checks the deterministic
    accuracy CLAIM instead: exact counts (integers, portable) + a boolean
    per row asserting the engine's own estimate is within ±SKETCH_BAND of
    exact — DuckDB's side runs its HLL approx_count_distinct through the
    same band (its global approx over all rows is the semantic mirror of
    merging the partials). The pytest additionally bounds the raw
    estimates via _hll_partial_raw."""
    raw = _hll_partial_raw(spark, sf_dir)
    return raw.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(
                F.col("est_parts").cast("double")
                / F.col("exact_parts").cast("double")
                - F.lit(1.0)
            )
            <= F.lit(float(SKETCH_BAND))
        ).alias("est_within_band"),
    )


HLL_PARTIAL_SQL = f"""
WITH per AS (
  SELECT l_returnflag,
         approx_count_distinct(l_partkey) AS est_parts,
         count(DISTINCT l_partkey) AS exact_parts
  FROM lineitem GROUP BY 1
  UNION ALL
  SELECT 'ALL' AS l_returnflag,
         approx_count_distinct(l_partkey) AS est_parts,
         count(DISTINCT l_partkey) AS exact_parts
  FROM lineitem
)
SELECT l_returnflag, CAST(exact_parts AS BIGINT) AS exact_parts,
       abs(CAST(est_parts AS DOUBLE) / CAST(exact_parts AS DOUBLE)
           - CAST(1.0 AS DOUBLE)) <= CAST({SKETCH_BAND} AS DOUBLE)
         AS est_within_band
FROM per
"""


def scd2_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each customer's order-status
    history becomes validity ranges [valid_from, valid_to) with an
    is_current flag — the standard warehouse dimension-maintenance op,
    expressed as one lead() window per customer partition (parallel across
    customers at scale, no global sort)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        fmt_date("o_orderdate", "valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )


SCD2_SQL = """
SELECT o_custkey, o_orderkey, o_orderstatus,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       coalesce(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'), '9999-12-31') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk a derived supplier tree
    (parent = floor(key/4)) from the roots, computing depth and root — the
    hierarchy/graph-walk surface. The same SQL text runs on both engines;
    iteration count is O(tree depth)."""
    from .tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT s_suppkey, CAST(1 AS BIGINT) AS depth, s_suppkey AS root
          FROM supplier WHERE s_suppkey < 4
          UNION ALL
          SELECT s.s_suppkey, c.depth + 1, c.root
          FROM supplier s JOIN chain c
            ON CAST(floor(s.s_suppkey / 4) AS BIGINT) = c.s_suppkey
          WHERE s.s_suppkey >= 4
        )
        SELECT s_suppkey, depth, root FROM chain
        """
    )


RECURSIVE_CTE_SQL = """
WITH RECURSIVE chain AS (
  SELECT s_suppkey, CAST(1 AS BIGINT) AS depth, s_suppkey AS root
  FROM supplier WHERE s_suppkey < 4
  UNION ALL
  SELECT s.s_suppkey, c.depth + 1, c.root
  FROM supplier s JOIN chain c
    ON CAST(floor(s.s_suppkey / 4) AS BIGINT) = c.s_suppkey
  WHERE s.s_suppkey >= 4
)
SELECT s_suppkey, depth, root FROM chain
"""


SP_ROUNDS = 4  # hop bound K: exact min-cost paths using <= K edges
SP_N_SOURCES = 3


def shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded weighted shortest paths (Bellman-Ford, K=4 rounds) over
    the part CO-PURCHASE graph: parts appearing in the same order are
    connected with distance 1/co-purchase-count (strong affinity = short
    edge); from the 3 smallest part nodes, report the exact minimum-cost
    path using at most K edges to every reachable part. The weighted
    iterative-graph sibling of the min-label connected components — same
    Pregel-as-DataFrames execution (operators/graph.py::bellman_ford),
    value-checked against the identical K rounds unrolled as chained CTEs.

    Determinism: edge weights are rounds of identical doubles; every
    candidate path cost is the same left-to-right double sum in both
    engines and min is an exact comparison, so the fixpoint matches
    bitwise. Scale: per-order pair expansion is quadratic only in ORDER
    size (TPC-H caps at 7 lineitems); each round is ONE shuffle join
    keyed by node + one min-agg with map-side combine, hub skew AQE-split;
    the hop bound caps total shuffles at K regardless of graph size."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return shortest_path_from_pairs(copurchase_pairs(li))


def copurchase_pairs(li: DataFrame) -> DataFrame:
    """(pa, pb, cnt) co-purchase pair counts from a (l_orderkey,
    l_partkey) frame — per-ORDER local, so any order-atomic slicing of
    the lineitem stream yields partials that merge by integer SUM (the
    streaming mirror's state).

    The self-join is pinned at cluster parallelism with one explicit
    REPARTITION_BY_NUM exchange (shared by both sides via exchange
    reuse): the pair expansion + count is compute-dense behind a ~10 MB
    shuffle, so AQE's byte-based coalescing was running it on 3 tasks
    (measured: a 5.4 s single-digit-task stage at sf0.1)."""
    par = li.sparkSession.sparkContext.defaultParallelism
    li = li.repartition(par, "l_orderkey")
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def sym_pair_edges(pr: DataFrame, with_cnt: bool = False) -> DataFrame:
    """Both directions of a (pa, pb[, cnt]) unordered-pair frame as ONE
    explode pass — the same edge multiset as the classic two-leg union,
    but the (possibly expensive) pair derivation is evaluated once instead
    of once per leg. Returns (src, dst[, w])."""
    fields = lambda a, b: (
        F.struct(
            F.col(a).alias("src"),
            F.col(b).alias("dst"),
            *( [F.col("cnt").alias("w")] if with_cnt else [] ),
        )
    )
    both = F.explode(F.array(fields("pa", "pb"), fields("pb", "pa"))).alias("e")
    out = ["e.src", "e.dst"] + (["e.w"] if with_cnt else [])
    return pr.select(both).select(*out)


def shortest_path_from_pairs(pr: DataFrame) -> DataFrame:
    """Weights + symmetrization + source pick + K relaxation rounds over a
    (pa, pb, cnt) pair-count frame — shared with the streaming mirror
    (weights are 1/cnt, so they are only final once all count partials
    merged; emission recomputes them from exact integers).

    The pair frame is materialized ONCE (tracked localCheckpoint): the
    edge list, the source pick and bellman_ford's own edge checkpoint all
    consume it, and without the barrier the (possibly expensive — a fact
    self-join for the batch query) pair derivation evaluated three times
    (two union legs + the source distinct; measured as two extra ~1.5 s
    map stages plus a 10 s distinct stage at sf0.1). Symmetrization is an
    explode of both directions in one pass instead of a two-leg union —
    the same edge multiset, derived once."""
    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.graph import bellman_ford

    pr, _ = tracked_local_checkpoint(pr.select("pa", "pb", "cnt"), register=True)
    w = F.round(F.lit(1.0) / F.col("cnt").cast("double"), 6)
    both = F.explode(
        F.array(
            F.struct(F.col("pa").alias("src"), F.col("pb").alias("dst")),
            F.struct(F.col("pb").alias("src"), F.col("pa").alias("dst")),
        )
    ).alias("e")
    e = pr.select(both, w.alias("w")).select("e.src", "e.dst", "w")
    srcs = (
        e.select("src")
        .distinct()
        .orderBy("src")
        .limit(SP_N_SOURCES)
        .select(F.col("src").alias("node"))
    )
    out = bellman_ford(e, srcs, SP_ROUNDS)
    return out.select("source", "node", F.round("dist", 6).alias("dist"))


SP_AUDIT_ROUNDS = (2, 4, 8)  # is K=4 enough? bracket it one halving each way


def shortest_path_k_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bound sensitivity audit for the shortest-path query ("is K=4
    enough?"): one row per (K, source) for K ∈ {2, 4, 8} over the SAME
    co-purchase graph as rel_shortest_path — reached = nodes reachable
    within K hops, converged = those whose K-hop distance already equals
    the K=8 distance (no shorter ≤8-hop path exists), max_dist = the
    worst distance in the K-hop ball. reached(4)≈reached(8) with
    converged(4)=reached(4) is the quantitative "K=4 suffices" evidence;
    a growing gap says raise K.

    Cost discipline: all three K share ONE relaxation pass (the K=4 state
    IS round 4 of the K=8 run — operators/graph.py::bellman_ford_snapshots),
    so the audit costs max(K) shuffle rounds + three converged-join
    aggregates over (|sources|·|nodes|)-sized frames, not |K| full runs.
    Distances compare by exact double equality: every candidate path cost
    is the identical left-to-right double sum in both engines and min is
    an exact comparison, so dist_K == dist_8 is engine-stable."""
    from ..operators.graph import bellman_ford_snapshots

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pr = copurchase_pairs(li)
    w = F.round(F.lit(1.0) / F.col("cnt").cast("double"), 6)
    e = pr.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), w.alias("w")
    ).unionByName(
        pr.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), w.alias("w"))
    )
    srcs = (
        e.select("src")
        .distinct()
        .orderBy("src")
        .limit(SP_N_SOURCES)
        .select(F.col("src").alias("node"))
    )
    snaps = bellman_ford_snapshots(e, srcs, list(SP_AUDIT_ROUNDS))
    kmax = max(SP_AUDIT_ROUNDS)
    final = snaps[kmax].select(
        "source", "node", F.col("dist").alias("dist_final")
    )
    parts = []
    for k in SP_AUDIT_ROUNDS:
        agg = (
            snaps[k]
            .join(final, ["source", "node"])  # dist never leaves, so ⊆ holds
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("reached"),
                F.sum(
                    F.when(F.col("dist") == F.col("dist_final"), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("converged"),
                F.round(F.max("dist"), 6).alias("max_dist"),
            )
            .select(
                F.lit(k).cast("int").alias("k"),
                "source",
                "reached",
                "converged",
                "max_dist",
            )
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


LP_ROUNDS = 4  # synchronous label-propagation rounds (fixed → deterministic)


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label-propagation communities over the part co-purchase
    graph (edge weight = co-purchase COUNT — integer affinity, heavier =
    stronger pull): 4 synchronous plurality-vote rounds from self-labels,
    then one row per community (label, n_members, min/max member). The
    modularity-flavored sibling of connected components: components ignore
    weights and flood to the diameter; LPA lets strong co-purchase cliques
    keep their own label against weakly-attached bridges.

    Determinism (the classic LPA pitfall): synchronous schedule + integer
    vote totals (exact order-free BIGINT sums) + total tie order (max
    total, then smallest label) — no RNG, no visit-order dependence, so
    the DuckDB oracle replays the identical rounds as unrolled CTEs.
    Scale: each round = one shuffle join keyed by node + a two-level agg
    with map-side combine; fixed rounds cap total shuffles; hub skew
    AQE-splits (operators/graph.py::label_propagation)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return label_propagation_from_pairs(copurchase_pairs(li))


def label_propagation_from_pairs(pr: DataFrame) -> DataFrame:
    """The symmetrize + vote + report tail of
    :func:`label_propagation_communities`, shared with the streaming
    incremental mirror (which feeds MERGED batch pair partials — vote
    weights are the corpus-global counts, so they must merge first)."""
    from ..operators.graph import label_propagation

    e = sym_pair_edges(pr, with_cnt=True)
    lab = label_propagation(e, LP_ROUNDS)
    return lab.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").alias("min_member"),
        F.max("node").alias("max_member"),
    )


def _label_propagation_sql() -> str:
    ctes = [
        """li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT pa AS src, pb AS dst, cnt AS w FROM pr
  UNION ALL
  SELECT pb, pa, cnt FROM pr),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e)"""
    ]
    # each l{k} is referenced twice by round k+1 (vote join + keep-label
    # left join) — MATERIALIZED stops DuckDB's inlining from doubling the
    # plan per round (same fix as _sp_chain_ctes)
    for k in range(1, LP_ROUNDS + 1):
        ctes.append(
            f"""w{k} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, l.label,
           row_number() OVER (
             PARTITION BY e.dst
             ORDER BY sum(e.w) DESC, l.label ASC) AS rn
    FROM e JOIN l{k - 1} l ON e.src = l.node
    GROUP BY e.dst, l.label) x
  WHERE rn = 1),
l{k} AS MATERIALIZED (
  SELECT p.node, coalesce(w.label, p.label) AS label
  FROM l{k - 1} p LEFT JOIN w{k} w ON p.node = w.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members,
       min(node) AS min_member, max(node) AS max_member
FROM l{LP_ROUNDS} GROUP BY label"""
    )


PR_ROUNDS = 5
PR_TOPK = 20


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part co-purchase graph (edge weight =
    co-purchase count), 5 rounds of the INTEGER MICRO-UNIT fixed-point
    iteration (operators/graph.py::pagerank_integer — every per-round sum
    is an exact order-free BIGINT fold, so the result is engine-bitwise),
    reporting the top-20 hub parts by rank with a total (rank DESC, node
    ASC) tie order. Completes the graph-family ladder: reachability
    (components), proximity (Bellman-Ford), community (LPA), centrality
    (PageRank) — all on one derived graph, all Pregel-as-DataFrames.

    Scale: per round one |V|-vs-|E| shuffle join keyed by node + a summed
    agg with map-side combine; the out-weight-annotated edge table
    checkpoints once; top-k is TakeOrderedAndProject, never a global
    sort. The symmetric graph has no sinks, so no dangling-mass term."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return pagerank_from_pairs(copurchase_pairs(li))


def pagerank_from_pairs(pr: DataFrame) -> DataFrame:
    """The symmetrize + iterate + top-k tail of :func:`pagerank_copurchase`,
    shared with the streaming incremental mirror (transition weights and
    out-weight sums are corpus-global counts, so partials merge first)."""
    from ..operators.graph import pagerank_integer

    e = sym_pair_edges(pr, with_cnt=True)
    # check_sinks=False: e is the explicit union of both edge directions
    # two lines up, so every dst is a src by construction
    out = pagerank_integer(e, PR_ROUNDS, check_sinks=False)
    return (
        out.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(PR_TOPK)
        .select("node", F.col("rank").alias("rank_micro"))
    )


def pagerank_chain_ctes(
    pfx: str, edge_cte: str, rounds: int, damping_pct: int = 85
) -> tuple[list[str], str]:
    """CTE chain replaying :func:`operators.graph.pagerank_integer` over
    ``edge_cte(src, dst, w BIGINT)``; returns (ctes, final rank CTE name)
    — final CTE has (node, rank, base). Prefixable so composites (e.g.
    the NSW-graph centrality prior in plans/llm.py) can run the chain
    over their own derived edge list in one statement. Every round CTE is
    referenced twice (teleport leg + contribution join) — MATERIALIZED
    for the same inlining-blowup reason as _sp_chain_ctes."""
    from ..operators.graph import PAGERANK_SCALE

    scale = PAGERANK_SCALE
    tele = 100 - damping_pct
    ctes = [
        f"""{pfx}deg AS MATERIALIZED (
  SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM {edge_cte} GROUP BY src)""",
        f"""{pfx}e AS MATERIALIZED (
  SELECT t.src, t.dst, t.w, d.sw FROM {edge_cte} t JOIN {pfx}deg d ON t.src = d.src)""",
        f"""{pfx}nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {pfx}deg)""",
        f"""{pfx}r0 AS MATERIALIZED (
  SELECT d.src AS node,
         CAST({scale} AS BIGINT) // nn.n AS rank,
         (CAST({tele} AS BIGINT) * (CAST({scale} AS BIGINT) // nn.n)) // 100 AS base
  FROM {pfx}deg d, {pfx}nn nn)""",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""{pfx}r{k} AS MATERIALIZED (
  SELECT p.node,
         CAST(p.base + (CAST({damping_pct} AS BIGINT) *
              coalesce(s.s, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS rank,
         p.base
  FROM {pfx}r{k - 1} p LEFT JOIN (
    SELECT e.dst AS node, CAST(sum((r.rank * e.w) // e.sw) AS BIGINT) AS s
    FROM {pfx}r{k - 1} r JOIN {pfx}e e ON r.node = e.src
    GROUP BY e.dst) s ON p.node = s.node)"""
        )
    return ctes, f"{pfx}r{rounds}"


def _pagerank_sql() -> str:
    ctes = [
        """li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e0 AS (
  SELECT pa AS src, pb AS dst, CAST(cnt AS BIGINT) AS w FROM pr
  UNION ALL
  SELECT pb, pa, CAST(cnt AS BIGINT) FROM pr)"""
    ]
    chain, final = pagerank_chain_ctes("", "e0", PR_ROUNDS)
    ctes += chain
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, rank AS rank_micro FROM {final}
ORDER BY rank DESC, node ASC LIMIT {PR_TOPK}"""
    )


KC_KS = (2, 3, 4)  # report the 2-, 3- and 4-core
KC_ROUNDS = 6  # peel rounds per k (bounded; the converged flag audits it)


def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the part co-purchase graph — the COHESION
    member completing the graph-family ladder (reachability = components,
    proximity = Bellman-Ford, community = LPA, centrality = PageRank,
    cohesion = k-core): one row per k ∈ {2,3,4} with the bounded-peel
    core size (nodes, undirected edges, min/max member) and a converged
    flag — survivor sets only shrink, so equal consecutive counts proves
    the true k-core was reached within the round budget (Seidman 1983;
    the hop-bounded-Bellman-Ford posture applied to peeling).

    Pure integer counts end to end — no floats — so the DuckDB oracle
    replays the identical peel rounds as unrolled MATERIALIZED CTEs.
    Scale: the derived edge table localCheckpoints ONCE and is shared by
    all three k legs; each round is two edge-vs-survivor semi-joins + one
    count-agg with map-side combine (operators/graph.py::k_core_survivors);
    the final edge-count legs are semi-joins collapsing to 1-row aggs."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return kcore_from_pairs(copurchase_pairs(li))


def kcore_from_pairs(pr: DataFrame) -> DataFrame:
    """The peel + report tail of :func:`kcore_decomposition`, shared with
    the streaming incremental mirror (which feeds MERGED batch pair
    partials instead of the one-shot ``copurchase_pairs``)."""
    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.graph import k_core_survivors

    e, _ = tracked_local_checkpoint(sym_pair_edges(pr), register=True)
    parts = []
    for k in KC_KS:
        prev, fin = k_core_survivors(e, k, KC_ROUNDS, checkpoint_edges=False)
        f = fin.groupBy().agg(
            F.count(F.lit(1)).cast("bigint").alias("core_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        p = prev.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("prev_nodes"))
        alive = e.join(fin, e["src"] == fin["node"], "left_semi")
        alive = alive.join(fin, alive["dst"] == fin["node"], "left_semi")
        ec = alive.groupBy().agg(F.expr("count(1) DIV 2").alias("core_edges"))
        parts.append(
            f.crossJoin(p)
            .crossJoin(ec)
            .select(
                F.lit(k).cast("int").alias("k"),
                "core_nodes",
                "core_edges",
                (F.col("core_nodes") == F.col("prev_nodes")).alias("converged"),
                "min_node",
                "max_node",
            )
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


def _kcore_sql() -> str:
    ctes = [
        """li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM pr
  UNION ALL
  SELECT pb, pa FROM pr),
s0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)"""
    ]
    # each survivor CTE is referenced three times (both endpoint joins of
    # the next round + the final legs) — MATERIALIZED for the same
    # inlining-blowup reason as _sp_chain_ctes
    for k in KC_KS:
        for r in range(1, KC_ROUNDS + 1):
            prev = "s0" if r == 1 else f"k{k}r{r - 1}"
            ctes.append(
                f"""k{k}r{r} AS MATERIALIZED (
  SELECT e.src AS node FROM e
  JOIN {prev} a ON e.src = a.node
  JOIN {prev} b ON e.dst = b.node
  GROUP BY e.src
  HAVING count(*) >= {k})"""
            )
    legs = []
    last, before = KC_ROUNDS, KC_ROUNDS - 1
    for k in KC_KS:
        legs.append(
            f"""SELECT CAST({k} AS INTEGER) AS k,
       f.core_nodes, ec.core_edges,
       f.core_nodes = p.prev_nodes AS converged,
       f.min_node, f.max_node
FROM (SELECT CAST(count(*) AS BIGINT) AS core_nodes,
             min(node) AS min_node, max(node) AS max_node
        FROM k{k}r{last}) f,
     (SELECT CAST(count(*) AS BIGINT) AS prev_nodes FROM k{k}r{before}) p,
     (SELECT CAST(count(*) // 2 AS BIGINT) AS core_edges
        FROM e JOIN k{k}r{last} a ON e.src = a.node
               JOIN k{k}r{last} b ON e.dst = b.node) ec"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(legs)


KCN_KMAX = 6  # decompose cores up to k=6 (coreness capped at kmax)
KCN_ROUNDS = 6  # peel rounds per k, same bounded budget as KC_ROUNDS


def core_numbers_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-node core-number decomposition of the part co-purchase
    graph — the fifth rung of the graph ladder (r9 VERDICT item 4): where
    ``rel_kcore_decomposition`` reports the k∈{2,3,4} core SIZES, this
    answers the per-node question ("what is THIS part's coreness") for
    every node, coreness = 1 + #{k in 2..KCN_KMAX : node survives the
    bounded k-peel}, deterministic integers end to end.

    Peel sharing: each k's peel is SEEDED from the (k-1)-peel's survivors
    (cores nest, Seidman 1983; bounded rounds preserve the nesting because
    a peel round is monotone in both arguments) — nothing re-peels from
    scratch, the bellman_ford_snapshots trick applied to peeling. The
    DuckDB oracle replays the identical (KCN_KMAX-1)×KCN_ROUNDS rounds as
    unrolled MATERIALIZED CTEs, so the match is bitwise whether or not a
    given k converged within budget.

    Scale: the edge table localCheckpoints ONCE; every peel round is two
    edge-vs-survivor semi-joins + a count-agg with map-side combine over a
    survivor set that only shrinks; the final assignment is one union of
    kmax-1 |V|-bounded survivor sets + one count-agg + one left join. No
    collect, no per-node loop (operators/graph.py::core_numbers)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return core_numbers_from_pairs(copurchase_pairs(li))


def core_numbers_from_pairs(pr: DataFrame) -> DataFrame:
    """The symmetrize + decompose tail of :func:`core_numbers_copurchase`
    (split out so a streaming mirror can feed merged batch pair partials)."""
    from ..operators.checkpoints import tracked_local_checkpoint
    from ..operators.graph import core_numbers

    e, _ = tracked_local_checkpoint(sym_pair_edges(pr), register=True)
    # checkpoint_edges=False: copurchase_pairs emits one row per unordered
    # pair, so the symmetrized union is distinct by construction
    return core_numbers(
        e, KCN_KMAX, KCN_ROUNDS, checkpoint_edges=False
    ).orderBy("node")


def _core_numbers_sql() -> str:
    ctes = [
        """li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM pr
  UNION ALL
  SELECT pb, pa FROM pr),
s0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)"""
    ]
    # chained seeds: k's first round peels the (k-1)-final survivors —
    # the same peel sharing the Spark operator does; MATERIALIZED for the
    # same doubly-referenced-CTE inlining-blowup reason as _kcore_sql
    prev = "s0"
    for k in range(2, KCN_KMAX + 1):
        for r in range(1, KCN_ROUNDS + 1):
            name = f"c{k}r{r}"
            ctes.append(
                f"""{name} AS MATERIALIZED (
  SELECT e.src AS node FROM e
  JOIN {prev} a ON e.src = a.node
  JOIN {prev} b ON e.dst = b.node
  GROUP BY e.src
  HAVING count(*) >= {k})"""
            )
            prev = name
    members = "\n    UNION ALL\n    ".join(
        f"SELECT node FROM c{k}r{KCN_ROUNDS}" for k in range(2, KCN_KMAX + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
members AS ({members})
SELECT n.node, CAST(1 + count(m.node) AS INTEGER) AS core
FROM s0 n LEFT JOIN members m ON n.node = m.node
GROUP BY n.node
ORDER BY n.node"""
    )


def _sp_chain_ctes(max_rounds: int, li_where: str = "") -> str:
    """The co-purchase Bellman-Ford CTE chain d0..d{max_rounds} (shared
    text-shape with _shortest_path_sql, parameterized on depth; li_where
    optionally restricts the lineitem feed — the retraction mirror passes
    the surviving-orders predicate). Every
    d{k} is referenced twice by d{k+1} (union leg + join leg) and the
    audit legs re-reference the snapshots, so each CTE is MATERIALIZED —
    without the hint DuckDB's inlining makes the plan 2^max_rounds-sized
    (measured: K=4 fine, K=8 never finishes)."""
    ctes = [
        """li AS (SELECT l_orderkey, l_partkey FROM lineitem {w}),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT pa AS src, pb AS dst,
         round(CAST(1.0 AS DOUBLE) / CAST(cnt AS DOUBLE), 6) AS w FROM pr
  UNION ALL
  SELECT pb, pa, round(CAST(1.0 AS DOUBLE) / CAST(cnt AS DOUBLE), 6) FROM pr),
s AS (SELECT DISTINCT src AS node FROM e ORDER BY node LIMIT {n}),
d0 AS MATERIALIZED (
  SELECT node AS source, node, CAST(0.0 AS DOUBLE) AS dist FROM s)""".format(
            n=SP_N_SOURCES, w=li_where
        )
    ]
    for k in range(1, max_rounds + 1):
        ctes.append(
            f"""d{k} AS MATERIALIZED (
  SELECT source, node, min(dist) AS dist FROM (
    SELECT source, node, dist FROM d{k - 1}
    UNION ALL
    SELECT d.source, e.dst AS node, d.dist + e.w AS dist
    FROM d{k - 1} d JOIN e ON d.node = e.src
  ) u GROUP BY 1, 2)"""
        )
    return "WITH " + ",\n".join(ctes)


def _shortest_path_k_audit_sql() -> str:
    kmax = max(SP_AUDIT_ROUNDS)
    legs = []
    for k in SP_AUDIT_ROUNDS:
        legs.append(
            f"""SELECT CAST({k} AS INTEGER) AS k, a.source,
       CAST(count(*) AS BIGINT) AS reached,
       CAST(sum(CASE WHEN a.dist = f.dist THEN 1 ELSE 0 END) AS BIGINT) AS converged,
       round(max(a.dist), 6) AS max_dist
FROM d{k} a JOIN d{kmax} f ON a.source = f.source AND a.node = f.node
GROUP BY a.source"""
        )
    return _sp_chain_ctes(kmax) + "\n" + "\nUNION ALL\n".join(legs)


REC_TOP_EDGES = 8  # strongest co-purchase edges kept per node pre-expansion
REC_TOP_K = 3  # recommendations reported per node


def two_hop_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop co-purchase recommendations — "parts frequently bought
    with the parts YOU were bought with, that you were never bought with
    directly": for each node u, candidates v reachable as u→m→v with
    v ≠ u, scored by the integer path weight Σ_m cnt(u,m)·cnt(m,v),
    direct neighbors excluded (the collaborative-filtering item-item
    shape, LinkBench/A-A style, kept exact and deterministic).

    The scale decision is the DEGREE CAP: the raw 2-hop expansion is
    Σ_v deg(v)² — quadratic at hub nodes, the classic blow-up — so each
    node keeps only its REC_TOP_EDGES strongest edges (by count, ties by
    partner id) before expanding, making the expansion ≤ |V|·M² with M
    fixed. That cap is the real-world posture (recommenders prune to
    top-M neighbor lists long before the pair join) and it is part of
    the query's DEFINITION here, so the oracle replays it exactly —
    deterministic ties included.

    Scale: one pair build (shuffle keyed by order), one row_number window
    per node (partition-local sort of ≤deg rows), one M-capped self-join
    keyed by the middle node, one integer sum-agg with map-side combine,
    one anti-join against the direct edges, one final per-node top-k
    window. All counts BIGINT — bitwise across engines."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return two_hop_from_pairs(copurchase_pairs(li))


def two_hop_from_pairs(pr: DataFrame) -> DataFrame:
    """The cap + expand + score tail of :func:`two_hop_recs` — shared with
    the streaming incremental mirror (recommendation scores are corpus-
    global pair counts, so emission expands over the merged state)."""
    from pyspark.sql import Window

    from ..operators.checkpoints import tracked_local_checkpoint

    # the edge table is referenced four times below (both sides of the
    # 2-hop self-join via top, plus the anti-join) — materialize the pair
    # build ONCE instead of re-running the lineitem self-join per reference
    e, _ = tracked_local_checkpoint(
        sym_pair_edges(pr, with_cnt=True).withColumnRenamed("w", "cnt"),
        register=True,
    )
    w_edge = Window.partitionBy("src").orderBy(F.col("cnt").desc(), F.col("dst"))
    top = (
        e.withColumn("rn", F.row_number().over(w_edge))
        .filter(F.col("rn") <= REC_TOP_EDGES)
        .drop("rn")
    )
    a, b = top.alias("a"), top.alias("b")
    cand = (
        a.join(b, (F.col("a.dst") == F.col("b.src")) & (F.col("b.dst") != F.col("a.src")))
        .groupBy(F.col("a.src").alias("node"), F.col("b.dst").alias("rec"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("score"))
    )
    indirect = cand.join(
        e.select(F.col("src").alias("node"), F.col("dst").alias("rec")),
        ["node", "rec"],
        "left_anti",
    )
    w_rec = Window.partitionBy("node").orderBy(F.col("score").desc(), F.col("rec"))
    return (
        indirect.withColumn("rank", F.row_number().over(w_rec))
        .filter(F.col("rank") <= REC_TOP_K)
        .select("node", "rank", "rec", "score")
        .orderBy("node", "rank")
    )


def _two_hop_recs_sql() -> str:
    return f"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pr AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS cnt
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS MATERIALIZED (
  SELECT pa AS src, pb AS dst, cnt FROM pr
  UNION ALL
  SELECT pb, pa, cnt FROM pr),
top AS MATERIALIZED (
  SELECT src, dst, cnt FROM (
    SELECT src, dst, cnt,
           row_number() OVER (PARTITION BY src ORDER BY cnt DESC, dst) AS rn
    FROM e) t
  WHERE rn <= {REC_TOP_EDGES}),
cand AS (
  SELECT a.src AS node, b.dst AS rec,
         CAST(sum(a.cnt * b.cnt) AS BIGINT) AS score
  FROM top a JOIN top b ON a.dst = b.src AND b.dst <> a.src
  GROUP BY 1, 2),
indirect AS (
  SELECT c.node, c.rec, c.score
  FROM cand c ANTI JOIN e ON c.node = e.src AND c.rec = e.dst)
SELECT node, rank, rec, score FROM (
  SELECT node, rec, score,
         CAST(row_number() OVER (PARTITION BY node
                                 ORDER BY score DESC, rec) AS INTEGER) AS rank
  FROM indirect) r
WHERE rank <= {REC_TOP_K}
ORDER BY node, rank"""


def _shortest_path_surviving_sql() -> str:
    """The Bellman-Ford chain over the SURVIVING-orders co-purchase graph
    — oracle for the retraction-aware streaming mirror: the batch answer
    over lineitems whose order was never cancelled."""
    return (
        _sp_chain_ctes(
            SP_ROUNDS,
            li_where=f"WHERE l_orderkey % {RETRACT_MOD} <> {RETRACT_RES}",
        )
        + f"\nSELECT source, node, round(dist, 6) AS dist FROM d{SP_ROUNDS}"
    )


def _shortest_path_sql() -> str:
    # shares _sp_chain_ctes' MATERIALIZED discipline: each d{k} is
    # referenced twice by d{k+1}, so inlining makes the plan 2^K-sized —
    # tolerable at sf0.01, pathological once the 10x sf1 lake multiplies
    # the pair self-join each inlined copy re-runs
    return (
        _sp_chain_ctes(SP_ROUNDS)
        + f"\nSELECT source, node, round(dist, 6) AS dist FROM d{SP_ROUNDS}"
    )


def python_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) applied laterally: each part row expands
    into (p_size % 3 + 1) derived rows. The row-generating escape hatch when
    explode()-able structures can't express the logic; Arrow-batched like
    other Python UDFs. Kept off hot paths by design."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i: bigint, scaled: bigint")
    class Expand:
        def eval(self, key: int, size: int):
            for i in range(size % 3 + 1):
                yield (i, key * 10 + i)

    spark.udtf.register("expand_rows", Expand)
    from .tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_partkey, e.i, e.scaled
        FROM part p, LATERAL expand_rows(p.p_partkey, p.p_size) e
        WHERE p.p_partkey < 150
        """
    )


PYTHON_UDTF_SQL = """
SELECT p_partkey, CAST(i AS BIGINT) AS i,
       CAST(p_partkey * 10 + i AS BIGINT) AS scaled
FROM part, LATERAL (SELECT unnest(generate_series(0, p_size % 3)) AS i) e
WHERE p_partkey < 150
"""


def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured surface (Spark 4): parse_json into a variant,
    typed variant_get extraction, and a to_json round trip — the open-schema
    path for telemetry payloads. Variant's binary encoding scans far faster
    than repeated string JSON parsing at scale."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 800)
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.to_json(v).alias("props_norm"),
    )


VARIANT_SQL = """
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k_typed,
       to_json(json(props))::VARCHAR AS props_norm
FROM events WHERE event_id < 800
"""


# --- TPC-H shape fill (round 2): q7/q8/q9/q13/q15/q16/q17/q22 -------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    Lineitem joins orders (fact-fact, shuffles on orderkey only) then the
    customer and supplier dimensions broadcast with their nation names
    pre-joined; the pair filter keeps both directions."""
    n = load(spark, sf_dir, "nation")
    c = (
        load(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n_items
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year, {SQL_REVENUE} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
) t
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly revenue among orders
    from customers in one region. Conditional decimal sum over the full
    group, ONE double division per year at the end. Region-filtered nation
    and customer dims broadcast; the only wide shuffle is lineitem-orders."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        load(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    vol = revenue_col()
    target = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(cust_asia), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target).alias("target_dec"),
            F.sum(vol).alias("total_dec"),
        )
        .select(
            "o_year",
            (
                F.col("target_dec").cast("double")
                / F.col("total_dec").cast("double")
            ).alias("mkt_share"),
            F.col("total_dec").cast("double").alias("total_volume"),
        )
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(sum(target) AS DOUBLE) / CAST(sum(volume) AS DOUBLE) AS mkt_share,
       CAST(sum(volume) AS DOUBLE) AS total_volume
FROM (
  SELECT year(o_orderdate) AS o_year, {SQL_REVENUE} AS volume,
         CASE WHEN ns.n_name = 'NATION_2' THEN {SQL_REVENUE}
              ELSE CAST(0 AS DECIMAL(18,2)) END AS target
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND EXISTS (SELECT 1 FROM customer
                JOIN nation nc ON c_nationkey = nc.n_nationkey
                JOIN region     ON nc.n_regionkey = r_regionkey
                WHERE c_custkey = o_custkey AND r_name = 'ASIA')
) t
GROUP BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year. The lake has no
    partsupp, so supply cost is proxied as 60% of p_retailprice — the shape
    (two broadcast dims into the fact, profit = revenue - cost in exact
    decimal) is what matters. Profit stays decimal until the final cast."""
    n = load(spark, sf_dir, "nation")
    s = (
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit("0.60").cast("decimal(18,2)")
    )
    profit = revenue_col().cast("decimal(30,6)") - cost.cast("decimal(30,6)")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q9_SQL = """
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit,
       count(*) AS n_items
FROM (
  SELECT ns.n_name AS nation, year(o_orderdate) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DECIMAL(30,6))
         - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST('0.60' AS DECIMAL(18,2)) AS DECIMAL(30,6)) AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'STANDARD'
) t
GROUP BY nation, o_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer, keeping
    zero-order customers via left outer join. Two aggregations: per-customer
    count (shuffle on custkey), then the tiny distribution rollup."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the classic view + scalar-max pattern as one plan. The per-supplier agg
    shuffles on suppkey; the global max is an unpartitioned window over the
    already-tiny agg result (supplier-count rows, not fact rows)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(revenue_col()).alias("rev_dec"))
    top = rev.withColumn("max_dec", F.max("rev_dec").over(W.partitionBy())).filter(
        F.col("rev_dec") == F.col("max_dec")
    )
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({SQL_REVENUE}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_dec = (SELECT max(total_dec) FROM revenue)
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each part class
    (brand excluded by a NOT predicate). Supplier-part pairs come from
    lineitem; distinct-then-count keeps the shuffle on the deduped pair
    set, never the raw fact."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than half the part's
    average quantity. The correlated scalar subquery becomes a per-part
    pre-aggregate joined back — the avg table is part-count-sized, so at
    scale it broadcasts while the fact side never shuffles twice."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = load(spark, sf_dir, "lineitem")
    li_p = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    avg_qty = li_p.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li_p.join(F.broadcast(avg_qty), li_p.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice"), "total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (F.col("total_price") / F.lit(7.0)).alias("avg_yearly"),
            "total_price",
            "n_items",
        )
    )


Q17_SQL = f"""
WITH li_p AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
),
avg_qty AS (
  SELECT l_partkey AS a_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
  FROM li_p GROUP BY l_partkey
)
SELECT {SQL_DSUM('l_extendedprice')} / CAST(7.0 AS DOUBLE) AS avg_yearly,
       {SQL_DSUM('l_extendedprice')} AS total_price,
       count(*) AS n_items
FROM li_p JOIN avg_qty ON l_partkey = a_partkey
WHERE l_quantity < CAST(0.5 AS DOUBLE) * avg_qty
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders, grouped by
    country code (nationkey band — the lake has no phone column). The
    scalar avg is a 1-row broadcast; the no-orders test is a left-anti
    join that ships only custkeys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, count(*) AS numcust,
       {SQL_DSUM('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
"""


def win_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second window battery: distribution/positional functions — ntile,
    percent_rank, cume_dist, nth_value, first/last over an explicit frame.
    The ORDER BY includes the unique o_orderkey tiebreak so every function
    (including row-order-dependent ntile) is deterministic. Windows
    partition per priority class — no global sort at scale."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    frame = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(frame).alias("second_key"),
        F.first("o_orderkey").over(frame).alias("top_key"),
        F.last("o_orderkey").over(frame).alias("bottom_key"),
    )


WIN_DIST_SQL = """
SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       nth_value(o_orderkey, 2) OVER wf AS second_key,
       first_value(o_orderkey)  OVER wf AS top_key,
       last_value(o_orderkey)   OVER wf AS bottom_key
FROM orders
WHERE o_orderkey <= 3000
WINDOW w  AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey),
       wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics without a transactional table format: a full
    outer join of the target dimension against a change set, with
    WHEN MATCHED / WHEN NOT MATCHED branches as projections. The change
    set is an aggregate (per-customer order spend), so matched rows update
    the balance and unmatched changes insert. At 100 TB this is the
    standard shuffle-on-key merge; a lakehouse format would replace the
    rewrite with a transactional commit, the join shape is identical."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal_dec")
    )
    delta = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("d_custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_dec"))
    )
    j = c.join(delta, c.c_custkey == delta.d_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "d_custkey").alias("custkey"),
        F.when(
            F.col("d_custkey").isNull(), F.lit("keep")  # target-only row
        )
        .when(F.col("c_custkey").isNull(), F.lit("insert"))  # change-only row
        .otherwise(F.lit("update"))
        .alias("action"),
        (
            F.coalesce(F.col("bal_dec"), F.lit(0).cast("decimal(18,2)"))
            - F.coalesce(F.col("spend_dec"), F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("new_balance"),
    )


MERGE_SQL = """
WITH delta AS (
  SELECT o_custkey AS d_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
)
SELECT coalesce(c_custkey, d_custkey) AS custkey,
       CASE WHEN d_custkey IS NULL THEN 'keep'
            WHEN c_custkey IS NULL THEN 'insert'
            ELSE 'update' END AS action,
       CAST(coalesce(CAST(c_acctbal AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))
            - coalesce(spend_dec, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS new_balance
FROM customer FULL OUTER JOIN delta ON c_custkey = d_custkey
"""


def q21_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of multi-supplier orders where
    THIS supplier returned items and NO OTHER supplier did (the lake has
    no receipt/commit dates, so 'failed' = returnflag R). The EXISTS /
    NOT EXISTS pair compiles to a semi join plus an anti join on the same
    (orderkey, suppkey) relation — both ship only key columns."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    mine = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others_any = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    ).distinct()
    others_r = mine.select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    # EXISTS other supplier on the order
    step1 = mine.join(
        others_any,
        (mine.l_orderkey == others_any.o_key) & (mine.l_suppkey != others_any.o_supp),
        "left_semi",
    )
    # NOT EXISTS other supplier who ALSO returned
    step2 = step1.join(
        others_r,
        (step1.l_orderkey == others_r.r_key) & (step1.l_suppkey != others_r.r_supp),
        "left_anti",
    )
    return (
        step2.join(F.broadcast(s), step2.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH mine AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM mine m JOIN supplier ON m.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = m.l_orderkey AND l2.l_suppkey <> m.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = m.l_orderkey
                    AND l3.l_suppkey <> m.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region. The lake
    has no partsupp, so the supply relation derives from lineitem: per
    (part, supplier) the min observed unit price. The correlated scalar
    min-cost subquery becomes a per-part pre-aggregate joined back — same
    rewrite as Q17. Unit price is one double division per row and min is a
    selection, so the result is bitwise deterministic."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s_eu = (
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    li = load(spark, sf_dir, "lineitem")
    supply = (
        li.join(F.broadcast(s_eu), li.l_suppkey == s_eu.s_suppkey, "left_semi")
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_cost = supply.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        supply.join(
            F.broadcast(min_cost),
            (supply.l_partkey == F.col("m_partkey"))
            & (supply.cost == F.col("min_cost")),
        )
        .join(F.broadcast(s_eu), supply.l_suppkey == s_eu.s_suppkey)
        .join(F.broadcast(p.select("p_partkey", "p_brand")), supply.l_partkey == F.col("p_partkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "s_suppkey",
            "s_name",
            "nation",
            F.col("cost").alias("min_cost"),
        )
    )


Q2_SQL = """
WITH s_eu AS (
  SELECT s_suppkey, s_name, n_name AS nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
p_f AS (SELECT p_partkey, p_brand FROM part WHERE p_size <= 10),
supply AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM s_eu)
    AND l_partkey IN (SELECT p_partkey FROM p_f)
  GROUP BY 1, 2
)
SELECT sp.l_partkey AS p_partkey, p_f.p_brand, s_eu.s_suppkey, s_eu.s_name,
       s_eu.nation, sp.cost AS min_cost
FROM supply sp
JOIN s_eu ON sp.l_suppkey = s_eu.s_suppkey
JOIN p_f  ON sp.l_partkey = p_f.p_partkey
WHERE sp.cost = (SELECT min(cost) FROM supply s2 WHERE s2.l_partkey = sp.l_partkey)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's suppliers,
    HAVING value greater than a FRACTION OF THE GLOBAL TOTAL of the same
    aggregated relation. The scalar total is a 1-row broadcast cross join
    over the (already part-count-sized) aggregate — the fact scans once."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("val_dec"))
    )
    total = per_part.agg(F.sum("val_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("val_dec").cast("double")
            > F.lit(0.001) * F.col("total_dec").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val_dec").cast("double").alias("part_value"),
        )
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS val_dec
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_3')
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val_dec AS DOUBLE)
      > CAST(0.001 AS DOUBLE) * (SELECT CAST(sum(val_dec) AS DOUBLE) FROM per_part)
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN-chain — suppliers who shipped a large
    quantity of PROMO parts in one year. part-filter -> per-(supplier,
    part) shipped-qty aggregate -> threshold -> semi join up to supplier.
    Every level ships only keys; the name list is the final projection."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = load(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 50
)
"""


def ordered_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: collect_list is partition-order-dependent,
    so the DETERMINISTIC form is collect -> sort_array -> serialize. Per
    nation: the sorted member list and its bounds. At scale collect_list
    per group is safe only for bounded groups (here: members per nation);
    unbounded groups should aggregate, not collect."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("c_custkey"))).alias("members"),
        F.size(F.collect_list("c_custkey")).cast("bigint").alias("n_members"),
        F.array_min(F.collect_list("c_custkey")).alias("first_key"),
        F.array_max(F.collect_list("c_custkey")).alias("last_key"),
    )


ORDERED_COLLECT_SQL = """
SELECT c_nationkey,
       string_agg(c_custkey, ',' ORDER BY c_custkey) AS members,
       count(*) AS n_members,
       min(c_custkey) AS first_key,
       max(c_custkey) AS last_key
FROM customer
WHERE c_custkey <= 400
GROUP BY c_nationkey
"""


def generator_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: explode_outer keeps the parent row (with
    a NULL element) when the array is empty — the LEFT JOIN LATERAL shape.
    Plain explode would silently drop empty-array parents; pipelines doing
    per-element fan-out must choose deliberately. Narrow op, no shuffle."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    arr = F.when(
        F.col("p_size") % 3 == 0, F.array().cast("array<bigint>")
    ).otherwise(F.sequence(F.lit(1), (F.col("p_size") % 4 + 1).cast("bigint")))
    return p.select("p_partkey", arr.alias("arr")).select(
        "p_partkey",
        F.size("arr").cast("bigint").alias("n_elems"),
        F.explode_outer("arr").alias("elem"),
    )


GENERATOR_OUTER_SQL = """
WITH t AS (
  SELECT p_partkey,
         CASE WHEN p_size % 3 = 0 THEN CAST([] AS BIGINT[])
              ELSE range(1, CAST(p_size % 4 + 1 AS BIGINT) + 1) END AS arr
  FROM part WHERE p_partkey < 200
)
SELECT p_partkey, CAST(len(arr) AS BIGINT) AS n_elems, u.elem
FROM t LEFT JOIN LATERAL (SELECT unnest(arr) AS elem) u ON true
"""


def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: scalar shifts/and/or/xor plus the bit_and/bit_or/
    bit_xor AGGREGATES (associative — partial aggregation applies like any
    sum). Bit tricks are the workhorse of flag columns and bloom-ish
    prefilters at scale."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return (
        o.select(
            "o_orderstatus",
            k.alias("k"),
            (k % 256).alias("flags"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.bit_and("flags").alias("and_flags"),
            F.bit_or("flags").alias("or_flags"),
            F.bit_xor("flags").alias("xor_flags"),
            F.sum(F.shiftleft(F.col("flags") % 8, 2)).alias("sum_shifted"),
            F.sum(F.col("flags").bitwiseAND(F.lit(15))).alias("sum_low_nibble"),
        )
    )


BITWISE_SQL = """
WITH t AS (
  SELECT o_orderstatus, o_orderkey AS k, o_orderkey % 256 AS flags
  FROM orders WHERE o_orderkey < 2000
)
SELECT o_orderstatus,
       bit_and(flags) AS and_flags,
       bit_or(flags)  AS or_flags,
       bit_xor(flags) AS xor_flags,
       CAST(sum((flags % 8) << 2) AS BIGINT) AS sum_shifted,
       CAST(sum(flags & 15) AS BIGINT) AS sum_low_nibble
FROM t GROUP BY 1
"""


def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: try_divide / try_cast return NULL instead
    of failing the job on division-by-zero or malformed casts — at 100 TB
    one bad row must never kill a 6-hour job; the NULLs surface in data
    quality counters instead."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    denom = F.col("o_orderkey") % 7
    bad_str = F.when(
        F.col("o_orderkey") % 5 == 0, F.lit("not-a-number")
    ).otherwise(F.col("o_orderkey").cast("string"))
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), denom.cast("double")).alias("per_bucket"),
        bad_str.try_cast("bigint").alias("parsed"),
        F.lit("2024-13-45").try_cast("date").alias("bad_date"),
    )


TRY_ARITH_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE o_totalprice / CAST(o_orderkey % 7 AS DOUBLE) END AS per_bucket,
       TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-number'
                     ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed,
       TRY_CAST('2024-13-45' AS DATE) AS bad_date
FROM orders WHERE o_orderkey < 3000
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from .tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(sql)


# Modern-SQL surface batteries: the SAME text runs on spark.sql and DuckDB.

GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey < 5000
GROUP BY ALL
"""


def group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (group on every non-aggregate projection) — identical
    text on both engines; the convenience form compiles to the same hash
    aggregate as an explicit key list."""
    return _sql_query(spark, sf_dir, GROUP_BY_ALL_SQL)


AGG_FILTER_SQL = """
SELECT l_returnflag,
       count(*) AS n_all,
       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price,
       count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F') AS n_supp_f
FROM lineitem
GROUP BY l_returnflag
"""


def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE ...) clauses: per-aggregate predicates in a
    single pass over the fact — the standard-SQL alternative to the CASE
    trick, still one partial+final hash aggregate at scale."""
    return _sql_query(spark, sf_dir, AGG_FILTER_SQL)


LATERAL_ALIAS_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
       CAST(price_dec * 2 AS DOUBLE) AS doubled,
       CAST(doubled + 1.0 AS DOUBLE) AS plus_one
FROM orders
WHERE o_orderkey < 2000
"""


def lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: later projections reference earlier ones in
    the same SELECT (Spark 3.4+/DuckDB). Pure sugar — Catalyst inlines the
    chain into one projection node."""
    return _sql_query(spark, sf_dir, LATERAL_ALIAS_SQL)


VALUES_INLINE_SQL = """
SELECT r.r_name, t.tier, count(*) AS n_nations
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma'), (3, 'delta'), (4, 'omega'))
     AS t(rk, tier)
  ON r.r_regionkey = t.rk
GROUP BY r.r_name, t.tier
"""


def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table joined against lake tables — constant relations
    plan as LocalRelation (broadcast for free, no scan at all)."""
    return _sql_query(spark, sf_dir, VALUES_INLINE_SQL)


def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per customer, orders and spend within
    the trailing 30 DAYS of each order — a frame defined by event-time
    distance, not row count (the time-series sibling of rowsBetween).
    Partitioned per customer: no global sort at scale."""
    return _sql_query(spark, sf_dir, WIN_RANGE_INTERVAL_SQL)


WIN_RANGE_INTERVAL_SQL = """
SELECT o_orderkey, o_custkey,
       count(*) OVER w AS n_30d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
FROM orders
WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
"""


def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: ORDER BY (total ordering incl. the unique
    key) + OFFSET + LIMIT (Spark 3.4+). Deterministic only with the full
    tiebreak; at scale prefer keyset (WHERE key > last_seen) pagination —
    OFFSET still sorts-and-skips the prefix on every page."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
        .offset(25)
        .limit(20)
    )


LIMIT_OFFSET_SQL = """
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 25
"""


def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the 100 TB replacement for OFFSET that
    ``limit_offset_page``'s docstring promises: the anchor is the last
    (price, key) of the previous page, and the next page is a pushed-down
    tuple-inequality filter + top-k (TakeOrderedAndProject) — no global
    sort, no prefix re-scan however deep the page. The anchor derives
    deterministically as row 25 of the full ordering via two chained
    top-k passes (limit 25, re-sort ascending, limit 1) — itself
    driver-free — so this page equals the OFFSET-25 page and the
    equivalence of the two pagination strategies is value-checked against
    the oracle's OFFSET-based anchor."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    anchor = (
        o.orderBy(F.col("price").desc(), F.col("o_orderkey"))
        .limit(25)
        .orderBy(F.col("price").asc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(F.col("price").alias("a_price"), F.col("o_orderkey").alias("a_key"))
    )
    return (
        o.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("price") < F.col("a_price"))
            | (
                (F.col("price") == F.col("a_price"))
                & (F.col("o_orderkey") > F.col("a_key"))
            )
        )
        .orderBy(F.col("price").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "price")
    )


KEYSET_SQL = """
WITH o AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price FROM orders),
anchor AS (
  SELECT price AS a_price, o_orderkey AS a_key
  FROM o ORDER BY price DESC, o_orderkey LIMIT 1 OFFSET 24
)
SELECT o_orderkey, price
FROM o, anchor
WHERE price < a_price OR (price = a_price AND o_orderkey > a_key)
ORDER BY price DESC, o_orderkey
LIMIT 20
"""


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each error matched to the NEXT click by the same
    user at-or-after it (ties -> smaller click id) — the mirror of the
    backward ``rel_asof_join`` and the other half of a full asof-join API
    (direction=backward|forward). Same union-window rewrite, reversed:
    one shuffle on user_id, a per-user DESCENDING scan carrying the next
    click id, no pair fan-out on hot users."""
    ev = load(spark, sf_dir, "events")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("clk_id"),
        F.lit(None).cast("long").alias("err_id"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("clk_id"),
        F.col("event_id").alias("err_id"),
    )
    # DESC by ts, then kind ASC, clk_id DESC: scanning from the future
    # toward the past, last(clk_id) is the earliest click at-or-after the
    # error. kind ASC puts same-ts clicks BEFORE same-ts errors in scan
    # order, so a click at the exact error ts lands inside the error's
    # preceding frame (mirroring the backward join's tie rule and the
    # oracle's clk_ts >= err_ts); clk_id DESC makes the smallest click id
    # the last-seen — and therefore the winner — among same-ts ties.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc(), F.col("clk_id").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clk.unionByName(err)
        .withColumn("next_clk", F.last("clk_id", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("err_id", "user_id", F.col("next_clk").alias("clk_id"))
    )


ASOF_FORWARD_SQL = """
WITH err AS (SELECT event_id AS err_id, user_id, epoch_ns(ts) AS err_ts
             FROM events WHERE event_type = 'error'),
clk AS (SELECT event_id AS clk_id, user_id, epoch_ns(ts) AS clk_ts
        FROM events WHERE event_type = 'click'),
j AS (SELECT err.err_id, err.user_id, clk.clk_id, clk.clk_ts
      FROM err LEFT JOIN clk ON err.user_id = clk.user_id AND clk.clk_ts >= err.err_ts),
r AS (SELECT *, row_number() OVER (PARTITION BY err_id ORDER BY clk_ts ASC NULLS LAST, clk_id ASC) AS rn
      FROM j)
SELECT err_id, user_id, clk_id FROM r WHERE rn = 1
"""


def robust_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: per-group median absolute deviation (MAD) — the
    outlier-resistant spread measure quality pipelines prefer over stddev.
    Two aggregation passes (median, then median of |x - median|) with the
    tiny per-group median table broadcast between them; both are exact
    interpolated percentiles rounded 4 dp for cross-engine parity."""
    li = load(spark, sf_dir, "lineitem")
    med = li.groupBy(F.col("l_returnflag").alias("m_flag")).agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price")
    )
    return (
        li.join(F.broadcast(med), li.l_returnflag == F.col("m_flag"))
        .groupBy("l_returnflag")
        .agg(
            F.first("median_price").alias("median_price"),
            F.round(
                F.percentile(F.abs(F.col("l_extendedprice") - F.col("median_price")), 0.5),
                4,
            ).alias("mad_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


MAD_SQL = """
WITH med AS (
  SELECT l_returnflag AS m_flag,
         round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, median_price,
       round(quantile_cont(abs(l_extendedprice - median_price), 0.5), 4) AS mad_price,
       count(*) AS n
FROM lineitem JOIN med ON l_returnflag = m_flag
GROUP BY l_returnflag, median_price
"""


# Spark spells `lag(x) IGNORE NULLS OVER ...`; DuckDB wants the modifier
# inside the call: `lag(x IGNORE NULLS) OVER ...` — same semantics.
_WIN_IGNORE_NULLS_BODY = """
FROM (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_totalprice > CAST(100000 AS DOUBLE)
              THEN CAST(o_totalprice AS DOUBLE) END AS big_price
  FROM orders WHERE o_custkey < 200
) t
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
"""

_WIN_IGNORE_NULLS_SPARK = f"""
SELECT o_orderkey, o_custkey,
       lag(big_price) IGNORE NULLS OVER w AS prev_big_price,
       last_value(big_price) IGNORE NULLS
         OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last_big
{_WIN_IGNORE_NULLS_BODY}
"""

WIN_IGNORE_NULLS_SQL = f"""
SELECT o_orderkey, o_custkey,
       lag(big_price IGNORE NULLS) OVER w AS prev_big_price,
       last_value(big_price IGNORE NULLS)
         OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last_big
{_WIN_IGNORE_NULLS_BODY}
"""


def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: lag and running last_value skipping
    NULL gaps — the carry-forward-last-observation idiom (sensor readings,
    sparse prices). Windows partition per customer."""
    return _sql_query(spark, sf_dir, _WIN_IGNORE_NULLS_SPARK)


# --- registry --------------------------------------------------------------

# --- data-quality / product-analytics battery (round 3) ---------------------


def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality audit: one row per constraint with
    its violation count — the validation pass a 100 TB ingestion pipeline
    runs before promoting a snapshot. Single-table checks are one aggregate
    over one scan each; the referential check is an anti-join-shaped left
    join shipping only orderkeys.
    """
    return dq_checks_over(
        load(spark, sf_dir, "lineitem"),
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "events"),
    )


def dq_checks_over(li: DataFrame, od: DataFrame, ev: DataFrame) -> DataFrame:
    """The constraint kernel over arbitrary frames — injectable so tests
    can prove the checks fire on corrupted data, not just stay green on
    the clean lake."""

    def agg_check(df: DataFrame, name: str, viol) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.sum(F.when(viol, 1).otherwise(0)).cast("bigint").alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    orphan = li.select("l_orderkey").join(
        od.select(F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__hit")),
        "l_orderkey",
        "left",
    )
    checks = [
        agg_check(od, "orders_null_custkey", F.col("o_custkey").isNull()),
        agg_check(
            orphan, "lineitem_orphan_orderkey", F.col("__hit").isNull()
        ),
        agg_check(li, "lineitem_nonpositive_qty", F.col("l_quantity") <= 0),
        agg_check(
            od, "orders_unknown_status", ~F.col("o_orderstatus").isin("O", "F", "P")
        ),
        agg_check(ev, "events_negative_value", F.col("value") < 0),
        agg_check(ev, "events_null_user", F.col("user_id").isNull()),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn(
        "pass", F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("int")
    )


DQ_CHECKS_SQL = """
SELECT * FROM (
  SELECT 'orders_null_custkey' AS check_name,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         count(*) AS n_rows FROM orders
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(*)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem_nonpositive_qty',
         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT),
         count(*) FROM lineitem
  UNION ALL
  SELECT 'orders_unknown_status',
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT),
         count(*) FROM orders
  UNION ALL
  SELECT 'events_negative_value',
         CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
         count(*) FROM events
  UNION ALL
  SELECT 'events_null_user',
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         count(*) FROM events
) t
CROSS JOIN LATERAL (SELECT CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass) p
"""


def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test between hash-assigned variants (user_id parity):
    per-variant n / mean / sample variance and the z statistic for the
    mean difference. Sums and sums-of-squares go through exact decimal
    aggregation (the dsum discipline — value has 2 dp, so value^2 has 4),
    then ONE double expression derives mean, variance, and z: no
    partial-aggregation float drift, bitwise-stable at any parallelism.
    One scan, one tiny two-row aggregate, driver-free.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = (
        ev.withColumn("variant", (F.col("user_id") % 2).cast("int"))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)"))
            ).cast("double").alias("ss"),
        )
    )
    m = F.col("s") / F.col("n")
    var_raw = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    # n < 2 leaves the sample variance undefined (the n-1 divisor hits 0 and
    # engines disagree on x/0); emit NULL var/z explicitly instead. A variant
    # with ZERO rows still yields an empty frame (cross join of an empty
    # side) — callers treat that as "experiment not yet assignable".
    var = F.when(F.col("n") < 2, F.lit(None).cast("double")).otherwise(var_raw)
    stats = per.select(
        "variant",
        "n",
        F.round(m, 6).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
        (m).alias("__m"),
        (var / F.col("n")).alias("__vn"),
    )
    a = stats.filter(F.col("variant") == 0).alias("a")
    b = stats.filter(F.col("variant") == 1).alias("b")
    denom = F.col("a.__vn") + F.col("b.__vn")
    z = F.when(denom.isNull() | (denom == 0), F.lit(None).cast("double")).otherwise(
        (F.col("b.__m") - F.col("a.__m")) / F.sqrt(denom)
    )
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_control"),
        F.col("b.n").alias("n_treatment"),
        F.col("a.mean_value").alias("mean_control"),
        F.col("b.mean_value").alias("mean_treatment"),
        F.col("a.var_value").alias("var_control"),
        F.col("b.var_value").alias("var_treatment"),
        F.round(z, 6).alias("z_score"),
    )


AB_TEST_SQL = """
WITH per AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
  FROM events WHERE value IS NOT NULL GROUP BY 1),
stats AS (
  SELECT variant, n,
         round(s / n, 6) AS mean_value,
         CASE WHEN n < 2 THEN NULL
              ELSE round((ss - s * s / n) / (n - 1), 6) END AS var_value,
         s / n AS m,
         CASE WHEN n < 2 THEN NULL
              ELSE ((ss - s * s / n) / (n - 1)) / n END AS vn
  FROM per)
SELECT a.n AS n_control, b.n AS n_treatment,
       a.mean_value AS mean_control, b.mean_value AS mean_treatment,
       a.var_value AS var_control, b.var_value AS var_treatment,
       CASE WHEN a.vn IS NULL OR b.vn IS NULL OR a.vn + b.vn = 0 THEN NULL
            ELSE round((b.m - a.m) / sqrt(a.vn + b.vn), 6) END AS z_score
FROM (SELECT * FROM stats WHERE variant = 0) a
CROSS JOIN (SELECT * FROM stats WHERE variant = 1) b
"""


# --- Exact two-sample Kolmogorov-Smirnov (round 13) ---------------------------

MICROS_PER_DAY = 86_400_000_000


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the hash-assigned
    variants (user_id parity, the ab_test split) over event value: the
    supremum ECDF gap D, the value where it is attained, and the
    one-term asymptotic tail probability 2*exp(-2*lambda^2) with
    Stephens' small-sample effective lambda (en + 0.12 + 0.11/en)*D
    (Numerical Recipes' probks leading term).

    The argmax is INTEGER-EXACT: at each distinct value the ECDF gap is
    |cum_a*n_b - cum_b*n_a| over the common denominator n_a*n_b, so the
    maximum and its location are found in BIGINT arithmetic (ties break
    to the smallest value) and floats appear only in the final one-row
    D/lambda/p expression — bitwise-stable at any parallelism.

    Scale: ONE groupBy on distinct values (map-side combining), one
    ordered window over the distinct-value spine (orders of magnitude
    smaller than the event stream), a 1-row broadcast of the group
    totals. Nothing is quadratic and raw events are never re-sorted.
    """
    import math

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = (
        ev.withColumn("g", (F.col("user_id") % 2).cast("int"))
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
        )
    )
    w = W.orderBy("value").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = pts.select(
        "value",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = cum.agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    gaps = cum.crossJoin(tot).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("num"),
        "value",
    )
    best = gaps.groupBy("n_a", "n_b").agg(
        F.max(F.struct(F.col("num"), (-F.col("value")).alias("nv"))).alias("bst")
    )
    d = F.col("bst.num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    en = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    lam = (en + F.lit(0.12) + F.lit(0.11) / en) * d
    return best.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("ks_d"),
        (-F.col("bst.nv")).alias("d_at_value"),
        F.round(lam, 6).alias("lambda_eff"),
        F.round(F.lit(2.0) * F.exp(F.lit(-2.0) * lam * lam), 6).alias("p_approx"),
    )


KS_TWO_SAMPLE_SQL = """
WITH pts AS (
  SELECT value,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM events WHERE value IS NOT NULL GROUP BY value),
cum AS (
  SELECT value,
         sum(ca) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_b
  FROM pts),
tot AS (SELECT CAST(max(cum_a) AS BIGINT) AS n_a,
               CAST(max(cum_b) AS BIGINT) AS n_b FROM cum),
best AS (
  SELECT n_a, n_b,
         max(struct_pack(num := abs(cum_a * n_b - cum_b * n_a),
                         nv := -value)) AS bst
  FROM cum, tot GROUP BY n_a, n_b)
SELECT n_a, n_b,
       round(CAST(bst.num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6) AS ks_d,
       -bst.nv AS d_at_value,
       round((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
              + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
             * (CAST(bst.num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)),
             6) AS lambda_eff,
       round(2.0 * exp(-2.0
             * pow((sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) + 0.12
                    + 0.11 / sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))
                   * (CAST(bst.num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)),
                   2)),
             6) AS p_approx
FROM best
"""


# --- Benjamini-Hochberg FDR over a grid of tests (round 13) -------------------

BH_Q = 0.10  # target false-discovery rate
# Zelen & Severo 26.2.17 polynomial tail of the standard normal CDF —
# the same five coefficients evaluated in both engines, so p-values are
# deterministic doubles, then ROUNDED to 6 before any BH comparison (the
# selection boundary must not depend on a last-ulp exp() difference).
_ZS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_ZS_T = 0.2316419


def bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing correction: a grid of Welch z-tests (mean event
    value, user-parity variants, one test per (event_type, weekday)
    cell) corrected by Benjamini-Hochberg at q=0.10. Per cell: the z
    statistic, the two-sided p (Zelen-Severo 26.2.17 normal tail,
    rounded to 6 before comparison), its ascending rank, the BH
    threshold rank*q/m, and the reject decision (p <= p_(k) for the
    largest k passing its threshold — the step-up rule, not the naive
    per-row comparison).

    Scale: the test grid is alphabet x 7 cells built by ONE map-side
    combining aggregate with exact decimal sums (the ab_test
    discipline); the BH step-up is two tiny windows over m rows.
    """
    import math

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(18,2)")
    per = (
        ev.select(
            "event_type",
            (F.expr(f"(ts div 1000) div {MICROS_PER_DAY}") % 7).alias("weekday"),
            (F.col("user_id") % 2 == 0).alias("is_a"),
            F.col("value"),
        )
        .groupBy("event_type", "weekday")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
            F.sum(F.when(F.col("is_a"), dec)).cast("double").alias("sa"),
            F.sum(F.when(~F.col("is_a"), dec)).cast("double").alias("sb"),
            F.sum(F.when(F.col("is_a"), dec * dec)).cast("double").alias("ssa"),
            F.sum(F.when(~F.col("is_a"), dec * dec)).cast("double").alias("ssb"),
        )
        .filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
    )
    ma = F.col("sa") / F.col("n_a")
    mb = F.col("sb") / F.col("n_b")
    va = (F.col("ssa") - F.col("sa") * F.col("sa") / F.col("n_a")) / (F.col("n_a") - 1)
    vb = (F.col("ssb") - F.col("sb") * F.col("sb") / F.col("n_b")) / (F.col("n_b") - 1)
    z = (mb - ma) / F.sqrt(va / F.col("n_a") + vb / F.col("n_b"))
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ZS_T) * az)
    poly = (
        F.lit(_ZS_B[0]) * t
        + F.lit(_ZS_B[1]) * t * t
        + F.lit(_ZS_B[2]) * t * t * t
        + F.lit(_ZS_B[3]) * t * t * t * t
        + F.lit(_ZS_B[4]) * t * t * t * t * t
    )
    phi = F.exp(-az * az / F.lit(2.0)) / F.sqrt(F.lit(2.0) * F.lit(math.pi))
    p = F.round(F.lit(2.0) * phi * poly, 6)
    scored = per.select(
        "event_type", "weekday", "n_a", "n_b",
        F.round(z, 6).alias("z_score"), p.alias("p_value"),
    )
    wr = W.orderBy("p_value", "event_type", "weekday")
    wall = W.partitionBy()
    ranked = scored.select(
        "*",
        F.row_number().over(wr).alias("p_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    ranked = ranked.withColumn(
        "bh_thresh",
        F.round(F.col("p_rank").cast("double") * F.lit(BH_Q) / F.col("m"), 6),
    )
    kmax = ranked.withColumn(
        "k_ok",
        F.max(
            F.when(F.col("p_value") <= F.col("bh_thresh"), F.col("p_rank")).otherwise(0)
        ).over(wall),
    )
    return kmax.select(
        "event_type",
        F.col("weekday").cast("int").alias("weekday"),
        "n_a", "n_b", "z_score", "p_value",
        F.col("p_rank").cast("bigint").alias("p_rank"), "bh_thresh",
        (F.col("p_rank") <= F.col("k_ok")).alias("rejected"),
    )


def _bh_fdr_sql() -> str:
    b1, b2, b3, b4, b5 = _ZS_B
    return f"""
WITH per AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {MICROS_PER_DAY}) % 7 AS BIGINT) AS weekday,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN user_id % 2 = 0
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
         CAST(sum(CASE WHEN user_id % 2 = 1
                  THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
         CAST(sum(CASE WHEN user_id % 2 = 0
                  THEN CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssa,
         CAST(sum(CASE WHEN user_id % 2 = 1
                  THEN CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS ssb
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2 HAVING n_a >= 2 AND n_b >= 2),
zed AS (
  SELECT event_type, weekday, n_a, n_b,
         (sb / n_b - sa / n_a)
           / sqrt(((ssa - sa * sa / n_a) / (n_a - 1)) / n_a
                  + ((ssb - sb * sb / n_b) / (n_b - 1)) / n_b) AS z
  FROM per),
pv AS (
  SELECT event_type, weekday, n_a, n_b, round(z, 6) AS z_score,
         round(2.0 * (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi()))
               * ({b1} * (1.0 / (1.0 + {_ZS_T} * abs(z)))
                  + {b2} * pow(1.0 / (1.0 + {_ZS_T} * abs(z)), 2)
                  + {b3} * pow(1.0 / (1.0 + {_ZS_T} * abs(z)), 3)
                  + {b4} * pow(1.0 / (1.0 + {_ZS_T} * abs(z)), 4)
                  + {b5} * pow(1.0 / (1.0 + {_ZS_T} * abs(z)), 5)),
               6) AS p_value
  FROM zed),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value, event_type, weekday) AS p_rank,
         count(*) OVER () AS m
  FROM pv),
thr AS (
  SELECT *, round(CAST(p_rank AS DOUBLE) * {BH_Q} / m, 6) AS bh_thresh FROM ranked),
kmx AS (
  SELECT *, max(CASE WHEN p_value <= bh_thresh THEN p_rank ELSE 0 END)
              OVER () AS k_ok
  FROM thr)
SELECT event_type, CAST(weekday AS INTEGER) AS weekday, n_a, n_b, z_score,
       p_value, p_rank, bh_thresh, p_rank <= k_ok AS rejected
FROM kmx
"""


# --- IPS / SNIPS off-policy evaluation (round 13) -----------------------------

IPS_EPS = 0.2  # epsilon-greedy target policy mass off the argmax action


def ips_offline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of an epsilon-greedy target policy from the
    logged event stream (IPS, Horvitz-Thompson; SNIPS, Swaminathan &
    Joachims 2015): context = weekday, action = event_type, reward =
    value. The target policy is LEARNED on the even-event_id split (per
    context, argmax mean reward — exact decimal sums, mean ties to the
    larger action string via the struct-max rule) and evaluated on the
    odd split with empirical
    logging propensities p(a|x) = n_xa/n_x from the SAME eval split.
    Per context: the target action, the IPS value estimate
    (1/n_x)*sum_a pi(a|x)/p(a|x)*sum_r(x,a), its self-normalized twin,
    and the logged baseline mean.

    Everything stays (context, action)-aggregated: weights are the
    RATIONAL pi(a|x)*n_x/n_xa applied to per-cell reward sums — no
    per-row weighting pass, no shuffle beyond the one cell aggregate.
    The x7 alphabet-bounded output joins by broadcast.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(18,2)")
    base = ev.select(
        "event_type",
        (F.expr(f"(ts div 1000) div {MICROS_PER_DAY}") % 7).alias("weekday"),
        (F.col("event_id") % 2 == 0).alias("is_fit"),
        F.col("value"),
    )
    # target policy: per-context argmax of fit-split mean reward
    fit = (
        base.filter(F.col("is_fit"))
        .groupBy("weekday", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s"),
        )
    )
    tgt = fit.groupBy("weekday").agg(
        F.max(
            F.struct(
                (F.col("s") / F.col("n")).alias("mean_r"),
                F.col("event_type"),
            )
        ).alias("bst")
    )
    # max(struct(mean, type)) breaks mean-ties to the LARGER type string;
    # both engines apply the same struct ordering, so the rule is stated
    # for determinism, not preference.
    target = tgt.select("weekday", F.col("bst.event_type").alias("target_action"))
    cells = (
        base.filter(~F.col("is_fit"))
        .groupBy("weekday", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_xa"),
            F.sum(dec).alias("sum_r_dec"),  # exact decimal: associative
        )
    )
    nk = cells.groupBy("weekday").agg(
        F.sum("n_xa").cast("bigint").alias("n_x"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
        F.sum("sum_r_dec").alias("sum_all_dec"),
    )
    j = cells.join(F.broadcast(target), "weekday").join(F.broadcast(nk), "weekday")
    pi = F.when(
        F.col("event_type") == F.col("target_action"), F.lit(1.0 - IPS_EPS)
    ).otherwise(F.lit(IPS_EPS) / (F.col("k") - 1).cast("double"))
    # IPS cell contribution: pi/p * sum_r with p = n_xa/n_x. Per-cell
    # double terms are QUANTIZED to 1e-6 BIGINT micro-units before the
    # cross-cell sum (the bcubed discipline) — double addition is not
    # associative, integer addition is, so the estimate is bitwise-stable
    # under any partial-aggregation order.
    w_cell = pi * F.col("n_x").cast("double") / F.col("n_xa").cast("double")
    t_mu = F.floor(
        w_cell * F.col("sum_r_dec").cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    w_mu = F.floor(
        w_cell * F.col("n_xa").cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    per_ctx = j.groupBy("weekday", "target_action", "n_x", "sum_all_dec").agg(
        F.sum(t_mu).cast("bigint").alias("t_micro"),
        F.sum(w_mu).cast("bigint").alias("w_micro"),
    )
    return per_ctx.select(
        F.col("weekday").cast("int").alias("weekday"),
        "target_action",
        F.col("n_x").alias("n_eval"),
        F.round(
            F.col("t_micro").cast("double")
            / (F.lit(1e6) * F.col("n_x").cast("double")),
            6,
        ).alias("ips_value"),
        F.round(
            F.col("t_micro").cast("double") / F.col("w_micro").cast("double"), 6
        ).alias("snips_value"),
        F.round(
            F.col("sum_all_dec").cast("double") / F.col("n_x").cast("double"), 6
        ).alias("logged_mean"),
    )


IPS_EVAL_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {MICROS_PER_DAY}) % 7 AS BIGINT) AS weekday,
         event_id % 2 = 0 AS is_fit, value
  FROM events WHERE value IS NOT NULL),
fit AS (
  SELECT weekday, event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
  FROM base WHERE is_fit GROUP BY 1, 2),
target AS (
  SELECT weekday,
         max(struct_pack(mean_r := s / n, event_type := event_type)).event_type
           AS target_action
  FROM fit GROUP BY weekday),
cells AS (
  SELECT weekday, event_type, CAST(count(*) AS BIGINT) AS n_xa,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_r_dec
  FROM base WHERE NOT is_fit GROUP BY 1, 2),
nk AS (
  SELECT weekday, CAST(sum(n_xa) AS BIGINT) AS n_x,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k,
         sum(sum_r_dec) AS sum_all_dec
  FROM cells GROUP BY weekday),
j AS (
  SELECT c.weekday, t.target_action, n.n_x, n.sum_all_dec,
         (CASE WHEN c.event_type = t.target_action THEN {1.0 - IPS_EPS}
               ELSE {IPS_EPS} / CAST(n.k - 1 AS DOUBLE) END)
           * CAST(n.n_x AS DOUBLE) / c.n_xa AS w_cell,
         CAST(c.sum_r_dec AS DOUBLE) AS sum_r, c.n_xa
  FROM cells c JOIN target t USING (weekday) JOIN nk n USING (weekday)),
mu AS (
  SELECT weekday, target_action, n_x, sum_all_dec,
         CAST(sum(CAST(floor(w_cell * sum_r * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS t_micro,
         CAST(sum(CAST(floor(w_cell * CAST(n_xa AS DOUBLE) * 1e6 + 0.5)
                       AS BIGINT)) AS BIGINT) AS w_micro
  FROM j GROUP BY weekday, target_action, n_x, sum_all_dec)
SELECT CAST(weekday AS INTEGER) AS weekday, target_action,
       n_x AS n_eval,
       round(CAST(t_micro AS DOUBLE) / (1e6 * n_x), 6) AS ips_value,
       round(CAST(t_micro AS DOUBLE) / w_micro, 6) AS snips_value,
       round(CAST(sum_all_dec AS DOUBLE) / n_x, 6) AS logged_mean
FROM mu
"""


def dr_offline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy evaluation (Dudik, Langford & Li 2011)
    completing the OPE family next to ips_offline_eval: the direct-method
    reward model q(x, a) = fit-split mean reward per (context, action)
    cell, corrected by importance-weighted residuals on the eval split —
    V_DR = (1/n_x) * [ sum_i sum_a pi(a|x) q(x, a)
                       + sum_i rho_i (r_i - q(x_i, a_i)) ].
    Per context: the DM baseline term, the residual correction, and the
    DR estimate; the same epsilon-greedy target and empirical
    propensities as IPS, so DR-vs-IPS differences isolate the model
    term. Cell-aggregated throughout: the DM term is alphabet-sized, the
    correction is rho_xa * (sum_r - n_xa * q) per cell; each cell term
    is one deterministic double quantized to 1e-6 micro-units before the
    cross-cell sum (the bcubed discipline).

    An action seen in eval but absent from the fit split has no q model;
    its q defaults to 0 (stated; the residual then degrades to plain
    IPS for that cell).
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(18,2)")
    base = ev.select(
        "event_type",
        (F.expr(f"(ts div 1000) div {MICROS_PER_DAY}") % 7).alias("weekday"),
        (F.col("event_id") % 2 == 0).alias("is_fit"),
        F.col("value"),
    )
    fit = (
        base.filter(F.col("is_fit"))
        .groupBy("weekday", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s"),
        )
    )
    q = fit.select(
        "weekday", "event_type", (F.col("s") / F.col("n")).alias("q")
    )
    tgt = fit.groupBy("weekday").agg(
        F.max(
            F.struct((F.col("s") / F.col("n")).alias("mean_r"), F.col("event_type"))
        ).alias("bst")
    )
    target = tgt.select("weekday", F.col("bst.event_type").alias("target_action"))
    cells = (
        base.filter(~F.col("is_fit"))
        .groupBy("weekday", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_xa"),
            F.sum(dec).alias("sum_r_dec"),
        )
    )
    nk = cells.groupBy("weekday").agg(
        F.sum("n_xa").cast("bigint").alias("n_x"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    j = (
        cells.join(F.broadcast(target), "weekday")
        .join(F.broadcast(nk), "weekday")
        .join(F.broadcast(q), ["weekday", "event_type"], "left")
        .withColumn("q", F.coalesce(F.col("q"), F.lit(0.0)))
    )
    pi = F.when(
        F.col("event_type") == F.col("target_action"), F.lit(1.0 - IPS_EPS)
    ).otherwise(F.lit(IPS_EPS) / (F.col("k") - 1).cast("double"))
    rho = pi * F.col("n_x").cast("double") / F.col("n_xa").cast("double")
    # DM term: every eval ROW contributes sum_a pi(a|x) q(x,a) — cell
    # (x, a)'s share of that constant is n_x * pi(a|x) * q(x, a)
    dm_cell = F.col("n_x").cast("double") * pi * F.col("q")
    corr_cell = rho * (
        F.col("sum_r_dec").cast("double")
        - F.col("n_xa").cast("double") * F.col("q")
    )
    dm_mu = F.floor(dm_cell * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    corr_mu = F.floor(corr_cell * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    per_ctx = j.groupBy("weekday", "target_action", "n_x").agg(
        F.sum(dm_mu).cast("bigint").alias("dm_micro"),
        F.sum(corr_mu).cast("bigint").alias("corr_micro"),
    )
    n_xd = F.col("n_x").cast("double")
    return per_ctx.select(
        F.col("weekday").cast("int").alias("weekday"),
        "target_action",
        F.col("n_x").alias("n_eval"),
        F.round(F.col("dm_micro").cast("double") / (F.lit(1e6) * n_xd), 6).alias(
            "dm_value"
        ),
        F.round(F.col("corr_micro").cast("double") / (F.lit(1e6) * n_xd), 6).alias(
            "ips_correction"
        ),
        F.round(
            (F.col("dm_micro") + F.col("corr_micro")).cast("double")
            / (F.lit(1e6) * n_xd),
            6,
        ).alias("dr_value"),
    )


DR_EVAL_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST((epoch_us(ts) // {MICROS_PER_DAY}) % 7 AS BIGINT) AS weekday,
         event_id % 2 = 0 AS is_fit, value
  FROM events WHERE value IS NOT NULL),
fit AS (
  SELECT weekday, event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
  FROM base WHERE is_fit GROUP BY 1, 2),
q AS (SELECT weekday, event_type, s / n AS q FROM fit),
target AS (
  SELECT weekday,
         max(struct_pack(mean_r := s / n, event_type := event_type)).event_type
           AS target_action
  FROM fit GROUP BY weekday),
cells AS (
  SELECT weekday, event_type, CAST(count(*) AS BIGINT) AS n_xa,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_r_dec
  FROM base WHERE NOT is_fit GROUP BY 1, 2),
nk AS (
  SELECT weekday, CAST(sum(n_xa) AS BIGINT) AS n_x,
         CAST(count(DISTINCT event_type) AS BIGINT) AS k
  FROM cells GROUP BY weekday),
j AS (
  SELECT c.weekday, t.target_action, n.n_x, c.n_xa,
         CAST(c.sum_r_dec AS DOUBLE) AS sum_r,
         coalesce(qq.q, 0.0) AS q,
         CASE WHEN c.event_type = t.target_action THEN {1.0 - IPS_EPS}
              ELSE {IPS_EPS} / CAST(n.k - 1 AS DOUBLE) END AS pi
  FROM cells c JOIN target t USING (weekday) JOIN nk n USING (weekday)
  LEFT JOIN q qq ON qq.weekday = c.weekday AND qq.event_type = c.event_type),
mu AS (
  SELECT weekday, target_action, n_x,
         CAST(sum(CAST(floor(CAST(n_x AS DOUBLE) * pi * q * 1e6 + 0.5)
                       AS BIGINT)) AS BIGINT) AS dm_micro,
         CAST(sum(CAST(floor(pi * CAST(n_x AS DOUBLE) / n_xa
                             * (sum_r - CAST(n_xa AS DOUBLE) * q)
                             * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS corr_micro
  FROM j GROUP BY weekday, target_action, n_x)
SELECT CAST(weekday AS INTEGER) AS weekday, target_action,
       n_x AS n_eval,
       round(CAST(dm_micro AS DOUBLE) / (1e6 * n_x), 6) AS dm_value,
       round(CAST(corr_micro AS DOUBLE) / (1e6 * n_x), 6) AS ips_correction,
       round(CAST(dm_micro + corr_micro AS DOUBLE) / (1e6 * n_x), 6) AS dr_value
FROM mu
"""


# --- Split-conformal prediction intervals (round 13) --------------------------

CONF_ALPHA_PCT = 10  # 90% target coverage; the quantile rank is exact-integer


def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018) for
    event value per event_type: even event_ids are the calibration
    split, odd the test split; the point predictor is the calibration
    mean (exact decimal sum / count); the half-width q_hat is the
    k-th smallest absolute calibration residual with the EXACT integer
    rank k = ceil((1-alpha)(n_cal+1)) — the finite-sample-valid order
    statistic, no percentile interpolation to disagree across engines.
    Output: per type, both split sizes, the predictor, q_hat, and the
    achieved test coverage |value - pred| <= q_hat.

    Scale: one aggregate for the predictor (broadcast back — a
    type-alphabet-sized dimension), one window rank over calibration
    residuals per type, one test-side aggregate. The quantile is a
    per-type order statistic, not a global sort.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cal = ev.filter(F.col("event_id") % 2 == 0)
    tst = ev.filter(F.col("event_id") % 2 == 1)
    pred = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cal"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("pred"),
    )
    k = F.floor(
        (F.lit(100 - CONF_ALPHA_PCT) * (F.col("n_cal") + 1) + F.lit(99)) / F.lit(100)
    ).cast("bigint")
    scored = (
        cal.join(F.broadcast(pred), "event_type")
        .select(
            "event_type", "n_cal", "pred", "event_id",
            F.abs(F.col("value") - F.col("pred")).alias("score"),
            k.alias("k"),
        )
    )
    wr = W.partitionBy("event_type").orderBy("score", "event_id")
    qhat = (
        scored.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == F.col("k"))
        .select("event_type", "n_cal", "pred", F.col("score").alias("q_hat"))
    )
    # k > n_cal (tiny calibration split) would mean an infinite interval;
    # such types simply drop out of the rank filter above, mirroring the
    # oracle's inner join.
    cov = (
        tst.join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "pred", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("pred")) <= F.col("q_hat"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_covered"),
        )
    )
    return cov.select(
        "event_type",
        "n_cal",
        "n_test",
        F.round(F.col("pred"), 6).alias("pred_mean"),
        F.round(F.col("q_hat"), 6).alias("q_hat"),
        F.round(
            F.col("n_covered").cast("double") / F.col("n_test").cast("double"), 6
        ).alias("coverage"),
    )


CONFORMAL_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
pred AS (
  SELECT event_type, count(*) AS n_cal,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS pred
  FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
scored AS (
  SELECT e.event_type, p.n_cal, p.pred,
         abs(e.value - p.pred) AS score,
         ({100 - CONF_ALPHA_PCT} * (p.n_cal + 1) + 99) // 100 AS k,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY abs(e.value - p.pred), e.event_id) AS r
  FROM ev e JOIN pred p USING (event_type) WHERE e.event_id % 2 = 0),
qhat AS (
  SELECT event_type, n_cal, pred, score AS q_hat FROM scored WHERE r = k),
cov AS (
  SELECT q.event_type, q.n_cal, q.pred, q.q_hat,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(e.value - q.pred) <= q.q_hat
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM ev e JOIN qhat q USING (event_type) WHERE e.event_id % 2 = 1
  GROUP BY 1, 2, 3, 4)
SELECT event_type, n_cal, n_test,
       round(pred, 6) AS pred_mean,
       round(q_hat, 6) AS q_hat,
       round(CAST(n_covered AS DOUBLE) / n_test, 6) AS coverage
FROM cov
"""


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user reaches
    step N only with an event strictly AFTER their step-N-1 time. Pure
    min-aggregation semantics (t1 = min view ts; t2 = min click ts > t1;
    t3 = min purchase ts > t2) — deterministic under ts ties in both
    engines, no row_number needed. Each stage is a user-keyed aggregate;
    the joins ship (user_id, ts) pairs only.
    """
    ev = load(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        t1.agg(F.lit(1).alias("step"), F.lit("view").alias("step_name"),
               F.count(F.lit(1)).alias("n_users")),
        t2.agg(F.lit(2).alias("step"), F.lit("click_after_view").alias("step_name"),
               F.count(F.lit(1)).alias("n_users")),
        t3.agg(F.lit(3).alias("step"), F.lit("purchase_after_click").alias("step_name"),
               F.count(F.lit(1)).alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t1
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t2
  GROUP BY e.user_id)
SELECT 1 AS step, 'view' AS step_name, count(*) AS n_users FROM t1
UNION ALL
SELECT 2, 'click_after_view', count(*) FROM t2
UNION ALL
SELECT 3, 'purchase_after_click', count(*) FROM t3
"""

NANOS_PER_WEEK = 7 * NANOS_PER_DAY


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week, counted
    in each later week they return. (user, week) is deduped first, so the
    final count(*) per (cohort, offset) counts users exactly once; the
    cohort table is user-count sized and joins back on user_id.
    """
    ev = load(spark, sf_dir, "events")
    week = F.expr(f"ts div {NANOS_PER_WEEK}").cast("bigint")
    uw = ev.select("user_id", week.alias("week")).distinct()
    coh = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(coh, "user_id")
        .select("cohort_week", (F.col("week") - F.col("cohort_week")).alias("k"))
        .groupBy("cohort_week", "k")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COHORT_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // {NANOS_PER_WEEK} AS BIGINT) AS week
  FROM events),
coh AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT c.cohort_week, u.week - c.cohort_week AS k, count(*) AS n_users
FROM uw u JOIN coh c USING (user_id)
GROUP BY 1, 2
"""


K_ANON_THRESHOLD = 5


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (event type,
    hour-of-day, coarse value band): equivalence-class sizes plus a
    violation flag for classes smaller than k — the re-identification-risk
    check a data-release / training-data governance pass runs before
    shipping event logs.

    Every bucket is EXACT integer arithmetic (`div`/`%` on epoch-nano
    int64, floor division on a scaled value) so both engines land rows in
    identical classes — no float bucketing at the privacy boundary. Scale
    shape: one map-side-combining aggregate on the QI tuple; output
    cardinality is the (bounded) QI domain, not the event count.
    """
    e = load(spark, sf_dir, "events")
    hour = F.expr("(ts div 1000000000) div 3600") % 24
    band = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return (
        e.select(
            "event_type", hour.alias("hour"), band.alias("value_band")
        )
        .groupBy("event_type", "hour", "value_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("k_violation", (F.col("n") < K_ANON_THRESHOLD).cast("int"))
    )


K_ANONYMITY_SQL = f"""
SELECT event_type,
       (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hour,
       CAST(floor(value / 25.0) AS BIGINT) AS value_band,
       count(*) AS n,
       CAST(CASE WHEN count(*) < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END AS INTEGER) AS k_violation
FROM events
GROUP BY 1, 2, 3
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each reading holds
    until the next one, so its weight is the interval it was live —
    the standard correction when sampling is irregular (a value held for
    an hour counts 3600× one held a second). The last reading per user
    has no successor interval and is excluded, identically in both
    engines.

    Determinism: interval weights are EXACT epoch-nano int64 differences
    (their sum is an exact bigint — associative, safe to F.sum); only the
    value×dt products are floats, summed as a sequential fold over
    readings sorted by (ts, event_id). One shuffle on user_id; per-user
    arrays are session-sized. Zero total duration (all readings
    simultaneous) yields NULL, not a division error.
    """
    e = load(spark, sf_dir, "events")
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    e2 = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("nxt", F.lead("ts").over(win))
        .filter(F.col("nxt").isNotNull())
        .withColumn("dt", F.col("nxt") - F.col("ts"))
    )
    per = e2.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts",
                    "event_id",
                    (F.col("value") * F.col("dt").cast("double")).alias("term"),
                )
            )
        ).alias("terms"),
        F.sum("dt").alias("dt_sum"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    num = F.aggregate("terms", F.lit(0.0), lambda a, s: a + s.getField("term"))
    return per.select(
        "user_id",
        "n_intervals",
        F.when(
            F.col("dt_sum") > 0,
            F.round(num / F.col("dt_sum").cast("double"), 6),
        ).alias("twa_value"),
    )


TIME_WEIGHTED_AVG_SQL = """
WITH e2 AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id, value,
         lead(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS nxt
  FROM events
),
iv AS (
  SELECT user_id, tsn, event_id, value, nxt - tsn AS dt
  FROM e2 WHERE nxt IS NOT NULL
)
SELECT user_id, count(*) AS n_intervals,
       CASE WHEN sum(dt) > 0
            THEN round(list_reduce(list(value * CAST(dt AS DOUBLE)
                                        ORDER BY tsn, event_id),
                                   (a, b) -> a + b)
                       / CAST(sum(dt) AS DOUBLE), 6) END AS twa_value
FROM iv GROUP BY user_id
"""


SKEW_BUCKETS = 32


def skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: rows per hash bucket of the join key
    (md5-derived, the shared hashes.py kernel — an engine-neutral proxy
    for a hash partitioner) with each bucket's load factor vs the uniform
    ideal. The measurement an operator runs BEFORE choosing between plain
    shuffle, salting, and AQE skew-join on a 100 TB fact — rel_salted_join
    is the cure; this is the diagnosis.

    Scale shape: one map-side-combining aggregate producing exactly
    SKEW_BUCKETS rows; exact integer counts, one rounded division.
    """
    from ..functions.hashes import hex4_to_int

    li = load(spark, sf_dir, "lineitem")
    bucket = (
        hex4_to_int(F.md5(F.col("l_orderkey").cast("string"))) % SKEW_BUCKETS
    ).cast("bigint")
    per = li.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = per.agg(F.sum("n_rows").alias("total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                * F.lit(float(SKEW_BUCKETS))
                / F.col("total").cast("double"),
                6,
            ).alias("load_factor"),
        )
    )


def _skew_diagnostics_sql() -> str:
    from ..functions.hashes import hex4_to_int_sql

    h = hex4_to_int_sql("md5(CAST(l_orderkey AS VARCHAR))")
    return f"""
WITH per AS (
  SELECT {h} % {SKEW_BUCKETS} AS bucket, count(*) AS n_rows
  FROM lineitem GROUP BY 1
),
total AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total FROM per)
SELECT bucket, n_rows,
       round(CAST(n_rows AS DOUBLE) * {float(SKEW_BUCKETS)} / total, 6) AS load_factor
FROM per CROSS JOIN total
"""


TSM_LEN = 8
# z-normalized ramp pattern (computed once; repr() round-trips to the same
# IEEE double in both engines)
_TSM_MEAN = sum(range(TSM_LEN)) / TSM_LEN
_TSM_STD = (sum((i - _TSM_MEAN) ** 2 for i in range(TSM_LEN)) / TSM_LEN) ** 0.5
TSM_PATTERN = tuple((i - _TSM_MEAN) / _TSM_STD for i in range(TSM_LEN))
TSM_TOPK = 5


def tseries_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (cf. PAPERS.md: Time Series Similarity
    Search for Streaming Data in Distributed Systems, EDBT 2019): find the
    top-k sliding windows of each user's value series closest — in
    z-normalized Euclidean distance — to a fixed query pattern (a rising
    ramp). The subsequence-matching primitive behind motif discovery and
    anomaly spotting over telemetry.

    Scale shape: windows come from ONE pass of a per-user frame window
    (`collect_list ROWS BETWEEN L-1 PRECEDING AND CURRENT ROW` — state is
    L values per partition, never a self-join on time); per-window
    z-normalization and the distance are sequential in-order folds over
    the L-element array (codegen higher-order functions); global top-k is
    TakeOrderedAndProject. Windows with zero variance are filtered — their
    z-norm is undefined — identically in both engines. Determinism: the
    frame order is pinned by the unique (ts, event_id) sort; every float
    step is the same in-order fold in Spark and the DuckDB oracle, and the
    distance is rounded to 6 dp BEFORE the ranking sort.
    """
    # NULL readings are excluded identically on both sides: Spark's
    # collect_list would silently skip them (shrinking the frame array)
    # while DuckDB's list() keeps them — filtering first pins one semantic
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(TSM_LEN - 1), 0)
    )
    ld = float(TSM_LEN)
    win = (
        e.select("user_id", "event_id", "ts", "value")
        .withColumn("wv", F.collect_list("value").over(w))
        .filter(F.size("wv") == TSM_LEN)
    )
    mean = (
        F.aggregate("wv", F.lit(0.0), lambda a, x: a + x) / F.lit(ld)
    )
    win = win.withColumn("m", mean)
    var = (
        F.aggregate(
            "wv",
            F.lit(0.0),
            lambda a, x: a + (x - F.col("m")) * (x - F.col("m")),
        )
        / F.lit(ld)
    )
    win = win.withColumn("s", F.sqrt(var)).filter(F.col("s") > 0.0)
    pat = F.array(*[F.lit(p) for p in TSM_PATTERN])
    dist = F.aggregate(
        F.zip_with(
            "wv",
            pat,
            lambda x, p: ((x - F.col("m")) / F.col("s") - p)
            * ((x - F.col("m")) / F.col("s") - p),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = win.select(
        "user_id", "event_id", F.round(dist, 6).alias("dist")
    )
    return scored.orderBy("dist", "user_id", "event_id").limit(TSM_TOPK)


_TSM_PATTERN_SQL = "[" + ", ".join(repr(p) for p in TSM_PATTERN) + "]"
TSERIES_MOTIF_SQL = f"""
WITH win AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {TSM_LEN - 1} PRECEDING AND CURRENT ROW) AS wv
  FROM events WHERE value IS NOT NULL
),
full_w AS (SELECT * FROM win WHERE len(wv) = {TSM_LEN}),
stats AS (
  SELECT user_id, event_id, wv,
         list_reduce(wv, (a, x) -> a + x) / CAST({TSM_LEN} AS DOUBLE) AS m
  FROM full_w
),
stats2 AS (
  SELECT *, sqrt(list_reduce(list_transform(wv, x -> (x - m) * (x - m)),
                             (a, x) -> a + x) / CAST({TSM_LEN} AS DOUBLE)) AS s
  FROM stats
),
scored AS (
  SELECT user_id, event_id,
         round(list_reduce(
           list_transform(generate_series(1, {TSM_LEN}),
                          i -> ((wv[i] - m) / s - ({_TSM_PATTERN_SQL})[i])
                               * ((wv[i] - m) / s - ({_TSM_PATTERN_SQL})[i])),
           (a, x) -> a + x), 6) AS dist
  FROM stats2 WHERE s > 0.0
)
SELECT user_id, event_id, dist FROM scored
ORDER BY dist, user_id, event_id LIMIT {TSM_TOPK}
"""


# --- gaps-and-islands (round 5) ---------------------------------------------

ISL_MIN_LEN = 2


def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per supplier, maximal runs of CONSECUTIVE calendar
    ship days — the classic day_num - row_number() trick (rows in the same
    island share the difference), distinct from time-gap sessionization
    (stream_sessionize_batch): islands break on missing days, not elapsed
    time. The continuity audit a pipeline runs on ingest completeness.

    Scale shape: dedup to (supplier, day) first (map-side combine — the
    window then ranks distinct days, not raw lineitems), one shuffle on
    l_suppkey for the window, one keyed aggregate on the island id. Exact
    integer day arithmetic end to end.
    """
    li = load(spark, sf_dir, "lineitem")
    days = (
        li.select(
            "l_suppkey",
            F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).cast(
                "bigint"
            ).alias("day_num"),
        )
        .distinct()
    )
    w = W.partitionBy("l_suppkey").orderBy("day_num")
    isl = days.withColumn(
        "grp", F.col("day_num") - F.row_number().over(w)
    )
    return (
        isl.groupBy("l_suppkey", "grp")
        .agg(
            F.min("day_num").alias("day_start"),
            F.max("day_num").alias("day_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .filter(F.col("island_len") >= ISL_MIN_LEN)
        .select("l_suppkey", "day_start", "day_end", "island_len")
    )


GAPS_ISLANDS_SQL = f"""
WITH days AS (
  SELECT DISTINCT l_suppkey,
         CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day_num
  FROM lineitem
),
isl AS (
  SELECT l_suppkey, day_num,
         day_num - row_number() OVER (PARTITION BY l_suppkey ORDER BY day_num) AS grp
  FROM days
)
SELECT l_suppkey, min(day_num) AS day_start, max(day_num) AS day_end,
       count(*) AS island_len
FROM isl GROUP BY l_suppkey, grp
HAVING count(*) >= {ISL_MIN_LEN}
"""


# --- exponentially weighted moving average (round 5) -------------------------

EWMA_ALPHA = 0.2


def ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values: the y_n = a*x_n + (1-a)*y_{n-1}
    recurrence over the (ts, event_id)-ordered history, seeded with the
    first value — the smoothing a monitoring pipeline applies before
    thresholding noisy per-entity series. A recurrence is inherently
    sequential PER KEY, so the scale unit is the user: one shuffle on
    user_id, then a bounded per-user array fold (at 100 TB the frame
    would be a trailing window; full history here keeps the oracle
    closed-form).

    Determinism: the fold is seeded with element 1 and folds elements
    2..n in sort order — exactly DuckDB's list_reduce semantics — and
    every coefficient is a double literal.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    vals = F.transform(F.col("xs"), lambda s: s.getField("value"))
    ew = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x
        + F.lit(1.0 - EWMA_ALPHA) * acc,
    )
    return per.select(
        "user_id", "n_events", F.round(ew, 6).alias("ewma_last")
    )


EWMA_SQL = f"""
SELECT user_id, count(*) AS n_events,
       round(list_reduce(list(value ORDER BY epoch_ns(ts), event_id),
                         (acc, x) -> {dlit(EWMA_ALPHA)} * x
                                     + {dlit(1.0 - EWMA_ALPHA)} * acc),
             6) AS ewma_last
FROM events WHERE value IS NOT NULL
GROUP BY user_id
"""


# --- interval overlap join (round 5) -----------------------------------------

PROMO_WINDOWS: tuple[tuple[int, str, str], ...] = (
    (1, "1995-06-01", "1995-08-31"),
    (2, "1996-11-15", "1997-01-15"),
    (3, "1998-03-01", "1998-03-31"),
    (4, "1999-07-04", "1999-09-06"),
    (5, "2000-12-01", "2001-02-28"),
)


FULFILL_DAYS = 90


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order is live over its fulfillment
    window [o_orderdate, o_orderdate + 90d]; count orders and distinct
    customers overlapping each promo window (overlap iff
    start_a <= end_b AND end_a >= start_b) — allocation against calendar
    windows, the interval counterpart of the as-of join. The window side
    is tiny and broadcast, so the fact side streams map-side with zero
    shuffle before the 5-group aggregate; a large-large interval join
    goes through the binned range-join kernel instead
    (rel_range_bucket_join). Exact integer/date arithmetic only.
    """
    o = load(spark, sf_dir, "orders")
    promos = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(pid).cast("bigint").alias("promo_id"),
                        F.lit(s).cast("date").alias("p_start"),
                        F.lit(e).cast("date").alias("p_end"),
                    )
                    for pid, s, e in PROMO_WINDOWS
                ]
            )
        ).alias("p")
    ).select("p.*")
    start = F.col("o_orderdate").cast("date")
    j = o.join(
        F.broadcast(promos),
        (start <= F.col("p_end"))
        & (F.date_add(start, FULFILL_DAYS) >= F.col("p_start")),
    )
    return j.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_custs"),
    )


_PROMO_VALUES = ", ".join(
    f"({pid}, DATE '{s}', DATE '{e}')" for pid, s, e in PROMO_WINDOWS
)
INTERVAL_OVERLAP_SQL = f"""
WITH promos(promo_id, p_start, p_end) AS (VALUES {_PROMO_VALUES})
SELECT CAST(promo_id AS BIGINT) AS promo_id, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_custs
FROM orders JOIN promos
  ON CAST(o_orderdate AS DATE) <= p_end
 AND CAST(o_orderdate AS DATE) + {FULFILL_DAYS} >= p_start
GROUP BY promo_id
"""


# --- first-touch attribution (round 5) ---------------------------------------

ATTR_WINDOW_NS = 7 * 86_400 * 1_000_000_000  # 7 days


def position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the 40/20/40
    industry-standard split first_touch deliberately ignores: per user,
    the first touch earns 40% credit, the last 40%, and the middle
    touches share the remaining 20%. All credit is EXACT INTEGER BASIS
    POINTS: single-touch paths earn 10000, two-touch 5000/5000, and for
    n>=3 the middle share is 2000 DIV (n-2) with the remainder assigned
    one point each to the EARLIEST middles — so every user's path sums to
    exactly 10000 bp and the per-type totals are order-free BIGINT folds
    (a percentage-double version would accumulate float dust and
    shuffle-order drift).

    Scale: one rank window + one count window, both partition-local per
    user; credit is a branch-free CASE per row; one map-side-combining
    sum per event_type."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    r = e.select(
        "event_type",
        F.row_number().over(w_rank).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    mid_base = F.expr("2000 DIV (n - 2)")
    mid_rem = F.expr("2000 % (n - 2)")
    j = F.col("rk") - 1  # 1-based middle position
    credit = (
        F.when(F.col("n") == 1, F.lit(10000).cast("bigint"))
        .when(F.col("n") == 2, F.lit(5000).cast("bigint"))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")), F.lit(4000).cast("bigint"))
        .otherwise(
            (mid_base + F.when(j <= mid_rem, 1).otherwise(0)).cast("bigint")
        )
    )
    return (
        r.select("event_type", credit.alias("bp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("bp").cast("bigint").alias("credit_bp"),
        )
        .orderBy("event_type")
    )


POSITION_ATTRIBUTION_SQL = """
WITH r AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM events),
c AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 THEN 5000
              WHEN rk = 1 OR rk = n THEN 4000
              ELSE 2000 // (n - 2)
                   + CASE WHEN rk - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END
         END AS bp
  FROM r)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(bp) AS BIGINT) AS credit_bp
FROM c GROUP BY event_type ORDER BY event_type
"""


def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's FIRST click gets credit for
    every purchase value inside the following 7-day window — the marketing
    -funnel allocation that needs an extremal event per key plus a
    time-banded self-join. Users who never click don't appear; users with
    no in-window purchase report 0.

    Scale shape: the first click is a min-struct aggregate (map-side
    combine, no window needed); the purchases join is keyed on user_id
    with the time band as a residual predicate — one shuffle each side,
    broadcast-able if the clicker set is small. Purchase values sum as a
    sequential fold over (ts, event_id) order; timestamps are exact int64
    nanos throughout.
    """
    e = load(spark, sf_dir, "events")
    first_click = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fc"))
        .select("user_id", F.col("fc.ts").alias("click_ts"))
    )
    # NULL-valued purchases are excluded on BOTH engines: Spark's struct
    # fold would propagate NULL into the total while the oracle's coalesce
    # reads 0.0 — the one row class where the two would silently diverge
    purchases = e.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(F.col("user_id").alias("p_uid"), "ts", "event_id", "value")
    # the time band lives in the JOIN condition (not a post-filter): a user
    # whose purchases all fall outside the window must still report 0
    j = first_click.join(
        purchases,
        (F.col("user_id") == F.col("p_uid"))
        & (F.col("ts") >= F.col("click_ts"))
        & (F.col("ts") <= F.col("click_ts") + F.lit(ATTR_WINDOW_NS)),
        "left",
    )
    # collect_list drops NULLs, so the no-match left-join row contributes
    # an EMPTY array (fold -> 0.0), not a null struct (fold -> NULL)
    per = j.groupBy("user_id", "click_ts").agg(
        F.count("ts").alias("n_purchases"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("ts").isNotNull(),
                    F.struct("ts", "event_id", "value"),
                )
            )
        ).alias("xs"),
    )
    total = F.aggregate(
        F.col("xs"), F.lit(0.0), lambda a, s: a + s.getField("value")
    )
    return per.select(
        "user_id",
        "click_ts",
        "n_purchases",
        F.round(total, 6).alias("attributed_value"),
    )


FIRST_TOUCH_SQL = f"""
WITH fc AS (
  SELECT user_id, min(struct_pack(tsn := epoch_ns(ts), eid := event_id)) AS m
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
clicks AS (SELECT user_id, m.tsn AS click_ts FROM fc),
pur AS (
  SELECT user_id, epoch_ns(ts) AS tsn, event_id, value
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
j AS (
  SELECT c.user_id, c.click_ts, p.tsn, p.event_id, p.value
  FROM clicks c LEFT JOIN pur p
    ON c.user_id = p.user_id
   AND p.tsn >= c.click_ts AND p.tsn <= c.click_ts + {ATTR_WINDOW_NS}
)
SELECT user_id, click_ts, count(tsn) AS n_purchases,
       round(coalesce(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(value ORDER BY tsn, event_id)
                            FILTER (WHERE tsn IS NOT NULL)),
               (a, x) -> a + x), 0.0), 6) AS attributed_value
FROM j GROUP BY user_id, click_ts
"""


# --- market-basket association rules (round 6) ------------------------------

BASKET_MIN_PAIR = 3  # minimum co-occurrence count for a reported rule


def market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (items = part brands):
    per brand pair, co-occurrence count, support, confidence(a→b) and
    lift — the classic retail-analytics fan-out next to the LLM suite's
    shingle/band pair generators.

    Scale shape: pair generation is BLOCKED per order (C(k,2) for a
    k-brand basket, never a corpus cross product — the minhash band-join
    discipline); the brand dimension broadcasts; every aggregate is a
    map-side-combining count. Metrics are exact int64 count products with
    ONE double division each, so both engines agree bitwise.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    tot = baskets.agg(F.count_distinct("okey").cast("bigint").alias("n_orders"))
    supp = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("brand_a"), F.col("b.item").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_PAIR)
    )
    sa = F.broadcast(supp.select(F.col("item").alias("brand_a"), F.col("n_item").alias("n_a")))
    sb = F.broadcast(supp.select(F.col("item").alias("brand_b"), F.col("n_item").alias("n_b")))
    return (
        pairs.join(sa, "brand_a")
        .join(sb, "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_orders",
            F.round(
                F.col("n_ab").cast("double") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
            ).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


MARKET_BASKET_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets),
supp AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM baskets GROUP BY item
),
pairs AS (
  SELECT a.item AS brand_a, b.item AS brand_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_PAIR}
)
SELECT brand_a, brand_b, n_ab, sa.n_item AS n_a, sb.n_item AS n_b, n_orders,
       round(CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
       round(CAST(n_ab AS DOUBLE) / CAST(sa.n_item AS DOUBLE), 6) AS confidence,
       round(CAST(n_ab * n_orders AS DOUBLE)
             / CAST(sa.n_item * sb.n_item AS DOUBLE), 6) AS lift
FROM pairs
JOIN supp sa ON sa.item = brand_a
JOIN supp sb ON sb.item = brand_b
CROSS JOIN tot
"""


# --- skyline / Pareto frontier (round 6) -------------------------------------

SKYLINE_BUCKETS = 16
SKYLINE_BAND_WIDTH = 64.0  # price units per band in the final pass


def skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of parts minimizing (retail price, size):
    a (price, size) point survives iff no other point is ≤ on both axes
    and < on one — the multi-objective shortlist query optimizers and
    product-search engines run.

    Two-phase dominance pruning, the salted-top-k discipline applied to
    skylines: distinct (price, size) pairs are hashed into buckets, each
    bucket computes its LOCAL frontier with one running-min window
    (ordered by price asc, size asc, a pair is dominated iff the running
    min of size over its strict predecessors is ≤ its size — sound
    because any dominator sorts strictly earlier). The union of local
    survivors is a superset of the global frontier, but for
    ANTI-correlated (price, size) data the frontier itself is O(distinct
    pairs), so the final pass must NOT funnel it through one task
    (ADVICE r6): survivors are banded by price VALUE (floor(price/W), so
    every point in an earlier band has strictly smaller price than every
    point in a later band), and a survivor is dominated iff an earlier
    band holds a point with size ≤ its size — checked against a
    bands-sized cumulative-min table (bounded by price-range/W
    regardless of row count) — or an in-band strict predecessor has
    size ≤ its size (the same running-min window, partitioned by band).
    Dominance is transitive, so checking against bucket-phase survivors
    only is exact: every eliminated point's eliminator chain ends at a
    frontier point, which survives its bucket. No all-pairs join and no
    full-input single-task window at any point; the only full-data
    shuffles are the distinct-pair aggregate and the bucket exchange.
    """
    p = load(spark, sf_dir, "part").select(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
        "p_partkey",
    )
    pairs = p.groupBy("price", "size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
    )

    def local_frontier(df: DataFrame, part_col: str) -> DataFrame:
        w = (
            W.partitionBy(part_col)
            .orderBy(F.col("price").asc(), F.col("size").asc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
        m = F.min("size").over(w)
        return (
            df.withColumn("_m", m)
            .filter(F.col("_m").isNull() | (F.col("_m") > F.col("size")))
            .drop("_m")
        )

    bucketed = pairs.withColumn(
        "_b", F.pmod(F.hash("price", "size"), F.lit(SKYLINE_BUCKETS))
    )
    local = local_frontier(bucketed, "_b").drop("_b")
    # final pass, still partitioned: price-value bands + cross-band
    # cumulative min (tiny by construction) + per-band windows. Band
    # minima come from ALL pairs, not the local survivors — a superset,
    # but the dominance test is identical (the minimizing point of an
    # earlier band always dominates) and the broadcast subtree then
    # carries only the cheap distinct-pair aggregate, not a second copy
    # of the bucketed window pass.
    band_of = F.floor(F.col("price") / F.lit(SKYLINE_BAND_WIDTH)).cast("bigint")
    band_mins = (
        pairs.withColumn("_band", band_of)
        .groupBy("_band")
        .agg(F.min("size").alias("_bmin"))
    )
    wprev = W.orderBy("_band").rowsBetween(W.unboundedPreceding, -1)
    prev = band_mins.select("_band", F.min("_bmin").over(wprev).alias("_pmin"))
    survivors = (
        local.withColumn("_band", band_of)
        .join(F.broadcast(prev), "_band")
        .filter(F.col("_pmin").isNull() | (F.col("_pmin") > F.col("size")))
        .drop("_pmin")
    )
    return local_frontier(survivors, "_band").drop("_band")


SKYLINE_SQL = """
WITH pairs AS (
  SELECT p_retailprice AS price, p_size AS size,
         CAST(count(*) AS BIGINT) AS n_parts,
         CAST(min(p_partkey) AS BIGINT) AS min_partkey
  FROM part GROUP BY 1, 2
)
SELECT price, size, n_parts, min_partkey
FROM pairs x
WHERE NOT EXISTS (
  SELECT 1 FROM pairs y
  WHERE y.price <= x.price AND y.size <= x.size
    AND (y.price < x.price OR y.size < x.size))
"""


# --- z-order data layout (round 6) -------------------------------------------

ZORDER_PREFIX_SHIFT = 6  # 64 morton codes per z-file (z-cube addressing)
NATURAL_KEY_STRIDE = 64  # orderkeys per file in the insert-order layout


def _morton_spread(c: Column) -> Column:
    """Spread an 8-bit int's bits to the even positions of a 16-bit int
    (the classic mask-and-shift interleave, fully codegen'd)."""
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x3333))
    return c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x5555))


def _morton_spread_sql(v: str) -> str:
    s1 = f"((({v}) | (({v}) << 4)) & 3855)"
    s2 = f"(({s1} | ({s1} << 2)) & 13107)"
    return f"(({s2} | ({s2} << 1)) & 21845)"


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data-layout study — the file-skipping lever for a
    100 TB lake: orders keyed by (customer bucket, day bucket) are binned
    into files two ways — insert order (orderkey stride) vs Morton-prefix
    z-cubes — and each layout reports its per-file bounding-box stats.
    Tight boxes = point/range queries on EITHER dimension skip most files
    via parquet min/max; the z-order layout's avg box area is the win
    (asserted by pytest at sf0.001).

    No global sort/row_number anywhere: file assignment is a pure
    projection (key stride / morton prefix), so the whole study is two
    map-side-combining aggregates — embarrassingly parallel at any scale.
    Morton interleave is 6 codegen'd mask-and-shift ops per row.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    x = (F.col("o_custkey") % 256).cast("int")
    y = (
        F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01")))
        % 256
    ).cast("int")
    z = _morton_spread(x).bitwiseOR(F.shiftleft(_morton_spread(y), 1))
    base = o.select(
        F.col("o_orderkey").alias("okey"), x.alias("x"), y.alias("y"), z.alias("z")
    )

    def layout(name: str, fid: Column) -> DataFrame:
        per_file = base.groupBy(fid.alias("file_id")).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        xs = (F.col("x_max") - F.col("x_min") + 1).cast("bigint")
        ys = (F.col("y_max") - F.col("y_min") + 1).cast("bigint")
        return (
            per_file.select("n", xs.alias("xs"), ys.alias("ys"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.sum("xs").cast("bigint").alias("sx"),
                F.sum("ys").cast("bigint").alias("sy"),
                F.sum(F.col("xs") * F.col("ys")).cast("bigint").alias("sa"),
            )
            .select(
                F.lit(name).alias("layout"),
                "n_files",
                "n_rows",
                F.round(
                    F.col("sx").cast("double") / F.col("n_files").cast("double"), 6
                ).alias("avg_x_span"),
                F.round(
                    F.col("sy").cast("double") / F.col("n_files").cast("double"), 6
                ).alias("avg_y_span"),
                F.round(
                    F.col("sa").cast("double") / F.col("n_files").cast("double"), 6
                ).alias("avg_bbox_area"),
            )
        )

    natural = layout(
        "natural", F.floor(F.col("okey") / NATURAL_KEY_STRIDE).cast("bigint")
    )
    zord = layout(
        "zorder", F.shiftright(F.col("z"), ZORDER_PREFIX_SHIFT).cast("bigint")
    )
    return natural.unionByName(zord)


def _zorder_sql() -> str:
    sx = _morton_spread_sql("x")
    sy = _morton_spread_sql("y")
    base = f"""
  SELECT o_orderkey AS okey,
         CAST(o_custkey % 256 AS INTEGER) AS x,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 256
              AS INTEGER) AS y
  FROM orders
"""
    zbase = f"SELECT okey, x, y, ({sx} | ({sy} << 1)) AS z FROM ({base}) t"

    def layout(name: str, fid: str) -> str:
        return f"""
SELECT '{name}' AS layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round(CAST(sum(xs) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_x_span,
       round(CAST(sum(ys) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_y_span,
       round(CAST(sum(xs * ys) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS avg_bbox_area
FROM (
  SELECT {fid} AS file_id, count(*) AS n,
         CAST(max(x) - min(x) + 1 AS BIGINT) AS xs,
         CAST(max(y) - min(y) + 1 AS BIGINT) AS ys
  FROM ({zbase}) zb GROUP BY 1) pf
"""

    nat = layout("natural", f"CAST(floor(okey / {NATURAL_KEY_STRIDE}.0) AS BIGINT)")
    zo = layout("zorder", f"CAST(z // {2 ** ZORDER_PREFIX_SHIFT} AS BIGINT)")
    return f"{nat} UNION ALL {zo}"


# --- clamped running balance (round 7) ---------------------------------------

BALANCE_SEED = 100.0  # opening balance per user


def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory-style running balance with a floor: per user, events
    apply signed deltas (value debits for 'purchase', credits otherwise)
    to an opening balance, and the balance CLAMPS at zero — an overdrawn
    step loses the excess rather than going negative (stock cannot be
    shipped that was never there). The clamp makes the recurrence
    bal = max(0, bal + delta) genuinely sequential — no prefix-sum window
    can express it — so it runs as the EWMA-style seeded per-user array
    fold, replayed exactly by DuckDB's list_reduce. Reports the final
    balance, how many steps clamped, and the total value lost to clamps.

    Scale: one user-keyed shuffle, bounded per-user arrays (the 100 TB
    form checkpoints period-end balances and folds within periods)."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    delta = F.when(
        F.col("event_type") == "purchase", -F.col("value")
    ).otherwise(F.col("value"))
    per = (
        e.select("user_id", "ts", "event_id", delta.alias("d"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "event_id", "d"))).alias("xs"))
    )
    ds = F.transform(F.col("xs"), lambda s: s.getField("d"))
    # accumulator: (balance, n_clamped, lost) as a 3-element double array
    step = lambda acc, d: F.array(  # noqa: E731
        F.greatest(F.lit(0.0), F.element_at(acc, 1) + d),
        F.element_at(acc, 2)
        + F.when(F.element_at(acc, 1) + d < 0, 1.0).otherwise(0.0),
        F.element_at(acc, 3)
        + F.when(
            F.element_at(acc, 1) + d < 0, -(F.element_at(acc, 1) + d)
        ).otherwise(0.0),
    )
    fold = F.aggregate(
        ds, F.array(F.lit(BALANCE_SEED), F.lit(0.0), F.lit(0.0)), step
    )
    return per.select(
        "user_id",
        F.size("xs").cast("bigint").alias("n_events"),
        F.round(F.element_at(fold, 1), 6).alias("final_balance"),
        F.element_at(fold, 2).cast("bigint").alias("n_clamped"),
        F.round(F.element_at(fold, 3), 6).alias("value_lost"),
    )


CLAMPED_BALANCE_SQL = f"""
WITH per AS (
  SELECT user_id,
         list(CASE WHEN event_type = 'purchase' THEN -value ELSE value END
              ORDER BY epoch_ns(ts), event_id) AS ds
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
f AS (
  SELECT user_id, len(ds) AS n,
         list_reduce(
           list_prepend([{dlit(BALANCE_SEED)}, {dlit(0.0)}, {dlit(0.0)}],
                        list_transform(ds, d -> [d, d, d])),
           (acc, x) -> [greatest({dlit(0.0)}, acc[1] + x[1]),
                        acc[2] + CASE WHEN acc[1] + x[1] < 0
                                      THEN {dlit(1.0)} ELSE {dlit(0.0)} END,
                        acc[3] + CASE WHEN acc[1] + x[1] < 0
                                      THEN -(acc[1] + x[1])
                                      ELSE {dlit(0.0)} END]) AS st
  FROM per
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(st[1], 6) AS final_balance,
       CAST(st[2] AS BIGINT) AS n_clamped,
       round(st[3], 6) AS value_lost
FROM f
"""


# --- differentially-private release counts (round 7) -------------------------

DP_EPSILON = 0.5


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release counts: per-event-type counts with
    Laplace(1/ε) noise — the privacy mechanism next to the k-anonymity
    audit (that one measures re-identification risk; this one releases a
    protected aggregate). Count queries have sensitivity 1, so the noise
    scale is b = 1/ε.

    The Laplace draw is DETERMINISTIC: u = (hex4(md5(event_type))+0.5)/65536
    ∈ (0,1) — the +0.5 keeps u strictly off both endpoints so
    ln(1-2|u-0.5|) is always finite even when the md5 prefix is 0000 or
    ffff (r7 ADVICE) — noise = -b·sign(u-0.5)·ln(1-2|u-0.5|), the inverse-CDF
    transform on a hash-seeded uniform, so the release is reproducible
    under re-runs/retries (the stratified-sample discipline applied to
    noise; a production run would salt the hash with a per-release secret
    seed). Exact integer counts underneath; one ln per released row.
    Scale: one map-side-combining aggregate, alphabet-sized output."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    from .llm import _hex4_to_int

    u = (_hex4_to_int(F.md5(F.col("event_type"))) + F.lit(0.5)) / F.lit(65536.0)
    b = F.lit(1.0 / DP_EPSILON)
    half = u - F.lit(0.5)
    noise = -b * F.signum(half) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(half))
    return counts.select(
        "event_type",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count").cast("double") + noise, 6).alias("released"),
    )


def _dp_counts_sql() -> str:
    from .llm import _hex4_to_int_sql

    u = (
        f"(({_hex4_to_int_sql('md5(event_type)')} + CAST(0.5 AS DOUBLE))"
        f" / CAST(65536.0 AS DOUBLE))"
    )
    b = dlit(1.0 / DP_EPSILON)
    half = f"({u} - {dlit(0.5)})"
    noise = (
        f"(-{b} * sign({half})"
        f" * ln({dlit(1.0)} - {dlit(2.0)} * abs({half})))"
    )
    return f"""
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
  FROM events GROUP BY event_type
)
SELECT event_type, true_count,
       round({noise}, 6) AS noise,
       round(CAST(true_count AS DOUBLE) + {noise}, 6) AS released
FROM c
"""


# --- session path mining (round 7) -------------------------------------------

SESS_GAP_US = 600_000_000  # same 10-minute session gap as sessionize_events


def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session navigation paths: the corpus-wide frequency of each
    adjacent (from_type -> to_type) event transition INSIDE a session
    (the gaps-and-islands sessionization of sessionize_events), plus the
    conditional probability given the from-type — the first-order Markov
    model behind funnel design and next-event prediction. Cross-session
    boundaries contribute no transition (lag resets per session).

    Scale: one user-keyed window shuffle (shared ordering for session ids
    and the lag), then one map-side-combining aggregate sized by the
    event-type alphabet squared; the per-from totals are a tiny window
    over that aggregate."""
    ev = load(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when((F.col("ts_us") - F.lag("ts_us").over(w)) > SESS_GAP_US, 1).otherwise(
            F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0)
        ),
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = flagged.withColumn("sess_id", F.sum("new_sess").over(wsum))
    ws = W.partitionBy("user_id", "sess_id").orderBy("ts_us", "event_id")
    pairs = (
        sess.withColumn("from_type", F.lag("event_type").over(ws))
        .filter(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wt = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("p_given_from"),
    )


SESSION_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESS_GAP_US} THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
),
pairs AS (
  SELECT lag(event_type) OVER ws AS from_type, event_type AS to_type
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sess_id ORDER BY ts_us, event_id)
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
         AS p_given_from
FROM counts
"""


# --- EWMA-residual anomaly detection (round 7) -------------------------------

# --- Event-sequence pattern matching (round 13) ------------------------------

SEQ_PATTERNS: list[tuple[str, str]] = [
    # alphabet = first letter of event_type: c(lick) e(rror) p(urchase)
    # s(ignup) v(iew) — the five types are first-letter-unique.
    ("browse_to_buy", "vc*p"),  # a view, any clicks, first purchase
    ("error_burst", "ee+"),  # 2+ consecutive errors
    ("signup_then_buy", "s[vce]*p"),  # signup converting within the day
]


def seq_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style event-sequence pattern detection (the SQL:2016
    row-pattern-matching surface Spark lacks), expressed Spark-first: each
    user-day's events collapse to an ordered single-char string (the five
    event types are first-letter-unique), and each pattern is a regex
    scanned leftmost non-overlapping over that string — `vc*p` is
    MATCH_RECOGNIZE `PATTERN (V C* P)` with AFTER MATCH SKIP PAST LAST
    ROW. Output: per (pattern, match length) the total match count and
    the number of distinct user-days containing one.

    Both engines (Java regex, DuckDB RE2) produce identical leftmost
    non-overlapping scans for these patterns (no alternation ambiguity),
    so the driver hash pins the full match-extraction semantics, not
    just counts.

    Scale: ONE shuffle keyed (user_id, day); the per-key ordered string
    is bounded by per-user daily activity (human-bounded, independent of
    corpus size — the same bound sessionization relies on), so the
    collect_list state never skews; the regex scan is JVM-side per
    string; the final rollup is alphabet-bounded. At 100 TB the
    (user, day) key count grows linearly but each group stays tiny —
    the ideal hash-aggregate shape.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.substring("event_type", 1, 1).alias("code"),
    )
    strs = (
        ev.withColumn("day", F.expr(f"ts_us div {MICROS_PER_DAY}"))
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "code"))),
                    lambda x: x["code"],
                ),
                "",
            ).alias("s")
        )
    )
    hits = None
    for name, rx in SEQ_PATTERNS:
        h = strs.select(
            "user_id",
            "day",
            F.lit(name).alias("pattern"),
            F.explode(F.regexp_extract_all("s", F.lit(rx), F.lit(0))).alias("hit"),
        )
        hits = h if hits is None else hits.unionByName(h)
    return (
        hits.groupBy("pattern", F.length("hit").cast("int").alias("match_len"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.countDistinct(
                F.col("user_id") * F.lit(1_000_000) + F.col("day")
            ).cast("bigint").alias("n_seqs"),
        )
    )


def _seq_pattern_sql() -> str:
    arms = "\n  UNION ALL\n".join(
        f"  SELECT user_id, day, '{name}' AS pattern,\n"
        f"         unnest(regexp_extract_all(s, '{rx}')) AS hit FROM strs"
        for name, rx in SEQ_PATTERNS
    )
    return f"""
WITH strs AS (
  SELECT user_id, CAST(epoch_us(ts) // {MICROS_PER_DAY} AS BIGINT) AS day,
         string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS s
  FROM events GROUP BY 1, 2
),
m AS (
{arms}
)
SELECT pattern, CAST(length(hit) AS INTEGER) AS match_len,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT user_id * 1000000 + day) AS BIGINT) AS n_seqs
FROM m GROUP BY 1, 2
"""


ANOM_K = 2.0  # flag when |x - ewma_prev| > K * sigma_user


def ewma_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user telemetry anomaly screen: each event's residual against
    the EWMA of its STRICT predecessors (the forecast a monitor would
    have held at that moment), flagged when it exceeds K times the user's
    own history deviation — the thresholding step downstream of
    ewma_per_user. Per user: event count, sigma, anomaly count, max
    absolute residual.

    The prefix-EWMA sequence is ONE seeded array fold (the accumulator
    is the growing ewma list, appending a·x + (1-a)·last), replayed
    verbatim by DuckDB's list_reduce over single-element-list inputs;
    residuals, moments, and the max all fold over the same
    (ts, event_id)-sorted array, so every float op sequence is identical
    in both engines. Scale: one user-keyed shuffle, bounded per-user
    arrays (a trailing window at 100 TB — the ewma_per_user caveat)."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("xs"),
    )
    vals = F.transform(F.col("xs"), lambda s: s.getField("value"))
    per = per.select("user_id", vals.alias("vals"))
    n = F.size("vals")
    a, b = F.lit(EWMA_ALPHA), F.lit(1.0 - EWMA_ALPHA)
    ews = F.aggregate(
        F.slice("vals", 2, n - 1),
        F.array(F.element_at("vals", 1)),
        lambda acc, x: F.concat(acc, F.array(a * x + b * F.element_at(acc, -1))),
    )
    sx = F.aggregate("vals", F.lit(0.0), lambda acc, x: acc + x)
    sxx = F.aggregate("vals", F.lit(0.0), lambda acc, x: acc + x * x)
    nd = n.cast("double")
    sigma = F.sqrt((nd * sxx - sx * sx) / (nd * nd))
    resid = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at("vals", i) - F.element_at(F.col("ews"), i - 1),
        ),
    ).otherwise(F.expr("CAST(array() AS array<double>)"))
    t = per.select("user_id", "vals", ews.alias("ews"), sigma.alias("sigma"))
    t = t.select("user_id", "vals", "sigma", resid.alias("rs"))
    return t.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        F.round("sigma", 6).alias("sigma"),
        F.size(
            F.filter("rs", lambda r: F.abs(r) > F.lit(ANOM_K) * F.col("sigma"))
        )
        .cast("bigint")
        .alias("n_anomalies"),
        F.round(
            F.aggregate("rs", F.lit(0.0), lambda acc, r: F.greatest(acc, F.abs(r))), 6
        ).alias("max_resid"),
    )


EWMA_ANOM_SQL = f"""
WITH per AS (
  SELECT user_id, list(value ORDER BY epoch_ns(ts), event_id) AS vals
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
f AS (
  SELECT user_id, vals, len(vals) AS n,
         list_reduce(
           list_prepend([vals[1]],
                        list_transform(vals[2:], v -> [v])),
           (acc, x) -> list_append(acc, {dlit(EWMA_ALPHA)} * x[-1]
                                        + {dlit(1.0 - EWMA_ALPHA)} * acc[-1])) AS ews,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                     (acc, x) -> acc + x) AS sx,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(vals, v -> v * v)),
                     (acc, x) -> acc + x) AS sxx
  FROM per
),
g AS (
  SELECT user_id, vals, n, ews,
         sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma,
         [vals[i] - ews[i - 1] for i in generate_series(2, n)] AS rs
  FROM f
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       round(sigma, 6) AS sigma,
       CAST(len([r for r in rs if abs(r) > {dlit(ANOM_K)} * sigma]) AS BIGINT)
         AS n_anomalies,
       round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list_transform(rs, r -> abs(r))),
                         (acc, r) -> greatest(acc, r)), 6) AS max_resid
FROM g
"""


# --- GDPR user-erasure audit (round 7) ---------------------------------------

ERASE_MOD = 97  # deterministic stand-in for the deletion-request key set


def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure propagation audit: given a deletion-request key
    set (here the deterministic user_id % ERASE_MOD == 0 stand-in), every
    user-keyed table reports rows before, rows removed, and rows after —
    the compliance ledger a deletion job must emit before committing the
    rewrite. Orders cascade to their lineitems through the order key, so
    the audit exercises both direct-key and transitive erasure.

    Scale: each leg is one filtered count pair (erasure membership is a
    pure key predicate, so it rides the scan); the lineitem leg is a
    semi-join shipping only order keys. At 100 TB the same anti-join
    feeds the actual rewrite; this query is its dry-run accounting."""
    ev = load(spark, sf_dir, "events")
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    hit_ev = F.col("user_id") % ERASE_MOD == 0
    hit_cu = F.col("c_custkey") % ERASE_MOD == 0
    hit_od = F.col("o_custkey") % ERASE_MOD == 0

    def leg(name: str, df: DataFrame, hit) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("rows_before"),
            F.sum(hit.cast("int")).cast("bigint").alias("rows_removed"),
            (F.count(F.lit(1)) - F.sum(hit.cast("int")))
            .cast("bigint")
            .alias("rows_after"),
        )

    erased_orders = od.filter(hit_od).select("o_orderkey")
    li_hit = li.join(
        erased_orders, li.l_orderkey == erased_orders.o_orderkey, "leftsemi"
    )
    li_leg = li.agg(F.count(F.lit(1)).cast("bigint").alias("rows_before")).crossJoin(
        li_hit.agg(F.count(F.lit(1)).cast("bigint").alias("rows_removed"))
    ).select(
        F.lit("lineitem").alias("table_name"),
        "rows_before",
        "rows_removed",
        (F.col("rows_before") - F.col("rows_removed")).cast("bigint").alias(
            "rows_after"
        ),
    )
    return (
        leg("events", ev, hit_ev)
        .unionByName(leg("customer", cu, hit_cu))
        .unionByName(leg("orders", od, hit_od))
        .unionByName(li_leg)
    )


USER_ERASURE_SQL = f"""
SELECT 'events' AS table_name, CAST(count(*) AS BIGINT) AS rows_before,
       CAST(sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS rows_removed,
       CAST(count(*) - sum(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS rows_after
FROM events
UNION ALL
SELECT 'customer', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) - sum(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM customer
UNION ALL
SELECT 'orders', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(*) - sum(CASE WHEN o_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', b.n, r.n, b.n - r.n FROM
  (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem) b,
  (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
   WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                        WHERE o_custkey % {ERASE_MOD} = 0)) r
"""


# --- interval max-concurrency sweep (round 7) --------------------------------

# score encoding: live * SWEEP_SCALE + (SWEEP_SCALE - 1 - day) packs (peak
# level, earliest day at that level) into one bigint max — ties on live
# resolve to the SMALLEST day because it carries the LARGEST complement.
# Day numbers (epoch days) stay < 1e6 for any date before year 4707; live
# <= |orders| keeps the product under int64 even at ~1.5e11 orders (100 TB).
SWEEP_SCALE = 1_000_000


def max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval max-concurrency via the +1/-1 event sweep: each order is
    live over [o_orderdate, o_orderdate + 90d] (the rel_interval_overlap_join
    fulfillment window); per order priority, find the PEAK number of
    simultaneously-live orders and the earliest date it occurs — the
    capacity-planning number (peak concurrent sessions / open connections /
    in-flight orders) that the overlap JOIN cannot produce without
    comparing every pair of intervals.

    Scale shape: the sweep is 2 rows per order folded immediately by a
    map-side-combining (priority, day) aggregate, so the running-sum window
    sees at most |priorities| x |calendar days| rows — bounded by the TIME
    DOMAIN, not the data size (a year is ~365 rows per key at any SF). The
    peak + earliest-date argmax is one exact-integer encoded max (no second
    window, no self-join); tie-break and decode are integer arithmetic, so
    the result is bitwise across engines.
    """
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")).alias(
            "day"
        ),
    )
    deltas = o.select("pri", "day", F.lit(1).alias("delta")).unionAll(
        o.select(
            "pri",
            (F.col("day") + F.lit(FULFILL_DAYS + 1)).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    per_day = deltas.groupBy("pri", "day").agg(F.sum("delta").alias("net"))
    live = F.sum("net").over(W.partitionBy("pri").orderBy("day")).cast("bigint")
    scored = per_day.select(
        "pri",
        (
            live * F.lit(SWEEP_SCALE) + (F.lit(SWEEP_SCALE - 1) - F.col("day"))
        ).alias("score"),
    )
    s = F.col("s")
    return (
        scored.groupBy("pri")
        .agg(F.max("score").alias("s"))
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.floor(s / SWEEP_SCALE).cast("bigint").alias("peak_live"),
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    (F.lit(SWEEP_SCALE - 1) - s % SWEEP_SCALE).cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("peak_date"),
        )
    )


MAX_CONCURRENCY_SQL = f"""
WITH o AS (
  SELECT o_orderpriority AS pri,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
  FROM orders
),
deltas AS (
  SELECT pri, day, 1 AS delta FROM o
  UNION ALL
  SELECT pri, day + {FULFILL_DAYS + 1}, -1 FROM o
),
per_day AS (SELECT pri, day, sum(delta) AS net FROM deltas GROUP BY pri, day),
scored AS (
  SELECT pri,
         CAST(sum(net) OVER (PARTITION BY pri ORDER BY day) AS BIGINT)
           * {SWEEP_SCALE} + ({SWEEP_SCALE - 1} - day) AS score
  FROM per_day
),
mx AS (SELECT pri, max(score) AS s FROM scored GROUP BY pri)
SELECT pri AS o_orderpriority,
       CAST(s // {SWEEP_SCALE} AS BIGINT) AS peak_live,
       strftime(DATE '1970-01-01'
                  + CAST({SWEEP_SCALE - 1} - (s % {SWEEP_SCALE}) AS INTEGER),
                '%Y-%m-%d') AS peak_date
FROM mx
"""


FIFO_MAX_PART = 200
FIFO_BIN = 64  # cum-quantity bin width (~2x max single-lot qty)


def fifo_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching (inventory/lot accounting, tax-lot matching for
    trades): per part, odd line numbers are receipts and even ones are
    issues (a deterministic synthetic split of the lineitem flow); each
    issue consumes receipts strictly first-in-first-out. Expressed as the
    classic cumulative-interval intersection: each receipt covers the
    cumulative-quantity interval [cum−qty, cum) on the part's inbound
    axis, each issue likewise on the outbound axis, and FIFO matches are
    EXACTLY the pairs whose intervals overlap, with
    qty_matched = min(hi) − max(lo) — no procedural loop, no recursion.

    Determinism: quantities are whole-valued (cast to int64 exactly);
    the running sums are integer windows under a total (orderkey,
    linenumber) order; every matched quantity is exact integer min/max
    arithmetic. Scale: both running sums are part-keyed windows (lot
    counts per part are bounded); the match is a part-keyed equi-join
    whose per-part pair count is O(receipts + issues) — FIFO intervals
    are non-overlapping within each side, so each receipt overlaps a
    contiguous run of issues (chain length 1 + crossings, never
    receipts x issues). Bounded to l_partkey < FIFO_MAX_PART for the
    fixture; at scale the same plan runs unbounded with AQE handling hot
    parts."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < FIFO_MAX_PART)
        .groupBy("l_partkey", "l_orderkey", "l_linenumber")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    # the synthetic lake repeats (orderkey, linenumber); the pre-aggregate
    # makes the FIFO axis order total, so RANGE == ROWS in the window
    w = W.partitionBy("l_partkey").orderBy("l_orderkey", "l_linenumber")

    def lots(side: DataFrame, tag: str) -> DataFrame:
        hi = F.sum("qty").over(w)
        return side.select(
            "l_partkey",
            F.col("l_orderkey").alias(f"{tag}_order"),
            F.col("l_linenumber").alias(f"{tag}_line"),
            (hi - F.col("qty")).alias(f"{tag}_lo"),
            hi.alias(f"{tag}_hi"),
        )

    rec = lots(li.filter(F.col("l_linenumber") % 2 == 1), "in")
    iss = lots(li.filter(F.col("l_linenumber") % 2 == 0), "out")

    # Bin-quantize the cumulative-quantity axis (the radius-join /
    # range_bin_join trick): joining on l_partkey alone examines
    # receipts x issues candidate pairs per part, which the measured
    # scaling curve showed going quadratic as lots densify. With the
    # (part, bin) key each side contributes O(BIN/min_qty) intervals per
    # bin, so per-part work is linear in lots. A pair can share several
    # bins; it is emitted only in the bin containing the overlap START,
    # so no DISTINCT is needed and the output is row-identical to the
    # plain interval join (the procedural-queue pytest and the unchanged
    # oracle pin this).
    def binned(side: DataFrame, lo: str, hi: str) -> DataFrame:
        return side.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(FIFO_BIN)).cast("long"),
                    F.floor((F.col(hi) - 1) / F.lit(FIFO_BIN)).cast("long"),
                )
            ),
        )

    j = (
        binned(rec, "in_lo", "in_hi")
        .join(binned(iss, "out_lo", "out_hi"), ["l_partkey", "__bin"])
        .filter(
            (F.col("in_lo") < F.col("out_hi"))
            & (F.col("out_lo") < F.col("in_hi"))
            & (
                F.floor(
                    F.greatest(F.col("in_lo"), F.col("out_lo")) / F.lit(FIFO_BIN)
                ).cast("long")
                == F.col("__bin")
            )
        )
    )
    return j.select(
        "l_partkey",
        "in_order",
        "in_line",
        "out_order",
        "out_line",
        (
            F.least(F.col("in_hi"), F.col("out_hi"))
            - F.greatest(F.col("in_lo"), F.col("out_lo"))
        ).cast("bigint").alias("qty_matched"),
    )


FIFO_SQL = f"""
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem WHERE l_partkey < {FIFO_MAX_PART}
  GROUP BY 1, 2, 3),
rec AS (
  SELECT l_partkey, l_orderkey AS in_order, l_linenumber AS in_line,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_orderkey, l_linenumber) - qty AS in_lo,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_orderkey, l_linenumber) AS in_hi
  FROM li WHERE l_linenumber % 2 = 1),
iss AS (
  SELECT l_partkey, l_orderkey AS out_order, l_linenumber AS out_line,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_orderkey, l_linenumber) - qty AS out_lo,
         sum(qty) OVER (PARTITION BY l_partkey
                        ORDER BY l_orderkey, l_linenumber) AS out_hi
  FROM li WHERE l_linenumber % 2 = 0)
SELECT r.l_partkey, in_order, in_line, out_order, out_line,
       CAST(least(in_hi, out_hi) - greatest(in_lo, out_lo) AS BIGINT)
         AS qty_matched
FROM rec r JOIN iss i ON r.l_partkey = i.l_partkey
WHERE in_lo < out_hi AND out_lo < in_hi
"""


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the classic
    data-quality / fraud screen for monetary columns: observed first
    significant digit frequencies vs the Benford expectation
    n·log10(1 + 1/d), with the per-digit (obs − exp)²/exp chi-square
    contribution so an auditor sees which digits drive any deviation.

    Determinism: digit extraction is pure string arithmetic on the
    decimal rendering of an exact DECIMAL(18,2) cast (no float
    formatting); counts are exact integers; expectation and contribution
    are a fixed double dag per digit. Scale: one 9-group
    map-side-combining aggregate + a 1-row broadcast total."""
    o = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    per = (
        o.select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    tot = per.agg(F.sum("n_obs").cast("bigint").alias("n"))
    j = per.crossJoin(F.broadcast(tot))
    exp = F.col("n").cast("double") * F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    )
    dev = F.col("n_obs").cast("double") - exp
    return j.select(
        "digit",
        "n_obs",
        F.round(exp, 4).alias("n_expected"),
        F.round(dev * dev / exp, 6).alias("chi2_part"),
    )


BENFORD_SQL = """
WITH per AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders
  GROUP BY 1),
f AS (SELECT * FROM per WHERE digit BETWEEN 1 AND 9),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM f)
SELECT digit, n_obs,
       round(CAST(n AS DOUBLE)
               * log10(CAST(1.0 AS DOUBLE)
                       + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 4)
         AS n_expected,
       round((CAST(n_obs AS DOUBLE)
              - CAST(n AS DOUBLE)
                * log10(CAST(1.0 AS DOUBLE)
                        + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
             * (CAST(n_obs AS DOUBLE)
                - CAST(n AS DOUBLE)
                  * log10(CAST(1.0 AS DOUBLE)
                          + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
             / (CAST(n AS DOUBLE)
                * log10(CAST(1.0 AS DOUBLE)
                        + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))), 6)
         AS chi2_part
FROM f, tot
"""


L_DIVERSITY = 3


def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the companion privacy check to rel_k_anonymity
    (a k-anonymous class is still unsafe if everyone in it shares the
    SAME sensitive value): per quasi-identifier class (event type,
    hour-of-day), the class size, the number of DISTINCT sensitive
    values (the coarse value band), and a violation flag for classes
    with fewer than L distinct values — the homogeneity-attack check a
    release gate runs after the k check.

    Exact integer arithmetic end to end (same epoch-nano hour and
    floor-banded value as the k audit). Scale: one count-distinct
    aggregate on the QI tuple (Spark expands it to a two-level
    aggregate — still map-side-combining on (QI, band)); output is the
    bounded QI domain."""
    e = load(spark, sf_dir, "events")
    hour = F.expr("(ts div 1000000000) div 3600") % 24
    band = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return (
        e.select("event_type", hour.alias("hour"), band.alias("value_band"))
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("value_band").alias("l_distinct"),
        )
        .withColumn(
            "l_violation", (F.col("l_distinct") < L_DIVERSITY).cast("int")
        )
    )


L_DIVERSITY_SQL = f"""
SELECT event_type,
       (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hour,
       count(*) AS n,
       count(DISTINCT CAST(floor(value / 25.0) AS BIGINT)) AS l_distinct,
       CAST(CASE WHEN count(DISTINCT CAST(floor(value / 25.0) AS BIGINT))
                      < {L_DIVERSITY}
                 THEN 1 ELSE 0 END AS INTEGER) AS l_violation
FROM events
GROUP BY 1, 2
"""


RFM_QS = (0.2, 0.4, 0.6, 0.8)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (the classic marketing-analytics cut):
    per customer recency (days since last order, vs the corpus max date),
    frequency (order count), monetary (exact-decimal spend); each
    dimension scored into quintiles 1..5 (5 best — most recent, most
    orders, highest spend) against boundaries from ONE percentile
    aggregate, then rolled up per (r, f, m) segment with volumes and
    per-dimension means.

    Determinism: boundaries are rounded to 4 dp so both engines compare
    identical doubles (the curriculum_deciles discipline; ties fall to
    the lower score); money goes through exact DECIMAL(18,2) sums; means
    are exact sums divided once. Scale: ONE map-side-combining
    groupBy(custkey), a 1-row broadcast for the reference date, a 1-row
    broadcast for the boundaries, and a segment-sized (<=125 rows) final
    aggregate — never an ntile window over all customers (single-task
    global sort at 100 TB)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    per = o.groupBy("o_custkey").agg(
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("p").cast("double").alias("monetary"),
    )
    return rfm_from_per_customer(per)


def rfm_from_per_customer(per: DataFrame) -> DataFrame:
    """Scoring + rollup over the per-customer (o_custkey, last_d, freq,
    monetary) state — shared with the streaming incremental RFM mirror,
    whose micro-batches maintain exactly this table from mergeable
    partials (max / count-sum / exact-decimal-sum) and re-derive the
    quintile boundaries at emission. Keeping the scoring here means the
    batch and streaming answers can never drift."""
    ref = per.agg(F.max("last_d").alias("ref_d"))
    base = per.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("ref_d", "last_d").cast("bigint").alias("recency_days"),
        "freq",
        "monetary",
    )
    bounds = base.agg(
        *[
            F.round(F.percentile(c, q), 4).alias(f"{c[0]}{k}")
            for c in ("recency_days", "freq", "monetary")
            for k, q in enumerate(RFM_QS)
        ]
    )
    nq = len(RFM_QS)
    above = lambda c: sum(  # noqa: E731
        (F.col(c) > F.col(f"{c[0]}{k}")).cast("int") for k in range(nq)
    )
    scored = base.crossJoin(F.broadcast(bounds)).select(
        "recency_days",
        "freq",
        "monetary",
        (F.lit(5) - above("recency_days")).cast("int").alias("r_score"),
        (F.lit(1) + above("freq")).cast("int").alias("f_score"),
        (F.lit(1) + above("monetary")).cast("int").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (
                F.sum("recency_days").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_recency_days"),
            (
                F.sum("freq").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_orders"),
            (
                F.sum(F.col("monetary").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_monetary"),
        )
        .select(
            F.concat_ws(
                "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ).alias("segment"),
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            "avg_recency_days",
            "avg_orders",
            "avg_monetary",
        )
    )


def _rfm_sql(src: str = "orders") -> str:
    """Parameterized on the order source so the retraction mirror's
    oracle can run the identical scoring over the surviving orders."""
    bcols = ",\n         ".join(
        f"round(quantile_cont({c}, {q!r}), 4) AS {c[0]}{k}"
        for c in ("recency_days", "freq", "monetary")
        for k, q in enumerate(RFM_QS)
    )
    above = lambda c: " + ".join(  # noqa: E731
        f"CASE WHEN {c} > {c[0]}{k} THEN 1 ELSE 0 END"
        for k in range(len(RFM_QS))
    )
    return f"""
WITH per AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM {src} GROUP BY 1),
ref AS (SELECT max(last_d) AS ref_d FROM per),
base AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_d, ref_d) AS BIGINT) AS recency_days,
         freq, monetary
  FROM per, ref),
bounds AS (
  SELECT {bcols}
  FROM base),
scored AS (
  SELECT recency_days, freq, monetary,
         CAST(5 - ({above('recency_days')}) AS INTEGER) AS r_score,
         CAST(1 + ({above('freq')}) AS INTEGER) AS f_score,
         CAST(1 + ({above('monetary')}) AS INTEGER) AS m_score
  FROM base, bounds)
SELECT concat_ws('-', r_score, f_score, m_score) AS segment,
       r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(recency_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS avg_recency_days,
       CAST(sum(freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_orders,
       CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg_monetary
FROM scored GROUP BY r_score, f_score, m_score
"""




# --- Fellegi-Sunter probabilistic record linkage (round 12) ------------------

FS_M_SEG = 0.9  # stated per-field match probabilities m_f (the model's
FS_M_BAL = 0.85  # priors; a production deployment EM-fits these — here they
FS_M_SFX = 0.95  # are fixed constants so the score is fully deterministic)
FS_M_CENTS = 0.8


def fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scoring — the SCORING
    half of entity resolution (the blocking half is the llm_ blocking
    family: minhash/prefix/simhash/SRP/hamming + the cost audits). Each
    candidate pair gets the classic log-likelihood match weight
    sum_f [agree_f ? ln(m_f/u_f) : ln((1-m_f)/(1-u_f))] where m_f is the
    stated per-field match probability and u_f the DATA-DERIVED chance
    two random records agree on field f (u_f = sum_v cnt_v^2 / N^2 —
    exact integers until one final divide). The name-suffix field gets
    the term-frequency adjustment (Splink's tf correction): agreeing on
    a RARE value scores ln(m * N / cnt(v)) — rarer agreement, stronger
    evidence. Fields are derived comparators on the customer table
    (segment, balance band, name suffix, balance cents); blocking is
    c_nationkey. Pairs with score > 0 (more likely match than non-match
    under the model) are emitted.

    Determinism: u_f numerators/denominators are exact BIGINTs; each
    term is one or two ln calls on identical doubles; the four terms add
    left-to-right in both engines; score rounds to 6dp at the boundary.
    Scale: blocking bounds the pair space (the quadratic-in-block shape
    every linkage deployment accepts); the u_f statistics are one-row
    broadcasts and the tf table is |values| rows broadcast; at 100 TB
    the u2 sums widen to DECIMAL(38,0) like the moment sketches."""
    c = load(spark, sf_dir, "customer")
    recs = c.select(
        "c_custkey",
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(500.0)).cast("bigint").alias("bal_b"),
        F.expr("right(c_name, 2)").alias("sfx"),
        (F.round(F.col("c_acctbal") * F.lit(100.0)).cast("bigint") % 10).alias(
            "cents"
        ),
    )

    def u2(col: str) -> DataFrame:
        return (
            recs.groupBy(col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias(f"u2_{col}"))
        )

    us = (
        u2("seg")
        .crossJoin(u2("bal_b"))
        .crossJoin(u2("sfx"))
        .crossJoin(u2("cents"))
        .crossJoin(recs.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    )
    sfx_cnt = recs.groupBy("sfx").agg(
        F.count(F.lit(1)).cast("bigint").alias("sfx_c")
    )
    a = recs.alias("a")
    b = recs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.col("a.c_custkey").alias("cust_a"),
        F.col("b.c_custkey").alias("cust_b"),
        (F.col("a.seg") == F.col("b.seg")).cast("int").alias("agr_seg"),
        (F.col("a.bal_b") == F.col("b.bal_b")).cast("int").alias("agr_bal"),
        (F.col("a.sfx") == F.col("b.sfx")).cast("int").alias("agr_sfx"),
        (F.col("a.cents") == F.col("b.cents")).cast("int").alias("agr_cents"),
        F.col("a.sfx").alias("sfx_a"),
    )
    j = pairs.crossJoin(F.broadcast(us)).join(
        F.broadcast(sfx_cnt), F.col("sfx_a") == F.col("sfx"), "left"
    )
    nd = F.col("n").cast("double")
    n2 = (F.col("n") * F.col("n")).cast("double")

    def field_term(agr: str, u2col: str, m: float):
        u = F.col(u2col).cast("double") / n2
        return F.when(F.col(agr) == 1, F.log(F.lit(m) / u)).otherwise(
            F.log(F.lit(1.0 - m) / (F.lit(1.0) - u))
        )

    sfx_term = F.when(
        F.col("agr_sfx") == 1,
        F.log(F.lit(FS_M_SFX) * nd / F.col("sfx_c").cast("double")),
    ).otherwise(
        F.log(
            F.lit(1.0 - FS_M_SFX)
            / (F.lit(1.0) - F.col("u2_sfx").cast("double") / n2)
        )
    )
    score = (
        field_term("agr_seg", "u2_seg", FS_M_SEG)
        + field_term("agr_bal", "u2_bal_b", FS_M_BAL)
        + sfx_term
        + field_term("agr_cents", "u2_cents", FS_M_CENTS)
    )
    return (
        j.select(
            "blk",
            "cust_a",
            "cust_b",
            "agr_seg",
            "agr_bal",
            "agr_sfx",
            "agr_cents",
            score.alias("s"),
        )
        .filter(F.col("s") > 0)
        .select(
            "blk",
            "cust_a",
            "cust_b",
            "agr_seg",
            "agr_bal",
            "agr_sfx",
            "agr_cents",
            F.round("s", 6).alias("score"),
        )
    )


def _fs_linkage_sql() -> str:
    u = "(CAST({c} AS DOUBLE) / CAST(n * n AS DOUBLE))"

    def term(agr: str, u2: str, m: float) -> str:
        uf = u.format(c=u2)
        return (
            f"CASE WHEN {agr} = 1 THEN ln({dlit(m)} / {uf}) "
            f"ELSE ln({dlit(1.0 - m)} / (CAST(1 AS DOUBLE) - {uf})) END"
        )

    sfx_term = (
        f"CASE WHEN agr_sfx = 1 "
        f"THEN ln({dlit(FS_M_SFX)} * CAST(n AS DOUBLE) / CAST(sfx_c AS DOUBLE)) "
        f"ELSE ln({dlit(1.0 - FS_M_SFX)} / (CAST(1 AS DOUBLE) - "
        + u.format(c="u2_sfx")
        + ")) END"
    )
    return f"""
WITH recs AS (
  SELECT c_custkey, c_nationkey AS blk, c_mktsegment AS seg,
         CAST(floor(c_acctbal / CAST(500 AS DOUBLE)) AS BIGINT) AS bal_b,
         right(c_name, 2) AS sfx,
         CAST(round(c_acctbal * CAST(100 AS DOUBLE)) AS BIGINT) % 10 AS cents
  FROM customer),
us AS (
  SELECT
    (SELECT CAST(sum(c * c) AS BIGINT)
     FROM (SELECT count(*) AS c FROM recs GROUP BY seg) t) AS u2_seg,
    (SELECT CAST(sum(c * c) AS BIGINT)
     FROM (SELECT count(*) AS c FROM recs GROUP BY bal_b) t) AS u2_bal_b,
    (SELECT CAST(sum(c * c) AS BIGINT)
     FROM (SELECT count(*) AS c FROM recs GROUP BY sfx) t) AS u2_sfx,
    (SELECT CAST(sum(c * c) AS BIGINT)
     FROM (SELECT count(*) AS c FROM recs GROUP BY cents) t) AS u2_cents,
    (SELECT CAST(count(*) AS BIGINT) FROM recs) AS n),
sfx_cnt AS (
  SELECT sfx, CAST(count(*) AS BIGINT) AS sfx_c FROM recs GROUP BY 1),
pairs AS (
  SELECT a.blk, a.c_custkey AS cust_a, b.c_custkey AS cust_b,
         CAST(a.seg = b.seg AS INTEGER) AS agr_seg,
         CAST(a.bal_b = b.bal_b AS INTEGER) AS agr_bal,
         CAST(a.sfx = b.sfx AS INTEGER) AS agr_sfx,
         CAST(a.cents = b.cents AS INTEGER) AS agr_cents,
         a.sfx AS sfx_a
  FROM recs a JOIN recs b ON a.blk = b.blk AND a.c_custkey < b.c_custkey),
scored AS (
  SELECT p.blk, p.cust_a, p.cust_b,
         p.agr_seg, p.agr_bal, p.agr_sfx, p.agr_cents,
         {term("agr_seg", "u2_seg", FS_M_SEG)}
         + {term("agr_bal", "u2_bal_b", FS_M_BAL)}
         + {sfx_term}
         + {term("agr_cents", "u2_cents", FS_M_CENTS)} AS s
  FROM pairs p CROSS JOIN us LEFT JOIN sfx_cnt f ON p.sfx_a = f.sfx)
SELECT blk, cust_a, cust_b, agr_seg, agr_bal, agr_sfx, agr_cents,
       round(s, 6) AS score
FROM scored WHERE s > 0
"""




# --- Jaro-Winkler fuzzy matching (round 12) ----------------------------------

JW_MIN_SIM = 0.6  # emit threshold for the part-name pair surface


def jaro_winkler_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler fuzzy matching over distinct part names — the string
    comparator half of record linkage (Levenshtein's rank-based sibling;
    the FS scorer consumes comparators like this one). The similarity is
    a PURE Catalyst expression (``functions.text.jaro_winkler`` — greedy
    windowed matching via one fold over the left string with a boolean
    used-mask over the right; see its docstring for the semantics pinned
    bitwise to DuckDB's built-in), so pair scoring runs JVM-side with no
    UDF. Pairs are blocked on the first character — the classic linkage
    blocking choice — and name_a < name_b canonicalizes.

    Scale: the name table collapses to DISTINCT values + counts first
    (fuzzy matching on values, not rows — |values| << |rows| at 100 TB),
    the first-char blocking bounds the quadratic inside each block, and
    the per-pair cost is O(|name| * window) inside codegen-adjacent
    higher-order expressions."""
    from ..functions.text import jaro_winkler

    p = load(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.substring("name", 1, 1).alias("blk"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.substring("name", 1, 1).alias("blk"),
    )
    pairs = a.join(b, "blk").filter(F.col("name_a") < F.col("name_b"))
    jw = jaro_winkler(F.col("name_a"), F.col("name_b"))
    return (
        pairs.select("name_a", "name_b", "n_a", "n_b", jw.alias("s"))
        .filter(F.col("s") >= JW_MIN_SIM)
        .select(
            "name_a", "name_b", "n_a", "n_b", F.round("s", 6).alias("jw_sim")
        )
    )


_JW_MATCH_SQL = f"""
WITH names AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1)
SELECT a.name AS name_a, b.name AS name_b, a.n AS n_a, b.n AS n_b,
       round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_sim
FROM names a JOIN names b
  ON substr(a.name, 1, 1) = substr(b.name, 1, 1) AND a.name < b.name
WHERE jaro_winkler_similarity(a.name, b.name) >= {JW_MIN_SIM}
"""




# --- t-closeness (round 12): the third privacy rung ---------------------------

T_CLOSE_THRESHOLD = 0.2  # Li et al.'s canonical example threshold


def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li, Venkatasubramanian ICDE 2007) — the
    third rung of the privacy ladder after rel_k_anonymity and
    rel_l_diversity: for each quasi-identifier class (event type, hour)
    the ORDERED Earth Mover's Distance between the class's sensitive-
    attribute distribution (value band) and the global one,
    t = (1/(m-1)) * sum_i |cum_p(i) - cum_q(i)| over the m global bands;
    classes with t above the threshold leak attribute information even
    when k-anonymous and l-diverse.

    Exactness: the cumulative difference at band i is
    (N*cumc_g(i) - n_g*cumC(i)) / (n_g*N) — the numerator stays an exact
    BIGINT through the whole fold and ONE final division produces the
    double, so both engines emit identical values (the k-anonymity
    integer-bucketing discipline extended to the EMD). At 100 TB the
    numerator widens to DECIMAL(38,0) like the moment sketches.
    Scale: group x band cells are the bounded QI-domain cross join
    (|types|*24 x |bands|), never event-sized; the global band table
    broadcasts; windows partition by group over <= |bands| rows."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        (F.expr("(ts div 1000000000) div 3600") % 24).alias("hour"),
        F.floor(F.col("value") / F.lit(25.0)).cast("bigint").alias("band"),
    )
    gb = base.groupBy("event_type", "hour", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    glob = base.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    wg = W.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    glob_cum = glob.select(
        "band",
        "cg",
        F.sum("cg").over(wg).cast("bigint").alias("cum_cg"),
    ).crossJoin(
        glob.agg(
            F.sum("cg").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).cast("bigint").alias("m_bands"),
        )
    )
    groups = gb.groupBy("event_type", "hour").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    cells = (
        groups.crossJoin(F.broadcast(glob_cum.select("band", "cum_cg", "n_total", "m_bands")))
        .join(gb, ["event_type", "hour", "band"], "left")
        .select(
            "event_type",
            "hour",
            "band",
            "n",
            "cum_cg",
            "n_total",
            "m_bands",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
    )
    wloc = (
        W.partitionBy("event_type", "hour")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    diff = (
        F.col("n_total") * F.sum("c").over(wloc) - F.col("n") * F.col("cum_cg")
    ).cast("bigint")
    per = (
        cells.select(
            "event_type", "hour", "n", "n_total", "m_bands",
            F.abs(diff).alias("ad"),
        )
        .groupBy("event_type", "hour", "n", "n_total", "m_bands")
        .agg(F.sum("ad").cast("bigint").alias("num"))
    )
    t = F.when(F.col("m_bands") <= 1, F.lit(0.0)).otherwise(
        F.col("num").cast("double")
        / (F.col("n") * F.col("n_total") * (F.col("m_bands") - 1)).cast("double")
    )
    return per.select(
        "event_type",
        "hour",
        "n",
        F.round(t, 6).alias("t_closeness"),
        (t > F.lit(T_CLOSE_THRESHOLD)).cast("int").alias("t_violation"),
    )


T_CLOSENESS_SQL = f"""
WITH base AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hour,
         CAST(floor(value / 25.0) AS BIGINT) AS band
  FROM events),
gb AS (
  SELECT event_type, hour, band, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3),
gall AS (
  SELECT band, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY 1),
gall_cum AS (
  SELECT band, CAST(sum(cg) OVER (ORDER BY band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cg,
         (SELECT CAST(sum(cg) AS BIGINT) FROM gall) AS n_total,
         (SELECT CAST(count(*) AS BIGINT) FROM gall) AS m_bands
  FROM gall),
groups AS (
  SELECT event_type, hour, CAST(sum(c) AS BIGINT) AS n
  FROM gb GROUP BY 1, 2),
cells AS (
  SELECT g.event_type, g.hour, gc.band, g.n, gc.cum_cg, gc.n_total,
         gc.m_bands, CAST(coalesce(b.c, 0) AS BIGINT) AS c
  FROM groups g CROSS JOIN gall_cum gc
  LEFT JOIN gb b ON b.event_type = g.event_type AND b.hour = g.hour
                AND b.band = gc.band),
per AS (
  SELECT event_type, hour, n, n_total, m_bands,
         CAST(sum(abs(n_total * cumc - n * cum_cg)) AS BIGINT) AS num
  FROM (
    SELECT event_type, hour, band, n, cum_cg, n_total, m_bands,
           CAST(sum(c) OVER (PARTITION BY event_type, hour ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumc
    FROM cells) x
  GROUP BY 1, 2, 3, 4, 5)
SELECT event_type, hour, n,
       round(CASE WHEN m_bands <= 1 THEN CAST(0 AS DOUBLE)
                  ELSE CAST(num AS DOUBLE)
                       / CAST(n * n_total * (m_bands - 1) AS DOUBLE) END,
             6) AS t_closeness,
       CAST(CASE WHEN m_bands > 1 AND CAST(num AS DOUBLE)
                      / CAST(n * n_total * (m_bands - 1) AS DOUBLE)
                      > {T_CLOSE_THRESHOLD} THEN 1 ELSE 0 END AS INTEGER)
         AS t_violation
FROM per
"""




# --- Privacy release gate (round 13) ------------------------------------------


def privacy_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy RELEASE-DECISION query — the composition that closes
    the privacy loop the way llm_curation_pipeline closed curation: per
    quasi-identifier class (event type, hour-of-day) ALL THREE rungs of
    the ladder in one row with a releasable verdict:

    - k rung: k_min = the smallest (type, hour, value-band) equivalence
      class inside the group — the group passes iff NONE of its
      sub-classes violates rel_k_anonymity's K (a group is only as
      anonymous as its most identifiable band);
    - l rung: distinct sensitive bands >= L (rel_l_diversity);
    - t rung: exact-integer-EMD t-closeness <= T (rel_t_closeness);
    - releasable = k_ok AND l_ok AND t_ok.

    Exactness: everything up to the single final division is BIGINT
    (epoch-nano hour, floor band, counts, the N*cumc - n*cumC EMD
    numerator), so both engines emit identical doubles and identical
    verdict bits. Scale: ONE map-side-combining aggregate over events
    builds gb=(type, hour, band, c); every other table (global band
    CDF, per-group rollup, EMD cells) derives from gb and is bounded by
    the QI domain x band alphabet, never event-sized; the global band
    table broadcasts."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        (F.expr("(ts div 1000000000) div 3600") % 24).alias("hour"),
        F.floor(F.col("value") / F.lit(25.0)).cast("bigint").alias("band"),
    )
    gb = base.groupBy("event_type", "hour", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    glob = gb.groupBy("band").agg(F.sum("c").cast("bigint").alias("cg"))
    wg = W.orderBy("band").rowsBetween(W.unboundedPreceding, 0)
    glob_cum = glob.select(
        "band",
        F.sum("cg").over(wg).cast("bigint").alias("cum_cg"),
    ).crossJoin(
        glob.agg(
            F.sum("cg").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).cast("bigint").alias("m_bands"),
        )
    )
    groups = gb.groupBy("event_type", "hour").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.min("c").cast("bigint").alias("k_min"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
    )
    cells = (
        groups.crossJoin(F.broadcast(glob_cum))
        .join(gb, ["event_type", "hour", "band"], "left")
        .select(
            "event_type",
            "hour",
            "band",
            "n",
            "k_min",
            "l_distinct",
            "cum_cg",
            "n_total",
            "m_bands",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
    )
    wloc = (
        W.partitionBy("event_type", "hour")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    diff = (
        F.col("n_total") * F.sum("c").over(wloc) - F.col("n") * F.col("cum_cg")
    ).cast("bigint")
    per = (
        cells.select(
            "event_type", "hour", "n", "k_min", "l_distinct",
            "n_total", "m_bands", F.abs(diff).alias("ad"),
        )
        .groupBy(
            "event_type", "hour", "n", "k_min", "l_distinct",
            "n_total", "m_bands",
        )
        .agg(F.sum("ad").cast("bigint").alias("num"))
    )
    t = F.when(F.col("m_bands") <= 1, F.lit(0.0)).otherwise(
        F.col("num").cast("double")
        / (F.col("n") * F.col("n_total") * (F.col("m_bands") - 1)).cast("double")
    )
    k_ok = (F.col("k_min") >= F.lit(K_ANON_THRESHOLD)).cast("int")
    l_ok = (F.col("l_distinct") >= F.lit(L_DIVERSITY)).cast("int")
    t_ok = (t <= F.lit(T_CLOSE_THRESHOLD)).cast("int")
    return per.select(
        "event_type",
        "hour",
        "n",
        "k_min",
        "l_distinct",
        F.round(t, 6).alias("t_closeness"),
        k_ok.alias("k_ok"),
        l_ok.alias("l_ok"),
        t_ok.alias("t_ok"),
        (k_ok * l_ok * t_ok).cast("int").alias("releasable"),
    )


PRIVACY_GATE_SQL = f"""
WITH base AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000000000 // 3600) % 24 AS hour,
         CAST(floor(value / 25.0) AS BIGINT) AS band
  FROM events),
gb AS (
  SELECT event_type, hour, band, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3),
gall AS (
  SELECT band, CAST(sum(c) AS BIGINT) AS cg FROM gb GROUP BY 1),
gall_cum AS (
  SELECT band, CAST(sum(cg) OVER (ORDER BY band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cg,
         (SELECT CAST(sum(cg) AS BIGINT) FROM gall) AS n_total,
         (SELECT CAST(count(*) AS BIGINT) FROM gall) AS m_bands
  FROM gall),
groups AS (
  SELECT event_type, hour, CAST(sum(c) AS BIGINT) AS n,
         CAST(min(c) AS BIGINT) AS k_min,
         CAST(count(*) AS BIGINT) AS l_distinct
  FROM gb GROUP BY 1, 2),
cells AS (
  SELECT g.event_type, g.hour, gc.band, g.n, g.k_min, g.l_distinct,
         gc.cum_cg, gc.n_total, gc.m_bands,
         CAST(coalesce(b.c, 0) AS BIGINT) AS c
  FROM groups g CROSS JOIN gall_cum gc
  LEFT JOIN gb b ON b.event_type = g.event_type AND b.hour = g.hour
                AND b.band = gc.band),
per AS (
  SELECT event_type, hour, n, k_min, l_distinct, n_total, m_bands,
         CAST(sum(abs(n_total * cumc - n * cum_cg)) AS BIGINT) AS num
  FROM (
    SELECT event_type, hour, band, n, k_min, l_distinct, cum_cg, n_total,
           m_bands,
           CAST(sum(c) OVER (PARTITION BY event_type, hour ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumc
    FROM cells) x
  GROUP BY 1, 2, 3, 4, 5, 6, 7),
per2 AS (
  SELECT event_type, hour, n, k_min, l_distinct,
         CASE WHEN m_bands <= 1 THEN CAST(0 AS DOUBLE)
              ELSE CAST(num AS DOUBLE)
                   / CAST(n * n_total * (m_bands - 1) AS DOUBLE) END AS t
  FROM per)
SELECT event_type, hour, n, k_min, l_distinct,
       round(t, 6) AS t_closeness,
       CAST(CASE WHEN k_min >= {K_ANON_THRESHOLD} THEN 1 ELSE 0 END
            AS INTEGER) AS k_ok,
       CAST(CASE WHEN l_distinct >= {L_DIVERSITY} THEN 1 ELSE 0 END
            AS INTEGER) AS l_ok,
       CAST(CASE WHEN t <= {T_CLOSE_THRESHOLD} THEN 1 ELSE 0 END
            AS INTEGER) AS t_ok,
       CAST(CASE WHEN k_min >= {K_ANON_THRESHOLD}
                  AND l_distinct >= {L_DIVERSITY}
                  AND t <= {T_CLOSE_THRESHOLD} THEN 1 ELSE 0 END
            AS INTEGER) AS releasable
FROM per2
"""


# --- Holt linear forecasting (round 12) ---------------------------------------

HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
HOLT_H = 7  # forecast horizon (days)


def holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) forecasting over the daily
    order-revenue series — the FORECASTING rung of the time-series
    family (seasonal_decompose explains the past; this extrapolates):
    one pass of the standard recursion L_t = a*y_t + (1-a)(L+B),
    B_t = b*(L_t - L) + (1-b)B, initialized at the first observation
    with zero trend (stated choice), then y-hat(T+h) = L + h*B for
    h = 1..HOLT_H.

    Determinism: the daily series is the exact BIGINT cent aggregate
    (daily_revenue_cents); the recursion is a dn-sorted sequential fold
    where both engines evaluate the SAME double expressions in the same
    order (list_reduce's first-element-as-init semantics emulated in
    Spark via element_at + slice); outputs round to 6dp at the boundary.
    Scale: the fold runs over the CALENDAR-bounded daily frame (~2.4k
    rows for a 7-year lake at any corpus scale) — one map-side-combining
    pass over orders is the only data-sized work."""
    daily = daily_revenue_cents(spark, sf_dir)
    arr = F.sort_array(F.collect_list(F.struct("dn", "cents")))
    ys = F.transform(
        arr,
        lambda e: F.struct(
            e["cents"].cast("double").alias("level"),
            F.lit(0.0).alias("trend"),
        ),
    )

    def combine(acc: Column, x: Column) -> Column:
        lp = F.lit(HOLT_ALPHA) * x["level"] + F.lit(1.0 - HOLT_ALPHA) * (
            acc["level"] + acc["trend"]
        )
        return F.struct(
            lp.alias("level"),
            (
                F.lit(HOLT_BETA) * (lp - acc["level"])
                + F.lit(1.0 - HOLT_BETA) * acc["trend"]
            ).alias("trend"),
        )

    fitted = F.aggregate(
        F.slice(ys, 2, F.size(ys) - 1), F.element_at(ys, 1), combine
    )
    agg = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        fitted.alias("st"),
    )
    h = F.explode(F.sequence(F.lit(1), F.lit(HOLT_H))).alias("h")
    base = agg.select(
        "n_days",
        F.col("st.level").alias("lv"),
        F.col("st.trend").alias("tr"),
        h,
    )
    return base.select(
        "n_days",
        F.round("lv", 6).alias("level"),
        F.round("tr", 6).alias("trend"),
        F.col("h").cast("int").alias("h"),
        F.round(F.col("lv") + F.col("h").cast("double") * F.col("tr"), 6).alias(
            "forecast"
        ),
    )


def _holt_sql() -> str:
    # DuckDB 1.0.0's list_reduce mis-evaluates MULTI-FIELD STRUCT
    # accumulators (fields desynchronize across steps — verified with a
    # history-logging trace), so the oracle carries the (level, trend)
    # state as a 2-ELEMENT LIST, which folds correctly. Spark's
    # F.aggregate struct accumulator is unaffected.
    a, b = dlit(HOLT_ALPHA), dlit(HOLT_BETA)
    oma, omb = dlit(1.0 - HOLT_ALPHA), dlit(1.0 - HOLT_BETA)
    lp = f"({a} * x[1] + {oma} * (acc[1] + acc[2]))"
    return f"""
WITH {_DAILY_SQL},
ser AS (
  SELECT list_transform(list(struct_pack(dn := dn, cents := cents)
                             ORDER BY dn),
                        e -> [CAST(e.cents AS DOUBLE), CAST(0 AS DOUBLE)])
           AS ys,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily),
fit AS (
  SELECT n_days,
         list_reduce(ys, (acc, x) -> [
             {lp},
             {b} * ({lp} - acc[1]) + {omb} * acc[2]]) AS st
  FROM ser)
SELECT n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       CAST(h AS INTEGER) AS h,
       round(st[1] + CAST(h AS DOUBLE) * st[2], 6) AS forecast
FROM fit, LATERAL (SELECT unnest(generate_series(1, {HOLT_H})) AS h) g
"""




HW_ALPHA = 0.5  # Holt-Winters level smoothing
HW_BETA = 0.3  # trend smoothing
HW_GAMMA = 0.4  # seasonal smoothing
HW_PERIOD = 7  # weekly seasonality over the daily series


def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE forecasting over the daily revenue series —
    the seasonal extension of rel_holt_forecast: the standard triple
    recursion L_t = a(y_t - S_slot) + (1-a)(L+B), B_t = b(L_t - L) +
    (1-b)B, S_slot_t = g(y_t - L_t) + (1-g)S_slot with weekly slots
    (slot = dn % 7 — the day number IS the seasonal index, so calendar
    gaps stay honest), initialized L = y_1, B = 0, S = zeros (stated
    simple choice), forecasting y-hat(T+h) = L + hB + S_((dn_T + h) % 7)
    for h = 1..7.

    Determinism: the dn-sorted fold carries (level, trend, seasonal[7])
    — a struct in Spark, a 9-element LIST in the DuckDB oracle (DuckDB
    1.0.0's list_reduce mis-evaluates multi-field STRUCT accumulators;
    see rel_holt_forecast) — with the init state PREPENDED so there is
    no in-fold special case; every float op appears identically in both
    engines and outputs round to 6dp at the boundary. Scale: identical
    to rel_holt_forecast — the fold runs over the calendar-bounded daily
    frame."""
    daily = daily_revenue_cents(spark, sf_dir)
    ag = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sort_array(F.collect_list(F.struct("dn", "cents"))).alias("arr"),
    )
    # elements and state are plain DOUBLE ARRAYS ([y, slot] and
    # [L, B, s0..s6]) rather than structs: Spark drops struct field
    # aliases inside nested higher-order lambdas here, and the array
    # form also mirrors the DuckDB oracle exactly
    elems = F.transform(
        F.col("arr"),
        lambda e: F.array(
            e["cents"].cast("double"),
            (e["dn"] % HW_PERIOD).cast("double"),
        ),
    )
    init = F.concat(
        F.array(F.element_at(F.element_at(elems, 1), 1), F.lit(0.0)),
        F.array_repeat(F.lit(0.0), HW_PERIOD),
    )

    def combine(acc: Column, x: Column) -> Column:
        y = F.element_at(x, 1)
        slot = F.element_at(x, 2)
        s_slot = F.element_at(acc, (F.lit(3) + slot.cast("int")).cast("int"))
        lp = F.lit(HW_ALPHA) * (y - s_slot) + F.lit(1.0 - HW_ALPHA) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        bp = (
            F.lit(HW_BETA) * (lp - F.element_at(acc, 1))
            + F.lit(1.0 - HW_BETA) * F.element_at(acc, 2)
        )
        seas = F.transform(
            F.sequence(F.lit(0), F.lit(HW_PERIOD - 1)),
            lambda i: F.when(
                i.cast("double") == slot,
                F.lit(HW_GAMMA) * (y - lp) + F.lit(1.0 - HW_GAMMA) * s_slot,
            ).otherwise(F.element_at(acc, (F.lit(3) + i).cast("int"))),
        )
        return F.concat(F.array(lp, bp), seas)

    st = F.aggregate(F.slice(elems, 2, F.size(elems) - 1), init, combine)
    base = ag.select(
        "n_days",
        F.element_at(F.col("arr"), F.size("arr"))["dn"].alias("last_dn"),
        st.alias("st"),
        F.explode(F.sequence(F.lit(1), F.lit(HOLT_H))).alias("h"),
    )
    slot_h = ((F.col("last_dn") + F.col("h")) % HW_PERIOD).cast("int")
    return base.select(
        "n_days",
        F.round(F.element_at(F.col("st"), 1), 6).alias("level"),
        F.round(F.element_at(F.col("st"), 2), 6).alias("trend"),
        F.col("h").cast("int").alias("h"),
        F.round(
            F.element_at(F.col("st"), 1)
            + F.col("h").cast("double") * F.element_at(F.col("st"), 2)
            + F.element_at(F.col("st"), (F.lit(3) + slot_h).cast("int")),
            6,
        ).alias("forecast"),
    )


def _holt_winters_sql() -> str:
    a, b, g = dlit(HW_ALPHA), dlit(HW_BETA), dlit(HW_GAMMA)
    oma, omb, omg = (
        dlit(1.0 - HW_ALPHA),
        dlit(1.0 - HW_BETA),
        dlit(1.0 - HW_GAMMA),
    )
    sl = "acc[3 + CAST(x[2] AS INTEGER)]"
    lp = f"({a} * (x[1] - {sl}) + {oma} * (acc[1] + acc[2]))"
    zeros = ", ".join(["CAST(0 AS DOUBLE)"] * HW_PERIOD)
    return f"""
WITH {_DAILY_SQL},
ser AS (
  SELECT list(struct_pack(dn := dn, cents := cents) ORDER BY dn) AS arr,
         CAST(count(*) AS BIGINT) AS n_days
  FROM daily),
prep AS (
  SELECT n_days, arr[len(arr)].dn AS last_dn,
         list_transform(arr, e -> [CAST(e.cents AS DOUBLE),
                                   CAST(e.dn % {HW_PERIOD} AS DOUBLE)]) AS ys
  FROM ser),
fit AS (
  SELECT n_days, last_dn,
         list_reduce(
           list_prepend([ys[1][1], CAST(0 AS DOUBLE), {zeros}], ys[2:]),
           (acc, x) -> [
             {lp},
             {b} * ({lp} - acc[1]) + {omb} * acc[2]]
             || list_transform(range({HW_PERIOD}), i ->
                  CASE WHEN CAST(i AS DOUBLE) = x[2]
                       THEN {g} * (x[1] - {lp}) + {omg} * {sl}
                       ELSE acc[3 + CAST(i AS INTEGER)] END)) AS st
  FROM prep)
SELECT n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       CAST(h AS INTEGER) AS h,
       round(st[1] + CAST(h AS DOUBLE) * st[2]
             + st[3 + CAST((last_dn + h) % {HW_PERIOD} AS INTEGER)], 6)
         AS forecast
FROM fit, LATERAL (SELECT unnest(generate_series(1, {HOLT_H})) AS h) g2
"""


# --- ROC / AUC / lift-gain classifier evaluation (round 13) -----------------

ROC_POS_PRI = ("1-URGENT", "2-HIGH")  # positive class: expedited orders
LIFT_DECILES = 10


def _roc_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-score spine shared by the ROC family (auc_roc,
    lift_gain): per distinct price point (exact cents) the positive /
    negative class counts plus ascending cumulative totals.

    Scale: ONE map-side-combining groupBy over orders collapses the fact
    table to the distinct-value spine, then ONE ordered window runs over
    that spine (orders of magnitude smaller than the fact table) — the
    ks_two_sample discipline. Counts are DECIMAL(38,0) from the start
    because the downstream PAIR totals (n_pos x n_neg, rank sums) exceed
    BIGINT at web scale (1.5e11 rows squared ~ 2e22)."""
    o = load(spark, sf_dir, "orders")
    pts = (
        o.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.col("o_orderpriority").isin(*ROC_POS_PRI).alias("is_pos"),
        )
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("cp"),
            F.sum(F.when(~F.col("is_pos"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("cn"),
        )
    )
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    return pts.select(
        "cents",
        "cp",
        "cn",
        F.sum("cp").over(w).cast("decimal(38,0)").alias("cum_p"),
        F.sum("cn").over(w).cast("decimal(38,0)").alias("cum_n"),
    )


def auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC analysis of the score->label ranking "order price
    predicts expedited priority" (positive class ROC_POS_PRI): AUC via
    the tie-corrected Mann-Whitney identity — 2U = sum over distinct
    scores s of cp_s * (2 * negs_strictly_below(s) + cn_s), so AUC =
    2U / (2 * n_pos * n_neg) counts ties as half-wins without ever
    ranking individual rows — plus the Gini coefficient (2*AUC - 1) and
    the ROC's Youden/KS point: max_s |TPR(s) - FPR(s)| located by
    INTEGER argmax of |cum_p * n_neg - cum_n * n_pos| (ties break to the
    smallest score), the same supremum discipline as ks_two_sample.

    Exactness: all pair totals are DECIMAL(38,0) (2U ~ n_pos * n_neg
    overflows BIGINT at web scale); floats appear only in the final
    1-row AUC/gini/KS expression.

    Scale: the fact table collapses to the distinct-value spine in one
    map-side-combining pass; the only ordered window runs over the
    spine; group totals ride a 1-row broadcast."""
    cum = _roc_spine(spark, sf_dir)
    tot = cum.agg(
        F.max("cum_p").alias("n_pos_d"), F.max("cum_n").alias("n_neg_d")
    )
    per = cum.crossJoin(F.broadcast(tot)).select(
        "n_pos_d",
        "n_neg_d",
        "cents",
        (
            F.col("cp")
            * (F.lit(2) * (F.col("cum_n") - F.col("cn")) + F.col("cn"))
        ).alias("u2c"),
        F.abs(
            F.col("cum_p") * F.col("n_neg_d") - F.col("cum_n") * F.col("n_pos_d")
        ).alias("gap"),
    )
    agg = per.groupBy("n_pos_d", "n_neg_d").agg(
        F.sum("u2c").cast("decimal(38,0)").alias("u2"),
        F.max(
            F.struct(F.col("gap").alias("gap"), (-F.col("cents")).alias("nc"))
        ).alias("bst"),
    )
    den = F.col("n_pos_d").cast("double") * F.col("n_neg_d").cast("double")
    auc = F.col("u2").cast("double") / (F.lit(2.0) * den)
    ks = F.col("bst.gap").cast("double") / den
    return agg.select(
        F.col("n_pos_d").cast("bigint").alias("n_pos"),
        F.col("n_neg_d").cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
        F.round(ks, 6).alias("roc_ks"),
        (-F.col("bst.nc")).cast("bigint").alias("ks_at_cents"),
    )


_ROC_SPINE_SQL = f"""
pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(sum(CASE WHEN o_orderpriority IN {ROC_POS_PRI!r}
                       THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS cp,
         CAST(sum(CASE WHEN o_orderpriority IN {ROC_POS_PRI!r}
                       THEN 0 ELSE 1 END) AS DECIMAL(38,0)) AS cn
  FROM orders GROUP BY 1),
cum AS (
  SELECT cents, cp, cn,
         CAST(sum(cp) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_p,
         CAST(sum(cn) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_n
  FROM pts)"""

AUC_ROC_SQL = f"""
WITH {_ROC_SPINE_SQL},
tot AS (SELECT max(cum_p) AS n_pos_d, max(cum_n) AS n_neg_d FROM cum),
agg AS (
  SELECT n_pos_d, n_neg_d,
         CAST(sum(cp * (2 * (cum_n - cn) + cn)) AS DECIMAL(38,0)) AS u2,
         max(struct_pack(gap := abs(cum_p * n_neg_d - cum_n * n_pos_d),
                         nc := -cents)) AS bst
  FROM cum, tot GROUP BY n_pos_d, n_neg_d)
SELECT CAST(n_pos_d AS BIGINT) AS n_pos,
       CAST(n_neg_d AS BIGINT) AS n_neg,
       round(CAST(u2 AS DOUBLE)
             / (2.0 * (CAST(n_pos_d AS DOUBLE) * CAST(n_neg_d AS DOUBLE))),
             6) AS auc,
       round(2.0 * (CAST(u2 AS DOUBLE)
                    / (2.0 * (CAST(n_pos_d AS DOUBLE)
                              * CAST(n_neg_d AS DOUBLE)))) - 1.0,
             6) AS gini,
       round(CAST(bst.gap AS DOUBLE)
             / (CAST(n_pos_d AS DOUBLE) * CAST(n_neg_d AS DOUBLE)), 6)
         AS roc_ks,
       CAST(-bst.nc AS BIGINT) AS ks_at_cents
FROM agg
"""


def lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gain table for the same score->label
    ranking as auc_roc: rows are binned into LIFT_DECILES score deciles
    (descending score), each decile reporting its response rate, lift
    over the base rate, and cumulative gain (share of all positives
    captured through this decile) — the campaign-targeting companion to
    the threshold-free AUC.

    Determinism: a distinct-score TIE GROUP never splits across deciles —
    its decile is floor(LIFT_DECILES * rows_strictly_above / N) computed
    in exact BIGINT arithmetic, so the binning is identical on any
    engine and any row order (a huge tie bucket may legitimately swallow
    whole deciles; the output then has fewer than LIFT_DECILES rows).
    Rates and lifts are fixed double DAGs over exact counts.

    Scale: same collapsed spine as auc_roc; the decile groupBy runs on
    the spine, never the fact table."""
    cum = _roc_spine(spark, sf_dir)
    tot = cum.agg(
        F.max("cum_p").cast("bigint").alias("np_tot"),
        F.max("cum_n").cast("bigint").alias("nn_tot"),
    )
    g = cum.crossJoin(F.broadcast(tot)).select(
        (F.col("cp") + F.col("cn")).cast("bigint").alias("rows_s"),
        F.col("cp").cast("bigint").alias("pos_s"),
        (F.col("np_tot") + F.col("nn_tot")).alias("n_tot"),
        F.col("np_tot"),
        (
            F.col("np_tot")
            + F.col("nn_tot")
            - (F.col("cum_p") + F.col("cum_n")).cast("bigint")
        ).alias("above"),
    )
    dec = g.select(
        "rows_s",
        "pos_s",
        "n_tot",
        "np_tot",
        F.least(
            F.lit(LIFT_DECILES - 1),
            F.expr(f"({LIFT_DECILES} * above) div n_tot"),
        )
        .cast("int")
        .alias("decile"),
    )
    byd = dec.groupBy("decile", "n_tot", "np_tot").agg(
        F.sum("rows_s").cast("bigint").alias("n_rows"),
        F.sum("pos_s").cast("bigint").alias("n_pos"),
    )
    wd = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rate = d("n_pos") / d("n_rows")
    base = d("np_tot") / d("n_tot")
    return (
        byd.select(
            "decile",
            "n_rows",
            "n_pos",
            "np_tot",
            F.sum("n_pos").over(wd).cast("bigint").alias("cum_pos"),
            F.round(rate, 6).alias("resp_rate"),
            F.round(rate / base, 6).alias("lift"),
        )
        .withColumn(
            "cum_gain",
            F.round(F.col("cum_pos").cast("double") / d("np_tot"), 6),
        )
        .select(
            "decile", "n_rows", "n_pos", "resp_rate", "lift", "cum_gain"
        )
        .orderBy("decile")
    )


LIFT_GAIN_SQL = f"""
WITH {_ROC_SPINE_SQL},
tot AS (SELECT CAST(max(cum_p) AS BIGINT) AS np_tot,
               CAST(max(cum_n) AS BIGINT) AS nn_tot FROM cum),
dec AS (
  SELECT CAST(cp + cn AS BIGINT) AS rows_s,
         CAST(cp AS BIGINT) AS pos_s,
         np_tot + nn_tot AS n_tot,
         np_tot,
         least({LIFT_DECILES - 1},
               CAST(({LIFT_DECILES}
                     * (np_tot + nn_tot - CAST(cum_p + cum_n AS BIGINT)))
                    // (np_tot + nn_tot) AS BIGINT)) AS decile
  FROM cum, tot),
byd AS (
  SELECT CAST(decile AS INTEGER) AS decile, n_tot, np_tot,
         CAST(sum(rows_s) AS BIGINT) AS n_rows,
         CAST(sum(pos_s) AS BIGINT) AS n_pos
  FROM dec GROUP BY 1, 2, 3)
SELECT decile, n_rows, n_pos,
       round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS resp_rate,
       round((CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
             / (CAST(np_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6) AS lift,
       round(CAST(CAST(sum(n_pos) OVER (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS DOUBLE)
             / CAST(np_tot AS DOUBLE), 6) AS cum_gain
FROM byd ORDER BY decile
"""


# --- Kruskal-Wallis rank ANOVA (round 13) -----------------------------------

KW_GROUPS = 7  # day-of-week groups over the daily revenue series


def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis 1952) — does daily
    revenue differ across the seven weekdays? The k-group extension of
    rel_mann_whitney: tie-corrected average ranks in exact half-units
    (2*avg = 2*rank() + count_equal - 1), per-group rank sums as exact
    BIGINTs, H = 3 * sum_i(R2_i^2 / n_i) / (N(N+1)) - 3(N+1) in
    half-rank units, tie correction C = 1 - sum(t^3 - t)/(N^3 - N),
    H_corr = H / C on chi-square df = KW_GROUPS - 1.

    Determinism: the only cross-group float reduction, sum_i R2_i^2/n_i,
    is PIVOTED into a fixed left-associated 7-term expression (one
    conditional aggregate per weekday) so the double addition order is
    identical on every engine and at any parallelism — R2_i^2 <= 2^53
    stays exactly representable.

    Scale: runs on the calendar-bounded daily series (~2.4k rows at any
    corpus scale); the heavy pass is the shared one-scan daily
    aggregate."""
    daily = daily_revenue_cents(spark, sf_dir).select(
        "cents", F.pmod(F.col("dn"), F.lit(KW_GROUPS)).cast("int").alias("dow")
    )
    ranked = daily.select(
        "dow",
        (
            F.lit(2) * F.rank().over(W.orderBy("cents"))
            + F.count(F.lit(1)).over(W.partitionBy("cents"))
            - F.lit(1)
        ).cast("bigint").alias("rank2"),
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie3")
        )
    )
    grp = ranked.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("rank2").cast("bigint").alias("r2"),
    )
    term = lambda i: F.coalesce(  # noqa: E731
        F.max(
            F.when(
                F.col("dow") == i,
                (F.col("r2") * F.col("r2")).cast("double")
                / F.col("n_days").cast("double"),
            )
        ),
        F.lit(0.0),
    )
    rq = term(0)
    for i in range(1, KW_GROUPS):
        rq = rq + term(i)
    stats = grp.agg(
        F.sum("n_days").cast("bigint").alias("n"), rq.alias("rq")
    ).crossJoin(F.broadcast(ties))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    h = F.lit(3.0) * F.col("rq") / (d("n") * (d("n") + F.lit(1.0))) - F.lit(
        3.0
    ) * (d("n") + F.lit(1.0))
    c = F.lit(1.0) - d("tie3") / (d("n") * d("n") * d("n") - d("n"))
    hs = stats.select(
        "n",
        F.round(h, 6).alias("h"),
        F.round(h / c, 6).alias("h_corr"),
        F.lit(KW_GROUPS - 1).cast("int").alias("df"),
    )
    return (
        grp.crossJoin(F.broadcast(hs))
        .select(
            "dow",
            "n_days",
            F.round(
                F.col("r2").cast("double")
                / (F.lit(2.0) * F.col("n_days").cast("double")),
                6,
            ).alias("avg_rank"),
            "h",
            "h_corr",
            "df",
        )
        .orderBy("dow")
    )


def _kw_sql() -> str:
    terms = " + ".join(
        f"coalesce(max(CASE WHEN dow = {i} THEN "
        f"CAST(r2 * r2 AS DOUBLE) / CAST(n_days AS DOUBLE) END), 0.0)"
        for i in range(KW_GROUPS)
    )
    return f"""
WITH {_DAILY_SQL},
dowd AS (SELECT cents, CAST(dn % {KW_GROUPS} AS INTEGER) AS dow FROM daily),
ranked AS (
  SELECT dow,
         CAST(2 * rank() OVER (ORDER BY cents)
              + count(*) OVER (PARTITION BY cents) - 1 AS BIGINT) AS rank2
  FROM dowd),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM dowd GROUP BY cents)),
grp AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(rank2) AS BIGINT) AS r2
  FROM ranked GROUP BY dow),
stats AS (
  SELECT CAST(sum(n_days) AS BIGINT) AS n, {terms} AS rq FROM grp),
hs AS (
  SELECT n,
         round(3.0 * rq / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
         round((3.0 * rq / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                - 3.0 * (CAST(n AS DOUBLE) + 1.0))
               / (1.0 - CAST(tie3 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
           AS h_corr,
         CAST({KW_GROUPS - 1} AS INTEGER) AS df
  FROM stats, ties)
SELECT dow, n_days,
       round(CAST(r2 AS DOUBLE) / (2.0 * CAST(n_days AS DOUBLE)), 6)
         AS avg_rank,
       h, h_corr, df
FROM grp, hs ORDER BY dow
"""


# --- CUSUM drift detection (round 13) ---------------------------------------

CUSUM_SLACK_PCT = 5  # one-sided slack: 5% of the global daily mean
CUSUM_ALARM_DAYS = 3  # alarm when cumulative excess is worth 3 mean days


def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector (Page 1954) over the daily revenue
    series: has revenue run persistently above (or below) its global
    mean by more than the slack band? Uses the prefix-min closed form —
    s+_t = P_t − min(0, min_{j<=t} P_j) with P = cumsum(x − (1+k)·mean) —
    so the recursive max(0, s+x) fold becomes TWO plain windows (cumsum
    + running min), no stateful UDF, in both engines.

    Exactness: everything is scaled through by 100·n (n days, S total
    cents): dev+_t = 100·n·x_t − (100+SLACK)·S is an exact DECIMAL(38,0)
    integer (BIGINT overflows: the prefix of 100·n·x reaches ~1e19 at
    web scale), the running min/argmax are integer-exact, and the alarm
    threshold is 100·ALARM_DAYS·S in the SAME units. Floats appear only
    in the final 1-row report (peak cusum re-expressed in mean-days).

    Output: ONE summary row — peak positive/negative cusum (in units of
    the mean daily revenue), the day each peak occurs (smallest-day
    tie-break via integer argmax), alarm-day counts, and the first alarm
    day per side (NULL when that side never alarms).

    Scale: the series is calendar-bounded (~2.4k rows at any corpus
    scale); the heavy pass is the shared one-scan daily aggregate."""
    daily = daily_revenue_cents(spark, sf_dir).select(
        "dn", F.col("cents").cast("decimal(38,0)").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    g = daily.crossJoin(F.broadcast(tot))
    up = F.lit(100 + CUSUM_SLACK_PCT)
    dn_ = F.lit(100 - CUSUM_SLACK_PCT)
    base = g.select(
        "dn",
        "n",
        "s",
        (F.lit(100) * F.col("n") * F.col("x") - up * F.col("s")).alias("dp"),
        (dn_ * F.col("s") - F.lit(100) * F.col("n") * F.col("x")).alias("dm"),
    )
    w = W.orderBy("dn").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = base.select(
        "dn",
        "n",
        "s",
        F.sum("dp").over(w).alias("pp"),
        F.sum("dm").over(w).alias("pm"),
    ).select(
        "dn",
        "n",
        "s",
        (F.col("pp") - F.least(F.lit(0), F.min("pp").over(w))).alias("sp"),
        (F.col("pm") - F.least(F.lit(0), F.min("pm").over(w))).alias("sm"),
    )
    thr = F.lit(100 * CUSUM_ALARM_DAYS) * F.col("s")
    rep = pre.groupBy("n", "s").agg(
        F.max(F.struct(F.col("sp").alias("v"), (-F.col("dn")).alias("nd"))).alias(
            "bp"
        ),
        F.max(F.struct(F.col("sm").alias("v"), (-F.col("dn")).alias("nd"))).alias(
            "bm"
        ),
        F.sum(F.when(F.col("sp") > thr, 1).otherwise(0))
        .cast("bigint")
        .alias("alarms_pos"),
        F.sum(F.when(F.col("sm") > thr, 1).otherwise(0))
        .cast("bigint")
        .alias("alarms_neg"),
        F.min(F.when(F.col("sp") > thr, F.col("dn"))).alias("first_alarm_pos"),
        F.min(F.when(F.col("sm") > thr, F.col("dn"))).alias("first_alarm_neg"),
    )
    days = lambda v: F.round(  # noqa: E731  (peak cusum in mean-days)
        v.cast("double") / (F.lit(100.0) * F.col("s").cast("double")), 6
    )
    return rep.select(
        F.col("n").cast("bigint").alias("n_days"),
        days(F.col("bp.v")).alias("peak_pos_days"),
        (-F.col("bp.nd")).cast("bigint").alias("peak_pos_dn"),
        days(F.col("bm.v")).alias("peak_neg_days"),
        (-F.col("bm.nd")).cast("bigint").alias("peak_neg_dn"),
        "alarms_pos",
        "alarms_neg",
        F.col("first_alarm_pos").cast("bigint").alias("first_alarm_pos"),
        F.col("first_alarm_neg").cast("bigint").alias("first_alarm_neg"),
    )


CUSUM_SQL = f"""
WITH {_DAILY_SQL},
dd AS (SELECT dn, CAST(cents AS DECIMAL(38,0)) AS x FROM daily),
tot AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               CAST(sum(x) AS DECIMAL(38,0)) AS s FROM dd),
base AS (
  SELECT dn, n, s,
         100 * n * x - {100 + CUSUM_SLACK_PCT} * s AS dp,
         {100 - CUSUM_SLACK_PCT} * s - 100 * n * x AS dm
  FROM dd, tot),
pre AS (
  SELECT dn, n, s,
         sum(dp) OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS pp,
         sum(dm) OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS pm
  FROM base),
cus AS (
  SELECT dn, n, s,
         pp - least(CAST(0 AS DECIMAL(38,0)),
                    min(pp) OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW)) AS sp,
         pm - least(CAST(0 AS DECIMAL(38,0)),
                    min(pm) OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW)) AS sm
  FROM pre),
rep AS (
  SELECT n, s,
         max(struct_pack(v := sp, nd := -dn)) AS bp,
         max(struct_pack(v := sm, nd := -dn)) AS bm,
         CAST(sum(CASE WHEN sp > {100 * CUSUM_ALARM_DAYS} * s
                       THEN 1 ELSE 0 END) AS BIGINT) AS alarms_pos,
         CAST(sum(CASE WHEN sm > {100 * CUSUM_ALARM_DAYS} * s
                       THEN 1 ELSE 0 END) AS BIGINT) AS alarms_neg,
         min(CASE WHEN sp > {100 * CUSUM_ALARM_DAYS} * s THEN dn END)
           AS first_alarm_pos,
         min(CASE WHEN sm > {100 * CUSUM_ALARM_DAYS} * s THEN dn END)
           AS first_alarm_neg
  FROM cus GROUP BY n, s)
SELECT CAST(n AS BIGINT) AS n_days,
       round(CAST(bp.v AS DOUBLE) / (100.0 * CAST(s AS DOUBLE)), 6)
         AS peak_pos_days,
       CAST(-bp.nd AS BIGINT) AS peak_pos_dn,
       round(CAST(bm.v AS DOUBLE) / (100.0 * CAST(s AS DOUBLE)), 6)
         AS peak_neg_days,
       CAST(-bm.nd AS BIGINT) AS peak_neg_dn,
       alarms_pos, alarms_neg,
       CAST(first_alarm_pos AS BIGINT) AS first_alarm_pos,
       CAST(first_alarm_neg AS BIGINT) AS first_alarm_neg
FROM rep
"""


# --- One-pass k-fold cross-validated ridge (round 13) -----------------------

CV_FOLDS = 5  # deterministic fold = l_orderkey % CV_FOLDS


def _cv_fold_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(fold, λ) raw held-out error frame — the shared core of
    cv_ridge and cv_lambda_select.

    K-fold cross-validation of the ridge sweep (rel_ridge_regression's
    model price_cents ~ quantity + discount_pct) in ONE scan of the fact
    table: per-fold normal-equation moments are the sufficient statistic
    for BOTH sides of every split — train moments by SUBTRACTION
    (complement = total − fold) and test error by the QUADRATIC FORM
    (sse = syy − 2βᵀXᵀy + βᵀXᵀXβ on the held-out fold's own moments) —
    so k-fold CV costs exactly one map-side-combining aggregate, not k
    passes. Folds are deterministic (l_orderkey % CV_FOLDS), the same
    hash-split discipline as llm_train_val_split.

    Exactness: the ten moments accumulate as DECIMAL(38,0) per fold
    (the _ols_moments discipline); fold totals come from a window over
    the K-row moment frame; the 3×3 Cramer solve and RMSE/R² are a fixed
    double DAG on exact moments — bitwise on any engine.

    Scale: the moment aggregate is the only pass over lineitem; all CV
    arithmetic happens on a K-row frame (broadcast-sized at any corpus
    scale, any K)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.pmod(F.col("l_orderkey"), F.lit(CV_FOLDS)).cast("int").alias("fold"),
        F.col("l_quantity").cast("decimal(38,0)").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("decimal(38,0)").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)").alias("y"),
    )
    names = [
        ("n", F.lit(1).cast("decimal(38,0)")),
        ("sx1", F.col("x1")),
        ("sx2", F.col("x2")),
        ("sx11", F.col("x1") * F.col("x1")),
        ("sx22", F.col("x2") * F.col("x2")),
        ("sx12", F.col("x1") * F.col("x2")),
        ("sy", F.col("y")),
        ("sx1y", F.col("x1") * F.col("y")),
        ("sx2y", F.col("x2") * F.col("y")),
        ("syy", F.col("y") * F.col("y")),
    ]
    m = li.groupBy("fold").agg(
        *[F.sum(e).cast("decimal(38,0)").alias(k) for k, e in names]
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    tr = m.select(
        "fold",
        *[F.col(k).alias(f"f_{k}") for k, _ in names],
        *[
            (F.sum(k).over(wall) - F.col(k)).cast("decimal(38,0)").alias(f"t_{k}")
            for k, _ in names
        ],
    )
    lam = spark.createDataFrame([(l,) for l in RIDGE_LAMBDAS], "lam bigint")
    ml = tr.crossJoin(F.broadcast(lam))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lamd = F.col("lam").cast("double")
    a11, a12, a13 = d("t_n"), d("t_sx1"), d("t_sx2")
    a22, a23, a33 = d("t_sx11") + lamd, d("t_sx12"), d("t_sx22") + lamd
    b1, b2, b3 = d("t_sy"), d("t_sx1y"), d("t_sx2y")
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    c0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    ) / det
    c1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    ) / det
    c2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    ) / det
    # held-out error: quadratic form over the FOLD's own (unpenalized)
    # moments
    fn_, f12, f13 = d("f_n"), d("f_sx1"), d("f_sx2")
    f22, f23, f33 = d("f_sx11"), d("f_sx12"), d("f_sx22")
    g1, g2_, g3 = d("f_sy"), d("f_sx1y"), d("f_sx2y")
    quad = (
        c0 * c0 * fn_
        + c1 * c1 * f22
        + c2 * c2 * f33
        + F.lit(2.0) * (c0 * c1 * f12 + c0 * c2 * f13 + c1 * c2 * f23)
    )
    sse = d("f_syy") - F.lit(2.0) * (c0 * g1 + c1 * g2_ + c2 * g3) + quad
    sst = d("f_syy") - g1 * g1 / fn_
    return ml.select(
        "fold",
        "lam",
        "f_n",
        sse.alias("sse_raw"),
        sst.alias("sst_raw"),
    )


def cv_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(fold, λ) held-out RMSE / R² from the one-pass CV frame —
    see _cv_fold_frame for the sufficient-statistic design."""
    ml = _cv_fold_frame(spark, sf_dir)
    fn_ = F.col("f_n").cast("double")
    return ml.select(
        "fold",
        "lam",
        F.col("f_n").cast("bigint").alias("n_test"),
        F.round(F.sqrt(F.col("sse_raw") / fn_), 6).alias("test_rmse"),
        F.round(F.lit(1.0) - F.col("sse_raw") / F.col("sst_raw"), 6).alias(
            "test_r2"
        ),
    ).orderBy("fold", "lam")


def cv_lambda_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularization-strength SELECTION on top of the one-pass CV —
    the decision rung that closes the cv_ridge loop the way the
    blocking-audit threshold sweep closes the blocker choice: per λ,
    the pooled cross-validated RMSE (sum of the K held-out SSEs over
    the total row count), with the winner flagged.

    Determinism: the only cross-fold float reduction — Σ_folds sse —
    is PIVOTED into a fixed left-associated K-term expression per λ
    (the kruskal_wallis device), so the double addition order is
    engine-identical; fold sizes sum as exact integers; the winner is
    an integer-exact (rmse, λ) struct argmin with smallest-λ
    tie-break.

    Scale: identical single fact-table pass as cv_ridge (the shared
    moment aggregate); everything after is a K·|λ|-row frame."""
    ml = _cv_fold_frame(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    term = lambda f: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("fold") == f, F.col("sse_raw"))), F.lit(0.0)
    )
    nterm = lambda f: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("fold") == f, F.col("f_n").cast("bigint"))),
        F.lit(0).cast("bigint"),
    )
    tot_sse = term(0)
    tot_n = nterm(0)
    for f in range(1, CV_FOLDS):
        tot_sse = tot_sse + term(f)
        tot_n = tot_n + nterm(f)
    per_lam = ml.groupBy("lam").agg(
        tot_sse.alias("sse"), tot_n.alias("n")
    )
    rmse = F.sqrt(F.col("sse") / d("n"))
    scored = per_lam.select(
        "lam", "n", F.round(rmse, 6).alias("cv_rmse"), rmse.alias("raw")
    )
    best = scored.agg(
        F.min(F.struct(F.col("raw").alias("r"), F.col("lam").alias("l"))).alias(
            "b"
        )
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "lam",
            F.col("n").alias("n_rows"),
            "cv_rmse",
            (F.col("lam") == F.col("b.l")).alias("selected"),
        )
        .orderBy("lam")
    )


def _cv_ridge_sql() -> str:
    cols = ["n", "sx1", "sx2", "sx11", "sx22", "sx12", "sy", "sx1y", "sx2y", "syy"]
    folds = ",\n         ".join(
        [f"CAST({c} AS DECIMAL(38,0)) AS f_{c}" for c in cols]
        + [
            f"CAST(sum({c}) OVER () - {c} AS DECIMAL(38,0)) AS t_{c}"
            for c in cols
        ]
    )
    lams = ", ".join(f"({l})" for l in RIDGE_LAMBDAS)
    return f"""
WITH li AS (
  SELECT CAST(l_orderkey % {CV_FOLDS} AS INTEGER) AS fold,
         CAST(l_quantity AS DECIMAL(38,0)) AS x1,
         CAST(round(l_discount * 100) AS DECIMAL(38,0)) AS x2,
         CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS y
  FROM lineitem),
m AS (
  SELECT fold,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x1) AS DECIMAL(38,0)) AS sx1,
         CAST(sum(x2) AS DECIMAL(38,0)) AS sx2,
         CAST(sum(x1 * x1) AS DECIMAL(38,0)) AS sx11,
         CAST(sum(x2 * x2) AS DECIMAL(38,0)) AS sx22,
         CAST(sum(x1 * x2) AS DECIMAL(38,0)) AS sx12,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x1 * y) AS DECIMAL(38,0)) AS sx1y,
         CAST(sum(x2 * y) AS DECIMAL(38,0)) AS sx2y,
         CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM li GROUP BY fold),
tr AS (
  SELECT fold,
         {folds}
  FROM m),
ml AS (
  SELECT tr.*, CAST(l.lam AS BIGINT) AS lam
  FROM tr, (VALUES {lams}) AS l(lam)),
sv AS (
  SELECT fold, lam, f_n, f_syy, f_sy, f_sx1y, f_sx2y, f_sx1, f_sx2,
         f_sx11, f_sx22, f_sx12,
         CAST(t_n AS DOUBLE) AS a11, CAST(t_sx1 AS DOUBLE) AS a12,
         CAST(t_sx2 AS DOUBLE) AS a13,
         CAST(t_sx11 AS DOUBLE) + CAST(lam AS DOUBLE) AS a22,
         CAST(t_sx12 AS DOUBLE) AS a23,
         CAST(t_sx22 AS DOUBLE) + CAST(lam AS DOUBLE) AS a33,
         CAST(t_sy AS DOUBLE) AS b1, CAST(t_sx1y AS DOUBLE) AS b2,
         CAST(t_sx2y AS DOUBLE) AS b3
  FROM ml),
co AS (
  SELECT fold, lam, f_n, f_syy, f_sy, f_sx1y, f_sx2y, f_sx1, f_sx2,
         f_sx11, f_sx22, f_sx12,
         (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3)
          + a13 * (b2 * a23 - a22 * b3))
         / (a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c0,
         (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13)
          + a13 * (a12 * b3 - b2 * a13))
         / (a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c1,
         (a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13)
          + b1 * (a12 * a23 - a22 * a13))
         / (a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)) AS c2
  FROM sv),
ev AS (
  SELECT fold, lam, f_n,
         CAST(f_syy AS DOUBLE)
         - 2.0 * (c0 * CAST(f_sy AS DOUBLE) + c1 * CAST(f_sx1y AS DOUBLE)
                  + c2 * CAST(f_sx2y AS DOUBLE))
         + (c0 * c0 * CAST(f_n AS DOUBLE) + c1 * c1 * CAST(f_sx11 AS DOUBLE)
            + c2 * c2 * CAST(f_sx22 AS DOUBLE)
            + 2.0 * (c0 * c1 * CAST(f_sx1 AS DOUBLE)
                     + c0 * c2 * CAST(f_sx2 AS DOUBLE)
                     + c1 * c2 * CAST(f_sx12 AS DOUBLE))) AS sse,
         CAST(f_syy AS DOUBLE)
         - CAST(f_sy AS DOUBLE) * CAST(f_sy AS DOUBLE)
           / CAST(f_n AS DOUBLE) AS sst
  FROM co)
SELECT fold, lam, CAST(f_n AS BIGINT) AS n_test,
       round(sqrt(sse / CAST(f_n AS DOUBLE)), 6) AS test_rmse,
       round(1.0 - sse / sst, 6) AS test_r2
FROM ev ORDER BY fold, lam
"""


def _cv_lambda_sql() -> str:
    """cv_lambda_select oracle: the SAME CTE chain as _cv_ridge_sql up
    to ``ev``, then the fixed-order fold pivot and the struct argmin."""
    ridge = _cv_ridge_sql()
    core = ridge[: ridge.index("SELECT fold, lam, CAST(f_n AS BIGINT)")]
    sse_terms = " + ".join(
        f"coalesce(max(CASE WHEN fold = {f} THEN sse END), 0.0)"
        for f in range(CV_FOLDS)
    )
    n_terms = " + ".join(
        f"coalesce(max(CASE WHEN fold = {f} THEN CAST(f_n AS BIGINT) END),"
        f" CAST(0 AS BIGINT))"
        for f in range(CV_FOLDS)
    )
    core = core.rstrip()
    assert core.endswith("FROM co)")
    return f"""{core},
per_lam AS (
  SELECT lam, {sse_terms} AS sse, {n_terms} AS n
  FROM ev GROUP BY lam),
scored AS (
  SELECT lam, n, round(sqrt(sse / CAST(n AS DOUBLE)), 6) AS cv_rmse,
         sqrt(sse / CAST(n AS DOUBLE)) AS raw
  FROM per_lam),
best AS (
  SELECT min(struct_pack(r := raw, l := lam)) AS b FROM scored)
SELECT lam, n AS n_rows, cv_rmse, lam = b.l AS selected
FROM scored, best ORDER BY lam
"""


# --- Logistic regression via fixed-round IRLS (round 13) --------------------

IRLS_ROUNDS = 4  # Newton/IRLS steps from beta = 0 (quadratic convergence)
IRLS_SCALE = 1_000_000  # micro-unit quantization of per-point IRLS terms


def logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(expedited | price) = sigmoid(b0 + b1*z) by
    IRLS_ROUNDS unrolled Newton/IRLS steps — the missing LOGISTIC rung
    of the regression family (rel_ols_regression / rel_ridge_regression
    are closed-form; the logistic MLE has no closed form, so the fixed
    iteration count is part of the query's contract, the
    llm_pca_power_iter discipline).

    Scale + determinism come from the same move: the fact table
    collapses ONCE to the distinct-(z, y) spine with multiplicities
    (z = price in exact cents / 1e6), and every IRLS step aggregates
    over the SPINE — per-point gradient/Hessian terms are quantized to
    micro-units (round(term * 1e6) as BIGINT, the bcubed_eval
    discipline), multiplied by the exact count, and summed as
    DECIMAL(38,0), so the only float reductions in the whole loop are
    order-free integer sums and the 2x2 Newton solve is a fixed double
    DAG on a 1-row frame. An incremental deployment maintains the spine
    counts (plain signed sums) and reruns the IRLS tail — the
    naive-bayes retraining posture.

    Output: one row — n, coefficients, mean log-loss (stable softplus,
    micro-quantized), and accuracy at the eta > 0 decision boundary
    (exactly p > 0.5, decided in integer-identical doubles)."""
    o = load(spark, sf_dir, "orders")
    spine = (
        o.select(
            (
                F.round(F.col("o_totalprice") * 100).cast("bigint").cast("double")
                / F.lit(1e6)
            ).alias("z"),
            F.col("o_orderpriority").isin(*ROC_POS_PRI).cast("int").alias("yy"),
        )
        .groupBy("z", "yy")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
    )
    from ..operators.checkpoints import release, tracked_local_checkpoint

    beta = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1")
    )
    mi = lambda c: F.round(c * F.lit(IRLS_SCALE)).cast("bigint")  # noqa: E731
    d6 = lambda c: F.col(c).cast("double") / F.lit(1e6)  # noqa: E731
    beta_ids = None
    for _ in range(IRLS_ROUNDS):
        j = spine.crossJoin(F.broadcast(beta))
        eta = F.col("b0") + F.col("b1") * F.col("z")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        wgt = p * (F.lit(1.0) - p)
        yv = F.col("yy").cast("double")
        stats = j.agg(
            F.sum(F.col("m") * mi(yv - p)).cast("decimal(38,0)").alias("g0"),
            F.sum(F.col("m") * mi((yv - p) * F.col("z")))
            .cast("decimal(38,0)")
            .alias("g1"),
            F.sum(F.col("m") * mi(wgt)).cast("decimal(38,0)").alias("h00"),
            F.sum(F.col("m") * mi(wgt * F.col("z")))
            .cast("decimal(38,0)")
            .alias("h01"),
            F.sum(F.col("m") * mi(wgt * F.col("z") * F.col("z")))
            .cast("decimal(38,0)")
            .alias("h11"),
        )
        det = d6("h00") * d6("h11") - d6("h01") * d6("h01")
        # cut the 1-row parameter lineage each round: beta is referenced
        # TWICE per round (inside the spine join and in the update), so
        # the unclipped plan re-expands 2^IRLS_ROUNDS times
        new_beta, new_ids = tracked_local_checkpoint(
            stats.crossJoin(F.broadcast(beta)).select(
                (
                    F.col("b0")
                    + (d6("h11") * d6("g0") - d6("h01") * d6("g1")) / det
                ).alias("b0"),
                (
                    F.col("b1")
                    + (d6("h00") * d6("g1") - d6("h01") * d6("g0")) / det
                ).alias("b1"),
            ),
            register=True,
        )
        if beta_ids is not None:
            release(spark, beta_ids)
        beta, beta_ids = new_beta, new_ids
    fin = spine.crossJoin(F.broadcast(beta))
    eta = F.col("b0") + F.col("b1") * F.col("z")
    marg = (F.lit(2.0) * F.col("yy").cast("double") - F.lit(1.0)) * eta
    softplus = F.greatest(-marg, F.lit(0.0)) + F.log(
        F.lit(1.0) + F.exp(-F.abs(marg))
    )
    correct = (eta > F.lit(0.0)) == (F.col("yy") == F.lit(1))
    rep = fin.agg(
        F.sum("m").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("m") * mi(softplus)).cast("decimal(38,0)").alias("llm_"),
        F.sum(F.when(correct, F.col("m")).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("acc"),
        F.max("b0").alias("b0"),
        F.max("b1").alias("b1"),
    )
    nd = F.col("n").cast("double")
    return rep.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("b0"), 6).alias("b0"),
        F.round(F.col("b1"), 6).alias("b1"),
        F.round(
            F.col("llm_").cast("double") / F.lit(1e6) / nd, 6
        ).alias("mean_logloss"),
        F.round(F.col("acc").cast("double") / nd, 6).alias("accuracy"),
    )


def _logistic_sql() -> str:
    pri = ", ".join(f"'{p}'" for p in ROC_POS_PRI)
    header = f"""
WITH spine AS (
  SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE)
           / 1000000.0 AS z,
         CAST(CASE WHEN o_orderpriority IN ({pri}) THEN 1 ELSE 0 END
              AS INTEGER) AS yy,
         CAST(count(*) AS DECIMAL(38,0)) AS m
  FROM orders GROUP BY 1, 2),
it0 AS (SELECT 0.0 AS b0, 0.0 AS b1)"""
    steps = []
    for i in range(IRLS_ROUNDS):
        steps.append(f""",
s{i} AS (
  SELECT
    CAST(sum(m * CAST(round((CAST(yy AS DOUBLE)
          - 1.0 / (1.0 + exp(-(b0 + b1 * z)))) * {IRLS_SCALE}) AS BIGINT))
      AS DECIMAL(38,0)) AS g0,
    CAST(sum(m * CAST(round(((CAST(yy AS DOUBLE)
          - 1.0 / (1.0 + exp(-(b0 + b1 * z)))) * z) * {IRLS_SCALE})
        AS BIGINT)) AS DECIMAL(38,0)) AS g1,
    CAST(sum(m * CAST(round(((1.0 / (1.0 + exp(-(b0 + b1 * z))))
          * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * z))))) * {IRLS_SCALE})
        AS BIGINT)) AS DECIMAL(38,0)) AS h00,
    CAST(sum(m * CAST(round(((1.0 / (1.0 + exp(-(b0 + b1 * z))))
          * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * z)))) * z) * {IRLS_SCALE})
        AS BIGINT)) AS DECIMAL(38,0)) AS h01,
    CAST(sum(m * CAST(round(((1.0 / (1.0 + exp(-(b0 + b1 * z))))
          * (1.0 - 1.0 / (1.0 + exp(-(b0 + b1 * z)))) * z * z)
          * {IRLS_SCALE}) AS BIGINT)) AS DECIMAL(38,0)) AS h11
  FROM spine, it{i}),
it{i + 1} AS (
  SELECT b0 + ((CAST(h11 AS DOUBLE) / 1000000.0)
               * (CAST(g0 AS DOUBLE) / 1000000.0)
               - (CAST(h01 AS DOUBLE) / 1000000.0)
                 * (CAST(g1 AS DOUBLE) / 1000000.0))
             / ((CAST(h00 AS DOUBLE) / 1000000.0)
                * (CAST(h11 AS DOUBLE) / 1000000.0)
                - (CAST(h01 AS DOUBLE) / 1000000.0)
                  * (CAST(h01 AS DOUBLE) / 1000000.0)) AS b0,
         b1 + ((CAST(h00 AS DOUBLE) / 1000000.0)
               * (CAST(g1 AS DOUBLE) / 1000000.0)
               - (CAST(h01 AS DOUBLE) / 1000000.0)
                 * (CAST(g0 AS DOUBLE) / 1000000.0))
             / ((CAST(h00 AS DOUBLE) / 1000000.0)
                * (CAST(h11 AS DOUBLE) / 1000000.0)
                - (CAST(h01 AS DOUBLE) / 1000000.0)
                  * (CAST(h01 AS DOUBLE) / 1000000.0)) AS b1
  FROM s{i}, it{i})""")
    tail = f""",
rep AS (
  SELECT CAST(sum(m) AS DECIMAL(38,0)) AS n,
         CAST(sum(m * CAST(round((greatest(-((2.0 * CAST(yy AS DOUBLE) - 1.0)
               * (b0 + b1 * z)), 0.0)
             + ln(1.0 + exp(-abs((2.0 * CAST(yy AS DOUBLE) - 1.0)
               * (b0 + b1 * z))))) * {IRLS_SCALE}) AS BIGINT))
           AS DECIMAL(38,0)) AS llm_,
         CAST(sum(CASE WHEN ((b0 + b1 * z) > 0.0) = (yy = 1)
                       THEN m ELSE 0 END) AS DECIMAL(38,0)) AS acc,
         max(b0) AS b0, max(b1) AS b1
  FROM spine, it{IRLS_ROUNDS})
SELECT CAST(n AS BIGINT) AS n_orders,
       round(b0, 6) AS b0,
       round(b1, 6) AS b1,
       round(CAST(llm_ AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6)
         AS mean_logloss,
       round(CAST(acc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy
FROM rep"""
    return header + "".join(steps) + tail


# --- Boosted decision stumps (round 13) -------------------------------------

GBM_ROUNDS = 3  # boosting rounds (depth-1 trees), part of the contract
GBM_NU = 0.5  # shrinkage


def boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares gradient boosting with depth-1 trees (decision
    stumps) on P(expedited | price) — the missing TREE rung of the model
    family (linear: ols/ridge; logistic: irls; trees: here). GBM_ROUNDS
    rounds, shrinkage GBM_NU, F0 = mean(y).

    The classic single-node stump search becomes a SPINE SWEEP: the
    fact table collapses once to per-distinct-price label counts
    (m1, m0), and the best threshold of EVERY round is found from one
    cumulative window over that spine — gain(θ) = S_l²/n_l + S_r²/n_r
    with residual prefix sums S kept in exact micro-unit BIGINTs
    (residuals depend on the fitted value only through the per-z
    micro-quantized fμ, so s_z = m1·(1e6 − fμ) − m0·fμ is integer), the
    argmax decided on a (gain, −θ) struct with smallest-threshold
    tie-break. Fitted values re-quantize to micro-units after every
    update, so both engines walk the identical float lattice.

    Output: one row per round — threshold (cents), gain, left/right leaf
    values, and the training MSE after that round (the boosting curve;
    pytest pins that it is non-increasing).

    Scale: one fact-table pass builds the spine; each round is one
    ordered window over the spine + a 1-row broadcast — GBM_ROUNDS
    windows total, no pass ever returns to the fact table."""
    o = load(spark, sf_dir, "orders")
    spine = (
        o.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("z"),
            F.col("o_orderpriority").isin(*ROC_POS_PRI).cast("int").alias("yy"),
        )
        .groupBy("z")
        .agg(
            F.sum("yy").cast("bigint").alias("m1"),
            F.sum(F.lit(1) - F.col("yy")).cast("bigint").alias("m0"),
        )
    )
    f0 = spine.agg(
        F.round(
            F.sum("m1").cast("double")
            / (F.sum("m1") + F.sum("m0")).cast("double")
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("fu0")
    )
    from ..operators.checkpoints import release, tracked_local_checkpoint

    # the fitted spine is referenced FOUR times per round (prefix window,
    # totals, update, mse): cut its lineage each round or the unrolled
    # plan re-expands ~4^GBM_ROUNDS times (measured 130 scan nodes -> 2)
    cur, cur_ids = tracked_local_checkpoint(
        spine.crossJoin(F.broadcast(f0)).select(
            "z", "m1", "m0", F.col("fu0").alias("fu")
        ),
        register=True,
    )
    w = W.orderBy("z").rowsBetween(W.unboundedPreceding, W.currentRow)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    out = None
    for t in range(1, GBM_ROUNDS + 1):
        pre = cur.select(
            "z",
            "m1",
            "m0",
            "fu",
            F.sum(
                F.col("m1") * (F.lit(1_000_000) - F.col("fu"))
                - F.col("m0") * F.col("fu")
            )
            .over(w)
            .cast("decimal(38,0)")
            .alias("cs"),
            F.sum(F.col("m1") + F.col("m0"))
            .over(w)
            .cast("decimal(38,0)")
            .alias("cm"),
        )
        # the final cs is NOT usable as the total (cs can dip); re-sum
        tot = pre.agg(
            F.sum(
                F.col("m1") * (F.lit(1_000_000) - F.col("fu"))
                - F.col("m0") * F.col("fu")
            )
            .cast("decimal(38,0)")
            .alias("s_t"),
            F.sum(F.col("m1") + F.col("m0")).cast("decimal(38,0)").alias("n_t"),
        )
        g = pre.crossJoin(F.broadcast(tot)).filter(F.col("cm") < F.col("n_t"))
        sl = d("cs") / F.lit(1e6)
        sr = (d("s_t") - d("cs")) / F.lit(1e6)
        nl, nr = d("cm"), d("n_t") - d("cm")
        gain = sl * sl / nl + sr * sr / nr
        # best must be MATERIALIZED before the old fitted spine is
        # released below — it is consumed lazily by the output row
        best, _ = tracked_local_checkpoint(
            g.select(
                F.max(
                    F.struct(
                        gain.alias("gain"),
                        (-F.col("z")).alias("nz"),
                        (sl / nl).alias("vl"),
                        (sr / nr).alias("vr"),
                    )
                ).alias("b")
            ).select(
                F.lit(t).alias("round"),
                (-F.col("b.nz")).alias("theta_cents"),
                F.col("b.gain").alias("gain_raw"),
                F.col("b.vl").alias("vl"),
                F.col("b.vr").alias("vr"),
            ),
            register=True,
        )
        new_cur, new_ids = tracked_local_checkpoint(
            cur.crossJoin(F.broadcast(best)).select(
                "z",
                "m1",
                "m0",
                F.round(
                    (
                        d("fu") / F.lit(1e6)
                        + F.lit(GBM_NU)
                        * F.when(
                            F.col("z") <= F.col("theta_cents"), F.col("vl")
                        ).otherwise(F.col("vr"))
                    )
                    * F.lit(1e6)
                )
                .cast("bigint")
                .alias("fu"),
            ),
            register=True,
        )
        release(spark, cur_ids)
        cur, cur_ids = new_cur, new_ids
        mi_ = lambda c: F.round(c * F.lit(1e6)).cast("bigint")  # noqa: E731
        fv = d("fu") / F.lit(1e6)
        mse = cur.agg(
            (
                F.sum(
                    F.col("m1") * mi_((F.lit(1.0) - fv) * (F.lit(1.0) - fv))
                    + F.col("m0") * mi_(fv * fv)
                ).cast("decimal(38,0)")
            ).alias("sseu"),
            F.sum(F.col("m1") + F.col("m0")).cast("decimal(38,0)").alias("nn"),
        )
        # the 1-row output is materialized per round so the NEXT round's
        # release of the superseded fitted spine cannot strand it
        row, _ = tracked_local_checkpoint(
            best.crossJoin(F.broadcast(mse)).select(
                "round",
                "theta_cents",
                F.round(F.col("gain_raw") / d("nn"), 6).alias("gain_per_row"),
                F.round("vl", 6).alias("left_val"),
                F.round("vr", 6).alias("right_val"),
                F.round(d("sseu") / F.lit(1e6) / d("nn"), 6).alias(
                    "mse_after"
                ),
            ),
            register=True,
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


def _boosted_stumps_sql() -> str:
    pri = ", ".join(f"'{p}'" for p in ROC_POS_PRI)
    parts = [f"""
WITH spine AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS z,
         CAST(sum(CASE WHEN o_orderpriority IN ({pri})
                       THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         CAST(sum(CASE WHEN o_orderpriority IN ({pri})
                       THEN 0 ELSE 1 END) AS BIGINT) AS m0
  FROM orders GROUP BY 1),
f0 AS (
  SELECT CAST(round(CAST(sum(m1) AS DOUBLE)
                    / CAST(sum(m1) + sum(m0) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS fu0
  FROM spine),
cur0 AS (SELECT z, m1, m0, fu0 AS fu FROM spine, f0)"""]
    for t in range(1, GBM_ROUNDS + 1):
        p = t - 1
        parts.append(f""",
pre{t} AS (
  SELECT z, m1, m0, fu,
         CAST(sum(m1 * (1000000 - fu) - m0 * fu)
              OVER (ORDER BY z ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS DECIMAL(38,0)) AS cs,
         CAST(sum(m1 + m0)
              OVER (ORDER BY z ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS DECIMAL(38,0)) AS cm
  FROM cur{p}),
tot{t} AS (
  SELECT CAST(sum(m1 * (1000000 - fu) - m0 * fu) AS DECIMAL(38,0)) AS s_t,
         CAST(sum(m1 + m0) AS DECIMAL(38,0)) AS n_t
  FROM cur{p}),
best{t} AS (
  SELECT {t} AS rnd,
         -(b.nz) AS theta_cents, b.gain AS gain_raw, b.vl AS vl, b.vr AS vr
  FROM (
    SELECT max(struct_pack(
             gain := (CAST(cs AS DOUBLE) / 1000000.0)
                     * (CAST(cs AS DOUBLE) / 1000000.0)
                     / CAST(cm AS DOUBLE)
                   + ((CAST(s_t AS DOUBLE) - CAST(cs AS DOUBLE)) / 1000000.0)
                     * ((CAST(s_t AS DOUBLE) - CAST(cs AS DOUBLE)) / 1000000.0)
                     / (CAST(n_t AS DOUBLE) - CAST(cm AS DOUBLE)),
             nz := -z,
             vl := (CAST(cs AS DOUBLE) / 1000000.0) / CAST(cm AS DOUBLE),
             vr := ((CAST(s_t AS DOUBLE) - CAST(cs AS DOUBLE)) / 1000000.0)
                   / (CAST(n_t AS DOUBLE) - CAST(cm AS DOUBLE)))) AS b
    FROM pre{t}, tot{t} WHERE cm < n_t) q),
cur{t} AS (
  SELECT z, m1, m0,
         CAST(round((CAST(fu AS DOUBLE) / 1000000.0
                     + {GBM_NU} * (CASE WHEN z <= theta_cents THEN vl
                                        ELSE vr END)) * 1000000.0)
              AS BIGINT) AS fu
  FROM cur{p}, best{t}),
mse{t} AS (
  SELECT CAST(sum(m1 * CAST(round((1.0 - CAST(fu AS DOUBLE) / 1000000.0)
                   * (1.0 - CAST(fu AS DOUBLE) / 1000000.0) * 1000000.0)
                 AS BIGINT)
               + m0 * CAST(round((CAST(fu AS DOUBLE) / 1000000.0)
                   * (CAST(fu AS DOUBLE) / 1000000.0) * 1000000.0)
                 AS BIGINT)) AS DECIMAL(38,0)) AS sseu,
         CAST(sum(m1 + m0) AS DECIMAL(38,0)) AS nn
  FROM cur{t})""")
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST(rnd AS INTEGER) AS round, theta_cents,
       round(gain_raw / CAST(nn AS DOUBLE), 6) AS gain_per_row,
       round(vl, 6) AS left_val, round(vr, 6) AS right_val,
       round(CAST(sseu AS DOUBLE) / 1000000.0 / CAST(nn AS DOUBLE), 6)
         AS mse_after
FROM best{t}, mse{t}"""
        for t in range(1, GBM_ROUNDS + 1)
    )
    return "".join(parts) + "\n" + rows + "\nORDER BY round"


# --- Randomization (permutation-style) test (round 13) ----------------------

PERM_B = 256  # resamples; all ride one pass over the daily series
PERM_GROUPS = 7  # relabel modulus (day-of-week marginal)


def permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-relabel randomization test for the weekend-vs-weekday mean
    daily-revenue difference — the EXACT-p companion to the asymptotic
    rel_mann_whitney z: PERM_B resamples relabel every day by a
    deterministic md5-u32 draw with the SAME 2/7 weekend marginal
    (hash % 7 ∈ weekend — the binomial-relabel variant of the
    permutation test, the Poisson-bootstrap convention for randomness
    too large to truly permute), and the p-value is the add-one share of
    resamples whose |mean gap| reaches the observed one.

    Exactness: every comparison is INTEGER — resample b beats the
    observed gap iff |S'_a·n'_b − S'_b·n'_a| · (n_a·n_b) ≥
    |S_a·n_b − S_b·n_a| · (n'_a·n'_b), cross-multiplied in DECIMAL(38,0)
    so no division ever happens before the final 1-row report;
    degenerate resamples (one side empty) are excluded like bootstrap
    non-survivors. p = (1 + #beats) / (1 + #valid), exact rational.

    Scale: the B-explode rides the calendar-bounded daily frame (~2.4k
    rows at any corpus scale · PERM_B), collapsing map-side; the heavy
    pass is the shared one-scan daily aggregate."""
    daily = daily_revenue_cents(spark, sf_dir).select(
        "dn",
        F.col("cents").cast("decimal(38,0)").alias("x"),
        F.pmod(F.col("dn"), F.lit(PERM_GROUPS)).alias("dow"),
    )
    is_a = F.col("dow").isin(*MW_WEEKEND)
    obs = daily.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("decimal(38,0)").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("decimal(38,0)").alias("n_b"),
        F.sum(F.when(is_a, F.col("x")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_a"),
        F.sum(F.when(~is_a, F.col("x")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_b"),
    )
    u = _kmv_u32(
        F.concat_ws(
            ":", F.col("dn").cast("string"), F.col("b").cast("string"), F.lit("perm")
        )
    )
    rel = (
        daily.select(
            "dn",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(PERM_B - 1))).alias("b"),
        )
        .withColumn("ra", F.pmod(u, F.lit(PERM_GROUPS)).isin(*MW_WEEKEND))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("ra"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("na"),
            F.sum(F.when(~F.col("ra"), 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("nb"),
            F.sum(F.when(F.col("ra"), F.col("x")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("sa"),
            F.sum(F.when(~F.col("ra"), F.col("x")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("sb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
    )
    j = rel.crossJoin(F.broadcast(obs))
    beats = F.abs(
        F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")
    ) * (F.col("n_a") * F.col("n_b")) >= F.abs(
        F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")
    ) * (
        F.col("na") * F.col("nb")
    )
    rep = j.groupBy("n_a", "n_b", "s_a", "s_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_valid"),
        F.sum(F.when(beats, 1).otherwise(0)).cast("bigint").alias("n_ge"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return rep.select(
        (F.col("n_a") + F.col("n_b")).cast("bigint").alias("n_days"),
        F.round(d("s_a") / d("n_a") - d("s_b") / d("n_b"), 6).alias(
            "obs_diff_cents"
        ),
        "n_valid",
        "n_ge",
        F.round(
            (F.col("n_ge") + F.lit(1)).cast("double")
            / (F.col("n_valid") + F.lit(1)).cast("double"),
            6,
        ).alias("p_value"),
    )


def _perm_test_sql() -> str:
    wk = ", ".join(str(k) for k in MW_WEEKEND)
    u = _kmv_u32_sql(
        "CAST(dn AS VARCHAR) || ':' || CAST(b AS VARCHAR) || ':' || 'perm'"
    )
    return f"""
WITH {_DAILY_SQL},
dd AS (SELECT dn, CAST(cents AS DECIMAL(38,0)) AS x, dn % {PERM_GROUPS} AS dow
       FROM daily),
obs AS (
  SELECT CAST(sum(CASE WHEN dow IN ({wk}) THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS n_a,
         CAST(sum(CASE WHEN dow IN ({wk}) THEN 0 ELSE 1 END)
              AS DECIMAL(38,0)) AS n_b,
         CAST(sum(CASE WHEN dow IN ({wk}) THEN x ELSE 0 END)
              AS DECIMAL(38,0)) AS s_a,
         CAST(sum(CASE WHEN dow IN ({wk}) THEN 0 ELSE x END)
              AS DECIMAL(38,0)) AS s_b
  FROM dd),
rel AS (
  SELECT b,
         CAST(sum(CASE WHEN ra THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS na,
         CAST(sum(CASE WHEN ra THEN 0 ELSE 1 END) AS DECIMAL(38,0)) AS nb,
         CAST(sum(CASE WHEN ra THEN x ELSE 0 END) AS DECIMAL(38,0)) AS sa,
         CAST(sum(CASE WHEN ra THEN 0 ELSE x END) AS DECIMAL(38,0)) AS sb
  FROM (
    SELECT dn, x, b, ({u}) % {PERM_GROUPS} IN ({wk}) AS ra
    FROM dd, (SELECT unnest(generate_series(0, {PERM_B - 1})) AS b) g)
  GROUP BY b
  HAVING sum(CASE WHEN ra THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN ra THEN 0 ELSE 1 END) > 0),
rep AS (
  SELECT n_a, n_b, s_a, s_b,
         CAST(count(*) AS BIGINT) AS n_valid,
         CAST(sum(CASE WHEN abs(sa * nb - sb * na) * (n_a * n_b)
                        >= abs(s_a * n_b - s_b * n_a) * (na * nb)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
  FROM rel, obs GROUP BY n_a, n_b, s_a, s_b)
SELECT CAST(n_a + n_b AS BIGINT) AS n_days,
       round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
         AS obs_diff_cents,
       n_valid, n_ge,
       round(CAST(n_ge + 1 AS DOUBLE) / CAST(n_valid + 1 AS DOUBLE), 6)
         AS p_value
FROM rep
"""


# --- 2-component Gaussian mixture via fixed-round EM (round 13) -------------

EM_ROUNDS = 4  # unrolled E/M steps; the fixed count is part of the contract
EM_VAR_FLOOR = 1e-6  # variance floor (z units squared)


def gaussian_mixture_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture over order price (z = exact
    cents / 1e6) fit by EM_ROUNDS unrolled EM steps — the
    latent-variable rung of the model family (Dempster-Laird-Rubin
    1977): closed-form rungs (ols/ridge), iterative-convex (logistic
    IRLS), trees (stumps), and now a non-convex mixture, all on the same
    collapsed-spine execution shape.

    Initialization is deterministic from the exact global moments
    (mu +- sd/2, shared variance, equal weights). Each E-step computes
    responsibilities per DISTINCT price (phi_k = exp(-(z-mu_k)^2/(2 v_k))
    / sqrt(v_k), the 1/sqrt(2 pi) cancels), micro-quantizes them
    (round(r1 * 1e6), complement r2 = 1e6 - r1 exactly), and the M-step
    sums m * r_ku, m * round(r_ku * z), m * round(r_ku * z * z) as
    DECIMAL(38,0) — every cross-row reduction an order-free integer sum,
    so the parameter trajectory is bitwise on both engines. Variances
    are floored at EM_VAR_FLOOR.

    Output: one row — n, weights, means, sigmas (z units), and the mean
    negative log-likelihood (micro-quantized softcount, ln sqrt(2 pi)
    restored).

    Scale: one fact-table pass builds the spine; each EM round is one
    map-side-combining aggregate over the spine + a 1-row broadcast.
    An incremental deployment maintains the spine counts and reruns the
    EM tail — the nb retraining posture."""
    o = load(spark, sf_dir, "orders")
    spine = (
        o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
        .select((F.col("c").cast("double") / F.lit(1e6)).alias("z"), "m")
    )
    mom = spine.agg(
        F.sum("m").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("m") * F.round(F.col("z") * F.lit(1e6)).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum(
            F.col("m")
            * F.round(F.col("z") * F.col("z") * F.lit(1e6)).cast("bigint")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    mz = dd("s") / dd("n") / F.lit(1e6)
    vz = F.greatest(
        dd("q") / dd("n") / F.lit(1e6) - mz * mz, F.lit(EM_VAR_FLOOR)
    )
    from ..operators.checkpoints import release, tracked_local_checkpoint

    params = mom.select(
        F.lit(0.5).alias("w1"),
        (mz - F.lit(0.5) * F.sqrt(vz)).alias("mu1"),
        vz.alias("v1"),
        (mz + F.lit(0.5) * F.sqrt(vz)).alias("mu2"),
        vz.alias("v2"),
    )
    params_ids = None
    z = F.col("z")

    def phi(mu, v):
        return F.exp(-(((z - mu) * (z - mu)) / (F.lit(2.0) * v))) / F.sqrt(v)

    for _ in range(EM_ROUNDS):
        j = spine.crossJoin(F.broadcast(params))
        p1 = phi(F.col("mu1"), F.col("v1"))
        p2 = phi(F.col("mu2"), F.col("v2"))
        r1 = (F.col("w1") * p1) / (
            (F.col("w1") * p1) + ((F.lit(1.0) - F.col("w1")) * p2)
        )
        r1u = F.round(r1 * F.lit(1e6)).cast("bigint")
        r2u = F.lit(1_000_000) - r1u
        t = lambda ru, e: F.sum(  # noqa: E731
            F.col("m") * F.round(ru.cast("double") * e).cast("bigint")
        ).cast("decimal(38,0)")
        s = j.agg(
            F.sum(F.col("m") * r1u).cast("decimal(38,0)").alias("n1"),
            t(r1u, z).alias("a1"),
            t(r1u, z * z).alias("q1"),
            F.sum(F.col("m") * r2u).cast("decimal(38,0)").alias("n2"),
            t(r2u, z).alias("a2"),
            t(r2u, z * z).alias("q2"),
        )
        mu1 = dd("a1") / dd("n1")
        mu2 = dd("a2") / dd("n2")
        # cut the 1-row parameter lineage each round (the IRLS device:
        # params are referenced twice per round, so the unclipped plan
        # re-expands 2^EM_ROUNDS times)
        new_params, new_ids = tracked_local_checkpoint(
            s.select(
                (dd("n1") / (dd("n1") + dd("n2"))).alias("w1"),
                mu1.alias("mu1"),
                F.greatest(
                    dd("q1") / dd("n1") - mu1 * mu1, F.lit(EM_VAR_FLOOR)
                ).alias("v1"),
                mu2.alias("mu2"),
                F.greatest(
                    dd("q2") / dd("n2") - mu2 * mu2, F.lit(EM_VAR_FLOOR)
                ).alias("v2"),
            ),
            register=True,
        )
        if params_ids is not None:
            release(spark, params_ids)
        params, params_ids = new_params, new_ids
    fin = spine.crossJoin(F.broadcast(params))
    p1 = phi(F.col("mu1"), F.col("v1"))
    p2 = phi(F.col("mu2"), F.col("v2"))
    mix = (F.col("w1") * p1) + ((F.lit(1.0) - F.col("w1")) * p2)
    nll = F.lit(0.9189385332046727) - F.log(mix)
    rep = fin.agg(
        F.sum("m").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("m") * F.round(nll * F.lit(1e6)).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("llu"),
        F.max("w1").alias("w1"),
        F.max("mu1").alias("mu1"),
        F.max("v1").alias("v1"),
        F.max("mu2").alias("mu2"),
        F.max("v2").alias("v2"),
    )
    return rep.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("w1", 6).alias("w1"),
        F.round("mu1", 6).alias("mu1"),
        F.round(F.sqrt("v1"), 6).alias("sigma1"),
        F.round("mu2", 6).alias("mu2"),
        F.round(F.sqrt("v2"), 6).alias("sigma2"),
        F.round(dd("llu") / F.lit(1e6) / dd("n"), 6).alias("mean_nll"),
    )


def _gmm_sql() -> str:
    def phi(mu, v):
        return f"(exp(-(((z - {mu}) * (z - {mu})) / (2.0 * {v}))) / sqrt({v}))"

    def r1(px):
        p1, p2 = phi(f"mu1_{px}", f"v1_{px}"), phi(f"mu2_{px}", f"v2_{px}")
        return (
            f"((w1_{px} * {p1}) / ((w1_{px} * {p1})"
            f" + ((1.0 - w1_{px}) * {p2})))"
        )

    header = """
WITH spine AS (
  SELECT CAST(c AS DOUBLE) / 1000000.0 AS z, m FROM (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
           CAST(count(*) AS DECIMAL(38,0)) AS m
    FROM orders GROUP BY 1)),
mom AS (
  SELECT CAST(sum(m) AS DECIMAL(38,0)) AS n,
         CAST(sum(m * CAST(round(z * 1000000.0) AS BIGINT))
              AS DECIMAL(38,0)) AS s,
         CAST(sum(m * CAST(round(z * z * 1000000.0) AS BIGINT))
              AS DECIMAL(38,0)) AS q
  FROM spine),
p0 AS (
  SELECT 0.5 AS w1_0,
         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
         - 0.5 * sqrt(greatest(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                               / 1000000.0
                               - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                  / 1000000.0)
                                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                    / 1000000.0), 1e-06)) AS mu1_0,
         greatest(CAST(q AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0),
                  1e-06) AS v1_0,
         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
         + 0.5 * sqrt(greatest(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                               / 1000000.0
                               - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                  / 1000000.0)
                                 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                                    / 1000000.0), 1e-06)) AS mu2_0,
         greatest(CAST(q AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0),
                  1e-06) AS v2_0
  FROM mom)"""
    steps = []
    for i in range(EM_ROUNDS):
        j = i + 1
        ru = f"CAST(round({r1(i)} * 1000000.0) AS BIGINT)"
        steps.append(f""",
s{j} AS (
  SELECT CAST(sum(m * ({ru})) AS DECIMAL(38,0)) AS n1,
         CAST(sum(m * CAST(round(CAST({ru} AS DOUBLE) * z) AS BIGINT))
              AS DECIMAL(38,0)) AS a1,
         CAST(sum(m * CAST(round(CAST({ru} AS DOUBLE) * (z * z)) AS BIGINT))
              AS DECIMAL(38,0)) AS q1,
         CAST(sum(m * (1000000 - ({ru}))) AS DECIMAL(38,0)) AS n2,
         CAST(sum(m * CAST(round(CAST(1000000 - ({ru}) AS DOUBLE) * z)
                  AS BIGINT)) AS DECIMAL(38,0)) AS a2,
         CAST(sum(m * CAST(round(CAST(1000000 - ({ru}) AS DOUBLE) * (z * z))
                  AS BIGINT)) AS DECIMAL(38,0)) AS q2
  FROM spine, p{i}),
p{j} AS (
  SELECT CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
           AS w1_{j},
         CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mu1_{j},
         greatest(CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - (CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    * (CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)),
                  1e-06) AS v1_{j},
         CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mu2_{j},
         greatest(CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                  - (CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                    * (CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)),
                  1e-06) AS v2_{j}
  FROM s{j}, p{i})""")
    T = EM_ROUNDS
    p1, p2 = phi(f"mu1_{T}", f"v1_{T}"), phi(f"mu2_{T}", f"v2_{T}")
    mix = f"((w1_{T} * {p1}) + ((1.0 - w1_{T}) * {p2}))"
    tail = f""",
rep AS (
  SELECT CAST(sum(m) AS DECIMAL(38,0)) AS n,
         CAST(sum(m * CAST(round((0.9189385332046727 - ln({mix}))
                  * 1000000.0) AS BIGINT)) AS DECIMAL(38,0)) AS llu,
         max(w1_{T}) AS w1, max(mu1_{T}) AS mu1, max(v1_{T}) AS v1,
         max(mu2_{T}) AS mu2, max(v2_{T}) AS v2
  FROM spine, p{T})
SELECT CAST(n AS BIGINT) AS n_orders,
       round(w1, 6) AS w1, round(mu1, 6) AS mu1,
       round(sqrt(v1), 6) AS sigma1,
       round(mu2, 6) AS mu2, round(sqrt(v2), 6) AS sigma2,
       round(CAST(llu AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6)
         AS mean_nll
FROM rep"""
    return header + "".join(steps) + tail


# --- Bounded forward-backward SCC coloring (round 13) -----------------------

SCC_ROUNDS = 4  # label-propagation rounds each way (the bellman_ford budget)


def scc_minlabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly-connected structure of the DIRECTED part-precedence
    graph (edge a→b iff part a appears on an EARLIER line than part b in
    some order — the directed sibling of the co-purchase graph behind
    rel_shortest_path/rel_pagerank) by hop-bounded forward-backward
    coloring (Fleischer-Hendrickson-Pinar 2000): fwd(v) = min id
    reaching v within SCC_ROUNDS hops, bwd(v) = min id v reaches within
    SCC_ROUNDS hops (the same kernel on reversed edges). A (fwd, bwd)
    group with fwd = bwd = r is VERIFIED mutually connected — every
    member reaches r and is reached by r, so the group is a subset of
    the true SCC of r (exactly SCC(r) once the round budget covers the
    component diameter; the hop bound is part of the contract, the
    shortest_path K-audit convention). Groups with fwd ≠ bwd are
    reported unverified — structure evidence, not an SCC claim.

    Output: one row per (fwd_label, bwd_label) colour class — member
    count, min/max member — with the verified flag.

    Scale: per-order pair expansion is bounded by order size (TPC-H caps
    at 7 lines); each of the 2·SCC_ROUNDS rounds is ONE node-keyed
    shuffle join + one min-agg with map-side combine over the
    localCheckpointed distinct-edge table; no stage is quadratic in the
    graph."""
    from ..operators.graph import min_label_rounds

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    fwd = min_label_rounds(e, SCC_ROUNDS)
    bwd = min_label_rounds(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        SCC_ROUNDS,
    )
    j = fwd.alias("f").join(bwd.alias("b"), "node").select(
        "node",
        F.col("f.lab").alias("fwd_label"),
        F.col("b.lab").alias("bwd_label"),
    )
    return (
        j.groupBy(
            "fwd_label",
            "bwd_label",
            (F.col("fwd_label") == F.col("bwd_label")).alias("verified"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .orderBy("fwd_label", "bwd_label")
    )


def _scc_sql() -> str:
    def chain(pfx: str, e: str) -> str:
        ctes = [
            f"""{pfx}0 AS (
  SELECT v AS node, v AS lab FROM (
    SELECT src AS v FROM {e} UNION SELECT dst AS v FROM {e}) n)"""
        ]
        for k in range(1, SCC_ROUNDS + 1):
            p = k - 1
            ctes.append(
                f"""{pfx}{k} AS (
  SELECT node, min(lab) AS lab FROM (
    SELECT node, lab FROM {pfx}{p}
    UNION ALL
    SELECT {e}.dst AS node, {pfx}{p}.lab
    FROM {e} JOIN {pfx}{p} ON {e}.src = {pfx}{p}.node) u
  GROUP BY node)"""
            )
        return ",\n".join(ctes)

    return f"""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND a.l_linenumber < b.l_linenumber
   AND a.l_partkey != b.l_partkey),
r AS (SELECT dst AS src, src AS dst FROM e),
{chain('f', 'e')},
{chain('g', 'r')}
SELECT f{SCC_ROUNDS}.lab AS fwd_label,
       g{SCC_ROUNDS}.lab AS bwd_label,
       f{SCC_ROUNDS}.lab = g{SCC_ROUNDS}.lab AS verified,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(f{SCC_ROUNDS}.node) AS BIGINT) AS min_node,
       CAST(max(f{SCC_ROUNDS}.node) AS BIGINT) AS max_node
FROM f{SCC_ROUNDS} JOIN g{SCC_ROUNDS} ON f{SCC_ROUNDS}.node = g{SCC_ROUNDS}.node
GROUP BY 1, 2, 3 ORDER BY 1, 2
"""


# --- Rank-1 ALS matrix factorization (round 13) -----------------------------

ALS_ROUNDS = 3  # alternating (user, part) half-round pairs


def als_rank1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 alternating-least-squares matrix factorization of the
    (customer x part) purchase-count matrix — the collaborative-
    filtering rung of the model family (Koren-Bell-Volinsky 2009):
    r_cp ~ u_c * v_p, ALS_ROUNDS alternations of the exact rank-1
    updates u_c = sum_p r*v_p / sum_p v_p^2 (over the parts c rated)
    and the symmetric v_p update, from v = 1.

    Determinism: factors are micro-quantized after every half-round
    (uu = round(u * 1e6) as BIGINT), so every cross-row reduction is an
    exact integer sum — num = sum r * vu, den = sum vu * vu — and the
    division u = (num/1e6) / (den/1e12) is a fixed double DAG per key.
    Final fit: SSE terms round((r - u*v)^2 * 1e6) summed exactly.

    Output: one row — rating/user/part counts, the final train RMSE,
    and the extreme quantized factors (exact integer max/min).

    Scale: this IS the distributed ALS shape — each half-round is one
    shuffle of the ratings by the updated side's key with map-side
    combine (factor tables join in keyed, never broadcast-exploded);
    the rank-1 case needs no matrix solve, so nothing is driver-side.
    An incremental deployment maintains the (cust, part, cnt) counts
    (signed sums) and reruns the alternation tail."""
    from ..operators.checkpoints import release, tracked_local_checkpoint

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # materialize the ratings once — every half-round joins them, and
    # without the cut each of the 2*ALS_ROUNDS rounds would re-run the
    # orders x lineitem join (the bellman_ford edge-table discipline;
    # measured ~11 s -> ~3 s at sf0.01)
    r, _ = tracked_local_checkpoint(
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("r")),
        register=True,
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mq = lambda col: F.round(col * F.lit(1e6)).cast("bigint")  # noqa: E731

    def half(rat: DataFrame, fac: DataFrame, key: str, other: str) -> DataFrame:
        """One ALS half-round: update the ``key`` side's factor from the
        ``other`` side's quantized factors."""
        j = rat.join(fac, other)
        s = j.groupBy(key).agg(
            F.sum((F.col("r") * F.col("fu")).cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("num"),
            F.sum((F.col("fu") * F.col("fu")).cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("den"),
        )
        return s.select(
            key,
            mq((d("num") / F.lit(1e6)) / (d("den") / F.lit(1e12))).alias("fu"),
        )
    v = (
        r.select("p")
        .distinct()
        .select("p", F.lit(1_000_000).cast("bigint").alias("fu"))
    )
    # cut the factor lineage each half-round: the next half-round and
    # the final fit join these frames, and the unclipped plan doubles
    # per round (the NSW beam discipline). A frame is only released
    # once the frame that DEPENDS on it has itself been checkpointed.
    v_ids = u_ids = None
    for _ in range(ALS_ROUNDS):
        u, new_u_ids = tracked_local_checkpoint(
            half(r, v, "c", "p"), register=True
        )
        if u_ids is not None:
            release(spark, u_ids)
        u_ids = new_u_ids
        if v_ids is not None:
            release(spark, v_ids)
        v, v_ids = tracked_local_checkpoint(
            half(r, u, "p", "c"), register=True
        )
    u = u.select("c", F.col("fu").alias("uu"))
    v = v.select("p", F.col("fu").alias("vu"))
    fit = r.join(u, "c").join(v, "p")
    err = d("r") - (d("uu") / F.lit(1e6)) * (d("vu") / F.lit(1e6))
    rep = fit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ratings"),
        F.sum(mq(err * err).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("sseu"),
        F.countDistinct("c").cast("bigint").alias("n_users"),
        F.countDistinct("p").cast("bigint").alias("n_parts"),
        F.max("uu").cast("bigint").alias("max_uu"),
        F.min("uu").cast("bigint").alias("min_uu"),
        F.max("vu").cast("bigint").alias("max_vu"),
        F.min("vu").cast("bigint").alias("min_vu"),
    )
    return rep.select(
        "n_ratings",
        "n_users",
        "n_parts",
        F.round(F.sqrt(d("sseu") / F.lit(1e6) / d("n_ratings")), 6).alias(
            "train_rmse"
        ),
        "max_uu",
        "min_uu",
        "max_vu",
        "min_vu",
    )


def _als_sql() -> str:
    header = """
WITH rat AS (
  SELECT o_custkey AS c, l_partkey AS p, CAST(count(*) AS BIGINT) AS r
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2),
v0 AS (SELECT DISTINCT p, CAST(1000000 AS BIGINT) AS fu FROM rat)"""
    steps = []
    for t in range(1, ALS_ROUNDS + 1):
        steps.append(f""",
u{t} AS (
  SELECT c, CAST(round(((CAST(num AS DOUBLE) / 1000000.0)
                        / (CAST(den AS DOUBLE) / 1000000000000.0))
                 * 1000000.0) AS BIGINT) AS fu
  FROM (SELECT c, CAST(sum(r * fu) AS DECIMAL(38,0)) AS num,
               CAST(sum(fu * fu) AS DECIMAL(38,0)) AS den
        FROM rat JOIN v{t - 1} USING (p) GROUP BY c) s),
v{t} AS (
  SELECT p, CAST(round(((CAST(num AS DOUBLE) / 1000000.0)
                        / (CAST(den AS DOUBLE) / 1000000000000.0))
                 * 1000000.0) AS BIGINT) AS fu
  FROM (SELECT p, CAST(sum(r * fu) AS DECIMAL(38,0)) AS num,
               CAST(sum(fu * fu) AS DECIMAL(38,0)) AS den
        FROM rat JOIN u{t} USING (c) GROUP BY p) s)""")
    T = ALS_ROUNDS
    tail = f""",
fit AS (
  SELECT rat.r, u{T}.fu AS uu, v{T}.fu AS vu, rat.c, rat.p
  FROM rat JOIN u{T} USING (c) JOIN v{T} USING (p)),
rep AS (
  SELECT CAST(count(*) AS BIGINT) AS n_ratings,
         CAST(sum(CAST(round((CAST(r AS DOUBLE)
                  - (CAST(uu AS DOUBLE) / 1000000.0)
                    * (CAST(vu AS DOUBLE) / 1000000.0))
                 * (CAST(r AS DOUBLE)
                  - (CAST(uu AS DOUBLE) / 1000000.0)
                    * (CAST(vu AS DOUBLE) / 1000000.0))
                 * 1000000.0) AS BIGINT)) AS DECIMAL(38,0)) AS sseu,
         CAST(count(DISTINCT c) AS BIGINT) AS n_users,
         CAST(count(DISTINCT p) AS BIGINT) AS n_parts,
         CAST(max(uu) AS BIGINT) AS max_uu, CAST(min(uu) AS BIGINT) AS min_uu,
         CAST(max(vu) AS BIGINT) AS max_vu, CAST(min(vu) AS BIGINT) AS min_vu
  FROM fit)
SELECT n_ratings, n_users, n_parts,
       round(sqrt(CAST(sseu AS DOUBLE) / 1000000.0
                  / CAST(n_ratings AS DOUBLE)), 6) AS train_rmse,
       max_uu, min_uu, max_vu, min_vu
FROM rep"""
    return header + "".join(steps) + tail


# --- Soundex phonetic blocking (round 13) -----------------------------------

SDX_TOP = 20  # largest phonetic buckets reported


def soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking audit over the part-name vocabulary: American
    Soundex (Russell 1918; the blocking key every record-linkage stack
    ships next to edit-distance — here the phonetic rung beside
    rel_jaro_winkler_match / llm_fuzzy_match_levenshtein / the FS
    linkage blocker), computed as a PURE Catalyst expression (one
    translate + bounded replace passes, no UDF — functions/text.py
    soundex(), pinned to the textbook examples by pytest). Reports the
    SDX_TOP largest buckets — exactly the skew a soundex-blocked
    linkage join would see.

    Scale: one explode + distinct over the name vocabulary (bounded by
    the p_name word lattice, not the row count), a map-side-combining
    count, and a TakeOrderedAndProject top-20."""
    from ..functions.text import soundex

    w = (
        load(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    coded = w.select("w", soundex(F.col("w")).alias("sdx"))
    return (
        coded.groupBy("sdx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.min("w").alias("first_word"),
            F.max("w").alias("last_word"),
        )
        .orderBy(F.col("n_words").desc(), "sdx")
        .limit(SDX_TOP)
    )


def _soundex_blocking_sql() -> str:
    from ..functions.text import soundex_sql

    return f"""
WITH w AS (
  SELECT DISTINCT w FROM (
    SELECT unnest(string_split(p_name, ' ')) AS w FROM part) t
  WHERE w != ''),
c AS (SELECT w, {soundex_sql('w')} AS sdx FROM w)
SELECT sdx, CAST(count(*) AS BIGINT) AS n_words,
       min(w) AS first_word, max(w) AS last_word
FROM c GROUP BY sdx ORDER BY n_words DESC, sdx LIMIT {SDX_TOP}
"""


# --- HMM Viterbi scoring (round 13) -----------------------------------------

import math as _math

HMM_OBS_HI = 100.0  # observation split: event value >= this is "high"
# 2-state HMM with FIXED log-domain parameters (state 1 = low-activity,
# sticky; state 2 = high-activity): the parameters are part of the
# query's contract, the fixed-iteration-count convention.
_HMM = {
    "pi1": _math.log(0.5),
    "pi2": _math.log(0.5),
    "a11": _math.log(0.8),
    "a12": _math.log(0.2),
    "a21": _math.log(0.3),
    "a22": _math.log(0.7),
    "e10": _math.log(0.8),  # state 1 emits low with p=0.8
    "e11": _math.log(0.2),
    "e20": _math.log(0.3),  # state 2 emits high with p=0.7
    "e21": _math.log(0.7),
}


def hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Viterbi scoring under a fixed 2-state HMM (Viterbi 1967;
    Rabiner 1989 tutorial recursion) over the binarized event-value
    sequence — the latent-SEQUENCE rung of the model family next to
    rel_markov_stationary (which estimates a visible chain; this scores
    a hidden one): delta'_s = max_r(delta_r + ln a_rs) + ln e_s(o),
    folded left-to-right over each user's (ts, event_id)-ordered
    observations, reporting the max-path log-probability and the MAP
    final state (tie to state 1).

    Determinism: the recursion is the Holt ordered-fold device — both
    engines fold the IDENTICAL double expressions in the identical
    (epoch, event_id) order, all constants rendered through dlit; the
    DuckDB side carries the 2-value delta as a LIST (the documented
    DuckDB 1.0.0 struct-accumulator workaround) and the obs stream is
    pre-lifted to state-shaped [obs, 0.0] pairs so list_prepend's init
    stays type-homogeneous.

    Scale: one groupBy(user) with a per-user sort of THAT USER's events
    (collect_list + sort_array — bounded by per-user activity, never a
    global sort); the fold is executor-local."""
    p = {k: F.lit(v) for k, v in _HMM.items()}
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ob = (F.col("value") >= F.lit(HMM_OBS_HI)).cast("int")
    g = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        # load() canonicalizes events.ts to epoch-ns int64
                        F.col("ts").alias("t"),
                        F.col("event_id").alias("i"),
                        ob.alias("o"),
                    )
                )
            ),
            lambda e: e["o"],
        ).alias("ys"),
    )
    el = F.element_at
    o1 = el(F.col("ys"), 1)
    e1 = lambda o: F.when(o == 1, p["e11"]).otherwise(p["e10"])  # noqa: E731
    e2 = lambda o: F.when(o == 1, p["e21"]).otherwise(p["e20"])  # noqa: E731
    init = F.array(p["pi1"] + e1(o1), p["pi2"] + e2(o1))
    xs = F.transform(
        F.slice(F.col("ys"), 2, F.size(F.col("ys")) - 1),
        lambda o: F.array(o.cast("double"), F.lit(0.0)),
    )

    def step(acc: Column, x: Column) -> Column:
        o = el(x, 1)
        em1 = F.when(o == F.lit(1.0), p["e11"]).otherwise(p["e10"])
        em2 = F.when(o == F.lit(1.0), p["e21"]).otherwise(p["e20"])
        return F.array(
            F.greatest(el(acc, 1) + p["a11"], el(acc, 2) + p["a21"]) + em1,
            F.greatest(el(acc, 1) + p["a12"], el(acc, 2) + p["a22"]) + em2,
        )

    d = F.aggregate(xs, init, step)
    return (
        g.select("user_id", "n_events", d.alias("d"))
        .select(
            "user_id",
            "n_events",
            F.round(F.greatest(el(F.col("d"), 1), el(F.col("d"), 2)), 6).alias(
                "viterbi_logprob"
            ),
            F.when(el(F.col("d"), 1) >= el(F.col("d"), 2), F.lit(1))
            .otherwise(F.lit(2))
            .cast("int")
            .alias("map_state"),
        )
        .orderBy("user_id")
    )


def _hmm_sql() -> str:
    c = {k: dlit(v) for k, v in _HMM.items()}
    e1 = lambda o: f"(CASE WHEN {o} = 1 THEN {c['e11']} ELSE {c['e10']} END)"  # noqa: E731,E501
    e2 = lambda o: f"(CASE WHEN {o} = 1 THEN {c['e21']} ELSE {c['e20']} END)"  # noqa: E731,E501
    em1 = f"(CASE WHEN x[1] = CAST(1.0 AS DOUBLE) THEN {c['e11']} ELSE {c['e10']} END)"
    em2 = f"(CASE WHEN x[1] = CAST(1.0 AS DOUBLE) THEN {c['e21']} ELSE {c['e20']} END)"
    return f"""
WITH seq AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         list(CASE WHEN value >= {dlit(HMM_OBS_HI)} THEN 1 ELSE 0 END
              ORDER BY epoch_ns(ts), event_id) AS ys
  FROM events WHERE value IS NOT NULL GROUP BY user_id),
fit AS (
  SELECT user_id, n_events,
         list_reduce(
           list_prepend(
             [{c['pi1']} + {e1('ys[1]')}, {c['pi2']} + {e2('ys[1]')}],
             list_transform(ys[2:], o -> [CAST(o AS DOUBLE),
                                          CAST(0.0 AS DOUBLE)])),
           (acc, x) -> [
             greatest(acc[1] + {c['a11']}, acc[2] + {c['a21']}) + {em1},
             greatest(acc[1] + {c['a12']}, acc[2] + {c['a22']}) + {em2}])
           AS d
  FROM seq)
SELECT user_id, n_events,
       round(greatest(d[1], d[2]), 6) AS viterbi_logprob,
       CAST(CASE WHEN d[1] >= d[2] THEN 1 ELSE 2 END AS INTEGER) AS map_state
FROM fit ORDER BY user_id
"""


_SPECS: list[tuple[str, object, str | None]] = [
    ("rel_stats_moments", stats_moments, STATS_MOMENTS_SQL),
    ("rel_salted_join_agg", salted_join_agg, SALTED_JOIN_SQL),
    ("rel_agg_median_argmax", agg_median_argmax, MEDIAN_ARGMAX_SQL),
    ("rel_win_frames", win_frames, WIN_FRAMES_SQL),
    ("rel_string_funcs2", string_funcs2, STRING2_SQL),
    ("rel_date_funcs2", date_funcs2, DATE2_SQL),
    ("rel_array_funcs2", array_funcs2, ARRAY2_SQL),
    ("rel_q1_pricing_summary", q1_pricing_summary, Q1_SQL),
    ("rel_q3_top_orders", q3_top_orders, Q3_SQL),
    ("rel_q5_nation_revenue", q5_nation_revenue, Q5_SQL),
    ("rel_agg_stats", agg_stats, AGG_STATS_SQL),
    ("rel_agg_count_distinct", agg_count_distinct, AGG_CD_SQL),
    ("rel_agg_cube", agg_cube, AGG_CUBE_SQL),
    ("rel_agg_rollup", agg_rollup, AGG_ROLLUP_SQL),
    ("rel_agg_grouping_sets", agg_grouping_sets, AGG_GSETS_SQL),
    ("rel_histogram_bucket", histogram_bucket, HISTOGRAM_SQL),
    ("rel_pivot_status", pivot_status, PIVOT_SQL),
    ("rel_unpivot_balances", unpivot_balances, UNPIVOT_SQL),
    ("rel_join_left_outer", join_left_outer, JOIN_LEFT_SQL),
    ("rel_join_right_outer", join_right_outer, JOIN_RIGHT_SQL),
    ("rel_join_full_outer", join_full_outer, JOIN_FULL_SQL),
    ("rel_join_semi", join_semi, JOIN_SEMI_SQL),
    ("rel_join_anti", join_anti, JOIN_ANTI_SQL),
    ("rel_join_cross", join_cross, JOIN_CROSS_SQL),
    ("rel_win_topk_orders", win_topk_orders, WIN_TOPK_SQL),
    ("rel_win_rank", win_rank, WIN_RANK_SQL),
    ("rel_win_lag_lead", win_lag_lead, WIN_LAG_SQL),
    ("rel_win_running_sum", win_running_sum, WIN_RUNSUM_SQL),
    ("rel_win_moving_avg", win_moving_avg, WIN_MAVG_SQL),
    ("rel_win_arg_max", win_arg_max, WIN_ARGMAX_SQL),
    ("rel_sort_limit_topk", sort_limit_topk, SORT_LIMIT_SQL),
    ("rel_set_union", set_union, SET_UNION_SQL),
    ("rel_set_intersect", set_intersect, SET_INTERSECT_SQL),
    ("rel_set_except", set_except, SET_EXCEPT_SQL),
    ("rel_distinct_pairs", distinct_pairs, DISTINCT_SQL),
    ("rel_string_funcs", string_funcs, STRING_SQL),
    ("rel_date_funcs", date_funcs, DATE_SQL),
    ("rel_from_unixtime", from_unixtime_roundtrip, FROM_UNIXTIME_SQL),
    ("rel_math_funcs", math_funcs, MATH_SQL),
    ("rel_conditional_case", conditional_case, CASE_SQL),
    ("rel_null_handling", null_handling, NULL_SQL),
    ("rel_array_funcs", array_funcs, ARRAY_SQL),
    ("rel_explode_wordcount", explode_wordcount, EXPLODE_SQL),
    ("rel_json_funcs", json_funcs, JSON_SQL),
    ("rel_subquery_scalar", subquery_scalar, SUBQ_SCALAR_SQL),
    ("rel_subquery_in", subquery_in, SUBQ_IN_SQL),
    ("rel_subquery_exists", subquery_exists_correlated, SUBQ_EXISTS_SQL),
    ("rel_asof_join", asof_join, ASOF_SQL),
    ("rel_time_bucket_agg", time_bucket_agg, TIME_BUCKET_SQL),
    ("rel_approx_distinct", approx_distinct, APPROX_DISTINCT_SQL),
    ("rel_from_json_struct", from_json_struct, FROM_JSON_SQL),
    ("rel_range_bucket_join", range_bucket_join, RANGE_BUCKET_SQL),
    ("rel_percentiles_exact", percentiles_exact, PERCENTILES_SQL),
    ("rel_quantile_sketch", quantile_sketch, _quantile_sketch_sql()),
    ("rel_rfm_sketch_boundaries", rfm_sketch_boundaries, _rfm_sketch_sql()),
    ("rel_map_funcs", map_funcs, MAP_SQL),
    ("rel_higher_order", higher_order_funcs, HOF_SQL),
    ("rel_q4_priority_exists", q4_priority_exists, Q4_SQL),
    ("rel_q6_revenue_band", q6_revenue_band, Q6_SQL),
    ("rel_q10_returned_revenue", q10_returned_revenue, Q10_SQL),
    ("rel_q12_priority_counts", q12_priority_counts, Q12_SQL),
    ("rel_q14_promo_share", q14_promo_share, Q14_SQL),
    ("rel_q18_large_orders", q18_large_orders, Q18_SQL),
    ("rel_q19_bracket_predicates", q19_bracket_predicates, Q19_SQL),
    ("rel_q7_volume_shipping", q7_volume_shipping, Q7_SQL),
    ("rel_q8_market_share", q8_market_share, Q8_SQL),
    ("rel_q9_product_profit", q9_product_profit, Q9_SQL),
    ("rel_q13_customer_distribution", q13_customer_distribution, Q13_SQL),
    ("rel_q15_top_supplier", q15_top_supplier, Q15_SQL),
    ("rel_q16_supplier_part_counts", q16_supplier_part_counts, Q16_SQL),
    ("rel_q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL),
    ("rel_q22_global_sales_opportunity", q22_global_sales_opportunity, Q22_SQL),
    ("rel_win_distribution_funcs", win_distribution_funcs, WIN_DIST_SQL),
    ("rel_merge_upsert", merge_upsert, MERGE_SQL),
    ("rel_q21_sole_blame", q21_sole_blame, Q21_SQL),
    ("rel_q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL),
    ("rel_q11_important_stock", q11_important_stock, Q11_SQL),
    ("rel_q20_excess_shippers", q20_excess_shippers, Q20_SQL),
    ("rel_ordered_collect", ordered_collect, ORDERED_COLLECT_SQL),
    ("rel_generator_outer", generator_outer, GENERATOR_OUTER_SQL),
    ("rel_bitwise_funcs", bitwise_funcs, BITWISE_SQL),
    ("rel_try_arithmetic", try_arithmetic, TRY_ARITH_SQL),
    ("rel_group_by_all", group_by_all, GROUP_BY_ALL_SQL),
    ("rel_agg_filter_clause", agg_filter_clause, AGG_FILTER_SQL),
    ("rel_lateral_column_alias", lateral_column_alias, LATERAL_ALIAS_SQL),
    ("rel_values_inline", values_inline, VALUES_INLINE_SQL),
    ("rel_win_range_interval", win_range_interval, WIN_RANGE_INTERVAL_SQL),
    ("rel_limit_offset", limit_offset_page, LIMIT_OFFSET_SQL),
    ("rel_asof_join_forward", asof_join_forward, ASOF_FORWARD_SQL),
    ("rel_robust_stats_mad", robust_stats_mad, MAD_SQL),
    ("rel_win_ignore_nulls", win_ignore_nulls, WIN_IGNORE_NULLS_SQL),
    ("rel_join_null_safe", join_null_safe, JOIN_NULL_SAFE_SQL),
    ("rel_date_spine_gapfill", date_spine_gapfill, DATE_SPINE_SQL),
    ("rel_posexplode_inline", posexplode_inline, POSEXPLODE_SQL),
    ("rel_hll_partial_merge", hll_partial_merge, HLL_PARTIAL_SQL),
    ("rel_scd2_order_status", scd2_order_status, SCD2_SQL),
    ("rel_recursive_cte_hierarchy", recursive_cte_hierarchy, RECURSIVE_CTE_SQL),
    ("rel_shortest_path", shortest_path, _shortest_path_sql()),
    ("rel_shortest_path_k_audit", shortest_path_k_audit, _shortest_path_k_audit_sql()),
    ("rel_label_propagation", label_propagation_communities, _label_propagation_sql()),
    ("rel_pagerank", pagerank_copurchase, _pagerank_sql()),
    ("rel_kcore_decomposition", kcore_decomposition, _kcore_sql()),
    ("rel_core_numbers", core_numbers_copurchase, _core_numbers_sql()),
    ("rel_two_hop_recs", two_hop_recs, _two_hop_recs_sql()),
    ("rel_decayed_trending", decayed_trending, DECAYED_TRENDING_SQL),
    ("rel_kmv_distinct", kmv_distinct, KMV_SQL),
    ("rel_ams_f2_sketch", ams_f2_sketch, _ams_f2_sql()),
    ("rel_position_attribution", position_attribution, POSITION_ATTRIBUTION_SQL),
    ("rel_ols_regression", ols_regression, OLS_SQL),
    ("rel_ridge_regression", ridge_regression, RIDGE_SQL),
    ("rel_kmv_set_ops", kmv_set_ops, KMV_SETOP_SQL),
    ("rel_poisson_bootstrap_ci", poisson_bootstrap_ci, POISSON_BOOTSTRAP_SQL),
    ("rel_seasonal_decompose", seasonal_decompose, SEASONAL_SQL),
    ("rel_table_profile", table_profile, _table_profile_sql()),
    ("rel_numeric_summary", numeric_summary, NUMERIC_SUMMARY_SQL),
    ("rel_mann_whitney", mann_whitney, MANN_WHITNEY_SQL),
    ("rel_changepoint_binseg", changepoint_binseg, CHANGEPOINT_SQL),
    ("rel_chi_square_independence", chi_square_independence, CHI_SQUARE_SQL),
    ("rel_spearman_corr", spearman_corr, SPEARMAN_SQL),
    ("rel_autocorrelation", autocorrelation, ACF_SQL),
    ("rel_theil_sen", theil_sen, THEIL_SEN_SQL),
    ("rel_theil_sen_sampled", theil_sen_sampled, THEIL_SEN_SAMPLED_SQL),
    ("rel_kendall_sampled", kendall_sampled, KENDALL_SAMPLED_SQL),
    ("rel_gini_concentration", gini_concentration, _gini_sql()),
    ("rel_kaplan_meier", kaplan_meier, KAPLAN_MEIER_SQL),
    ("rel_markov_stationary", markov_stationary, _markov_sql()),
    ("rel_kendall_tau", kendall_tau, KENDALL_SQL),
    ("rel_python_udtf_expand", python_udtf_expand, PYTHON_UDTF_SQL),
    ("rel_variant_json", variant_json, VARIANT_SQL),
    ("rel_dq_checks", dq_checks, DQ_CHECKS_SQL),
    ("rel_ab_test_zscore", ab_test_zscore, AB_TEST_SQL),
    ("rel_ks_two_sample", ks_two_sample, KS_TWO_SAMPLE_SQL),
    ("rel_auc_roc", auc_roc, AUC_ROC_SQL),
    ("rel_lift_gain", lift_gain, LIFT_GAIN_SQL),
    ("rel_kruskal_wallis", kruskal_wallis, _kw_sql()),
    ("rel_cusum_drift", cusum_drift, CUSUM_SQL),
    ("rel_cv_ridge", cv_ridge, _cv_ridge_sql()),
    ("rel_logistic_irls", logistic_irls, _logistic_sql()),
    ("rel_boosted_stumps", boosted_stumps, _boosted_stumps_sql()),
    ("rel_permutation_test", permutation_test, _perm_test_sql()),
    ("rel_gaussian_mixture_em", gaussian_mixture_em, _gmm_sql()),
    ("rel_scc_minlabel", scc_minlabel, _scc_sql()),
    ("rel_als_rank1", als_rank1, _als_sql()),
    ("rel_soundex_blocking", soundex_blocking, _soundex_blocking_sql()),
    ("rel_cv_lambda_select", cv_lambda_select, _cv_lambda_sql()),
    ("rel_hmm_viterbi", hmm_viterbi, _hmm_sql()),
    ("rel_bh_fdr", bh_fdr, _bh_fdr_sql()),
    ("rel_conformal_interval", conformal_interval, CONFORMAL_SQL),
    ("rel_ips_offline_eval", ips_offline_eval, IPS_EVAL_SQL),
    ("rel_dr_offline_eval", dr_offline_eval, DR_EVAL_SQL),
    ("rel_funnel_steps", funnel_steps, FUNNEL_SQL),
    ("rel_cohort_retention", cohort_retention, COHORT_SQL),
    ("rel_k_anonymity", k_anonymity, K_ANONYMITY_SQL),
    ("rel_fs_record_linkage", fs_record_linkage, _fs_linkage_sql()),
    ("rel_jaro_winkler_match", jaro_winkler_match, _JW_MATCH_SQL),
    ("rel_t_closeness", t_closeness, T_CLOSENESS_SQL),
    ("rel_privacy_release_gate", privacy_release_gate, PRIVACY_GATE_SQL),
    ("rel_holt_forecast", holt_forecast, _holt_sql()),
    ("rel_holt_winters", holt_winters_forecast, _holt_winters_sql()),
    ("rel_tseries_motif", tseries_motif, TSERIES_MOTIF_SQL),
    ("rel_gaps_islands", gaps_islands, GAPS_ISLANDS_SQL),
    ("rel_ewma_per_user", ewma_per_user, EWMA_SQL),
    ("rel_interval_overlap_join", interval_overlap_join, INTERVAL_OVERLAP_SQL),
    ("rel_first_touch_attribution", first_touch_attribution, FIRST_TOUCH_SQL),
    ("rel_skew_diagnostics", skew_diagnostics, _skew_diagnostics_sql()),
    ("rel_time_weighted_avg", time_weighted_avg, TIME_WEIGHTED_AVG_SQL),
    ("rel_keyset_pagination", keyset_pagination, KEYSET_SQL),
    ("rel_market_basket", market_basket, MARKET_BASKET_SQL),
    ("rel_zorder_layout", zorder_layout, _zorder_sql()),
    ("rel_skyline_frontier", skyline_frontier, SKYLINE_SQL),
    ("rel_user_erasure_audit", user_erasure_audit, USER_ERASURE_SQL),
    ("rel_ewma_anomaly_flags", ewma_anomaly_flags, EWMA_ANOM_SQL),
    ("rel_session_paths", session_paths, SESSION_PATHS_SQL),
    ("rel_seq_pattern_match", seq_pattern_match, _seq_pattern_sql()),
    ("rel_dp_noisy_counts", dp_noisy_counts, _dp_counts_sql()),
    ("rel_clamped_running_balance", clamped_running_balance, CLAMPED_BALANCE_SQL),
    ("rel_max_concurrency", max_concurrency, MAX_CONCURRENCY_SQL),
    ("rel_rfm_segments", rfm_segments, _rfm_sql()),
    ("rel_l_diversity", l_diversity, L_DIVERSITY_SQL),
    ("rel_benford_audit", benford_audit, BENFORD_SQL),
    ("rel_fifo_matching", fifo_matching, FIFO_SQL),
]


def queries() -> dict:
    return {name: fn for name, fn, _ in _SPECS}


def oracles() -> dict:
    return {name: sql for name, _, sql in _SPECS if sql is not None}
