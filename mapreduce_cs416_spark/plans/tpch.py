"""Classic TPC-H query shapes over the driver's TPC-H-ish tables.

The reference has no SQL surface at all — every one of these would
have to be hand-written as a Map/Reduce pair on its A-layer dataflow
(SURVEY.md §2.C calls the whole relational layer "composable").
This module pins down the remaining classic decision-support shapes
that plans/relational.py's q1/q3/q5/q17 don't already cover:
single-pass filtered aggregation (Q6), conditional-aggregation
ratios (Q8/Q14), multi-join year rollups (Q7/Q9), group-by-having
semi joins (Q18), disjunctive multi-attribute predicates (Q19),
EXISTS probes with interval arithmetic (Q4), distribution histograms
(Q13), argmax-by-scalar-subquery (Q15), top-k revenue accounting
(Q10), and anti-join prospect screening (Q22).

The driver testdata omits a few TPC-H columns (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone/o_comment); queries
that touch those are *adaptations* — same plan shape and operator mix,
predicates rewritten to the columns that exist. Each docstring says
which. Q2/Q11/Q16/Q20 run against a deterministic partsupp SYNTHESIS
derived from lineitem (``_partsupp`` below), which keeps their
canonical shapes (correlated min subquery, share-of-total HAVING,
NOT-IN distinct counts, nested semi joins) hash-oracle-checkable.
With q1/q3/q5/q17 in plans/relational.py, all 22 TPC-H shapes are
covered.

Scale notes common to all: nation/region are constant-size →
explicit broadcast; supplier/part/customer GROW with SF, so their
join strategy is left to Catalyst/AQE rather than force-broadcast
(at 100 TB a forced customer broadcast would OOM every executor).
Double sums go through DECIMAL(25,6) (functions/numeric) so shuffle
order can't perturb the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, decimal_sum, sql_decimal_sum
from ..sources.tables import load_table
from .spec import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------------ Q4
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: EXISTS + interval math.

    Adaptation: the canonical predicate l_commitdate < l_receiptdate
    uses columns the testdata omits; the stand-in "late line" test is
    l_shipdate > o_orderdate + 30 days — same shape (correlated
    EXISTS against lineitem with a per-row interval comparison).
    Spark plans the EXISTS as a left-semi hash join on o_orderkey;
    the quarter filter is pushed into the orders scan.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count")).orderBy(
        "o_orderpriority"
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------------ Q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-pass filtered aggregation, no join at all.

    The whole query is scan → filter → one-row agg; all three
    predicates (shipdate year, discount band, quantity cap) push into
    the parquet scan, so at 100 TB this reads only row groups whose
    min/max stats overlap the year. The one-row result needs no
    shuffle beyond the partial-agg merge.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


Q6_SQL = f"""
SELECT {sql_decimal_sum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------------------ Q7
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    lineitem⋈supplier and orders⋈customer resolve each side's nation;
    the (supp, cust) nation pair is filtered to the two trade
    directions. nation is broadcast twice under distinct aliases;
    the only large shuffle is lineitem⋈orders on orderkey. The
    disjunctive nation-pair predicate is applied after both dimension
    joins — it needs columns from both sides, so no earlier placement
    is possible, but each nation join itself already filtered to the
    two named nations keeps the surviving rows tiny.
    """
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    supp = _t(spark, sf_dir, "supplier").join(n1, F.col("s_nationkey") == F.col("s_nk"))
    cust = _t(spark, sf_dir, "customer").join(n2, F.col("c_nationkey") == F.col("c_nk"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(decimal_sum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_decimal_sum('volume')} AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ------------------------------------------------------------------ Q8
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: a nation's market share inside one region by year —
    conditional-aggregation ratio over a 6-way star join.

    The share is sum(volume if supplier is NATION_5)/sum(volume),
    both sums through DECIMAL(25,6) and divided as doubles so Spark
    and the oracle produce bit-identical ratios. region/nation
    broadcast; part's PROMO filter prunes the fact join early.
    """
    region = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    # customer-side nation restricted to the ASIA region
    n_cust = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    n_supp = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer").join(n_cust, F.col("c_nationkey") == F.col("c_nk"))
    supp = _t(spark, sf_dir, "supplier").join(n_supp, F.col("s_nationkey") == F.col("s_nk"))
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(target.cast(DEC)).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END
                     AS DECIMAL(25,6))) AS DOUBLE)
       / CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DOUBLE) AS mkt_share
FROM (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region    ON r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA'
      AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------------------------------ Q9
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-profit rollup by nation and year.

    Adaptation: canonical Q9 subtracts ps_supplycost (partsupp is not
    in the testdata), so profit here is revenue
    l_extendedprice*(1-l_discount); the plan shape — LIKE-filtered
    part join, supplier→nation resolution, group by (nation, year) —
    is Q9's. The p_name LIKE '%gear%' filter (canonical Q9 uses
    '%green%'; testdata names are adjective+noun pairs) can't push
    below the scan as a range, but Catalyst still prunes part to
    (p_partkey) after the filter, keeping the broadcast tiny.
    """
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")).select("p_partkey")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
        )
    )
    supp = _t(spark, sf_dir, "supplier").join(nation, F.col("s_nationkey") == F.col("s_nk"))
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        joined.select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(decimal_sum(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT nation, o_year, {sql_decimal_sum('amount')} AS sum_profit
FROM (
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS amount
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ------------------------------------------------------------------ Q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top 20 customers by revenue lost to returns in a
    quarter. orders' quarter filter and lineitem's returnflag filter
    both push to the scans; the orderkey join is the one shuffle; the
    final top-20 is a TakeOrdered with a full tie-break on c_custkey.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_decimal_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------------------ Q13
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution (histogram of a
    histogram). Adaptation: canonical Q13 excludes orders by an
    o_comment pattern (column absent); the stand-in exclusion is
    o_orderpriority = '4-NOT SPECIFIED' — same left-outer +
    filtered-join-condition shape, so customers with zero qualifying
    orders still appear in the c_count=0 bucket.

    Two aggregations: per-customer count (shuffle on custkey), then
    the tiny distribution over counts.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------------ Q14
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of a month's revenue from PROMO parts —
    a conditional-aggregation ratio over one join. part joins on
    partkey (Catalyst decides broadcast vs shuffle as it grows with
    SF); the month filter pushes into the lineitem scan. Numerator
    and denominator both go through DECIMAL(25,6).
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast(DEC)).cast("double")
            / F.sum(vol.cast(DEC)).cast("double")
        ).alias("promo_revenue")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# ------------------------------------------------------------------ Q15
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue — argmax
    via scalar subquery. The revenue rollup (shuffle on suppkey) is
    computed once and reused for both the max (one-row agg,
    broadcast) and the equality probe, mirroring the CTE reuse in the
    SQL; ties all surface (no LIMIT), so the result is deterministic
    without a tie-break.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = F.broadcast(revenue.agg(F.max("total_revenue").alias("mx")))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(top, revenue.total_revenue == top.mx)
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {sql_decimal_sum('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------------------------------------ Q18
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order whose total quantity
    exceeds 300 — group-by-HAVING feeding a semi join.

    The HAVING rollup shuffles lineitem once on orderkey; qualifying
    orderkeys are few → broadcast semi join back onto orders, then
    the customer join. The outer sum re-aggregates lineitem for the
    surviving orders only.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    cust = _t(spark, sf_dir, "customer")
    li2 = li.select(F.col("l_orderkey").alias("lk"), "l_quantity")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li2, orders.o_orderkey == F.col("lk"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 300)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ------------------------------------------------------------------ Q19
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue under an OR-of-ANDs predicate
    spanning both join sides (brand × size × quantity bands).

    Adaptation: canonical Q19 also tests l_shipmode/l_shipinstruct
    (absent); the brand/size/quantity band structure is kept. The
    p_partkey = l_partkey equi-condition stays conjunctive, so
    Catalyst still plans a hash join and evaluates the disjunction as
    a post-join filter; each AND-arm's part-side conjuncts
    (brand, size) could prune the build side at planning time.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    arm2 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    arm3 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return joined.where(arm1 | arm2 | arm3).agg(
        decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


Q19_SQL = f"""
SELECT {sql_decimal_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ------------------------------------------------------------------ Q22
def q22_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: well-funded customers with no recent orders.

    Adaptation: canonical Q22 buckets by phone country code (absent)
    — bucketing here is by nation; the operator mix is Q22's: scalar
    subquery (average positive balance, computed once and broadcast),
    anti join against recent orders, and a grouped rollup of the
    survivors. At scale the anti join shuffles on custkey while the
    scalar is a one-row broadcast — no driver round-trip.
    """
    cust = _t(spark, sf_dir, "customer")
    avg_bal = F.broadcast(
        cust.where(F.col("c_acctbal") > 0.0).agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
            ).alias("avg_bal")
        )
    )
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    rich = cust.crossJoin(avg_bal).where(F.col("c_acctbal") > F.col("avg_bal"))
    quiet = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        quiet.join(nation, quiet.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = """
SELECT n_name, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY n_name
"""


# ------------------------------------------------- synthesized partsupp
# The testdata ships no partsupp table; the four partsupp queries
# (Q2/Q11/Q16/Q20) run against this deterministic derivation instead:
# one row per observed (partkey, suppkey) with the minimum unit price
# as ps_supplycost and total shipped quantity as ps_availqty. min()
# over doubles is exact and order-independent; the quantity sum goes
# through DECIMAL, so the derivation carries a hash-exact oracle and
# the downstream queries keep canonical TPC-H plan shapes (the
# derivation itself is one extra shuffle on (partkey, suppkey)).
def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        decimal_sum(F.col("l_quantity"), "ps_availqty"),
    )


PS_CTE = f"""
partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost,
           {sql_decimal_sum('l_quantity')} AS ps_availqty
    FROM lineitem GROUP BY 1, 2
)"""


# ------------------------------------------------------------------ Q2
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier per part in a region.

    Adaptation: partsupp is the lineitem-derived synthesis (_partsupp);
    p_type is an exact match ('STANDARD' — testdata types are single
    words, canonical is a '%BRASS' suffix). The shape is canonical:
    part filter → partsupp → supplier → nation → broadcast region,
    with the correlated min-cost-per-part subquery planned as a window
    over ps_partkey (one pass, no self-join re-scan); equality on the
    exact double min keeps every tied supplier, as SQL does. nation ⋈
    region collapses to a broadcast; the filtered part set (~1/300 of
    part) broadcasts into the partsupp probe, so the only large
    shuffles are the partsupp derivation and the per-part window.
    """
    from pyspark.sql import Window

    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        nation, F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    eligible = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(part.select("p_partkey", "p_name")), F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 6).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH {PS_CTE}
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       round(ps_supplycost, 6) AS supplycost
FROM partsupp
JOIN part     ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND ps_supplycost = (
      SELECT min(ps.ps_supplycost)
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE ps.ps_partkey = p_partkey AND r.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ------------------------------------------------------------------ Q11
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one
    nation's stock value.

    partsupp is the lineitem-derived synthesis; the shape is
    canonical: per-part value sums over one nation's suppliers,
    HAVING sum above a share-of-stock threshold — the threshold is a
    one-row aggregate broadcast into the filter (no driver
    round-trip, no second scan of the grouped data). value =
    ps_supplycost × ps_availqty per row, summed through DECIMAL so
    the driver hash is partition-order-proof. The threshold is 3× the
    mean per-part value (canonical uses fraction 0.0001/SF of the
    total, but a FIXED fraction is vacuous away from its tuned SF —
    the mean-relative form is non-vacuous at every SF: 5/16/192 rows
    at sf0.001/0.01/0.1; the mean itself is decimal-exact, so the
    comparison is engine-identical).
    """
    nation = F.broadcast(_t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3"))
    supp = _t(spark, sf_dir, "supplier").join(
        nation, F.col("s_nationkey") == F.col("n_nationkey")
    )
    ps = _partsupp(spark, sf_dir).join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    grouped = ps.groupBy("ps_partkey").agg(decimal_sum(value, "part_value"))
    thresh = F.broadcast(
        grouped.agg(
            (F.sum(F.col("part_value").cast(DEC)).cast("double") / F.count("*")).alias("avg_value")
        )
    )
    return (
        grouped.crossJoin(thresh)
        .where(F.col("part_value") > F.col("avg_value") * 3.0)
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


Q11_SQL = f"""
WITH {PS_CTE},
nat AS (
    SELECT ps_partkey, ps_supplycost * ps_availqty AS value
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
),
g AS (
    SELECT ps_partkey, {sql_decimal_sum('value')} AS part_value
    FROM nat
    GROUP BY ps_partkey
)
SELECT ps_partkey, part_value
FROM g
WHERE part_value > (SELECT {sql_decimal_sum('part_value')} / count(*) FROM g) * 3.0
ORDER BY part_value DESC, ps_partkey
"""


# ------------------------------------------------------------------ Q12
def q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: priority mix of late shipments by line class.

    Adaptation: l_shipmode / l_commitdate / l_receiptdate are absent —
    the class column is l_returnflag and "late" is l_shipdate more
    than 60 days after o_orderdate (cf. q4's stand-in). The operator
    mix is canonical Q12: one orders⋈lineitem equi-join (the only
    shuffle; both date predicates push into the lineitem scan side
    where possible), then conditional aggregation splitting counts by
    order priority.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("line_class")
    )


Q12_SQL = """
SELECT l_returnflag AS line_class,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
           AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------------------------------ Q16
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size)
    for an excluded-brand part subset, minus blacklisted suppliers.

    Adaptation: partsupp is the lineitem-derived synthesis and the
    supplier blacklist is s_acctbal < 0 (canonical: comment LIKE
    '%Customer%Complaints%' on a column the testdata omits). Shape is
    canonical: NOT-IN planned as a broadcast anti join (the blacklist
    is a scalar-filtered projection of supplier), part filter pushed
    to the scan, then count(DISTINCT ps_suppkey) per group — a
    two-level agg (dedup then count) in one shuffle cycle.
    """
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(bad_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
    )
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
WITH {PS_CTE}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------------ Q20
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one region holding excess stock of a
    name-filtered part family.

    Adaptation: partsupp is the lineitem-derived synthesis, so
    ps_availqty (all-time shipped quantity) stands in for stock on
    hand; "excess" is availqty > 2× the 1997 shipped quantity of the
    same (part, supplier); geography is region-level (EUROPE — a
    single test nation holds too few suppliers to be non-vacuous at
    sf0.001: 4/13/19 rows at sf0.001/0.01/0.1). Shape is canonical
    Q20: part-name semi filter → correlated per-(part,supp) quantity
    subquery (an aggregated equi-join, not a re-scan per row) →
    supplier semi join → broadcast nation⋈region. The 1997 aggregate
    joins INNER, matching SQL's NULL-comparison semantics for pairs
    with no 1997 shipments.
    """
    part_keys = (
        _t(spark, sf_dir, "part").where(F.col("p_name").like("blue%")).select("p_partkey")
    )
    qty97 = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("q_partkey"), F.col("l_suppkey").alias("q_suppkey"))
        .agg(decimal_sum(F.col("l_quantity"), "qty_1997"))
    )
    excess = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(part_keys), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            qty97,
            (F.col("ps_partkey") == F.col("q_partkey"))
            & (F.col("ps_suppkey") == F.col("q_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("qty_1997") * 2.0)
        .select("ps_suppkey")
    )
    nation = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH {PS_CTE}
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
        AND ps_availqty > 2.0 * (
            SELECT {sql_decimal_sum('l_quantity')}
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'))
ORDER BY s_name
"""


# ------------------------------------------------------------------ Q21
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late supplier on
    multi-supplier finalized orders — the heaviest classic shape: a
    triple self-join on the fact table with one semi and one anti arm.

    Adaptation: "late" is l_shipdate > o_orderdate + 30 days
    (l_commitdate/l_receiptdate are absent, cf. q4/q12) and the
    supplier geography filter is region EUROPE (nation-level on 100
    test suppliers leaves ~4). Shape is canonical Q21: late lines of
    'F' orders ⋈ supplier(region) as the probe; EXISTS another
    supplier on the order → left-semi self-join on (orderkey,
    suppkey≠); NOT EXISTS another LATE supplier → left-anti against
    the late set. All three arms share the orderkey shuffle key, so
    AQE plans them as one exchange reused three times, and the late
    set (date-filtered) is the small side of both probes.
    """
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation")
                .join(
                    _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    orders_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.join(supp, late.l_suppkey == supp.s_suppkey)
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM late l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# no driver-window entries — the 50-slot CORRECTNESS window is full
# and already covers every operator family; these widen the oracled
# surface via tests/test_parity.py (and tools/check_parity --extra).
QUERIES: dict[str, QuerySpec] = {}

EXTRA_QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL, q4_order_priority.__doc__, tags=("tpch", "exists", "join")),
        QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, q6_forecast_revenue.__doc__, tags=("tpch", "scan", "agg")),
        QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL, q7_volume_shipping.__doc__, tags=("tpch", "join", "agg")),
        QuerySpec("q8_market_share", q8_market_share, Q8_SQL, q8_market_share.__doc__, tags=("tpch", "join", "agg")),
        # headline: the join-heaviest warehouse shape in the bench set
        # (4-way fact join + year rollup) — VERDICT r4 item 7
        QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL, q9_product_profit.__doc__, headline=True, tags=("tpch", "join", "agg")),
        QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL, q10_returned_items.__doc__, tags=("tpch", "join", "topk")),
        QuerySpec("q13_customer_distribution", q13_customer_distribution, Q13_SQL, q13_customer_distribution.__doc__, tags=("tpch", "outer-join", "agg")),
        QuerySpec("q14_promo_effect", q14_promo_effect, Q14_SQL, q14_promo_effect.__doc__, tags=("tpch", "join", "agg")),
        QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL, q15_top_supplier.__doc__, tags=("tpch", "subquery", "argmax")),
        QuerySpec("q18_large_volume_customer", q18_large_volume_customer, Q18_SQL, q18_large_volume_customer.__doc__, tags=("tpch", "having", "semi-join")),
        QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL, q19_disjunctive_revenue.__doc__, tags=("tpch", "join", "predicate")),
        QuerySpec("q22_prospects", q22_prospects, Q22_SQL, q22_prospects.__doc__, tags=("tpch", "anti-join", "subquery")),
        QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL, q2_min_cost_supplier.__doc__, tags=("tpch", "join", "subquery", "window")),
        QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL, q11_important_stock.__doc__, tags=("tpch", "agg", "having", "subquery")),
        QuerySpec("q12_late_lines_by_class", q12_late_lines_by_class, Q12_SQL, q12_late_lines_by_class.__doc__, tags=("tpch", "join", "agg")),
        QuerySpec("q16_part_supplier_counts", q16_part_supplier_counts, Q16_SQL, q16_part_supplier_counts.__doc__, tags=("tpch", "anti-join", "distinct", "agg")),
        QuerySpec("q20_excess_stock_suppliers", q20_excess_stock_suppliers, Q20_SQL, q20_excess_stock_suppliers.__doc__, tags=("tpch", "semi-join", "subquery")),
        # headline: triple self-join on the fact table (semi + anti arms)
        QuerySpec("q21_suppliers_kept_waiting", q21_suppliers_kept_waiting, Q21_SQL, q21_suppliers_kept_waiting.__doc__, headline=True, tags=("tpch", "join", "semi-join", "anti-join")),
    ]
}
