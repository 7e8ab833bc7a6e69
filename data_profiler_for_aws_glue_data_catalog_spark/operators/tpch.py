"""TPC-H-adapted relational query suite over the driver testdata.

The reference app's relational surface is a single left-equi-join over a
tiny metrics frame (SURVEY §2.B); a user replacing it with this engine
still needs the full ANSI join/subquery repertoire for ad-hoc analysis of
the profiled tables.  This module exercises every join strategy the
engine must plan well at 100 TB:

- broadcast-dim star joins (q3, q5, q10): the fact table (`lineitem`)
  never shuffles for dimension attachment — every dim side is hinted
  `broadcast()` (customer/supplier/nation/region are O(SF) small);
  the only big exchange is fact⋈orders on the orderkey, which AQE
  coalesces.
- semi joins with non-equi conjuncts (q4): EXISTS becomes `leftsemi`
  with a mixed equi + range condition — no pair materialization.
- anti joins (q22): NOT EXISTS becomes `left_anti`.
- aggregate-then-join instead of correlated subqueries (q15, q18,
  q21): the correlated EXISTS formulations in the spec are re-expressed
  as one partial-aggregated frame joined back — a single shuffle each,
  the shape that survives a 1000-executor scale-up (Spark's own
  subquery decorrelation produces the same plan; building it explicitly
  keeps it deterministic and oracle-mirrorable).
- disjunctive join predicates (q19): OR-of-ANDs pushed as a post-join
  filter over one equi-join on partkey (NOT a nested-loop join — the
  equi conjunct is shared by all branches).
- left-outer + conditional count (q13), global-scalar thresholds
  computed decimal-exact then broadcast (q22, q14 ratio).

Columns in the driver testdata are a TPC-H subset (no partsupp, no
commit/receipt dates, no comments/phones); each query documents its
adaptation.  All money sums accumulate in DECIMAL(27,6) and surface as
DOUBLE — bit-exact against the DuckDB oracle (same pattern as
q1_pricing_summary; see scan_metrics.py's determinism note).

Reference: the app itself contains none of these shapes
(DataProfilerForAWSGlueDataCatalog.scala:299-303 is its only join); this suite is the §7
"query capabilities" extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(27,6)"
ROUND6 = (  # 6-dp deterministic rounding; specials/huge pass through
    "CASE WHEN abs({x}) < 9.0e12 "
    "THEN floor(({x}) * 1000000.0 + 0.5) / 1000000.0 ELSE ({x}) END"
)

# Late shipment (q4/q21 adaptation without commit/receipt dates): the
# line shipped more than LATE_DAYS after the order date.
LATE_DAYS = 90


def _dec6(expr_sql: str):
    """Decimal operand for revenue-style sums: the double product is
    ROUND6'd *before* the decimal cast — raw double->decimal(_,6)
    conversion is engine-divergent on 7th-digit .5 boundaries (SURVEY
    §5 determinism policy; found by the sf0.1 content fuzz). Identity
    on the fixed 2-dp testdata prices; the oracles apply the same
    pre-round."""
    return F.expr(f"CAST({ROUND6.format(x=expr_sql)} AS {DEC})")


def _rev(price: str = "l_extendedprice", disc: str = "l_discount"):
    return _dec6(f"{price} * (1.0 - {disc})")


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """Q3: top-k unshipped orders by revenue for one market segment.

    Plan shape: filtered customer is broadcast into orders (dim side),
    the orders⋈lineitem equi-join is the one real shuffle, the top-k is
    TakeOrderedAndProject (no global sort).  Ties broken by l_orderkey.
    """
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < _ts(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > _ts(cutoff)).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(
            ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def q4_order_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """Q4: orders in a quarter with at least one late line, by priority.

    EXISTS → `leftsemi` join with a mixed condition (equi on orderkey +
    the late-shipment range conjunct).  No lineitem row survives the
    join — state is one bit per order.
    """
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > ords.o_orderdate + F.expr(f"INTERVAL {LATE_DAYS} DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Q5: revenue per nation where customer and supplier share a nation.

    Six-way star join: every dim (supplier, customer, nation, region) is
    broadcast; the co-nationality constraint (c_nationkey == s_nationkey)
    rides the customer join as an extra conjunct, so no second shuffle.
    """
    nr = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    sup = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """Q6: single-scan scalar aggregate with a fully pushable filter."""
    return lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from))
        & (F.col("l_shipdate") < _ts(date_to))
        & (F.col("l_discount") >= F.lit(disc_lo))
        & (F.col("l_discount") <= F.lit(disc_hi))
        & (F.col("l_quantity") < F.lit(max_qty))
    ).agg(
        F.sum(_dec6("l_extendedprice * l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_9",
) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year.

    The nation dim enters twice (supplier side / customer side) under
    different aliases — both broadcast — with the disjunctive pair
    filter ((a,b) or (b,a)) applied after both attachments.
    """
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sup = supplier.join(
        F.broadcast(n1), supplier.s_nationkey == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n2), customer.c_nationkey == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    joined = (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-07-01",
    k: int = 20,
) -> DataFrame:
    """Q10: top-k customers by lost revenue on returned lines."""
    ords = orders.where(
        (F.col("o_orderdate") >= _ts(date_from)) & (F.col("o_orderdate") < _ts(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """Q13: histogram of orders-per-customer (left outer + double agg).

    Customers with zero qualifying orders keep c_count = 0 via the outer
    join; the second agg is over |customers| rows — trivially small.
    """
    ords = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1997-09-01",
    date_to: str = "1997-10-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """Q14: promo revenue share for one month (broadcast part dim;
    conditional decimal sums; the ratio divides the two exact doubles)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type") == promo_type, _rev()).otherwise(F.lit(0).cast(DEC))
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
    )


def q15_top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """Q15: supplier(s) achieving the maximum quarterly revenue.

    The spec's correlated `revenue = (SELECT MAX ...)` becomes
    aggregate-then-join: one shuffle builds per-supplier revenue, the
    1-row max is broadcast back as a filter.  Revenue doubles come from
    the same decimal sum in both engines, so the equality is exact.
    """
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= _ts(date_from)) & (F.col("l_shipdate") < _ts(date_to))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("max_revenue"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q18_large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 100,
) -> DataFrame:
    """Q18: orders whose total quantity exceeds a threshold, with their
    customers.  The IN-subquery-with-HAVING becomes aggregate-then-join
    on the already-shuffled per-order quantity frame (one shuffle total:
    the groupBy and the orders join share the orderkey partitioning)."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19: revenue under OR-of-ANDs brand/size/quantity predicates.

    All three branches share the partkey equi-conjunct, so this plans as
    ONE broadcast equi-join + a disjunctive post-filter — never a
    nested-loop join.  (Catalyst extracts the common equi predicate; the
    plan contract is asserted in tests/test_plans.py.)
    """
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    branch3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return joined.where(branch1 | branch2 | branch3).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q21_suppliers_who_kept_waiting(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    status: str = "F",
    k: int = 100,
) -> DataFrame:
    """Q21 (adapted): suppliers that were the SOLE late supplier on a
    multi-supplier finished order.

    The spec's EXISTS + NOT EXISTS self-joins over lineitem are
    re-expressed as one per-order aggregate (distinct suppliers, distinct
    late suppliers) joined back to the late lines — two shuffles total on
    the same key instead of three correlated scans.  Late =
    shipped > LATE_DAYS after order date (no receipt/commit dates in the
    testdata)."""
    ords = orders.where(F.col("o_orderstatus") == status).select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        ords, F.col("l_orderkey") == F.col("o_orderkey")
    )
    flagged = li.withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ).cast("int"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    sole_late = (
        flagged.where(F.col("is_late") == 1)
        .join(
            per_order.where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, priority: str = "1-URGENT"
) -> DataFrame:
    """Q22 (adapted): well-funded customers with no URGENT orders, by
    segment.  (Every synthetic customer has orders, so the spec's "no
    orders at all" is vacuous here; the anti-join instead excludes
    customers holding any ``priority`` order — same plan shape.)

    Two classic shapes in one: a broadcast scalar threshold (decimal-exact
    mean of positive balances) and NOT EXISTS as a `left_anti` join."""
    pos = customer.where(F.col("c_acctbal") > 0.0)
    thresh = pos.agg(
        F.try_divide(
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double"),
            F.count("c_acctbal"),
        ).alias("avg_bal")
    )
    rich = customer.join(F.broadcast(thresh)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(
        orders.where(F.col("o_orderpriority") == priority).select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    """DuckDB-exact ANSI mirrors, aliased identically to the Spark plans."""
    rev = f"CAST(SUM(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})) AS DOUBLE)"
    return {
        "q3_shipping_priority": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {rev} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
        "q4_order_priority": f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        "q5_local_supplier_volume": f"""
SELECT n_name, {rev} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
        "q6_forecast_revenue": f"""
SELECT
  CAST(SUM(CAST(floor((l_extendedprice * l_discount) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
""",
        "q7_volume_shipping": f"""
SELECT supp_nation, cust_nation, l_year, {rev} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
     OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
        "q8_market_share": f"""
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_9'
        THEN CAST(floor((l_extendedprice * (1.0 - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})
        ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS nation_volume,
  {rev} AS total_volume,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_9'
        THEN CAST(floor((l_extendedprice * (1.0 - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})
        ELSE CAST(0 AS {DEC}) END) AS DOUBLE) / {rev} AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
""",
        "q10_returned_items": f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {rev} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
        "q13_customer_distribution": """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
        "q14_promo_revenue": f"""
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(floor((l_extendedprice * (1.0 - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})
        ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
      / {rev} AS promo_revenue_pct,
  CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(floor((l_extendedprice * (1.0 - l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS {DEC})
        ELSE CAST(0 AS {DEC}) END) AS DOUBLE) AS promo_revenue,
  {rev} AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""",
        "q15_top_supplier": f"""
WITH revenue AS (
  SELECT l_suppkey, {rev} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
        "q18_large_orders": f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
) q ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 250.0
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
        "q19_disjunctive_revenue": f"""
SELECT {rev} AS revenue, COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
        "q21_suppliers_who_kept_waiting": f"""
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supps
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM flagged f
  JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE f.is_late = 1 AND p.n_supps > 1 AND p.n_late_supps = 1
) sole
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""",
        "q22_global_sales_opportunity": f"""
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    }


def q8_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_9",
    region_name: str = "ASIA",
) -> DataFrame:
    """Q8: the target nation's supplier share of regional revenue per
    order year.

    The nation dim enters twice (customer-region scoping vs supplier
    nationality); the share is a conditional decimal sum over the same
    joined relation — one star join, no second pass. Both numerator and
    denominator surface as exact doubles, the ratio is the division of
    the two (fixed shape).
    """
    nr = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = customer.join(
        F.broadcast(nr), customer.c_nationkey == F.col("cn_key")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    joined = (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = _rev()
    tgt = F.when(F.col("supp_nation") == target_nation, vol).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(tgt).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .selectExpr(
            "o_year",
            "nation_volume",
            "total_volume",
            "nation_volume / total_volume AS mkt_share",
        )
        .orderBy("o_year")
    )
