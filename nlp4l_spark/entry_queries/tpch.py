# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    F, STANDARD_ANALYZER, TOK_SQL, Window, _docs, _events, _lineitem, os,
)
# Relational-analytics parity: TPC-H Q1/Q3 twins with exact integer
# arithmetic (the OLAP side a mixed search+analytics engine serves).
# --------------------------------------------------------------------- #


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 (pricing summary report) twin over the fixture lineitem:
    per (returnflag, linestatus) exact sums of qty, base price,
    discounted price, and charge. Cross-engine exactness: price is 2dp
    and discount/tax are 2dp fractions, so price_cents ×
    (100−disc_pct) × (100+tax_pct) is an EXACT int64 (≈1e11/row, 6e16
    summed — inside int64), divided back to currency once per group;
    no floating accumulation anywhere. ONE map-side-combined groupBy —
    the canonical Spark aggregation plan."""
    li = _lineitem(spark, sf_dir)
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_p = F.round(F.col("l_discount") * 100).cast("long")
    tax_p = F.round(F.col("l_tax") * 100).cast("long")
    disc_c = price_c * (100 - disc_p)  # cents*1e2
    charge_c = disc_c * (100 + tax_p)  # cents*1e4
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            qty.alias("_q"),
            price_c.alias("_p"),
            disc_c.alias("_d"),
            charge_c.alias("_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_q").cast("long").alias("sum_qty"),
            (F.sum("_p").cast("double") / 100.0).alias("sum_base_price"),
            F.round(F.sum("_d").cast("double") / 10000.0, 6).alias(
                "sum_disc_price"
            ),
            F.round(F.sum("_c").cast("double") / 1000000.0, 6).alias(
                "sum_charge"
            ),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


O_PRICING_SUMMARY = """
WITH c AS (SELECT l_returnflag, l_linestatus,
                  round(l_quantity)::bigint AS q,
                  round(l_extendedprice * 100)::bigint AS p,
                  round(l_discount * 100)::bigint AS d,
                  round(l_tax * 100)::bigint AS t
           FROM lineitem)
SELECT l_returnflag, l_linestatus,
       sum(q)::bigint AS sum_qty,
       sum(p)::double / 100.0 AS sum_base_price,
       round(sum(p * (100 - d))::double / 10000.0, 6) AS sum_disc_price,
       round(sum(p * (100 - d) * (100 + t))::double / 1000000.0, 6)
         AS sum_charge,
       count(*)::bigint AS count_order
FROM c GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus
"""


SHIP_CUTOFF = "1998-06-15"


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (shipping priority) twin: revenue per order for orders
    placed before {SHIP_CUTOFF} with lineitems shipped after it, top 10
    by revenue — the classic fact⋈fact⋈dim plan. Revenue folds exact
    discounted cents (price_c × (100−disc_p), int64). Spark shape:
    orders filter broadcasts onto the lineitem scan (the small side),
    one revenue groupBy, TakeOrdered."""
    li = _lineitem(spark, sf_dir)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cutoff = F.to_timestamp(F.lit(SHIP_CUTOFF))
    o = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_orderdate"
    )
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    l = li.filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", rev_c.alias("_r")
    )
    return (
        l.join(F.broadcast(o), l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


O_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint))::double
             / 10000.0, 6) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
  AND l_shipdate > TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY 1 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


def q_order_priority_count(spark, sf_dir):
    """TPC-H Q4 (order priority checking) twin: orders placed in a
    quarter that have AT LEAST ONE late lineitem, counted per priority
    — the canonical EXISTS/semi-join plan (never row-multiplying; an
    inner join would double-count multi-line orders). Date filters push
    to both scans; the late-lineitem key set LEFT SEMI joins onto
    orders."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = _lineitem(spark, sf_dir)
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1997-07-01"))
    o = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    # fixture lineitem has no commitdate: 'late' = shipped after a fixed
    # in-quarter date (same EXISTS plan shape, fixture-adapted predicate)
    late = li.filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-02-01"))
    ).select("l_orderkey")
    return (
        o.join(late, o["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


O_ORDER_PRIORITY_COUNT = """
SELECT o_orderpriority, count(*)::bigint AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1997-02-01 00:00:00')
GROUP BY 1 ORDER BY o_orderpriority
"""


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 (local supplier volume) twin: revenue per nation for
    ASIA-region customers served by SAME-NATION suppliers in one year —
    the canonical star join. Plan shape: the region→nation→customer /
    supplier dimension chain broadcasts onto the orders⋈lineitem fact
    side (dims are tiny by construction); revenue folds exact
    discounted cents."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    region = sf("region").filter(F.col("r_name") == "ASIA")
    nation = sf("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = sf("customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("_cn"), "n_name")
    supp = sf("supplier").select("s_suppkey", "s_nationkey")
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1998-01-01"))
    orders = sf("orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    li = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", rev_c.alias("_r")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("_cn"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


O_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint))::double
             / 10000.0, 6) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1 ORDER BY revenue DESC, n_name ASC
"""


def q_revenue_change(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change) twin: the revenue delta
    from dropping a discount band — sum(price × discount) for 1997
    shipments with discount in [5%,7%] and quantity < 24. Pure
    scan+filter+agg: every predicate is a parquet pushdown
    (PushedFilters on l_shipdate/l_discount/l_quantity), no join, no
    shuffle beyond the final 1-row combine — the cheapest possible
    TPC-H plan and the canonical predicate-pushdown check. Exact
    arithmetic: cents × integer discount-pct summed in int64, divided
    back once."""
    li = _lineitem(spark, sf_dir)
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1998-01-01"))
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_p = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select((price_c * disc_p).alias("_r"))
        .agg(
            F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


O_REVENUE_CHANGE = """
SELECT round(sum(round(l_extendedprice * 100)::bigint
               * round(l_discount * 100)::bigint)::double / 10000.0, 6)
         AS revenue,
       count(*)::bigint AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned item reporting) twin: top-20 customers by
    lost revenue from RETURNED ('R') lineitems of Q1-1997 orders, with
    nation names. Plan shape: both fact filters push to the scans,
    orders(quarter) broadcasts onto lineitem(R), then the per-customer
    rollup joins the broadcast customer⋈nation dim chain. Revenue folds
    exact discounted cents."""
    sf = lambda t: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    )
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1997-04-01"))
    orders = sf("orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    li = _lineitem(spark, sf_dir).filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", rev_c.alias("_r"))
    cust = sf("customer").join(
        F.broadcast(sf("nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    per_cust = (
        li.join(F.broadcast(orders), li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"))
    )
    return (
        per_cust.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


O_RETURNED_ITEMS = """
SELECT c_custkey, c_name,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint))::double
             / 10000.0, 6) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 4, 5 ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect) twin: the percentage of Q1-1997
    discounted revenue attributable to PROMO-type parts. Plan shape:
    the part dim broadcasts onto the date-pruned lineitem scan; ONE
    conditional-sum aggregate computes both numerator and denominator
    in a single pass (no second scan, no self-join). The percentage is
    a ratio of two EXACT int64 cent-sums, rounded once."""
    li = _lineitem(spark, sf_dir)
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_partkey", "p_type"
    )
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1997-04-01"))
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    j = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", rev_c.alias("_r"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("_r")).otherwise(F.lit(0))
    )
    total = F.sum("_r")
    return j.agg(
        F.round(promo * 100.0 / total, 6).alias("promo_revenue_pct"),
        F.round(total.cast("double") / 10000.0, 6).alias("total_revenue"),
    )


O_PROMO_REVENUE = """
WITH j AS (SELECT p_type,
                  round(l_extendedprice * 100)::bigint
                  * (100 - round(l_discount * 100)::bigint) AS r
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00')
SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END) * 100.0
             / sum(r), 6) AS promo_revenue_pct,
       round(sum(r)::double / 10000.0, 6) AS total_revenue
FROM j
"""


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier) twin: the supplier(s) with maximum
    Q1-1997 discounted revenue — the classic agg-then-argmax-with-ties
    (TPC-H's revenue view + '= max' subquery). Spark shape: one
    per-supplier cent-sum groupBy, then the 1-row global max broadcast
    back as an equi-filter (ties all survive, as the spec requires —
    and NO single-partition rank() window at any scale), then the tiny
    supplier dim broadcast for names. Exact int64 cents make the
    argmax itself exact — no float argmax flakiness."""
    li = _lineitem(spark, sf_dir)
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1997-04-01"))
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    per_supp = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_suppkey", rev_c.alias("_r"))
        .groupBy("l_suppkey")
        .agg(F.sum("_r").alias("_rev_c"))
    )
    mx = per_supp.agg(F.max("_rev_c").alias("_mx"))
    top = per_supp.join(
        F.broadcast(mx), per_supp["_rev_c"] == mx["_mx"]
    ).drop("_mx")
    supp = spark.read.parquet(
        os.path.join(sf_dir, "supplier.parquet")
    ).select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev_c").cast("double") / 10000.0, 6).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


O_TOP_SUPPLIER = """
WITH r AS (SELECT l_suppkey,
                  sum(round(l_extendedprice * 100)::bigint
                      * (100 - round(l_discount * 100)::bigint)) AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY 1)
SELECT s_suppkey, s_name,
       round(rev::double / 10000.0, 6) AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM r)
ORDER BY s_suppkey
"""


def q_large_orders(spark, sf_dir):
    """TPC-H Q18 (large volume customer) twin: orders whose total
    quantity exceeds 300 units, with customer names — the canonical
    HAVING-on-fact-rollup + dim join. Plan shape: the per-order
    quantity rollup runs FIRST (map-side combined, before any join),
    the >300 filter shrinks it to a handful of keys, and only then do
    orders and the broadcast customer dim attach — never join-then-
    aggregate. Quantities are integral by fixture construction, so the
    HAVING threshold is exact int64."""
    li = _lineitem(spark, sf_dir)
    qty = F.round(F.col("l_quantity")).cast("long")
    big = (
        li.select("l_orderkey", qty.alias("_q"))
        .groupBy("l_orderkey")
        .agg(F.sum("_q").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    sf = lambda t: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    )
    orders = sf("orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    cust = sf("customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


O_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       sum(round(l_quantity)::bigint)::bigint AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2, 3, 4, 5
HAVING sum(round(l_quantity)::bigint) > 300
ORDER BY o_totalprice DESC, o_orderkey ASC
"""


def q_brand_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue) twin: revenue from three
    disjunctive (brand × size-band × quantity-band) channels — the
    classic OR-of-ANDs predicate that exercises join-condition
    pushdown. Plan shape: the part dim broadcasts; the disjunction
    evaluates post-join as one boolean expression (Catalyst extracts
    the common p_partkey equi-key; the OR arms don't block the hash
    join). Per-channel exact cent-sums plus the total, one pass."""
    li = _lineitem(spark, sf_dir)
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_partkey", "p_brand", "p_size"
    )
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    j = li.select("l_partkey", "l_quantity", rev_c.alias("_r")).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    arm1 = (
        (F.col("p_brand") == "Brand#13")
        & sz.between(1, 15)
        & q.between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#22")
        & sz.between(10, 30)
        & q.between(10, 30)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#19")
        & sz.between(20, 50)
        & q.between(20, 45)
    )
    matched = j.filter(arm1 | arm2 | arm3)
    csum = lambda c: F.sum(  # noqa: E731
        F.when(c, F.col("_r")).otherwise(F.lit(0))
    )
    return matched.agg(
        F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"),
        F.round(csum(arm1).cast("double") / 10000.0, 6).alias("rev_brand13"),
        F.round(csum(arm2).cast("double") / 10000.0, 6).alias("rev_brand22"),
        F.round(csum(arm3).cast("double") / 10000.0, 6).alias("rev_brand19"),
        F.count("*").cast("long").alias("n_items"),
    )


O_BRAND_REVENUE = """
WITH j AS (SELECT p_brand, p_size, l_quantity,
                  round(l_extendedprice * 100)::bigint
                  * (100 - round(l_discount * 100)::bigint) AS r,
                  (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20) AS a1,
                  (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 30) AS a2,
                  (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 45) AS a3
           FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT round(sum(r)::double / 10000.0, 6) AS revenue,
       round(sum(CASE WHEN a1 THEN r ELSE 0 END)::double / 10000.0, 6)
         AS rev_brand13,
       round(sum(CASE WHEN a2 THEN r ELSE 0 END)::double / 10000.0, 6)
         AS rev_brand22,
       round(sum(CASE WHEN a3 THEN r ELSE 0 END)::double / 10000.0, 6)
         AS rev_brand19,
       count(*)::bigint AS n_items
FROM j WHERE a1 OR a2 OR a3
"""


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping) twin: discounted revenue shipped
    between two nations (either direction, supplier nation ≠ customer
    nation) per year — the canonical two-dimension-chain fact join.
    Fixture nations NATION_3/NATION_8 stand in for FRANCE/GERMANY
    (present in the supplier dim at BOTH SFs). Plan shape: the two
    nation-filtered dims broadcast onto lineitem and orders; the fact⋈
    fact join shuffles on orderkey once; revenue folds exact discounted
    cents (int64), divided back once per group. Reference parity: the
    reference's fetch/sort surface (RunDAO.fetch, Dao.scala) has no
    TPC-H, this twin exists for the OLAP query surface."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    nations = ("NATION_3", "NATION_8")
    nat = sf("nation").filter(F.col("n_name").isin(*nations)).select(
        "n_nationkey", "n_name"
    )
    supp = sf("supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = sf("customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = sf("orders").select("o_orderkey", "o_custkey")
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1999-01-01"))
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    li = _lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        rev_c.alias("_r"),
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("_r").cast("double") / 10000.0, 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


O_VOLUME_SHIPPING = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       date_part('year', l_shipdate)::bigint AS l_year,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint))::double
             / 10000.0, 6) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_3', 'NATION_8')
  AND cn.n_name IN ('NATION_3', 'NATION_8')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share) twin: NATION_12's share of
    ASIA-region revenue for PROMO-type parts, per order year. Share is
    a ratio of two exact int64 cent sums (conditional numerator via
    CASE), divided once per group — no float accumulation. Plan shape:
    part/customer-region/supplier dims all broadcast; one orderkey
    shuffle joins lineitem to orders; single groupBy(year)."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    part = sf("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    region = sf("region").filter(F.col("r_name") == "ASIA")
    nat_asia = sf("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = sf("customer").join(
        F.broadcast(nat_asia), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    nat = sf("nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("_snm")
    )
    supp = sf("supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("_snk")
    ).select("s_suppkey", "_snm")
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1999-01-01"))
    orders = sf("orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    li = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_partkey", "l_suppkey", rev_c.alias("_r")
    )
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    num = F.sum(
        F.when(F.col("_snm") == "NATION_12", F.col("_r")).otherwise(F.lit(0))
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                num.cast("double") / F.sum("_r").cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


O_MARKET_SHARE = """
SELECT date_part('year', o_orderdate)::bigint AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_12' THEN r ELSE 0 END)::double
             / sum(r)::double, 6) AS mkt_share
FROM (SELECT l_orderkey, l_partkey, l_suppkey,
             round(l_extendedprice * 100)::bigint
             * (100 - round(l_discount * 100)::bigint) AS r
      FROM lineitem) l
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def q_product_profit(spark, sf_dir):
    """TPC-H Q9 (product-type profit) twin over 'widget' parts: profit
    per (supplier nation, year). The fixture has no partsupp, so cost
    is qty × p_retailprice (the fixture's unit cost column) — profit =
    discounted revenue − cost, folded at a common cents×100 scale so
    every row is an exact int64. Plan shape: part-name filter broadcast
    onto lineitem, supplier→nation chain broadcast, one orderkey
    shuffle for the order year, single groupBy."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    part = sf("part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", F.round(F.col("p_retailprice") * 100).cast("long").alias("_rc")
    )
    nat = sf("nation").select("n_nationkey", "n_name")
    supp = sf("supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    orders = sf("orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = _lineitem(spark, sf_dir)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_p = F.round(F.col("l_discount") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    j = (
        li.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            (price_c * (100 - disc_p)).alias("_rev"),
            qty.alias("_q"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    profit = F.col("_rev") - F.col("_q") * F.col("_rc") * F.lit(100)
    return (
        j.select("n_name", "o_year", profit.alias("_p"))
        .groupBy("n_name", "o_year")
        .agg(F.round(F.sum("_p").cast("double") / 10000.0, 6).alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


O_PRODUCT_PROFIT = """
SELECT n_name, date_part('year', o_orderdate)::bigint AS o_year,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint)
                 - round(l_quantity)::bigint
                   * round(p_retailprice * 100)::bigint * 100)::double
             / 10000.0, 6) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY n_name, o_year DESC
"""


def q_late_line_priority(spark, sf_dir):
    """TPC-H Q12 (shipping modes / order priority) twin: among
    lineitems shipped in 1997 that were LATE — shipped more than 90
    days after the order date (the fixture has no commit/receipt dates
    or shipmode; the 90-day ship lag is the receipt-delay stand-in and
    l_returnflag stands in for l_shipmode) — count high-priority
    (1-URGENT / 2-HIGH) vs lower-priority orders per flag. The
    canonical CASE-sum aggregation over a fact⋈fact join; the date
    arithmetic stays on the JVM (timestamp + INTERVAL)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1998-01-01"))
    li = _lineitem(spark, sf_dir).filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


O_LATE_LINE_PRIORITY = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::bigint AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::bigint AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1 ORDER BY 1
"""


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier) twin: for every size-15 part,
    the EUROPE supplier(s) offering the lowest unit cost. The fixture
    has no partsupp, so unit cost is derived from lineitem as
    min(extendedprice/quantity) per (part, supplier) — folded as exact
    integer MILLICENTS via int64 floor-division ((price_c*1000) div
    qty), so the per-part argmin is exact in both engines. Plan shape:
    part-size filter and the EUROPE supplier chain broadcast onto the
    lineitem scan; one (part,supp) groupBy; the per-part min folds on
    the SAME keys' table (map-side combine, no second fact scan); ties
    all survive (spec semantics). No window over a global sort
    anywhere."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    part = sf("part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    region = sf("region").filter(F.col("r_name") == "EUROPE")
    nat = sf("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = sf("supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    li = _lineitem(spark, sf_dir)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    cost = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "(cast(round(l_extendedprice * 100) as bigint) * 1000)"
                " div cast(round(l_quantity) as bigint)"
            ).alias("_uc"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("_uc").alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("unit_cost").alias("_mc")
    )
    _ = (price_c, qty)  # documented cost derivation (expr above)
    return (
        cost.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("_pk"))
            & (F.col("unit_cost") == F.col("_mc")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "unit_cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


O_MIN_COST_SUPPLIER = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
cost AS (
  SELECT l_partkey, l_suppkey,
         min((round(l_extendedprice * 100)::bigint * 1000)
             // round(l_quantity)::bigint) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size = 15
  JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2),
best AS (SELECT l_partkey AS pk, min(unit_cost) AS mc FROM cost GROUP BY 1)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       l_partkey AS p_partkey, p_name, unit_cost
FROM cost
JOIN best ON l_partkey = pk AND unit_cost = mc
JOIN eu_supp ON l_suppkey = s_suppkey
JOIN part ON l_partkey = part.p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
"""


def q_important_parts(spark, sf_dir):
    """TPC-H Q11 (important stock identification) twin: parts whose
    total EUROPE-supplied extended-price value exceeds 1.5× the average
    part value — the canonical HAVING-against-a-global-scalar plan. The
    fixture has no partsupp; lineitem extended price (exact cents)
    stands in for supplycost×availqty. Spark shape: per-part cent-sum
    groupBy, then the 1-row (total, count) aggregate broadcast back as
    a crossJoin filter — the threshold compare is EXACT int64
    (2·value·n_parts > 3·total), no float division anywhere."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    region = sf("region").filter(F.col("r_name") == "EUROPE")
    nat = sf("nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    supp = sf("supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = _lineitem(spark, sf_dir)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_part = (
        li.select("l_partkey", "l_suppkey", price_c.alias("_p"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("_p").alias("_v"))
    )
    tot = per_part.agg(
        F.sum("_v").alias("_tot"), F.count("*").alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("_v") * F.col("_n") > F.lit(3) * F.col("_tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("_v").cast("double") / 100.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
        .limit(50)
    )


O_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey, sum(round(l_extendedprice * 100)::bigint) AS vc
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
  GROUP BY 1)
SELECT l_partkey AS p_partkey, round(vc::double / 100.0, 2) AS value
FROM v
WHERE 2 * vc * (SELECT count(*) FROM v) > 3 * (SELECT sum(vc) FROM v)
ORDER BY value DESC, p_partkey LIMIT 50
"""


def q_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship) twin: distinct-supplier
    counts per (brand, type, size) for parts NOT of Brand#13 / PROMO
    type, size in the spec's 8-value set, excluding negative-balance
    suppliers (the fixture stand-in for complaint suppliers; no
    comments column). The supplier relationship itself is derived from
    distinct lineitem (part, supplier) pairs — no partsupp in the
    fixture. Plan: part filter broadcast, the tiny exclusion list
    broadcast ANTI join, one distinct + one count-distinct groupBy."""
    sf = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))  # noqa: E731
    part = sf("part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = sf("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        _lineitem(spark, sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


O_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::bigint AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue) twin: average yearly
    revenue lost if Brand#13 orders below half the part's average
    quantity were not taken. The correlated per-part avg-quantity
    subquery becomes a per-part (sum, count) groupBy broadcast back
    onto the same lines; the threshold compare is EXACT int64
    (2·qty·cnt < sum_qty — no float average). 7 order years in the
    fixture → /7 for the yearly figure."""
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    li = _lineitem(spark, sf_dir)
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    lines = li.select(
        "l_partkey", qty.alias("_q"), price_c.alias("_p")
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    stats = lines.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_q").alias("_sq"), F.count("*").alias("_n")
    )
    return (
        lines.join(F.broadcast(stats), F.col("l_partkey") == F.col("_pk"))
        .filter(F.lit(2) * F.col("_q") * F.col("_n") < F.col("_sq"))
        .agg(
            F.round(F.sum("_p").cast("double") / 100.0 / 7.0, 6).alias(
                "avg_yearly"
            ),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


O_SMALL_QTY_REVENUE = """
WITH lines AS (
  SELECT l_partkey, round(l_quantity)::bigint AS q,
         round(l_extendedprice * 100)::bigint AS p
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'),
st AS (SELECT l_partkey AS pk, sum(q) AS sq, count(*) AS n
       FROM lines GROUP BY 1)
SELECT round(sum(p)::double / 100.0 / 7.0, 6) AS avg_yearly,
       count(*)::bigint AS n_lines
FROM lines JOIN st ON l_partkey = pk
WHERE 2 * q * n < sq
"""


def q_part_promotion(spark, sf_dir):
    """TPC-H Q20 (potential part promotion) twin: suppliers holding
    excess stock of 'widget' parts. The fixture has no partsupp, so a
    supplier's available quantity for a part is stood in by the exact
    integer total quantity they ever shipped of it, and Q20's
    threshold — half the part's 1997 demand across ALL suppliers —
    compares as 2*avail > need (pure int64, no 0.5 float). Plan shape
    (ref: TPC-H spec Q20's nested IN-subquery chain): the 'widget'
    part keys broadcast onto ONE lineitem scan that feeds BOTH
    aggregates (per-(part,supp) all-time and per-part 1997); the
    part-cardinality demand table broadcasts back; qualifying
    suppliers dedup via a key-set distinct; supplier/nation dimensions
    broadcast. No correlated subquery, no fact self-join."""
    sf = lambda t: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    )
    wp = sf("part").filter(F.col("p_name").like("%widget")).select("p_partkey")
    li = (
        _lineitem(spark, sf_dir)
        .join(F.broadcast(wp), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            "l_shipdate",
            F.round(F.col("l_quantity")).cast("long").alias("_q"),
        )
    )
    avail = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("_q").alias("_aq"))
    lo = F.to_timestamp(F.lit("1997-01-01"))
    hi = F.to_timestamp(F.lit("1998-01-01"))
    need = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_partkey").alias("_pk"))
        .agg(F.sum("_q").alias("_nq"))
    )
    keys = (
        avail.join(F.broadcast(need), F.col("l_partkey") == F.col("_pk"))
        .filter(F.lit(2) * F.col("_aq") > F.col("_nq"))
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        sf("supplier")
        .join(
            F.broadcast(sf("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        supp.join(keys, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


O_PART_PROMOTION = """
WITH wp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget'),
li AS (SELECT l_partkey, l_suppkey, l_shipdate,
              round(l_quantity)::bigint AS q
       FROM lineitem JOIN wp ON l_partkey = p_partkey),
avail AS (SELECT l_partkey, l_suppkey, sum(q) AS aq FROM li GROUP BY 1, 2),
need AS (SELECT l_partkey, sum(q) AS nq FROM li
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1),
keys AS (SELECT DISTINCT l_suppkey FROM avail JOIN need USING (l_partkey)
         WHERE 2 * aq > nq)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN keys ON s_suppkey = l_suppkey
ORDER BY s_name
"""


def q_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting) twin: per
    supplier, the finished ('F') multi-supplier orders where THIS
    supplier was the ONLY late one (late = shipped >90 days after the
    order date — the fixture's receipt-delay stand-in, exactly as the
    Q12 twin). The reference's EXISTS / NOT EXISTS correlated pair
    (TPC-H spec Q21) becomes pure relational shape: one
    per-(order,supplier) late-flag aggregate, one window over the
    order partition for the (supplier count, late count) pair, then
    the filter ns>=2 AND nl=1 AND late — the fact table is never
    self-joined against itself (the classic Q21 quadratic trap) and
    nothing is correlated. The supplier dimension broadcasts."""
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_orderkey",
        "l_suppkey",
        "_late",
        F.count("*").over(w).alias("_ns"),
        F.sum("_late").over(w).alias("_nl"),
    )
    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).select(
        "s_suppkey", "s_name"
    )
    return (
        flagged.filter(
            (F.col("_late") == 1) & (F.col("_ns") >= 2) & (F.col("_nl") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


O_WAITING_SUPPLIERS = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
fl AS (SELECT l_orderkey, l_suppkey, late,
              count(*) OVER (PARTITION BY l_orderkey) AS ns,
              sum(late) OVER (PARTITION BY l_orderkey) AS nl
       FROM per)
SELECT s_name, count(*)::bigint AS numwait
FROM fl JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND ns >= 2 AND nl = 1
GROUP BY 1 ORDER BY numwait DESC, s_name
"""


def q_cust_order_dist(spark, sf_dir):
    """TPC-H Q13 (customer distribution) twin: the histogram of
    orders-per-customer INCLUDING zero-order customers — the canonical
    left-outer-join-then-double-aggregate (an inner join silently drops
    the zero bucket, the classic Q13 trap). The reference's o_comment
    NOT LIKE exclusion is stood in by an o_orderpriority filter (the
    fixture has no comment column) applied to the orders side BEFORE
    the join — same semantics, and the filter pushes to the scan.
    Spark shape: customer keys left-join the filtered orders, one
    per-customer count, one histogram count."""
    sf = lambda t: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    )
    cust = sf("customer").select("c_custkey")
    orders = sf("orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


O_CUST_ORDER_DIST = """
WITH pc AS (SELECT c_custkey, count(o_orderkey)::bigint AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
            GROUP BY 1)
SELECT c_count, count(*)::bigint AS custdist
FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


def q_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity) twin: per nation, the
    count and total balance of ABOVE-AVERAGE-balance customers with no
    order since 1999 — the lapsed-high-value list (every fixture
    customer has SOME order, so the reference's never-ordered predicate
    becomes an inactivity window; nation stands in for the phone
    country code). Plan shape: the positive-balance average is a 1-row
    broadcast scalar; the inactivity condition is a LEFT ANTI join of
    customers against the date-pruned orders key set (never NOT IN —
    null-safe and semi-join shaped); balances fold as exact cents."""
    sf = lambda t: spark.read.parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet")
    )
    cust = sf("customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("_bal_c"),
    )
    avg_bal = cust.filter(F.col("_bal_c") > 0).agg(
        (F.sum("_bal_c").cast("double") / F.count("*")).alias("_avg_c")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("_bal_c").cast("double") > F.col("_avg_c")
    )
    recent = sf("orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))
    ).select("o_custkey")
    no_orders = rich.join(
        recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    nation = sf("nation").select("n_nationkey", "n_name")
    return (
        no_orders.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("_bal_c").cast("double") / 100.0, 6).alias(
                "totacctbal"
            ),
        )
        .orderBy("n_name")
    )


O_SALES_OPPORTUNITY = """
WITH c AS (SELECT c_custkey, c_nationkey,
                  round(c_acctbal * 100)::bigint AS bal_c
           FROM customer),
a AS (SELECT sum(bal_c)::double / count(*) AS avg_c
      FROM c WHERE bal_c > 0)
SELECT n_name, count(*)::bigint AS numcust,
       round(sum(bal_c)::double / 100.0, 6) AS totacctbal
FROM c CROSS JOIN a
JOIN nation ON c_nationkey = n_nationkey
WHERE bal_c::double > avg_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY 1 ORDER BY n_name
"""


SUMBASIC_WINDOW = 10
SUMBASIC_TOP = 15


def q_extractive_summary(spark, sf_dir):
    """SumBasic-style extractive summarization (Nenkova & Vanderwende
    2005) adapted to the unpunctuated fixture: each document splits
    into fixed {SUMBASIC_WINDOW}-token passages, a passage scores the
    MEAN corpus probability of its tokens, and the best passage per
    document (tie: earliest) represents the doc; top-{SUMBASIC_TOP}
    docs by passage score reported. Exactness: passage score =
    Σcf(token) / (len·total_tokens) — a ratio of exact int64 counts, so
    the argmax and the top-k are float-identical across engines (6dp
    rounded before selection). Plan: one tokenize pass builds
    (doc, pos, term); the corpus cf table broadcasts back onto it; one
    (doc, passage) rollup + one per-doc WindowGroupLimit argmax."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    dt = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    )
    cf = dt.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    total = dt.count()
    passages = (
        dt.join(F.broadcast(cf), "term")
        .withColumn("passage", (F.col("pos") / SUMBASIC_WINDOW).cast("long"))
        .groupBy("doc_id", "passage")
        .agg(
            F.count("*").cast("long").alias("_len"),
            F.sum("cf").alias("_cfsum"),
        )
        .withColumn(
            "score",
            F.round(
                F.col("_cfsum").cast("double")
                / (F.col("_len") * F.lit(float(total))),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("passage")
    )
    best = (
        passages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "passage", "score")
    )
    return best.orderBy(F.desc("score"), F.asc("doc_id")).limit(
        SUMBASIC_TOP
    )


O_EXTRACTIVE_SUMMARY = f"""
WITH dt AS (SELECT doc_id, unnest(a) AS term,
                   generate_subscripts(a, 1) - 1 AS pos
            FROM (SELECT doc_id, {TOK_SQL} AS a FROM documents)),
cf AS (SELECT term, count(*)::bigint AS cf FROM dt GROUP BY 1),
tot AS (SELECT count(*)::bigint AS total FROM dt),
p AS (SELECT doc_id, (pos // {SUMBASIC_WINDOW})::bigint AS passage,
             count(*)::bigint AS len, sum(cf)::bigint AS cfsum
      FROM dt JOIN cf USING (term) GROUP BY 1, 2),
sc AS (SELECT doc_id, passage,
              round(cfsum::double / (len * total::double), 6) AS score
       FROM p CROSS JOIN tot),
best AS (SELECT doc_id, passage, score FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, passage ASC) AS rn FROM sc)
         WHERE rn = 1)
SELECT doc_id, passage, score FROM best
ORDER BY score DESC, doc_id ASC LIMIT {SUMBASIC_TOP}
"""


def q_rollup_sales(spark, sf_dir):
    """OLAP ROLLUP twin (the hierarchical-subtotal surface — Spark's
    rollup() operator vs SQL GROUP BY ROLLUP): exact-cents revenue and
    counts at (returnflag, linestatus), per-flag subtotal, and grand
    total in ONE pass — one shuffle produces all three levels (Spark
    expands grouping sets map-side, it never re-scans per level). NULL
    group keys are coalesced to 'ALL' and disambiguated by
    grouping_id, so a real NULL could never collide."""
    li = _lineitem(spark, sf_dir)
    rev_c = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        li.select("l_returnflag", "l_linestatus", rev_c.alias("_r"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum("_r").cast("double") / 10000.0, 6).alias(
                "revenue"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


O_ROLLUP_SALES = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       grouping(l_returnflag, l_linestatus)::bigint AS gid,
       count(*)::bigint AS n_items,
       round(sum(round(l_extendedprice * 100)::bigint
                 * (100 - round(l_discount * 100)::bigint))::double
             / 10000.0, 6) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
"""


def q_cube_activity(spark, sf_dir):
    """OLAP CUBE twin (all 2² marginal combinations in one pass —
    Spark's cube() operator vs SQL GROUP BY CUBE): event count and
    exact-cents value sum at (event_type, weekday), each single-axis
    marginal, and the grand total. Weekday = epoch-day mod 7 (the
    repo's timezone-free convention); NULL keys coalesce to sentinel
    values with grouping_id disambiguation."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select(
        "event_type",
        (F.floor(sec / 86400) % 7).cast("long").alias("dow"),
        cents.alias("_c"),
    )
    return (
        e.cube("event_type", "dow")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").cast("long").alias("cnt"),
            F.round(F.sum("_c").cast("double") / 100.0, 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow"), F.lit(-1)).alias("dow"),
            "gid",
            "cnt",
            "sum_value",
        )
        .orderBy("gid", "event_type", "dow")
    )


O_CUBE_ACTIVITY = """
WITH e AS (SELECT event_type,
                  (floor(floor(epoch(ts))::bigint / 86400) % 7)::bigint
                    AS dow,
                  round(value * 100)::bigint AS c
           FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(dow, -1)::bigint AS dow,
       grouping(event_type, dow)::bigint AS gid,
       count(*)::bigint AS cnt,
       round(sum(c)::double / 100.0, 6) AS sum_value
FROM e
GROUP BY CUBE (event_type, dow)
ORDER BY gid, event_type, dow
"""


WEAK_LFS = [
    ("lf_join", "join", "db"),
    ("lf_vector", "vector", "ml"),
    ("lf_stream", "stream", "infra"),
    ("lf_slow", "slow", "perf"),
]


def q_weak_labels(spark, sf_dir):
    """Weak-supervision labeling-function analysis (the Snorkel LF
    summary panel a programmatic-labeling pipeline prints before
    training the label model): each LF fires a label when its trigger
    term is present; per LF report coverage (share of docs fired),
    overlap (fired docs where ≥1 OTHER LF also fired), and conflict
    (fired docs where another LF voted a DIFFERENT label — here every
    LF maps to a distinct label, so overlap = conflict structurally;
    both are reported because the panel's contract has both). Shares
    are exact integer-count ratios over the corpus size. Plan: ONE
    tokenize scan emits all LF fire flags as codegen booleans; the
    stats are a single 4-row aggregate — LFs scale as columns, not
    scans."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        *[
            F.array_contains(toks, term).alias(name)
            for name, term, _ in WEAK_LFS
        ],
    )
    nn = F.lit(float(_docs(spark, sf_dir).count()))
    n_fired = sum(
        F.col(name).cast("int") for name, _, _ in WEAK_LFS
    )
    d = d.withColumn("_nf", n_fired)
    rows = []
    for name, term, label in WEAK_LFS:
        fired = F.col(name)
        rows.append(
            d.agg(
                F.max(F.lit(name)).alias("lf"),
                F.max(F.lit(label)).alias("label"),
                F.sum(fired.cast("long")).alias("_n"),
                F.sum(
                    (fired & (F.col("_nf") >= 2)).cast("long")
                ).alias("_ov"),
            )
        )
    from functools import reduce

    stats = reduce(lambda a, b: a.unionAll(b), rows)
    return stats.select(
        "lf",
        "label",
        F.col("_n").cast("long").alias("n_fired"),
        F.round(F.col("_n") / nn, 6).alias("coverage"),
        F.round(F.col("_ov") / nn, 6).alias("overlap"),
        F.round(F.col("_ov") / nn, 6).alias("conflict"),
    ).orderBy("lf")


def _o_weak_labels() -> str:
    flag_cols = ",\n       ".join(
        f"list_contains({TOK_SQL}, '{term}') AS {name}"
        for name, term, _ in WEAK_LFS
    )
    nf = " + ".join(f"{name}::int" for name, _, _ in WEAK_LFS)
    arms = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS lf, '{label}' AS label,"
        f" sum({name}::int)::bigint AS n_fired,"
        f" round(sum({name}::int)::double / max(nn), 6) AS coverage,"
        f" round(sum(({name} AND nf >= 2)::int)::double / max(nn), 6)"
        f" AS overlap,"
        f" round(sum(({name} AND nf >= 2)::int)::double / max(nn), 6)"
        f" AS conflict"
        f" FROM d CROSS JOIN nd"
        for name, _, label in WEAK_LFS
    )
    return f"""
WITH d0 AS (SELECT doc_id,
       {flag_cols}
     FROM documents),
d AS (SELECT *, {nf} AS nf FROM d0),
nd AS (SELECT count(*)::double AS nn FROM documents)
SELECT * FROM ({arms}) ORDER BY lf
"""


O_WEAK_LABELS = _o_weak_labels()


def q_ab_test_zscore(spark, sf_dir):
    """A/B experiment readout (the Welch z-test on a per-user metric —
    the experimentation-platform panel): users split into arms by the
    repo's seeded md5-hash bucket (reproducible assignment — the
    dp_counts/random_score determinism trick), metric = the user's
    TOTAL event value, z = (x̄A−x̄B)/√(s²A/nA + s²B/nB). Total (not
    mean) keeps every per-arm moment an exact int64 cent sum — a
    per-user mean would make the arm aggregation an order-dependent
    float fold — and every fixture user converts, so a proportion test
    is degenerate; a value test has real variance. Both engines run
    identical float ops on identical integers; |z| ≥ 1.96 flags 5%
    two-sided significance (the fixture assigns uniformly, so the
    honest expectation is non-significant)."""
    h32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    users = (
        _events(spark, sf_dir)
        .select("user_id", cents.alias("_c"))
        .groupBy("user_id")
        .agg(F.sum("_c").alias("x"))
        .select((h32 % 2).alias("arm"), "x")
    )
    g = users.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    wide = g.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("s"))).alias("s_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("q"))).alias("q_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("s"))).alias("s_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("q"))).alias("q_b"),
    )
    ma = F.col("s_a") / F.col("n_a")
    mb = F.col("s_b") / F.col("n_b")
    va = (F.col("q_a") - F.col("s_a") * ma) / (F.col("n_a") - 1)
    vb = (F.col("q_b") - F.col("s_b") * mb) / (F.col("n_b") - 1)
    z = (ma - mb) / F.sqrt(va / F.col("n_a") + vb / F.col("n_b"))
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(ma / 100.0, 6).alias("mean_a"),
        F.round(mb / 100.0, 6).alias("mean_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(F.round(z, 6)) >= 1.96).alias("significant"),
    )


O_AB_TEST_ZSCORE = """
WITH u AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::bigint % 2
                    AS arm,
                  sum(round(value * 100)::bigint)::bigint AS x
           FROM events GROUP BY user_id),
g AS (SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::bigint AS n_a,
             sum(CASE WHEN arm = 0 THEN x ELSE 0 END)::bigint AS s_a,
             sum(CASE WHEN arm = 0 THEN x * x ELSE 0 END)::bigint AS q_a,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::bigint AS n_b,
             sum(CASE WHEN arm = 1 THEN x ELSE 0 END)::bigint AS s_b,
             sum(CASE WHEN arm = 1 THEN x * x ELSE 0 END)::bigint AS q_b
      FROM u)
SELECT n_a, n_b,
       round(s_a::double / n_a / 100.0, 6) AS mean_a,
       round(s_b::double / n_b / 100.0, 6) AS mean_b,
       round((s_a::double / n_a - s_b::double / n_b)
             / sqrt(((q_a - s_a * (s_a::double / n_a)) / (n_a - 1)) / n_a
                    + ((q_b - s_b * (s_b::double / n_b)) / (n_b - 1))
                      / n_b), 6)
         AS z_score,
       (abs(round((s_a::double / n_a - s_b::double / n_b)
             / sqrt(((q_a - s_a * (s_a::double / n_a)) / (n_a - 1)) / n_a
                    + ((q_b - s_b * (s_b::double / n_b)) / (n_b - 1))
                      / n_b), 6))
        >= 1.96) AS significant
FROM g
"""


MARKOV_SPLIT_DAY_OFFSET = 20


def q_markov_accuracy(spark, sf_dir):
    """First-order Markov next-event prediction with a temporal
    train/test split (the sanity baseline before any sequence model):
    per-user consecutive event pairs, a transition belonging to its
    SECOND event's day; train = first {MARKOV_SPLIT_DAY_OFFSET} days,
    test = the rest. The model is argmax count next-type per prev-type
    (tie: type asc, rounded-count-free — counts are exact ints);
    accuracy = correct test transitions / test transitions whose prev
    state was seen in training. One user-keyed lag window + two
    transition-matrix-sized aggregates — the matrix is |types|²,
    never data-sized."""
    sec = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        sec.alias("_t"),
        F.floor(sec / 86400).cast("long").alias("_day"),
    )
    trans = e.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("nxt"),
        "_day",
    ).filter(F.col("prev").isNotNull())
    d0 = trans.agg(F.min("_day").alias("_d0"))
    t2 = trans.crossJoin(F.broadcast(d0)).withColumn(
        "is_train",
        F.col("_day") < F.col("_d0") + MARKOV_SPLIT_DAY_OFFSET,
    )
    train_counts = (
        t2.filter("is_train")
        .groupBy("prev", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wbest = Window.partitionBy("prev").orderBy(
        F.desc("c"), F.asc("nxt")
    )
    model = (
        train_counts.withColumn("_r", F.row_number().over(wbest))
        .filter(F.col("_r") == 1)
        .select("prev", F.col("nxt").alias("pred"))
    )
    test = t2.filter(~F.col("is_train"))
    scored = test.join(F.broadcast(model), "prev", "left")
    totals = t2.agg(
        F.sum(F.col("is_train").cast("long")).alias("n_train"),
        F.sum((~F.col("is_train")).cast("long")).alias("n_test"),
    )
    return totals.crossJoin(
        scored.agg(
            F.sum(F.col("pred").isNotNull().cast("long")).alias(
                "n_scored"
            ),
            F.sum(
                (F.col("pred") == F.col("nxt")).cast("long")
            ).alias("n_correct"),
        )
    ).select(
        F.col("n_train").cast("long").alias("n_train"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("n_scored").cast("long").alias("n_scored"),
        F.col("n_correct").cast("long").alias("n_correct"),
        F.round(
            F.col("n_correct").cast("double") / F.col("n_scored"), 6
        ).alias("accuracy"),
    )


O_MARKOV_ACCURACY = f"""
WITH e AS (SELECT user_id, event_id, event_type,
                  floor(epoch(ts))::bigint AS t,
                  floor(floor(epoch(ts))::bigint / 86400)::bigint AS day
           FROM events),
tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                ORDER BY t, event_id) AS prev,
              event_type AS nxt, day
       FROM e),
t1 AS (SELECT * FROM tr WHERE prev IS NOT NULL),
d0 AS (SELECT min(day) AS d0 FROM t1),
t2 AS (SELECT prev, nxt,
              (day < d0 + {MARKOV_SPLIT_DAY_OFFSET}) AS is_train
       FROM t1 CROSS JOIN d0),
tc AS (SELECT prev, nxt, count(*)::bigint AS c FROM t2
       WHERE is_train GROUP BY 1, 2),
model AS (SELECT prev, nxt AS pred FROM (
            SELECT prev, nxt, row_number() OVER (PARTITION BY prev
              ORDER BY c DESC, nxt ASC) AS r FROM tc) WHERE r = 1),
tot AS (SELECT sum(is_train::int)::bigint AS n_train,
               sum((NOT is_train)::int)::bigint AS n_test
        FROM t2),
sc AS (SELECT sum((pred IS NOT NULL)::int)::bigint AS n_scored,
              sum((pred = nxt)::int)::bigint AS n_correct
       FROM (SELECT t2.nxt, model.pred
             FROM t2 LEFT JOIN model ON model.prev = t2.prev
             WHERE NOT is_train))
SELECT n_train, n_test, n_scored, n_correct,
       round(n_correct::double / n_scored, 6) AS accuracy
FROM tot CROSS JOIN sc
"""


def q_ols_discount_qty(spark, sf_dir):
    """Simple OLS regression twin (the missing member of the stats
    family next to correlation/ANOVA): quantity regressed on discount
    percent over lineitem — slope, intercept, and r², all from the five
    exact int64 sums (n, Σx, Σy, Σxy, Σx², Σy²) of integer-cast
    columns, so both engines run identical float ops on identical
    integers. ONE map-side-combined aggregate over the fact scan; the
    closed form needs no iteration."""
    li = _lineitem(spark, sf_dir)
    x = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_quantity")).cast("long")
    s = li.select(x.alias("x"), y.alias("y")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    slope = num / denx
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    return s.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    )


O_OLS_DISCOUNT_QTY = """
WITH s AS (SELECT count(*)::bigint AS n,
                  sum(round(l_discount * 100)::bigint)::bigint AS sx,
                  sum(round(l_quantity)::bigint)::bigint AS sy,
                  sum(round(l_discount * 100)::bigint
                      * round(l_quantity)::bigint)::bigint AS sxy,
                  sum(round(l_discount * 100)::bigint
                      * round(l_discount * 100)::bigint)::bigint AS sxx,
                  sum(round(l_quantity)::bigint
                      * round(l_quantity)::bigint)::bigint AS syy
           FROM lineitem)
SELECT n,
       round((n::double * sxy - sx::double * sy)
             / (n::double * sxx - sx::double * sx), 6) AS slope,
       round((sy - ((n::double * sxy - sx::double * sy)
                    / (n::double * sxx - sx::double * sx)) * sx)
             / n::double, 6) AS intercept,
       round((n::double * sxy - sx::double * sy)
             * (n::double * sxy - sx::double * sy)
             / ((n::double * sxx - sx::double * sx)
                * (n::double * syy - sy::double * sy)), 6) AS r2
FROM s
"""


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation (the classic marketing rollup): per user,
    Recency = days since last purchase (vs the window end), Frequency =
    purchase count, Monetary = exact purchase cents; each scored 1–3 by
    comparison against the metric's exact interpolated tercile edges
    (1 = best: low recency, high frequency/monetary). Edge-based
    scoring — NOT ntile — because ntile needs a single-partition global
    window over the user dimension, which grows with the data; the
    edges are a 1-row broadcast and the scoring is a codegen
    comparison, so the plan stays distributed at any user count.
    Output: segment counts with average monetary (exact cents)."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.floor(sec / 86400).cast("long").alias("_day"),
        cents.alias("_c"),
    )
    maxday = e.agg(F.max("_day").alias("_maxd"))
    u = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("_day").alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            F.sum("_c").alias("monetary_c"),
        )
        .crossJoin(F.broadcast(maxday))
        .withColumn("recency_d", F.col("_maxd") - F.col("_last"))
    )
    edges = u.agg(
        *[
            F.round(F.expr(f"percentile({c}, {q}D)"), 6).alias(
                f"_{c}_{int(q * 100)}"
            )
            for c in ("recency_d", "frequency", "monetary_c")
            for q in (1.0 / 3.0, 2.0 / 3.0)
        ]
    )

    def score(c, asc):
        lo, hi = F.col(f"_{c}_33"), F.col(f"_{c}_66")
        v = F.col(c).cast("double")
        if asc:  # low = best (recency)
            return (
                F.lit(1)
                + (v > lo).cast("long")
                + (v > hi).cast("long")
            )
        return (
            F.lit(1) + (v < hi).cast("long") + (v < lo).cast("long")
        )

    scored = u.crossJoin(F.broadcast(edges)).select(
        "user_id",
        "monetary_c",
        score("recency_d", True).alias("r"),
        score("frequency", False).alias("f"),
        score("monetary_c", False).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(
                F.sum("monetary_c").cast("double")
                / F.count("*")
                / 100.0,
                6,
            ).alias("avg_monetary"),
        )
        .orderBy("r", "f", "m")
    )


O_RFM_SEGMENTS = """
WITH e AS (SELECT user_id, event_type,
                  floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  round(value * 100)::bigint AS c
           FROM events),
md AS (SELECT max(day) AS maxd FROM e),
u AS (SELECT user_id, maxd - max(day) AS recency_d,
             count(*)::bigint AS frequency,
             sum(c)::bigint AS monetary_c
      FROM e CROSS JOIN md WHERE event_type = 'purchase'
      GROUP BY user_id, maxd),
edges AS (SELECT
            round(quantile_cont(recency_d, 1.0/3.0), 6) AS r33,
            round(quantile_cont(recency_d, 2.0/3.0), 6) AS r66,
            round(quantile_cont(frequency, 1.0/3.0), 6) AS f33,
            round(quantile_cont(frequency, 2.0/3.0), 6) AS f66,
            round(quantile_cont(monetary_c, 1.0/3.0), 6) AS m33,
            round(quantile_cont(monetary_c, 2.0/3.0), 6) AS m66
          FROM u),
scored AS (SELECT user_id, monetary_c,
             (1 + (recency_d::double > r33)::int
                + (recency_d::double > r66)::int)::bigint AS r,
             (1 + (frequency::double < f66)::int
                + (frequency::double < f33)::int)::bigint AS f,
             (1 + (monetary_c::double < m66)::int
                + (monetary_c::double < m33)::int)::bigint AS m
           FROM u CROSS JOIN edges)
SELECT r, f, m, count(*)::bigint AS n_users,
       round(sum(monetary_c)::double / count(*) / 100.0, 6)
         AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY r, f, m
"""


def q_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier survival curve of inter-purchase time (the churn
    panel's 'how long until the next purchase, censoring included'):
    observations are per-user consecutive-purchase gaps in days (event,
    d=1) plus each user's open gap from the last purchase to the window
    end (right-censored). At each distinct event time t,
    S(t) = Π(1 − d_i/n_i) folds as exp of a running Σln over the
    time-ORDERED risk table — a cumulative window in a total order is
    sequential on both engines, so the float fold is order-pinned.
    n_risk/d counts are exact integers; the risk table is
    distinct-gap-sized, never event-sized."""
    sec = F.col("ts").cast("timestamp").cast("long")
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.floor(sec / 86400).cast("long").alias("_day"),
    )
    maxday = e.agg(F.max("_day").alias("_maxd"))
    p = e.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("_day", "event_id")
    gaps = p.select(
        "user_id",
        (F.col("_day") - F.lag("_day").over(w)).alias("t"),
    ).filter(F.col("t").isNotNull()).select(
        "t", F.lit(1).alias("observed")
    )
    last = p.groupBy("user_id").agg(F.max("_day").alias("_last"))
    censored = (
        last.crossJoin(F.broadcast(maxday))
        .select(
            (F.col("_maxd") - F.col("_last")).alias("t"),
            F.lit(0).alias("observed"),
        )
    )
    obs = gaps.unionAll(censored)
    risk = (
        obs.groupBy("t")
        .agg(
            F.count("*").cast("long").alias("n_at_t"),
            F.sum("observed").cast("long").alias("d"),
        )
    )
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = obs.count()
    risk2 = risk.withColumn(
        "n_risk",
        F.lit(total)
        - F.coalesce(
            F.sum("n_at_t").over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    # d == n_risk can only happen on the LAST risk row (after it the
    # risk set is empty); there S(t) = 0 exactly — guard the ln.
    lnterm = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    surv = risk2.filter(F.col("d") > 0).withColumn(
        "survival",
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
            F.round(F.exp(F.sum(lnterm).over(wcum)), 6)
        ),
    )
    _ = wt
    return surv.select(
        F.col("t").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "d",
        "survival",
    ).orderBy("t_days")


O_KAPLAN_MEIER = """
WITH e AS (SELECT user_id, event_id, event_type,
                  floor(floor(epoch(ts))::bigint / 86400)::bigint AS day
           FROM events),
md AS (SELECT max(day) AS maxd FROM e),
p AS (SELECT user_id, event_id, day FROM e WHERE event_type = 'purchase'),
gaps AS (SELECT t, 1 AS observed FROM (
           SELECT day - lag(day) OVER (PARTITION BY user_id
             ORDER BY day, event_id) AS t
           FROM p) WHERE t IS NOT NULL),
censored AS (SELECT maxd - max(day) AS t, 0 AS observed
             FROM p CROSS JOIN md GROUP BY user_id, maxd),
obs AS (SELECT * FROM gaps UNION ALL SELECT * FROM censored),
tot AS (SELECT count(*)::bigint AS total FROM obs),
risk AS (SELECT t, count(*)::bigint AS n_at_t,
                sum(observed)::bigint AS d
         FROM obs GROUP BY t),
risk2 AS (SELECT t, d,
                 total - coalesce(sum(n_at_t) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM risk CROSS JOIN tot)
SELECT t AS t_days, n_risk::bigint AS n_risk, d,
       CASE WHEN d = n_risk THEN 0.0 ELSE
         round(exp(sum(CASE WHEN d < n_risk
                       THEN ln(1 - d::double / n_risk) ELSE 0 END)
                   OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)), 6) END AS survival
FROM risk2 WHERE d > 0 ORDER BY t_days
"""


# --------------------------------------------------------------------- #
