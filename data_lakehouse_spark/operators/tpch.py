"""TPC-H-shaped relational battery over the synthetic lakehouse tables.

Widens the engine's verified relational surface past the reference's own
query shapes (SURVEY.md §2.3-§2.7): correlated EXISTS / NOT EXISTS
(decorrelated to semi/anti joins), scalar-aggregate subqueries folded to
broadcast literals, OR'd multi-predicate pushdown, left-join count
distributions, and view-over-aggregate maxima — the classic TPC-H
decision-support shapes, adapted to the columns the synthetic tables
carry (no partsupp / commitdate / receiptdate / comment).

Every function is a pure DataFrame builder: filters sit before joins so
they push to the parquet scans, dimension sides are broadcast
explicitly, and the only big-big shuffles are lineitem ⋈ orders (and
lineitem self-joins for the correlated quantifiers) keyed on
l_orderkey. Money follows the repo-wide determinism contract: accumulate
DECIMAL(12,2), cast DOUBLE, round half-up — so every query hash-matches
its DuckDB oracle cell-for-cell.

Plan notes per query live in the docstrings; shapes are pinned in
tests/test_plans.py (semi/anti join operators, broadcast dims, pushed
filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D12 = "decimal(12,2)"
_D4 = "decimal(4,2)"


def _rev() -> Column:
    """l_extendedprice * (1 - l_discount), decimal-exact."""
    one = F.lit(1).cast(_D4)
    return F.col("l_extendedprice").cast(_D12) * (one - F.col("l_discount").cast(_D4))


def _ts(s: str) -> Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


def q4_late_shipment_exists(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders with a correlated
    EXISTS (here: any line shipped >60 days after the order date).

    Plan: LEFT SEMI join orders ⋈ lineitem on the equi key l_orderkey
    with the non-equi shipping-lag predicate as the join residual — the
    classic EXISTS decorrelation. One shuffle on the order key; the
    date range filter pushes to the orders scan.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: single-table filter + global agg. All three predicates
    push to the parquet scan (shipdate range also skips via footer
    min/max); the agg is a map-side partial + single-row final."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(F.col("l_extendedprice").cast(_D12) * F.col("l_discount").cast(_D4))
        .cast("double")
        .alias("revenue")
    )


def q7_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation dimension is joined twice under different
    roles (supplier nation / customer nation) — both broadcast; the
    pair filter collapses each broadcast side to ≤2 rows before the
    join. lineitem ⋈ orders is the single big-big shuffle."""
    pair = [nation_a, nation_b]
    n1 = (
        nation.filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("supp_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        nation.filter(F.col("n_name").isin(pair))
        .select(
            F.col("n_nationkey").alias("cust_nationkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") <= _ts("1996-12-31"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_6",
    target_region: str = "AMERICA",
    target_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of regional volume by
    order year — a conditional-sum ratio over a 6-table join. Part,
    customer, nation, region broadcast; the region membership prunes
    the customer side before the fact join; the share is the repo's
    NULLIF-free decimal ratio rounded half-up."""
    amer_cust = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == target_region)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("s_suppkey").alias("sn_suppkey"),
        F.col("n_name").alias("supp_nation"),
    )
    o = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") <= _ts("1997-12-31"))
    )
    joined = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == target_type).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(amer_cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("sn_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, _rev()).otherwise(
                F.lit(0).cast(_D12)
            )).cast("double").alias("_num"),
            F.sum(_rev()).cast("double").alias("_den"),
        )
        .select(
            "o_year",
            (F.floor(F.col("_num") / F.col("_den") * 10000 + F.lit(0.5)) / 10000).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


def q10_returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. lineitem ⋈ orders shuffles on the order key; customer and
    nation broadcast; the returnflag filter pushes to the lineitem scan
    and the quarter filter to the orders scan. Top-20 is
    TakeOrderedAndProject — no global sort materialization."""
    o = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q12_ship_delay_priority(
    lineitem: DataFrame, orders: DataFrame, slow_days: int = 90
) -> DataFrame:
    """TPC-H Q12 shape (shipmode → derived ship-delay band): lines
    shipped in 1996 banded SLOW/FAST by shipping lag, counting
    high-priority vs low-priority orders per band — the conditional
    count idiom over a derived grouping key. Single shuffle on
    l_orderkey, then a 2-group agg."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "ship_band",
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > slow_days,
                F.lit("SLOW"),
            ).otherwise(F.lit("FAST")),
        )
        .groupBy("ship_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: the order-count histogram over ALL customers — a LEFT
    OUTER join (zero-order customers must survive with count 0, so the
    filter lives on the build side, not in WHERE) followed by two
    aggregations. First agg shuffles on o_custkey; the second input is
    |distinct counts| rows — trivial."""
    o = orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship-month — conditional
    sum over lineitem ⋈ broadcast(part), single-row output. The month
    filter pushes to the lineitem scan."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast(_D12))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("_num"),
            F.sum(_rev()).cast("double").alias("_den"),
        )
        .select(
            (F.floor(F.col("_num") / F.col("_den") * 10000 + F.lit(0.5)) / 100).alias(
                "promo_revenue_pct"
            )
        )
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15: the revenue view + scalar MAX subquery. The view aggs
    one quarter of lineitem per supplier (one shuffle, ~|suppliers|
    rows); the MAX folds to a 1-row broadcast joined back — no second
    scan, no unpartitioned window."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_max"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: int = 300,
) -> DataFrame:
    """TPC-H Q18: orders whose total quantity clears a threshold — the
    IN-(grouped-HAVING-subquery) decorrelated to an aggregated semi
    side joined back. lineitem aggs once on l_orderkey (map-side
    partials make the shuffle small), the surviving keys re-join orders
    and broadcast customer."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > qty_threshold)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd (brand, size-band, qty-band)
    predicate triplets — the disjunctive-pushdown stress shape. The
    part-side brand/size disjunction prunes the broadcast build side;
    the quantity/returnflag conjuncts common to all branches push to
    the lineitem scan; the cross-branch residual evaluates post-join."""
    li = lineitem.filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
        & (F.col("l_returnflag") != "A")
    )
    p = part.filter(
        (
            (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
        )
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#15") & (F.col("p_size").between(1, 15)))
    ).select("p_partkey", "p_brand")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


def q21_waiting_suppliers(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who shipped LAST on multi-supplier
    completed orders — correlated EXISTS (another supplier on the
    order) and NOT EXISTS (another supplier shipped later).

    Decorrelation, AGGREGATE FORM (not self-joins): the naive rewrite
    is two lineitem self semi/anti joins on l_orderkey — three
    full-lineitem shuffles once the self-join sides outgrow broadcast,
    which is exactly what round-6's scale check caught (12.6× at a 10×
    step: at the small scale every side broadcast, at 10× the semi and
    anti flipped to sort-merge — a plan-regime cliff, not key skew).
    Both EXISTS conditions only need per-order ORDER STATISTICS, so
    they fold into one per-(orderkey, suppkey) MAX(shipdate) aggregate
    (map-side combine shrinks lineitem before its one shuffle) plus a
    window over that compact frame:

    - EXISTS other supplier        ⇔ distinct suppliers per order ≥ 2
    - NOT EXISTS later shipper     ⇔ row.shipdate ≥ max shipdate of
      the OTHER suppliers, which is m1 (the order's max per-supplier
      shipdate) unless this supplier is its UNIQUE argmax, then m2.

    Only a supplier at m1 can qualify (anyone below has a later
    shipper), so the join-back side collapses to ~1 row per order
    BEFORE touching lineitem again. Full-size shuffles: ONE of
    lineitem (the join back on (l_orderkey, l_suppkey)) + the combined
    per-(order,supplier) aggregate — no self-join regime cliff at any
    scale; supplier broadcasts at the end."""
    from pyspark.sql import Window

    # One exchange for BOTH the aggregate and the window (guide §2.4):
    # hash-repartition on l_orderkey alone — that satisfies the
    # (l_orderkey, l_suppkey) aggregate's clustered distribution AND the
    # order-stats window's, so the plan holds one full-width exchange
    # where EnsureRequirements would otherwise insert two back to back
    # (agg keyed (order, supp), then re-exchange on order for the
    # window). Group reduction per (order, supp) is ~1.3× so the lost
    # pre-exchange partial aggregation costs less than the second
    # shuffle it replaced.
    per_os = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("l_shipdate").alias("_smax"),
            # NULL-shipdate parity with the EXISTS form: `l3_shipdate >
            # NULL` is never a match, so the anti-join KEEPS a NULL-ship
            # row — such rows must stay candidates here too
            F.max(F.col("l_shipdate").isNull().cast("int")).alias("_has_null"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    per = (
        per_os.withColumn("_m1", F.max("_smax").over(w))
        .withColumn("_nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "_n_at_m1",
            F.sum(
                F.when(F.col("_smax") == F.col("_m1"), 1).otherwise(0)
            ).over(w),
        )
        .withColumn(
            "_m2",
            F.max(
                F.when(F.col("_smax") < F.col("_m1"), F.col("_smax"))
            ).over(w),
        )
    )
    cand = per.filter(
        (F.col("_nsupp") >= 2)
        & (
            (F.col("_smax") == F.col("_m1"))  # supplier at the order max
            | (F.col("_has_null") == 1)  # or holding NULL-ship rows
        )
    ).select(
        "l_orderkey",
        "l_suppkey",
        # max shipdate among the OTHER suppliers of the order (NULL
        # _smax never equals _m1, so all-NULL suppliers fall to _m1)
        F.when(
            (F.col("_smax") == F.col("_m1")) & (F.col("_n_at_m1") == 1),
            F.col("_m2"),
        )
        .otherwise(F.col("_m1"))
        .alias("_mother"),
    )
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    waited = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(cand, ["l_orderkey", "l_suppkey"])
        .filter(
            F.col("l_shipdate").isNull()  # NULL > NULL / x > NULL never match
            | (F.col("l_shipdate") >= F.col("_mother"))
            | F.col("_mother").isNull()  # other suppliers all NULL-ship
        )
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        waited.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def q2_min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_region: str = "EUROPE",
    target_type: str = "SMALL",
    max_size: int = 15,
) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: supply cost derives from lineitem
    sale history as MIN(l_extendedprice / l_quantity) per part+supplier):
    for small parts, the region supplier(s) achieving the per-part
    minimum cost — the classic correlated scalar-MIN subquery on the
    join key, decorrelated to a per-part min aggregate joined back on
    (part, cost).

    Plan: region suppliers resolve via two broadcast dim joins and stay
    broadcast against lineitem; the (part, supp) cost agg shuffles once
    on a two-column key; the per-part MIN is a window PARTITIONED BY
    l_partkey over that tiny agg output — lineitem scans exactly once
    (a separate min re-aggregate branch would defeat exchange reuse:
    Spark collapses agg-over-agg into a direct scan-level aggregate with
    a different exchange, forcing a second scan). Unit price is a plain
    double division — bit-identical across engines, so the min-equality
    filter needs no epsilon.
    """
    from pyspark.sql import Window
    rs = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == target_region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        lineitem.join(
            F.broadcast(rs.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
        )
    )
    p = part.filter(
        (F.col("p_type") == target_type) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand")
    part_cost = cost.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        part_cost.withColumn("_min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("_min_cost"))
        .join(F.broadcast(rs), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_type_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape (no partsupp: cost basis is 60% of the part's
    retail price): profit per supplier nation per ship year over parts
    whose name carries a token. All three dimensions broadcast; the
    single shuffle is the (nation, year) aggregation. Every term is
    decimal-exact (retailprice and quantity have ≤2 fractional digits),
    so the signed sum is order-independent and hash-stable.
    """
    p = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    cost = (
        F.col("p_retailprice").cast(_D12)
        * F.col("l_quantity").cast("decimal(4,0)")
        * F.lit(0.6).cast("decimal(2,1)")
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            "p_partkey",
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_part_values(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_3",
    fraction: float = 0.0001,
) -> DataFrame:
    """TPC-H Q11 shape (no partsupp: "stock value" is revenue shipped by
    one nation's suppliers): per-part value with a HAVING against a
    scalar fraction-of-total subquery. The grand total folds to a
    one-row broadcast against the per-part aggregate — never an
    unpartitioned window.

    Deliberate trade: the diamond (per-part + total over the same
    scope) re-reads lineitem for the total branch, because Spark
    collapses agg-over-agg into a direct scan-level aggregate whose
    exchange differs from the per-part branch (no ReusedExchange; a
    rollup over grouping sets hits the same wall — the grouping-id
    filter pushes into the Expand and splits the subtrees). Both scans
    are pruned to the same four columns (pinned in tests); at warehouse
    scale the per-part aggregate is exactly the kind of mart the
    catalog materializes incrementally (plans/cdc.py), which removes
    the recompute entirely.
    """
    ns = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == target_nation)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    scope = lineitem.join(
        F.broadcast(ns), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = scope.groupBy("l_partkey").agg(F.sum(_rev()).alias("_value_d"))
    total = scope.agg(
        (F.sum(_rev()).cast("double") * F.lit(fraction)).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_value_d").cast("double") > F.col("_threshold"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("_value_d").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q16_supplier_count_by_descriptor(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = "Brand#12",
    excluded_type: str = "ECONOMY",
    sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22, 25, 28),
) -> DataFrame:
    """TPC-H Q16 shape (no partsupp: supply relationships come from
    lineitem shipping history; the complaint filter is a negative
    account balance): distinct-supplier counts per part descriptor with
    a NOT IN subquery decorrelated to a broadcast anti join. The only
    shuffle is the COUNT DISTINCT aggregation keyed on the descriptor.
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != excluded_brand)
        & (F.col("p_type") != excluded_type)
        & (F.col("p_size").isin(*sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_heavy_shippers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "small",
    target_nation: str = "NATION_5",
    qty_threshold: int = 30,
) -> DataFrame:
    """TPC-H Q20 shape (no partsupp: availability inverts to shipped
    volume): suppliers in one nation who shipped more than a threshold
    quantity of any name-prefixed part in 1996 — the nested
    IN-(IN-subquery) chain decorrelated to two broadcast semi joins
    around a (supp, part) aggregate. Quantity sums accumulate decimal so
    the HAVING boundary is engine-independent.
    """
    pk = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    heavy = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_D12)).alias("_q"))
        .filter(F.col("_q") > qty_threshold)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == target_nation)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no completed order,
    bucketed by country code (nationkey mod 10 stands in for the phone
    prefix). The scalar AVG subquery folds to a one-row broadcast; the
    NOT EXISTS is a left anti join on o_custkey. Both scans are the
    small dimension tables; nothing touches lineitem."""
    # Average from an order-independent decimal sum so the comparison
    # boundary is bit-identical across engines and partitionings.
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_D12)).cast("double")
            / F.count("*").cast("double")
        ).alias("_avg_bal")
    )
    completed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(completed, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .withColumn("cntrycode", (F.col("c_nationkey") % 10).cast("bigint"))
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_D12)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
