"""Relational analytics workloads (TPC-H-shaped) over the engine's
tables.

These are the WOQL-equivalent analytical workloads a terminus-server
user would express with group_by/sum/order_by over the knowledge
graph; here they run directly on the relational projections for
bench-grade performance (the WOQL layer lowers to the same DataFrame
plans).

Determinism note for the DuckDB oracle: every money aggregate does
per-row arithmetic in double (IEEE-exact given identical inputs),
casts to decimal(28,6) *before* SUM (decimal addition is
order-independent), and casts the final result back to double — the
same bits fall out of Spark and DuckDB regardless of partitioning or
aggregation order.

Scale notes: filters sit directly on scan columns (pushdown),
dimension joins (region/nation/supplier/part at TPC-H ratios) are
explicitly broadcast, fact-fact joins shuffle on their keys and AQE
handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from terminus_server_spark.checkpoint import plan_checkpoint

DEC = "decimal(28,6)"


def _dsum(col: F.Column) -> F.Column:
    """Order-independent sum of a double expression (see module doc)."""
    return F.sum(col.cast(DEC)).cast("double")


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + wide aggregate.

    Single scan, map-side partial agg; the shipdate filter prunes at
    the scan (pushdown verified in tests/test_plans.py)."""
    l = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Q3 shape: selective dim filter → 3-way join → top-k.

    customer is dimension-sized → broadcast; orders⋈lineitem shuffles
    on orderkey."""
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t["orders"].where(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
    l = t["lineitem"].where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q4_order_priority(t: dict[str, DataFrame]) -> DataFrame:
    """Q4 shape: EXISTS semi-join + group count."""
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    l = t["lineitem"].where(F.col("l_quantity") > 49).select("l_orderkey").distinct()
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5_local_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Q5 shape: star join across 6 tables; all dims broadcast, the
    only shuffles are lineitem⋈orders on orderkey and the final agg."""
    r = t["region"].where(F.col("r_name") == "ASIA")
    n = t["nation"]
    c = t["customer"]
    s = t["supplier"]
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = t["lineitem"]
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(s.select("s_suppkey", "s_nationkey")), l["l_suppkey"] == s["s_suppkey"])
        .join(
            broadcast(c.select("c_custkey", "c_nationkey")),
            (o["o_custkey"] == c["c_custkey"]) & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """Q6 shape: ultra-selective scan-agg; every predicate pushes to
    parquet row-group stats."""
    l = t["lineitem"]
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def q14_promo(t: dict[str, DataFrame]) -> DataFrame:
    """Q14 shape: broadcast dim join + conditional aggregate ratio."""
    l = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = t["part"].select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("ECON"), disc).otherwise(F.lit(0.0))
    return (
        l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            (F.lit(100.0) * _dsum(promo) / _dsum(disc)).alias("promo_revenue")
        )
    )


def win_rank_topn(t: dict[str, DataFrame]) -> DataFrame:
    """Window rank: top-3 orders by totalprice per priority class."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t["orders"]
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_orderpriority", "rk")
    )


def semi_anti(t: dict[str, DataFrame]) -> DataFrame:
    """Customers with orders but no high-value order (semi + anti)."""
    o = t["orders"]
    big = o.where(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    any_o = o.select("o_custkey").distinct()
    c = t["customer"]
    return (
        c.join(any_o, c["c_custkey"] == any_o["o_custkey"], "left_semi")
        .join(big, c["c_custkey"] == big["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def events_sessionize(t: dict[str, DataFrame], gap_minutes: int = 30) -> DataFrame:
    """Sessionization via window lag — the batch shape of the
    streaming session operator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires TIMESTAMP (LTZ); events.ts arrives as the
    # canonical TIMESTAMP_NTZ — session tz is UTC so the cast is exact
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    e = t["events"].withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    e = e.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        e.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


def q7_nation_volume(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q7 shape: fact joined to two role-playing dimension
    chains (supplier-nation and customer-nation), volume by nation
    pair and year.

    Both nation sides broadcast (25 rows at any SF); the
    lineitem-orders join is the only shuffle. Cross-filter on the
    nation pair happens after both broadcasts so Catalyst can push
    each side's equi-condition into its hash join."""
    n1 = broadcast(t["nation"].select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = broadcast(t["nation"].select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    s = broadcast(t["supplier"].select("s_suppkey", "s_nationkey"))
    c = t["customer"].select("c_custkey", "c_nationkey")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1998-12-31").cast("timestamp"))
        )
        .join(t["orders"].select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q10_returned_items(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.

    Filters (returnflag, orderdate range) sit on the scans; the
    customer join keys on c_custkey after the fact-fact join has
    already reduced cardinality."""
    l = t["lineitem"].where(F.col("l_returnflag") == "R")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    n = broadcast(t["nation"])
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q13_order_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution via left
    outer join + double aggregation.

    The outer join preserves zero-order customers; first agg is
    per-customer (shuffles on c_custkey), second agg is on the tiny
    count domain (map-side partial agg makes it nearly free)."""
    o = t["orders"].where(~F.col("o_orderpriority").startswith("1")).select("o_custkey", "o_orderkey")
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q17_small_quantity(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — lineitems below
    20% of their part's average quantity.

    Decorrelated as an aggregate-then-join: per-part avg is computed
    once (shuffle on l_partkey), then joined back. The brand filter
    broadcasts the surviving part keys into both sides so the big
    scan only keeps matching rows."""
    p = broadcast(t["part"].where(F.col("p_brand") == "Brand#23").select("p_partkey"))
    l = t["lineitem"].join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg(F.col("l_quantity").cast(DEC)).cast("double") * 0.2).alias("threshold")
    )
    return (
        l.join(broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg((_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


def q18_large_volume(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q18 shape: group-by-having on the fact, then join the
    survivors back to orders/customer.

    The having-filter output (few keys) broadcasts into the orders
    join, so only one wide shuffle (the per-order quantity sum)
    touches lineitem."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 212)
    )
    return (
        t["orders"]
        .join(broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q19_disjunctive(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates across a join.

    The common p_partkey = l_partkey equi-condition stays a hash
    join; the OR-of-ANDs residual is evaluated post-join inside
    whole-stage codegen. Part is broadcast (dimension-sized)."""
    p = broadcast(t["part"])
    l = t["lineitem"]
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(20, 30)))
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q22_global_sales(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (avg positive balance) +
    anti-join (customers with no orders), grouped by nation.

    The scalar average is computed once and broadcast as a literal
    cross-join (1-row DataFrame); the anti-join is a shuffle-free
    broadcast-anti at dimension-ish cardinality under AQE. ("No
    high-value order" stands in for TPC-H's 7-year dormancy window —
    the synthetic data has no orderless customers.)"""
    c = t["customer"]
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg(F.col("c_acctbal").cast(DEC)).cast("double").alias("avg_bal")
    )
    has_order = (
        t["orders"]
        .where(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(has_order, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q2_min_cost_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Q2 shape: correlated-min subquery over a multi-dim join
    (adapted: no partsupp table in the driver's schema, so the
    supplier's unit price l_extendedprice/l_quantity plays
    ps_supplycost).  The per-part minimum is decorrelated into an
    aggregate + equi-join-back; all dims broadcast."""
    p = t["part"].where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
    eur_sup = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        t["lineitem"]
        .join(broadcast(p.select("p_partkey", "p_name")), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(eur_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    part_min = offers.groupBy(F.col("p_partkey").alias("mp")).agg(F.min("unit_cost").alias("min_cost"))
    return (
        offers.join(broadcast(part_min),
                    (F.col("p_partkey") == F.col("mp")) & (F.col("unit_cost") == F.col("min_cost")))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q8_market_share(t: dict[str, DataFrame]) -> DataFrame:
    """Q8 shape: double-dim-chain join (supplier nation vs customer
    nation/region) + conditional ratio aggregate per year."""
    n1 = t["nation"].select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    r = t["region"].where(F.col("r_name") == "AMERICA")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    all_nations = (
        t["lineitem"]
        .join(broadcast(t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "supp_nation")
    )
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                _dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / _dsum(F.col("volume"))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(t: dict[str, DataFrame]) -> DataFrame:
    """Q9 shape: LIKE-filtered part join + supplier-nation + year
    rollup (adapted: profit omits the missing ps_supplycost term)."""
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(broadcast(t["part"].where(F.col("p_name").like("%ring%")).select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_parts(t: dict[str, DataFrame]) -> DataFrame:
    """Q11 shape: group value rollup + scalar-subquery threshold
    (fraction of the global total; adapted to lineitem value since
    partsupp is absent).  The threshold is a broadcast single-row
    cross join, not a driver-side collect."""
    ger = (
        t["lineitem"]
        .join(broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"].where(F.col("n_name") == "NATION_7").select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    per_part = ger.groupBy("l_partkey").agg(_dsum(F.col("l_extendedprice")).alias("value"))
    total = ger.agg((_dsum(F.col("l_extendedprice")) * F.lit(0.001)).alias("threshold"))
    return (
        per_part.crossJoin(broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q12_priority_shipping(t: dict[str, DataFrame]) -> DataFrame:
    """Q12 shape: fact-fact join + conditional counts (adapted to the
    available columns: line status plays ship mode, order priority
    buckets are counted per group)."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"].select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q15_top_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Q15 shape: aggregate view + where-equals-max scalar subquery,
    decorrelated into a broadcast single-row join."""
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_cnt(t: dict[str, DataFrame]) -> DataFrame:
    """Q16 shape: distinct-supplier count per part attribute triple,
    with NOT-IN supplier exclusion (adapted: lineitem is the
    part-supplier bridge, negative-balance suppliers are the
    'complaints' exclusion)."""
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
    )
    return (
        t["lineitem"].select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_part_promotion(t: dict[str, DataFrame]) -> DataFrame:
    """Q20 shape: nested aggregate threshold → semi-join chain up to
    suppliers in one nation (adapted: shipped-qty-in-1996 plays
    ps_availqty)."""
    red_parts = t["part"].where(F.col("p_name").like("red%")).select("p_partkey")
    qty96 = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dsum(F.col("l_quantity")).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(broadcast(t["nation"].where(F.col("n_regionkey") == 2).select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(qty96, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_waiting_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """Q21 shape: self semi-join + self anti-join on the fact table
    (adapted: returnflag 'R' plays the late-delivery predicate) —
    suppliers who are the *only* 'R' supplier in a multi-supplier
    order."""
    l = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = l.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    l2 = l.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")).distinct()
    l3 = (
        l.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
        .distinct()
    )
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti")
        .join(t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    return (
        waiting.join(broadcast(t["supplier"].select("s_suppkey", "s_name")),
                     F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    k: int = 25,
    max_basket: int = 1000,
) -> DataFrame:
    """(antecedent, consequent, c_pair, c_ante, c_cons, support,
    confidence, lift): market-basket ASSOCIATION RULES (Agrawal's
    support/confidence framework + lift) over a (basket, item)
    relation — the recommendation / cross-sell primitive beside the
    repo's co-occurrence projection.  Directed rules, both
    orientations of each co-occurring pair, ranked by lift with a
    deterministic (lift desc, antecedent, consequent) total order.

    Scale shape: candidate pairs are generated ONLY through the
    per-basket self-join (cost Σ_b |b|² after one shuffle on the
    basket key — never item² or basket-count²), and baskets larger
    than ``max_basket`` are dropped from pair generation AND the
    margins (a degenerate everything-basket is the deg² blowup; the
    same cap rationale as the shared-feature fanout guard).  All
    counts integer; the three ratios are single double divisions of
    exact integers, so the output is engine-portable bit-for-bit."""
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    keep = (
        bi.groupBy("b")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") <= max_basket)
        .select("b")
    )
    bi = bi.join(keep, "b", "left_semi").transform(plan_checkpoint)
    n = bi.select("b").distinct().count()
    item_counts = bi.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    a = bi.select("b", F.col("i").alias("antecedent"))
    c = bi.select("b", F.col("i").alias("consequent"))
    pairs = (
        a.join(c, "b")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("c_pair"))
        .where(F.col("c_pair") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("i").alias("antecedent"), F.col("c").alias("c_ante")
    )
    cc = item_counts.select(
        F.col("i").alias("consequent"), F.col("c").alias("c_cons")
    )
    out = (
        pairs.join(ca, "antecedent")
        .join(cc, "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("c_pair").cast("bigint").alias("c_pair"),
            F.col("c_ante").cast("bigint").alias("c_ante"),
            F.col("c_cons").cast("bigint").alias("c_cons"),
            (F.col("c_pair").cast("double") / F.lit(float(n))).alias(
                "support"
            ),
            (
                F.col("c_pair").cast("double")
                / F.col("c_ante").cast("double")
            ).alias("confidence"),
            (
                (F.col("c_pair") * F.lit(n)).cast("double")
                / (F.col("c_ante") * F.col("c_cons")).cast("double")
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(k)
