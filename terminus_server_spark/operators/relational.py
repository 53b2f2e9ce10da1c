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
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
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
