"""Query registry: every implemented capability from SURVEY.md §2
exposed as (spark, sf_dir) -> DataFrame plus a DuckDB oracle SQL
string for the driver's correctness gate.

Convention: every computed column is aliased identically in the Spark
plan and the SQL so the driver's sort-columns-by-name value-hash
matches.  Aggregates over doubles go through decimal(28,6) on BOTH
sides (see operators/relational.py module doc).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from terminus_server_spark.session import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, *names):
    return load_tables(spark, sf_dir, names or None)


# ---------------------------------------------------------------------------
# §2.5 relational analytics
# ---------------------------------------------------------------------------

DSUM = "CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def _dsum_sql(expr: str) -> str:
    return DSUM.format(expr=expr)


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum_sql('l_quantity')} AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
           {_dsum_sql('l_extendedprice')} / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    from terminus_server_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    from terminus_server_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(_t(spark, sf_dir, "lineitem", "orders", "customer"))


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-10-01'
      AND o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    from terminus_server_spark.operators.relational import q4_order_priority

    return q4_order_priority(_t(spark, sf_dir, "lineitem", "orders"))


@register(
    "q5_local_supplier",
    f"""
    SELECT n_name, {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q5(spark, sf_dir):
    from terminus_server_spark.operators.relational import q5_local_supplier

    return q5_local_supplier(
        _t(spark, sf_dir, "lineitem", "orders", "supplier", "customer", "nation", "region")
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT {_dsum_sql('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    from terminus_server_spark.operators.relational import q6_forecast_revenue

    return q6_forecast_revenue(_t(spark, sf_dir, "lineitem"))


@register(
    "q14_promo",
    f"""
    SELECT 100.0 * {_dsum_sql("CASE WHEN p_type LIKE 'ECON%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q14(spark, sf_dir):
    from terminus_server_spark.operators.relational import q14_promo

    return q14_promo(_t(spark, sf_dir, "lineitem", "part"))


@register(
    "win_rank_topn",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders)
    WHERE rk <= 3
    ORDER BY o_orderpriority, rk
    """,
)
def win_rank(spark, sf_dir):
    from terminus_server_spark.operators.relational import win_rank_topn

    return win_rank_topn(_t(spark, sf_dir, "orders"))


@register(
    "semi_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def semi_anti_q(spark, sf_dir):
    from terminus_server_spark.operators.relational import semi_anti

    return semi_anti(_t(spark, sf_dir, "customer", "orders"))


@register(
    "events_sessionize",
    """
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
    FROM (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events))
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionize_q(spark, sf_dir):
    from terminus_server_spark.operators.relational import events_sessionize

    return events_sessionize(_t(spark, sf_dir, "events"))
