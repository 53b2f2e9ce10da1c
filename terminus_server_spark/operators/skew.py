"""Skew mitigation (SURVEY §4 rule 8).

AQE's skew-join splitting handles sort-merge skew at runtime, but two
cases still need explicit salting at 100 TB: (a) a hot join key whose
matching dim rows must be replicated (AQE can split a partition, not
re-broadcast), and (b) hot grouping keys in high-cardinality aggs
where a single reducer partition would spill.

Both helpers preserve exact semantics — they only change the
partitioning — and tests assert result-equality with the unsalted
plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salt: int = 16, how: str = "inner"
) -> DataFrame:
    """Equi-join robust to hot fact keys: fact rows get a salt in
    [0, n_salt), the dim side is replicated n_salt ways, and the join
    runs on (key, salt) — a hot key's rows spread over n_salt
    partitions instead of one straggler.

    Cost model: dim side pays n_salt× replication, so use this when
    dim is small-ish but above the broadcast threshold and the fact
    key histogram is heavy-tailed."""
    salted_fact = fact.withColumn(
        "__salt__", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("__salt__")
    salted_dim = dim.select("*", salts)
    return salted_fact.join(salted_dim, [key, "__salt__"], how).drop("__salt__")


def salted_aggregate(
    df: DataFrame, group_cols: list[str], agg_exprs: dict, n_salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: first aggregate on
    (group_cols, salt) — spreading a hot group across partitions —
    then combine the partials.  agg_exprs: out_col -> ("sum"|"count"|
    "min"|"max", in_col).  (avg decomposes to sum/count by callers.)

    Note Spark's hash aggregate already does map-side partials; this
    helps when the *reduce* side of one group exceeds a partition —
    i.e. extreme skew with high-cardinality distinct-ish state."""
    first, second = [], []
    for out, (fn, col) in agg_exprs.items():
        if fn == "count":
            first.append(F.count(col).alias(out))
            second.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            first.append(F.sum(col).alias(out))
            second.append(F.sum(out).alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(out))
            second.append(F.min(out).alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(out))
            second.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported agg {fn}")
    salted = df.withColumn(
        "__salt__", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy(*group_cols, "__salt__").agg(*first)
    return partial.groupBy(*group_cols).agg(*second)


def salted_topk(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int = 3,
    tiebreak_col: str | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """(key, rows...): exact per-key TOP-K under hot keys, two-phase:
    a window PARTITIONED BY (key, salt) keeps each salt slice's local
    top-k (a hot key's rows spread over n_salt partitions — the
    single-reducer straggler a plain per-key window builds at 100 TB),
    then the final per-key window ranks only the ≤ k·n_salt surviving
    candidates.  Exact because every global top-k row is in its own
    salt slice's local top-k (ranks only shrink when rows are
    removed).  Descending order; ``tiebreak_col`` ascending makes the
    selection deterministic under value ties."""
    from pyspark.sql.window import Window

    tb = [F.col(tiebreak_col).asc()] if tiebreak_col else []
    salted = df.withColumn(
        "__salt__",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int"),
    )
    w1 = Window.partitionBy(key_col, "__salt__").orderBy(
        F.col(order_col).desc(), *tb
    )
    local = (
        salted.withColumn("__rn__", F.row_number().over(w1))
        .where(F.col("__rn__") <= k)
        .drop("__rn__", "__salt__")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), *tb)
    return (
        local.withColumn("__rn__", F.row_number().over(w2))
        .where(F.col("__rn__") <= k)
        .withColumnRenamed("__rn__", "rk")
    )
