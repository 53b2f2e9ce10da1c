"""Source/sink layout helpers (SURVEY §2.7, scale rules §4).

The 100 TB join strategy the reference can't express but Spark can:
persist both sides of a recurring equi-join **bucketed by the join
key** (hash-partitioned files + per-file sort).  Readers then join
bucket-to-bucket with NO shuffle exchange — the single biggest cost
on a 1000-executor cluster — and the property is verified in
``tests/test_plans.py`` by asserting the physical plan has zero
Exchange nodes on the join.

Parity note: terminusdb-store gets co-location for free because one
node holds the whole layer; bucketing is the distributed equivalent
of its subject-ordered triple files (terminusdb-store
src/layer/base.rs, public repo).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


_BUCKET_CACHE: dict[tuple, str] = {}


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8, path: str | None = None
) -> str:
    """Persist ``df`` as an external bucketed+sorted table; returns the
    registered table name.  Spark only applies bucketing metadata via
    the table catalog, hence saveAsTable with an explicit path."""
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="tss_bucketed_"), table_name)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table_name)
    )
    return table_name


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    cache_key: tuple | None = None,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Bucket-persist both sides of a recurring join (once per
    ``cache_key``) and return the catalog-backed frames whose join
    needs no shuffle."""
    names = (f"tss_b_{abs(hash(cache_key)) % 10**8}_l", f"tss_b_{abs(hash(cache_key)) % 10**8}_r")
    if cache_key is None or cache_key not in _BUCKET_CACHE:
        write_bucketed(left, names[0], left_key, n_buckets)
        write_bucketed(right, names[1], right_key, n_buckets)
        if cache_key is not None:
            _BUCKET_CACHE[cache_key] = names[0]
    return spark.table(names[0]), spark.table(names[1])


def compact_small_files(
    spark, src_path: str, dst_path: str, target_rows_per_file: int = 1_000_000
) -> None:
    """Small-file compaction: rewrite a directory of many small
    parquet files into ceil(rows/target) evenly-sized files — the
    table-maintenance pass every long-lived ingest needs (file-count
    explosion is the classic 100 TB operational failure: NameNode/
    listing pressure + per-file open cost dominate scans).

    repartition (round-robin) rather than coalesce: coalesce would
    skip the shuffle but chain small inputs unevenly; compaction runs
    rarely and wants even output sizes."""
    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)


def upsert_by_key(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keyed upsert (merge): update rows replace base rows with the
    same key, new keys append — the lakehouse MERGE INTO expressed as
    a plain DataFrame op for engines without a table format: one
    window over the key, newest version wins.  Cost scales with
    |base|+|updates| in one shuffle; at scale the same expression
    runs partition-pruned when base is date-partitioned."""
    from pyspark.sql.window import Window

    tagged = base.withColumn("__v__", F.lit(0)).unionByName(
        updates.withColumn("__v__", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("__v__").desc())
    return (
        tagged.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__v__", "__rn__")
    )


def cdc_apply(
    base: DataFrame, cdc: DataFrame, key_cols: list[str], seq_col: str = "seq"
) -> DataFrame:
    """Delete-aware CDC MERGE: apply a change batch of I/U/D ops onto
    a keyed table — per key the NEWEST op (by ``seq_col``) wins, 'D'
    removes the key, 'I'/'U' upsert the carried values
    (:func:`upsert_by_key` is the insert/update-only subset).  ``cdc``
    carries (key..., op, value-cols..., seq); intermediate churn on a
    key collapses before it ever touches the base.

    Cost: one window over the CDC batch (scales with |batch|, never
    |table|) + one outer join on the key — the same shape MERGE INTO
    compiles to on table formats, expressed for plain parquet."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (
        cdc.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__", seq_col)
    )
    val_cols = [c for c in base.columns if c not in key_cols]
    lat_vals = latest.select(
        *key_cols, F.col("op").alias("__op__"),
        *[F.col(c).alias(f"__new_{c}__") for c in val_cols],
    )
    merged = base.join(lat_vals, key_cols, "full_outer")
    out_cols = [F.col(c) for c in key_cols] + [
        F.when(F.col("__op__").isNotNull(), F.col(f"__new_{c}__"))
        .otherwise(F.col(c))
        .alias(c)
        for c in val_cols
    ]
    return merged.where(
        F.col("__op__").isNull() | (F.col("__op__") != "D")
    ).select(*out_cols)


def zorder_key(cols: list, bits: int = 21):
    """Z-order (Morton) interleave of up to 3 non-negative integer
    columns into one bigint sort key — the multi-dimension clustering
    trick (Delta/Iceberg OPTIMIZE ZORDER BY): sorting files by the
    interleaved key gives row-group min/max stats locality in EVERY
    participating dimension, so a filter on any one of them skips
    most of the data.  ``bits`` low bits are taken per column
    (21*3 = 63 fits a bigint).  Pure shift/mask expressions — stays
    in whole-stage codegen.

    Columns must be scaled to small non-negative ints first (bucket
    ids, epoch minutes, dictionary codes...); values >= 2^bits wrap
    into the same key space (clustering degrades gracefully, never
    breaks correctness — the key orders files, it is not read back).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    assert 1 <= n <= 3 and bits * n <= 63
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for ci, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("bigint"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return key


def write_zordered(
    df, path: str, cols: list, n_files: int = 8, bits: int = 21
) -> None:
    """Write ``df`` as parquet clustered by the Z-order key of
    ``cols``: range-partition + sort on the interleaved key, then
    drop it — the layout half of OPTIMIZE ZORDER."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("_z", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def table_stats(df, cols: list[str], exact_ndv: bool = False, kmv_k: int = 256):
    """ANALYZE-style column statistics: one row per column with
    (column, n, n_nulls, ndv, min_val, max_val) — the stats a
    cost-based optimizer (and the WOQL join-order heuristic) feeds
    on.

    NDV default = KMV sketch, NOT multi-column ``countDistinct``: N
    exact distinct aggs in one pass compile to an Expand that
    replicates EVERY input row once per agg — a 100 TB table becomes
    an N× row stream to compute stats whose consumer (join ordering)
    never needed exactness.  The KMV path keeps the basic aggregates
    (count/nulls/min/max) in one plain map-side-combinable pass with
    no Expand, and derives ndv per column from the ``kmv_k`` smallest
    md5-hash fractions — EXACT when a column has fewer than ``kmv_k``
    distinct values (you hold them all), the standard (k-1)/θ
    estimate above, floor-ed to bigint.  md5 + IEEE division make the
    estimate bit-identical on any engine, so the oracle replays it —
    the same portability discipline as ``kmv_distinct_estimate``.

    ``exact_ndv=True`` restores the countDistinct variant (audit
    path: quantifies the sketch's error where affordable)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from terminus_server_spark.checkpoint import plan_checkpoint

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
        if exact_ndv:
            aggs.append(F.countDistinct(c).alias(f"_ndv_{c}"))
    row = plan_checkpoint(df.agg(*aggs))
    base = None
    for c in cols:
        part = row.select(
            F.lit(c).alias("column"),
            F.col("_n").alias("n"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            *([F.col(f"_ndv_{c}").alias("ndv")] if exact_ndv else []),
            F.col(f"_mn_{c}").alias("min_val"),
            F.col(f"_mx_{c}").alias("max_val"),
        )
        base = part if base is None else base.unionByName(part)
    if exact_ndv:
        return base.select("column", "n", "n_nulls", "ndv", "min_val", "max_val")

    def frac(c: str):
        return (
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 8), 16, 10).cast(
                "double"
            )
            / F.lit(float(16**8))
        )

    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(c).alias("column"), frac(c).alias("f"))
                        for c in cols
                    ]
                )
            ).alias("e")
        )
        .select("e.column", "e.f")
        .where(F.col("f").isNotNull())
        .distinct()
    )
    # Two-level min-k: a global Window.partitionBy("column") would funnel
    # EVERY distinct value of a column through one task — for a
    # near-unique column on a 100 TB table that is a ~1e10-row serial
    # sort.  Instead salt each (column, f) row into one of ``n_buckets``
    # lanes and take the k smallest per lane in parallel (any global
    # minimum lives in some lane and is among that lane's k smallest),
    # then rank the surviving ≤ n_buckets*k rows per column.  The salt
    # only shapes parallelism, never the result — min-k of a distinct
    # set is bucketing-independent — so the DuckDB oracle replays the
    # unsalted formulation and stays bit-identical.
    n_buckets = 64
    wl = Window.partitionBy("column", "_b").orderBy("f")
    partial = (
        pairs.withColumn("_b", F.pmod(F.hash("column", "f"), F.lit(n_buckets)))
        .withColumn("_rl", F.row_number().over(wl))
        .where(F.col("_rl") <= kmv_k)
        .drop("_b", "_rl")
    )
    w = Window.partitionBy("column").orderBy("f")
    mins = partial.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= kmv_k
    )
    ndv = mins.groupBy("column").agg(
        F.count(F.lit(1)).alias("_nk"), F.max("f").alias("_theta")
    )
    ndv = ndv.select(
        "column",
        F.when(F.col("_nk") < kmv_k, F.col("_nk"))
        .otherwise(
            F.floor(F.lit(float(kmv_k - 1)) / F.col("_theta")).cast("bigint")
        )
        .cast("bigint")
        .alias("ndv"),
    )
    # LEFT join: an all-NULL column yields zero hash rows — it must
    # still report (n, n_nulls, ndv=0, NULL min/max) like the exact
    # variant does, not vanish from the output.
    return base.join(ndv, "column", "left").select(
        "column",
        "n",
        "n_nulls",
        F.coalesce(F.col("ndv"), F.lit(0)).cast("bigint").alias("ndv"),
        "min_val",
        "max_val",
    )
