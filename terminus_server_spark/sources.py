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

from pyspark.sql import DataFrame, SparkSession


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
