"""Bloom-filter semi-join: the classic shuffle-avoidance primitive.

A big fact table is filtered against a dimension-derived key set
without shuffling the fact side: the build keys hash into an m-bit
filter (k seeded md5 positions per key), the bit set broadcasts, and
the probe is a map-side ALL-bits-present test.  False positives are
inherent (that's the trade); the operator therefore reports the
bloom verdict NEXT TO the exact semi-join verdict so callers (and
the oracle) see the false-positive rate instead of trusting it.

Parity note: Spark's own runtime row-group bloom pushdown
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this
opaquely inside the engine; this operator is the *portable*,
deterministic rendition — md5-seeded positions reproduce
bit-for-bit on any engine, so the approximation itself is testable
(same philosophy as the KMV and Count-Min sketches in pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bits(key, n_hashes: int, n_bits: int):
    return F.array(
        *[
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 8), 16, 10)
            .cast("long")
            % n_bits
            for j in range(n_hashes)
        ]
    )


def bloom_semi_join_audit(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    n_bits: int = 1024,
    n_hashes: int = 3,
) -> DataFrame:
    """One audit row: (n_probe, n_bloom_pass, n_exact_pass,
    n_false_pos).

    The build side reduces to its distinct bloom bits (<= n_bits
    rows), aggregates into one sorted array, and broadcasts — the
    probe side is never shuffled: membership is a per-row
    array_contains over the broadcast bitmap, exactly how a bloom
    filter rides along with a scan at 100 TB.  The exact semi-join
    verdict (a separate broadcast of the distinct build keys) is
    computed only to expose the false-positive count; production
    callers drop it and keep the bloom-only path."""
    bkey = F.col(build_col).cast("string")
    bits = (
        build.select(F.explode(_bits(bkey, n_hashes, n_bits)).alias("bit"))
        .distinct()
        .agg(F.sort_array(F.collect_list("bit")).alias("bl"))
    )
    keys = build.select(bkey.alias("bk")).distinct().agg(
        F.sort_array(F.collect_list("bk")).alias("kl")
    )
    pkey = F.col(probe_col).cast("string")
    probe_bits = probe.select(
        pkey.alias("pk"), _bits(pkey, n_hashes, n_bits).alias("pb")
    )
    flagged = (
        probe_bits.crossJoin(F.broadcast(bits))
        .crossJoin(F.broadcast(keys))
        .select(
            F.forall("pb", lambda b: F.array_contains("bl", b)).alias("bloom_pass"),
            F.array_contains("kl", F.col("pk")).alias("exact_pass"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_pass"),
        F.sum(F.col("exact_pass").cast("long")).alias("n_exact_pass"),
        F.sum((F.col("bloom_pass") & ~F.col("exact_pass")).cast("long")).alias(
            "n_false_pos"
        ),
    )
