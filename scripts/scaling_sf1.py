"""sf1-equivalent scale probe for the round's heavyweights (r9
verdict task 7: nothing had ever run above sf0.1).

No sf1 testdata exists, so a 10x-scaled corpus is SYNTHESIZED from
sf0.1: each fact table is unioned 10 times with identifier domains
shifted by a per-domain stride (so key relationships — lineitem→
orders→customer, lineitem→part/supplier, events.user_id,
documents.doc_id, embeddings.vec_id — stay consistent and the keyed
graphs grow 10x instead of collapsing onto themselves); nation/
region stay single-copy dims and nation/region foreign keys are NOT
shifted.  Values/dates/text are unchanged — this probes DATA-VOLUME
scaling of the plans, not statistical novelty (bpe_train's distinct
word set, for instance, stays constant by construction; its probe
measures the corpus-scan and rewrite-join terms — noted in
SCALING.md).

Usage: python scripts/scaling_sf1.py [build|run] [key ...]
  build — write the scaled parquet dir (/root/repo/.scratch/sf1x)
  run   — best-of-2 each key at sf0.1 and at the scaled dir
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OUT = "/root/repo/.scratch/sf1x"
SRC = "/root/testdata/sf0.1"
COPIES = 10

# identifier-domain strides (beyond any sf0.1 max key)
STRIDE = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> {column: domain}; nation/region keys intentionally absent
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

DEFAULT_KEYS = [
    "graph_scc",
    "stream_kcore",
    "graph_msf_incr",
    "graph_betweenness_incr",
    "bpe_train",
    # r12 (VERDICT item 9): the r11/r12 headline mechanisms are
    # invisible at sf0.1 where stores are tiny — probe them at 10x:
    # delta-sized stream stores + append-only edge stores,
    # two-level BFS dedup, inverted-index delta merge, adaptive
    # quotient labeling.
    "stream_triangle_count",
    "graph_betweenness",
    "stream_inverted_index",
    "graph_scc_incremental",
    "stream_cc_incremental",
    "doc_json_schemaless",
]


def build(spark):
    os.makedirs(OUT, exist_ok=True)
    for t in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for i in range(COPIES):
            c = df
            for col, dom in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * STRIDE[dom]))
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")
        print(f"# built {t}", flush=True)


def run(spark, keys):
    from terminus_server_spark.registry import QUERIES

    for warm in ("q1_pricing_summary", "triples_build"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").count()
    for k in keys:
        row = {"key": k}
        for label, d in (("sf0.1", SRC), ("sf1x", OUT)):
            best = None
            for _ in range(2):
                t0 = time.time()
                QUERIES[k](spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 2)
        row["ratio"] = round(row["sf1x"] / row["sf0.1"], 2)
        print(
            f"# {k}: sf0.1={row['sf0.1']}s sf1x={row['sf1x']}s "
            f"ratio={row['ratio']}x",
            flush=True,
        )


def main():
    from terminus_server_spark.session import get_spark

    spark = get_spark("tss-sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "build":
        build(spark)
    else:
        run(spark, sys.argv[2:] or DEFAULT_KEYS)


if __name__ == "__main__":
    main()
