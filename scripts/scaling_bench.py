"""Scaling evidence for the iterative operators: same topology family
at 1x and 10x edges; wall-clock should grow ~linearly (fixed round
count, per-round cost linear in the surviving edge set)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from terminus_server_spark.session import get_spark

from terminus_server_spark.operators.graph import connected_components, kcore
from terminus_server_spark.operators.path import transitive_closure

spark = get_spark()

def edges_blocks(n_nodes, block=10):
    # chains inside blocks of `block` nodes: bounded closure depth,
    # linear component structure (the registry fixture's family)
    r = spark.range(n_nodes).withColumnRenamed("id", "src")
    return (
        r.where((F.col("src") % block) != (block - 1))
        .select("src", (F.col("src") + 1).alias("dst"))
    )

def edges_dense(n_nodes):
    # ring + skip edges: degree 4, so a 3-core survives pruning
    r = spark.range(n_nodes).withColumnRenamed("id", "src")
    e1 = r.select("src", ((F.col("src") + 1) % n_nodes).alias("dst"))
    e2 = r.select("src", ((F.col("src") + 2) % n_nodes).alias("dst"))
    return e1.union(e2)

def t(fn):
    t0 = time.time()
    n = fn().count()
    return time.time() - t0, n

results = {}
for scale, n in (("1x", 200_000), ("10x", 2_000_000)):
    eb = edges_blocks(n).localCheckpoint(eager=True)
    ed = edges_dense(n).localCheckpoint(eager=True)
    cc = t(lambda: connected_components(eb))
    pp = t(lambda: transitive_closure(eb.select(F.col("src").cast("string").alias("src"), F.col("dst").cast("string").alias("dst"))))
    kc = t(lambda: kcore(ed, k=3, rounds=4))
    results[scale] = dict(components=cc, path_plus=pp, kcore=kc, n_edges=n)
    print(scale, results[scale], flush=True)

for op in ("components", "path_plus", "kcore"):
    r = results["10x"][op][0] / max(results["1x"][op][0], 1e-9)
    print(f"RATIO {op}: {r:.2f}x wall for 10x edges "
          f"(rows {results['1x'][op][1]} -> {results['10x'][op][1]})")
