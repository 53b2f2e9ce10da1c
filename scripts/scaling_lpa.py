"""LPA scaling probe: same clique-of-10 topology family at 1x and
10x edges — 4 fixed rounds, so wall should track the edge count, not
the round structure (see SCALING.md)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from terminus_server_spark.operators.graph import lpa_communities
from terminus_server_spark.session import get_spark

spark = get_spark()


def edges_cliquish(n_nodes):
    # the registry fixture's family: cycle + chord inside blocks of 10
    r = spark.range(n_nodes).withColumnRenamed("id", "src")
    g10 = (F.col("src") - (F.col("src") % 10))
    e1 = r.select("src", (g10 + (F.col("src") + 1) % 10).alias("dst"))
    e2 = r.select("src", (g10 + (F.col("src") + 3) % 10).alias("dst"))
    return e1.union(e2)


results = {}
for scale, n in (("1x", 100_000), ("10x", 1_000_000)):
    e = edges_cliquish(n).localCheckpoint(eager=True)
    t0 = time.time()
    rows = lpa_communities(e, rounds=4).count()
    results[scale] = (time.time() - t0, rows, n * 2)
    print(scale, results[scale], flush=True)

print(
    f"RATIO lpa: {results['10x'][0] / results['1x'][0]:.2f}x wall for 10x edges "
    f"(rows {results['1x'][1]} -> {results['10x'][1]})"
)
