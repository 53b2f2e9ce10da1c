"""Single-big-SCC scaling probe: trim+coloring SCC vs the closure audit.

Family: one strongly connected expander over n nodes — edges
i -> (i+1) % n (cycle: connectivity) and i -> (3i+1) % n (chords:
O(log n) diameter, so coloring's hop-by-hop fixpoints stay shallow).
The whole graph is ONE SCC of size n, the worst case the r3 verdict
flagged: the closure formulation materializes n^2 reach pairs, the
coloring formulation keeps O(V+E) state per round.

Usage: python scripts/scaling_scc.py [n ...]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from terminus_server_spark.session import get_spark


def family(spark, n):
    base = spark.range(n).select(F.col("id").alias("src"))
    return base.select("src", ((F.col("src") + 1) % n).alias("dst")).unionByName(
        base.select("src", ((F.col("src") * 3 + 1) % n).alias("dst"))
    )


def main():
    ns = [int(x) for x in sys.argv[1:]] or [1000, 4000, 16000]
    spark = get_spark("scc-scaling", shuffle_partitions=32)
    from terminus_server_spark.operators.graph import (
        scc_by_closure,
        strongly_connected_components,
    )

    for n in ns:
        e = family(spark, n).localCheckpoint()
        t0 = time.time()
        fast = strongly_connected_components(e)
        rows_fast = fast.count()
        mn = fast.agg(F.min("component"), F.max("component")).collect()[0]
        t_fast = time.time() - t0
        assert rows_fast == n and mn[0] == 0 and mn[1] == 0, (rows_fast, mn)
        t1 = time.time()
        try:
            audit = scc_by_closure(e)
            rows_audit = audit.count()
            t_audit = time.time() - t1
            assert rows_audit == n
        except Exception as ex:  # closure may OOM/blow up at big n
            t_audit = float("nan")
            print(f"n={n}: closure failed: {type(ex).__name__}")
        print(f"n={n}: coloring={t_fast:.1f}s closure={t_audit:.1f}s closure_pairs={n*n:,}")


if __name__ == "__main__":
    main()
