"""Isolated re-measure of specific bench keys (r7 verdict task 3).

Nine keys drifted >1.8x cal-adjusted between r6 and r7 with ZERO code
changes (verified via git log -S); the calibration series showed the
r7 session ran ~27% slower.  This tool proves (or refutes) the
machine-load explanation: best-of-N per key on an idle machine, with
the calibration probe run before and after each key so every number
can be normalized.

Usage: python tools/remeasure.py [sf_dir] [key ...]
Output: JSON to stdout {key: {"best": s, "cal": s}} plus stderr lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIFT_KEYS = [
    "rdf_nquads",
    "sketch_kmv_grouped",
    "vc_purge_subject",
    "emb_matryoshka_audit",
    "src_cdc_apply",
    "corpus_snapshot_diff",
    "sketch_kmv_distinct",
    "stream_fanout_sinks",
    "win_rank_topn",
]

CALIBRATION = "q6_forecast_revenue"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:] or DRIFT_KEYS
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from terminus_server_spark.registry import QUERIES
    from terminus_server_spark.session import get_spark

    spark = get_spark("tss-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("q1_pricing_summary", "dedup_exact", "triples_build"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").count()

    def once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
        return dt

    out: dict[str, dict] = {}
    for k in keys:
        cal_before = once(CALIBRATION)
        best = min(once(k) for _ in range(reps))
        cal_after = once(CALIBRATION)
        cal = (cal_before + cal_after) / 2
        out[k] = {"best": round(best, 3), "cal": round(cal, 3)}
        print(f"# {k}: best={best:.3f}s cal={cal:.3f}s", file=sys.stderr)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
