"""Optimization-round measurement harness (guide §1).

Per key: best-of-N wall time via the same `.count()` action bench.py
uses (comparability with the driver's numbers) PLUS an optional
noop-sink timing (guide §1.4 — computes every column, no sink cost),
and a formatted-plan dump to plans/<tag>/<key>_<suffix>.txt.

Usage:
  python tools/opt_measure.py [--sf DIR] [--reps N] [--plans SUFFIX]
                              [--noop] key [key ...]

Plans go to plans/r11/<key>_<SUFFIX>.txt when --plans is given.
Jobs are labeled (setJobDescription) so any UI/eventlog read maps
back to keys.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAL = "q6_forecast_revenue"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="suffix, e.g. before/after")
    ap.add_argument("--plans-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11"))
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop-sink write (guide §1.4)")
    args = ap.parse_args()

    from terminus_server_spark.registry import QUERIES
    from terminus_server_spark.session import get_spark

    spark = get_spark("tss-opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("q1_pricing_summary", "dedup_exact", "triples_build",
                 "events_sessionize"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").count()

    def drop_ckpts() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()

    def once(name: str, noop: bool = False) -> float:
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        drop_ckpts()
        return dt

    out: dict[str, dict] = {}
    for key in args.keys:
        if key not in QUERIES:
            print(f"# unknown key {key}", file=sys.stderr)
            continue
        cal0 = once(CAL)
        best = min(once(key) for _ in range(args.reps))
        rec: dict = {"best": round(best, 3), "cal": round(cal0, 3)}
        if args.noop:
            rec["noop"] = round(min(once(key, noop=True)
                                    for _ in range(args.reps)), 3)
        if args.plans:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = QUERIES[key](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.plans_dir, f"{key}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(plan)
            rec["plan"] = path
        out[key] = rec
        print(f"# {key}: best {rec['best']}s (cal {rec['cal']}s"
              + (f", noop {rec['noop']}s" if args.noop else "") + ")",
              file=sys.stderr)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
