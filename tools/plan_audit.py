"""Physical-plan audit over every registry key.

For each key, builds the DataFrame (no execution) and reports:
- parquet scan leaves (plan duplication shows up as scan explosion),
- Exchange count (shuffle pressure),
- Python eval nodes (BatchEvalPython / ArrowEvalPython — only the
  explicitly Arrow-batched operators may have them),
- CartesianProduct / BroadcastNestedLoopJoin (quadratic hazards),
- UNPARTITIONED Window nodes (empty partition spec — the whole input
  funnels through ONE task; only adjudicated bounded-grain windows
  in WINDOW_OK may have them).

Usage: python tools/plan_audit.py [sf_dir] [key ...] > report
Lines: ``key scans=N exchanges=N python=N nested_loop=N`` followed by
a ``FLAG`` column when a hazard heuristic fires.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# operators allowed to show Python eval nodes (Arrow-batched by design)
ARROW_OK = {"dedup_embed_cos", "dedup_embed_cos_exact", "mm_meta", "mm_features",
            "mm_resize", "mm_frames", "stream_spend_alerts", "stream_pattern_alerts",
            # vectorized sign-LSH signatures (operators/_arrow_udfs.py)
            "ann_lsh"}

# keys adjudicated to run unpartitioned windows over BOUNDED-GRAIN
# tables only (value-range grids, calendar cells, vocab slots,
# codebook centroids, bucket-count prefix sums — cardinality set by a
# constant or a value range, NOT by corpus size).  Populated by
# reading each hit's code; a new hit means a new scale hazard until
# adjudicated here.
WINDOW_OK: dict[str, str] = {
    # PQ codebook id assignment: row_number AFTER .limit(n_codes) — the
    # window input is the <=n_codes-row seed set (constant), and the
    # global orderBy+limit itself plans as TakeOrderedAndProject
    "ann_ivfpq": "PQ codebook seeds (<= n_codes rows, post-limit)",
    "ann_ivfpq_residual": "PQ codebook seeds (<= n_codes rows, post-limit)",
    "ann_pq_audit": "PQ codebook seeds (<= n_codes rows, post-limit)",
    # largest-remainder apportionment: row_number over the per-source
    # remainder table — one row per source (vocabulary-bounded)
    "docs_apportion_sample": "source-grain remainder ranks",
    # bucket-prefix-sum offsets: 256-row (or grid-sized) count tables;
    # the corpus-grain rank is the PARTITIONED in-bucket window
    "docs_shuffle_index": "256-bucket offset prefix sum",
    # orders_rfm needs no entry since the boundary-broadcast rewrite:
    # its only window is PARTITIONED BY bucket over <=4 boundary buckets
    "events_time_to_convert": "1024s-grid bucket offset prefix sum",
    # calendar / vocabulary grains: one row per day / event type
    "events_cumulative_uniques": "calendar-day grain cumulative sum",
    "events_wilson_rank": "event-type-grain rank (type vocabulary)",
    # fixed-grid CDF inversion: n_buckets rows by construction
    "sketch_quantile_grid": "128-bucket fixed-grid CDF",
    # Relay pageInfo: row_number + count/max windows AFTER
    # .limit(first+1) — the window input is the keyset page itself
    # (<= page_size+1 rows by construction; the r10 lazy rewrite of
    # the former driver-side collect probe)
    "gql_execute_cursor_pageinfo": "first+1 keyset page (page-size-bounded)",
    "gql_execute_connection": "first+1 keyset page (page-size-bounded)",
    "gql_execute_connection_pi4": "first+1 keyset page (page-size-bounded)",
    "gql_execute_cursor_backward": "last+1 keyset page (page-size-bounded)",
    # streaming bisect: running sum over the foreachBatch-maintained
    # per-commit count table — O(#commits) state rows (commit grain,
    # metadata-scale), never row-grain data
    "stream_bisect": "commit-grain state-table cumulative curve",
    "stream_quantile_grid": "128-bucket fixed-grid CDF",
}


def _unpartitioned_windows(plan: str) -> int:
    """Count Window nodes with an EMPTY partition spec in a formatted
    plan.  A Window node's Arguments line is ``[functions], [part
    spec], [order spec]`` — but BOTH trailing specs are omitted when
    empty, so two groups can mean partition-only (agg over a group,
    fine) or order-only (global sort window, the hazard).  The
    discriminator is the LAST group: order-spec entries always carry
    an ``ASC``/``DESC`` direction, partition columns never do.
    (Nested windowspecdefinition/frame terms use parens, not
    brackets, so the ``], [`` separator count is reliable.)"""
    n = 0
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.match(r"^\(\d+\) Window(InPandas)?(Exec)?\s*$", ln):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            m = re.match(r"^Arguments: (.*)$", lines[j])
            if not m:
                continue
            args = m.group(1)
            groups = args.count("], [")
            if groups >= 2:
                break  # functions + partition + order: partitioned
            last = args.rsplit("], [", 1)[-1] if groups == 1 else ""
            if groups == 0 or re.search(r"\b(ASC|DESC)\b", last):
                # order-only (or bare-frame) spec: nothing partitions
                # the input — the whole frame funnels into one task
                n += 1
            break
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from terminus_server_spark.registry import QUERIES
    from terminus_server_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for k in sorted(only or QUERIES):
        try:
            df = QUERIES[k](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            p = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - audit must keep going
            print(f"{k} ERROR {type(e).__name__}")
            flagged.append(k)
            continue
        scans = len(re.findall(r"^\(\d+\) Scan parquet", p, re.M))
        exch = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
        pyev = len(re.findall(r"EvalPython", p))
        cart = len(re.findall(r"CartesianProduct", p))
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", p))
        gwin = _unpartitioned_windows(p)
        flags = []
        # woql_doc_words: DeleteDocument derives the retraction set
        # from the 17-frame store union, and apply_delta consumes the
        # delta twice — 40 pruned scan leaves by construction.  Both
        # checkpoint and persist dedup variants MEASURED SLOWER at
        # sf0.1 (~8 s vs ~6.2 s plain): the duplicated branches are
        # column-pruned and run in parallel, while materialization
        # serializes a union-of-17-frames job.  Duplication kept on
        # purpose; threshold raised for this key only.
        scan_cap = 60 if k == "woql_doc_words" else 30
        if scans > scan_cap:
            flags.append("scan-explosion")
        if pyev and k not in ARROW_OK:
            flags.append("unexpected-python")
        if cart:
            # a true cartesian product is always a hazard; a
            # BroadcastNestedLoopJoin with a 1-row side is the
            # intended scalar-broadcast plan and is NOT flagged
            flags.append("cartesian")
        if gwin and k not in WINDOW_OK:
            flags.append("global-window")
        if flags:
            flagged.append(k)
        tail = (" FLAG:" + ",".join(flags)) if flags else ""
        print(f"{k} scans={scans} exchanges={exch} python={pyev} "
              f"cartesian={cart} bnlj={bnlj} gwin={gwin}{tail}")
    print(f"\n{len(flagged)} flagged: {flagged}")


if __name__ == "__main__":
    main()
