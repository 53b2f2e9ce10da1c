"""Strict wire-type parity sweep: Spark toPandas() vs DuckDB .df().

The driver's value-hash is type-encoding-sensitive (CORRECTNESS_r01:
`events_sessionize` / `woql_typecast` failed hash despite identical
str values — DuckDB HUGEINT/DECIMAL become float64 in pandas while
Spark emits int64 / object Decimal).  This tool replicates the
strictest plausible comparison: pandas dtype kinds AND per-cell value
+ Python type equality after sorting columns by name and rows.

Usage: python tools/strict_parity.py [sf_dir] [key ...]
Prints one line per key: OK / MISMATCH(reason) / ERROR.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon_cell(x):
    """Canonical (typename, value-repr) for one cell, matching what a
    type-sensitive hash would see."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return ("null", "")
    if isinstance(x, (np.floating, float)):
        return ("float", repr(float(x)))
    if isinstance(x, (np.integer, int)) and not isinstance(x, bool):
        return ("int", str(int(x)))
    if isinstance(x, (np.bool_, bool)):
        return ("bool", str(bool(x)))
    if isinstance(x, pd.Timestamp):
        return ("ts", x.isoformat())
    if isinstance(x, (list, tuple, np.ndarray)):
        return ("list", str([_canon_cell(v) for v in x]))
    return (type(x).__name__, str(x))


def _frame_rows(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def _dtype_kinds(df: pd.DataFrame):
    out = {}
    for c in sorted(df.columns):
        k = df[c].dtype.kind
        # datetime64[us] vs [ns] both hash identically when values are
        # micro-precision; normalize the unit away but keep the kind
        out[c] = k
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    only = set(sys.argv[2:])

    from terminus_server_spark.session import get_spark

    spark = get_spark("strict-parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR      {name}: {type(e).__name__}: {e}")
            bad.append(name)
            continue
        reasons = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            reasons.append(f"cols spark={sorted(sdf.columns)} ddb={sorted(ddf.columns)}")
        else:
            sk, dk = _dtype_kinds(sdf), _dtype_kinds(ddf)
            kind_diff = {c: (sk[c], dk[c]) for c in sk if sk[c] != dk[c]}
            if kind_diff:
                reasons.append(f"dtype kinds {kind_diff}")
            sr, dr = _frame_rows(sdf), _frame_rows(ddf)
            if len(sr) != len(dr):
                reasons.append(f"rows {len(sr)} vs {len(dr)}")
            elif sr != dr:
                i = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
                reasons.append(f"values@{i} spark={sr[i]} ddb={dr[i]}")
        if reasons:
            print(f"MISMATCH   {name}: " + " | ".join(reasons))
            bad.append(name)
        else:
            print(f"OK         {name}")
    print(f"\n{len(bad)} problem keys: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
