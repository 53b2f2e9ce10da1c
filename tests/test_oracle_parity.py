"""Integration gate: every registry query vs its DuckDB oracle.

Mimics the driver's check: row-count, column names, and an
order-insensitive value comparison (columns sorted by name, rows
sorted, exact equality — floats must match bit-for-bit, which the
decimal-sum convention guarantees).
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            x = row[i]
            if isinstance(x, float):
                if math.isnan(x):
                    x = "NaN"
            elif hasattr(x, "isoformat"):
                x = x.isoformat(sep=" ").replace("+00:00", "")
            elif isinstance(x, (list, tuple)):
                x = tuple(x)
            vals.append((str(type(x).__name__), str(x)))
        out.append(tuple(vals))
    out.sort()
    return out


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name, ddb):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(ddb_rows, ddb_cols)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:3]
    assert ns == nd, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={ns[i]} duckdb={nd[i]}" for i in mism
    )


def test_all_queries_have_entries():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) > 0
