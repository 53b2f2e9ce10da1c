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


def _spark_wire_class(dtype: str) -> str:
    """Spark dtype string → canonical wire-rendering class.

    The driver's value hash is sensitive to how values *render* after
    engine→pandas conversion, not just to Python types: DuckDB HUGEINT
    becomes float64 ("123.0" vs "123"), tz-aware timestamps carry
    "+00:00", TIMESTAMP_NS keeps sub-microsecond digits.  Classes
    below are equal iff the rendering is guaranteed identical."""
    if dtype.startswith("decimal"):
        return dtype  # (p,s) must match exactly
    if dtype.startswith("array<"):
        return "list<" + _spark_wire_class(dtype[6:-1]) + ">"
    return {
        "boolean": "bool",
        "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
        "float": "float", "double": "float",
        "string": "str", "binary": "bytes", "date": "date",
        "timestamp_ntz": "ts_naive",
        "timestamp": "ts_tz",  # LTZ → tz-aware pandas; only matches TIMESTAMPTZ
    }.get(dtype, dtype)


def _duckdb_wire_class(dtype: str) -> str:
    dtype = dtype.strip()
    if dtype.startswith("DECIMAL"):
        return dtype.replace("DECIMAL", "decimal").replace(" ", "")
    if dtype.endswith("[]"):
        return "list<" + _duckdb_wire_class(dtype[:-2]) + ">"
    return {
        "BOOLEAN": "bool",
        "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
        "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
        # HUGEINT/UBIGINT render via float64 or object in pandas — never
        # equal to an int64 rendering; keep them distinct so the gate
        # fails where the driver's hash would
        "HUGEINT": "int128", "UBIGINT": "uint64", "UHUGEINT": "int128",
        "FLOAT": "float", "DOUBLE": "float",
        "VARCHAR": "str", "BLOB": "bytes", "DATE": "date",
        "TIMESTAMP": "ts_naive", "TIMESTAMP_S": "ts_naive", "TIMESTAMP_MS": "ts_naive",
        "TIMESTAMP_NS": "ts_nanos",
        "TIMESTAMP WITH TIME ZONE": "ts_tz",
    }.get(dtype, dtype)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, name, ddb):
    qdf = QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"

    # wire-type gate: catches encoding divergence (HUGEINT, tz-aware vs
    # naive timestamps, nanos, decimal-vs-float) that the value
    # comparison below normalizes away but the driver's hash does not
    spark_types = {c: _spark_wire_class(t) for c, t in qdf.dtypes}
    ddb_types = {
        r[0]: _duckdb_wire_class(r[1])
        for r in ddb.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    }
    mismatched = {
        c: (spark_types[c], ddb_types[c])
        for c in spark_types
        if spark_types[c] != ddb_types.get(c)
    }
    assert not mismatched, f"{name}: wire-type mismatch {mismatched}"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(ddb_rows, ddb_cols)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:3]
    assert ns == nd, f"{name}: value mismatch at sorted rows {mism}: " + "; ".join(
        f"spark={ns[i]} duckdb={nd[i]}" for i in mism
    )


def test_all_queries_have_entries():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) > 0
