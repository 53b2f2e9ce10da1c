"""Array fields with @dimensions (docs/arrays.py) — roundtrip,
sparse-position fidelity, and index-aligned diff."""

import pytest

from terminus_server_spark.docs.arrays import (
    array_diff,
    array_to_triples,
    triples_to_array,
)


def test_array_roundtrip_1d_sparse(spark):
    docs = spark.createDataFrame(
        [(1, [10, None, 30]), (2, [7]), (3, [])],
        "doc_id long, xs array<bigint>",
    )
    tri = array_to_triples(docs, "D", "doc_id", "xs", dims=1)
    # cell triples: link + value + index per non-null element
    by_pred = {
        r.predicate: r.n
        for r in tri.groupBy("predicate").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert by_pred == {"xs": 3, "sys:value": 3, "sys:index": 3}
    back = {
        r.subject: r.xs
        for r in triples_to_array(tri, "xs", 1, "bigint").collect()
    }
    # holes preserved; the empty array stores nothing and is absent
    assert back == {"D/1": [10, None, 30], "D/2": [7]}


def test_array_roundtrip_2d(spark):
    docs = spark.createDataFrame(
        [(1, [[1, 2], [None, 4]]), (2, [[None, None], [5, 6]])],
        "doc_id long, m array<array<bigint>>",
    )
    tri = array_to_triples(docs, "D", "doc_id", "m", dims=2)
    assert (
        tri.where(tri.predicate == "sys:index2").count()
        == tri.where(tri.predicate == "sys:value").count()
        == 5
    )
    back = {
        r.subject: r.m
        for r in triples_to_array(tri, "m", 2, "bigint").collect()
    }
    # all-null row collapses to a null row (sparse storage keeps no
    # length marker) — documented absent-vs-null ambiguity
    assert back == {"D/1": [[1, 2], [None, 4]], "D/2": [None, [5, 6]]}


def test_array_dims_validation(spark):
    docs = spark.createDataFrame(
        [(1, [1, 2])], "doc_id long, xs array<bigint>"
    )
    with pytest.raises(ValueError, match="dimensions"):
        array_to_triples(docs, "D", "doc_id", "xs", dims=0)
    with pytest.raises(ValueError, match="expected 2-deep"):
        array_to_triples(docs, "D", "doc_id", "xs", dims=2)


def test_array_roundtrip_3d(spark):
    """@dimensions generalizes past 2: sys:index3 cells, innermost-
    first dense reassembly, holes preserved at every level."""
    docs = spark.createDataFrame(
        [(1, [[[1, 2], [None, 4]], [[5]]])],
        "doc_id long, t array<array<array<bigint>>>",
    )
    tri = array_to_triples(docs, "D", "doc_id", "t", dims=3)
    preds = {r.predicate for r in tri.select("predicate").distinct().collect()}
    assert preds == {"t", "sys:value", "sys:index", "sys:index2", "sys:index3"}
    back = triples_to_array(tri, "t", 3, "bigint").collect()
    assert back[0].t == [[[1, 2], [None, 4]], [[5]]]


def test_array_diff_index_aligned(spark):
    old = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [7, None, 9])],
        "doc_id long, xs array<bigint>",
    )
    new = spark.createDataFrame(
        [(1, [10, 99, 30, 40]), (2, [7, 8, None])],
        "doc_id long, xs array<bigint>",
    )
    got = {
        (r.doc_id, r.i0, r.op, r.old_value, r.new_value)
        for r in array_diff(old, new, "doc_id", "xs").collect()
    }
    # positions pin: a hole filling is Add, a value vanishing is
    # Remove, equal positions emit nothing, no sequence realignment
    assert got == {
        (1, 1, "SwapValue", 20, 99),
        (1, 3, "Add", None, 40),
        (2, 1, "Add", None, 8),
        (2, 2, "Remove", 9, None),
    }
