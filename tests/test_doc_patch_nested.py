"""Unit gates for the recursive document diff/patch beyond the
oracle-parity fixture: roundtrip on a hand-built nested corpus, and
the semantic edge cases the index-aligned design must land exactly
(field nulled in place vs element removed, list resize both ways,
whole-document add/remove)."""

import pytest
from pyspark.sql import functions as F

from terminus_server_spark.docs.patch import (
    doc_diff_nested,
    doc_patch_nested,
    flatten_documents,
)

SCHEMA = (
    "key bigint, name string, meta struct<owner:string, depth:struct<level:bigint>>, "
    "items array<struct<id:bigint, score:double>>, tags array<string>"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def corpus(spark):
    old = _docs(
        spark,
        [
            (1, "a", ("o1", (3,)), [(10, 1.0), (11, 2.0)], ["x", "y"]),
            (2, "b", ("o2", (1,)), [(20, 5.0)], ["z"]),
            (3, "c", ("o3", (2,)), [], []),
            (4, "gone", ("o4", (9,)), [(40, 4.0)], ["w"]),
        ],
    )
    new = _docs(
        spark,
        [
            # scalar change, nested-struct change, element change,
            # list append, tag truncate-to-one
            (1, "a2", ("o1", (4,)), [(10, 1.5), (11, 2.0), (12, 3.0)], ["x"]),
            # field nulled in place (owner), list truncated to empty
            (2, "b", (None, (1,)), [], ["z"]),
            # unchanged
            (3, "c", ("o3", (2,)), [], []),
            # doc 4 removed; doc 5 added
            (5, "newdoc", ("o5", (1,)), [(50, 0.5)], ["v"]),
        ],
    )
    return old, new


def test_roundtrip_patch_diff_equals_new(corpus):
    old, new = corpus
    d = doc_diff_nested(old, new, "key")
    patched = flatten_documents(doc_patch_nested(old, d, "key"), "key")
    # patch can't create doc 5 (absent from old) — compare on old's keys
    want = flatten_documents(new.join(old.select("key"), "key", "left_semi"), "key")
    assert sorted(map(tuple, patched.collect())) == sorted(map(tuple, want.collect()))


def test_removed_doc_patches_to_no_leaves(corpus):
    old, new = corpus
    d = doc_diff_nested(old, new, "key")
    flat = flatten_documents(doc_patch_nested(old, d, "key"), "key")
    assert flat.where(F.col("key") == 4).count() == 0


def test_field_null_vs_element_removal_are_distinct(corpus):
    old, new = corpus
    d = doc_diff_nested(old, new, "key").collect()
    by = {(r["key"], r["path"]): r["op"] for r in d}
    # doc 2: owner nulled in place → removed leaf, NO meta resize
    assert by[(2, "meta.owner")] == "removed"
    # doc 2: items 1 → 0 → resized sentinel plus removed element leaves
    assert by[(2, "items#len")] == "resized"
    assert by[(2, "items[0].id")] == "removed"
    # doc 1: items 2 → 3 → resized + added tail element
    assert by[(1, "items#len")] == "resized"
    assert by[(1, "items[2].id")] == "added"
    assert by[(1, "items[0].score")] == "changed"
    # doc 1: nested-struct leaf
    assert by[(1, "meta.depth.level")] == "changed"
    # doc 4 removed wholesale: every leaf removed
    assert by[(4, "name")] == "removed"
    assert by[(4, "items[0].score")] == "removed"
    # doc 3 unchanged: no entries at all
    assert not [k for k in by if k[0] == 3]
    # doc 5 added wholesale
    assert by[(5, "name")] == "added"
    assert by[(5, "tags[0]")] == "added"


def test_diff_plan_is_pure_projection(corpus, spark):
    from tests.test_plans import plan_str

    old, new = corpus
    p = plan_str(doc_diff_nested(old, new, "key"))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in p


def test_list_nulled_wholesale_patches_to_null_list(spark):
    """new sets a list field to NULL: the #len sentinel ships a NULL
    new_value, and patch must rebuild a NULL list — not an
    old-length list of NULL elements (which the flat rendering would
    hide, so this compares at the typed grain)."""
    schema = "key bigint, items array<struct<id:bigint, score:double>>"
    old = spark.createDataFrame([(1, [(10, 1.0), (11, 2.0)]), (2, [(20, 3.0)])], schema)
    new = spark.createDataFrame([(1, None), (2, [(20, 3.0)])], schema)
    d = doc_diff_nested(old, new, "key")
    got = {r["key"]: r["items"] for r in doc_patch_nested(old, d, "key").collect()}
    assert got[1] is None
    assert [tuple(e) for e in got[2]] == [(20, 3.0)]
    # and the inverse direction (NULL → list) still lands
    d2 = doc_diff_nested(new, old, "key")
    got2 = {r["key"]: r["items"] for r in doc_patch_nested(new, d2, "key").collect()}
    assert [tuple(e) for e in got2[1]] == [(10, 1.0), (11, 2.0)]


def test_set_semantics_reorder_is_noop_and_roundtrip(spark):
    old = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["x"])], "key bigint, tags array<string>"
    )
    new = spark.createDataFrame(
        [(1, ["c", "a", "d"]), (2, ["x"])], "key bigint, tags array<string>"
    )
    d = doc_diff_nested(old, new, "key", set_paths=("tags",))
    got = {(r["key"], r["path"], r["op"]) for r in d.collect()}
    # b removed, d added, a/c reorder invisible; doc 2 untouched
    assert got == {(1, "tags{b}", "removed"), (1, "tags{d}", "added")}
    patched = flatten_documents(
        doc_patch_nested(old, d, "key", set_paths=("tags",)), "key", set_paths=("tags",)
    )
    want = flatten_documents(new, "key", set_paths=("tags",))
    assert sorted(map(tuple, patched.collect())) == sorted(map(tuple, want.collect()))
