"""Typed-literal extension columns: language tags (obj_lang) and the
temporal shadow (obj_ts) through predicate_frames and the WOQL Triple
pattern's lang=/ts=/num= projections."""

import datetime

import pytest
from pyspark.sql import functions as F

from terminus_server_spark.model.triples import TripleStore, predicate_frames
from terminus_server_spark.woql import ast as A
from terminus_server_spark.woql.compiler import WOQLContext


@pytest.fixture(scope="module")
def store(spark):
    df = spark.createDataFrame(
        [
            (1, "hello", "en", 3.5, datetime.datetime(2020, 1, 1)),
            (2, "bonjour", "fr", 1.0, datetime.datetime(2021, 6, 1)),
            (3, "hallo", "de", 9.9, datetime.datetime(2022, 1, 1)),
        ],
        "id bigint, greeting string, tag string, score double, seen timestamp_ntz",
    )
    frames = predicate_frames(
        df, "Doc", "id", value_cols=["greeting", "score", "seen"],
        lang_cols={"greeting": F.col("tag")},
    )
    merged = frames["greeting"]
    for k in ("score", "seen", "rdf:type"):
        merged = merged.unionByName(frames[k])
    return TripleStore(merged, pred_frames={k: [v] for k, v in frames.items()})


def test_lang_constant_filters_at_scan(store):
    rows = WOQLContext(store).run(
        A.Triple(A.v("d"), "greeting", A.v("g"), lang="fr")
    ).collect()
    assert [(r["d"], r["g"]) for r in rows] == [("Doc/2", "bonjour")]


def test_lang_var_binds_tag(store):
    rows = WOQLContext(store).run(
        A.Triple(A.v("d"), "greeting", A.v("g"), lang=A.v("tag"))
    ).collect()
    assert sorted((r["d"], r["tag"]) for r in rows) == [
        ("Doc/1", "en"), ("Doc/2", "fr"), ("Doc/3", "de"),
    ]


def test_langstring_type_and_untagged_columns(store):
    t = {
        r["predicate"]: r["obj_type"]
        for r in store.df.select("predicate", "obj_type").distinct().collect()
    }
    assert t["greeting"] == "rdf:langString"
    assert t["score"] == "xsd:decimal"
    assert t["seen"] == "xsd:dateTime"


def test_ts_shadow_native_comparison(store):
    q = A.And(
        A.Triple(A.v("d"), "seen", A.v("s"), ts=A.v("when")),
        A.Greater(A.v("when"), datetime.datetime(2020, 12, 31)),
    )
    df = WOQLContext(store).run(q)
    assert dict(df.dtypes)["when"] == "timestamp_ntz"
    assert sorted(r["d"] for r in df.collect()) == ["Doc/2", "Doc/3"]


def test_handbuilt_core_frame_fast_path_conforms(spark):
    """A hand-built 6-column pred frame must expose the typed-literal
    extension columns on spo()'s constant-predicate fast path too —
    Triple(..., lang=) against it resolves (NULL tag) instead of
    raising an unresolved-column error."""
    core = spark.createDataFrame(
        [("instance", "Doc/1", "title", "plain", "xsd:string", None)],
        "graph string, subject string, predicate string, obj string, "
        "obj_type string, obj_num double",
    )
    store = TripleStore(core, pred_frames={"title": [core]})
    fast = store.spo("title")
    assert {"obj_lang", "obj_ts"} <= set(fast.columns)
    rows = WOQLContext(store).run(
        A.Triple(A.v("d"), "title", A.v("t"), lang=A.v("tag"))
    ).collect()
    assert [(r["d"], r["t"], r["tag"]) for r in rows] == [("Doc/1", "plain", None)]


def test_num_shadow_binding(store):
    q = A.And(
        A.Triple(A.v("d"), "score", A.v("s"), num=A.v("n")),
        A.Less(A.v("n"), 4.0),
    )
    rows = WOQLContext(store).run(q).collect()
    assert sorted(r["d"] for r in rows) == ["Doc/1", "Doc/2"]


def test_xsd_integer_ladder_corner_forms(spark):
    """XSD_INTEGER_RANGE value checks see through the lexical corner
    forms: '-0' is a lexical ZERO (valid nonNegative/nonPositive,
    invalid positive/negative), leading zeros and '+' signs are
    legal, and each bounded type rejects one-past-the-bound in both
    directions."""
    from pyspark.sql import functions as F

    from terminus_server_spark.model.triples import xsd_lexical_valid

    cases = [
        ("-0", "xsd:nonNegativeInteger", True),
        ("-0", "xsd:nonPositiveInteger", True),
        ("-0", "xsd:positiveInteger", False),
        ("-0", "xsd:negativeInteger", False),
        ("0001", "xsd:positiveInteger", True),
        ("+12", "xsd:nonNegativeInteger", True),
        ("12.5", "xsd:int", False),
        ("", "xsd:int", False),
        ("127", "xsd:byte", True),
        ("128", "xsd:byte", False),
        ("-128", "xsd:byte", True),
        ("-129", "xsd:byte", False),
        ("255", "xsd:unsignedByte", True),
        ("256", "xsd:unsignedByte", False),
        ("-1", "xsd:unsignedLong", False),
        ("18446744073709551615", "xsd:unsignedLong", True),
        ("18446744073709551616", "xsd:unsignedLong", False),
        ("9223372036854775807", "xsd:long", True),
        ("9223372036854775808", "xsd:long", False),
    ]
    df = spark.createDataFrame(
        [(o, t) for o, t, _ in cases], "obj string, obj_type string"
    ).withColumn("valid", xsd_lexical_valid(F.col("obj"), F.col("obj_type")))
    got = {(r.obj, r.obj_type): r.valid for r in df.collect()}
    for o, t, want in cases:
        assert got[(o, t)] is want, (o, t, want)
