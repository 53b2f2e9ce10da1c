"""Schema migration unit gates: each step's instance rewrite, the
composed script, and post-migration frame inference (class_frames
sees the migrated world — the validation tie-in)."""

from pyspark.sql import functions as F

from terminus_server_spark.model.migrate import migrate
from terminus_server_spark.model.triples import class_frames, triples_from_table


def _fixture(spark):
    df = spark.createDataFrame(
        [(1, "HIGH", 10, 5.0), (2, "LOW", 20, 7.5)],
        "id bigint, prio string, code bigint, amount double",
    )
    return triples_from_table(
        df, "Order", "id", value_cols=["prio", "code", "amount"]
    )


STEPS = [
    {"rename_class": {"from": "Order", "to": "PurchaseOrder"}},
    {"rename_property": {"class": "PurchaseOrder", "from": "prio", "to": "priority"}},
    {"widen_type": {"predicate": "code", "from": "xsd:integer", "to": "xsd:decimal"}},
    {
        "move_to_subdocument": {
            "class": "PurchaseOrder",
            "predicate": "amount",
            "sub": "billing",
            "sub_class": "Billing",
        }
    },
]


def test_migration_rewrites_instances(spark):
    out = migrate(_fixture(spark), STEPS)
    rows = {
        (r.subject, r.predicate): (r.obj, r.obj_type)
        for r in out.collect()
    }
    assert rows[("PurchaseOrder/1", "rdf:type")] == ("PurchaseOrder", "iri")
    assert rows[("PurchaseOrder/1", "priority")] == ("HIGH", "xsd:string")
    assert rows[("PurchaseOrder/1", "code")] == ("10", "xsd:decimal")
    # structural move: link + typed subdocument + re-homed property
    assert rows[("PurchaseOrder/1", "billing")] == ("PurchaseOrder/1/billing", "iri")
    assert rows[("PurchaseOrder/1/billing", "rdf:type")] == ("Billing", "iri")
    assert rows[("PurchaseOrder/1/billing", "amount")] == ("5.0", "xsd:decimal")
    # nothing remains under the old names
    assert not [k for k in rows if k[0].startswith("Order/")]
    assert not [k for k in rows if k[1] in ("prio", "amount") and "/billing" not in k[0]]


def test_class_scoped_property_rename_spares_other_classes(spark):
    a = spark.createDataFrame([(1, "x")], "id bigint, label string")
    b = spark.createDataFrame([(9, "y")], "id bigint, label string")
    triples = triples_from_table(a, "A", "id").unionByName(
        triples_from_table(b, "B", "id")
    )
    out = migrate(
        triples, [{"rename_property": {"class": "A", "from": "label", "to": "name"}}]
    )
    preds = {
        (r.subject, r.predicate) for r in out.where(F.col("predicate") != "rdf:type").collect()
    }
    assert preds == {("A/1", "name"), ("B/9", "label")}


def test_frames_reflect_migrated_world(spark):
    out = migrate(_fixture(spark), STEPS)
    frames = {
        (r["class"], r.predicate): (r.obj_types, r.required)
        for r in class_frames(out).collect()
    }
    assert frames[("PurchaseOrder", "priority")] == ("xsd:string", True)
    assert frames[("Billing", "amount")] == ("xsd:decimal", True)
    assert ("PurchaseOrder", "amount") not in frames
