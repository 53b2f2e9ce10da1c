"""Schema migration with instance-data rewrite (SURVEY §2.3 ext).

Reference parity: terminus-server's schema migration rewrites
instance triples when classes/properties change (public repo:
src/core/document/migration.pl — class rename, property rename,
type changes, and structural moves shipped in newer public
releases).  Validation infers frames before/after via
``class_frames`` (triples.py).

Spark translation: each migration step is a *pure column rewrite* or
a subject-keyed marker join over the triple frame — no driver
round-trips, no shuffles beyond the class-scoping join (which keys on
``subject``, the store's natural co-location/bucketing key, so on a
bucketed store it is shuffle-free).  Steps compose lazily; one
migration of N steps is a single Catalyst plan over one scan.

Steps (the ``migrate`` dispatcher's vocabulary):

- ``rename_class``: class IRI rename — rdf:type objects, subject IRI
  prefixes, and object IRIs referencing the class all rewrite
  (``Order/42`` → ``PurchaseOrder/42``, including subdocument
  subjects below the prefix).
- ``rename_property``: predicate rename scoped to subjects of one
  class (a global rename would clobber a same-named property on
  another class — the reference scopes by class too).
- ``widen_type``: lexical-preserving type widening on one predicate
  (e.g. xsd:integer → xsd:decimal: every integer lexical form is a
  valid decimal lexical form, so only ``obj_type`` changes; the
  numeric shadow column is already double).
- ``move_to_subdocument``: structural move of one property of a
  class into a keyed subdocument: the moved triple re-homes onto
  ``<subject>/<sub_name>``, plus one link triple and one rdf:type
  triple for the new subdocument per affected subject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from terminus_server_spark.model.triples import RDF_TYPE


def _strip_prefix(col, prefix: str, new_prefix: str):
    """prefix-rewrite of an IRI column (plan-time constant lengths —
    whole-stage codegen, no regex)."""
    return F.concat(
        F.lit(new_prefix), col.substr(F.lit(len(prefix) + 1), F.length(col))
    )


def _class_subjects(triples: DataFrame, cls: str) -> DataFrame:
    return (
        triples.where((F.col("predicate") == RDF_TYPE) & (F.col("obj") == cls))
        .select("subject")
        .distinct()
    )


def rename_class(triples: DataFrame, old: str, new: str) -> DataFrame:
    """Class rename: type objects, subject prefixes (subdocuments
    below the prefix included) and referencing object IRIs."""
    op, np = old + "/", new + "/"
    is_type = (F.col("predicate") == RDF_TYPE) & (F.col("obj") == old)
    subj = F.when(
        F.col("subject").startswith(op), _strip_prefix(F.col("subject"), op, np)
    ).otherwise(F.col("subject"))
    obj = (
        F.when(is_type, F.lit(new))
        .when(
            (F.col("obj_type") == "iri") & F.col("obj").startswith(op),
            _strip_prefix(F.col("obj"), op, np),
        )
        .otherwise(F.col("obj"))
    )
    return triples.withColumn("subject", subj).withColumn("obj", obj)


def rename_property(triples: DataFrame, cls: str, old: str, new: str) -> DataFrame:
    """Predicate rename scoped to subjects of ``cls`` — one marker
    join keyed on subject (co-located on a subject-bucketed store)."""
    marks = _class_subjects(triples, cls).withColumn("_in_cls", F.lit(1))
    return (
        triples.join(marks, "subject", "left")
        .withColumn(
            "predicate",
            F.when(
                (F.col("predicate") == old) & F.col("_in_cls").isNotNull(), new
            ).otherwise(F.col("predicate")),
        )
        .drop("_in_cls")
    )


def widen_type(triples: DataFrame, predicate: str, frm: str, to: str) -> DataFrame:
    """Type widening on one predicate — lexical forms are preserved
    (every value of the narrower type is a valid lexical of the wider
    one), so this is a pure obj_type column rewrite."""
    return triples.withColumn(
        "obj_type",
        F.when(
            (F.col("predicate") == predicate) & (F.col("obj_type") == frm), to
        ).otherwise(F.col("obj_type")),
    )


def move_to_subdocument(
    triples: DataFrame, cls: str, predicate: str, sub_name: str, sub_class: str
) -> DataFrame:
    """Move ``predicate`` of ``cls`` into a keyed subdocument: the
    moved triples re-home onto ``<subject>/<sub_name>`` and each
    affected subject gains a link triple and the subdocument's
    rdf:type triple.  One marker join + three delta-sized unions."""
    marks = _class_subjects(triples, cls).withColumn("_in_cls", F.lit(1))
    marked = triples.join(marks, "subject", "left")
    moving = (F.col("predicate") == predicate) & F.col("_in_cls").isNotNull()
    sub_subject = F.concat(F.col("subject"), F.lit("/" + sub_name))
    kept = marked.where(~moving).drop("_in_cls")
    moved = (
        marked.where(moving)
        .withColumn("subject", sub_subject)
        .drop("_in_cls")
    )
    affected = marked.where(moving).select("subject").distinct()

    def mk(pred_lit: str, subj_col, obj_col) -> DataFrame:
        sel = []
        for name in triples.columns:
            if name == "graph":
                sel.append(F.lit("instance").alias("graph"))
            elif name == "subject":
                sel.append(subj_col.alias("subject"))
            elif name == "predicate":
                sel.append(F.lit(pred_lit).alias("predicate"))
            elif name == "obj":
                sel.append(obj_col.alias("obj"))
            elif name == "obj_type":
                sel.append(F.lit("iri").alias("obj_type"))
            else:
                sel.append(
                    F.lit(None).cast(dict(triples.dtypes)[name]).alias(name)
                )
        return affected.select(*sel)

    links = mk(sub_name, F.col("subject"), sub_subject)
    types = mk(RDF_TYPE, sub_subject, F.lit(sub_class))
    return kept.unionByName(moved).unionByName(links).unionByName(types)


def migrate(triples: DataFrame, steps: list[dict]) -> DataFrame:
    """Apply a migration script — a list of single-key step dicts,
    e.g. ``{"rename_class": {"from": "Order", "to": "PurchaseOrder"}}``
    — in order, composing one lazy plan."""
    from terminus_server_spark.checkpoint import plan_checkpoint

    for step in steps:
        (kind, args), = step.items()
        if kind in ("rename_property", "move_to_subdocument"):
            # these steps join the frame against a projection of
            # itself (the class-member marker); checkpoint first so
            # the self-reference doesn't duplicate the whole upstream
            # plan (5 steps were compounding to 48 parquet scans)
            triples = plan_checkpoint(triples)
        if kind == "rename_class":
            triples = rename_class(triples, args["from"], args["to"])
        elif kind == "rename_property":
            triples = rename_property(
                triples, args["class"], args["from"], args["to"]
            )
        elif kind == "widen_type":
            triples = widen_type(triples, args["predicate"], args["from"], args["to"])
        elif kind == "move_to_subdocument":
            triples = move_to_subdocument(
                triples,
                args["class"],
                args["predicate"],
                args["sub"],
                args["sub_class"],
            )
        else:
            raise NotImplementedError(f"unknown migration step: {kind}")
    return triples
