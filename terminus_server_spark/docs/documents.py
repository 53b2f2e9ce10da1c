"""Document API (SURVEY §2.3).

Parity: terminus-server's document layer (src/core/document/json.pl)
maps JSON documents ↔ triples under a class schema, supports nested
subdocuments/lists, document filtering (the GraphQL read path), a
schema checker, and json diff/patch.

Spark translation: documents are rows with struct/array columns;
"insert" flattens to triples with one explode; "read" reassembles
with collect_list over a key — both single-shuffle operations that
scale to billions of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from terminus_server_spark.model.triples import triples_from_table


def docs_to_triples(docs: DataFrame, class_name: str, key_col: str) -> DataFrame:
    """JSON-ish rows → typed triples (document insert path)."""
    return triples_from_table(docs, class_name, key_col)


def assemble_documents(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    child_key: str,
    list_field: str = "items",
) -> DataFrame:
    """Triples/rows → nested documents: parent rows gain a sorted
    subdocument-id list (the reassembly half of document read).
    collect_list is bounded by real document fan-out, and the sort
    makes output deterministic."""
    kids = child.groupBy(F.col(child_fk).alias(parent_key)).agg(
        F.sort_array(F.collect_list(F.col(child_key))).alias(list_field),
        F.count(F.lit(1)).alias(f"n_{list_field}"),
    )
    return parent.join(kids, parent_key, "left_outer").withColumn(
        f"n_{list_field}", F.coalesce(F.col(f"n_{list_field}"), F.lit(0))
    )


_FILTER_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "like": lambda c, v: c.like(v),
    "regex": lambda c, v: c.rlike(v),
    "in": lambda c, v: c.isin(*v),
}


def compile_filter(tree) -> F.Column:
    """GraphQL filter tree → one boolean Column (the reference's
    _and/_or/_not combinator objects around per-field operator maps).

    Leaf: ``(field, op, value)`` with op in eq/ne/gt/ge/lt/le/like/
    regex/in.  Node: ``("and", [sub...])`` / ``("or", [sub...])`` /
    ``("not", sub)``.  Compiling to a single expression (rather than
    chained .where calls) keeps arbitrary nesting inside one codegen
    stage and lets Catalyst push the disjunction down to the scan."""
    if isinstance(tree, tuple) and len(tree) == 3 and tree[0] not in (
        "and",
        "or",
        "not",
    ):
        field, op, value = tree
        return _FILTER_OPS[op](F.col(field), value)
    kind = tree[0]
    if kind == "not":
        return ~compile_filter(tree[1])
    subs = [compile_filter(t) for t in tree[1]]
    acc = subs[0]
    for s in subs[1:]:
        acc = (acc & s) if kind == "and" else (acc | s)
    return acc


def filter_documents(docs: DataFrame, predicates: list) -> DataFrame:
    """GraphQL-ish filter algebra: list of (field, op, value) ANDed
    (each entry may also be a ``compile_filter`` combinator tree)."""
    out = docs
    for pred in predicates:
        out = out.where(compile_filter(pred))
    return out


def query_documents(
    docs: DataFrame,
    predicates: list | None = None,
    related: list | None = None,
    order_by: list | None = None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """Full GraphQL-ish document query: local field predicates,
    related-document path filters, ordering, pagination — the read
    algebra of the reference's GraphQL layer (filter / orderBy /
    limit / offset arguments, including filters through edges).

    ``related``: list of (fk_col, other_df, other_key, other_predicates)
    — each compiles to a semi-join against the filtered related
    frame, so only keys cross the shuffle (and a dimension-sized
    related side gets broadcast by AQE).
    """
    out = filter_documents(docs, predicates or [])
    for fk_col, other, other_key, other_preds in related or []:
        keys = filter_documents(other, other_preds).select(
            F.col(other_key).alias(fk_col)
        )
        out = out.join(keys, fk_col, "left_semi")
    if order_by:
        out = out.orderBy(
            *[F.col(f).asc() if d == "asc" else F.col(f).desc() for f, d in order_by]
        )
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def validate_documents(docs: DataFrame, schema: dict) -> DataFrame:
    """Schema checker: returns (key, violation) rows — empty means
    valid.  schema: field -> spec dict with optional keys
    ``required`` (bool), ``enum`` (list), ``min``/``max`` (numeric),
    ``max_len`` (string length).  Mirrors the reference's class
    checks (required/cardinality/range) as one codegen'd projection.
    """
    key_col = schema.get("@key", "doc_id")
    checks = []
    for field, spec in schema.items():
        if field.startswith("@"):
            continue
        c = F.col(field)
        if spec.get("required"):
            checks.append(F.when(c.isNull(), F.lit(f"{field}:missing")))
        if "enum" in spec:
            checks.append(
                F.when(c.isNotNull() & ~c.isin(*spec["enum"]), F.lit(f"{field}:not_in_enum"))
            )
        if "min" in spec:
            checks.append(F.when(c.isNotNull() & (c < spec["min"]), F.lit(f"{field}:below_min")))
        if "max" in spec:
            checks.append(F.when(c.isNotNull() & (c > spec["max"]), F.lit(f"{field}:above_max")))
        if "max_len" in spec:
            checks.append(
                F.when(
                    c.isNotNull() & (F.length(c) > spec["max_len"]), F.lit(f"{field}:too_long")
                )
            )
    arr = F.array_compact(F.array(*checks))
    return (
        docs.select(F.col(key_col).alias("key"), F.explode(arr).alias("violation"))
    )


def doc_diff(old: DataFrame, new: DataFrame, key: str, fields: list[str]) -> DataFrame:
    """Field-level diff between two document versions:
    (key, field, old_value, new_value, op ∈ {added, removed, changed}).
    One full-outer join + explode — the set-at-a-time version of the
    reference's per-document json diff."""
    o = old.select(key, *fields).alias("o")
    n = new.select(key, *fields).alias("n")
    joined = o.join(n, on=key, how="full_outer")
    entries = []
    for f_ in fields:
        ov = F.col(f"o.{f_}").cast("string")
        nv = F.col(f"n.{f_}").cast("string")
        entries.append(
            F.struct(
                F.lit(f_).alias("field"),
                ov.alias("old_value"),
                nv.alias("new_value"),
                F.when(ov.isNull() & nv.isNotNull(), "added")
                .when(ov.isNotNull() & nv.isNull(), "removed")
                .when(ov != nv, "changed")
                .alias("op"),
            )
        )
    return (
        joined.select(F.col(key).alias("key"), F.explode(F.array(*entries)).alias("d"))
        .select("key", "d.field", "d.old_value", "d.new_value", "d.op")
        .where(F.col("op").isNotNull())
    )


def doc_patch(old: DataFrame, diff: DataFrame, key: str, fields: list[str]) -> DataFrame:
    """Apply a field-level diff to reconstruct the new version.

    Pivot the diff to one row per key, then coalesce patched values
    over originals.  patch(doc_diff(old, new)) == new for changed
    fields (verified in tests)."""
    pivoted = (
        diff.groupBy("key")
        .pivot("field", fields)
        .agg(F.first("new_value"))
    )
    out = old.alias("o").join(
        pivoted.alias("p"), F.col(f"o.{key}") == F.col("p.key"), "left_outer"
    )
    cols = [F.col(f"o.{key}").alias(key)]
    for f_ in fields:
        dtype = dict(old.dtypes)[f_]
        patched = F.coalesce(F.col(f"p.{f_}").cast(dtype), F.col(f"o.{f_}"))
        cols.append(patched.alias(f_))
    return out.select(*cols)


def insert_documents(
    triples: DataFrame, new_docs: DataFrame, class_name: str, key_col: str
) -> DataFrame:
    """Document insert (json.pl insert_document): new JSON-ish rows
    flatten to typed triples and union into the store — a pure map
    stage over the new docs; the existing store is untouched."""
    return triples.unionByName(docs_to_triples(new_docs, class_name, key_col))


def delete_documents(triples: DataFrame, subjects: DataFrame) -> DataFrame:
    """Document delete (json.pl delete_document): drop every triple
    whose subject is in ``subjects`` (one column ``subject``) — one
    anti-join keyed on subject; broadcastable when the delete set is
    small."""
    return triples.join(subjects.select("subject").distinct(), on="subject", how="left_anti")


_PY_XSD = {bool: "xsd:boolean", int: "xsd:integer", float: "xsd:decimal"}


def update_documents_where(
    triples: DataFrame,
    docs: DataFrame,
    class_name: str,
    key_col: str,
    predicates: list,
    set_values: dict,
) -> DataFrame:
    """GraphQL mutation semantics: update-by-filter compiled to a
    delta layer (reference: GraphQL mutations / replace_document over
    the document layer).  Documents matching the GraphQL filter
    algebra (``predicates`` — same vocabulary as filter_documents)
    get each field in ``set_values`` *replaced*: existing triples for
    those predicates delete, one new typed literal per (subject,
    field) adds — setting a field a document lacked adds it, matching
    document-update semantics.

    Returns the delta frame (op ∈ {add, del} + triple columns) rather
    than mutating anything: it composes with
    ``versioning.layers.apply_delta`` (immediate application) or a
    commit into a layer stack — the same staged-then-commit shape as
    the reference's transaction objects.  Cost: one filter over the
    docs table, one subject semi-join over the store (broadcastable
    when the match set is small), delta-sized adds."""
    matched = filter_documents(docs, predicates)
    subjects = matched.select(
        F.concat(F.lit(class_name + "/"), F.col(key_col).cast("string")).alias(
            "subject"
        )
    )
    dels = (
        triples.join(subjects, "subject", "left_semi")
        .where(F.col("predicate").isin(*set_values.keys()))
        .select(
            F.lit("del").alias("op"),
            "graph",
            "subject",
            "predicate",
            "obj",
            "obj_type",
            "obj_num",
        )
    )
    adds = None
    for pred, val in set_values.items():
        is_num = isinstance(val, (int, float)) and not isinstance(val, bool)
        row = subjects.select(
            F.lit("add").alias("op"),
            F.lit("instance").alias("graph"),
            "subject",
            F.lit(pred).alias("predicate"),
            F.lit(val).cast("string").alias("obj"),
            F.lit(_PY_XSD.get(type(val), "xsd:string")).alias("obj_type"),
            (F.lit(float(val)) if is_num else F.lit(None)).cast("double").alias(
                "obj_num"
            ),
        )
        adds = row if adds is None else adds.unionByName(row)
    return dels.unionByName(adds)


def validate_references(
    docs: DataFrame, targets: DataFrame, fk_col: str, target_key: str
) -> DataFrame:
    """(key, violation): referential-integrity check — documents whose
    ``fk_col`` points at no existing target (the range/instance check
    the reference's schema layer enforces on document insert).  One
    anti-join keyed by the target id; broadcastable when the target
    key set is dimension-sized."""
    dangling = docs.join(
        targets.select(F.col(target_key).alias(fk_col)).distinct(),
        on=fk_col,
        how="left_anti",
    )
    return dangling.select(
        F.col(fk_col).cast("string").alias("key"),
        F.lit(f"{fk_col}:dangling_reference").alias("violation"),
    )


def validate_link_range(
    triples: DataFrame,
    ranges: DataFrame,
    subclass_edges: DataFrame | None = None,
) -> DataFrame:
    """(subject, predicate, obj, violation): link RANGE validation
    with subsumption — the schema check beyond dangling-reference
    detection: a link triple whose target EXISTS but is typed with a
    class that is neither the property's declared range nor one of
    its subclasses violates (``wrong_range``); a target with no
    rdf:type at all reports ``untyped_target``.  The reference
    enforces exactly this on document insert (property range +
    class subsumption).

    ``ranges``: (class, predicate, range_class) declared link
    properties — schema-sized, broadcast.  ``subclass_edges``:
    (src, dst) direct subclass links; the transitive closure plus
    the identity row makes ``accepted`` = {(range, c) : c ⊑ range},
    also schema-sized.  Plan: one self-join of the triples against
    the type triples per side (subject class scopes the declared
    property; object class feeds the subsumption probe) + two
    broadcast schema joins — the corpus shuffles once on the object
    key, nothing else."""
    from terminus_server_spark.operators.path import transitive_closure

    types = triples.where(F.col("predicate") == "rdf:type").select(
        F.col("subject"), F.col("obj").alias("_cls")
    )
    links = (
        triples.where(
            (F.col("obj_type") == "iri") & (F.col("predicate") != "rdf:type")
        )
        .select("subject", "predicate", "obj")
        .join(types, "subject")
        .join(
            F.broadcast(
                ranges.select(
                    F.col("class").alias("_cls"),
                    "predicate",
                    F.col("range_class").alias("_range"),
                )
            ),
            ["_cls", "predicate"],
        )
    )
    if subclass_edges is not None:
        closure = transitive_closure(subclass_edges).select(
            F.col("src").alias("_ocls"), F.col("dst").alias("_range")
        )
    else:
        closure = None
    rng = ranges.select(F.col("range_class").alias("_range")).distinct()
    accepted = rng.select(F.col("_range").alias("_ocls"), "_range")
    if closure is not None:
        accepted = accepted.unionByName(
            closure.join(rng, "_range", "left_semi")
        ).distinct()
    obj_types = types.select(
        F.col("subject").alias("obj"), F.col("_cls").alias("_ocls")
    )
    checked = links.join(obj_types, "obj", "left_outer").join(
        F.broadcast(accepted.withColumn("_ok", F.lit(True))),
        ["_ocls", "_range"],
        "left_outer",
    )
    return checked.where(
        F.col("_ocls").isNull() | F.col("_ok").isNull()
    ).select(
        "subject",
        "predicate",
        "obj",
        F.when(F.col("_ocls").isNull(), F.lit("untyped_target"))
        .otherwise(F.lit("wrong_range"))
        .alias("violation"),
    )


def count_related(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    child_predicates: list | None = None,
    count_alias: str = "n_related",
) -> DataFrame:
    """GraphQL-style aggregation field: each parent document gains the
    count of (optionally filtered) related documents — the read
    layer's ``count`` aggregation over a link field.  One filtered
    aggregate on the child side then a broadcast-friendly join; absent
    children count 0 via the outer join + coalesce."""
    filtered = filter_documents(child, child_predicates or [])
    counts = filtered.groupBy(F.col(child_fk).alias(parent_key)).agg(
        F.count(F.lit(1)).alias(count_alias)
    )
    return parent.join(counts, parent_key, "left_outer").withColumn(
        count_alias, F.coalesce(F.col(count_alias), F.lit(0))
    )


def aggregate_related(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    aggs: list[tuple],
    child_predicates: list | None = None,
) -> DataFrame:
    """GraphQL-style aggregation fields beyond count: each parent
    document gains aggregates over its (optionally filtered) related
    documents — ``aggs``: list of (child_col, fn, alias) with fn ∈
    {sum, min, max, avg, count}.  Sums/avgs follow the decimal-sum
    convention (order-independent) so cross-engine hashes match.  One
    filtered child aggregate keyed by the fk, then a broadcast-
    friendly outer join — identical dataflow to ``count_related``."""
    fns = {
        "sum": lambda c: F.sum(c.cast("decimal(28,6)")).cast("double"),
        "avg": lambda c: F.avg(c.cast("decimal(28,6)")).cast("double"),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
        "count": lambda c: F.count(c),
    }
    filtered = filter_documents(child, child_predicates or [])
    rolled = filtered.groupBy(F.col(child_fk).alias(parent_key)).agg(
        *[fns[fn](F.col(col)).alias(alias) for col, fn, alias in aggs]
    )
    return parent.join(rolled, parent_key, "left_outer")


def validate_cardinality(
    triples: DataFrame, predicate: str, min_n: int = 1, max_n: int = 1,
    class_subjects: DataFrame | None = None,
) -> DataFrame:
    """(key, violation): subjects violating a property-cardinality
    constraint (schema checking's min/max occurrences — TerminusDB
    rejects documents breaking them at insert).  One count aggregate
    keyed by subject; ``class_subjects`` (one column ``subject``)
    supplies the domain so MISSING properties (count 0) are caught,
    not just duplicates."""
    counts = (
        triples.where(F.col("predicate") == predicate)
        .groupBy("subject")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if class_subjects is not None:
        counts = class_subjects.select("subject").join(counts, "subject", "left_outer").fillna(
            {"n": 0}
        )
    return counts.where((F.col("n") < min_n) | (F.col("n") > max_n)).select(
        F.col("subject").alias("key"),
        F.when(F.col("n") < min_n, F.lit(f"{predicate}:below_min_cardinality"))
        .otherwise(F.lit(f"{predicate}:above_max_cardinality"))
        .alias("violation"),
    )


def backlinks(
    targets: DataFrame,
    sources: DataFrame,
    fk_col: str,
    pk_col: str,
    sample_k: int = 3,
    source_id_col: str | None = None,
) -> DataFrame:
    """GraphQL reverse-link field (`_of_<Class>` back-references in
    the reference's generated GraphQL schema): for every target
    document, the documents pointing AT it — count plus the first
    ``sample_k`` linker ids (deterministic, sorted).

    One aggregation on the link key, then a join back to the targets
    (broadcast when targets is dim-sized).  The sample is bounded by
    construction — no unbounded collect_list of a hot target's whole
    in-neighborhood; at 100 TB the per-target state is the sample
    array, capped at k, via the sort-then-slice aggregate."""
    sid = source_id_col or fk_col
    agg = sources.groupBy(F.col(fk_col).alias("_link")).agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.slice(F.array_sort(F.collect_list(F.col(sid))), 1, sample_k).alias(
            "first_ids"
        ),
    )
    return targets.join(
        agg, targets[pk_col] == agg["_link"], "left"
    ).drop("_link").withColumn(
        "n_incoming", F.coalesce("n_incoming", F.lit(0).cast("bigint"))
    ).withColumn(
        "first_ids",
        F.coalesce("first_ids", F.array().cast(agg.schema["first_ids"].dataType)),
    )


def validate_oneof(
    docs: DataFrame, id_col: str, variant_cols: list[str]
) -> DataFrame:
    """Tagged-union (@oneOf) validation — the reference's TaggedUnion
    class family requires EXACTLY one variant field set per document.
    Returns one row per violating document: (key, violation, n_set)
    with violation ∈ {'oneof:none_set', 'oneof:multiple_set'}.
    Pure column expressions over one scan."""
    n_set = None
    for c in variant_cols:
        term = F.when(F.col(c).isNotNull(), 1).otherwise(0)
        n_set = term if n_set is None else n_set + term
    out = docs.select(F.col(id_col).alias("key"), n_set.cast("int").alias("n_set"))
    return out.where(F.col("n_set") != 1).select(
        "key",
        F.when(F.col("n_set") == 0, "oneof:none_set")
        .otherwise("oneof:multiple_set")
        .alias("violation"),
        "n_set",
    )


def validate_enum(
    docs: DataFrame, id_col: str, value_col: str, allowed: list[str]
) -> DataFrame:
    """Enum-type validation — the reference's ``@type: Enum`` classes
    restrict a property's value to a closed literal set
    (document/json_schema.pl enum handling).  Returns one row per
    violating document: (key, value, violation) with violation
    'enum:invalid_value'; NULL values are a cardinality concern
    (``schema_cardinality``), not an enum one, and pass here.
    The allowed set is a literal isin — a broadcast-free map-side
    filter at any scale."""
    v = F.col(value_col)
    return docs.where(v.isNotNull() & ~v.isin(*allowed)).select(
        F.col(id_col).alias("key"),
        v.alias("value"),
        F.lit("enum:invalid_value").alias("violation"),
    )


def patch_with_conflicts(
    current: DataFrame, diff: DataFrame, key: str, fields: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Checked patch application — the reference's patch format
    carries ``@before`` values and rejects an op whose target no
    longer matches (terminusdb patch/diff: conflict on mismatched
    before-state).  ``diff`` is doc_diff output (key, field,
    old_value, new_value, op).

    Returns ``(patched, conflicts)``:
    - conflicts: one row per op whose expected old_value differs from
      the value actually in ``current`` — (key, field, expected,
      found); these ops are NOT applied;
    - patched: ``current`` with every *non-conflicting* op applied
      (field-wise coalesce, same shape as doc_patch).

    One unpivot of the current frame + one join keyed (key, field) —
    scales with |diff|, broadcastable when the patch is small."""
    cur_long = current.select(
        F.col(key).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f_).alias("field"),
                        F.col(f_).cast("string").alias("found"),
                    )
                    for f_ in fields
                ]
            )
        ).alias("cv"),
    ).select("key", "cv.field", "cv.found")
    checked = diff.join(cur_long, ["key", "field"], "left")
    conflicts = checked.where(
        ~(
            (F.col("old_value").isNull() & F.col("found").isNull())
            | (F.col("old_value") == F.col("found"))
        )
    ).select("key", "field", F.col("old_value").alias("expected"), "found")
    clean = checked.join(
        conflicts.select("key", "field"), ["key", "field"], "left_anti"
    ).select("key", "field", "old_value", "new_value", "op")
    return doc_patch(current, clean, key, fields), conflicts


_GQL_SCALARS = {
    "xsd:string": "String",
    "xsd:decimal": "Float",
    "xsd:double": "Float",
    "xsd:float": "Float",
    "xsd:integer": "Int",
    "xsd:int": "Int",
    "xsd:long": "Int",
    "xsd:boolean": "Boolean",
    "xsd:dateTime": "DateTime",
    "xsd:date": "DateTime",
}


def graphql_schema(
    frames: DataFrame,
    id_cols: dict[str, str] | None = None,
    backlink_names: dict[tuple[str, str], str] | None = None,
    documentation: DataFrame | None = None,
    enums: DataFrame | None = None,
) -> DataFrame:
    """(type_name, kind, doc): the GraphQL schema document generated
    from effective class frames — the reference's graphql layer emits
    exactly this from its schema (terminus-server src/rust/graphql:
    one object type per class, a ``<Class>_Filter`` input type with
    per-field operators and ``_and/_or/_not`` combinators, reverse
    ``_of_<Class>`` link fields, and a Query root with
    filter/orderBy/limit/offset arguments per class).

    ``frames``: (class, predicate, obj_types, required) — effective
    (post-inheritance) frames, one row per class×property, where
    ``obj_types`` is an ``xsd:*`` scalar or a target class name for
    links.  Every target class must itself appear as a class.

    Rendering: scalars map xsd→GraphQL (string→String,
    decimal/double/float→Float, integer→Int, boolean→Boolean,
    dateTime→DateTime); every object type carries ``_id: ID!``; a
    link property typed with the target class adds ``_of_<Source>:
    [Source]`` on the target; filter fields carry the op set the read
    algebra compiles (strings eq/ne/lt/gt/like/regex, ordered scalars
    eq/ne/lt/gt, booleans eq/ne, links eq).  Field lists are
    name-sorted so the JSON rendering is canonical and byte-stable.
    Schema generation is metadata-scale; the plan is a handful of
    unions + one groupBy over |classes × properties| rows.

    ``id_cols`` (same registry ``execute_graphql`` consumes): when
    provided, the ``id``/``ids`` query arguments are advertised ONLY
    for classes with a registered id column — the executor raises for
    any other class, and the published schema must not promise what
    the executor rejects.  When ``None`` (legacy call shape) every
    class advertises id/ids and the caller is responsible for
    registering an id column per class before executing them.

    ``backlink_names``: (source_class, predicate) → declared field
    name — back-link naming sugar (the reference's configurable
    reverse-field names): the reverse field a link property generates
    on its TARGET class renders under the declared name instead of
    the default ``_of_<Source>``.  Execution needs no special case —
    a declared back-link registers with the executor as an ordinary
    relation under the same name.

    ``documentation``: optional (class, predicate, comment) frame —
    the schema's ``@documentation`` blocks (predicate NULL = the
    class-level ``@comment``, non-NULL = a per-property description).
    Comments surface as GraphQL ``description`` members on OBJECT
    types and their fields (the introspection protocol's description
    slot, which codegen clients read).  to_json drops NULL struct
    members, so undocumented schemas render byte-identically to the
    pre-documentation shape.

    ``enums``: optional (class, value, description) frame — the
    schema's Enum classes (TerminusDB ``@type: Enum`` with ``@values``
    and the ``@documentation: {@values: {...}}`` per-value
    descriptions).  Each enum class renders as a ``kind='ENUM'``
    schema document with a name-sorted ``enumValues`` array of
    ``{name, description}`` (description NULL → dropped on render),
    plus the class-level ``@comment`` from ``documentation``;
    introspection serves them through ``__type { enumValues { name
    description } }``.  Properties typed with an enum class keep the
    enum name as their field type but generate NO reverse link field
    (an enum value is not a document)."""
    is_link = ~F.col("obj_types").startswith("xsd:")
    ftype = F.lit(None).cast("string")
    for x, g in sorted(_GQL_SCALARS.items()):
        ftype = F.when(F.col("obj_types") == x, F.lit(g)).otherwise(ftype)
    ftype = F.when(is_link, F.col("obj_types")).otherwise(ftype)

    classes = frames.select(F.col("class").alias("type_name")).distinct()

    null_desc = F.lit(None).cast("string")

    def fld(name, typ, nonnull, desc=null_desc):
        return F.struct(
            name.alias("name"),
            typ.alias("type"),
            nonnull.alias("nonNull"),
            desc.alias("description"),
        )

    if documentation is not None:
        prop_docs = documentation.where(
            F.col("predicate").isNotNull()
        ).select("class", "predicate", F.col("comment").alias("_desc"))
        doc_frames = frames.join(
            F.broadcast(prop_docs), ["class", "predicate"], "left_outer"
        )
        class_docs = documentation.where(F.col("predicate").isNull()).select(
            F.col("class").alias("type_name"),
            F.col("comment").alias("_cls_desc"),
        )
    else:
        doc_frames = frames.withColumn("_desc", null_desc)
        class_docs = None

    own = doc_frames.select(
        F.col("class").alias("type_name"),
        fld(
            F.col("predicate"), ftype, F.col("required"), F.col("_desc")
        ).alias("field"),
    )
    ids = classes.select(
        "type_name", fld(F.lit("_id"), F.lit("ID"), F.lit(True)).alias("field")
    )
    rev_name = F.concat(F.lit("_of_"), F.col("class"))
    for (src_cls, pred), declared in sorted((backlink_names or {}).items()):
        rev_name = F.when(
            (F.col("class") == src_cls) & (F.col("predicate") == pred),
            F.lit(declared),
        ).otherwise(rev_name)
    rev_src = frames.where(is_link)
    if enums is not None:
        # enum-typed properties are scalar-like: no reverse link
        rev_src = rev_src.join(
            F.broadcast(
                enums.select(F.col("class").alias("obj_types")).distinct()
            ),
            "obj_types",
            "left_anti",
        )
    rev = rev_src.select(
        F.col("obj_types").alias("type_name"),
        fld(
            rev_name,
            F.concat(F.lit("["), F.col("class"), F.lit("]")),
            F.lit(False),
        ).alias("field"),
    )
    objects = (
        own.unionByName(ids)
        .unionByName(rev)
        .groupBy("type_name")
        .agg(F.array_sort(F.collect_list("field")).alias("fields"))
    )
    if class_docs is not None:
        objects = objects.join(F.broadcast(class_docs), "type_name", "left_outer")
    else:
        objects = objects.withColumn("_cls_desc", null_desc)
    objects = objects.select(
        "type_name",
        F.lit("OBJECT").alias("kind"),
        F.to_json(
            F.struct(
                F.col("type_name").alias("name"),
                F.lit("OBJECT").alias("kind"),
                F.col("_cls_desc").alias("description"),
                F.col("fields"),
            )
        ).alias("doc"),
    )

    str_ops = F.array(*[F.lit(o) for o in ("eq", "ne", "lt", "gt", "like", "regex")])
    ord_ops = F.array(*[F.lit(o) for o in ("eq", "ne", "lt", "gt")])
    bool_ops = F.array(F.lit("eq"), F.lit("ne"))
    link_ops = F.array(F.lit("eq"))
    no_ops = F.array().cast("array<string>")
    ops = (
        F.when(is_link, link_ops)
        .when(F.col("obj_types") == "xsd:boolean", bool_ops)
        .when(F.col("obj_types") == "xsd:string", str_ops)
        .otherwise(ord_ops)
    )

    def ffld(name, typ, ops_col):
        return F.struct(name.alias("name"), typ.alias("type"), ops_col.alias("ops"))

    fprops = frames.select(
        F.col("class").alias("type_name"),
        ffld(F.col("predicate"), ftype, ops).alias("field"),
    )
    fname = F.concat(F.col("type_name"), F.lit("_Filter"))
    flist = F.concat(F.lit("["), F.col("type_name"), F.lit("_Filter]"))
    combinators = classes.select(
        "type_name",
        F.explode(
            F.array(
                ffld(F.lit("_and"), flist, no_ops),
                ffld(F.lit("_not"), fname, no_ops),
                ffld(F.lit("_or"), flist, no_ops),
            )
        ).alias("field"),
    )
    filters = (
        fprops.unionByName(combinators)
        .groupBy("type_name")
        .agg(F.array_sort(F.collect_list("field")).alias("fields"))
        .select(
            F.concat(F.col("type_name"), F.lit("_Filter")).alias("type_name"),
            F.lit("INPUT_OBJECT").alias("kind"),
            F.to_json(
                F.struct(
                    F.concat(F.col("type_name"), F.lit("_Filter")).alias("name"),
                    F.lit("INPUT_OBJECT").alias("kind"),
                    F.col("fields"),
                )
            ).alias("doc"),
        )
    )

    base_args = ("filter", "orderBy", "limit", "offset")
    full_args = F.array(*[F.lit(a) for a in ("id", "ids") + base_args])
    if id_cols is None:
        qargs = full_args
    else:
        with_id = F.col("type_name").isin(*id_cols.keys()) if id_cols else F.lit(False)
        qargs = F.when(with_id, full_args).otherwise(
            F.array(*[F.lit(a) for a in base_args])
        )
    query = (
        classes.select(
            F.struct(
                F.col("type_name").alias("name"),
                F.concat(F.lit("["), F.col("type_name"), F.lit("]")).alias("type"),
                qargs.alias("args"),
            ).alias("field")
        )
        .agg(F.array_sort(F.collect_list("field")).alias("fields"))
        .select(
            F.lit("Query").alias("type_name"),
            F.lit("QUERY").alias("kind"),
            F.to_json(
                F.struct(
                    F.lit("Query").alias("name"),
                    F.lit("QUERY").alias("kind"),
                    F.col("fields"),
                )
            ).alias("doc"),
        )
    )
    # the Mutation root type (the reference's generated mutation
    # fields _insertDocuments / _updateDocuments / _deleteDocuments,
    # executed by execute_graphql_mutation): constant shape — the
    # class is an argument, not a per-class field — served through
    # __schema { mutationType } introspection
    def mfld(name, args):
        return F.struct(
            F.lit(name).alias("name"),
            F.lit("Int").alias("type"),
            F.array(*[F.lit(a) for a in args]).alias("args"),
        )

    mutation = classes.limit(1).select(
        F.lit("Mutation").alias("type_name"),
        F.lit("MUTATION").alias("kind"),
        F.to_json(
            F.struct(
                F.lit("Mutation").alias("name"),
                F.lit("MUTATION").alias("kind"),
                F.array(
                    mfld("_deleteDocuments", ["class", "filter"]),
                    mfld("_insertDocuments", ["class", "docs"]),
                    mfld("_updateDocuments", ["class", "filter", "set"]),
                ).alias("fields"),
            )
        ).alias("doc"),
    )
    out = (
        objects.unionByName(filters).unionByName(query).unionByName(mutation)
    )
    if enums is not None:
        ev = (
            enums.groupBy(F.col("class").alias("type_name"))
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("value").alias("name"),
                            F.col("description"),
                        )
                    )
                ).alias("enumValues")
            )
        )
        if class_docs is not None:
            ev = ev.join(F.broadcast(class_docs), "type_name", "left_outer")
        else:
            ev = ev.withColumn("_cls_desc", null_desc)
        enum_types = ev.select(
            "type_name",
            F.lit("ENUM").alias("kind"),
            F.to_json(
                F.struct(
                    F.col("type_name").alias("name"),
                    F.lit("ENUM").alias("kind"),
                    F.col("_cls_desc").alias("description"),
                    F.col("enumValues"),
                )
            ).alias("doc"),
        )
        out = out.unionByName(enum_types)
    return out


def enum_frames_wire(
    enums: DataFrame,
    documentation: DataFrame | None = None,
) -> DataFrame:
    """(class, frame): Enum class definitions rendered as the frames
    wire JSON (the reference's GET /api/schema shape for ``@type:
    Enum`` classes): ``{"@id", "@type": "Enum", "@documentation":
    {"@comment", "@values": {value: description, ...}}, "@values":
    [sorted values]}``.  ``enums``: (class, value, description) —
    per-value descriptions may be NULL; a class with no documented
    value and no class comment renders without the ``@documentation``
    member at all (to_json drops NULL members), so undocumented enums
    keep the bare pre-documentation shape.  ``documentation``: the
    same (class, predicate, comment) frame ``graphql_schema`` takes —
    predicate-NULL rows supply the class-level ``@comment``.  Value
    order is canonical (name-sorted) in both ``@values`` and the
    ``@documentation.@values`` map, so the JSON is byte-stable.
    Metadata-scale: one groupBy over |enum values| rows."""
    vals = enums.groupBy("class").agg(
        F.array_sort(F.collect_list("value")).alias("_values"),
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("description").isNotNull(),
                        F.struct("value", "description"),
                    )
                )
            )
        ).alias("_vdocs"),
    )
    if documentation is not None:
        cls_doc = documentation.where(F.col("predicate").isNull()).select(
            "class", F.col("comment").alias("_cls_desc")
        )
        vals = vals.join(F.broadcast(cls_doc), "class", "left_outer")
    else:
        vals = vals.withColumn("_cls_desc", F.lit(None).cast("string"))
    has_docs = (F.size("_vdocs") > 0) | F.col("_cls_desc").isNotNull()
    doc_block = F.when(
        has_docs,
        F.struct(
            F.col("_cls_desc").alias("@comment"),
            F.when(F.size("_vdocs") > 0, F.col("_vdocs")).alias("@values"),
        ),
    )
    return vals.select(
        "class",
        F.to_json(
            F.struct(
                F.col("class").alias("@id"),
                F.lit("Enum").alias("@type"),
                doc_block.alias("@documentation"),
                F.col("_values").alias("@values"),
            )
        ).alias("frame"),
    )


def replace_documents(
    triples: DataFrame, new_docs: DataFrame, class_name: str, key_col: str
) -> DataFrame:
    """ReplaceDocument semantics (the reference's PUT /api/document —
    whole-document replacement, distinct from field-level update):
    EVERY existing triple of each replaced subject retracts and the
    new body's triples insert, so fields absent from the new body
    VANISH — the behavior that separates replace from update.
    Returns the (op, triple...) delta frame for ``apply_delta`` /
    commit composition, like ``update_documents_where``.  One subject
    semi-join for the retraction (broadcastable at request size) +
    one map stage for the new bodies."""
    subjects = new_docs.select(
        F.concat(F.lit(class_name + "/"), F.col(key_col).cast("string")).alias("subject")
    )
    dels = triples.join(subjects, "subject", "left_semi").select(
        F.lit("del").alias("op"),
        "graph",
        "subject",
        "predicate",
        "obj",
        "obj_type",
        "obj_num",
    )
    adds = docs_to_triples(new_docs, class_name, key_col).select(
        F.lit("add").alias("op"),
        "graph",
        "subject",
        "predicate",
        "obj",
        "obj_type",
        "obj_num",
    )
    return dels.unionByName(adds)


def merge_documents_three_way(
    base: DataFrame,
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    fields: list[str],
) -> DataFrame:
    """(key, field, base_v, left_v, right_v, merged_v, status):
    field-grain three-way document merge — the diff3 the reference's
    JSON diff/patch machinery implies (public locus: terminus-server
    document diff/patch API; a branch merge of documents resolves per
    FIELD, not per triple): a field only one side changed takes that
    side's value, both-same changes agree, and a field BOTH sides
    changed differently is a conflict (merged_v keeps base — the
    caller decides, like conflict markers).

    Everything melts to (key, field, value) rows — one explode per
    side, one 3-way join keyed by (key, field) — so the merge scales
    with |docs|·|fields| and the status ladder is a single CASE.
    Values compare as strings (NULL-safe), matching JSON-diff
    semantics where type changes are value changes."""
    def melt(df: DataFrame, tag: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("field"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in fields
            ]
        )
        return df.select(
            F.col(key_col), F.explode(pairs).alias("p")
        ).select(key_col, F.col("p.field").alias("field"), F.col("p.v").alias(tag))

    b = melt(base, "base_v")
    l = melt(left, "left_v")
    r = melt(right, "right_v")
    j = b.join(l, [key_col, "field"], "full_outer").join(
        r, [key_col, "field"], "full_outer"
    )
    lch = ~F.col("left_v").eqNullSafe(F.col("base_v"))
    rch = ~F.col("right_v").eqNullSafe(F.col("base_v"))
    status = (
        F.when(~lch & ~rch, F.lit("unchanged"))
        .when(lch & ~rch, F.lit("left"))
        .when(~lch & rch, F.lit("right"))
        .when(F.col("left_v").eqNullSafe(F.col("right_v")), F.lit("both_same"))
        .otherwise(F.lit("conflict"))
    )
    merged = (
        F.when(status == "left", F.col("left_v"))
        .when(status == "right", F.col("right_v"))
        .when(status == "both_same", F.col("left_v"))
        .when(status == "conflict", F.col("base_v"))
        .otherwise(F.col("base_v"))
    )
    return j.select(
        key_col, "field", "base_v", "left_v", "right_v",
        merged.alias("merged_v"), status.alias("status"),
    )


def random_key_subjects(df: DataFrame, class_name: str) -> DataFrame:
    """Attach a Random-strategy subject id: ``<Class>/<uuid4>`` (the
    reference's fourth document key type beside lexical / hash /
    value_hash — public locus: TerminusDB schema key strategies;
    Random draws a fresh unique id per inserted document, used when
    no natural or content-derived key exists).

    Nondeterministic BY SPECIFICATION — uuid() draws per row on the
    executors with no coordination (scale-free id assignment: no
    sequence bottleneck, no shuffle).  Correctness therefore gates on
    INVARIANTS rather than values: cardinality preserved, ids unique,
    ids well-formed, payload untouched — exactly what the registry
    key's aggregate checks."""
    return df.withColumn(
        "subject", F.concat(F.lit(class_name + "/"), F.expr("uuid()"))
    )


def documentation_for_language(
    documentation: DataFrame, language: str
) -> DataFrame:
    """(class, predicate, comment): resolve a MULTILINGUAL
    ``@documentation`` frame — (class, predicate, comment, language)
    rows, language NULL = the untagged default block — to the
    single-language shape :func:`graphql_schema` and the frames wire
    consume, for one requested language.  TerminusDB v10.1+ accepts
    ``@documentation`` as a LIST of per-``@language`` blocks; a
    client asks in one language and the server answers from the best
    block per documented item:

    1. the exact requested language,
    2. else the untagged default block,
    3. else the lexicographically first tagged language —
       deterministic, so two engines always agree.

    Resolution is one min(struct) aggregate at the (class, predicate)
    grain over the (tiny, broadcastable) documentation frame — no
    window, no shuffle of anything corpus-sized."""
    rank = (
        F.when(F.col("language") == language, F.lit(1))
        .when(F.col("language").isNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    pick = F.min(
        F.struct(
            rank.alias("r"),
            F.coalesce(F.col("language"), F.lit("")).alias("lang"),
            F.col("comment").alias("comment"),
        )
    ).alias("_pick")
    return (
        documentation.groupBy("class", "predicate")
        .agg(pick)
        .select("class", "predicate", F.col("_pick.comment").alias("comment"))
    )
