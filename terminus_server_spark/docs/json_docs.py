"""Schemaless JSON documents (``sys:JSON``) — SURVEY §2.3 extension.

Parity: public TerminusDB v10.1+ stores arbitrary UNTYPED JSON
documents (class ``sys:JSON``) and JSON-valued fields alongside
schema-checked classes (docs.terminusdb.com "JSON documents"): a JSON
document inserts without a class frame, reads back as the same JSON,
and diffs/patches at the JSON grain.  The rest of this package's
document API is schema-typed (plan-time recursive unroll over a known
StructType); this module is the schemaless complement, where the
document structure is only known per-row at RUNTIME.

Spark-first design — Spark 4's semi-structured answer is VariantType:

- ``parse_json`` → variant; ``to_json(variant)`` is the CANONICAL
  compact rendering (whitespace stripped, key order preserved,
  minimal number forms) — canonicalization is one JVM expression.
- The leaf flattener chains ``variant_explode_outer`` lateral joins
  ``max_depth`` times over ONE frame: a scalar (or an
  already-finished leaf) explodes to a single all-NULL row and flows
  through unchanged, a non-empty container fans out to its children,
  an empty container ({} / []) surfaces as its own leaf.  The whole
  walk is ONE SCAN followed by ``max_depth`` generator stages — no
  second pass, no Python, no driver loop over data, and row count
  converges to the leaf count (never the product of levels).
- Content addressing (``JSONDocument/<md5(canonical)>``) is the
  ValueHash key strategy applied at the document grain — the
  deterministic analogue of the reference's random JSON document
  keys, and what makes insert idempotent (a re-inserted document is
  the SAME subject, so ``distinct()`` dedups the store).

Scale shape: everything is map-side except the idempotence
``distinct()`` (one shuffle at the leaf-triple grain) and the diff's
full-outer join keyed by (id, path).  Depth caps at ``max_depth``;
containers still unexploded at the cap surface as single JSON-blob
leaves (obj_type ``sys:json``) rather than being dropped.

Key grammar (ENFORCED, not just documented): object keys must not
contain '.', '[', ']' (path ambiguity), '"', '\\', or control
characters (the leaf paths are embedded raw in rendered JSON during
reassembly, so such keys would produce invalid output and silently
break the patch/merge roundtrip law).  ``json_leaves`` raises at
evaluation time on the first offending key — reject-up-front
semantics, matching the JSONPath interop limitation the module
already targeted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_json(col: F.Column | str) -> F.Column:
    """The canonical compact rendering: parse → re-serialize.
    Whitespace-insensitive, KEY-SORTED (variant objects store fields
    ordered by name — measured, not assumed), minimal number forms —
    so two semantically equal JSON objects canonicalize
    byte-identically regardless of their original key order, which is
    exactly the property content addressing needs."""
    return F.to_json(F.parse_json(F.col(col) if isinstance(col, str) else col))


# Key grammar (see module doc): object keys carrying path
# metacharacters, quotes, backslashes or control chars would corrupt
# reassembled JSON downstream — reject at evaluation time.
_KEY_PATTERN = r'[.\[\]"\\]|[\x00-\x1f]'
_KEY_MSG = (
    "sys:JSON object key contains a reserved character "
    '(one of . [ ] " \\ or a control char): '
)


def json_leaves(
    df: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "json",
    max_depth: int = 8,
) -> DataFrame:
    """(id, path, value, vtype): every leaf of every document, paths
    in JSONPath form ('$', '$.meta.chars', '$.tags[1]'), values as
    canonical JSON renderings ('"x"', '1', 'null', 'true' — and '{}'
    / '[]' for empty containers, which are leaves of their own).

    One scan + ``max_depth`` chained variant_explode_outer stages
    (see module doc for why finished leaves flow through unchanged).

    The chain is assembled as ONE parameterized SQL statement instead
    of ``max_depth`` DataFrame ``lateralJoin`` calls: each DataFrame
    transformation eagerly re-analyzes its whole accumulated plan, so
    the chained form paid a quadratic driver-side analysis cost that
    dominated wall time (measured: 5–13 s of plan build per query at
    depth 8 before any task ran).  One ``spark.sql`` call analyzes
    the full chain once.  The projected two-column source is also
    spread to cluster width first (checkpoint.spread_input): the
    per-row variant walk is CPU-heavy, and a single-file local input
    would otherwise run the whole walk in one task (at scale the
    input arrives as many splits and the spread is a no-op).
    """
    from terminus_server_spark.checkpoint import spread_input

    spark = df.sparkSession
    src = spread_input(
        df.select(F.col(id_col).alias("id"), F.col(json_col).alias("j"))
    )
    sql = "SELECT id, '$' AS path, parse_json(j) AS v FROM {src}"
    for _ in range(max_depth):
        # value NULL (SQL null, not JSON null): the row was a leaf or
        # an EMPTY container — keep its path and variant unchanged.
        # JSON null children arrive as a VARIANT null (non-SQL-null)
        # and classify as leaves on the next round via VOID.
        sql = (
            "SELECT id, CASE WHEN value IS NULL THEN path "
            "WHEN key IS NOT NULL THEN concat(path, '.', "
            "CASE WHEN key RLIKE :kpat "
            "THEN raise_error(concat(:kmsg, key)) ELSE key END) "
            "ELSE concat(path, '[', CAST(pos AS STRING), ']') END AS path, "
            "CASE WHEN value IS NULL THEN v ELSE value END AS v "
            "FROM (" + sql + ") AS t, LATERAL variant_explode_outer("
            "CASE WHEN startswith(schema_of_variant(v),'OBJECT') "
            "OR startswith(schema_of_variant(v),'ARRAY') THEN v END)"
        )
    final = (
        "SELECT id, path, to_json(v) AS value, "
        "CASE WHEN sv = 'VOID' THEN 'sys:null' "
        "WHEN sv = 'STRING' THEN 'xsd:string' "
        "WHEN sv = 'BOOLEAN' THEN 'xsd:boolean' "
        "WHEN sv IN ('BIGINT','INT','SMALLINT','TINYINT') "
        "THEN 'xsd:integer' "
        "WHEN startswith(sv,'DECIMAL') OR sv IN ('DOUBLE','FLOAT') "
        "THEN 'xsd:decimal' "
        "ELSE 'sys:json' END AS vtype "
        "FROM (SELECT id, path, v, schema_of_variant(v) AS sv "
        "FROM (" + sql + "))"
    )
    return spark.sql(final, args={"kpat": _KEY_PATTERN, "kmsg": _KEY_MSG}, src=src)


def schemaless_to_triples(
    docs: DataFrame,
    json_col: str,
    doc_id_col: str | None = None,
    prefix: str = "JSONDocument",
    graph: str = "instance",
    max_depth: int = 8,
) -> DataFrame:
    """Arbitrary JSON documents → (graph, subject, predicate, obj,
    obj_type, obj_num) triples, no class frame required — the
    ``sys:JSON`` insert path.

    Each document yields one BODY triple (predicate ``sys:value``,
    obj = canonical JSON, obj_type ``sys:JSON`` — byte-identical read
    is a projection of this row) plus one LEAF triple per JSON leaf
    (predicate = JSONPath, obj = canonical leaf rendering, obj_type
    from the leaf's variant type, numeric leaves shadowed into
    obj_num) — the leaf index is what makes schemaless documents
    WOQL-queryable like typed ones.

    ``doc_id_col`` None → content-addressed subjects
    ``<prefix>/<md5(canonical)>`` and a ``distinct()`` making insert
    idempotent; with an id column, subjects are ``<prefix>/<id>`` and
    rows pass through un-deduped (caller owns key uniqueness)."""
    from terminus_server_spark.checkpoint import spread_input

    canon = canonical_json(F.col(json_col))
    if doc_id_col is None:
        subject = F.concat(F.lit(prefix + "/"), F.md5(canon))
    else:
        subject = F.concat(
            F.lit(prefix + "/"), F.col(doc_id_col).cast("string")
        )
    # Spread BEFORE projecting: canonicalization (parse_json +
    # to_json + md5 per document) is the CPU-heavy step, and placing
    # the round-robin exchange below the projection moves that work
    # to the post-shuffle side — a single-file local input would
    # otherwise canonicalize the whole corpus in one task (at scale
    # the input arrives as many splits and the spread is a no-op).
    cols = [json_col] if doc_id_col is None else [json_col, doc_id_col]
    base = spread_input(docs.select(*cols)).select(
        subject.alias("subject"), canon.alias("canon")
    )
    body = base.select(
        F.lit(graph).alias("graph"),
        F.col("subject"),
        F.lit("sys:value").alias("predicate"),
        F.col("canon").alias("obj"),
        F.lit("sys:JSON").alias("obj_type"),
        F.lit(None).cast("double").alias("obj_num"),
    )
    leaves = json_leaves(base, "subject", "canon", max_depth=max_depth)
    leaf_triples = leaves.select(
        F.lit(graph).alias("graph"),
        F.col("id").alias("subject"),
        F.col("path").alias("predicate"),
        F.col("value").alias("obj"),
        F.col("vtype").alias("obj_type"),
        F.when(
            F.col("vtype").isin("xsd:integer", "xsd:decimal"),
            F.col("value").cast("double"),
        ).alias("obj_num"),
    )
    out = body.unionByName(leaf_triples)
    if doc_id_col is None:
        out = out.distinct()
    return out


def schemaless_read(
    triples: DataFrame, prefix: str = "JSONDocument"
) -> DataFrame:
    """(subject, json): read schemaless documents back — a filtered
    projection of the body triples (predicate pushdown reaches the
    scan; the leaf index is untouched).  Byte-identical to the
    canonical insert rendering by construction."""
    return triples.where(
        (F.col("predicate") == "sys:value")
        & F.col("subject").startswith(prefix + "/")
    ).select("subject", F.col("obj").alias("json"))


def json_field_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "json",
    max_depth: int = 8,
) -> DataFrame:
    """(id, path, op, old_value, new_value): diff two versions of
    schemaless JSON documents at the JSON-leaf grain — op ∈ {added,
    removed, changed}, values as canonical JSON renderings (so a JSON
    null leaf is the STRING 'null', distinct from an absent leaf,
    which is SQL NULL — the distinction `added` vs `changed` needs).

    Both sides flatten with ``json_leaves`` (one scan each), then one
    full-outer join keyed by (id, path).  Documents present on only
    one side diff as all-added / all-removed leaf sets."""
    lo = json_leaves(old, id_col, json_col, max_depth=max_depth).select(
        "id", "path", F.col("value").alias("old_value")
    )
    ln = json_leaves(new, id_col, json_col, max_depth=max_depth).select(
        "id", "path", F.col("value").alias("new_value")
    )
    joined = lo.join(ln, ["id", "path"], "full_outer")
    op = (
        F.when(
            F.col("old_value").isNull() & F.col("new_value").isNotNull(),
            F.lit("added"),
        )
        .when(
            F.col("old_value").isNotNull() & F.col("new_value").isNull(),
            F.lit("removed"),
        )
        .when(F.col("old_value") != F.col("new_value"), F.lit("changed"))
    )
    return (
        joined.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select("id", "path", "op", "old_value", "new_value")
    )


def json_leaf_assemble(
    leaves: DataFrame,
    id_col: str = "id",
    path_col: str = "path",
    value_col: str = "value",
    max_depth: int = 8,
) -> DataFrame:
    """(id, json): rebuild the CANONICAL JSON text from its leaf set
    — the inverse of ``json_leaves``, closing the schemaless
    diff/patch loop (``assemble(leaves(x)) == canonical_json(x)``,
    property-tested).

    Bottom-up collapse: for depth d = max_depth..1, leaves at depth d
    group by (id, parent path) into one rendered container — arrays
    join ','-wise by index, objects render '"k":v' sorted by key
    (matching the variant rendering's key-sorted canonical form) —
    and become depth d-1 leaves.  Depth is the path's segment count
    ('.' and '[' occurrences — object keys must not contain '.', '['
    or ']', the module-wide path-grammar restriction).

    PLAN SHAPE (the part that matters at scale): every round is ONE
    groupBy over ALL rows — rows at the working depth key by their
    parent path and aggregate into the container rendering,
    shallower rows key by their own path and pass through as
    singleton groups (a path can never be both a leaf and a
    container parent in one document, so the keys cannot collide).
    A filter-and-union formulation would reference the previous
    round TWICE, doubling plan branches per level into a 2^depth
    scan explosion (the plan audit catches exactly this class);
    the single-groupBy form keeps lineage LINEAR in depth."""
    segs = F.length(F.regexp_replace(F.col("path"), r"[^.\[]", ""))
    cur = leaves.select(
        F.col(id_col).alias("id"),
        F.col(path_col).alias("path"),
        F.col(value_col).alias("value"),
    )
    last_seg = r"(\.[^.\[\]]+|\[[0-9]+\])$"
    for d in range(max_depth, 0, -1):
        at_d = segs == d
        seg = F.regexp_extract(F.col("path"), last_seg, 1)
        is_idx = seg.startswith("[")
        parent = F.regexp_replace(F.col("path"), last_seg, "")
        entry = F.when(~at_d, F.col("value")).when(is_idx, F.col("value")).otherwise(
            F.concat(
                F.lit('"'), F.substring(seg, 2, 10_000), F.lit('":'), F.col("value")
            )
        )
        sort_key = F.when(~at_d, F.lit("")).when(
            is_idx,
            F.lpad(F.regexp_extract(seg, r"\[([0-9]+)\]", 1), 12, "0"),
        ).otherwise(F.substring(seg, 2, 10_000))
        cur = (
            cur.select(
                "id",
                F.when(at_d, parent).otherwise(F.col("path")).alias("path"),
                at_d.alias("_d"),
                (at_d & is_idx).alias("_i"),
                F.struct(sort_key.alias("k"), entry.alias("e")).alias("s"),
            )
            .groupBy("id", "path")
            .agg(
                F.max("_d").alias("_d"),
                F.max("_i").alias("_i"),
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda x: x["e"]
                    ),
                ).alias("_body"),
            )
            .select(
                "id",
                "path",
                F.when(~F.col("_d"), F.col("_body"))
                .when(
                    F.col("_i"), F.concat(F.lit("["), F.col("_body"), F.lit("]"))
                )
                .otherwise(
                    F.concat(F.lit("{"), F.col("_body"), F.lit("}"))
                )
                .alias("value"),
            )
        )
    return cur.select("id", F.col("value").alias("json"))


def json_field_patch(
    old: DataFrame,
    diff: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "json",
    max_depth: int = 8,
) -> DataFrame:
    """(id, json): apply a ``json_field_diff`` patch to schemaless
    JSON documents — the roundtrip law
    ``patch(old, diff(old, new)) == canonical_json(new)`` holds for
    every diff the differ emits (the registry key hash-checks exactly
    that, like the typed list-patch pair).

    Leaf-set surgery + reassembly: removed/changed paths drop out of
    the old leaf set (one anti-join keyed by id+path), added/changed
    leaves splice in from the diff, and ``json_leaf_assemble``
    rebuilds the canonical text.  All shuffles key by (id, path)."""
    lo = json_leaves(old, id_col, json_col, max_depth=max_depth)
    gone = diff.where(F.col("op").isin("removed", "changed")).select(
        F.col(id_col).alias("id") if id_col in diff.columns else F.col("id"),
        "path",
    )
    incoming = diff.where(F.col("op").isin("added", "changed")).select(
        F.col(id_col).alias("id") if id_col in diff.columns else F.col("id"),
        "path",
        F.col("new_value").alias("value"),
    )
    kept = lo.select("id", "path", "value").join(
        gone, ["id", "path"], "left_anti"
    )
    return json_leaf_assemble(
        kept.unionByName(incoming), "id", max_depth=max_depth
    )


def json_validate(
    docs: DataFrame,
    frames: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "json",
    max_depth: int = 8,
) -> DataFrame:
    """(id, path, violation): validate schemaless documents against a
    path-grain frame table (the ``json_leaves`` summary shape:
    ``(path, vtype, required)``) — how a sys:JSON corpus graduates to
    schema-checked: infer frames from a trusted sample, then gate the
    rest.  Violations:

    - ``missing_required``: a required path absent from a document
      (required paths cross-join small frame × doc ids, anti-joined
      against the observed leaves — frame tables are schema-sized, so
      the build side broadcasts);
    - ``type_mismatch``: an observed leaf whose value type differs
      from the frame's (sys:null observations are allowed under any
      frame type — JSON's null-means-absent convention);
    - ``unknown_path``: an observed leaf at a path the frame does not
      declare (closed-world check, the @schema-checked discipline).

    Clean documents yield zero rows; the gate is "no rows", like the
    typed ``schema_validate``."""
    leaves = json_leaves(docs, id_col, json_col, max_depth=max_depth)
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    req = frames.where(F.col("required")).select("path", "vtype")
    missing = (
        ids.crossJoin(F.broadcast(req.select("path")))
        .join(leaves.select("id", "path"), ["id", "path"], "left_anti")
        .select("id", "path", F.lit("missing_required").alias("violation"))
    )
    typed = leaves.join(
        F.broadcast(frames.select("path", F.col("vtype").alias("_ft"))),
        "path",
        "left_outer",
    )
    mismatch = typed.where(
        F.col("_ft").isNotNull()
        & (F.col("vtype") != F.col("_ft"))
        & (F.col("vtype") != "sys:null")
    ).select("id", "path", F.lit("type_mismatch").alias("violation"))
    unknown = typed.where(F.col("_ft").isNull()).select(
        "id", "path", F.lit("unknown_path").alias("violation")
    )
    return missing.unionByName(mismatch).unionByName(unknown)


def json_merge_three_way(
    base: DataFrame,
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    json_col: str = "json",
    max_depth: int = 8,
) -> DataFrame:
    """(id, json, n_conflicts): diff3 for schemaless documents at the
    JSON-leaf grain — the sys:JSON counterpart of the typed
    field-grain ``doc_merge_three_way``: per (id, path), a side that
    changed from base takes the leaf, both-same changes agree,
    both-different changes CONFLICT and resolve left-wins with the
    conflict counted (the branch-merge convention the versioning
    layer uses).  Additions/removals are changes to/from absence.

    Three leaf walks + one full-outer 3-way alignment keyed by
    (id, path) + the canonical reassembly — every shuffle keyed by
    (id, path) or (id, parent-path)."""
    lb = json_leaves(base, id_col, json_col, max_depth=max_depth).select(
        "id", "path", F.col("value").alias("vb")
    )
    ll = json_leaves(left, id_col, json_col, max_depth=max_depth).select(
        "id", "path", F.col("value").alias("vl")
    )
    lr = json_leaves(right, id_col, json_col, max_depth=max_depth).select(
        "id", "path", F.col("value").alias("vr")
    )
    j = lb.join(ll, ["id", "path"], "full_outer").join(
        lr, ["id", "path"], "full_outer"
    )
    l_changed = ~F.col("vl").eqNullSafe(F.col("vb"))
    r_changed = ~F.col("vr").eqNullSafe(F.col("vb"))
    conflict = l_changed & r_changed & ~F.col("vl").eqNullSafe(F.col("vr"))
    merged_v = (
        F.when(conflict, F.col("vl"))  # left-wins, counted below
        .when(l_changed, F.col("vl"))
        .when(r_changed, F.col("vr"))
        .otherwise(F.col("vb"))
    )
    aligned = j.select(
        "id",
        "path",
        merged_v.alias("value"),
        conflict.cast("int").alias("_c"),
    )
    conflicts = aligned.groupBy("id").agg(
        F.sum("_c").cast("bigint").alias("n_conflicts")
    )
    kept = aligned.where(F.col("value").isNotNull()).select(
        "id", "path", "value"
    )
    return json_leaf_assemble(kept, "id", max_depth=max_depth).join(
        conflicts, "id"
    )
