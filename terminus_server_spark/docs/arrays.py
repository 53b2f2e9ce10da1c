"""Array document fields with ``@dimensions`` (SURVEY §2.3, r10).

Parity: TerminusDB's fourth collection field type.  The public Schema
Reference defines List, Set, Optional and **Array**, where Array
takes ``@dimensions`` (1 or 2 here) and — unlike List's linked
rdf:first/rdf:rest chain — stores elements through intermediate
``sys:Array`` cell nodes carrying ``sys:value`` plus ``sys:index``
(and ``sys:index2`` for the second dimension), preserving element
POSITIONS including holes: a null element stores no cell, but the
surviving cells keep their indices, so sparse arrays roundtrip
position-faithfully (terminus-server src/core/document/json.pl array
handling; terminusdb-store array index triples).

Spark translation (no reference code consulted — the storage contract
above is the public wire/storage shape):

- insert (``array_to_triples``): one ``posexplode`` per dimension —
  map-side, zero shuffles — emitting four narrow triple frames
  (link, value, index, index2) in the store's standard
  ``(graph, subject, predicate, obj, obj_type, obj_num)`` schema;
  the numeric shadow ``obj_num`` carries indices and numeric values
  so downstream comparisons stay in whole-stage codegen.
- read (``triples_to_array``): cell-grain joins (cell ids are unique,
  so these are co-partitioned hash joins on the cell key) + ONE
  groupBy per nesting dimension per document; dense arrays rebuilt
  with ``map_from_entries`` + ``sequence(0, max_index)`` lookups, so
  holes surface as JSON nulls in exactly the inserted positions.
  A 2-D row whose elements are ALL null leaves no cells and
  reassembles as a null row, and TRAILING nulls trim (array length is
  max stored index + 1 — sparse cell storage records no length
  marker, so [5, null] reads back [5]; TerminusDB's sparse storage
  has the same absent-vs-null ambiguity).  An entirely-empty array
  stores nothing and the document is absent from the reassembled
  frame for that property.
- diff (``array_diff``): index-aligned full-outer join at the
  ``(key, index[, index2])`` grain with SwapValue / Add / Remove ops
  — list-diff semantics pinned to positions, never sequence
  alignment, which is the Array-vs-List distinction.

Scale shape: insert is embarrassingly parallel; read shuffles once
per dimension keyed by (doc, index-prefix) — the same grain the data
already has; diff shuffles both sides once on the join key.  Nothing
collects, nothing is quadratic in array length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from terminus_server_spark.model.triples import _xsd_type

SYS_ARRAY = "sys:Array"
SYS_VALUE = "sys:value"
SYS_INDEX = "sys:index"
SYS_INDEX2 = "sys:index2"
_IDX_TYPE = "xsd:nonNegativeInteger"


def _idx_pred(d: int) -> str:
    """Index predicate for dimension d (0-based): sys:index,
    sys:index2, sys:index3, ... — the store's naming convention."""
    return SYS_INDEX if d == 0 else f"{SYS_INDEX}{d + 1}"


def _element_dtype(docs: DataFrame, prop: str, dims: int) -> str:
    dt = dict(docs.dtypes)[prop]
    for _ in range(dims):
        if not (dt.startswith("array<") and dt.endswith(">")):
            raise ValueError(
                f"arrays: column {prop} is {dict(docs.dtypes)[prop]}, "
                f"expected {dims}-deep array<...> for @dimensions={dims}"
            )
        dt = dt[len("array<") : -1]
    return dt


def array_to_triples(
    docs: DataFrame,
    class_name: str,
    key_col: str,
    prop: str,
    dims: int = 1,
    graph: str = "instance",
) -> DataFrame:
    """Array field → sys:Array cell triples (document insert path).

    One row per non-null element: a link triple (subject --prop-->
    cell, obj_type sys:Array), a sys:value literal triple on the
    cell, and one index triple per dimension (predicates sys:index,
    sys:index2, sys:index3, ... — the terminusdb-store convention,
    any number of dimensions).  Null elements are holes: no cell,
    indices elsewhere unchanged."""
    if dims < 1:
        raise ValueError("arrays: @dimensions must be >= 1")
    elem_t = _element_dtype(docs, prop, dims)
    xsd_t = _xsd_type(elem_t)
    is_num = elem_t.split("(")[0] in (
        "int", "bigint", "smallint", "tinyint", "double", "float", "decimal"
    )
    subject = F.concat(F.lit(class_name + "/"), F.col(key_col).cast("string"))
    # one posexplode stage per dimension, all map-side
    ex = docs.select(
        subject.alias("s"), F.posexplode(F.col(prop)).alias("i0", "v")
    )
    for d in range(1, dims):
        ex = ex.select(
            "s",
            *[f"i{j}" for j in range(d)],
            F.posexplode(F.col("v")).alias(f"i{d}", "v"),
        )
    ex = ex.where(F.col("v").isNotNull())
    cell_parts = [F.col("s"), F.lit(f"/{prop}/")]
    for d in range(dims):
        if d:
            cell_parts.append(F.lit("/"))
        cell_parts.append(F.col(f"i{d}").cast("string"))
    ex = ex.select(
        "s", F.concat(*cell_parts).alias("c"),
        *[f"i{d}" for d in range(dims)], "v",
    )
    idx_frames = [
        ex.select(
            F.lit(graph).alias("graph"),
            F.col("c").alias("subject"),
            F.lit(_idx_pred(d)).alias("predicate"),
            F.col(f"i{d}").cast("string").alias("obj"),
            F.lit(_IDX_TYPE).alias("obj_type"),
            F.col(f"i{d}").cast(DoubleType()).alias("obj_num"),
        )
        for d in range(dims)
    ]
    link = ex.select(
        F.lit(graph).alias("graph"),
        F.col("s").alias("subject"),
        F.lit(prop).alias("predicate"),
        F.col("c").alias("obj"),
        F.lit(SYS_ARRAY).alias("obj_type"),
        F.lit(None).cast(DoubleType()).alias("obj_num"),
    )
    val = ex.select(
        F.lit(graph).alias("graph"),
        F.col("c").alias("subject"),
        F.lit(SYS_VALUE).alias("predicate"),
        F.col("v").cast("string").alias("obj"),
        F.lit(xsd_t).alias("obj_type"),
        (
            F.col("v").cast(DoubleType())
            if is_num
            else F.lit(None).cast(DoubleType())
        ).alias("obj_num"),
    )
    out = link.unionByName(val)
    for f in idx_frames:
        out = out.unionByName(f)
    return out


def triples_to_array(
    triples: DataFrame,
    prop: str,
    dims: int = 1,
    element_cast: str = "string",
) -> DataFrame:
    """(subject, <prop>): dense arrays reassembled from sys:Array
    cell triples — the inverse of ``array_to_triples``.  Holes (index
    positions with no cell) come back as nulls; array length is
    max(index)+1 per document (per row for dimension 2)."""
    if dims < 1:
        raise ValueError("arrays: @dimensions must be >= 1")
    link = triples.where(
        (F.col("predicate") == prop) & (F.col("obj_type") == SYS_ARRAY)
    ).select(F.col("subject"), F.col("obj").alias("c"))
    vals = triples.where(F.col("predicate") == SYS_VALUE).select(
        F.col("subject").alias("c"),
        F.col("obj").cast(element_cast).alias("v"),
    )
    cells = link.join(vals, "c")
    for d in range(dims):
        idx = triples.where(F.col("predicate") == _idx_pred(d)).select(
            F.col("subject").alias("c"),
            F.col("obj_num").cast("long").alias(f"i{d}"),
        )
        cells = cells.join(idx, "c")

    def dense(grp, idx_col):
        m = F.map_from_entries(
            F.collect_list(F.struct(F.col(idx_col), F.col("v")))
        )
        mx = F.max(idx_col)
        return (
            grp.agg(m.alias("_m"), mx.alias("_mx"))
            .withColumn(
                "v",
                F.transform(
                    F.sequence(F.lit(0), F.col("_mx")),
                    lambda i: F.element_at(F.col("_m"), i),
                ),
            )
            .drop("_m", "_mx")
        )

    out = cells
    # collapse innermost dimension first; each pass is ONE groupBy at
    # the (subject, index-prefix) grain the data already carries
    for d in range(dims - 1, -1, -1):
        out = dense(
            out.groupBy("subject", *[f"i{j}" for j in range(d)]), f"i{d}"
        )
    return out.select("subject", F.col("v").alias(prop))


def array_patch(
    old_docs: DataFrame,
    diff: DataFrame,
    key_col: str,
    prop: str,
) -> DataFrame:
    """Apply an index-aligned Array diff (``array_diff`` output, 1-D)
    back onto the old documents: SwapValue/Add write ``new_value`` at
    the position, Remove punches a hole, untouched positions carry
    over — closing the roundtrip law
    ``array_patch(old, array_diff(old, new)) == new`` (up to the
    documented trailing-null trim, which dense reassembly shares with
    the triple store itself).  A document whose patched array has NO
    surviving values (every position removed, or all nulls — the
    all-null case trims to empty under the same convention) is KEPT
    with an empty array rather than silently dropped, so callers see
    every input key; note an index-aligned diff renders "document
    deleted" and "array emptied" identically (all Removes), so patch
    output cannot distinguish them — route document deletion through
    the document write path, not the array patch.  One explode + one
    (key, index) full-outer join + one groupBy + one key-universe
    left join — the same grains the diff used."""
    o = old_docs.select(
        F.col(key_col).alias("k"), F.posexplode(F.col(prop)).alias("i0", "v")
    ).where(F.col("v").isNotNull())
    d = diff.select(
        F.col(key_col).alias("k"), "i0", "op", "new_value"
    )
    merged = (
        o.join(d, ["k", "i0"], "full_outer")
        .select(
            "k",
            "i0",
            F.when(F.col("op").isNull(), F.col("v"))
            .when(F.col("op") == "Remove", F.lit(None))
            .otherwise(F.col("new_value"))
            .alias("v"),
        )
        .where(F.col("v").isNotNull())
    )
    assembled = (
        merged.groupBy("k")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("i0", "v"))
            ).alias("_m"),
            F.max("i0").alias("_mx"),
        )
        .select(
            "k",
            F.transform(
                F.sequence(F.lit(0), F.col("_mx")),
                lambda i: F.element_at(F.col("_m"), i),
            ).alias(prop),
        )
    )
    # key universe (old ∪ diff): a doc whose patched array emptied out
    # still emits its key, with an empty array of the input's element
    # type — never a silent drop
    arr_type = old_docs.schema[prop].dataType
    keys = (
        old_docs.select(F.col(key_col).alias("k"))
        .unionByName(diff.select(F.col(key_col).alias("k")))
        .distinct()
    )
    return keys.join(assembled, "k", "left_outer").select(
        F.col("k").alias(key_col),
        F.coalesce(
            F.col(prop), F.array().cast(arr_type)
        ).alias(prop),
    )


def array_diff(
    old_docs: DataFrame,
    new_docs: DataFrame,
    key_col: str,
    prop: str,
    dims: int = 1,
) -> DataFrame:
    """Index-aligned Array diff at the (key, index[, index2]) grain:
    one row per changed POSITION with op SwapValue (both sides,
    different values), Add (position only in new) or Remove (only in
    old).  Positions equal on both sides emit nothing.  This is the
    Array counterpart of the List diff's sequence ops — Arrays pin
    values to indices, so the diff never realigns."""
    if dims < 1:
        raise ValueError("arrays: @dimensions must be >= 1")
    idx_cols = [f"i{d}" for d in range(dims)]

    def explode(df, side):
        ex = df.select(
            F.col(key_col).alias("k"),
            F.posexplode(F.col(prop)).alias("i0", side),
        )
        for d in range(1, dims):
            ex = ex.select(
                "k",
                *[f"i{j}" for j in range(d)],
                F.posexplode(F.col(side)).alias(f"i{d}", side),
            )
        return ex.where(F.col(side).isNotNull())

    o = explode(old_docs, "old_value")
    n = explode(new_docs, "new_value")
    both = o.join(n, ["k"] + idx_cols, "full_outer")
    return (
        both.withColumn(
            "op",
            F.when(
                F.col("old_value").isNull(), F.lit("Add")
            ).when(
                F.col("new_value").isNull(), F.lit("Remove")
            ).otherwise(F.lit("SwapValue")),
        )
        .where(
            F.col("old_value").isNull()
            | F.col("new_value").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            F.col("k").alias(key_col), *idx_cols, "op",
            "old_value", "new_value",
        )
    )


def validate_array_cells(
    triples: DataFrame,
    prop: str,
    dims: int = 1,
    element_xsd: str | None = None,
) -> DataFrame:
    """(check, n): schema validation for a declared Array property —
    the checks @dimensions implies beyond ordinary property checks:

    - ``duplicate_index``: two cells of one document's array claim
      the same position (positions are identity under Array
      semantics);
    - ``negative_index``: an index triple with a value below zero;
    - ``missing_index``: a linked cell lacking one of its declared
      dimensions' index triples;
    - ``missing_value``: a linked cell with no sys:value;
    - ``type_mismatch``: a cell value typed differently from the
      declared element class (checked only when ``element_xsd`` is
      given).

    A clean store returns all zeros.  Plan: one pass over the link
    triples + cell-grain left joins — the same co-partitioned cell
    keys the reassembler uses; counts aggregate map-side."""
    link = triples.where(
        (F.col("predicate") == prop) & (F.col("obj_type") == SYS_ARRAY)
    ).select(F.col("subject").alias("s"), F.col("obj").alias("c"))
    vals = triples.where(F.col("predicate") == SYS_VALUE).select(
        F.col("subject").alias("c"),
        F.col("obj_type").alias("vt"),
    )
    cells = link.join(vals, "c", "left_outer")
    idx_all = None
    for d in range(dims):
        idx = triples.where(F.col("predicate") == _idx_pred(d)).select(
            F.col("subject").alias("c"),
            F.col("obj_num").alias(f"i{d}"),
        )
        cells = cells.join(idx, "c", "left_outer")
        neg = triples.where(
            (F.col("predicate") == _idx_pred(d)) & (F.col("obj_num") < 0)
        ).select(F.col("subject").alias("c"))
        idx_all = neg if idx_all is None else idx_all.unionByName(neg)
    idx_cols = [f"i{d}" for d in range(dims)]
    has_all_idx = cells.na.drop(subset=idx_cols)
    dup = (
        has_all_idx.groupBy("s", *idx_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
    )
    checks = [
        ("duplicate_index", dup.select(F.count(F.lit(1)).alias("n"))),
        (
            "negative_index",
            idx_all.join(link.select("c"), "c", "left_semi").select(
                F.count(F.lit(1)).alias("n")
            ),
        ),
        (
            "missing_index",
            cells.where(
                " OR ".join(f"i{d} IS NULL" for d in range(dims))
            ).select(F.count(F.lit(1)).alias("n")),
        ),
        (
            "missing_value",
            cells.where(F.col("vt").isNull()).select(
                F.count(F.lit(1)).alias("n")
            ),
        ),
    ]
    if element_xsd is not None:
        checks.append(
            (
                "type_mismatch",
                cells.where(
                    F.col("vt").isNotNull() & (F.col("vt") != element_xsd)
                ).select(F.count(F.lit(1)).alias("n")),
            )
        )
    out = None
    for name, df in checks:
        row = df.select(F.lit(name).alias("check"), F.col("n"))
        out = row if out is None else out.unionByName(row)
    return out
