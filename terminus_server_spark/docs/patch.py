"""Recursive JSON document diff / patch (SURVEY §2.3 rows 29/30, deep).

Parity: terminus-server's patch engine (public locus:
src/core/document/patch.pl) diffs arbitrarily *nested* documents —
subdocument fields yield diffs at a path (SwapValue), list fields
yield list patches (swap / append / truncate).  The round-1 verdict
named the flat-field-only diff the biggest real-user gap; this module
is the deep version.

Spark-first design: the document schema is known at plan time, so the
recursive walk over subdocuments and lists unrolls into pure built-in
column expressions — higher-order functions (`transform`, `filter`,
`flatten`) over arrays and struct rebuilds.  No UDF, no driver
round-trip; diff is a single full-outer join on the document key,
patch is one aggregate over the diff plus one join.  Both scale as
ordinary shuffles keyed by document id.

Path grammar (JSON-pointer-ish, 0-based list indices)::

    customer.name        subdocument field
    items[3].quantity    field of the 4th list element
    tags[0]              atom list element
    items#len            list-resize sentinel (op='resized')

List diffs are index-aligned: element i compares to element i; a
longer new list yields ``added`` entries at the tail, a shorter one
``removed`` — the swap/append/truncate core of the reference's list
patch.  A ``#len`` sentinel records every size change so patch can
rebuild lists at the correct length without inferring it from leaf
paths (which would conflate field-nulling with element removal).

Supported document shape: subdocuments (structs) at any depth, lists
of atoms, lists of subdocuments.  Lists directly inside lists are
unsupported (the reference's schema language likewise interposes a
subdocument class between nested collections).

**Sets.** The reference distinguishes ordered ``List`` fields from
unordered ``Set`` fields; pass their paths in ``set_paths`` and those
array columns diff *by value* instead of by index — entries carry the
member in the path (``tags{hot}``), op is added/removed only, and no
``#len`` sentinel is emitted.  Patch rebuilds the set as
``sort(union(except(old, removed), added))`` — canonical sorted
order, which ``flatten_documents`` mirrors so renderings compare
across engines.  Set elements must be atoms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

def _nsize(c: Column) -> Column:
    """NULL-propagating list size (Spark's legacy ``size(NULL)`` is -1;
    DuckDB's ``len(NULL)`` is NULL — diffs compare against the latter)."""
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(F.size(c))


def _guarded_range(n: Column) -> Column:
    """[0, n) as an array column; empty when n <= 0 (a bare
    ``sequence(0, -1)`` would count downward)."""
    return F.when(n > 0, F.sequence(F.lit(0), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )


def _diff_leaf(path: Column, ov: Column, nv: Column) -> Column:
    ovs, nvs = ov.cast("string"), nv.cast("string")
    op = (
        F.when(ovs.isNull() & nvs.isNotNull(), F.lit("added"))
        .when(ovs.isNotNull() & nvs.isNull(), F.lit("removed"))
        .when(ovs != nvs, F.lit("changed"))
    )
    return F.struct(
        path.alias("path"),
        op.alias("op"),
        ovs.alias("old_value"),
        nvs.alias("new_value"),
    )


def _empty(dtype: DataType) -> Column:
    return F.array().cast(f"array<{dtype.elementType.simpleString()}>")


def _set_diff(ov: Column, nv: Column, dtype: ArrayType, spath: str) -> Column:
    """Value-based diff of an unordered set field: one entry per
    member added/removed, member embedded in the path (``tags{hot}``)
    so every entry keys uniquely in the patch's upsert map."""
    if isinstance(dtype.elementType, (ArrayType, StructType)):
        raise TypeError(f"set field {spath}: set elements must be atoms")
    o = F.array_except(F.coalesce(ov, _empty(dtype)), F.coalesce(nv, _empty(dtype)))
    n = F.array_except(F.coalesce(nv, _empty(dtype)), F.coalesce(ov, _empty(dtype)))

    def entries(vals: Column, op: str) -> Column:
        def make(x: Column) -> Column:
            xs = x.cast("string")
            return F.struct(
                F.concat(F.lit(spath + "{"), xs, F.lit("}")).alias("path"),
                F.lit(op).alias("op"),
                (xs if op == "removed" else F.lit(None).cast("string")).alias("old_value"),
                (xs if op == "added" else F.lit(None).cast("string")).alias("new_value"),
            )

        return F.transform(vals, make)

    return F.concat(entries(o, "removed"), entries(n, "added"))


def _diff_walk(
    ov: Column,
    nv: Column,
    dtype: DataType,
    path: Column,
    spath: str | None = None,
    set_paths: tuple = (),
) -> Column:
    """array<struct<path,op,old_value,new_value>> for the subtree at
    ``path`` — entries for unchanged leaves carry op=NULL and are
    filtered once at the top.  ``spath`` is the static (plan-time)
    path, None below a list element; set fields only occur at static
    paths because lists don't nest."""
    if isinstance(dtype, StructType):
        parts = [
            _diff_walk(
                ov[f.name],
                nv[f.name],
                f.dataType,
                F.concat(path, F.lit("." + f.name)),
                spath=f"{spath}.{f.name}" if spath is not None else None,
                set_paths=set_paths,
            )
            for f in dtype.fields
        ]
        return F.concat(*parts)
    if isinstance(dtype, ArrayType):
        et = dtype.elementType
        if isinstance(et, ArrayType):
            raise TypeError("lists directly inside lists are not supported")
        if spath is not None and spath in set_paths:
            return _set_diff(ov, nv, dtype, spath)
        # null-propagating sizes: IS DISTINCT FROM catches 3→NULL and
        # NULL→3 as well as 3→5
        o_n = _nsize(ov)
        n_n = _nsize(nv)
        sentinel = F.when(
            ~o_n.eqNullSafe(n_n),
            F.struct(
                F.concat(path, F.lit("#len")).alias("path"),
                F.lit("resized").alias("op"),
                o_n.cast("string").alias("old_value"),
                n_n.cast("string").alias("new_value"),
            ),
        )
        span = _guarded_range(
            F.greatest(F.coalesce(o_n, F.lit(0)), F.coalesce(n_n, F.lit(0)))
        )

        def per_index(i: Column) -> Column:
            p = F.concat(path, F.lit("["), i.cast("string"), F.lit("]"))
            oe = F.try_element_at(ov, i + F.lit(1))
            ne = F.try_element_at(nv, i + F.lit(1))
            if isinstance(et, StructType):
                return _diff_walk(oe, ne, et, p, spath=None, set_paths=set_paths)
            return F.array(_diff_leaf(p, oe, ne))

        return F.concat(
            F.array(sentinel), F.flatten(F.transform(span, per_index))
        )
    return F.array(_diff_leaf(path, ov, nv))


def doc_diff_nested(
    old: DataFrame, new: DataFrame, key: str, set_paths: tuple = ()
) -> DataFrame:
    """(key, path, op, old_value, new_value): recursive diff between
    two document versions sharing a schema.

    op ∈ {added, removed, changed, resized}; values are the string
    renderings of the leaves (resized rows carry the list lengths).
    Documents present on only one side diff as all-added /
    all-removed leaf sets — the whole-document insert/delete case.
    ``set_paths``: array fields with unordered Set semantics (diffed
    by value — see module docstring).  One full-outer join on the
    key; the walk is pure projection."""
    fields = [f for f in old.schema.fields if f.name != key]
    joined = old.alias("o").join(new.alias("n"), on=key, how="full_outer")
    parts = [
        _diff_walk(
            F.col("o." + f.name),
            F.col("n." + f.name),
            f.dataType,
            F.lit(f.name),
            spath=f.name,
            set_paths=tuple(set_paths),
        )
        for f in fields
    ]
    entries = F.filter(F.concat(*parts), lambda e: e["op"].isNotNull())
    return joined.select(F.col(key), F.explode(entries).alias("d")).select(
        key, "d.path", "d.op", "d.old_value", "d.new_value"
    )


def _leaf_rows(col: Column, dtype: DataType, path: Column) -> Column:
    """array<struct<path,value>> of the non-null leaves under ``col``
    (NULL leaves are skipped by the caller's filter)."""
    if isinstance(dtype, StructType):
        return F.concat(
            *[
                _leaf_rows(col[f.name], f.dataType, F.concat(path, F.lit("." + f.name)))
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, ArrayType):
        et = dtype.elementType
        if isinstance(et, ArrayType):
            raise TypeError("lists directly inside lists are not supported")
        span = _guarded_range(F.coalesce(_nsize(col), F.lit(0)))

        def per_index(i: Column) -> Column:
            p = F.concat(path, F.lit("["), i.cast("string"), F.lit("]"))
            e = F.try_element_at(col, i + F.lit(1))
            if isinstance(et, StructType):
                return _leaf_rows(e, et, p)
            return F.array(
                F.struct(p.alias("path"), e.cast("string").alias("value"))
            )

        return F.flatten(F.transform(span, per_index))
    return F.array(
        F.struct(path.alias("path"), col.cast("string").alias("value"))
    )


def flatten_documents(docs: DataFrame, key: str, set_paths: tuple = ()) -> DataFrame:
    """(key, path, value): every non-null leaf of every document —
    the canonical flat rendering used to value-compare nested shapes
    across engines (and a useful export/indexing primitive: path-value
    rows feed inverted indexes and diff displays).  Top-level fields
    named in ``set_paths`` render in sorted order (sets have no
    positional identity)."""
    fields = [f for f in docs.schema.fields if f.name != key]
    parts = [
        _leaf_rows(
            F.array_sort(F.col(f.name)) if f.name in set_paths else F.col(f.name),
            f.dataType,
            F.lit(f.name),
        )
        for f in fields
    ]
    rows = F.filter(F.concat(*parts), lambda r: r["value"].isNotNull())
    return docs.select(F.col(key), F.explode(rows).alias("l")).select(
        key, "l.path", "l.value"
    )


def doc_patch_nested(
    old: DataFrame, diff: DataFrame, key: str, set_paths: tuple = ()
) -> DataFrame:
    """Apply a ``doc_diff_nested`` diff to ``old``, reconstructing the
    new version: ``patch(old, diff(old, new)) == new`` for every
    document present in ``old`` (documents added only in ``new``
    cannot be patched into existence — same contract as the
    reference's patch, which addresses documents by id).

    Dataflow: the diff aggregates to one row per document (a
    path→new_value map for added/changed/resized plus a removed-path
    list), joins back to ``old``, and a schema-driven rebuild emits
    the patched columns.  Removed leaves become NULL; lists are
    rebuilt at the ``#len`` sentinel length, so truncation and append
    both land exactly."""
    fields = [f for f in old.schema.fields if f.name != key]
    up = F.col("__upserts")
    rm = F.col("__removed")
    agg = diff.groupBy(key).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("op") != "removed",
                    F.struct(F.col("path"), F.col("new_value")),
                )
            )
        ).alias("__upserts"),
        F.collect_list(
            F.when(F.col("op") == "removed", F.col("path"))
        ).alias("__removed"),
    )
    joined = old.join(agg, on=key, how="left_outer")

    def patch_leaf(oc: Column, dtype: DataType, path: Column) -> Column:
        return (
            F.when(F.array_contains(rm, path), F.lit(None).cast(dtype))
            .when(
                F.try_element_at(up, path).isNotNull(),
                F.try_element_at(up, path).cast(dtype),
            )
            .otherwise(oc)
        )

    def patch_dyn(oc: Column, dtype: DataType, path: Column) -> Column:
        """Rebuild below a list element — the path is a runtime column
        (it embeds the index); only structs and atoms can appear."""
        if isinstance(dtype, StructType):
            return F.struct(
                *[
                    patch_dyn(
                        oc[f.name], f.dataType, F.concat(path, F.lit("." + f.name))
                    ).alias(f.name)
                    for f in dtype.fields
                ]
            )
        return patch_leaf(oc, dtype, path)

    def patch_walk(oc: Column, dtype: DataType, path: str) -> Column:
        if isinstance(dtype, StructType):
            return F.struct(
                *[
                    patch_walk(oc[f.name], f.dataType, f"{path}.{f.name}").alias(f.name)
                    for f in dtype.fields
                ]
            )
        if isinstance(dtype, ArrayType):
            et = dtype.elementType
            if isinstance(et, ArrayType):
                raise TypeError("lists directly inside lists are not supported")
            if path in set_paths:
                # unordered set: rebuild by value —
                # sort(union(except(old, removed), added)); member
                # values come from the {member}-suffixed entry paths
                ets = et.simpleString()
                empty = F.array().cast(f"array<{ets}>")
                base = F.coalesce(oc, empty)
                pref = path + "{"
                L = len(pref)
                added = F.coalesce(
                    F.transform(
                        F.filter(F.map_keys(up), lambda s: s.startswith(pref)),
                        lambda s: F.try_element_at(up, s).cast(ets),
                    ),
                    empty,
                )
                removed_vals = F.coalesce(
                    F.transform(
                        F.filter(rm, lambda s: s.startswith(pref)),
                        lambda s: s.substr(
                            F.lit(L + 1), F.length(s) - F.lit(L + 1)
                        ).cast(ets),
                    ),
                    empty,
                )
                return F.array_sort(
                    F.array_union(F.array_except(base, removed_vals), added)
                )
            # list length: the #len sentinel wins; otherwise unchanged.
            # (Leaf paths can't size the list — a removed leaf may be a
            # field nulled in place, not an element dropped.)  Presence is
            # gated on the map KEY, not a non-NULL value: a diff that sets
            # the whole list to NULL ships a #len sentinel whose value is
            # NULL, which must rebuild a NULL list — coalesce would fall
            # back to the old length and fabricate an all-NULL list.
            new_n = F.when(
                F.map_contains_key(up, F.lit(path + "#len")),
                F.try_element_at(up, F.lit(path + "#len")).cast("int"),
            ).otherwise(_nsize(oc))

            def per_index(i: Column) -> Column:
                p = F.concat(F.lit(path + "["), i.cast("string"), F.lit("]"))
                return patch_dyn(F.try_element_at(oc, i + F.lit(1)), et, p)

            return F.when(new_n.isNull(), F.lit(None).cast(dtype)).otherwise(
                F.transform(_guarded_range(new_n), per_index)
            )
        return patch_leaf(oc, dtype, F.lit(path))

    out = [F.col(key)] + [
        patch_walk(F.col(f.name), f.dataType, f.name).alias(f.name) for f in fields
    ]
    return joined.select(*out)


def list_patch_ops(
    df: DataFrame,
    old_col: str,
    new_col: str,
    key_col: str = "key",
) -> DataFrame:
    """(key, n_old, n_new, copy_prefix, copy_suffix, swap_old,
    swap_new, op): the reference's LIST patch-operation decomposition
    of two versions of an ordered list field (public locus: the
    TerminusDB JSON diff/patch spec's CopyList / SwapList / KeepList
    operations — a list diff is rendered ``CopyList n`` over the
    common prefix, ``SwapList old mid / new mid`` over the differing
    middle, ``CopyList m`` over the common suffix, degenerating to
    ``KeepList`` when the lists are equal).

    The decomposition is computed entirely with built-in array
    lambdas (whole-stage codegen, no shuffle, no Python):
    prefix = index of the first positional mismatch over the zipped
    min-length range; suffix = same over the reversed remainders
    (capped so prefix + suffix <= min length, which makes the
    decomposition unique and the swap spans well-defined for
    insertions/deletions).  Swap spans render '|'-joined so the
    DuckDB oracle hash-matches the exact op payloads.

    Mismatch scans use NULL-SAFE inequality (the oracle's
    ``IS DISTINCT FROM``): a plain ``!=`` yields NULL against a NULL
    element and ``F.filter`` drops NULL predicates, so old=[null],
    new=['x'] would silently render KeepList and break the
    apply∘diff roundtrip law."""
    a, b = F.col(old_col), F.col(new_col)
    la, lb = F.size(a), F.size(b)
    mn = F.least(la, lb)
    empty_i = F.array().cast("array<int>")
    idx = F.when(mn >= 1, F.sequence(F.lit(1), mn)).otherwise(empty_i)
    mism = F.filter(
        idx, lambda i: ~F.element_at(a, i).eqNullSafe(F.element_at(b, i))
    )
    p = F.when(F.size(mism) > 0, F.element_at(mism, 1) - 1).otherwise(mn)
    rem = mn - p
    idx2 = F.when(rem >= 1, F.sequence(F.lit(1), rem)).otherwise(empty_i)
    mism2 = F.filter(
        idx2,
        lambda j: ~F.element_at(a, la - j + 1).eqNullSafe(
            F.element_at(b, lb - j + 1)
        ),
    )
    s = F.when(F.size(mism2) > 0, F.element_at(mism2, 1) - 1).otherwise(rem)
    swap_old = F.slice(a, p + 1, la - p - s)
    swap_new = F.slice(b, p + 1, lb - p - s)
    keep = (la == lb) & (p == la)
    return df.select(
        F.col(key_col),
        la.cast("bigint").alias("n_old"),
        lb.cast("bigint").alias("n_new"),
        p.cast("bigint").alias("copy_prefix"),
        s.cast("bigint").alias("copy_suffix"),
        F.array_join(swap_old, "|").alias("swap_old"),
        F.array_join(swap_new, "|").alias("swap_new"),
        F.when(keep, F.lit("KeepList")).otherwise(F.lit("SwapList")).alias("op"),
    )


def list_patch_apply(
    df: DataFrame,
    old_col: str,
    key_col: str = "key",
    prefix_col: str = "copy_prefix",
    suffix_col: str = "copy_suffix",
    swap_new_col: str = "swap_new",
    sep: str = "|",
    n_new_col: str | None = None,
) -> DataFrame:
    """(key, patched): apply a CopyList/SwapList/KeepList patch (the
    ``list_patch_ops`` rendering) to the old list — the reference's
    list-patch application: keep the first ``copy_prefix`` elements,
    splice in the swap payload, keep the last ``copy_suffix``
    elements.  ``apply(old, diff(old, new)) == new`` for every
    decomposition ``list_patch_ops`` emits (the registry key
    hash-checks exactly that roundtrip).  Pure array expressions —
    same no-shuffle profile as the diff side.

    The '|'-joined string rendering of the swap payload cannot by
    itself distinguish an EMPTY swap from a single empty-string
    element (both join to "").  Pass ``n_new_col`` (the diff's
    ``n_new`` column) and the swap element count is derived exactly
    as ``n_new - copy_prefix - copy_suffix``, which restores the
    roundtrip for empty-string elements; without it the string path
    falls back to a length>0 guard and is LOSSY for lists containing
    "" (and, always, for elements containing the separator — use the
    array-typed swap column for full losslessness)."""
    a = F.col(old_col)
    la = F.size(a)
    p, s = F.col(prefix_col).cast("int"), F.col(suffix_col).cast("int")
    # accept the swap payload either as an array column (lossless —
    # preferred when elements may contain the separator) or as the
    # list_patch_ops '|'-joined rendering
    if dict(df.dtypes).get(swap_new_col, "string").startswith("array"):
        swap = F.col(swap_new_col)
    else:
        import re

        split_swap = F.split(F.col(swap_new_col), re.escape(sep))
        if n_new_col is not None:
            n_swap = F.col(n_new_col).cast("int") - p - s
            swap = F.when(n_swap > 0, split_swap).otherwise(
                F.array().cast("array<string>")
            )
        else:
            swap = F.when(
                F.length(F.col(swap_new_col)) > 0, split_swap
            ).otherwise(F.array().cast("array<string>"))
    patched = F.concat(
        F.slice(a, 1, p), swap, F.slice(a, la - s + 1, s)
    )
    return df.select(F.col(key_col), patched.alias("patched"))
