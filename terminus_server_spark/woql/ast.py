"""WOQL abstract syntax.

Parity target: the WOQL word set compiled by terminus-server
``src/core/query/woql_compile.pl`` (public repo) — triple patterns
with unification, And/Or/Not/Opt, Select/Distinct/Limit/Start/
OrderBy/GroupBy, arithmetic Eval, string words, Typecast, IDGen,
Isa, Member, and regex Path.

The Prolog reference resolves these words by backtracking over a
layer; here every word is a node that compiles to a DataFrame
transformation (see ``compiler.py``), so conjunctions become joins
Catalyst can reorder and filters it can push down.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class Var:
    name: str

    def __repr__(self) -> str:  # readable plans
        return f"?{self.name}"


def v(name: str) -> Var:
    return Var(name)


class Term:
    """Base class for WOQL query terms."""


@dataclass(frozen=True)
class Triple(Term):
    s: Any
    p: Any
    o: Any
    graph: str | None = None  # None → enclosing Using graph, else "instance"
    # typed-literal projections (extension columns of the triple frame):
    # a Var binds the column, a constant filters it at the scan.
    lang: Any = None  # obj_lang — language tag of rdf:langString literals
    ts: Any = None  # obj_ts — TIMESTAMP_NTZ shadow of xsd:dateTime/xsd:date
    num: Any = None  # obj_num — DOUBLE shadow of numeric literals


@dataclass(frozen=True)
class Quad(Term):
    s: Any
    p: Any
    o: Any
    g: str


@dataclass(frozen=True)
class AddedTriple(Term):
    """Match triples added by a commit (delta query)."""

    s: Any
    p: Any
    o: Any
    commit: str


@dataclass(frozen=True)
class RemovedTriple(Term):
    s: Any
    p: Any
    o: Any
    commit: str


@dataclass(frozen=True)
class And(Term):
    terms: tuple

    def __init__(self, *terms: Term):
        object.__setattr__(self, "terms", tuple(terms))


@dataclass(frozen=True)
class Or_(Term):
    terms: tuple

    def __init__(self, *terms: Term):
        object.__setattr__(self, "terms", tuple(terms))


@dataclass(frozen=True)
class Not(Term):
    term: Term


@dataclass(frozen=True)
class Opt(Term):
    term: Term


@dataclass(frozen=True)
class Select(Term):
    vars: Sequence[Var]
    term: Term


@dataclass(frozen=True)
class Distinct(Term):
    vars: Sequence[Var]
    term: Term


@dataclass(frozen=True)
class Limit(Term):
    n: int
    term: Term


@dataclass(frozen=True)
class Start(Term):
    n: int
    term: Term


@dataclass(frozen=True)
class OrderBy(Term):
    keys: Sequence[tuple]  # (Var, "asc"|"desc")
    term: Term


# -- filters / unification ------------------------------------------------


@dataclass(frozen=True)
class Eq(Term):
    a: Any
    b: Any


@dataclass(frozen=True)
class Less(Term):
    a: Any
    b: Any


@dataclass(frozen=True)
class Greater(Term):
    a: Any
    b: Any


# -- expression evaluation ------------------------------------------------


@dataclass(frozen=True)
class Eval(Term):
    """Eval(expr, result_var): arithmetic over bound vars.

    expr is a nested tuple tree: ("plus", a, b), ("minus", a, b),
    ("times", a, b), ("divide", a, b), ("div", a, b), ("exp", a, b),
    ("floor", a) — operands are Var/const/nested tuples.
    """

    expr: Any
    result: Var


# -- string words ---------------------------------------------------------


@dataclass(frozen=True)
class Concat(Term):
    parts: Sequence[Any]
    result: Var


@dataclass(frozen=True)
class Substr(Term):
    string: Any
    before: int
    length: int
    result: Var


@dataclass(frozen=True)
class Upper(Term):
    string: Any
    result: Var


@dataclass(frozen=True)
class Lower(Term):
    string: Any
    result: Var


@dataclass(frozen=True)
class Trim(Term):
    string: Any
    result: Var


@dataclass(frozen=True)
class Pad(Term):
    string: Any
    char: str
    length: int
    result: Var


@dataclass(frozen=True)
class Split(Term):
    string: Any
    pattern: str
    result: Var  # binds a list


@dataclass(frozen=True)
class Join(Term):
    list_: Any
    separator: str
    result: Var


@dataclass(frozen=True)
class Like(Term):
    string: Any
    pattern: str  # SQL LIKE pattern


@dataclass(frozen=True)
class Similarity(Term):
    """WOQL like/3: bind the normalized string similarity of two bound
    operands into ``result`` — 1 - levenshtein/max(len), 1.0 for two
    empty strings (the reference's like word binds a [0,1] distance)."""

    a: Any
    b: Any
    result: Var


@dataclass(frozen=True)
class Regexp(Term):
    pattern: str
    string: Any
    matches: Var | None = None  # binds regexp groups as list if given


@dataclass(frozen=True)
class Length(Term):
    value: Any  # string or list
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Typecast(Term):
    value: Any
    xsd_type: str  # "xsd:integer" | "xsd:decimal" | "xsd:string" | "xsd:dateTime" | "xsd:boolean"
    result: Var = None  # type: ignore[assignment]
    # safe=False (default) is the reference's strict semantics: an
    # uncastable lexical form is a query error (Spark ANSI mode raises
    # at runtime, like terminus-server's casting errors).  safe=True
    # is the guarded variant: failure binds NULL (try_cast), the
    # dirty-data filter shape.
    safe: bool = False


# -- aggregation ----------------------------------------------------------


@dataclass(frozen=True)
class GroupBy(Term):
    """GroupBy(group_vars, aggregations, subquery).

    aggregations: list of (fn, Var_in, Var_out) with fn in
    {count, sum, min, max, avg, collect}.  The reference's group_by
    collects templates into a list; ``collect`` reproduces that,
    the rest are the Count/Sum/... words fused into the same node so
    the whole thing is one Spark aggregate (map-side partials).
    """

    group_vars: Sequence[Var]
    aggs: Sequence[tuple]
    term: Term


@dataclass(frozen=True)
class Count(Term):
    term: Term
    result: Var


@dataclass(frozen=True)
class Sum(Term):
    list_var: Any
    result: Var


# -- misc words -----------------------------------------------------------


@dataclass(frozen=True)
class Member(Term):
    element: Any
    list_: Any


@dataclass(frozen=True)
class IDGen(Term):
    base: str
    key_vars: Sequence[Any]
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class HashKey(Term):
    base: str
    key_vars: Sequence[Any]
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Isa(Term):
    element: Any
    type_: Any


@dataclass(frozen=True)
class Path(Term):
    """Path(s, pattern, o [, hops]): regex path query.

    pattern is a ``path_ast`` node; if ``hops`` is a Var it binds the
    minimum hop count (the reference binds a full edge-path object;
    hop count is the analytics-friendly projection of it).
    """

    s: Any
    pattern: Any
    o: Any
    hops: Var | None = None


@dataclass(frozen=True)
class Get(Term):
    """WOQL get: load rows from an external resource, binding columns
    to vars (the reference's Get with format options — file_type,
    header handling, column mapping).  columns: list of
    (column_name, Var).  format: csv | json (jsonlines) | parquet.
    options: extra reader options as (key, value) pairs.  Remote http
    URLs must be staged to storage executors can read (s3/hdfs/file)
    — a driver-side fetch of an unbounded resource is not a
    distributed read."""

    columns: Sequence[tuple]
    resource: str
    has_header: bool = True
    format: str = "csv"
    options: Sequence[tuple] = ()


@dataclass(frozen=True)
class Put(Term):
    """WOQL put: run ``term`` and write the selected vars to a CSV
    resource (the reference's csv sink); bindings pass through so
    puts compose with further words."""

    columns: Sequence[tuple]  # (column_name, Var)
    resource: str
    term: Term
    has_header: bool = True


@dataclass(frozen=True)
class Sub(Term):
    """Sub(child, parent): class subsumption — holds when ``child``
    is ``parent`` or a (transitive) subclass in the schema graph."""

    child: Any
    parent: Any


@dataclass(frozen=True)
class TripleCount(Term):
    """TripleCount(graph, result): bind ``result`` to the number of
    triples in ``graph``."""

    graph: str
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class Once(Term):
    """Once(term): at most one solution of ``term`` (Prolog cut).
    Deterministic only when ``term`` imposes an order (compose with
    OrderBy), mirroring the reference's solution-order dependence."""

    term: Term


@dataclass(frozen=True)
class Dot(Term):
    """Dot(document, key, result): bind ``result`` to field ``key``
    of the JSON document string bound to ``document``."""

    document: Any
    key: str
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class TypeOf(Term):
    """TypeOf(value, type_): bind ``type_`` to the xsd type of the
    value bound to ``value`` (woql_compile.pl TypeOf). Column types
    are static under Spark's schema, so an unbound ``type_`` binds a
    literal; a ground ``type_`` becomes a (statically decidable)
    filter."""

    value: Any
    type_: Any


@dataclass(frozen=True)
class LexicalKey(Term):
    """LexicalKey(base, key_vars, result): the reference's lexical
    key scheme — URI from url-encoded key values joined with '+'
    (document/json.pl lexical key generation)."""

    base: str
    key_vars: Sequence[Any]
    result: Var = None  # type: ignore[assignment]


@dataclass(frozen=True)
class TrueW(Term):
    """True: the trivially-succeeding goal (woql_compile.pl True) —
    passes bindings through unchanged."""


@dataclass(frozen=True)
class InsertDocument(Term):
    """InsertDocument(doc): stage a JSON document for insert — the v3
    ``insert_document`` word.  ``doc`` is a mapping with ``@id`` (the
    subject IRI) and optionally ``@type`` (staged as an rdf:type
    triple with iri typing); every other field stages one triple per
    solution, typed by the update-word conventions (numeric Python
    values → xsd numerics, strings containing '/' → iri refs, Vars
    read the bindings).  Compiles to the same staged-template path as
    AddTriple, so a document insert over a million solutions is one
    distributed projection, not a loop."""

    doc: Any
    graph: str = None  # type: ignore[assignment]


@dataclass(frozen=True)
class UpdateDocument(Term):
    """UpdateDocument(doc): replace the document at ``doc["@id"]`` —
    the v3 ``update_document`` word.  Compiles to whole-subject
    retraction (DeleteDocument's commit-time join) plus the typed
    insert templates in the SAME commit; fields unchanged between old
    and new are deleted and re-added, which the layer identity makes
    a no-op."""

    doc: Any
    graph: str = None  # type: ignore[assignment]


@dataclass(frozen=True)
class DeleteDocument(Term):
    """DeleteDocument(iri): stage deletion of EVERY triple rooted at
    the subject — the v3 ``delete_document`` word.  The per-field
    delta is derived from the store at commit time (join on subject),
    so the word needs no field enumeration and stays correct as the
    document's schema evolves."""

    iri: Any
    graph: str = None  # type: ignore[assignment]


@dataclass(frozen=True)
class ReadDocument(Term):
    """ReadDocument(iri, doc): bind ``doc`` to the canonical JSON
    rendering of the document rooted at subject ``iri`` — the WOQL
    document word (terminus-server v3 ``read_document`` /
    api_document:document_read surfaced inside queries).

    Rendering convention (deterministic, engine-neutral): one JSON
    object per subject, fields sorted by predicate; numeric literals
    (xsd:integer / xsd:decimal) unquoted, everything else a
    JSON-escaped string; multi-valued predicates render as a sorted
    JSON array."""

    iri: Any
    doc: Var = None  # type: ignore[assignment]


# -- update words ---------------------------------------------------------


@dataclass(frozen=True)
class AddTriple(Term):
    """AddTriple(s, p, o): stage an insert for every solution of the
    enclosing query (woql_compile.pl ``insert``).  Compiled by
    ``WOQLContext.run_update`` into rows of a *delta layer* — the
    Spark analogue of the reference staging writes in a transaction
    object and committing them as a new terminusdb-store layer.
    Bindings pass through unchanged (inserts don't prune solutions).
    """

    s: Any
    p: Any
    o: Any
    graph: str | None = None  # None → enclosing Into graph, else "instance"


@dataclass(frozen=True)
class DeleteTriple(Term):
    """DeleteTriple(s, p, o): stage a delete per solution (the
    reference's ``delete`` word).  Variables must be bound by the
    enclosing query; constants delete ground triples."""

    s: Any
    p: Any
    o: Any
    graph: str | None = None  # None → enclosing Into graph, else "instance"


@dataclass(frozen=True)
class Using(Term):
    """Using(graph, term): evaluate ``term`` with ``graph`` as the
    default graph for Triple patterns that don't name one —
    the reference's collection-scoping word (woql_compile.pl
    ``using`` / resolve_query_resource)."""

    graph: str
    term: Term


@dataclass(frozen=True)
class Into(Term):
    """Into(graph, term): stage the updates inside ``term`` against
    ``graph`` (the reference's write-graph scoping word).  Read
    patterns are unaffected — Into scopes only AddTriple/DeleteTriple
    defaults, mirroring woql_compile.pl ``into``."""

    graph: str
    term: Term


@dataclass(frozen=True)
class With(Term):
    """With(graph, resource, term): evaluate ``term`` with a
    TEMPORARY graph named ``graph`` holding the triples parsed from
    ``resource`` (an N-Triples dump path) — the reference's
    query-scoped resource graph (woql_compile.pl ``with``): join a
    dump against the live store without committing anything.  The
    temp graph is visible to Quad/Using patterns only for the scope
    of the word; the store itself is untouched."""

    graph: str
    resource: str
    term: Term
    base: str = "http://example.org/"


@dataclass(frozen=True)
class Call(Term):
    """Call(name, args): invoke a named query registered on the
    context, positional ``args`` substituting for its parameters
    (public WOQL query reuse — NamedParametricQuery documents and the
    ``call`` word; reference: woql_compile.pl call resolution).

    Internal (non-parameter) variables of the body are renamed fresh
    per call site, so all data exchange happens through the argument
    list and repeated calls never capture each other's bindings —
    Prolog-style hygiene."""

    name: str
    args: Sequence[Any] = ()


def substitute(term: Term, mapping: dict[str, Any], rename_free=None):
    """Structurally rebuild ``term`` with every Var whose name is in
    ``mapping`` replaced by the mapped value (a Var or a constant);
    vars outside the mapping pass through ``rename_free`` when given
    (used for call-site hygiene).  Walks dataclass fields, tuples,
    lists and dicts — the whole AST shape space."""
    import dataclasses

    def walk(x):
        if isinstance(x, Var):
            if x.name in mapping:
                return mapping[x.name]
            return rename_free(x) if rename_free else x
        if isinstance(x, (And, Or_)):  # varargs constructors
            return type(x)(*[walk(e) for e in x.terms])
        if dataclasses.is_dataclass(x) and not isinstance(x, type):
            return type(x)(
                **{f.name: walk(getattr(x, f.name)) for f in dataclasses.fields(x)}
            )
        if isinstance(x, tuple):
            return tuple(walk(e) for e in x)
        if isinstance(x, list):
            return [walk(e) for e in x]
        if isinstance(x, dict):
            return {k: walk(e) for k, e in x.items()}
        return x

    return walk(term)
