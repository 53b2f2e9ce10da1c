"""JSON-LD-ish WOQL parser: dict/JSON queries → the Python AST.

Parity: terminus-server accepts WOQL as JSON-LD documents over HTTP
(src/core/query/json_woql.pl translates them to the internal term
form); clients like terminusdb-client-python emit that shape.  This
module is the same translation layer for the Spark engine, so a
caller can ship the serialized query form instead of constructing
AST nodes.

Shape: ``{"@type": "Triple", "subject": {"variable": "s"}, ...}`` —
node values are either ``{"variable": name}``, a scalar literal, or
a nested query dict.  Field names follow the v10 JSON schema
(woql.json): subject/predicate/object, and/or/query, columns, etc.
"""

from __future__ import annotations

from typing import Any

from terminus_server_spark.woql import ast as A
from terminus_server_spark.woql import path_ast as P


def _val(x: Any) -> Any:
    """A term position: variable marker, data literal, or scalar."""
    if isinstance(x, dict):
        if "variable" in x:
            return A.v(x["variable"])
        if "data" in x:  # {"data": {"@type": "xsd:...", "@value": v}}
            d = x["data"]
            return d.get("@value", d) if isinstance(d, dict) else d
        if "node" in x:
            return x["node"]
        raise ValueError(f"unrecognized value form: {x}")
    return x


def _vals(xs) -> list:
    return [_val(x) for x in xs]


def _path(p: dict) -> P.PathPattern:
    t = p["@type"]
    if t == "PathPredicate":
        # the reference schema makes `predicate` optional: omitted
        # (or null) means traverse ANY edge
        pred = p.get("predicate")
        return P.Pred(pred) if pred is not None else P.Any()
    if t == "InversePathPredicate":
        return P.Inv(p["predicate"])
    if t == "PathSequence":
        return P.Seq(*[_path(q) for q in p["sequence"]])
    if t == "PathOr":
        return P.OrP(*[_path(q) for q in p["or"]])
    if t == "PathPlus":
        return P.Plus(_path(p["plus"]), strategy=p.get("strategy", "frontier"))
    if t == "PathStar":
        return P.Star(_path(p["star"]), strategy=p.get("strategy", "frontier"))
    if t == "PathTimes":
        return P.Times(_path(p["times"]), p["from"], p["to"])
    raise NotImplementedError(f"path pattern {t}")


def from_json(q: dict) -> A.Term:
    """One WOQL JSON node → AST term (recursive).

    A top-level ``@context`` (JSON-LD prefix map) is honored: every
    constant string position in the parsed AST is expanded against it
    before the term is returned (terminus-server: query expansion
    against the database's prefix record)."""
    context = q.get("@context")
    if context:
        from terminus_server_spark.woql.prefixes import expand_term

        inner = {k: v for k, v in q.items() if k != "@context"}
        return expand_term(from_json(inner), context)
    t = q["@type"]
    if t == "Triple":
        return A.Triple(_val(q["subject"]), _val(q["predicate"]), _val(q["object"]),
                        graph=q.get("graph"))
    if t == "Quad":
        return A.Quad(_val(q["subject"]), _val(q["predicate"]), _val(q["object"]), q["graph"])
    if t == "And":
        return A.And(*[from_json(s) for s in q["and"]])
    if t == "Or":
        return A.Or_(*[from_json(s) for s in q["or"]])
    if t == "Not":
        return A.Not(from_json(q["query"]))
    if t == "Optional":
        return A.Opt(from_json(q["query"]))
    if t == "Select":
        return A.Select([A.v(v) for v in q["variables"]], from_json(q["query"]))
    if t == "Distinct":
        return A.Distinct([A.v(v) for v in q["variables"]], from_json(q["query"]))
    if t == "Limit":
        return A.Limit(q["limit"], from_json(q["query"]))
    if t == "Start":
        return A.Start(q["start"], from_json(q["query"]))
    if t == "OrderBy":
        keys = [
            (A.v(o["variable"]), o.get("order", "asc"))
            for o in q["ordering"]
        ]
        return A.OrderBy(keys, from_json(q["query"]))
    if t == "Equals":
        return A.Eq(_val(q["left"]), _val(q["right"]))
    if t == "Less":
        return A.Less(_val(q["left"]), _val(q["right"]))
    if t == "Greater":
        return A.Greater(_val(q["left"]), _val(q["right"]))
    if t == "Eval":
        return A.Eval(_arith(q["expression"]), A.v(q["result"]["variable"]))
    if t == "Concatenate":
        return A.Concat(_vals(q["list"]), A.v(q["result"]["variable"]))
    if t == "Substring":
        return A.Substr(_val(q["string"]), q["before"], q["length"],
                        A.v(q["substring"]["variable"]))
    if t == "Upper":
        return A.Upper(_val(q["mixed"]), A.v(q["upper"]["variable"]))
    if t == "Lower":
        return A.Lower(_val(q["mixed"]), A.v(q["lower"]["variable"]))
    if t == "Trim":
        return A.Trim(_val(q["untrimmed"]), A.v(q["trimmed"]["variable"]))
    if t == "Pad":
        return A.Pad(_val(q["string"]), q["char"], q["times"], A.v(q["result"]["variable"]))
    if t == "Split":
        return A.Split(_val(q["string"]), q["pattern"], A.v(q["list"]["variable"]))
    if t == "Join":
        return A.Join(_val(q["list"]), q["separator"], A.v(q["result"]["variable"]))
    if t == "Like":
        return A.Like(_val(q["left"]), q["like"])
    if t == "Regexp":
        return A.Regexp(q["pattern"], _val(q["string"]),
                        A.v(q["result"]["variable"]) if "result" in q else None)
    if t == "Length":
        return A.Length(_val(q["list"]), A.v(q["length"]["variable"]))
    if t == "Typecast":
        return A.Typecast(_val(q["value"]), q["type"], A.v(q["result"]["variable"]))
    if t == "GroupBy":
        aggs = [
            (a["agg"], A.v(a["input"]), A.v(a["output"]))
            for a in q["aggregations"]
        ]
        return A.GroupBy([A.v(v) for v in q["group_by"]], aggs, from_json(q["query"]))
    if t == "Count":
        return A.Count(from_json(q["query"]), A.v(q["count"]["variable"]))
    if t == "Sum":
        return A.Sum(_val(q["list"]), A.v(q["result"]["variable"]))
    if t == "Member":
        return A.Member(_val(q["member"]), _val(q["list"]))
    if t == "LexicalKey":
        return A.LexicalKey(q["base"], _vals(q["key_list"]), A.v(q["uri"]["variable"]))
    if t == "HashKey":
        return A.HashKey(q["base"], _vals(q["key_list"]), A.v(q["uri"]["variable"]))
    if t == "IDGen":
        return A.IDGen(q["base"], _vals(q["key_list"]), A.v(q["uri"]["variable"]))
    if t == "IsA":
        return A.Isa(_val(q["element"]), _val(q["of"]))
    if t == "Subsumption":
        return A.Sub(_val(q["child"]), _val(q["parent"]))
    if t == "Once":
        return A.Once(from_json(q["query"]))
    if t == "True":
        return A.TrueW()
    if t == "TripleCount":
        return A.TripleCount(q["graph"], A.v(q["count"]["variable"]))
    if t == "TypeOf":
        return A.TypeOf(_val(q["value"]), _val(q["type"]))
    if t == "Path":
        return A.Path(_val(q["subject"]), _path(q["pattern"]), _val(q["object"]),
                      hops=A.v(q["path"]["variable"]) if "path" in q else None)
    if t == "AddTriple":
        return A.AddTriple(_val(q["subject"]), _val(q["predicate"]), _val(q["object"]),
                           graph=q.get("graph"))
    if t == "DeleteTriple":
        return A.DeleteTriple(_val(q["subject"]), _val(q["predicate"]), _val(q["object"]),
                              graph=q.get("graph"))
    if t == "Using":
        return A.Using(q["collection"], from_json(q["query"]))
    if t == "Into":
        return A.Into(q["graph"], from_json(q["query"]))
    if t == "Get":
        cols = [(c["name"], A.v(c["variable"])) for c in q["columns"]]
        return A.Get(cols, q["resource"], q.get("has_header", True))
    if t == "Put":
        cols = [(c["name"], A.v(c["variable"])) for c in q["columns"]]
        return A.Put(cols, q["resource"], from_json(q["query"]), q.get("has_header", True))
    if t == "Dot":
        return A.Dot(_val(q["document"]), q["field"], A.v(q["value"]["variable"]))
    if t == "Call":
        return A.Call(q["name"], [_val(a) for a in q.get("arguments", [])])
    raise NotImplementedError(f"WOQL JSON word {t}")


def parse_named_query(doc: dict) -> tuple[str, list, "A.Term"]:
    """A NamedParametricQuery document → (name, params, body) for
    ``WOQLContext.define`` (the reference stores reusable queries as
    these documents; ``Call`` invokes them by name)."""
    if doc.get("@type") != "NamedParametricQuery":
        raise ValueError(f"not a NamedParametricQuery: {doc.get('@type')!r}")
    return (
        doc["name"],
        [A.v(p) for p in doc.get("parameters", [])],
        from_json(doc["query"]),
    )


def _arith(e: Any) -> Any:
    """Arithmetic expression tree: {"@type": "Plus", "left": .., "right": ..}."""
    if not isinstance(e, dict):
        return e
    if "variable" in e or "data" in e or "node" in e:
        return _val(e)
    t = e["@type"]
    binops = {"Plus": "plus", "Minus": "minus", "Times": "times",
              "Divide": "divide", "Div": "div", "Exp": "exp"}
    if t in binops:
        return (binops[t], _arith(e["left"]), _arith(e["right"]))
    if t == "Floor":
        return ("floor", _arith(e["argument"]))
    raise NotImplementedError(f"arith {t}")
