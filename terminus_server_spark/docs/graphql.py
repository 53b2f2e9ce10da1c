"""GraphQL request parsing + execution against the document read
algebra.

Parity: the reference serves a generated GraphQL schema per database
(class frames → object types, filter inputs, Query root — see
``documents.graphql_schema``) and answers GraphQL queries over HTTP.
This module closes the request side: a recursive-descent parser for
the query-document subset that schema exposes —

    query {
      Customer(filter: {c_acctbal: {gt: 1000}, _or: [...]},
               orderBy: {c_acctbal: DESC}, limit: 10, offset: 5) {
        c_custkey
        c_name
      }
    }

— compiled onto :func:`terminus_server_spark.docs.documents.
query_documents`.  Parsing is driver-side compile work on a
kilobyte-sized string; the data plane is exactly the read algebra's
plan (one filtered scan, TakeOrderedAndProject for orderBy+limit), so
query cost is unchanged by the wire format.

Grammar subset (the shapes the generated schema admits):
- one operation, optional ``query`` keyword, one or more root fields;
- root field = class name with optional (filter / orderBy / limit /
  offset) arguments and a flat selection set of scalar fields;
- filter object: per-field operator maps ``{field: {op: value}}``
  with op in eq/ne/gt/ge/lt/le/like/regex/in, plus ``_and``/``_or``
  (lists) and ``_not`` combinators, arbitrarily nested;
- orderBy: object ``{field: ASC|DESC}`` or list of such;
- values: Int, Float, String, Boolean, enum tokens, lists.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
      | (?P<punct>[{}()\[\]:,])
    )""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"graphql: bad character at {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("str", "num", "name", "punct"):
            tok = m.group(kind)
            if tok is not None:
                out.append((kind, tok))
                break
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value: str):
        kind, tok = self.next()
        if tok != value:
            raise ValueError(f"graphql: expected {value!r}, got {tok!r}")

    def value(self):
        kind, tok = self.next()
        if kind == "str":
            # JSON-compatible escapes
            body = tok[1:-1]
            return re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
                body,
            )
        if kind == "num":
            return float(tok) if "." in tok else int(tok)
        if kind == "name":
            if tok == "true":
                return True
            if tok == "false":
                return False
            if tok == "null":
                return None
            return tok  # enum token (ASC/DESC)
        if tok == "[":
            items = []
            while self.peek()[1] != "]":
                items.append(self.value())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            return items
        if tok == "{":
            obj = {}
            while self.peek()[1] != "}":
                _, key = self.next()
                self.expect(":")
                obj[key] = self.value()
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return obj
        raise ValueError(f"graphql: unexpected token {tok!r} in value")

    def arguments(self) -> dict:
        args = {}
        if self.peek()[1] != "(":
            return args
        self.expect("(")
        while self.peek()[1] != ")":
            _, key = self.next()
            self.expect(":")
            args[key] = self.value()
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        return args

    def selection_set(self) -> list[str]:
        self.expect("{")
        fields = []
        while self.peek()[1] != "}":
            kind, tok = self.next()
            if kind != "name":
                raise ValueError(f"graphql: expected field name, got {tok!r}")
            fields.append(tok)
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return fields

    def query(self) -> dict:
        if self.peek() == ("name", "query"):
            self.next()
        self.expect("{")
        roots = {}
        while self.peek()[1] != "}":
            kind, cls = self.next()
            if kind != "name":
                raise ValueError(f"graphql: expected class name, got {cls!r}")
            args = self.arguments()
            fields = self.selection_set()
            roots[cls] = {"args": args, "fields": fields}
        self.expect("}")
        return roots


def parse_graphql(src: str) -> dict:
    """GraphQL query string → {class: {args, fields}} request dict."""
    return _Parser(_tokenize(src)).query()


_OPS = ("eq", "ne", "gt", "ge", "lt", "le", "like", "regex", "in")


def filter_to_tree(obj: dict):
    """GraphQL filter object → ``compile_filter`` combinator tree."""
    parts = []
    for key, val in obj.items():
        if key == "_and":
            parts.append(("and", [filter_to_tree(v) for v in val]))
        elif key == "_or":
            parts.append(("or", [filter_to_tree(v) for v in val]))
        elif key == "_not":
            parts.append(("not", filter_to_tree(val)))
        else:
            if not isinstance(val, dict):
                raise ValueError(f"graphql: field filter for {key} must be an object")
            for op, v in val.items():
                if op not in _OPS:
                    raise ValueError(f"graphql: unknown filter op {op!r}")
                parts.append((key, op, v))
    if not parts:
        raise ValueError("graphql: empty filter object")
    if len(parts) == 1:
        return parts[0]
    return ("and", parts)


def execute_graphql(frames: dict, src: str):
    """Execute a parsed GraphQL request against ``frames`` (class
    name → DataFrame) and return {class: DataFrame}.  Compilation
    only — the plan is query_documents' (filter pushed to the scan,
    orderBy+limit as TakeOrderedAndProject)."""
    from terminus_server_spark.docs.documents import query_documents

    out = {}
    for cls, req in parse_graphql(src).items():
        if cls not in frames:
            raise ValueError(f"graphql: unknown class {cls!r}")
        args = req["args"]
        predicates = []
        if "filter" in args:
            predicates = [filter_to_tree(args["filter"])]
        order_by = None
        if "orderBy" in args:
            ob = args["orderBy"]
            items = ob if isinstance(ob, list) else [ob]
            order_by = [
                (field, "asc" if str(direction).upper() == "ASC" else "desc")
                for item in items
                for field, direction in item.items()
            ]
        df = query_documents(
            frames[cls],
            predicates=predicates,
            order_by=order_by,
            limit=args.get("limit"),
            offset=args.get("offset"),
        )
        out[cls] = df.select(*req["fields"])
    return out
