"""Path-regex AST for WOQL path queries.

Parity: terminus-server path patterns (src/core/query/path.pl):
predicate, inverse, sequence, alternation, plus, star, times(n,m).
"""

from __future__ import annotations

from dataclasses import dataclass


class PathPattern:
    pass


@dataclass(frozen=True)
class Pred(PathPattern):
    predicate: str


@dataclass(frozen=True)
class Any(PathPattern):
    """Wildcard step: traverse ANY edge regardless of predicate — the
    reference grammar's predicate-less PathPredicate (textual
    spelling ``.``).  Compiles to the node-to-node subset of the
    whole triple frame (obj_type = iri), so ``.+`` is whole-graph
    reachability."""


@dataclass(frozen=True)
class Inv(PathPattern):
    predicate: str


@dataclass(frozen=True)
class Seq(PathPattern):
    parts: tuple

    def __init__(self, *parts: PathPattern):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class OrP(PathPattern):
    parts: tuple

    def __init__(self, *parts: PathPattern):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class Plus(PathPattern):
    """Closure strategy: "frontier" (semi-naive BFS; rounds = graph
    diameter, per-round shuffle bounded by the frontier — the safe
    default for bushy graphs) or "doubling" (min-plus squaring;
    ceil(log2(diameter)) rounds, each joining the full closure with
    itself — faster for long-diameter hierarchies/chains whose
    closure is modest)."""

    part: PathPattern
    strategy: str = "frontier"


@dataclass(frozen=True)
class Star(PathPattern):
    part: PathPattern
    strategy: str = "frontier"


@dataclass(frozen=True)
class Times(PathPattern):
    part: PathPattern
    n: int
    m: int


_PATH_TOKEN = __import__("re").compile(
    r"\s*(?:(?P<name>[A-Za-z_][\w:.\-/]*)|(?P<num>\d+)|(?P<p>[,|+*{}()<.]))"
)


def parse_path_string(src: str) -> PathPattern:
    """Parse the textual path-regex syntax the reference's GraphQL
    and WOQL layers accept (public locus: terminus-server path
    queries, src/core/query/path.pl grammar; the GraphQL ``path``
    field takes the same string form):

    - ``p``            predicate step
    - ``.``            any-predicate wildcard step
    - ``<p``           inverse step
    - ``p,q``          sequence
    - ``p|q``          alternation
    - ``p+`` ``p*``    one-or-more / zero-or-more closure
    - ``p{n,m}``       bounded repetition
    - parentheses      grouping

    Example: ``"(parent,<parent)|friend+"``.  Pure driver-side
    compile work on a short string — the compiled plan is
    :func:`terminus_server_spark.operators.path.compile_path`'s."""
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(src):
        m = _PATH_TOKEN.match(src, i)
        if not m or m.end() == i:
            if src[i:].strip() == "":
                break
            raise ValueError(f"path syntax: unexpected {src[i:]!r}")
        i = m.end()
        for kind in ("name", "num", "p"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break

    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else (None, None)

    def take(expect=None):
        kind, val = peek()
        if expect is not None and val != expect:
            raise ValueError(f"path syntax: expected {expect!r}, got {val!r}")
        pos[0] += 1
        return kind, val

    def atom() -> PathPattern:
        kind, val = peek()
        if val == "(":
            take("(")
            inner = alternation()
            take(")")
            return inner
        if val == "<":
            take("<")
            kind, name = take()
            if kind != "name":
                raise ValueError(f"path syntax: expected predicate after '<', got {name!r}")
            return Inv(name)
        if val == ".":
            take()
            return Any()
        if kind == "name":
            take()
            return Pred(val)
        raise ValueError(f"path syntax: expected a step, got {val!r}")

    def postfixed() -> PathPattern:
        out = atom()
        while True:
            _, val = peek()
            if val == "+":
                take()
                out = Plus(out)
            elif val == "*":
                take()
                out = Star(out)
            elif val == "{":
                take("{")
                _, n = take()
                take(",")
                if peek()[1] == "}":
                    # open upper bound p{n,}: desugar to n-fold then
                    # closure (p{0,} is Star itself) — the AST stays in
                    # the closed vocabulary, so compile/render need no
                    # new cases and the parse∘render property holds on
                    # the desugared form
                    take("}")
                    n_i = int(n)
                    out = (
                        Star(out)
                        if n_i == 0
                        else Seq(Times(out, n_i, n_i), Star(out))
                    )
                else:
                    _, m_ = take()
                    take("}")
                    out = Times(out, int(n), int(m_))
            else:
                return out

    def sequence() -> PathPattern:
        parts = [postfixed()]
        while peek()[1] == ",":
            take(",")
            parts.append(postfixed())
        return parts[0] if len(parts) == 1 else Seq(*parts)

    def alternation() -> PathPattern:
        parts = [sequence()]
        while peek()[1] == "|":
            take("|")
            parts.append(sequence())
        return parts[0] if len(parts) == 1 else OrP(*parts)

    out = alternation()
    if pos[0] != len(toks):
        raise ValueError(f"path syntax: trailing tokens at {toks[pos[0]:]!r}")
    return out


def render_path_string(p: PathPattern) -> str:
    """Inverse of :func:`parse_path_string`: render a pattern back to
    the textual path-regex syntax (fully parenthesized compounds, so
    the rendering is unambiguous regardless of the original
    spelling).  ``parse(render(p)) == p`` for every pattern the
    textual syntax can EXPRESS — property-tested.  The one lossy
    field is the Plus/Star ``strategy`` EXECUTION HINT
    (frontier/doubling): the reference grammar has no spelling for
    it, so rendering normalizes to the default — semantics are
    unchanged (both strategies compute the same closure), only the
    physical-plan preference is dropped."""
    if isinstance(p, Pred):
        return p.predicate
    if isinstance(p, Any):
        return "."
    if isinstance(p, Inv):
        return f"<{p.predicate}"
    if isinstance(p, Seq):
        return "(" + ",".join(render_path_string(q) for q in p.parts) + ")"
    if isinstance(p, OrP):
        return "(" + "|".join(render_path_string(q) for q in p.parts) + ")"
    if isinstance(p, Plus):
        return f"({render_path_string(p.part)})+"
    if isinstance(p, Star):
        return f"({render_path_string(p.part)})*"
    if isinstance(p, Times):
        return f"({render_path_string(p.part)}){{{p.n},{p.m}}}"
    raise NotImplementedError(f"path pattern {type(p).__name__}")
