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
