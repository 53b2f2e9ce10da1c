"""@context prefix handling (JSON-LD compaction/expansion).

Parity: terminus-server queries and documents carry a JSON-LD
``@context`` mapping prefixes to IRI bases (``@base``/``@schema`` and
user prefixes); the server expands prefixed names before matching and
compacts IRIs on the way out.  These are pure compile-time string
transforms — nothing here touches the data plane, so query cost is
unchanged.
"""

from __future__ import annotations

import dataclasses

from terminus_server_spark.woql import ast as A

#: prefixes that are part of the wire vocabulary, never expanded
#: against a user context (they tag types, not data IRIs)
RESERVED = ("rdf", "xsd", "@")


def expand_iri(name: str, context: dict[str, str]) -> str:
    """``pfx:local`` → ``context[pfx] + local`` when pfx is declared
    (reserved vocabulary prefixes pass through untouched)."""
    if ":" not in name:
        return name
    pfx, local = name.split(":", 1)
    if pfx in RESERVED or pfx.startswith("@"):
        return name
    if pfx in context:
        return context[pfx] + local
    return name


def compact_iri(iri: str, context: dict[str, str]) -> str:
    """Longest-base-match reverse of :func:`expand_iri`."""
    best = None
    for pfx, base in context.items():
        if base and iri.startswith(base):
            if best is None or len(base) > len(context[best]):
                best = pfx
    if best is None:
        return iri
    return f"{best}:{iri[len(context[best]):]}"


def expand_term(term: A.Term, context: dict[str, str]) -> A.Term:
    """Rebuild an AST with every constant string position expanded
    against ``context`` — the compile step terminus-server applies to
    an incoming JSON-LD query before planning.  Vars pass through."""

    def walk(x):
        if isinstance(x, A.Var):
            return x
        if isinstance(x, str):
            return expand_iri(x, context)
        if isinstance(x, (A.And, A.Or_)):
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


def resolve_curies(refs, prefixes, base_prefix: str = "@base"):
    """Data-plane CURIE resolution against *registered* per-database
    prefixes (reference: prefix documents in the _system database —
    each database stores its ``@base``/``@schema`` plus user prefixes,
    and the document API expands prefixed names against them).

    ``refs``     — DataFrame (db, curie): prefixed (``pfx:local``) or
                   bare (``local``) names to resolve.
    ``prefixes`` — DataFrame (db, prefix, iri): the registered prefix
                   documents; bare names resolve against the row whose
                   prefix is ``base_prefix``.

    The prefix table is system metadata (a handful of rows per
    database), so the join is broadcast — resolution is a map-only
    pass over the refs at any scale.  Unknown prefixes resolve to
    NULL iri, surfacing registration gaps instead of hiding them.
    """
    from pyspark.sql import functions as F

    has_pfx = F.col("curie").contains(":")
    parsed = refs.select(
        "db",
        "curie",
        F.when(has_pfx, F.substring_index(F.col("curie"), ":", 1))
        .otherwise(F.lit(base_prefix))
        .alias("_pfx"),
        F.when(
            has_pfx,
            F.expr("substring(curie, instr(curie, ':') + 1)"),
        )
        .otherwise(F.col("curie"))
        .alias("_local"),
    )
    ptab = prefixes.select(
        F.col("db"), F.col("prefix").alias("_pfx"), F.col("iri").alias("_iri")
    )
    return parsed.join(F.broadcast(ptab), ["db", "_pfx"], "left_outer").select(
        "db",
        "curie",
        F.concat(F.col("_iri"), F.col("_local")).alias("iri"),
    )
