"""Regex path queries as iterative DataFrame joins.

Parity: terminus-server path patterns (src/core/query/path.pl)
evaluate a regex over edges by Prolog search per start node.  The
scale translation is *set-at-a-time*: compile the pattern to an
``(src, dst, hops)`` DataFrame; closure operators (plus/star) run
**semi-naive iteration** — join only the newest frontier against the
base edges each step, dedupe against the accumulated result, stop on
an empty frontier.

Scale notes (100 TB):
- frontier/accumulator are ``localCheckpoint``-ed every iteration to
  cut lineage (otherwise plan depth grows linearly and the optimizer
  chokes by iteration ~20);
- the per-step join shuffles on ``dst``/``src`` — base edges are
  repartitioned once on ``src`` and reused so every iteration's join
  key is pre-partitioned;
- ``max_iters`` bounds pathological cyclic graphs; hop counts make
  the result usable for shortest-path analytics.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

from terminus_server_spark.checkpoint import (
    loop_checkpoint,
    loop_checkpoint_count,
    loop_tuning,
)

from terminus_server_spark.woql import path_ast as P


@contextmanager
def no_constraint_propagation(spark):
    """Catalyst's Union.rewriteConstraints crashes (key not found:
    attr) when a localCheckpoint'ed plan is unioned with a plan that
    shares its attribute ids — exactly the shape of semi-naive
    iteration.  Constraint propagation buys nothing inside these
    loops (inputs are already not-null-filtered), so scope it off."""
    key = "spark.sql.constraintPropagation.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _dedup_min_hops(df: DataFrame) -> DataFrame:
    return df.groupBy("src", "dst").agg(F.min("hops").alias("hops"))


def transitive_closure(
    edges: DataFrame, max_iters: int = 50, with_hops: bool = False
) -> DataFrame:
    """plus-closure: all (src, dst) connected by >=1 edge.

    Semi-naive: frontier_{k+1} = frontier_k ⋈ edges − reached.
    """
    spark = edges.sparkSession
    with no_constraint_propagation(spark):
        base = edges.select("src", "dst").where(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        )
        # checkpoint the edge set once; each iteration's join shuffles
        # it on src and AQE reuses the exchange across iterations
        base = base.transform(loop_checkpoint)

        # BFS layering: each frontier is anti-joined against everything
        # seen, so layer k holds exactly the pairs first reached in k
        # hops — min-hops falls out for free and `reached` stays a
        # FLAT union of checkpointed layers (no re-dedup, no
        # re-checkpoint of the accumulator).
        frontier, n_base = loop_checkpoint_count(base.withColumn("hops", F.lit(1)))
        layers = [frontier]
        reached_keys = frontier.select("src", "dst")
        with loop_tuning(spark, n_base):
            for _ in range(max_iters):
                grown = (
                    frontier.alias("f")
                    .join(base.alias("e"), F.col("f.dst") == F.col("e.src"))
                    .select(
                        F.col("f.src").alias("src"),
                        F.col("e.dst").alias("dst"),
                        (F.col("f.hops") + 1).alias("hops"),
                    )
                )
                # checkpoint + empty-frontier probe fused into one job
                new, n_new = loop_checkpoint_count(
                    grown.join(reached_keys, on=["src", "dst"], how="left_anti")
                    .groupBy("src", "dst")
                    .agg(F.min("hops").alias("hops"))
                )
                if n_new == 0:
                    break
                layers.append(new)
                reached_keys = reached_keys.union(new.select("src", "dst"))
                frontier = new
        reached = layers[0]
        for layer in layers[1:]:
            reached = reached.unionByName(layer)
    return reached if with_hops else reached.select("src", "dst")


def transitive_closure_doubling(
    edges: DataFrame, max_doublings: int = 20, with_hops: bool = False
) -> DataFrame:
    """plus-closure by min-plus path doubling: R_{i+1} = min-hops of
    R_i ∪ (R_i ⋈ R_i).  Converges in ceil(log2(diameter)) rounds vs
    the frontier method's `diameter` rounds.

    Trade-off vs ``transitive_closure``: each round joins the FULL
    closure with itself, so intermediate size is O(|closure|) — the
    right choice for long-diameter graphs whose closure fits
    comfortably (hierarchies, linked lists, version chains).  For
    bushy graphs where |closure| ≫ |edges| the frontier method
    shuffles far less per round; callers pick by shape."""
    spark = edges.sparkSession

    def ckpt_stats(df: DataFrame) -> tuple[DataFrame, tuple, int]:
        # lazy checkpoint + stats probe fused: the agg action
        # materializes the checkpoint blocks in the same job; the
        # size-estimate strip matters doubly here — each doubling
        # round self-joins the checkpointed closure, the exact shape
        # that squares the propagated estimate per round
        from terminus_server_spark.checkpoint import _strip_exploded_stats

        out = _strip_exploded_stats(df.localCheckpoint(eager=False))
        row = out.agg(F.count(F.lit(1)), F.sum("hops"), F.max("hops")).collect()[0]
        return out, (row[0], row[1]), row[2]

    with no_constraint_propagation(spark):
        r, stats, max_hops = ckpt_stats(
            edges.select("src", "dst").where(
                F.col("src").isNotNull() & F.col("dst").isNotNull()
            )
            .withColumn("hops", F.lit(1))
            .groupBy("src", "dst")
            .agg(F.min("hops").alias("hops"))
        )
        covered = 1  # R holds every min-hop pair with hops <= covered
        for _ in range(max_doublings):
            if max_hops is not None and max_hops < covered:
                # Diameter proof, no confirmation round needed: if a
                # pair at min-distance d > covered existed, the length-
                # `covered` prefix of its shortest path is itself a
                # shortest path (subpaths of shortest paths are
                # shortest), so R would contain a pair with hops ==
                # covered exactly — contradicting max_hops < covered.
                break
            squared = (
                r.alias("a")
                .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(
                    F.col("a.src").alias("src"),
                    F.col("b.dst").alias("dst"),
                    (F.col("a.hops") + F.col("b.hops")).alias("hops"),
                )
            )
            r, new_stats, max_hops = ckpt_stats(
                r.unionByName(squared)
                .groupBy("src", "dst")
                .agg(F.min("hops").alias("hops"))
            )
            covered *= 2
            if new_stats == stats:  # no new pairs, no shorter paths
                break
            stats = new_stats
    return r if with_hops else r.select("src", "dst")


def anchored_closure(
    edges: DataFrame,
    anchors: DataFrame,
    max_iters: int = 50,
    with_zero: bool = False,
) -> DataFrame:
    """(src, dst, hops): min-repetition closure pairs whose ``src``
    is in ``anchors`` (one ``node`` column) — the ``from:``-bound
    form of :func:`transitive_closure`.  THIS is the 100 TB shape for
    anchored path traversal: state is the anchors' reachable set
    (frontier-sized shuffles), never the all-pairs closure a
    filter-after-closure plan would materialize first.

    Plus semantics: hops >= 1, INCLUDING cycle returns to the anchor
    (the seed is the anchors' one-step successors, so the anchor
    itself is reachable at hops >= 1 through a cycle — identical to
    filtering the full plus-closure by src).  ``with_zero`` adds the
    hops-0 self row and drops any costlier self pair (star) — ONLY
    for anchors that appear in the edge universe, matching the
    un-anchored plan exactly: ``compile_path(Star)`` derives its
    zero rows from the graph's nodes, so an anchor absent from the
    graph must yield zero rows, not a phantom (a, a, 0)."""
    spark = edges.sparkSession
    with no_constraint_propagation(spark):
        base = loop_checkpoint(
            edges.select("src", "dst").where(
                F.col("src").isNotNull() & F.col("dst").isNotNull()
            )
        )
        a = anchors.select(F.col("node").alias("src")).distinct()
        frontier, n0 = loop_checkpoint_count(
            base.join(a, "src").select("src", "dst", F.lit(1).alias("hops"))
        )
        layers = [frontier]
        reached_keys = frontier.select("src", "dst")
        with loop_tuning(spark, max(n0, 1)):
            for _ in range(max_iters - 1):
                grown = (
                    frontier.alias("f")
                    .join(base.alias("e"), F.col("f.dst") == F.col("e.src"))
                    .select(
                        F.col("f.src").alias("src"),
                        F.col("e.dst").alias("dst"),
                        (F.col("f.hops") + 1).alias("hops"),
                    )
                )
                new, n_new = loop_checkpoint_count(
                    grown.join(reached_keys, ["src", "dst"], "left_anti")
                    .groupBy("src", "dst")
                    .agg(F.min("hops").alias("hops"))
                )
                if n_new == 0:
                    break
                layers.append(new)
                reached_keys = reached_keys.union(new.select("src", "dst"))
                frontier = new
        out = layers[0]
        for layer in layers[1:]:
            out = out.unionByName(layer)
        if with_zero:
            universe = base.select(F.col("src").alias("n")).union(
                base.select(F.col("dst"))
            ).distinct()
            zero = (
                a.join(universe, a["src"] == universe["n"], "left_semi")
                .select("src", F.col("src").alias("dst"), F.lit(0).alias("hops"))
            )
            out = zero.unionByName(
                out.join(zero.select("src", "dst"), ["src", "dst"], "left_anti")
            )
    return out


def _seq_into_closure(
    left: DataFrame, b: DataFrame, with_zero: bool
) -> DataFrame:
    """``left ; B*`` / ``left ; B+`` without the global closure:
    anchor the B-closure on left's distinct endpoints (the only
    middles the join could keep), then extend left by the anchored
    distances.  ``with_zero`` (star) keeps each left pair itself —
    but only when its endpoint exists in B's node universe, matching
    ``compile_path(Star)``'s graph-derived zero rows exactly."""
    mids = left.select(F.col("dst").alias("node")).distinct()
    d = anchored_closure(b, mids)
    grown = (
        left.alias("a")
        .join(d.alias("c"), F.col("a.dst") == F.col("c.src"))
        .select(
            F.col("a.src").alias("src"),
            F.col("c.dst").alias("dst"),
            (F.col("a.hops") + F.col("c.hops")).alias("hops"),
        )
    )
    if with_zero:
        universe = (
            b.select(F.col("src").alias("n"))
            .union(b.select(F.col("dst")))
            .distinct()
        )
        kept = left.join(
            universe, left["dst"] == universe["n"], "left_semi"
        ).select("src", "dst", "hops")
        grown = grown.unionByName(kept)
    return grown


def compile_path(
    store, pattern: P.PathPattern, graph: str = "instance"
) -> DataFrame:
    """Compile a path pattern to an (src, dst, hops) DataFrame.

    ``graph`` scopes every step's edge scan (the WOQL compiler passes
    the active Using(...) graph down, so path words see the same
    graph the surrounding triple patterns do)."""
    if isinstance(pattern, P.Pred):
        return store.edges(pattern.predicate, graph).withColumn("hops", F.lit(1))
    if isinstance(pattern, P.Any):
        # wildcard: every node-to-node edge in the instance graph —
        # the obj_type filter keeps literal objects out of the node
        # domain (a literal is a dead end, not a vertex), and it
        # pushes into the union's branch scans like any predicate
        # filter would.
        return (
            store.spo(None, graph)
            .where(F.col("obj_type") == "iri")
            .select(F.col("subject").alias("src"), F.col("obj").alias("dst"))
            .withColumn("hops", F.lit(1))
        )
    if isinstance(pattern, P.Inv):
        e = store.edges(pattern.predicate, graph)
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst")).withColumn(
            "hops", F.lit(1)
        )
    if isinstance(pattern, P.Seq):
        out = compile_path(store, pattern.parts[0], graph)
        for nxt_ast in pattern.parts[1:]:
            if (
                isinstance(nxt_ast, (P.Plus, P.Star))
                and getattr(nxt_ast, "strategy", "frontier") == "frontier"
            ):
                # Push the sequence restriction INTO the closure: a
                # plain compile would materialize the GLOBAL star/plus
                # closure and then join (filter-after-closure — the
                # all-pairs state this module exists to avoid).  The
                # anchored closure grows only from the left side's
                # endpoints; its first-reach/min-hop discipline is the
                # same as transitive_closure restricted to those
                # sources, so results are identical, just cheaper.
                out = _seq_into_closure(
                    _dedup_min_hops(out),
                    compile_path(store, nxt_ast.part, graph),
                    with_zero=isinstance(nxt_ast, P.Star),
                )
            else:
                nxt = compile_path(store, nxt_ast, graph)
                out = (
                    out.alias("a")
                    .join(nxt.alias("b"), F.col("a.dst") == F.col("b.src"))
                    .select(
                        F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst"),
                        (F.col("a.hops") + F.col("b.hops")).alias("hops"),
                    )
                )
        return _dedup_min_hops(out)
    if isinstance(pattern, P.OrP):
        parts = [compile_path(store, p, graph) for p in pattern.parts]
        out = parts[0]
        for nxt in parts[1:]:
            out = out.unionByName(nxt)
        return _dedup_min_hops(out)
    if isinstance(pattern, P.Plus):
        close = transitive_closure_doubling if pattern.strategy == "doubling" else transitive_closure
        return close(compile_path(store, pattern.part, graph), with_hops=True)
    if isinstance(pattern, P.Star):
        close = transitive_closure_doubling if pattern.strategy == "doubling" else transitive_closure
        plus = close(compile_path(store, pattern.part, graph), with_hops=True)
        base = compile_path(store, pattern.part, graph)
        nodes = base.select(F.col("src").alias("n")).union(base.select(F.col("dst"))).distinct()
        zero = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"), F.lit(0).alias("hops"))
        return _dedup_min_hops(plus.unionByName(zero))
    if isinstance(pattern, P.Times):
        base = compile_path(store, pattern.part, graph)
        acc = None
        if pattern.n == 0:
            # {0,m} admits the empty repetition: identity pairs over
            # the base pattern's node universe, matching Star's
            # zero-hop rows ({0,0} is pure identity)
            nodes = base.select(F.col("src").alias("n")).union(
                base.select(F.col("dst"))
            ).distinct()
            acc = nodes.select(
                F.col("n").alias("src"), F.col("n").alias("dst"), F.lit(0).alias("hops")
            )
        cur = None
        for k in range(1, pattern.m + 1):
            cur = base if cur is None else (
                cur.alias("a")
                .join(base.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(
                    F.col("a.src").alias("src"),
                    F.col("b.dst").alias("dst"),
                    (F.col("a.hops") + F.col("b.hops")).alias("hops"),
                )
            )
            cur = _dedup_min_hops(cur)
            if k >= pattern.n:
                acc = cur if acc is None else acc.unionByName(cur)
        return _dedup_min_hops(acc)
    raise NotImplementedError(f"path pattern {type(pattern).__name__}")


def trace_paths(edges: DataFrame, max_iters: int = 50) -> DataFrame:
    """(src, dst, hops, path): the full node chain for every
    plus-closure pair, as 'a>b>c' strings — the projection of the
    reference's bound path objects (path.pl binds an edge list per
    solution, not just reachability).

    Semi-naive like transitive_closure, with the chain accumulated as
    a string column; only the minimum-hop path per pair is kept (ties
    broken by lexicographically smallest chain, a total order both
    engines share).  Intended for hierarchy-shaped graphs where paths
    are short; the accumulator row width grows with hop count."""
    spark = edges.sparkSession
    with no_constraint_propagation(spark):
        base = (
            edges.select("src", "dst")
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .transform(loop_checkpoint)
        )
        frontier, n_base = loop_checkpoint_count(
            base.select(
                "src", "dst", F.lit(1).alias("hops"),
                F.concat_ws(">", F.col("src"), F.col("dst")).alias("path"),
            )
        )
        layers = [frontier]
        reached = frontier.select("src", "dst")
        with loop_tuning(spark, n_base):
            for _ in range(max_iters):
                grown = (
                    frontier.alias("f")
                    .join(base.alias("e"), F.col("f.dst") == F.col("e.src"))
                    .select(
                        F.col("f.src").alias("src"),
                        F.col("e.dst").alias("dst"),
                        (F.col("f.hops") + 1).alias("hops"),
                        F.concat_ws(">", F.col("f.path"), F.col("e.dst")).alias("path"),
                    )
                )
                new = (
                    grown.join(reached, on=["src", "dst"], how="left_anti")
                    .groupBy("src", "dst")
                    .agg(F.min("hops").alias("hops"), F.min("path").alias("path"))
                )
                new, n_new = loop_checkpoint_count(new)
                if n_new == 0:
                    break
                layers.append(new)
                reached = reached.union(new.select("src", "dst"))
                frontier = new
        out = layers[0]
        for layer in layers[1:]:
            out = out.unionByName(layer)
    return out
