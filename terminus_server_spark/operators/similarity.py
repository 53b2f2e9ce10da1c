"""Similarity search over embedding columns (SURVEY §2.6).

Cosine determinism convention (shared with the DuckDB oracles):
float32 inputs are cast element-wise to double; each pairwise product
is exact in double (24-bit mantissas); products are scaled by 1e12
and floored to BIGINT; bigint sums are order-independent.  cosine =
dot / sqrt(norm_a * norm_b) computed in double at the end — the same
bits on any engine, any partitioning.

Scale story: brute-force top-k is the correctness baseline (and is
already a broadcast-join, not a shuffle, when the query set is
small).  ``ivf_topk`` is the 100 TB path: k-means-lite centroids
(deterministic seeded sample), cells assigned by broadcast-join
argmin, search restricted to the query's ``n_probe`` nearest cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

from terminus_server_spark.checkpoint import plan_checkpoint

SCALE = 1e12


def _scaled_vec(vec_col: Column) -> Column:
    """array<float> -> array<double> (exact widening)."""
    return F.transform(vec_col, lambda x: x.cast("double"))


def scaled_parts(df: DataFrame, id_col: str, vec_col: str, suffix: str) -> DataFrame:
    """(id_{suffix}, vec_{suffix}, norm_{suffix}): id + double vector +
    floor-scaled self-dot (bigint)."""
    v = _scaled_vec(F.col(vec_col))
    norm = F.aggregate(
        v, F.lit(0).cast("bigint"), lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint")
    )
    return df.select(
        F.col(id_col).alias(f"id_{suffix}"),
        v.alias(f"vec_{suffix}"),
        norm.alias(f"norm_{suffix}"),
    )


def cosine_from_parts(a: str = "a", b: str = "b") -> Column:
    dot = F.aggregate(
        F.zip_with(F.col(f"vec_{a}"), F.col(f"vec_{b}"), lambda x, y: F.floor(x * y * SCALE)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    return dot.cast("double") / F.sqrt(
        F.col(f"norm_{a}").cast("double") * F.col(f"norm_{b}").cast("double")
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cos, rk): exact top-k by cosine for
    each query vector; ties broken by neighbor id.

    The query side is broadcast — the corpus is scanned once, no
    shuffle until the final per-query top-k (tiny)."""
    from pyspark.sql.window import Window

    qa = scaled_parts(queries, id_col, vec_col, "a")
    cb = scaled_parts(emb, id_col, vec_col, "b")
    scored = (
        broadcast(qa)
        .crossJoin(cb)
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("neighbor_id"),
            cosine_from_parts().alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def matryoshka_topk_audit(
    emb: DataFrame,
    queries: DataFrame,
    prefix_dim: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, n_hits, recall): Matryoshka-style prefix-dimension
    retrieval audit — rank by cosine over only the FIRST
    ``prefix_dim`` components (truncate + implicit renormalization:
    cosine divides by the truncated norms) and measure recall@k
    against the full-dimension exact top-k.  This is the standard
    MRL serving pattern: a d/4 prefix scan is ~4× cheaper per vector
    (and the prefix index fits where the full one doesn't); the
    audit quantifies what the truncation costs on YOUR corpus before
    you commit the serving index to it.  Two brute-force rankings +
    one semi-join; same fixed-point cosine convention as every ANN
    operator here, so the audit itself is oracle-reproducible."""
    def trunc(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, prefix_dim).alias(vec_col)
        )

    full = brute_force_topk(emb, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    pre = brute_force_topk(trunc(emb), trunc(queries), k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    hits = (
        pre.join(full, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = queries.select(F.col(id_col).alias("query_id")).distinct()
    return base.join(hits, "query_id", "left_outer").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / F.lit(float(k))).alias(
            "recall"
        ),
    )


COMP_SCALE = 1e6  # centroid-component fixed point (inputs are unit-ish)


def refine_centroids(cents: DataFrame, assigned: DataFrame, suffix: str = "b") -> DataFrame:
    """One seeded-k-means step: per-cell component-wise means of the
    assigned vectors, in *order-independent integer arithmetic* so the
    DuckDB oracle replays the refinement bit-for-bit (double means
    would depend on summation order).  component = floor(Σ floor(x·1e6)
    / n) / 1e6; the norm is recomputed from the refined components
    with the standard 1e12 convention.  Cells that attracted no
    vectors drop out (same semantics both engines).  Dataflow: one
    posexplode + (cell, pos) aggregate — identical shape to the
    per-label centroid operator, skew-proof, no new joins."""
    comps = (
        assigned.select("cell_id", F.posexplode(F.col(f"vec_{suffix}")).alias("pos", "x"))
        .groupBy("cell_id", "pos")
        .agg(
            (
                F.floor(
                    F.sum(F.floor(F.col("x") * COMP_SCALE).cast("bigint"))
                    / F.count(F.lit(1))
                )
                / F.lit(COMP_SCALE)
            ).alias("comp")
        )
    )
    vecs = comps.groupBy("cell_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "comp"))), lambda s: s["comp"]
        ).alias("vec_c")
    )
    norm = F.aggregate(
        F.col("vec_c"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint"),
    )
    return vecs.select("cell_id", "vec_c", norm.alias("norm_c"))


def _assign_cells(cents: DataFrame, side: DataFrame, suffix: str, n_keep: int) -> DataFrame:
    """Nearest-centroid assignment (cosine argmax, cell-id tie-break):
    broadcast the centroid table, score one scan of ``side``, keep the
    ``n_keep`` best cells per row.  Shared by the IVF index build and
    the Lloyd training loop (``kmeans_assignments``) — the same
    fixed-point cosine as ``cosine_from_parts`` so every consumer is
    oracle-replayable."""
    from pyspark.sql.window import Window

    scored = broadcast(cents).crossJoin(side).select(
        F.col(f"id_{suffix}"),
        F.col(f"vec_{suffix}"),
        F.col(f"norm_{suffix}"),
        "cell_id",
        (
            F.aggregate(
                F.zip_with(
                    F.col("vec_c"), F.col(f"vec_{suffix}"), lambda x, y: F.floor(x * y * SCALE)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x.cast("bigint"),
            ).cast("double")
            / F.sqrt(F.col("norm_c").cast("double") * F.col(f"norm_{suffix}").cast("double"))
        ).alias("cell_cos"),
    )
    w = Window.partitionBy(f"id_{suffix}").orderBy(
        F.col("cell_cos").desc(), F.col("cell_id").asc()
    )
    return (
        scored.withColumn("cell_rk", F.row_number().over(w))
        .where(F.col("cell_rk") <= n_keep)
        .drop("cell_rk", "cell_cos")
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): Lloyd's k-means as a first-class operator —
    deterministic seeds (lowest ``k`` ids), then ``iters`` rounds of
    cosine-argmax assignment + integer-mean recentering, emitting the
    final assignment.  This is the IVF index's training loop
    (``ivf_topk`` runs the same ``_assign_cells`` /
    ``refine_centroids`` pair) exposed directly, for callers that
    want the clustering itself: corpus bucketing for SemDeDup,
    exemplar mining, mixture analysis.

    Every step is the house fixed-point convention (floor-scaled
    bigint dots, integer-mean components on the 1e-6 grid), so the
    whole iterative trajectory — not just the last hop — is exactly
    replayed by the DuckDB oracle.  Per round: one broadcast-argmax
    scan of the corpus + one (cell, pos) aggregate; at 100 TB that is
    2·iters scans, no shuffle wider than k·dim rows."""
    cents = scaled_parts(
        emb.orderBy(id_col).limit(k), id_col, vec_col, "c"
    ).withColumnRenamed("id_c", "cell_id")
    corpus_parts = plan_checkpoint(scaled_parts(emb, id_col, vec_col, "b"))
    for _ in range(iters - 1):
        cents = refine_centroids(cents, _assign_cells(cents, corpus_parts, "b", 1))
    final = _assign_cells(cents, corpus_parts, "b", 1)
    return final.select(
        F.col("id_b").alias(id_col), F.col("cell_id").alias("cluster")
    )


def ivf_index(
    emb: DataFrame,
    n_cells: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned_corpus): the n_probe-independent half of
    ``ivf_topk`` — deterministic seed centroids refined by
    ``refine_iters`` k-means steps, plus the corpus assigned to its
    nearest cell.  Factored out so probe-count sweeps build the index
    once; ``ivf_topk(..., index=ivf_index(...))`` skips the
    refine_iters + 1 corpus scans it would otherwise repeat."""
    cents = scaled_parts(
        emb.orderBy(id_col).limit(n_cells), id_col, vec_col, "c"
    ).withColumnRenamed("id_c", "cell_id")
    corpus_parts = scaled_parts(emb, id_col, vec_col, "b")
    for _ in range(refine_iters):
        cents = refine_centroids(cents, _assign_cells(cents, corpus_parts, "b", 1))
    return cents, _assign_cells(cents, corpus_parts, "b", 1)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) cells.

    Centroids: deterministic seeds (lowest ``n_cells`` ids) refined by
    ``refine_iters`` seeded-k-means steps (assign → integer-mean
    recenter; the r1 verdict flagged raw seeds as a recall risk).
    Corpus rows are assigned to their nearest centroid (broadcast
    argmin — one scan per iteration); queries probe their ``n_probe``
    nearest cells, so search cost drops by ~n_cells/n_probe.

    ``index``: optional precomputed ``ivf_index`` result.  The index
    (centroids + corpus cell assignment) does not depend on
    ``n_probe``, so a tuning sweep that varies only the probe count
    should build it once and pass it to every setting instead of
    paying refine_iters + 1 full-corpus assignment scans per point.
    """
    from pyspark.sql.window import Window

    cents, corpus = index if index is not None else ivf_index(
        emb, n_cells, refine_iters, id_col, vec_col
    )
    probes = _assign_cells(cents, scaled_parts(queries, id_col, vec_col, "a"), "a", n_probe)
    scored = (
        probes.join(corpus, "cell_id")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("neighbor_id"),
            cosine_from_parts().alias("cos"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "tss") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived uniform in [-1, 1] — reproducible across runs and
    engines with no RNG state."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF)
            * 2.0
            - 1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _plane_component(p: int, idx: Column, seed: str = "tss") -> Column:
    """Expression form of one ``_hyperplanes`` component: the same
    md5-derived uniform in [-1, 1], computed JVM-side from the element
    index — so the signature needs no driver-side dim sniffing and the
    plan stays a per-row expression (zero shuffle, any vector width).
    ``conv(hex, 16, 10)`` yields an integer < 2^32 → exact in double;
    the division and affine map replay Python's float ops bit-for-bit.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:{p}:"), idx.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    return (h / F.lit(float(0xFFFFFFFF))) * F.lit(2.0) - F.lit(1.0)


def expr_lsh_signature(
    vec_col: Column, n_planes: int, seed: str = "tss", dim: int | None = None
) -> Column:
    """Sign-hash signature with expression-derived hyperplanes — the
    dim-agnostic form of ``lsh_signature``.  Bit p = (v · plane_p) > 0
    where the dot follows the module's fixed-point convention
    (per-element products floor-scaled to bigint, integer sum).
    Float folds are NOT engine-portable — DuckDB's list_reduce is a
    pairwise reduction, one ulp off a strict left fold, which can
    flip a bit whose dot sits within a ulp of zero; integer sums are
    order-free everywhere, making the signature provably identical
    across engines and partitionings."""
    if dim is not None:
        # fast path: the hyperplanes are row-independent constants, so
        # when the vector width is known at plan time, inline them as
        # literal arrays — no per-row md5/conv.  _hyperplanes computes
        # the identical doubles the expression path derives (and the
        # DuckDB oracles already inline), so signatures are unchanged.
        planes = _hyperplanes(dim, n_planes, seed)

        def plane_dot(p: int) -> Column:
            lit = F.array(*[F.lit(x) for x in planes[p]])
            prods = F.zip_with(
                vec_col, lit, lambda x, y: F.floor(x * y * F.lit(SCALE)).cast("bigint")
            )
            return F.aggregate(
                prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x
            )

    else:

        def plane_dot(p: int) -> Column:
            # close over p via a function scope: a `p=p` default param
            # would make pyspark count 3 lambda args and build an
            # invalid higher-order function (transform passes (x, i))
            prods = F.transform(
                vec_col,
                lambda x, i: F.floor(
                    x * _plane_component(p, i, seed) * F.lit(SCALE)
                ).cast("bigint"),
            )
            return F.aggregate(
                prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x
            )

    bits = [
        F.when(plane_dot(p) > 0, F.lit("1")).otherwise(F.lit("0")) for p in range(n_planes)
    ]
    return F.concat(*bits)


def pandas_lsh_signature(n_planes: int, dim: int, seed: str = "tss"):
    """Arrow-batched form of ``expr_lsh_signature``'s known-dim fast
    path: the identical fixed-point plane dots computed with blocked
    numpy instead of interpreted zip_with/aggregate lambdas (the
    per-row HOF interpreter is the slow path at any scale; the UDF is
    vectorized per Arrow batch).  Bit-for-bit identical signatures:
    ``floor((x · plane_pj) · 1e12)`` per element in f64 — every floored
    product is an integer < 2^41 and a 64-element sum < 2^47, so f64
    addition is exact and order-free, matching the JVM expression and
    the DuckDB oracle exactly (same argument as
    ``embedding_near_dup_pairs``).  Returns a callable column maker.
    """
    from terminus_server_spark.operators._arrow_udfs import make_lsh_signature_udf

    return make_lsh_signature_udf(_hyperplanes(dim, n_planes, seed), SCALE)


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-hash signature: bit p = (vec · plane_p) > 0.  Charikar's
    SimHash for cosine — collision probability 1 − θ/π per bit.
    Fixed-point dots (see expr_lsh_signature) keep the bits
    engine-portable."""
    bits = []
    for row in planes:
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(x) for x in row]),
                lambda a, b: F.floor(a * b * F.lit(SCALE)).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via banded random-hyperplane LSH — the
    alternative scale path to ``ivf_topk`` (no centroid training;
    better for corpora with no cluster structure).

    Signature bits split into bands; rows sharing ANY band become
    candidates (same band-bucket-join shape as MinHash dedup — never
    O(n²)); candidates are scored exactly and top-k'd.  Recall tunes
    with n_planes/n_bands exactly like MinHash banding.

    Hyperplanes are expression-derived (``expr_lsh_signature``): no
    driver-side dim sniffing, works for any vector width without a
    ``.first()`` round-trip.
    """
    from pyspark.sql.window import Window

    rows_per_band = n_planes // n_bands

    def banded(side: DataFrame, suffix: str) -> DataFrame:
        parts = scaled_parts(side, id_col, vec_col, suffix)
        if dim is not None:
            sig = pandas_lsh_signature(n_planes, dim)(F.col(f"vec_{suffix}"))
        else:
            sig = expr_lsh_signature(F.col(f"vec_{suffix}"), n_planes, dim=dim)
        withsig = parts.withColumn("sig", sig)
        # one explode instead of an n_bands-way union: the signature
        # evaluates once per row, not once per band
        return withsig.select(
            f"id_{suffix}",
            f"vec_{suffix}",
            f"norm_{suffix}",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.substring(
                                "sig", b * rows_per_band + 1, rows_per_band
                            ).alias("band_key"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bk"),
        ).select(
            f"id_{suffix}", f"vec_{suffix}", f"norm_{suffix}", "bk.band_id", "bk.band_key"
        )

    qa, cb = banded(queries, "a"), banded(emb, "b")
    cand = (
        broadcast(qa)
        .join(cb, ["band_id", "band_key"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b", "norm_a", "norm_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = cand.select(
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("neighbor_id"),
        cosine_from_parts().alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, n_vecs, centroid): per-label mean vector — the
    "training" half of IVF (cells from labels or from any partition
    assignment) and the building block for cluster quality stats.

    Dataflow: posexplode to (label, pos, val) rows, ONE aggregation
    keyed (label, pos) with map-side partial sums, then a bounded
    collect (one row per label, dim elements).  Fixed-point bigint
    sums keep the mean order-independent so the oracle hash-matches;
    shuffle volume is rows × dim, partitioned evenly by (label, pos)
    — no skew even when one label dominates."""
    exploded = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(_scaled_vec(F.col(vec_col))).alias("pos", "val"),
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        F.sum(F.floor(F.col("val") * F.lit(SCALE)).cast("bigint")).alias("si"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.select(
            "label",
            "pos",
            "n",
            ((F.col("si").cast("double") / F.lit(SCALE)) / F.col("n").cast("double")).alias("m"),
        )
        .groupBy("label")
        .agg(
            F.max("n").alias("n_vecs"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid"),
        )
    )


def l2_normalize(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, unit_vec, norm): exact-reproducible L2 normalization —
    the norm comes from the fixed-point self-dot (same as every
    cosine here: floor(x*x*1e12) bigint sums), the division is plain
    double math, so the unit vectors hash-match the SQL oracle.
    Normalize-then-dot turns cosine ANN into inner-product ANN (the
    form IVF/HNSW libraries want)."""
    v = _scaled_vec(F.col(vec_col))
    norm_expr = F.sqrt(
        F.aggregate(
            v, F.lit(0).cast("bigint"), lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint")
        ).cast("double")
        / F.lit(SCALE)
    )
    # materialize the norm BEFORE the per-element lambda reads it —
    # inlined, the whole aggregate would re-run once per element
    staged = emb.select(F.col(id_col), v.alias("_v"), norm_expr.alias("norm"))
    return staged.select(
        id_col,
        F.transform(F.col("_v"), lambda x: x / F.col("norm")).alias("unit_vec"),
        "norm",
    )


def label_exemplars(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, vec_id, cos, rank): the k vectors nearest their own
    cluster centroid — prototype/exemplar selection (the keep-side
    companion of SemDeDup: after near-dups are dropped, ship the
    most-central member per cluster as the class exemplar).

    Centroids come from ``label_centroids`` (fixed-point means, exact
    across engines); vector↔centroid cosine uses the same
    floor-scaled integer dot so ranking is bit-reproducible.  One
    broadcast join (centroid list is cluster-count-sized) + a
    label-partitioned ranking window."""
    from pyspark.sql.window import Window

    cents = label_centroids(emb, label_col, vec_col).select(
        "label", F.col("centroid").alias("cvec")
    )
    v = _scaled_vec(F.col(vec_col))
    joined = emb.select(
        F.col(id_col), F.col(label_col).alias("label"), v.alias("v")
    ).join(F.broadcast(cents), "label")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda x, y: F.floor(x * y * SCALE)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    vnorm = F.aggregate(
        F.col("v"), F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint"),
    )
    cnorm = F.aggregate(
        F.col("cvec"), F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint"),
    )
    cos = dot.cast("double") / F.sqrt(vnorm.cast("double") * cnorm.cast("double"))
    w = Window.partitionBy("label").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        joined.select("label", id_col, F.round(cos, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_classify(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, pred_label, votes): k-nearest-neighbor majority
    vote — the label-propagation primitive a curation pipeline uses
    to extend a small labeled seed set over an unlabeled corpus
    (auto-labeling / weak supervision).

    Built on ``brute_force_topk`` (broadcast queries, exact
    fixed-point cosine, deterministic id tie-break) so the vote —
    including tie resolution by smallest label — is bit-reproducible;
    swap in ``ivf_topk`` for the approximate 100 TB path, identical
    vote logic."""
    from pyspark.sql.window import Window

    nn = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nbr_label").asc()
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("query_id", F.col("nbr_label").alias("pred_label"), "votes")
        .orderBy("query_id")
    )


def hard_negatives(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, query_label, neighbor_id, neighbor_label, cos, rk):
    hard-negative mining for contrastive training — for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label (near the anchor in embedding space but semantically wrong,
    the pairs that actually move a contrastive loss).

    Same execution shape as brute_force_topk: the query side is
    broadcast, the corpus scanned once, the cross-label filter applied
    before ranking so same-label candidates never enter the per-query
    heap; cosine uses the module's fixed-point convention, so results
    are bit-reproducible at any partitioning.  At scale, compose with
    ivf_topk's cell restriction instead of the full corpus scan —
    mining only within the query's n_probe nearest cells."""
    from pyspark.sql.window import Window

    def parts(df: DataFrame, sfx: str) -> DataFrame:
        v = _scaled_vec(F.col(vec_col))
        norm = F.aggregate(
            v,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint"),
        )
        return df.select(
            F.col(id_col).alias(f"id_{sfx}"),
            v.alias(f"vec_{sfx}"),
            norm.alias(f"norm_{sfx}"),
            F.col(label_col).alias(f"label_{sfx}"),
        )

    scored = (
        broadcast(parts(queries, "a"))
        .crossJoin(parts(emb, "b"))
        .where(F.col("label_a") != F.col("label_b"))
        .select(
            F.col("id_a").alias("query_id"),
            F.col("label_a").alias("query_label"),
            F.col("id_b").alias("neighbor_id"),
            F.col("label_b").alias("neighbor_label"),
            cosine_from_parts().alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def random_projection(
    emb: DataFrame,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "proj",
    dim: int = 64,
) -> DataFrame:
    """(vec_id, j, y): Johnson-Lindenstrauss-style random projection
    of each embedding onto ``out_dim`` deterministic md5-derived
    directions (the same hyperplane family the sign-LSH uses, kept
    real-valued instead of thresholded) — the standard dimensionality
    cut before clustering / coarse ANN when 64-dim exact cosine is
    too wide.

    The plane matrix is a compile-time constant inlined into the
    plan (no broadcast, no driver state); each component follows the
    module's fixed-point dot convention — per-element products
    floor-scaled to bigint, summed as integers — because float folds
    are NOT portable across engines (DuckDB's list_reduce is a
    pairwise reduction, one ulp off a strict left fold); integer sums
    are order-free everywhere.  Map-only, zero shuffle."""
    planes = _hyperplanes(dim, out_dim, seed)
    v = _scaled_vec(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("vec_id"), v.alias("_v"))
    ys = [
        F.aggregate(
            F.zip_with(
                F.col("_v"),
                F.array(*[F.lit(x) for x in p]),
                lambda a, b: F.floor(a * b * F.lit(SCALE)).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(SCALE)
        for p in planes
    ]
    return base.select("vec_id", F.posexplode(F.array(*ys)).alias("j", "y"))


def pq_topk_audit(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rk_adc, in_exact): product-quantization
    ANN with asymmetric distance computation (ADC), audited against
    the exact cosine top-k — the memory-side scale path: each corpus
    vector compresses to ``n_sub`` small codes (here 8 bytes instead
    of 256), queries scan codes + a tiny per-query lookup table
    instead of raw vectors (Jégou et al., PQ for nearest neighbor
    search).

    Everything is deterministic and oracle-replayable: the codebook
    is the subvectors of the ``n_codes`` md5-rank-selected seed
    vectors (no RNG k-means; IVF's refinement can be layered on);
    encode = argmin of fixed-point squared distances (bigint sums,
    ties to the lowest code); ADC = integer sum of per-subspace
    lookup distances.  The corpus side touches only (vec_id, m,
    code) rows and the broadcast codebook — at 100 TB the raw
    vectors are read ONCE at encode time, never per query.
    ``in_exact`` marks ADC neighbors that appear in the exact top-k
    (the per-query recall audit)."""
    from pyspark.sql.window import Window

    sub = dim // n_sub
    v = _scaled_vec(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("vec_id"), v.alias("_v"))
    seeds = (
        base.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_codes)
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy("_h", "vec_id")) - 1,
        )
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(n_sub)])).alias("m")
    codebook = F.broadcast(
        seeds.select("code", "_v").select(
            "code", ms, F.col("_v").alias("_sv")
        ).select(
            "m", "code",
            F.slice(F.col("_sv"), F.col("m") * sub + 1, sub).alias("cw"),
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("cw"),
            lambda a, b: F.floor((a - b) * (a - b) * F.lit(SCALE)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    subvecs = base.select(
        "vec_id", ms, F.col("_v").alias("_fv")
    ).select("vec_id", "m", F.slice(F.col("_fv"), F.col("m") * sub + 1, sub).alias("sv"))
    codes = (
        subvecs.join(codebook, "m")
        .select("vec_id", "m", "code", d2.alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "code")).alias("_best"))
        .select("vec_id", "m", F.col("_best.code").alias("code"))
    )
    qsub = (
        queries.select(F.col(id_col).alias("query_id"), v.alias("_v"))
        .select("query_id", ms, F.col("_v").alias("_fv"))
        .select(
            "query_id", "m",
            F.slice(F.col("_fv"), F.col("m") * sub + 1, sub).alias("sv"),
        )
    )
    lut = F.broadcast(
        qsub.join(codebook, "m").select("query_id", "m", "code", d2.alias("d2"))
    )
    adc = (
        codes.join(lut, ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    approx = (
        adc.withColumn("rk_adc", F.row_number().over(w))
        .where(F.col("rk_adc") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rk_adc")
    )
    exact = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id", F.lit(1).alias("_ex")
    )
    return (
        approx.join(exact, ["query_id", "neighbor_id"], "left_outer")
        .select(
            "query_id",
            "neighbor_id",
            "rk_adc",
            F.col("_ex").isNotNull().alias("in_exact"),
        )
        .orderBy("query_id", "rk_adc")
    )


def binary_quant_topk_audit(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cand: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, ham, cos, rk, in_exact): 1-bit binary
    quantization retrieval with exact-cosine rerank, audited against
    the exact top-k — the modern memory-side serving shape (binary
    quantization + rescoring): each corpus vector compresses to
    dim/32 packed sign words (64 dims → two bigint words, 8 bytes vs
    256), the candidate scan is XOR + popcount over CODES only, and
    raw vectors are touched only to rerank the ``n_cand`` Hamming
    survivors.  At 100 TB the code table is ~3 % of the raw vectors
    and scans at memory bandwidth; recall lost to the 1-bit cut is
    exactly what ``in_exact`` reports per neighbor.

    Sign packing is an order-free integer sum of distinct powers of
    two over 32-bit halves (never the sign bit of a bigint), and
    popcounts are integer-exact — the whole pipeline replays
    bit-identically in the SQL oracle."""
    from pyspark.sql.window import Window

    n_words = dim // 32

    def words(df: DataFrame, sfx: str) -> DataFrame:
        v = _scaled_vec(F.col(vec_col))

        def packer(lo: int):
            # closure factory: F.aggregate's merge lambda must take
            # exactly (acc, x) — a default arg would read as arity 3
            return lambda acc, i: acc + F.when(
                F.element_at(v, i + F.lit(lo + 1)) > 0,
                F.pow(F.lit(2.0), i).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))

        cols = [F.col(id_col).alias(f"id_{sfx}")]
        for w_i in range(n_words):
            cols.append(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(31)),
                    F.lit(0).cast("bigint"),
                    packer(w_i * 32),
                ).alias(f"w{w_i}_{sfx}")
            )
        return df.select(*cols)

    qw = words(queries, "q")
    cw = words(emb, "c")
    from functools import reduce

    ham = reduce(
        lambda a, b: a + b,
        [
            F.bit_count(F.col(f"w{i}_q").bitwiseXOR(F.col(f"w{i}_c")))
            for i in range(n_words)
        ],
    ).cast("int")
    cand = (
        broadcast(qw)
        .crossJoin(cw)
        .where(F.col("id_q") != F.col("id_c"))
        .select(
            F.col("id_q").alias("query_id"),
            F.col("id_c").alias("neighbor_id"),
            ham.alias("ham"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy(
        F.col("ham").asc(), F.col("neighbor_id").asc()
    )
    kept = cand.withColumn("_rkh", F.row_number().over(wh)).where(
        F.col("_rkh") <= n_cand
    )
    qa = scaled_parts(queries, id_col, vec_col, "a")
    cb = scaled_parts(emb, id_col, vec_col, "b")
    rer = (
        kept.join(broadcast(qa), kept["query_id"] == qa["id_a"])
        .join(cb, kept["neighbor_id"] == cb["id_b"])
        .select("query_id", "neighbor_id", "ham", cosine_from_parts().alias("cos"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    approx = rer.withColumn("rk", F.row_number().over(wc)).where(F.col("rk") <= k)
    exact = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id", F.lit(1).alias("_ex")
    )
    return (
        approx.join(exact, ["query_id", "neighbor_id"], "left_outer")
        .select(
            "query_id",
            "neighbor_id",
            "ham",
            "cos",
            "rk",
            F.col("_ex").isNotNull().alias("in_exact"),
        )
        .orderBy("query_id", "rk")
    )


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(src_id, tgt_id, cos, margin): margin-based parallel-pair
    mining between two embedding sets (Artetxe & Schwenk's ratio
    margin — the CCMatrix/LASER bitext-mining criterion): each source
    keeps its best target scored not by raw cosine but by cosine
    DIVIDED by the mean of both sides' k-NN cosines, which cancels
    hubness (a target that is everyone's neighbor stops winning every
    pair).  One row per source: the argmax-margin target.

    All margin arithmetic is integer-derived: cosines floor-scale to
    1e12 fixed point before the k-NN sums, so the score — and
    therefore the mined pair set — is bit-identical on any engine or
    partitioning.  The fixture-scale form scores all |A|×|B| pairs
    (the verify primitive); at 100 TB candidates come from the
    LSH/IVF machinery in this module and the margin criterion scores
    survivors only."""
    from pyspark.sql.window import Window

    a = scaled_parts(src, id_col, vec_col, "a")
    b = scaled_parts(tgt, id_col, vec_col, "b")
    scored = (
        broadcast(a)
        .crossJoin(b)
        .select(
            F.col("id_a").alias("src_id"),
            F.col("id_b").alias("tgt_id"),
            cosine_from_parts().alias("cos"),
        )
        .withColumn("ci", F.floor(F.col("cos") * F.lit(SCALE)).cast("bigint"))
    )
    scored = plan_checkpoint(scored)
    wa = Window.partitionBy("src_id").orderBy(F.col("cos").desc(), F.col("tgt_id").asc())
    na = (
        scored.withColumn("_rk", F.row_number().over(wa))
        .where(F.col("_rk") <= k)
        .groupBy("src_id")
        .agg(F.sum("ci").alias("_sa"))
    )
    wb = Window.partitionBy("tgt_id").orderBy(F.col("cos").desc(), F.col("src_id").asc())
    nb = (
        scored.withColumn("_rk", F.row_number().over(wb))
        .where(F.col("_rk") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("ci").alias("_sb"))
    )
    margin = (F.col("ci").cast("double") / F.lit(SCALE)) / (
        (F.col("_sa") + F.col("_sb")).cast("double") / F.lit(2.0 * k * SCALE)
    )
    wm = Window.partitionBy("src_id").orderBy(F.col("margin").desc(), F.col("tgt_id").asc())
    return (
        scored.join(na, "src_id")
        .join(nb, "tgt_id")
        .withColumn("margin", F.round(margin, 6))
        .withColumn("_rk", F.row_number().over(wm))
        .where(F.col("_rk") == 1)
        .select("src_id", "tgt_id", F.round("cos", 6).alias("cos"), "margin")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 4,
    n_probe: int = 2,
    n_sub: int = 8,
    n_codes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rk): IVF-PQ — the composition that
    serves billion-vector ANN in practice (FAISS's IVFx,PQy): the
    inverted file prunes the corpus to the query's ``n_probe``
    nearest cells, and within them distance is ADC over PQ codes, so
    the hot loop touches (cell, code) integers only; raw vectors are
    read once at index-build time.

    Deterministic end-to-end: lowest-id seed centroids with
    fixed-point cosine assignment (ivf_topk's convention,
    unrefined so the oracle stays closed-form), md5-rank PQ seeds,
    bigint ADC with lowest-id tie-breaks — the full approximate
    result is bit-reproducible, not just auditable."""
    from pyspark.sql.window import Window

    sub = dim // n_sub
    corpus_parts = scaled_parts(emb, id_col, vec_col, "b")
    cents = scaled_parts(
        emb.orderBy(id_col).limit(n_cells), id_col, vec_col, "c"
    ).withColumnRenamed("id_c", "cell_id")

    def assign(side: DataFrame, suffix: str, n_keep: int) -> DataFrame:
        scored = broadcast(cents).crossJoin(side).select(
            F.col(f"id_{suffix}"),
            "cell_id",
            (
                F.aggregate(
                    F.zip_with(
                        F.col("vec_c"),
                        F.col(f"vec_{suffix}"),
                        lambda x, y: F.floor(x * y * SCALE),
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x.cast("bigint"),
                ).cast("double")
                / F.sqrt(
                    F.col("norm_c").cast("double")
                    * F.col(f"norm_{suffix}").cast("double")
                )
            ).alias("cell_cos"),
        )
        w = Window.partitionBy(f"id_{suffix}").orderBy(
            F.col("cell_cos").desc(), F.col("cell_id").asc()
        )
        return (
            scored.withColumn("cell_rk", F.row_number().over(w))
            .where(F.col("cell_rk") <= n_keep)
            .select(f"id_{suffix}", "cell_id")
        )

    corpus_cells = assign(corpus_parts, "b", 1).withColumnRenamed("id_b", "vec_id")
    probe_cells = assign(
        scaled_parts(queries, id_col, vec_col, "a"), "a", n_probe
    ).withColumnRenamed("id_a", "query_id")

    # PQ codebook + encode (pq_topk_audit's construction)
    v = _scaled_vec(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("vec_id"), v.alias("_v"))
    seeds = (
        base.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_codes)
        .withColumn(
            "code", F.row_number().over(Window.orderBy("_h", "vec_id")) - 1
        )
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(n_sub)])).alias("m")
    codebook = F.broadcast(
        seeds.select("code", "_v")
        .select("code", ms, F.col("_v").alias("_sv"))
        .select(
            "m", "code", F.slice(F.col("_sv"), F.col("m") * sub + 1, sub).alias("cw")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"),
            F.col("cw"),
            lambda a, b: F.floor((a - b) * (a - b) * F.lit(SCALE)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    subvecs = base.select("vec_id", ms, F.col("_v").alias("_fv")).select(
        "vec_id", "m", F.slice(F.col("_fv"), F.col("m") * sub + 1, sub).alias("sv")
    )
    encd = subvecs.join(codebook, "m").select("vec_id", "m", "code", d2.alias("d2"))
    enc = (
        encd.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "code")).alias("_best"))
        .select("vec_id", "m", F.col("_best.code").alias("code"))
    )
    # LUT from the queries' OWN subvectors vs the broadcast codebook
    # (pq_topk_audit's construction) — not from corpus-side encd, so
    # queries need not be a subset of the corpus and an id collision
    # with a different corpus vector cannot poison the distances.
    qsub = (
        queries.select(F.col(id_col).alias("query_id"), v.alias("_qv"))
        .select("query_id", ms, F.col("_qv").alias("_fv"))
        .select(
            "query_id", "m",
            F.slice(F.col("_fv"), F.col("m") * sub + 1, sub).alias("sv"),
        )
    )
    lut = F.broadcast(
        qsub.join(codebook, "m").select("query_id", "m", "code", d2.alias("d2"))
    )
    cand = (
        probe_cells.join(corpus_cells, "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    adc = (
        cand.join(enc, "vec_id")
        .join(lut, ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rk")
        .orderBy("query_id", "rk")
    )


def top_component(
    emb: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(pos, loading): the corpus's dominant embedding direction —
    power iteration on the uncentered second-moment matrix C = Σ x·xᵀ,
    started from the first basis vector.  This is the vector the
    "all-but-the-top" embedding post-process (Mu & Viswanath 2018)
    removes, and the drift axis a monitoring pipeline tracks; at 100 TB
    it is the cheapest spectral statistic that exists: per iteration
    one scan computes every s_x = x·v map-side and one (pos)-grouped
    sum re-forms C·v — no matrix is ever materialized.

    Exactness discipline (oracle-replayable): s_x is the usual
    1e12-floored bigint dot; C·v components sum floor(x_i·s_x/1e6) in
    bigint (order-free); the normalization squares in decimal(38,0)
    (w_i² up to ~2.6e20 exceeds bigint) and takes one double sqrt +
    one division per component — deterministic IEEE ops both engines
    share."""
    from pyspark.sql.window import Window  # noqa: F401  (parity with siblings)

    v = _scaled_vec(F.col(vec_col))
    exploded = plan_checkpoint(
        emb.select(F.col(id_col).alias("vec_id"), F.posexplode(v).alias("pos", "x"))
    )
    dim_df = exploded.select("pos").distinct()
    # v0 = e_1 (deterministic start; any vector with a component along
    # the top eigenvector works, and basis-1 is oracle-trivial)
    vcur = dim_df.select("pos", F.when(F.col("pos") == 0, 1.0).otherwise(0.0).alias("c"))
    for _ in range(iters):
        s = (
            exploded.join(F.broadcast(vcur), "pos")
            .groupBy("vec_id")
            .agg(
                F.sum(F.floor(F.col("x") * F.col("c") * F.lit(SCALE)).cast("bigint"))
                .alias("s")
            )
        )
        w = (
            exploded.join(s, "vec_id")
            .groupBy("pos")
            .agg(
                F.sum(
                    F.floor(
                        F.col("x") * F.col("s").cast("double") / F.lit(1e6)
                    ).cast("bigint")
                ).alias("wi")
            )
        )
        norm2 = w.agg(
            F.sum(
                F.col("wi").cast("decimal(19,0)") * F.col("wi").cast("decimal(19,0)")
            ).alias("n2")
        )
        vcur = (
            w.crossJoin(F.broadcast(norm2))
            .select(
                "pos",
                (
                    F.col("wi").cast("double")
                    / F.sqrt(F.col("n2").cast("double"))
                ).alias("c"),
            )
        )
        vcur = plan_checkpoint(vcur)
    return vcur.select(F.col("pos").cast("int").alias("pos"), F.col("c").alias("loading"))


def remove_top_component(
    emb: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, projection, norm2_before, norm2_after): the
    "all-but-the-top" post-process (Mu & Viswanath 2018) as an audit
    row per vector — project out the corpus's dominant direction
    (:func:`top_component`) and report how much squared norm it
    carried.  Embeddings whose norm collapses after removal are
    "common-direction" vectors (frequency artifacts); the projection
    column is the ABTT correction a serving pipeline would subtract.

    Arithmetic: the projection p = x·v uses the 1e12-floored bigint
    dot (exact); residual components x_i − p·v_i are the shared
    same-IEEE-op double convention; both norms are floor-scaled
    bigint sums (order-free).  Two scans + one broadcast of the
    64-row direction — map-only at any scale."""
    v = top_component(emb, iters=iters, id_col=id_col, vec_col=vec_col)
    exploded = plan_checkpoint(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.posexplode(_scaled_vec(F.col(vec_col))).alias("pos", "x"),
        )
    )
    j = exploded.join(broadcast(v), "pos")
    per = j.groupBy("vec_id").agg(
        F.sum(F.floor(F.col("x") * F.col("x") * F.lit(SCALE)).cast("bigint")).alias(
            "norm2_before_i"
        ),
        F.sum(
            F.floor(F.col("x") * F.col("loading") * F.lit(SCALE)).cast("bigint")
        ).alias("s"),
    )
    j2 = j.join(per.select("vec_id", "s"), "vec_id").select(
        "vec_id",
        (
            F.col("x") - (F.col("s").cast("double") / F.lit(SCALE)) * F.col("loading")
        ).alias("r"),
    )
    after = j2.groupBy("vec_id").agg(
        F.sum(F.floor(F.col("r") * F.col("r") * F.lit(SCALE)).cast("bigint")).alias(
            "norm2_after_i"
        )
    )
    return (
        per.join(after, "vec_id")
        .select(
            "vec_id",
            (F.col("s").cast("double") / F.lit(SCALE)).alias("projection"),
            (F.col("norm2_before_i").cast("double") / F.lit(SCALE)).alias(
                "norm2_before"
            ),
            (F.col("norm2_after_i").cast("double") / F.lit(SCALE)).alias(
                "norm2_after"
            ),
        )
    )


def ivfpq_residual_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 4,
    n_probe: int = 2,
    n_sub: int = 8,
    n_codes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rk): IVF-PQ over RESIDUALS — the
    refinement FAISS's IVFx,PQy actually ships: PQ codes quantize
    x − c(x) (the vector minus its cell centroid) instead of x, so
    the codebook spends its precision on the within-cell distribution
    rather than re-encoding the cell's global position; at equal code
    budget residual ADC is strictly tighter (Jégou et al. 2011 §IV).

    Consequences for the dataflow vs :func:`ivfpq_topk`: the encoding
    is unchanged in shape (one min-d2 per (vector, subspace)), but
    the query LUT becomes per (query, PROBED CELL) — the query's
    residual differs per cell — so the LUT has n_probe× the rows and
    ADC joins on (query, cell, m, code).  Still broadcast-sized:
    |queries|·n_probe·n_sub·n_codes rows of integers.

    Determinism: residual components are double subtractions — the
    identical IEEE op on both engines (same convention as the d2
    codeword distances) — then the usual floor-scaled bigint sums;
    lowest-id/md5-rank tie-breaks; the oracle replays the full
    residual index bit-for-bit."""
    from pyspark.sql.window import Window

    sub = dim // n_sub
    corpus_parts = scaled_parts(emb, id_col, vec_col, "b")
    cents = scaled_parts(
        emb.orderBy(id_col).limit(n_cells), id_col, vec_col, "c"
    ).withColumnRenamed("id_c", "cell_id")

    corpus_cells = _assign_cells(cents, corpus_parts, "b", 1).select(
        F.col("id_b").alias("vec_id"), "cell_id"
    )
    probe_cells = _assign_cells(
        cents, scaled_parts(queries, id_col, vec_col, "a"), "a", n_probe
    ).select(F.col("id_a").alias("query_id"), "cell_id")

    cent_vecs = broadcast(cents.select("cell_id", F.col("vec_c").alias("_cv")))
    v = _scaled_vec(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("vec_id"), v.alias("_v"))
    # corpus residuals: r = x - centroid(cell(x))
    resid = (
        base.join(corpus_cells, "vec_id")
        .join(cent_vecs, "cell_id")
        .select(
            "vec_id",
            "cell_id",
            F.zip_with(F.col("_v"), F.col("_cv"), lambda x, c: x - c).alias("_r"),
        )
    )
    # PQ seeds: md5-ranked ids, codewords = the seeds' RESIDUAL subvectors
    seeds = (
        resid.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(n_codes)
        .withColumn(
            "code", F.row_number().over(Window.orderBy("_h", "vec_id")) - 1
        )
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(n_sub)])).alias("m")
    codebook = F.broadcast(
        seeds.select("code", "_r")
        .select("code", ms, F.col("_r").alias("_sr"))
        .select(
            "m", "code", F.slice(F.col("_sr"), F.col("m") * sub + 1, sub).alias("cw")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"),
            F.col("cw"),
            lambda a, b: F.floor((a - b) * (a - b) * F.lit(SCALE)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    subvecs = resid.select("vec_id", ms, F.col("_r").alias("_fr")).select(
        "vec_id", "m", F.slice(F.col("_fr"), F.col("m") * sub + 1, sub).alias("sv")
    )
    encd = subvecs.join(codebook, "m").select("vec_id", "m", "code", d2.alias("d2"))
    enc = (
        encd.groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "code")).alias("_best"))
        .select("vec_id", "m", F.col("_best.code").alias("code"))
    )
    # query LUT: one residual PER PROBED CELL (q - that cell's centroid)
    qresid = (
        queries.select(F.col(id_col).alias("query_id"), v.alias("_qv"))
        .join(probe_cells, "query_id")
        .join(cent_vecs, "cell_id")
        .select(
            "query_id",
            "cell_id",
            F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, c: x - c).alias("_qr"),
        )
    )
    qsub = qresid.select("query_id", "cell_id", ms, F.col("_qr").alias("_fr")).select(
        "query_id",
        "cell_id",
        "m",
        F.slice(F.col("_fr"), F.col("m") * sub + 1, sub).alias("sv"),
    )
    lut = F.broadcast(
        qsub.join(codebook, "m").select("query_id", "cell_id", "m", "code", d2.alias("d2"))
    )
    cand = (
        probe_cells.join(corpus_cells, "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "cell_id", "vec_id")
        .distinct()
    )
    adc = (
        cand.join(enc, "vec_id")
        .join(lut, ["query_id", "cell_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").cast("bigint").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rk")
        .orderBy("query_id", "rk")
    )


def mmr_rerank(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, pos, mmr_score): Maximal Marginal
    Relevance re-ranking (Carbonell & Goldstein 1998 — the
    diversity-aware top-k every RAG retriever runs after ANN):
    starting from the exact top-``n_candidates`` relevance pool,
    greedily pick argmax λ·rel(q,c) − (1−λ)·max_{s∈selected}
    sim(c,s) — relevance traded against redundancy with what's
    already picked.

    Fully deterministic (fixed-point cosines, neighbor-id
    tie-breaks), so the whole greedy trajectory is replayed by the
    SQL oracle.  Dataflow: the candidate pool and its per-query
    pairwise sim table materialize ONCE (pool² per query, bounded by
    n_candidates²); each of the k rounds is one join + one per-query
    argmax over ALL queries in parallel — never a per-query loop."""
    from pyspark.sql.window import Window

    from terminus_server_spark.checkpoint import plan_checkpoint

    cand = plan_checkpoint(
        brute_force_topk(emb, queries, n_candidates, id_col, vec_col).select(
            "query_id", "neighbor_id", F.col("cos").alias("rel")
        )
    )
    ca = cand.select(
        "query_id", F.col("neighbor_id").alias("id_x")
    )
    parts = plan_checkpoint(scaled_parts(emb, id_col, vec_col, "a"))
    pb = parts.select(
        F.col("id_a").alias("id_b"), F.col("vec_a").alias("vec_b"), F.col("norm_a").alias("norm_b")
    )
    pairs = (
        ca.join(ca.withColumnRenamed("id_x", "id_y"), "query_id")
        .where(F.col("id_x") != F.col("id_y"))
        .join(parts.withColumnRenamed("id_a", "id_x"), "id_x")
        .join(pb.withColumnRenamed("id_b", "id_y"), "id_y")
        .select(
            "query_id",
            "id_x",
            "id_y",
            cosine_from_parts("a", "b").alias("sim"),
        )
    )
    pairsim = plan_checkpoint(pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    first = (
        cand.withColumn("_score", F.col("rel"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("query_id", "neighbor_id", F.lit(1).alias("pos"),
                F.round("_score", 6).alias("mmr_score"))
    )
    selected = plan_checkpoint(first)
    remaining = plan_checkpoint(cand.join(
        selected.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
    ))
    for pos in range(2, k + 1):
        maxsim = (
            remaining.join(
                pairsim.withColumnRenamed("id_x", "neighbor_id"), ["query_id", "neighbor_id"]
            )
            .join(
                selected.select("query_id", F.col("neighbor_id").alias("id_y")),
                ["query_id", "id_y"],
                "left_semi",
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("sim").alias("_ms"))
        )
        scored = remaining.join(maxsim, ["query_id", "neighbor_id"], "left_outer").select(
            "query_id",
            "neighbor_id",
            "rel",
            (
                F.lit(lam) * F.col("rel")
                - F.lit(1 - lam) * F.coalesce("_ms", F.lit(0.0))
            ).alias("_score"),
        )
        pick = (
            scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("query_id", "neighbor_id", F.lit(pos).alias("pos"),
                    F.round("_score", 6).alias("mmr_score"))
        )
        pick = plan_checkpoint(pick)
        selected = plan_checkpoint(selected.unionByName(pick))
        remaining = plan_checkpoint(
            remaining.join(
                pick.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
            )
        )
    return selected


def nn_descent_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_bands: int = 3,
    max_bucket: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(node_id, neighbor_id, cos, rk): approximate k-NN GRAPH over
    the whole corpus by one NN-DESCENT refinement round (Dong, Moses
    & Li, "Efficient k-nearest neighbor graph construction for
    generic similarity measures", WWW 2011 — the construction behind
    the HNSW/NN-descent index family): seed each node's neighbor
    list from banded sign-LSH buckets, then improve it with the
    algorithm's local rule — "my neighbor's neighbors are probably
    my neighbors" — rescoring each node against its FORWARD
    neighbors, its REVERSE neighbors, and its neighbors-of-neighbors
    and keeping the exact-cosine top-k.

    The scale contract is the point: candidates are never all-pairs.
    Init pairs ride the band buckets with a DETERMINISTIC per-bucket
    cap (the ``max_bucket`` lexicographically-smallest ids — a hot
    bucket degrades init quality instead of exploding deg²; the
    refine round is what restores recall).  The round's candidate
    set is ≤ k (forward) + k (reverse expected) + k² (NoN) per node
    — LINEAR in the corpus with a constant factor, the same shape at
    500 rows and 100 TB.  Exact fixed-point cosine everywhere, ties
    by neighbor id, so the whole graph (not just a recall number) is
    engine-reproducible.  A node whose buckets gave it no candidate
    stays absent — honest init sparsity, visible to the caller."""
    from pyspark.sql.window import Window

    rows_per_band = n_planes // n_bands
    pa = scaled_parts(emb, id_col, vec_col, "a")
    pb = scaled_parts(emb, id_col, vec_col, "b")
    if dim is not None:
        sig = pandas_lsh_signature(n_planes, dim)(F.col("vec_b"))
    else:
        sig = expr_lsh_signature(F.col("vec_b"), n_planes, dim=dim)
    banded = pb.withColumn("sig", sig).select(
        "id_b",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring(
                            "sig", b * rows_per_band + 1, rows_per_band
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id_b", "bk.band_id", "bk.band_key")
    wb = Window.partitionBy("band_id", "band_key").orderBy("id_b")
    capped = (
        banded.withColumn("_r", F.row_number().over(wb))
        .where(F.col("_r") <= max_bucket)
        .drop("_r")
    )
    pairs0 = (
        capped.select(
            F.col("id_b").alias("node_id"), "band_id", "band_key"
        )
        .join(capped, ["band_id", "band_key"])
        .where(F.col("node_id") != F.col("id_b"))
        .select("node_id", F.col("id_b").alias("neighbor_id"))
        .distinct()
    )

    def topk(cands: DataFrame) -> DataFrame:
        scored = (
            cands.join(
                pa.select(F.col("id_a").alias("node_id"), "vec_a", "norm_a"),
                "node_id",
            )
            .join(
                pb.select(
                    F.col("id_b").alias("neighbor_id"), "vec_b", "norm_b"
                ),
                "neighbor_id",
            )
            .select("node_id", "neighbor_id", cosine_from_parts().alias("cos"))
        )
        w = Window.partitionBy("node_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        return scored.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= k
        )

    g0 = plan_checkpoint(topk(pairs0).select("node_id", "neighbor_id"))
    rev = g0.select(
        F.col("neighbor_id").alias("node_id"),
        F.col("node_id").alias("neighbor_id"),
    )
    non = (
        g0.alias("x")
        .join(
            g0.alias("y"),
            F.col("x.neighbor_id") == F.col("y.node_id"),
        )
        .select(
            F.col("x.node_id").alias("node_id"),
            F.col("y.neighbor_id").alias("neighbor_id"),
        )
    )
    cands1 = (
        g0.unionByName(rev)
        .unionByName(non)
        .where(F.col("node_id") != F.col("neighbor_id"))
        .distinct()
    )
    return topk(cands1).orderBy("node_id", "rk")
