"""Deduplication operators for training-data pipelines (SURVEY §2.6).

Every candidate-generation path is bucket-join shaped (never O(n²)
over the corpus): exact/prefix dedup group by hash; MinHash-LSH
groups by band key; SimHash groups by signature.  Only the *verify*
step (n-gram Jaccard) touches pairs, and it only sees candidates.

Hash-function choice: md5 — the one hash both Spark and DuckDB
implement identically, so the correctness oracle can reproduce
signatures bit-for-bit.  MinHash takes the lexicographic min of
seeded md5 hex strings: fixed-width hex min == numeric min, no
int-parsing needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from terminus_server_spark.checkpoint import plan_checkpoint
from terminus_server_spark.operators.text import tokens_col

N_MINHASH = 8
N_BANDS = 4  # rows per band = N_MINHASH // N_BANDS = 2


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_hash, n_docs, keep_doc_id): duplicate groups by
    normalized content hash; keep_doc_id = min id (the survivor a
    dedup pass would keep).  One shuffle on the hash."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        docs.select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct k-token shingles per doc.

    Tokenization is materialized as a column before the slice lambda
    reads it — an inlined split expression would re-tokenize the text
    at every shingle position (quadratic in doc length)."""
    return shingles_multiset(docs, text_col, k).distinct()


def shingles_multiset(docs: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """``shingles`` without the dedup shuffle: repeated shingles keep
    their multiplicity.  For consumers whose aggregation is
    duplicate-idempotent — MinHash's per-doc ``min`` sees the same
    minimum over the multiset as over the set — this removes a full
    exchange+hash-aggregate of the shingle corpus (at 100 TB the
    distinct is the single biggest shuffle of the signature path);
    set-semantics consumers (Jaccard counts) use ``shingles``."""
    tokenized = docs.select("doc_id", tokens_col(F.lower(F.col(text_col))).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return tokenized.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_signatures(sh: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}): per-doc MinHash signature.

    h_i(s) = md5(i || ':' || s); signature_i = min over shingles.
    One aggregation, map-side partial min — linear in shingle count.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


MAX_LSH_BUCKET = 64


def lsh_candidate_pairs(
    sig: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b): candidate near-dup pairs — docs sharing at
    least one LSH band.  Band key = concat of the band's signature
    rows; docs group by (band_id, band_key); pairs generated within
    buckets only.

    Hot-bucket cap (the 100 TB guard): on a web corpus, boilerplate
    gives thousands-to-millions of docs the SAME band key, and an
    uncapped within-bucket self-join emits m² pairs — 10¹⁰⁺ rows from
    one template family; AQE skew-join fixes the shuffle, not the
    output size.  Buckets with ≤ ``max_bucket`` members pair
    all-vs-all as usual; a bucket over the cap is a *template
    cluster* — its members collide on the full band, i.e. they are
    near-duplicates of each other by construction — so it emits a
    STAR to the bucket's min doc_id (m-1 pairs, not m²/2).
    Connectivity for downstream clustering is preserved (the star
    spans the same component) and output is linear in bucket size.
    The extra cost is one groupBy on the band key the join already
    shuffles on, plus a broadcast-able bucket-size table.
    """
    rows_per_band = n_hashes // n_bands
    # one explode instead of an n_bands-way union: a union would
    # duplicate the whole signature-aggregation subtree n_bands times
    # in the plan (n_bands scans + shuffles of the shingle frame);
    # exploding a literal band array evaluates the signature once
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"sig_{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.band_key").transform(plan_checkpoint)
    sizes = banded.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("_m"), F.min("doc_id").alias("_anchor")
    )
    withsz = banded.join(sizes, ["band_id", "band_key"])
    incap = withsz.where(F.col("_m") <= max_bucket)
    a = incap.alias("a")
    b = incap.alias("b")
    allpairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    star = withsz.where(
        (F.col("_m") > max_bucket) & (F.col("doc_id") > F.col("_anchor"))
    ).select(F.col("_anchor").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return allpairs.unionByName(star).distinct()


def ngram_jaccard_pairs(
    sh: DataFrame, candidates: DataFrame | None = None, threshold: float = 0.0
) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_union, jaccard): n-gram Jaccard for
    candidate pairs (or all co-shingled pairs when candidates=None —
    still bucket-join shaped: pairs only form where a shingle is
    shared).  jaccard = |A∩B| / |A∪B| — exact integer counts, double
    division at the end (bit-stable for the oracle)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "inner")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    if threshold > 0.0:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def simhash(docs: DataFrame, text_col: str = "text", n_bits: int = 16) -> DataFrame:
    """(doc_id, simhash): n_bits-wide SimHash over tokens.

    Bit j of a token's md5 (high bit of hex nibble j) votes ±1;
    signature bit = majority (votes > 0 → '1').  One explode to the
    token stream, then ONE groupBy(doc_id) carrying n_bits small-int
    partial sums — every vote column is a codegen'd when/sum, the
    shuffle is doc-grain (not doc×bit: 16× fewer shuffle rows than
    the naive bit-position explode), and the signature is a straight
    concat of the vote signs, no collect_list."""
    hi = ("8", "9", "a", "b", "c", "d", "e", "f")
    toks = F.explode(tokens_col(F.lower(F.col(text_col)))).alias("token")
    tok_df = docs.select("doc_id", toks).withColumn("h", F.md5(F.col("token")))
    votes = tok_df.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring(F.col("h"), j, 1).isin(*hi), F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"_v{j}")
            for j in range(1, n_bits + 1)
        ]
    )
    return votes.select(
        "doc_id",
        F.concat(
            *[
                F.when(F.col(f"_v{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
                for j in range(1, n_bits + 1)
            ]
        ).alias("simhash"),
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_limit: int = 200_000,
    size_hint: int | None = None,
    allow_cross_join: bool = False,
) -> DataFrame:
    """(id_a, id_b, cos): embedding-cosine near-duplicate pairs.

    Exact all-pairs — the *verification* primitive; candidate pruning
    at 100 TB scale comes from ``similarity.ivf_topk`` (never all-pairs
    the corpus; all-pairs only a candidate bucket).  Cosine uses the
    fixed-point convention from operators/similarity.py — every
    intermediate (floor-scaled products, their 64-element sums) is an
    integer < 2^53, so float64 numpy arithmetic reproduces the JVM
    and DuckDB results bit-for-bit.

    Fast path: when the corpus fits the broadcast budget, ship the
    (id, vector) matrix to executors and scan the corpus once with an
    Arrow-batched ``mapInPandas`` doing blocked numpy arithmetic
    (~10× the interpreted higher-order-function expression).  Larger
    inputs fall back to the fully-distributed JVM cross-join — but
    only under an explicit ``allow_cross_join=True``: by default the
    operator raises above ``broadcast_limit`` and points at the
    LSH/IVF candidate-pruning path, so the O(n²) plan can never be
    reached by accident at corpus scale.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    # ``size_hint`` (caller-known corpus size, e.g. from table stats)
    # keeps the path choice lazy — no extra blocking count() job in
    # the plan.  Without a hint the count runs once, as before.
    n = size_hint if size_hint is not None else emb.count()
    if n > broadcast_limit:
        # enforce the documented contract: this operator VERIFIES a
        # candidate bucket; the O(n²) cross-join over a whole corpus
        # is never the scale path and must be an explicit opt-in.
        if not allow_cross_join:
            raise ValueError(
                f"embedding_near_dup_pairs got {n} rows (> broadcast_limit="
                f"{broadcast_limit}): all-pairs cosine is the candidate-"
                "bucket VERIFICATION primitive, not a corpus-scale join. "
                "Prune candidates first with similarity.ivf_topk or "
                "minhash_lsh / simhash bucketing, or pass "
                "allow_cross_join=True to force the O(n²) plan."
            )
        from terminus_server_spark.operators.similarity import cosine_from_parts, scaled_parts

        pa = scaled_parts(emb, id_col, vec_col, "a")
        pb = scaled_parts(emb, id_col, vec_col, "b")
        pairs = pa.crossJoin(pb).where(F.col("id_a") < F.col("id_b"))
        cos = cosine_from_parts()
        return pairs.select("id_a", "id_b", cos.alias("cos")).where(F.col("cos") >= threshold)

    local = emb.select(id_col, vec_col).toPandas()
    ids = local[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in local[vec_col]])
    norms = np.floor(mat * mat * 1e12).sum(axis=1)  # exact ints in f64
    sc = emb.sparkSession.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, mat_all, norms_all = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            for start in range(0, len(pdf), 64):
                chunk = pdf.iloc[start : start + 64]
                a_ids = chunk[id_col].to_numpy()
                a_mat = np.array([np.asarray(v, dtype=np.float64) for v in chunk[vec_col]])
                a_norms = np.floor(a_mat * a_mat * 1e12).sum(axis=1)
                # blocked elementwise floor-product, exact in f64
                dots = np.floor(a_mat[:, None, :] * mat_all[None, :, :] * 1e12).sum(axis=2)
                cos = dots / np.sqrt(a_norms[:, None] * norms_all[None, :])
                keep_a, keep_b = np.where(
                    (cos >= threshold) & (a_ids[:, None] < ids_all[None, :])
                )
                yield pd.DataFrame(
                    {
                        "id_a": a_ids[keep_a],
                        "id_b": ids_all[keep_b],
                        "cos": cos[keep_a, keep_b],
                    }
                )

    out_schema = f"id_a {dict(emb.dtypes)[id_col]}, id_b {dict(emb.dtypes)[id_col]}, cos double"
    # a small corpus often arrives as ONE input split — spread the
    # query rows so the blocked numpy scan uses every core, not one
    n_parts = emb.sparkSession.sparkContext.defaultParallelism
    return emb.select(id_col, vec_col).repartition(n_parts).mapInPandas(run, out_schema)


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.37,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos): embedding near-dup pairs via banded sign-LSH
    candidates + exact cosine verify — the 100 TB default path.

    Candidate generation is the same band-bucket self-join shape as
    MinHash dedup (``lsh_candidate_pairs``): rows pair only within a
    (band_id, band_key) bucket, never across the whole corpus, so the
    pair space is bounded by bucket sizes rather than n².  The verify
    step computes the exact fixed-point cosine on candidates only
    (same convention as ``similarity``), so every emitted pair carries
    a true cosine — recall (not precision) is what banding trades.
    For genuinely-near duplicates (cos ≥ 0.9) recall at the default
    16-plane / 4-band setting is ≈0.95 per Charikar's bit-collision
    bound; the exact all-pairs form below remains available as the
    verification primitive / oracle baseline.

    The hyperplanes are md5-derived expressions
    (``expr_lsh_signature``), so the correctness oracle replays the
    *same* candidate set in SQL — the approximation itself is
    hash-checked, not just row-counted.
    """
    from terminus_server_spark.operators.similarity import (
        cosine_from_parts,
        expr_lsh_signature,
        pandas_lsh_signature,
        scaled_parts,
    )

    rows_per_band = n_planes // n_bands
    pa = scaled_parts(emb, id_col, vec_col, "a")
    sig_col = (
        pandas_lsh_signature(n_planes, dim)(F.col("vec_a"))
        if dim is not None
        else expr_lsh_signature(F.col("vec_a"), n_planes, dim=dim)
    )
    sig = pa.select(F.col("id_a").alias("doc_id"), sig_col.alias("sig"))
    # one explode instead of an n_bands-way union: the signature (the
    # expensive expression) evaluates once per row, not once per band
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("sig", b * rows_per_band + 1, rows_per_band).alias(
                            "band_key"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    pb = scaled_parts(emb, id_col, vec_col, "b")
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select("id_a", "id_b", cosine_from_parts().alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def near_dup_clusters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, cluster_id, is_canonical): near-duplicate clusters —
    the step after candidate generation that an actual dedup pass
    runs.  LSH candidate pairs form an undirected graph; a cluster is
    a connected component labelled by its min doc_id; the canonical
    (kept) document is the label itself.  Docs in no pair are
    singleton clusters of themselves.

    Scale shape: pair generation is the bucket-join from
    ``lsh_candidate_pairs`` (never O(n²)); component labelling runs
    min-label propagation over the *pair* graph only (near-dup pairs
    are a tiny fraction of the corpus), then one left join assigns
    labels back to the full corpus.
    """
    from terminus_server_spark.operators.graph import connected_components

    pairs = lsh_candidate_pairs(minhash_signatures(shingles_multiset(docs, text_col)))
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            (F.coalesce(F.col("cluster_id"), F.col("doc_id")) == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


def keep_best_in_cluster(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, cluster_id, keep_doc_id, is_kept): near-dup clusters
    with the kept document chosen by QUALITY, not by id — what a
    production dedup pass actually does (min-id canonicals throw away
    the best-written copy of every boilerplate family).

    The cluster step is ``near_dup_clusters`` (bucketed LSH pairs →
    min-label components over the tiny pair graph); the quality score
    is ``text.quality_score``'s composite (deterministic IEEE f64 in
    both engines, so the argmax is engine-portable).  Per-cluster
    argmax is min(struct(-quality, doc_id)) — partial-aggregating, no
    window, string-id-safe — ties broken by the smaller doc_id; labels
    join back at the cluster grain."""
    from terminus_server_spark.operators.text import quality_score

    clusters = near_dup_clusters(docs, text_col)
    q = quality_score(docs, text_col).select("doc_id", "quality")
    joined = clusters.select("doc_id", "cluster_id").join(q, "doc_id")
    # min(struct(-quality, doc_id)) = highest quality, smallest-doc_id
    # tie-break — works for string ids too (negating a string id would
    # NULL the tie-break), and min() keeps its map-side partials.
    best = (
        joined.groupBy("cluster_id")
        .agg(F.min(F.struct((-F.col("quality")).alias("negq"), F.col("doc_id").alias("did"))).alias("m"))
        .select("cluster_id", F.col("m.did").alias("keep_doc_id"))
    )
    return joined.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "keep_doc_id",
        (F.col("doc_id") == F.col("keep_doc_id")).alias("is_kept"),
    )


def dedup_doc_lines(
    docs: DataFrame, text_col: str = "text", sep: str = "\n", key_col: str = "doc_id"
) -> DataFrame:
    """(key, cleaned): remove REPEATED lines WITHIN each document,
    keeping each line's first occurrence in original order — the
    intra-document dedup quality filters prescribe (Gopher /
    RefinedWeb drop or trim docs whose lines repeat: nav bars, footer
    chrome, chat-log echoes), complementing the CROSS-document
    :func:`segment_dedup`.

    posexplode → min(position) per (doc, line) → re-assemble sorted
    by kept position.  Two shuffles keyed by the document id (never
    by line content — no hot-line skew), state bounded by the line
    count."""
    import re as _re

    lines = docs.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "line"),
    )
    firsts = lines.groupBy(key_col, "line").agg(F.min("pos").alias("pos"))
    return (
        firsts.groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("line")))
                    ),
                    lambda x: x["line"],
                ),
                sep,
            ).alias("cleaned")
        )
    )


def segment_dedup(
    docs: DataFrame,
    seg_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document (segment-level) exact dedup — the boilerplate
    remover: split each document into ``seg_tokens``-token segments,
    keep exactly one occurrence of every distinct segment corpus-wide
    (canonical = lowest (doc_id, seg_idx)), and reassemble each
    document from its surviving segments in order.

    Output: (doc_id, n_segs_kept, text_kept) — documents whose every
    segment was claimed elsewhere disappear entirely.

    Dataflow: tokenize → (doc, seg) aggregate → one window keyed by
    segment text (the dedup shuffle) → per-doc reassembly aggregate.
    All aggregates have map-side partials; the segment-text shuffle is
    the same single-shuffle shape as exact document dedup, just at
    finer grain."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("i", "tok"),
    )
    segs = (
        toks.groupBy(id_col, (F.col("i") / seg_tokens).cast("int").alias("seg"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("seg_text")
        )
    )
    w = Window.partitionBy("seg_text").orderBy(F.col(id_col).asc(), F.col("seg").asc())
    kept = segs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segs_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg", "seg_text"))),
                    lambda s: s["seg_text"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """(vec_id, cluster, is_dup): SemDeDup-style semantic
    deduplication (Abbas et al. 2023, arXiv:2303.09540) — cluster the
    embedding space, then compare pairs ONLY within a cluster and
    greedily keep the lowest-id member of every near-duplicate
    neighborhood (a vector is a duplicate iff some lower-id vector in
    its cluster has cosine >= threshold with it).

    Here the cluster assignment is the ``cluster_col`` partition (the
    IVF training step — ``similarity.label_centroids`` + k-means
    refinement — produces exactly such an assignment at scale).  The
    within-cluster pair join is the point of the algorithm: quadratic
    cost is confined to bounded cluster populations instead of the
    corpus, so the join key (cluster) caps the shuffle and no
    all-pairs comparison ever happens corpus-wide.

    Cosine uses the fixed-point floor convention from
    operators/similarity.py, so the result is bit-reproducible
    against the DuckDB oracle."""
    from terminus_server_spark.operators.similarity import SCALE, cosine_from_parts

    base = emb.select(F.col(id_col), F.col(vec_col), F.col(cluster_col).alias("cluster"))

    def parts(suffix: str) -> DataFrame:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        norm = F.aggregate(
            v,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.floor(x * x * SCALE).cast("bigint"),
        )
        return base.select(
            F.col(id_col).alias(f"id_{suffix}"),
            "cluster",
            v.alias(f"vec_{suffix}"),
            norm.alias(f"norm_{suffix}"),
        )

    pairs = parts("a").join(parts("b"), "cluster").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_from_parts()
    dup_ids = (
        pairs.select("cluster", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return base.join(
        dup_ids.withColumn("is_dup", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cluster",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
    )


def span_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 8,
    stride: int = 2,
) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_frac): ExactSubstr-style
    span-grain duplication — fixed ``width``-token windows every
    ``stride`` tokens, a span counted duplicated when the SAME token
    window appears in at least one OTHER document (cross-document
    repeated text: licenses, boilerplate, mirrored articles; Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models
    Better" — the suffix-array method's fixed-window approximation,
    chosen because it keys on a hash-groupable span id instead of a
    global sorted suffix order).

    Cost shape at 100 TB: explode multiplies rows by len/stride, the
    only shuffle groups on the span hash (md5), and the doc-level
    rollup joins back on that same hash — no pairwise comparison
    anywhere.  Docs shorter than ``width`` tokens emit no spans and
    report dup_frac 0."""
    from terminus_server_spark.operators.text import tokens_col

    tokenized = docs.select(
        "doc_id", tokens_col(F.lower(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (width - 1), F.lit(stride))
    spans = tokenized.where(n >= width).select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.md5(F.array_join(F.slice(toks, i, width), " ")))
        ).alias("span"),
    )
    cross_doc = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("span")
    )
    # AQE sizes the semi-join side at runtime: the cross-doc span set
    # is tiny on clean corpora (broadcast) but can rival the corpus on
    # mirror-heavy ones (shuffle) — don't force either
    flagged = spans.join(cross_doc, "span", "left_semi")
    per_doc = (
        spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
        .join(
            flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_spans")),
            "doc_id",
            "left_outer",
        )
        .withColumn("n_dup_spans", F.coalesce("n_dup_spans", F.lit(0)))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def edit_distance_verify(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.4,
    text_col: str = "text",
    max_chars: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, edit_dist, edit_sim): verify candidate near-dup
    pairs by normalized Levenshtein similarity — the order-sensitive
    complement to n-gram Jaccard (bag-of-shingles misses transposed /
    shuffled boilerplate; edit distance catches it).

    Levenshtein is O(len_a·len_b) per pair, so this is strictly a
    CANDIDATE-PAIR verifier (LSH buckets first, never all-pairs), and
    texts are normalized (trim+lower) and clipped to ``max_chars`` —
    the standard prefix-verification compromise; both clamps are
    replayed identically by the oracle.  JVM built-in levenshtein,
    no Python in the loop."""
    t = F.substring(F.trim(F.lower(F.col(text_col))), 1, max_chars)
    txt = docs.select(F.col("doc_id"), t.alias("_t"))
    a = txt.select(F.col("doc_id").alias("doc_a"), F.col("_t").alias("_ta"))
    b = txt.select(F.col("doc_id").alias("doc_b"), F.col("_t").alias("_tb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    mx = F.greatest(F.length("_ta"), F.length("_tb"))
    sim = F.when(mx == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - dist.cast("double") / mx.cast("double")
    )
    return (
        j.where(sim >= F.lit(float(threshold)))
        .select(
            "doc_a",
            "doc_b",
            dist.cast("bigint").alias("edit_dist"),
            F.round(sim, 6).alias("edit_sim"),
        )
    )


def cross_corpus_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ref_id, jaccard): flag documents of an incoming crawl
    that near-duplicate something ALREADY IN the training corpus —
    the asymmetric companion to self-dedup (you don't re-examine the
    reference corpus against itself; you gate new data against it).

    Same band-bucket machinery as self-dedup, but the band join is
    new×ref instead of a self-join, so cost is |new bands| ⋈ |ref
    bands| on bucket keys; the reference side's signatures are
    computed once and, in production, PERSISTED — re-signing 100 TB
    of accepted corpus per increment would dwarf the increment
    itself (the oracle recomputes them because it replays from
    scratch).  Candidates verify by exact shingle Jaccard, best
    reference match per new doc (highest jaccard, lowest ref_id
    tie-break).

    Hot-bucket cap (same 100 TB guard as ``lsh_candidate_pairs``):
    a reference-side band bucket holding > ``MAX_LSH_BUCKET`` docs is
    a template family; instead of fanning every colliding new doc out
    to ALL m reference members (m × |new| candidate rows), those
    buckets contribute ONE candidate per new doc — the bucket's min
    ref_id, the family's canonical representative.  The gate's
    decision ("is this new doc already in the corpus?") is preserved;
    candidate volume stays linear in the increment size."""
    from pyspark.sql.window import Window

    def banded(docs: DataFrame, id_alias: str) -> DataFrame:
        sig = minhash_signatures(shingles_multiset(docs, text_col=text_col))
        rows_per_band = N_MINHASH // N_BANDS
        bands = []
        for b in range(N_BANDS):
            cols = [
                F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)
            ]
            bands.append(
                sig.select(
                    F.col("doc_id").alias(id_alias),
                    F.lit(b).alias("band_id"),
                    F.concat_ws("|", *cols).alias("band_key"),
                )
            )
        out = bands[0]
        for fr in bands[1:]:
            out = out.union(fr)
        return out

    new_b = banded(new_docs, "doc_id")
    ref_b = banded(ref_docs, "ref_id").transform(plan_checkpoint)
    ref_sz = ref_b.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("_m"), F.min("ref_id").alias("_anchor")
    )
    incap_ref = ref_b.join(
        ref_sz.where(F.col("_m") <= MAX_LSH_BUCKET).select("band_id", "band_key"),
        ["band_id", "band_key"],
        "left_semi",
    )
    cand_in = new_b.join(incap_ref, ["band_id", "band_key"]).select("doc_id", "ref_id")
    # over-cap buckets: one row per bucket joins the new side, never
    # the m reference members
    cand_over = new_b.join(
        ref_sz.where(F.col("_m") > MAX_LSH_BUCKET), ["band_id", "band_key"]
    ).select("doc_id", F.col("_anchor").alias("ref_id"))
    cand = cand_in.unionByName(cand_over).distinct()
    sh_new = shingles(new_docs, text_col=text_col).select(
        F.col("doc_id"), F.col("shingle")
    )
    sh_ref = shingles(ref_docs, text_col=text_col).select(
        F.col("doc_id").alias("ref_id"), F.col("shingle")
    )
    sz_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    sz_ref = sh_ref.groupBy("ref_id").agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        cand.join(sh_new, "doc_id")
        .join(sh_ref, ["ref_id", "shingle"])
        .groupBy("doc_id", "ref_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    scored = (
        inter.join(sz_new, "doc_id")
        .join(sz_ref, "ref_id")
        .select("doc_id", "ref_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(float(threshold)))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jaccard").desc(), F.col("ref_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "ref_id", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_inter, containment_a, containment_b):
    asymmetric containment verification — |A∩B|/|A| and |A∩B|/|B|
    over shingle sets for candidate pairs.  Symmetric Jaccard misses
    subset duplication (a long page quoting a short doc wholesale
    scores low Jaccard but containment_small ≈ 1) — this is the
    quote/boilerplate-inclusion detector next to the Jaccard and
    Levenshtein verifiers.  Keeps pairs where EITHER direction clears
    the threshold; candidate-pair-only like every verifier here."""
    sh = shingles(docs, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = F.col("n_inter").cast("double") / F.col("n_a").cast("double")
    cb = F.col("n_inter").cast("double") / F.col("n_b").cast("double")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .where((ca >= F.lit(float(threshold))) | (cb >= F.lit(float(threshold))))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# robust winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

_WINNOW_M = 1 << 20  # position encoding radix; docs must be < 1M chars


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    radix: int = _WINNOW_M,
) -> DataFrame:
    """(doc_id, pos, fh): robust-winnowing document fingerprints
    (Schleimer/Wilkerson/Aiken's MOSS scheme, public literature): over
    the normalized text's character k-gram hashes, every window of w
    consecutive hashes records its MINIMUM, rightmost occurrence on
    ties — guaranteeing at least one fingerprint per window gap
    (the winnowing density bound) while staying position-shift
    invariant, which plain 0-mod-p hash sampling is not.

    The rightmost-min selection is ONE window pass: each (hash, pos)
    encodes as ``(h+1)·M − pos`` (strictly positive, so truncating
    integer division IS floor) and the frame's plain MIN is the
    rightmost argmin (larger pos ⇒ smaller key); (h, pos) decode back
    by integer arithmetic — no nested windows, no per-window argmax
    subquery, and the same expression runs identically in any ANSI
    engine.  Shuffle: one (doc)-keyed window; fingerprints are
    DISTINCT decoded minima.  Documents must be shorter than
    ``radix`` characters (default 1M) — raise it for long-document
    corpora (hash values fit: 2^32 · radix must stay under 2^63).

    k-grams hash through the portable 32-bit md5 prefix; text
    normalizes to lowercase with runs of whitespace collapsed, so
    formatting noise does not shift fingerprints."""
    from pyspark.sql import Window

    m = F.lit(radix)
    normed = docs.select(
        F.col(id_col),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias("_t"),
    )
    grams = normed.select(
        id_col,
        F.posexplode(
            F.expr(
                # floor at 1: sequence(1, 0) would run DESCENDING in
                # Spark; a doc shorter than k yields its one partial gram
                f"transform(sequence(1, greatest(length(_t) - {k - 1}, 1)),"
                f" i -> substring(_t, i, {k}))"
            )
        ).alias("_i0", "_g"),
    ).select(
        id_col,
        (F.col("_i0") + 1).alias("pos"),
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint").alias("_h"),
    )
    wspec = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    # (h+1)·M keeps the key positive even for hash value 0, so the
    # integer div decode is a true floor (div truncates toward zero)
    skey = grams.select(
        id_col, "pos", ((F.col("_h") + 1) * m - F.col("pos")).alias("_key")
    ).select(id_col, F.min("_key").over(wspec).alias("_sk"))
    return (
        skey.select(
            id_col,
            "_sk",
            # integer div decode is exact: keys are strictly positive
            F.expr(f"(_sk - 1) div {radix}").cast("bigint").alias("fh"),
        )
        .select(
            id_col,
            ((F.col("fh") + 1) * m - F.col("_sk")).cast("int").alias("pos"),
            "fh",
        )
        .distinct()
    )


def winnow_similar_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    max_df: int = 20,
    top: int = 20,
) -> DataFrame:
    """(d1, d2, n_shared): document pairs ranked by shared winnowing
    fingerprints — the MOSS match step.  Fingerprints occurring in
    more than ``max_df`` documents are dropped before pairing
    (boilerplate fingerprints both pollute matches and explode the
    self-join quadratically — the same hot-key cap discipline as the
    LSH buckets); candidate generation is the fingerprint-keyed
    self-join, so cost is bounded by Σ df² over surviving
    fingerprints, never |docs|²."""
    fp = winnow_fingerprints(docs, text_col, id_col, k, w).select(
        F.col(id_col).alias("_d"), "fh"
    ).distinct()
    fp = plan_checkpoint(fp)
    keep = fp.groupBy("fh").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= max_df
    )
    fpk = fp.join(F.broadcast(keep.select("fh")), "fh")
    a = fpk.select("fh", F.col("_d").alias("d1"))
    b = fpk.select("fh", F.col("_d").alias("d2"))
    return (
        a.join(b, "fh")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "d1", "d2")
        .limit(top)
    )


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    n_bits: int = 16,
    max_hamming: int = 2,
    top: int = 20,
) -> DataFrame:
    """(sig_a, sig_b, hamming, n_docs_a, n_docs_b): near-duplicate
    SIGNATURE pairs within ``max_hamming`` bits — the Manku/Jain/
    Sarma web-dedup construction (public literature): split each
    signature into ``max_hamming + 1`` blocks; by pigeonhole any pair
    within the distance budget agrees on at least one whole block, so
    the block-keyed self-join generates every true candidate and the
    exact per-bit compare verifies.

    The decisive scale move is the GRAIN: pairing runs over DISTINCT
    signatures (≤ 2^n_bits rows however large the corpus — the
    65k-row ceiling at 16 bits), with per-signature doc counts
    carried along, so a billion-doc corpus costs one signature
    aggregate plus work bounded by the signature space, never by
    doc².  Hamming-0 pairs are excluded (identical signatures are
    exact-dedup territory)."""
    sig = simhash(docs, text_col, n_bits)
    usig = plan_checkpoint(
        sig.groupBy("simhash").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    blocks = max_hamming + 1
    base = n_bits // blocks
    extra = n_bits % blocks
    bounds = []
    start = 1
    for b in range(blocks):
        width = base + (1 if b < extra else 0)
        bounds.append((start, width))
        start += width
    banded = usig.select(
        "simhash",
        "n_docs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        F.substring("simhash", s, w).alias("block_key"),
                    )
                    for b, (s, w) in enumerate(bounds)
                ]
            )
        ).alias("bk"),
    ).select("simhash", "n_docs", "bk.block_id", "bk.block_key")
    a = banded.select(
        F.col("simhash").alias("sig_a"), F.col("n_docs").alias("n_docs_a"),
        "block_id", "block_key",
    )
    b = banded.select(
        F.col("simhash").alias("sig_b"), F.col("n_docs").alias("n_docs_b"),
        "block_id", "block_key",
    )
    cand = (
        a.join(b, ["block_id", "block_key"])
        .where(F.col("sig_a") < F.col("sig_b"))
        .select("sig_a", "sig_b", "n_docs_a", "n_docs_b")
        .distinct()
    )
    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(n_bits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.substring(F.col("sig_a"), i.cast("int"), 1)
            != F.substring(F.col("sig_b"), i.cast("int"), 1),
            1,
        ).otherwise(0),
    )
    return (
        cand.select("sig_a", "sig_b", ham.cast("int").alias("hamming"),
                    "n_docs_a", "n_docs_b")
        .where((F.col("hamming") >= 1) & (F.col("hamming") <= max_hamming))
        .orderBy("hamming", "sig_a", "sig_b")
        .limit(top)
    )


def exact_substring_spans(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_len): maximal character spans covered
    by k-grams that repeat >= ``min_count`` times ACROSS THE CORPUS —
    the ExactSubstr dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") at k-gram grain: their suffix
    array finds repeats of length >= k; every such repeat is a run of
    repeated k-grams, so the merged k-gram cover equals the suffix
    array's removal spans exactly (for repeats >= k, which is the
    only grain the method removes).  Complements ``repeated_span_rate``
    (the RATE approximation on a sparse window grid): this emits the
    actual spans a scrubber would cut.

    Dataflow: one map-only projection explodes each document into
    (position, window-md5) rows; one groupBy(hash) marks globally
    repeated windows (the only corpus-wide shuffle — count>=2 keys,
    never pair joins); repeated positions merge into maximal spans
    with a per-document gaps-and-islands window (running max of
    covered end, adjacency merged).  Per-doc state is its repeated
    positions; span merging shuffles on doc_id so a boilerplate-heavy
    corpus skews by document size, not by hash popularity."""
    from pyspark.sql.window import Window

    text = F.col(text_col)
    n = F.length(text)
    wins = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda p: F.struct(
            p.alias("p"), F.md5(text.substr(p, F.lit(k))).alias("h")
        ),
    )
    wh = (
        docs.where(text.isNotNull() & (n >= k))
        .select(F.col(id_col), F.explode(wins).alias("w"))
        .select(id_col, F.col("w.p").alias("p"), F.col("w.h").alias("h"))
    )
    wh = plan_checkpoint(wh)
    rep = wh.groupBy("h").agg(F.count(F.lit(1)).alias("_n")).where(
        F.col("_n") >= min_count
    )
    hits = wh.join(rep.select("h"), "h", "left_semi")
    w_doc = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + F.lit(k - 1)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        id_col,
        "p",
        F.when(
            prev_end.isNull() | (F.col("p") > prev_end + 1), 1
        ).otherwise(0).alias("_new"),
    )
    islands = flagged.withColumn(
        "island", F.sum("_new").over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max(F.col("p") + F.lit(k - 1)) - F.min("p") + 1)
            .cast("long")
            .alias("span_len"),
        )
        .select(id_col, "span_start", "span_len")
    )


def _threshold_ratio(threshold) -> tuple[int, int]:
    """Reduced rational p/q with q <= 1e6 and p/q <= ``threshold``
    exactly.  All prefix-length and PPJoin length-filter comparisons
    then stay in small exact bigint arithmetic (p * |set| fits int64
    for any realistic set size), and rounding DOWN only enlarges the
    candidate set — losslessness is preserved."""
    from fractions import Fraction
    from math import gcd

    if isinstance(threshold, int):
        return threshold, 1
    scale = 1_000_000
    p = int(threshold * scale)  # floor for threshold in (0, 1]
    while p > 0 and Fraction(p, scale) > Fraction(threshold):
        p -= 1
    g = gcd(p, scale) or 1
    return p // g, scale // g


def prefix_filter_pairs(
    sets: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    elem_col: str = "shingle",
) -> DataFrame:
    """(doc_a, doc_b, jaccard): all pairs with element-set Jaccard >=
    ``threshold`` via PREFIX FILTERING (Chaudhuri et al. 2006 /
    PPJoin) — the other standard similarity-join pruning beside LSH,
    and unlike LSH it is LOSSLESS: order each set globally by
    (document frequency asc, element asc) and keep only the first
    |T| − ceil(t·|T|) + 1 elements; two sets meeting the threshold
    MUST share an element inside both prefixes (pigeonhole on the
    required overlap), so the prefix join generates every qualifying
    pair and exact verification drops nothing true.  A size filter
    (q·min ≥ p·max, also lossless) prunes before verification.
    Because the whole pipeline is lossless the oracle is simply the
    exact all-pairs join at the threshold — the key hash-checks the
    pruning's completeness, not an approximation.

    ``sets``: (id, element) DISTINCT rows — shingle sets in the
    registry fixture: prefix filtering needs a DIVERSE element
    domain (on a narrow word vocabulary every prefix element is
    still common and candidates explode ~60× — measured on the
    synthetic corpus; shingles keep dfs low, which is also why the
    MinHash keys shingle first)."""
    from pyspark.sql.window import Window

    toks = sets.select(
        F.col(id_col).alias("doc_id"), F.col(elem_col).alias("token")
    ).transform(plan_checkpoint)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    sized = toks.join(dfreq, "token").select(
        "doc_id",
        "token",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.col("_df").asc(), F.col("token").asc()))
        .alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("_sz"),
    )
    # ceil(t'*|T|) with t' = p/q a SMALL exact rational <= threshold
    # (q <= 1e6).  float.as_integer_ratio() would give q = 2**52-scale
    # terms whose products overflow bigint for sets with >~2k distinct
    # elements and whose double division rounds; a slightly smaller t'
    # only ENLARGES the prefix / candidate set, so losslessness is
    # preserved and the final `jaccard >= threshold` check is unchanged.
    p_num, q_den = _threshold_ratio(threshold)
    # pure integer ceil: (p*sz + q - 1) div q — stays in bigint, exact.
    need = F.expr(f"({p_num} * _sz + {q_den - 1}) div {q_den}")
    prefix = sized.where(F.col("_rn") <= F.col("_sz") - need + 1).select(
        "doc_id", "token"
    )
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "token")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "token"), "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # size filter (also lossless): J >= p/q forces q*min(|A|,|B|) >=
    # p*max(|A|,|B|) — prune size-incompatible candidates BEFORE the
    # token-level verification join (the PPJoin length filter).
    cand = (
        cand.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("_na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("_nb")), "doc_b")
        .where(
            (q_den * F.col("_na") >= p_num * F.col("_nb"))
            & (q_den * F.col("_nb") >= p_num * F.col("_na"))
        )
        .select("doc_a", "doc_b")
    )
    inter = (
        cand.join(toks.select(F.col("doc_id").alias("doc_a"), "token"), "doc_a")
        .join(
            toks.select(F.col("doc_id").alias("doc_b"), "token"),
            ["doc_b", "token"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold)


def semantic_decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, max_cos_eval, contaminated): EMBEDDING-space benchmark
    decontamination — every corpus document scored by its maximum
    cosine against the evaluation set, flagged above ``threshold``.
    The semantic complement to shingle-hash decontamination
    (pipeline.decontaminate): paraphrased or reformatted test items
    that share no 5-gram still sit next to their source in embedding
    space (the Phi/GPT-3 appendix-style decontamination audit).

    Scale shape: eval sets are benchmark-sized (thousands), so the
    eval side BROADCASTS and the corpus streams through ONE scan —
    a BNLJ against a small built side, the same plan class as
    ann_topk_brute, never a corpus×corpus join.  For an eval set too
    big to broadcast, prune with similarity.ivf_topk first.  Cosines
    use the module's fixed-point convention, so the flags are
    bit-reproducible by the SQL oracle.

    Output cardinality always equals the corpus: the broadcast pairing
    is a LEFT-OUTER nested-loop join, so an EMPTY eval set yields
    every document with max_cos_eval NULL and contaminated=false — a
    decontamination gate must report all-clear explicitly, never by
    silently dropping the corpus (an inner crossJoin would emit zero
    rows).  Same single-shuffle profile as before: one BNLJ scan +
    one groupBy."""
    from terminus_server_spark.operators.similarity import (
        cosine_from_parts,
        scaled_parts,
    )

    pa = scaled_parts(corpus, id_col, vec_col, "a")
    pb = scaled_parts(evalset, id_col, vec_col, "b")
    scored = pa.join(F.broadcast(pb), F.lit(True), "left_outer").select(
        "id_a",
        F.when(
            F.col("id_b").isNotNull(), cosine_from_parts()
        ).alias("cos"),
    )
    return (
        scored.groupBy("id_a")
        .agg(F.max("cos").alias("max_cos_eval"))
        .select(
            F.col("id_a").alias(id_col),
            "max_cos_eval",
            F.coalesce(
                F.col("max_cos_eval") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )
