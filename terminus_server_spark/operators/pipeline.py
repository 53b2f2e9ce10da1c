"""Corpus-preparation operators for training-data pipelines
(SURVEY §2.6 extensions): chunking, normalization, deterministic
sampling, corpus n-gram statistics.

These are the steps between "raw crawl" and "training shards" that a
100 TB pipeline runs after dedup/quality filtering.  Everything is
built-in ``pyspark.sql.functions`` (whole-stage codegen, no Python in
the hot path), embarrassingly parallel per document (no shuffle except
the final aggregation in ``topk_ngrams``), and every function has an
exact DuckDB mirror in the registry for the correctness gate.

Determinism conventions shared with the oracles:
- normalization = lower(trim(collapse-whitespace)) — same regexp in
  both engines;
- sampling = md5 of the key's decimal string, first hex nibble
  compared lexicographically (md5 is the one hash both engines share;
  a hex-prefix range gives an exact n/16 rate with no float rounding);
- chunk boundaries = 1-based substring at ``i*stride`` for
  ``i ∈ [0, floor((len-1)/stride)]`` — inclusive sequences on both
  sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from terminus_server_spark.checkpoint import plan_checkpoint
from terminus_server_spark.operators.text import tokens_col


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text, n_chars_norm): canonical text form used by
    every downstream hash/shingle operator — lowercase, trimmed,
    internal whitespace runs collapsed to single spaces."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


def chunk_documents(
    docs: DataFrame, chunk_size: int = 200, stride: int = 150, text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_text): overlapping
    fixed-width character chunks (stride < chunk_size ⇒ overlap =
    chunk_size - stride), the standard shape for context-window
    packing and embedding indexing.

    One narrow projection + explode per doc — no shuffle at all, so
    at 100 TB this is a pure map stage whose output partitioning
    follows the input files.  ``sequence`` is evaluated JVM-side;
    empty documents yield zero chunks.
    """
    n = F.length(F.col(text_col))
    idx = F.sequence(F.lit(0).cast("bigint"), F.floor((n - 1) / stride))
    return (
        docs.where(n >= 1)
        .select("doc_id", F.explode(idx).alias("chunk_idx"), F.col(text_col))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * stride).alias("chunk_start"),
            F.substring(
                F.col(text_col), (F.col("chunk_idx") * stride + 1).cast("int"), chunk_size
            ).alias("chunk_text"),
        )
    )


def hash_sample(
    docs: DataFrame, sixteenths: int = 4, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ``sixteenths/16`` sample: keep rows whose
    md5(key)'s first hex digit falls in the first ``sixteenths``
    nibbles.  Unlike ``df.sample`` this is reproducible across runs,
    engines, and partitionings — the property training-data splits
    need (a doc's membership never changes when the corpus grows).

    Pure filter — pushes to the scan, no shuffle, trivially parallel.
    """
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    # exclusive upper nibble; 16/16 needs a char above 'f'
    bound = format(sixteenths, "x") if sixteenths < 16 else "g"
    nibble = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    return docs.where(nibble < F.lit(bound))


def topk_ngrams(
    docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """(ngram, doc_freq): the k token-n-grams appearing in the most
    documents (document frequency, the contamination/boilerplate
    metric).  Ties broken by ngram ascending so top-k is total-ordered
    and engine-stable.

    Plan shape: map-side explode of distinct per-doc n-grams, one
    count aggregation (map-side partial count), then a k-row global
    top-k — the only full shuffle is on the n-gram key, and the final
    ordering sorts only the aggregated (small) side.
    """
    # materialize the token array first: inlining the split into the
    # per-position slice lambda re-tokenizes quadratically
    tokenized = docs.select("doc_id", tokens_col(F.lower(F.col(text_col))).alias("_toks"))
    toks = F.col("_toks")
    nt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(nt - (n - 1), F.lit(1)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )
    return (
        tokenized.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def pack_sequences(
    docs: DataFrame, capacity: int = 2048, text_col: str = "text"
) -> DataFrame:
    """(doc_id, source, n_tokens, bin_id, bin_offset): concatenate-
    and-cut sequence packing — the GPT-pretraining shape.  Within
    each ``source`` shard, documents concatenate in doc_id order into
    one token stream that is cut into ``capacity``-sized context
    windows; a doc belongs to the window holding its first token
    (consumers insert EOD separators; cross-boundary bleed is part of
    the scheme's contract, unlike greedy first-fit, and keeps the
    assignment a closed form instead of a sequential fold).

    Scale: one window cumsum per shard — parallelism = shard count,
    and the per-shard window is a single sort-free running sum over
    the shard's rows (no iteration, no driver logic).  Greedy
    first-fit would need a sequential scan per shard; this form packs
    identically tight streams with O(1) per row."""
    from pyspark.sql.window import Window

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    w = Window.partitionBy("source").orderBy("doc_id")
    sized = docs.select("doc_id", "source", toks.alias("n_tokens"))
    start = (
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.col("n_tokens")
    )
    return (
        sized.withColumn("_start", start)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.concat(
                F.col("source"), F.lit("#"), F.floor(F.col("_start") / capacity).cast("string")
            ).alias("bin_id"),
            (F.col("_start") % capacity).alias("bin_offset"),
        )
    )


def kmv_distinct_estimate(
    df: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """(n_exact_sample, theta, est_distinct): K-minimum-values
    distinct-count sketch — keep the k smallest md5-derived hash
    fractions; estimate = (k-1)/theta where theta is the k-th
    smallest fraction.  The KMV estimator is the mergeable-sketch
    building block (union = merge min-sets) used where
    approx_count_distinct's HLL binary isn't portable: md5 is shared
    by every engine, so THIS sketch's estimate is bit-identical on
    Spark and the SQL oracle — a deterministic, testable sketch.

    One pass, one k-row top-k (map-side partial sort), no full
    distinct shuffle: at 100 TB the sketch costs a scan plus a k-row
    reduction."""
    frac = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(16 ** 8))
    )
    mins = (
        df.select(frac.alias("f"))
        .distinct()
        .orderBy("f")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("f").alias("theta"),
        ((F.count(F.lit(1)) - 1).cast("double") / F.max("f")).alias("est_distinct"),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_len, chunk_hash):
    content-defined chunking — chunk boundaries where a rolling
    window's hash hits 0 mod ``divisor`` (the FastCDC/LBFS recipe
    behind storage dedup and shift-robust corpus dedup).  Unlike
    ``chunk_documents``'s fixed grid, inserting one byte near the
    start of a document re-chunks only the chunk it landed in: every
    later boundary is decided by LOCAL content, so downstream
    chunk-hash dedup still matches the untouched tail — the property
    that makes near-identical crawl snapshots dedupe at chunk grain.

    Dataflow: one projection per document — boundary positions via
    filter() over a position sequence (each window hashed with md5;
    a literal Rabin rolling hash saves constant factor, not
    complexity, and md5 keeps it engine-portable) and chunks via
    transform() over the boundary array, then one explode.  No
    shuffle at all; scales as Σ len(text)·window expression work
    inside whole-stage codegen, and the per-doc state is the
    boundary array (len/divisor entries expected)."""
    text = F.col(text_col)
    n = F.length(text)
    # boundary candidates start at 2 (position 1 always starts chunk 0);
    # guard the sequence: Spark's sequence(2, x) runs DESCENDING for
    # x < 2 instead of returning empty.
    last = n - F.lit(window - 1)
    # Boundary detection EXPLODES candidate positions into rows
    # instead of filter()-ing an array: higher-order-function lambdas
    # run interpreted per element (measured 285 s at sf0.1), while the
    # exploded md5/conv projection stays inside whole-stage codegen
    # (~8 s).  Costs one doc_id shuffle to re-collect the boundary
    # array — worth two orders of magnitude on the hash work.
    cand = docs.where(text.isNotNull() & (n >= 1)).select(
        F.col(id_col),
        text.alias("_tx"),
        F.explode(
            F.when(last >= 2, F.sequence(F.lit(2), F.greatest(last, F.lit(2))))
            .otherwise(F.array().cast("array<int>"))
        ).alias("_p"),
    )
    hits = cand.where(
        F.conv(
            F.substring(F.md5(F.col("_tx").substr(F.col("_p"), F.lit(window))), 1, 4),
            16,
            10,
        ).cast("int")
        % divisor
        == 0
    )
    bounds = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("_p")).alias("_bpos")
    )
    docs = docs.join(bounds, id_col, "left_outer")
    bpos = F.coalesce(F.col("_bpos"), F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), bpos)
    k = F.size(starts)
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.element_at(starts, i + 1).alias("chunk_start"),
            (
                F.when(i + 2 <= k, F.element_at(starts, i + 2)).otherwise(n + 1)
                - F.element_at(starts, i + 1)
            ).alias("chunk_len"),
        ),
    )
    return (
        docs.where(text.isNotNull() & (n >= 1))
        .select(F.col(id_col), text.alias("_t"), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
            F.col("c.chunk_start").cast("long").alias("chunk_start"),
            F.col("c.chunk_len").cast("long").alias("chunk_len"),
            F.md5(
                F.expr("substring(_t, c.chunk_start, c.chunk_len)")
            ).alias("chunk_hash"),
        )
    )


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from Flajolet et al. 2007 §4: the
    standard small-m literals for m ∈ {16, 32, 64} and the asymptotic
    0.7213/(1 + 1.079/m) for m >= 128.  Computed from m (not
    hardcoded) so callers with b != 6 get a correctly-scaled
    estimate."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    if m < 16:
        raise ValueError(f"HLL needs at least 16 registers, got m={m}")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct_estimate(df: DataFrame, col: str, b: int = 6) -> DataFrame:
    """(n_zero_buckets, sum_inv, est_distinct): HyperLogLog distinct
    count with an engine-portable register set — the industry's
    standard mergeable cardinality sketch (Flajolet et al. 2007),
    re-derived from md5 so the APPROXIMATE estimate itself is
    bit-reproducible by the SQL oracle (Spark's builtin
    approx_count_distinct carries an opaque JVM register binary;
    this one's registers are plain integers any engine recomputes).

    Portability of every step: bucket = first-32-md5-bits mod m and
    the witness word w = next 32 bits are integer-exact in both
    engines; rank = 33 - length(bin(w)) uses the shared unpadded
    binary rendering (w=0 ⇒ rank 33, all witness bits zero); the
    per-bucket MAX register is order-free; each harmonic term
    2^-M is an exact dyadic double via 1/(1<<M); the 64-term sum
    stays on the 2^-33 grid (sum·2^33 < 2^39 ≪ 2^53) so double
    addition is exact and order-independent; the final α·m²/sum is
    two correctly-rounded IEEE ops.  No small/large-range correction
    branch: that needs ln(), whose libm rounding is NOT portable —
    this emits the raw estimator plus the zero-register count so a
    caller can apply linear counting themselves.

    One scan, one m-row aggregate: at 100 TB the sketch costs the
    scan plus a 2^b-row shuffle, and registers merge with MAX for
    cross-shard unions (same contract as the KMV sketch above)."""
    m = 1 << b
    alpha = _hll_alpha(m)
    h32 = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    wit = F.conv(F.substring(F.md5(F.col(col).cast("string")), 9, 8), 16, 10).cast(
        "long"
    )
    rank = F.when(wit == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(wit)))
    regs = (
        df.select((h32 % m).alias("bucket"), rank.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("mr"))
    )
    spark = df.sparkSession
    grid = spark.range(m).select(F.col("id").alias("bucket"))
    full = grid.join(regs, "bucket", "left_outer").select(
        "bucket", F.coalesce("mr", F.lit(0)).alias("mr")
    )
    # Python F.shiftleft only takes a literal shift; the SQL form
    # accepts a column for both operands.
    inv = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), mr)").cast("double")
    return full.agg(
        F.sum(F.when(F.col("mr") == 0, 1).otherwise(0)).alias("n_zero_buckets"),
        F.sum(inv).alias("sum_inv"),
        (F.lit(alpha * m * m) / F.sum(inv)).alias("est_distinct"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str = "doc_id", content_col: str = "text"
) -> DataFrame:
    """(key, status ∈ added/removed/changed/unchanged): classify every
    document across two corpus snapshots by key membership + content
    hash — the crawl-to-crawl delta a pipeline uses to process ONLY
    what moved (re-embed changed docs, retire removed ones) instead
    of re-running on the whole corpus.  One md5 projection per side +
    one full-outer join on the key; scales with |old|+|new| in a
    single shuffle, and at scale runs partition-pruned when both
    snapshots are identically partitioned.

    Membership is inferred from the hash column's NULLness after the
    full-outer join, so the hash must be NULL-SAFE: a NULL-content
    document coalesces to a sentinel before md5 — otherwise a doc
    present in both snapshots with NULL text would classify as
    'added' instead of unchanged."""
    h = F.md5(F.coalesce(F.col(content_col), F.lit("\x00null")))
    oh = old.select(F.col(key_col), h.alias("_oh"))
    nh = new.select(F.col(key_col), h.alias("_nh"))
    return (
        oh.join(nh, key_col, "full_outer")
        .select(
            key_col,
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def domain_blocklist_verdicts(
    docs: DataFrame, host_col: str, blocked: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """docs + ``blocked_by`` (NULL = kept): URL-host blocklist
    filtering with SUFFIX-hierarchy matching — ``a.b.example.com`` is
    blocked by a list entry ``example.com``, but ``not-example.com``
    is NOT (matching happens at label boundaries, never substrings).
    The crawl-hygiene step that runs before any content processing.

    Each host explodes into its dot-suffixes (bounded by its label
    count, ~4-6 rows) and inner-joins the BROADCAST blocklist; the
    verdict joins back on the key.  A 100 TB corpus pays one map-side
    explode plus one broadcast join — no shuffle of the corpus.
    ``blocked`` is one ``domain`` column; ties (several list entries
    matching one host) resolve to the lexicographically smallest
    entry so the verdict is deterministic."""
    from pyspark.sql.functions import broadcast

    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    sufs = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    hits = (
        docs.select(F.col(key_col), F.explode(sufs).alias("_suf"))
        .join(broadcast(blocked.select(F.col("domain").alias("_suf"))), "_suf")
        .groupBy(key_col)
        .agg(F.min("_suf").alias("blocked_by"))
    )
    return docs.join(hits, key_col, "left_outer")


def phrase_blocklist(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(key, phrase, hits): TOKEN-GRAIN multi-word phrase matching —
    the bad-phrase / boilerplate-marker filter that runs beside the
    domain blocklist in crawl curation (and the content side of
    benchmark-canary detection).  Matching is at token-sequence
    boundaries, never substrings: the phrase "key order sort" does
    NOT match inside "monkey order sort", and overlapping
    occurrences each count ("a a a" holds two "a a" matches).

    ``phrases``: one ``phrase`` column of space-separated multi-word
    entries — request-sized metadata (the blocklist), broadcast.
    Scale shape: for each DISTINCT phrase word-length L (driver-side
    collect of a phrase-table aggregate — blocklist-sized, the
    adjudicated metadata-collect class), each doc builds its L-gram
    strings map-side from the token array (transform over a
    positional sequence, no corpus shuffle), explodes, and
    inner-joins the broadcast length-L phrase slice; one (key,
    phrase) count per length, unioned.  A 100 TB corpus pays L
    map-side passes + broadcast joins + one count aggregation at the
    match grain (matches only, never all grams survive the join)."""
    from pyspark.sql.functions import broadcast

    plen = F.size(F.split(F.col("phrase"), " "))
    lengths = sorted(
        r[0]
        for r in phrases.select(plen.alias("L")).distinct().collect()
    )
    toks = F.split(F.col(text_col), " ")
    out = None
    for L in lengths:
        grams = F.when(
            F.size(toks) >= L,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - L + 1),
                lambda i: F.array_join(F.slice(toks, i, L), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        p_l = phrases.where(plen == L).select("phrase")
        part = (
            docs.select(F.col(key_col), F.explode(grams).alias("phrase"))
            .join(broadcast(p_l), "phrase")
            .groupBy(key_col, "phrase")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        out = part if out is None else out.unionByName(part)
    return out


def kmv_grouped_estimate(
    df: DataFrame, group_col: str, col: str, k: int = 256
) -> DataFrame:
    """Per-GROUP KMV distinct-count sketch: (group, n_kept, theta,
    est_distinct) — the grouped sibling of
    :func:`kmv_distinct_estimate` (distinct users per event type,
    distinct tokens per source, ...).  One (group, fraction) distinct
    pass, then a rank window PARTITIONED by the group — the frame is
    bounded at k rows per group, never an unpartitioned global sort —
    and a per-group aggregate.  Small groups (fewer than k distinct
    hashes) return their EXACT count (the min-set saw everything);
    big groups return the (k-1)/theta estimate.  md5-derived
    fractions keep the whole sketch engine-portable: the estimate
    itself is bit-reproducible on the SQL oracle, and min-sets merge
    (union → re-rank) for incremental maintenance."""
    from pyspark.sql.window import Window

    frac = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(float(16 ** 8))
    )
    fr = df.select(F.col(group_col).alias(group_col), frac.alias("f")).distinct()
    w = Window.partitionBy(group_col).orderBy("f")
    mins = fr.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    n = F.count(F.lit(1))
    return mins.groupBy(group_col).agg(
        n.alias("n_kept"),
        F.max("f").alias("theta"),
        F.when(n < k, n.cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("f"))
        .alias("est_distinct"),
    )


def stratified_hash_sample(
    docs: DataFrame,
    rates: dict[str, int],
    strata_col: str,
    key_col: str = "doc_id",
    default: int | None = None,
) -> DataFrame:
    """Deterministic per-stratum sampling: stratum s keeps rows whose
    md5(key) first nibble < rates[s] (out of 16) — per-class rates in
    one pass, reproducible across engines/partitionings (the
    class-balancing step for skewed corpora).  ``default`` is the
    rate for strata not named in ``rates`` — callers never need to
    enumerate the class universe driver-side (no collect; on a real
    corpus the language set isn't known up front).  Pure filter: no
    shuffle, pushes to the scan."""

    def bound(sixteenths: int) -> str:
        return format(sixteenths, "x") if sixteenths < 16 else "g"

    nibble = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    if default is not None:
        # named strata take their rate, everything else the default
        cond = nibble < bound(default)
        for stratum, sixteenths in rates.items():
            cond = F.when(
                F.col(strata_col) == stratum, nibble < bound(sixteenths)
            ).otherwise(cond)
    else:
        cond = F.lit(False)
        for stratum, sixteenths in rates.items():
            cond = cond | ((F.col(strata_col) == stratum) & (nibble < bound(sixteenths)))
    return docs.where(cond)


def length_trim(
    docs: DataFrame,
    class_col: str = "lang",
    length_col: str = "n_chars",
    low_pct: int = 5,
    high_pct: int = 95,
) -> DataFrame:
    """Per-class exact percentile trimming: keep documents whose
    ``length_col`` lies within [low_pct, high_pct] of their class's
    length distribution — the outlier-trim pass corpora run before
    training (truncated crawls at the bottom, concatenation bugs at
    the top).

    Scale shape: a window over the *raw rows* partitioned by class
    would funnel each class into one task (classes are few, rows are
    billions).  Instead the length HISTOGRAM aggregates per (class,
    length) — map-side combinable, bounded by |classes| ×
    |distinct lengths| — the cumulative distribution is a window over
    that small frame, and the keep-range joins back broadcast.  The
    keep predicate is integer-exact (100·count_lt ≥ low·n and
    100·count_le ≤ high·n), so any engine replays it bit-for-bit."""
    from pyspark.sql.window import Window

    hist = docs.groupBy(class_col, length_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(class_col)
        .orderBy(length_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum_le", F.sum("_c").over(w)).withColumn(
        "_cum_lt", F.col("_cum_le") - F.col("_c")
    )
    totals = hist.groupBy(class_col).agg(F.sum("_c").alias("_n"))
    bounds = (
        cum.join(totals, class_col)
        .where(
            (100 * F.col("_cum_lt") >= low_pct * F.col("_n"))
            & (100 * F.col("_cum_le") <= high_pct * F.col("_n"))
        )
        .select(class_col, length_col)
    )
    return docs.join(F.broadcast(bounds), [class_col, length_col], "left_semi")


def split_assign(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """(.., split): deterministic train/valid/test assignment from the
    md5 nibble — 14/16 train, 1/16 valid, 1/16 test.  A document's
    split never changes as the corpus grows (the property that keeps
    eval sets uncontaminated across recrawls)."""
    nibble = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    return docs.withColumn(
        "split",
        F.when(nibble < "e", "train").when(nibble < "f", "valid").otherwise("test"),
    )


def quality_resample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality-weighted resampling (DCLM-style
    importance sampling): each document survives with probability
    equal to its quality score, decided by comparing an 8-hex-digit
    md5 bucket of the doc id against the score's hex threshold —
    reproducible at any partitioning, no RNG state.

    Returns survivors with (doc_id, quality, bucket, threshold)."""
    from terminus_server_spark.operators.text import quality_score

    q = quality_score(docs, text_col).select("doc_id", "quality")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    threshold = F.format_string(
        "%08x",
        F.least(
            F.floor(F.col("quality") * F.lit(4294967296.0)).cast("bigint"),
            F.lit(4294967295).cast("bigint"),  # clamp q=1.0 to 8 hex digits
        ),
    )
    return (
        q.select("doc_id", "quality", bucket.alias("bucket"), threshold.alias("threshold"))
        .where(F.col("bucket") < F.col("threshold"))
    )


def countmin_heavy_hitters(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 64,
    min_estimate: int = 1,
) -> DataFrame:
    """(key, est, exact): Count-Min-sketch heavy hitters — keys whose
    sketch estimate (min over ``depth`` seeded md5 hash rows of a
    ``width``-bucket counter array) reaches ``min_estimate``, with
    the exact count alongside so over-estimation is visible.

    Mergeability is the point at 100 TB: counter arrays from any
    partitioning add elementwise, so the sketch is one map-side
    partial agg over a (depth x width)-cell table regardless of key
    cardinality; the estimate join broadcasts those few cells back to
    the (bounded) candidate key set.  md5-seeded buckets make the
    estimate — including its collision-driven over-counts —
    bit-identical on any engine, so the oracle replays the sketch
    exactly rather than asserting "close"."""
    def buckets(key):
        return F.array(
            *[
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 8), 16, 10
                ).cast("long")
                % width
                for i in range(depth)
            ]
        )

    cells = (
        df.select(F.posexplode(buckets(F.col(col).cast("string"))).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = df.select(F.col(col).cast("string").alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("exact")
    )
    kb = keys.select(
        "key", "exact", F.posexplode(buckets(F.col("key"))).alias("row", "bucket")
    )
    est = (
        kb.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("key", "exact")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.where(F.col("est") >= min_estimate)
        .select("key", "est", "exact")
        .orderBy(F.col("est").desc(), "key")
    )


def mixture_sample(
    docs: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    scale: int = 8,
) -> DataFrame:
    """(doc_id, strata, rk): temperature-flattened mixture sampling —
    per-stratum budget = min(N_s, ceil(scale * sqrt(N_s))), i.e. the
    alpha=0.5 sampling temperature that upweights small sources and
    clips dominant ones (the Pile/mT5-style mixture rebalancing),
    made deterministic by ranking each stratum on md5(key) instead
    of an RNG.

    sqrt is IEEE-exact and the rank is a per-stratum window ordered
    on the hash, so the kept set is bit-reproducible under any
    partitioning; one count agg (broadcast back) + one window
    shuffle on the stratum key."""
    from pyspark.sql.window import Window

    counts = docs.groupBy(F.col(strata_col).alias("strata")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    budget = F.least(
        F.col("n_s"),
        F.ceil(F.lit(float(scale)) * F.sqrt(F.col("n_s").cast("double"))),
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    ranked = docs.select(
        key_col, F.col(strata_col).alias("strata"), F.row_number().over(w).alias("rk")
    )
    return (
        ranked.join(F.broadcast(counts.select("strata", budget.alias("budget"))), "strata")
        .where(F.col("rk") <= F.col("budget"))
        .select(key_col, "strata", "rk")
    )


def drop_reason_audit(
    docs: DataFrame,
    min_chars: int = 200,
    langs: tuple[str, ...] = ("en", "de"),
    max_digit_frac: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """(stage, source, n_docs): per-document drop provenance for a
    filter pipeline — each doc is attributed to the FIRST stage that
    rejects it (too_short → wrong_lang → high_digit → exact_dup →
    survived), rolled up by source.  The audit every production
    corpus pipeline keeps next to its filters: yield per source, and
    which rule is doing the cutting — without it, a mixture shift
    after a filter change is undebuggable.

    Sequential-pipeline semantics: the dedup rank counts only rows
    that PASSED the earlier filter stages (a running conditional sum
    over the hash window), so the sole surviving copy of a text whose
    rank-1 twin was dropped as too_short/wrong_lang is correctly
    attributed `survived` — exactly what running dedup after the
    filters would produce.

    One pass over the corpus: the only shuffle is the exact-dup
    window on the content hash (the same key exact dedup groups on),
    then a map-side-combined rollup on the tiny (stage, source)
    grain."""
    from pyspark.sql.window import Window

    t = F.col(text_col)
    digit_frac = F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
        / F.length(t).cast("double")
    )
    passes = (
        (F.col("n_chars") >= min_chars)
        & F.col("lang").isin(*langs)
        & (digit_frac <= F.lit(float(max_digit_frac)))
    )
    rn = F.sum(F.when(passes, 1).otherwise(0)).over(
        Window.partitionBy(F.md5(F.lower(t)))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        "source",
        F.when(F.col("n_chars") < min_chars, F.lit("too_short"))
        .when(~F.col("lang").isin(*langs), F.lit("wrong_lang"))
        .when(digit_frac > F.lit(float(max_digit_frac)), F.lit("high_digit"))
        .when(rn > 1, F.lit("exact_dup"))
        .otherwise(F.lit("survived"))
        .alias("stage"),
    )
    return staged.groupBy("stage", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def shuffle_index(
    docs: DataFrame,
    key_col: str = "doc_id",
    salt: str = "epoch0",
    n_buckets: int = 256,
) -> DataFrame:
    """(doc_id, shuffle_pos): a deterministic global training order —
    every epoch's reshuffle is ``md5(salt:key)`` rank, reproducible
    on any cluster at any partitioning (change ``salt`` per epoch).

    The naive form — ROW_NUMBER over one global ORDER BY — funnels
    the corpus through a single partition.  Here the total order is
    recovered in two scale-safe passes: rows hash into ``n_buckets``
    ordered ranges (the hash's first byte, so bucket order = hash
    order), bucket offsets come from a prefix sum over the
    n_buckets-row count table (bounded, broadcast back), and the
    in-bucket rank is a window PARTITIONED BY bucket.  Global
    position = bucket offset + in-bucket rank, identical to the
    single-window answer bit-for-bit."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    nb_hex = 2  # first byte = 256 ordered ranges
    assert n_buckets == 256, "bucket count is pinned to the hash's first byte"
    based = docs.select(F.col(key_col), h.alias("_h")).withColumn(
        "_bucket", F.conv(F.substring("_h", 1, nb_hex), 16, 10).cast("int")
    )
    counts = based.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_bucket",
        (
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_n")
        ).alias("_off"),
    )
    w = Window.partitionBy("_bucket").orderBy("_h", key_col)
    return (
        based.join(F.broadcast(offsets), "_bucket")
        .select(
            key_col,
            (F.col("_off") + F.row_number().over(w) - 1)
            .cast("bigint")
            .alias("shuffle_pos"),
        )
    )


def budget_cap(
    docs: DataFrame, budget_tokens: int = 10_000, text_col: str = "text"
) -> DataFrame:
    """(doc_id, source, n_tokens, cum_tokens, kept): per-source token
    budgets — documents admitted in (quality DESC, doc_id) priority
    order until the source's budget fills, the greedy step of a
    DoReMi/Pile-style mixture build (the count-based temperature clip
    is ``mixture_sample``; this caps by TOKENS, which is what the
    training run actually consumes).

    The running sum is NOT one window partitioned by source (a single
    giant source would funnel through one executor partition); it is
    the same two-pass range-bucket construction as ``shuffle_index``:
    rows bucket on a 4096-cell grid over the quality score (grid
    order = priority order, so buckets are contiguous ranges of the
    sort), per-bucket token totals prefix-sum over the tiny
    (source, bucket) table, and the in-bucket running sum is a window
    PARTITIONED BY (source, bucket).  cum_tokens = bucket offset +
    in-bucket sum — integer sums, so the result is bit-identical to
    the naive single window at any partitioning.  A bucket only
    concentrates rows whose quality ties at the 1/4096 grain — the
    degenerate all-one-quality source remains serial, which is the
    point where per-bucket budgets are the practical form anyway.
    """
    from pyspark.sql.window import Window

    from terminus_server_spark.operators.text import quality_score

    q = quality_score(docs, text_col).select("doc_id", "n_tokens", "quality")
    base = docs.select("doc_id", "source").join(q, "doc_id").withColumn(
        "_qb", F.floor(F.col("quality") * F.lit(4096.0)).cast("int")
    )
    w_in = (
        Window.partitionBy("source", "_qb")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    btab = base.groupBy("source", "_qb").agg(F.sum("n_tokens").alias("_bt"))
    w_off = (
        Window.partitionBy("source")
        .orderBy(F.col("_qb").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = btab.select(
        "source", "_qb", (F.sum("_bt").over(w_off) - F.col("_bt")).alias("_off")
    )
    cum = F.col("_off") + F.sum("n_tokens").over(w_in)
    return base.join(F.broadcast(offs), ["source", "_qb"]).select(
        "doc_id",
        "source",
        "n_tokens",
        cum.alias("cum_tokens"),
        (cum <= F.lit(budget_tokens)).alias("kept"),
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 128,
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public paper): score
    every raw document by how target-like its hashed n-gram profile
    is, ``w(x) = log p_target(x) - log p_raw(x)`` under bag-of-feature
    multinomials.  Downstream, Gumbel-top-k over these weights picks
    the training subset; the weights themselves are the distributed
    part.

    Features are unigrams + adjacent bigrams of lowercased
    whitespace tokens, hashed to ``n_buckets`` buckets with the
    repo's engine-portable md5 convention; both distributions get
    add-1 smoothing over the bucket space.  Plan shape: one explode →
    one (doc, bucket) partial-aggregating shuffle; the two bucket
    profiles are ≤ ``n_buckets`` rows each, broadcast back — no
    second pass over the corpus, no Python in the hot path.  The
    per-document sum is decimal-pinned so Spark and the DuckDB
    oracle agree bit-for-bit after rounding.
    """
    from terminus_server_spark.checkpoint import spread_input

    toks = spread_input(docs).select(
        "doc_id",
        F.col("lang"),
        tokens_col(F.lower(F.col(text_col))).alias("tk"),
    )
    feats = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(
                F.col("tk"),
                F.transform(
                    F.slice(F.col("tk"), 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                    lambda x, i: F.concat(x, F.lit(" "), F.col("tk")[i + 1]),
                ),
            )
        ).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )
    per_doc = feats.groupBy("doc_id", F.col("lang"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tgt = (
        per_doc.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    src = per_doc.groupBy("bucket").agg(F.sum("c").alias("cs"))
    prof = (
        src.join(tgt, "bucket", "left_outer")
        .select("bucket", F.coalesce("ct", F.lit(0)).alias("ct"), "cs")
        .crossJoin(
            src.agg(
                F.sum("cs").alias("ns"),
            )
        )
        .crossJoin(tgt.agg(F.sum("ct").alias("nt")))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1) / (F.col("nt") + F.lit(n_buckets)))
                - F.log((F.col("cs") + 1) / (F.col("ns") + F.lit(n_buckets)))
            ).alias("logratio"),
        )
    )
    return (
        per_doc.join(F.broadcast(prof), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.round(
                F.sum(
                    (F.col("c") * F.col("logratio")).cast("decimal(28,12)")
                ).cast("double"),
                6,
            ).alias("dsir_weight"),
        )
    )


def source_kl_drift(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus:
    ``KL(P_source || P_corpus)`` restricted to the source's observed
    vocabulary (both distributions exact maximum-likelihood — the
    restriction keeps every term finite without smoothing and keeps
    the plan linear: one explode, one (source, token) aggregate, one
    broadcast join against the corpus frequency table; no
    source × vocabulary cross join).  The monitoring pass that flags
    a crawl slice whose language mix shifted under the pipeline.
    """
    toks = docs.select(
        "source", F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok")
    )
    by_src = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    corpus = by_src.groupBy("tok").agg(F.sum("c").alias("cc"))
    n_corpus = corpus.agg(F.sum("cc").alias("nc"))
    n_src = by_src.groupBy("source").agg(F.sum("c").alias("ns"))
    p = F.col("c") / F.col("ns")
    q = F.col("cc") / F.col("nc")
    return (
        by_src.join(F.broadcast(corpus), "tok")
        .join(F.broadcast(n_src), "source")
        .crossJoin(n_corpus)
        .groupBy("source")
        .agg(
            F.max("ns").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.round(
                F.sum((p * F.log(p / q)).cast("decimal(28,12)")).cast("double"),
                6,
            ).alias("kl_vs_corpus"),
        )
    )


def shard_assign(
    docs: DataFrame,
    shard_tokens: int = 16384,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """(doc_id, n_tokens, shard): deterministic size-bounded shard
    assignment for training-shard output — docs in md5 hash order,
    cut into shards of ~``shard_tokens`` whitespace tokens (a doc
    belongs to the shard its starting token offset falls in, so every
    boundary is exact and reproducible on any cluster at any
    partitioning).

    The global token prefix sum uses the same two-pass range-bucket
    discipline as :func:`shuffle_index` — per-bucket token totals
    (256 bounded rows) prefix-summed and broadcast back, in-bucket
    cumulative sums as a window PARTITIONED BY bucket — never a
    single-partition global window."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    based = docs.select(
        F.col(key_col),
        tokens_col(F.col(text_col)).alias("_tk"),
        h.alias("_h"),
    ).select(
        key_col,
        F.size("_tk").cast("bigint").alias("n_tokens"),
        "_h",
        F.conv(F.substring("_h", 1, 2), 16, 10).cast("int").alias("_bucket"),
    )
    btot = based.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bt"))
    offsets = btot.select(
        "_bucket",
        (
            F.sum("_bt").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_bt")
        ).alias("_off"),
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("_off") + F.sum("n_tokens").over(w)
    return based.join(F.broadcast(offsets), "_bucket").select(
        key_col,
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(shard_tokens))
        .cast("bigint")
        .alias("shard"),
    )


def write_shards(
    docs: DataFrame,
    path: str,
    shard_tokens: int = 16384,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write the corpus as shard-partitioned parquet (one directory
    per shard of ~``shard_tokens`` tokens, the training-data output
    step) and return the read-back manifest: (shard, n_docs,
    sum_tokens, min_doc, max_doc) computed from the files actually on
    disk — the manifest is the write's verification, not a replay of
    the assignment."""
    assigned = shard_assign(
        docs, shard_tokens=shard_tokens, key_col=key_col, text_col=text_col
    )
    out = docs.join(assigned, key_col).select(
        key_col, text_col, "n_tokens", "shard"
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = docs.sparkSession.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min(key_col).alias("min_doc"),
        F.max(key_col).alias("max_doc"),
    )


def weighted_sample(
    docs: DataFrame, weight_col, n: int, key_col: str = "doc_id"
) -> DataFrame:
    """(key, w, skey): deterministic weighted sampling WITHOUT
    replacement — Efraimidis-Spiliopoulos A-Res: each row draws a
    reproducible uniform u from its md5 (the module's RNG-free
    convention) and competes with key ln(u)/w, a monotone transform
    of u^(1/w); the n LARGEST keys are the sample, so inclusion
    probability is proportional to weight and the draw is one
    map-side projection plus one top-n (TakeOrdered — no full sort,
    no RNG, same sample on any partitioning or engine).

    The sort key is pinned to decimal(28,12) before ranking: ln()
    differs by ulps across libm implementations, and 12 decimals is
    where both engines provably agree — the same pin the perplexity
    scorers use."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(16**8 + 1))
    w = F.col(weight_col).cast("double")
    skey = (F.log(u) / w).cast("decimal(28,12)")
    return (
        docs.select(
            F.col(key_col),
            F.col(weight_col).alias("w"),
            skey.alias("_sk"),
        )
        .orderBy(F.col("_sk").desc(), F.col(key_col).asc())
        .limit(n)
        .select(key_col, "w", F.round(F.col("_sk").cast("double"), 6).alias("skey"))
    )


def apportion_sample(
    docs: DataFrame, n_total: int, group_col: str = "source", key_col: str = "doc_id"
) -> DataFrame:
    """(key, group, grp_rank): an EXACT-N sample apportioned across
    groups in proportion to their sizes by the largest-remainder
    method (Hamilton apportionment) — the mixture-construction step
    that turns "web 62 %, books 23 %, code 15 %" into exactly
    ``n_total`` documents with no stochastic rounding drift: each
    group gets floor(N·n_g/total) plus one extra for the largest
    integer remainders until N is reached (ties to the lexicographic
    group).  Everything is INTEGER arithmetic — quota floors are
    (N·n_g) // total and remainders (N·n_g) % total — so the
    allocation, and the md5-rank pick inside each group, are
    engine-identical.

    Cost: one count per group (map-side), a window over the GROUP
    table (a handful of rows), one per-group rank window bounded by
    the allocation."""
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    total = counts.agg(F.sum("_n").alias("_t"))
    # TRUE integer floor division (SQL `div`), not a double quotient
    # cast back: past 2^53 the double can round UP to an exact
    # integer, making sum(floors) exceed N — the exact drift this
    # method exists to prevent
    quota = counts.crossJoin(broadcast(total)).select(
        "grp",
        F.expr(f"(CAST({int(n_total)} AS BIGINT) * _n) div _t").alias("_f"),
        ((F.lit(n_total) * F.col("_n")) % F.col("_t")).alias("_r"),
    )
    # leftover seats go to the largest remainders
    wq = Window.orderBy(F.col("_r").desc(), F.col("grp").asc())
    left = quota.agg((F.lit(n_total) - F.sum("_f")).alias("_l"))
    alloc = (
        quota.withColumn("_rk", F.row_number().over(wq))
        .crossJoin(broadcast(left))
        .select(
            "grp",
            (F.col("_f") + F.when(F.col("_rk") <= F.col("_l"), 1).otherwise(0)).alias(
                "_alloc"
            ),
        )
    )
    h = F.md5(F.col(key_col).cast("string"))
    wd = Window.partitionBy("grp").orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.select(F.col(key_col), F.col(group_col).alias("grp"))
        .withColumn("_dr", F.row_number().over(wd))
        .join(broadcast(alloc), "grp")
        .where(F.col("_dr") <= F.col("_alloc"))
        .select(key_col, F.col("grp").alias(group_col), F.col("_dr").alias("grp_rank"))
    )


def kmv_theta_intersect(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """(n_a_kept, n_b_kept, theta, n_common, est_intersect,
    exact_intersect): theta-sketch set-intersection estimate from two
    KMV min-sets — the mergeable-sketch answer to "how many keys are
    in BOTH 100 TB sets" without ever joining the raw sets: each side
    keeps its k smallest md5 fractions (θ = 1 while the sketch is
    still exact, else the k-th min), the working threshold is
    θ = min(θ_a, θ_b), and the estimate is |{common mins < θ}| / θ
    (Dasgupta et al.'s theta-sketch algebra, public literature).

    Everything is md5-portable, so the *estimate itself* is
    bit-reproduced by the SQL oracle — same discipline as
    `sketch_kmv_distinct`.  ``exact_intersect`` is the audited truth
    (one distinct-join — the cost the sketch exists to avoid; part
    of the output per the repo's audited-approximation pattern).
    Sketch cost: two scans + two k-row top-ks; the intersection step
    touches only k-row frames."""

    def _mins(df: DataFrame, col: str) -> DataFrame:
        frac = (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
                "double"
            )
            / F.lit(float(16**8))
        )
        return plan_checkpoint(df.select(frac.alias("f")).distinct().orderBy("f").limit(k))

    ma, mb = _mins(df_a, col_a), _mins(df_b, col_b)
    sa = ma.agg(F.count(F.lit(1)).alias("n_a_kept"), F.max("f").alias("_ta"))
    sb = mb.agg(F.count(F.lit(1)).alias("n_b_kept"), F.max("f").alias("_tb"))
    thetas = sa.crossJoin(sb).select(
        "n_a_kept",
        "n_b_kept",
        F.least(
            F.when(F.col("n_a_kept") < k, F.lit(1.0)).otherwise(F.col("_ta")),
            F.when(F.col("n_b_kept") < k, F.lit(1.0)).otherwise(F.col("_tb")),
        ).alias("theta"),
    )
    common = (
        ma.join(mb, "f")
        .crossJoin(F.broadcast(thetas.select("theta")))
        .where(F.col("f") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        df_a.select(F.col(col_a).alias("_k"))
        .distinct()
        .join(df_b.select(F.col(col_b).alias("_k")).distinct(), "_k")
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return (
        thetas.crossJoin(common)
        .crossJoin(exact)
        .select(
            "n_a_kept",
            "n_b_kept",
            "theta",
            "n_common",
            (F.col("n_common").cast("double") / F.col("theta")).alias("est_intersect"),
            "exact_intersect",
        )
    )


def kmv_theta_anotb(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """(n_a_kept, n_b_kept, theta, n_anotb, est_anotb, exact_anotb):
    theta-sketch set DIFFERENCE estimate (the a-not-b operation of
    the theta-sketch algebra, Dasgupta et al. — the third member
    beside union and intersection): with θ = min(θ_a, θ_b), the
    result sketch's retained values are A's mins below θ that do NOT
    appear among B's mins, and the estimate is their count / θ —
    "how many keys are in the 100 TB set A but not in B" from two
    k-row min-sets, never an anti-join of the raw sets.  B's mins
    below θ are a FULL census of B ∩ [0,θ) (that is what θ_b ≥ θ
    guarantees), so the membership test against them is exact for
    every retained A value — the subtlety that makes a-not-b sound.

    md5-portable end to end (same fraction as the KMV family), so
    the ESTIMATE itself is bit-reproduced by the SQL oracle;
    ``exact_anotb`` is the audited truth (one distinct anti-join —
    the cost the sketch avoids).  Sketch cost: two scans + two k-row
    top-ks; the difference step touches only k-row frames."""

    def _mins(df: DataFrame, col: str) -> DataFrame:
        frac = (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
            ).cast("double")
            / F.lit(float(16**8))
        )
        return plan_checkpoint(
            df.select(frac.alias("f")).distinct().orderBy("f").limit(k)
        )

    ma, mb = _mins(df_a, col_a), _mins(df_b, col_b)
    sa = ma.agg(F.count(F.lit(1)).alias("n_a_kept"), F.max("f").alias("_ta"))
    sb = mb.agg(F.count(F.lit(1)).alias("n_b_kept"), F.max("f").alias("_tb"))
    thetas = sa.crossJoin(sb).select(
        "n_a_kept",
        "n_b_kept",
        F.least(
            F.when(F.col("n_a_kept") < k, F.lit(1.0)).otherwise(F.col("_ta")),
            F.when(F.col("n_b_kept") < k, F.lit(1.0)).otherwise(F.col("_tb")),
        ).alias("theta"),
    )
    kept = (
        ma.join(mb, "f", "left_anti")
        .crossJoin(F.broadcast(thetas.select("theta")))
        .where(F.col("f") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_anotb"))
    )
    exact = (
        df_a.select(F.col(col_a).alias("_k"))
        .distinct()
        .join(
            df_b.select(F.col(col_b).alias("_k")).distinct(),
            "_k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("exact_anotb"))
    )
    return (
        thetas.crossJoin(kept)
        .crossJoin(exact)
        .select(
            "n_a_kept",
            "n_b_kept",
            "theta",
            "n_anotb",
            (F.col("n_anotb").cast("double") / F.col("theta")).alias(
                "est_anotb"
            ),
            "exact_anotb",
        )
    )
