"""Text-analysis operators for training-data pipelines (SURVEY §2.6).

All expressions are built-in ``pyspark.sql.functions`` (JVM codegen,
no Python UDFs in the hot path) and have exact DuckDB-SQL mirrors so
the correctness gate can hash-match them.

Conventions shared with the oracles:
- tokens = regexp split on whitespace of trimmed text;
- ratios are double divisions of exact integer counts (bit-stable);
- fingerprints are md5 hex (identical function in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "in", "den", "ist"],
    "fr": ["le", "la", "de", "et", "un", "une", "en", "est"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars_norm): whitespace
    token count plus a BPE-ish regex token count (letters / digits /
    single punctuation — the pre-tokenizer shape BPE vocabularies
    use)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens_col(t)).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RE), 0)).cast("bigint").alias("n_bpe_tokens"),
        F.length(F.trim(t)).cast("bigint").alias("n_chars_norm"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stop_ratio, quality): heuristic quality features + a composite
    score — the C4/Gopher-style cheap filters."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("bigint")
    en_stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stops, x))).cast("bigint")
    mean_token_len = (F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / n_tokens)
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    quality = (
        F.when((n_tokens >= 5) & (mean_token_len >= 2.0) & (mean_token_len <= 12.0), 1.0)
        .otherwise(0.0)
        * (1.0 - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_token_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, best_hits): stopword-profile language ID.

    Counts hits against each language's stopword list; argmax with a
    fixed tie order (en < es < de < fr < und).  A real system would
    use char n-gram profiles; the *operator shape* (per-doc argmax
    over K profile scores, all JVM-side) is the same."""
    toks = tokens_col(F.lower(F.col(text_col)))
    hit_cols = []

    def _hits(arr):
        # single-arg lambda (a two-arg lambda would be read as
        # (element, index) by F.filter)
        return F.filter(toks, lambda x: F.array_contains(arr, x))

    for lang in ("en", "es", "de", "fr"):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_cols.append(F.size(_hits(arr)).cast("bigint").alias(f"hits_{lang}"))
    scored = docs.select("doc_id", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in ("en", "es", "de", "fr")])
    pred = (
        F.when(best == 0, "und")
        .when(F.col("hits_en") == best, "en")
        .when(F.col("hits_es") == best, "es")
        .when(F.col("hits_de") == best, "de")
        .otherwise("fr")
    )
    return scored.select("doc_id", pred.alias("pred_lang"), best.alias("best_hits"))


def fingerprint(docs: DataFrame, text_col: str = "text", prefix_tokens: int = 8) -> DataFrame:
    """(doc_id, content_hash, prefix_hash): md5 of the normalized full
    text and of the first-k-token prefix (prefix collisions catch
    boilerplate/template duplication)."""
    t = F.col(text_col)
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    toks = F.split(norm, " ")
    prefix = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        F.md5(prefix).alias("prefix_hash"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, dup_bigram_frac, dup_trigram_frac,
    top_token_frac): Gopher-style repetition filters — fraction of
    duplicated {2,3}-grams and mass of the most frequent token.

    Scale notes: the n-gram fractions are pure array expressions
    (whole-stage codegen, zero shuffle); the top-token mass is one
    explode + two-level aggregate keyed by doc_id — map-side partials
    apply and the key is unique per doc, so there is no skew.  The
    token array is materialized as a column before any element_at
    lambda touches it: inlining the split expression would re-tokenize
    the document once per n-gram position (quadratic in doc length)."""
    tokenized = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)

    def grams(width: int):
        idx = F.sequence(F.lit(1), n - (width - 1))
        make = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(width)])
        return F.when(n >= width, F.transform(idx, make)).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr):
        return F.when(
            F.size(arr) > 0,
            F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / F.size(arr).cast("double"),
        ).otherwise(F.lit(0.0))

    arrays = tokenized.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        dup_frac(grams(2)).alias("dup_bigram_frac"),
        dup_frac(grams(3)).alias("dup_trigram_frac"),
        toks.alias("_toks"),
    )
    counts = (
        arrays.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c").cast("double")).alias("top_token_frac"))
    )
    return arrays.drop("_toks").join(counts, "doc_id")


def shingle_hashes(docs: DataFrame, text_col: str = "text", width: int = 5) -> DataFrame:
    """(doc_id, shingle): md5 of each distinct ``width``-token window.
    Hashing keeps shuffle rows fixed-size regardless of document
    length — the join key for decontamination at corpus scale.

    The token array is a materialized column, not an inlined split
    expression — see repetition_signals for why (quadratic re-parse)."""
    tokenized = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (width - 1))
    make = lambda i: F.md5(F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(width)]))
    sh = F.when(n >= width, F.transform(idx, make)).otherwise(F.array().cast("array<string>"))
    return tokenized.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    width: int = 5,
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """(doc_id, n_hits): training docs sharing >= 1 ``width``-token
    shingle with the benchmark set (eval-set contamination check à la
    GPT-3/PaLM 13-gram overlap; width parameterized).

    When the benchmark is genuinely eval-sized (thousands of docs),
    pass ``broadcast_benchmark=True``: the distinct shingle set
    broadcasts and the probe is a map-side semi-join with zero shuffle
    of the (huge) training-corpus shingles.  Default leaves the
    strategy to Catalyst/AQE, which still broadcasts under the
    threshold but degrades to a shuffle join rather than OOMing the
    executors when the benchmark is corpus-sized."""
    bench = shingle_hashes(benchmark, text_col, width).select("shingle").distinct()
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    cand = shingle_hashes(docs, text_col, width)
    return (
        cand.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").cast("bigint").alias("n_hits"))
    )


def ngram_novelty(
    docs: DataFrame, text_col: str = "text", width: int = 3
) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty): leave-one-out n-gram
    novelty — the fraction of a document's distinct ``width``-token
    shingles that occur in NO other document (document frequency 1).
    The memorization/boilerplate axis the repetition and dup-line
    signals don't cover: near-zero novelty means the document is
    assembled from corpus-common n-grams (template/boilerplate),
    near-one means unique text — a standard mixture-curation signal
    next to quality scores.

    Shape: one shingle-grain groupBy for document frequencies (df =
    plain count, shingles are per-doc distinct), one join back keyed
    by shingle, one doc-grain aggregate — the posting-table cost
    class (tf-idf, OOV rate).  Documents shorter than ``width``
    tokens have no shingles and drop out."""
    sh = shingle_hashes(docs, text_col, width)
    df_t = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    return (
        sh.join(df_t, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


PII_PATTERNS = (
    # order matters: each rule runs over the previous rule's output
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, scrubbed_hash): PII
    redaction — the compliance pass every training corpus runs.
    Counts matched spans per category, replaces them with typed
    placeholder tokens, and fingerprints the scrubbed text.

    Pure per-row regex chain (whole-stage codegen, zero shuffle); the
    patterns are RE2-compatible so the oracle replays them verbatim.
    """
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select("doc_id", *counts, F.md5(scrubbed).alias("scrubbed_hash"))


def oov_rate(docs: DataFrame, text_col: str = "text", vocab_k: int = 1000) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate): fraction of a document's
    tokens outside the corpus's top-``vocab_k`` vocabulary — a
    quality/noise signal pretraining filters use (high OOV ⇒ garbled
    or off-domain text), with no model dependency and integer-exact
    arithmetic (counts + one final double division).

    Dataflow: token frequencies (one map-side-combined aggregate),
    distributed top-k (``orderBy().limit()`` executes as
    TakeOrderedAndProject — per-partition heaps, never a
    single-partition window) to pick the vocabulary with a
    deterministic tie-break on token text, broadcast-sized vocab
    joined back to the token stream — at 100 TB the vocab is vocab_k
    rows, so the join is a broadcast and the heavy stream never
    reshuffles."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_k)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "tok", "left_outer"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("n_oov").cast("bigint").alias("n_oov"),
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_rate"
            ),
        )
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(ngram, n_ab, pmi): top-k adjacent-bigram collocations by
    pointwise mutual information — ln((c_ab/B) / ((c_a/T)(c_b/T))) —
    the classic phrase-mining signal (word2vec-style phrase joins,
    boilerplate discovery).

    One explode for bigrams, one for unigrams; the unigram frequency
    table joins back twice on the word key (vocabulary-sized —
    broadcast at scale, with the standard top-K vocabulary cap).
    Counts are exact integers; the single ln happens once per
    surviving bigram and is rounded to 6 decimals before the
    deterministic (pmi desc, ngram asc) top-k cut."""
    tk = tokens_col(F.lower(F.col(text_col)))
    base = docs.select(tk.alias("tk")).where(F.size("tk") >= 2)
    bigrams = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = (
        docs.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    totals = uni.agg(
        F.sum("n_w").cast("bigint").alias("t_uni")
    ).crossJoin(bg_counts.agg(F.sum("n_ab").cast("bigint").alias("t_bg")))
    left = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    right = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    scored = (
        # unigram joins stay key-equi on the word: AQE broadcasts
        # them when the vocabulary is small and shuffles when it
        # isn't — no unconditional broadcast of an unbounded table
        bg_counts.where(F.col("n_ab") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") / F.col("t_bg"))
            / (
                (F.col("n_a").cast("double") / F.col("t_uni"))
                * (F.col("n_b").cast("double") / F.col("t_uni"))
            )
        ),
        6,
    )
    return (
        scored.select(
            F.concat_ws(" ", "w1", "w2").alias("ngram"),
            "n_ab",
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "ngram")
        .limit(k)
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading-ease with the standard cheap proxies — sentences from
    [.!?] runs (min 1), syllables from vowel groups per word (min 1
    per word) — the classic readability quality signal, as one
    codegen'd projection."""
    t = F.col(text_col)
    words = F.size(tokens_col(t)).cast("bigint")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0)).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    vowel_groups = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(r"[aeiouy]+"), 0)
    ).cast("bigint")
    syllables = F.greatest(vowel_groups, words)  # >= 1 per word
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6) * (syllables.cast("double") / words),
        6,
    )
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, entropy_bits): Shannon entropy of the
    lowercased character distribution — the gibberish/base64/
    binary-spill detector (natural text sits ~4 bits/char; encoded
    blobs push toward 6, repeated filler toward 0).

    H = log2(n) - (1/n)·Σ c·log2(c) over per-char counts c, with each
    c·ln(c) term cast to decimal(28,12) before the sum (the same
    order-free aggregation discipline as unigram_logprob) so the
    rounded result is partition-independent.

    Entirely MAP-SIDE: per-char counts come from sorting the doc's
    own char array and folding run lengths (run ends located with a
    filter over positions, the decimal fold via ``aggregate``) — the
    char-grain rows never leave their input split, versus the naive
    explode + groupBy(doc, ch) which shuffles one row per CHARACTER
    (the dominant cost at corpus scale: ~10⁹ rows per 4 GB of text).
    Decimal addition is exact, so the fold's sorted-run order and the
    oracle's hash-aggregate order produce identical bits."""
    t = f"lower({text_col})"
    # each stage lands in its own column: lambda bodies don't get
    # common-subexpression elimination, so inlining the sort would
    # re-sort the array once per element_at
    sort_expr = f"array_sort(transform(sequence(1, length({t})), i -> substring({t}, i, 1)))"
    ends_expr = (
        "filter(sequence(1, size(_s)), i -> i = size(_s)"
        " OR element_at(_s, i) <> element_at(_s, i + 1))"
    )
    fold_expr = """
    aggregate(
      transform(sequence(1, size(_ends)),
                j -> element_at(_ends, j)
                     - IF(j = 1, 0, element_at(_ends, j - 1))),
      CAST(0 AS DECIMAL(28,12)),
      (acc, c) -> CAST(acc + CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                                  AS DECIMAL(28,12))
                       AS DECIMAL(28,12)))
    """
    return (
        docs.where(F.expr(f"length({t}) > 0"))
        .withColumn("_s", F.expr(sort_expr))
        .withColumn("_ends", F.expr(ends_expr))
        .withColumn("_sclc", F.expr(fold_expr))
        .withColumn("n_chars", F.expr(f"CAST(length({t}) AS BIGINT)"))
        .select(
            "doc_id",
            "n_chars",
            F.round(
                (
                    F.log(F.col("n_chars").cast("double"))
                    - F.col("_sclc").cast("double") / F.col("n_chars")
                )
                / F.lit(0.6931471805599453),
                6,
            ).alias("entropy_bits"),
        )
    )


def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    vocab_k: int = 500,
    add_k: float = 0.5,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob, perplexity): CCNet-style
    corpus-LM quality scoring — an add-k-smoothed bigram language
    model is trained on the corpus itself (top-``vocab_k`` vocabulary,
    everything else folded to ``<unk>``) and each document is scored
    by its per-token log-likelihood under that model.  Low perplexity
    ⇒ stereotyped/boilerplate text, high ⇒ garbled or off-domain —
    the standard pretraining quality dimension next to OOV rate and
    entropy (reference analogue: the quality/filter pass terminus
    users run before document load).

    Scale design: bigrams are extracted ARRAY-SIDE (transform over
    the token array with ``<s>``/``</s>`` sentinels) so the heavy
    document stream never shuffles on document order; the vocabulary
    is a distributed top-k (TakeOrderedAndProject) broadcast back to
    both bigram legs; model counts are map-side-combined aggregates
    over vocab-bounded keys (≤ (k+3)² pairs, broadcast-joinable);
    each ln-probability term is cast to decimal(28,12) before the
    per-doc sum (order-free, partition-count-independent — the same
    discipline as unigram_logprob/char_entropy).  The mapped bigram
    stream feeds four consumers (pair counts, context counts, vocab
    size, scoring), so it is plan-checkpointed once instead of
    re-deriving — and re-scanning the corpus — per consumer; tokens
    are dictionary-encoded to vocabulary ids at that boundary
    (sentinels and <unk> take reserved negatives), so the
    materialized stream and every model join key are ints, not
    strings.  The id-assigning window runs over the ≤vocab_k rows
    that survive the distributed top-k, never the corpus."""
    tk = F.concat(
        F.array(F.lit("<s>")),
        tokens_col(F.lower(F.col(text_col))),
        F.array(F.lit("</s>")),
    )
    with_tk = docs.select("doc_id", tk.alias("tk"))
    raw_bg = with_tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS a, element_at(tk, i + 1) AS b))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))

    freq = (
        with_tk.select(F.explode("tk").alias("tok"))
        .where(~F.col("tok").isin("<s>", "</s>"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # vocab ids dictionary-encode the heavy stream: the checkpointed
    # bigram rows and every model join key are ints, not strings
    # (sentinels/<unk> get reserved negative ids)
    from pyspark.sql.window import Window

    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_k)
        .withColumn(
            "_vid",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("tok").asc())
            ),
        )
        .select("tok", "_vid")
    )

    def _map(side: str) -> DataFrame:
        v = vocab.select(F.col("tok").alias(side), F.col("_vid").alias(f"_vid_{side}"))
        return F.broadcast(v)

    def _enc(side: str):
        return (
            F.when(F.col(side) == "<s>", F.lit(-2))
            .when(F.col(side) == "</s>", F.lit(-3))
            .when(F.col(f"_vid_{side}").isNotNull(), F.col(f"_vid_{side}"))
            .otherwise(F.lit(-1))
        )

    from terminus_server_spark.checkpoint import plan_checkpoint

    mapped = plan_checkpoint(
        raw_bg.join(_map("a"), "a", "left_outer")
        .join(_map("b"), "b", "left_outer")
        .select("doc_id", _enc("a").alias("w1"), _enc("b").alias("w2"))
    )
    c2 = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = mapped.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vv = mapped.agg(F.countDistinct("w2").alias("v"))

    lp = F.log(
        (F.col("c2").cast("double") + F.lit(float(add_k)))
        / (
            F.col("c1").cast("double")
            + F.lit(float(add_k)) * F.col("v").cast("double")
        )
    ).cast("decimal(28,12)")
    scored = (
        mapped.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vv))
        .select("doc_id", lp.alias("lp"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("lp").alias("_s"),
    )
    avg = F.col("_s").cast("double") / F.col("n_bigrams").cast("double")
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("perplexity"),
    )


def hashed_tf(docs: DataFrame, n_buckets: int = 64, text_col: str = "text") -> DataFrame:
    """(doc_id, bucket, tf): hashing-trick term-frequency features —
    the fixed-width input a downstream (quality/topic) classifier
    trains on without ever materializing a vocabulary.  Bucket =
    md5-derived integer mod n_buckets (the repo's engine-portable
    hash convention), tf = token count per (doc, bucket); one explode
    + one map-side-combining aggregate keyed (doc_id, bucket), so the
    shuffle carries at most n_buckets rows per document at any
    corpus size."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col(text_col)))).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )
    return toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def lang_id_confidence(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, best_hits, margin, confident): language ID
    with a decision margin — best profile score minus runner-up,
    normalized by token count.  Trainers threshold on the margin
    (CLD/fastText expose the same signal); low-margin docs route to
    the mixed/und bucket instead of polluting a language shard.  Same
    JVM-side per-doc argmax shape as :func:`lang_id`, one extra
    greatest() over the K-1 non-best scores."""
    toks = tokens_col(F.lower(F.col(text_col)))
    langs = ("en", "es", "de", "fr")

    def _hits(arr):
        return F.filter(toks, lambda x: F.array_contains(arr, x))

    hit_cols = [
        F.size(_hits(F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
        .cast("bigint")
        .alias(f"hits_{lang}")
        for lang in langs
    ]
    scored = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("n_tokens"), *hit_cols
    )
    cols = [F.col(f"hits_{lang}") for lang in langs]
    best = F.greatest(*cols)
    pred = (
        F.when(best == 0, "und")
        .when(F.col("hits_en") == best, "en")
        .when(F.col("hits_es") == best, "es")
        .when(F.col("hits_de") == best, "de")
        .otherwise("fr")
    )
    # runner-up = max over scores strictly below best, or best again
    # when two languages tie (margin 0 — the ambiguous case)
    others = F.array(*cols)
    runner = F.array_max(
        F.when(
            F.size(F.filter(others, lambda x: x == best)) > 1,
            others,
        ).otherwise(F.filter(others, lambda x: x < best))
    )
    margin = (best - F.coalesce(F.when(runner == best, best), runner, F.lit(0))) / F.greatest(
        F.col("n_tokens"), F.lit(1)
    )
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("best_hits"),
        F.round(margin, 6).alias("margin"),
        ((best > 0) & (margin > 0.01)).alias("confident"),
    )


def kneser_ney_score(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob_kn): interpolated Kneser-Ney
    bigram scoring — the LM-quality dimension with the smoothing
    real LM toolkits use (absolute discounting + continuation
    probability) instead of add-k.  Self-trained on the corpus, so
    every scored bigram exists in the model and the unseen-event
    branch never fires:

        P(b|a) = (c(a,b) - D)/c(a) + (D·N1+(a·)/c(a)) · (N1+(·b)/|bigram types|)

    with D = 0.75 (exact in binary, so the arithmetic is
    engine-reproducible).  The model is three aggregates over the
    (a, b) count table plus one scalar; scoring joins the document
    bigram stream to the model key-partitioned on (a, b); the per-doc
    log sum is decimal-pinned.  The continuation count N1+(·b) is
    what distinguishes KN: a token seen often but only after one
    context (e.g. "Francisco") scores low as a novel continuation."""
    tk = F.concat(
        F.array(F.lit("<s>")),
        tokens_col(F.lower(F.col(text_col))),
        F.array(F.lit("</s>")),
    )
    bg = (
        docs.select("doc_id", tk.alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(element_at(tk, i) AS a, element_at(tk, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    from terminus_server_spark.checkpoint import plan_checkpoint

    bg = plan_checkpoint(bg)
    cab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cab = plan_checkpoint(cab)
    ca = cab.groupBy("a").agg(F.sum("c").cast("bigint").alias("ca"))
    nf = cab.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("nf"))
    np_ = cab.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    nt = cab.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    d = F.lit(discount)
    p = (
        cab.join(ca, "a")
        .join(nf, "a")
        .join(np_, "b")
        .crossJoin(nt)
        .select(
            "a",
            "b",
            (
                (F.col("c").cast("double") - d) / F.col("ca").cast("double")
                + ((d * F.col("nf").cast("double")) / F.col("ca").cast("double"))
                * (F.col("np").cast("double") / F.col("nt").cast("double"))
            ).alias("p"),
        )
    )
    return (
        bg.join(p, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.log("p").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob_kn"),
        )
    )


def ccnet_buckets(
    docs: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """(doc_id, lang, perplexity, bucket ∈ head/middle/tail): the
    CCNet bucketing step — documents split into per-LANGUAGE
    perplexity terciles (Wenzek et al., CCNet: head = the most
    LM-like third, tail = the noisiest; pipelines typically train on
    head+middle and drop or down-weight tail).

    Perplexity is :func:`bigram_perplexity`'s corpus-trained score;
    tercile assignment is EXACT integer rank arithmetic — bucket =
    floor(3·(rank−1)/n) over a per-language (perplexity, doc_id)
    window — never an interpolated approximate quantile, so the same
    document lands in the same bucket on any engine or partitioning.
    One window per language partition; the frame never exceeds the
    language's document count."""
    from pyspark.sql.window import Window

    ppl = bigram_perplexity(docs, text_col).select("doc_id", "perplexity")
    scored = docs.select("doc_id", F.col(lang_col).alias("lang")).join(ppl, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("perplexity").asc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
    )
    # true integer floor division — a double quotient could misplace
    # a tercile boundary once (rk-1)*3 passes 2^53
    idx = F.expr("((_rk - 1) * 3) div _n")
    return ranked.select(
        "doc_id",
        "lang",
        "perplexity",
        F.when(idx == 0, F.lit("head"))
        .when(idx == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_word_frac, n_stopwords, keep): the Gopher
    repetition-independent quality rules (Rae et al., Gopher §A1.1)
    as one codegen'd projection — the composite page-level filter a
    pretraining pipeline runs after language ID:

    - 50 ≤ word count ≤ 100 000
    - 3 ≤ mean word length ≤ 10
    - (# of '#' or '…'-ish symbols) / words ≤ 0.1
    - ≤ 90 % of lines start with a bullet; ≤ 30 % end with '...'
    - ≥ 80 % of words contain an alphabetic character
    - ≥ 2 distinct stop words present

    Every signal is an exact integer ratio over the same whitespace
    tokenization the rest of the module uses, so the verdict is
    engine-portable; one map-side pass, no shuffle."""
    toks = tokens_col(F.lower(F.col(text_col)))
    n_words = F.size(toks)
    word_lens = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_wl = word_lens.cast("double") / n_words.cast("double")
    n_sym = (
        F.size(F.split(F.col(text_col), "#", -1))
        - 1
        + F.size(F.split(F.col(text_col), r"\.\.\.", -1))
        - 1
    )
    sym_ratio = n_sym.cast("double") / n_words.cast("double")
    lines = F.split(F.col(text_col), "\n", -1)
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("-")
            | F.trim(ln).startswith("*")
            | F.trim(ln).startswith("•"),
        )
    )
    ellipsis = F.size(F.filter(lines, lambda ln: F.rtrim(ln).endswith("...")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    out = docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet.cast("double") / n_lines.cast("double"), 6).alias("bullet_frac"),
        F.round(ellipsis.cast("double") / n_lines.cast("double"), 6).alias(
            "ellipsis_frac"
        ),
        F.round(alpha_words.cast("double") / n_words.cast("double"), 6).alias(
            "alpha_word_frac"
        ),
        stop_hits.cast("int").alias("n_stopwords"),
    )
    keep = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stopwords") >= 2)
    )
    return out.withColumn("keep", keep)


def lang_segments(
    docs: DataFrame, text_col: str = "text", sep: str = "\n"
) -> DataFrame:
    """(doc_id, dom_lang, dom_frac, n_langs, code_switched): per-LINE
    language identification aggregated to a document-level
    code-switching signal — multilingual pipelines segment documents
    before routing (a page that is 60 % English / 40 % German should
    not train the English bucket whole).  Each line gets the same
    stopword-profile argmax as :func:`lang_id`; the document reports
    its dominant line language, the fraction of lines it covers, the
    count of distinct identified languages, and a code_switched
    verdict (≥ 2 languages and dominance < 0.9).

    One explode + one grouped aggregation, all JVM-side; state is
    bounded by the line count."""
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), sep)).alias("_line")
    )
    toks = tokens_col(F.lower(F.col("_line")))

    def hits(lang):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    best = F.greatest(*[hits(lg) for lg in ("en", "es", "de", "fr")])
    line_lang = (
        F.when(best == 0, "und")
        .when(hits("en") == best, "en")
        .when(hits("es") == best, "es")
        .when(hits("de") == best, "de")
        .otherwise("fr")
    )
    per_line = lines.select("doc_id", line_lang.alias("_lang"))
    counts = per_line.groupBy("doc_id", "_lang").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("_c").desc(), F.col("_lang").asc())
    agg = counts.groupBy("doc_id").agg(
        F.sum("_c").alias("_total"),
        F.sum(F.when(F.col("_lang") != "und", 1).otherwise(0)).alias("n_langs"),
    )
    dom = (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id", F.col("_lang").alias("dom_lang"), F.col("_c").alias("_dom"))
    )
    return (
        dom.join(agg, "doc_id")
        .select(
            "doc_id",
            "dom_lang",
            F.round(F.col("_dom").cast("double") / F.col("_total").cast("double"), 6).alias(
                "dom_frac"
            ),
            F.col("n_langs").cast("int").alias("n_langs"),
            (
                (F.col("n_langs") >= 2)
                & (F.col("_dom").cast("double") / F.col("_total").cast("double") < 0.9)
            ).alias("code_switched"),
        )
    )


def classifier_score(
    docs: DataFrame, n_buckets: int = 64, text_col: str = "text"
) -> DataFrame:
    """(doc_id, logit, score): linear-classifier INFERENCE over
    hashed term-frequency features — the apply-a-trained-quality-
    model step (fastText/logistic quality filters à la CCNet's LM or
    DCLM's classifier) expressed as the plan it should be at 100 TB:
    the weight vector is a BROADCAST table, the dot product is one
    (doc, bucket) join + sum, the corpus is touched once, map-side.

    Weights here are a deterministic stand-in (md5-derived ±1e6
    fixed-point per bucket — a trained vector drops in as the same
    (bucket, w9) table); the dot accumulates in exact integers and
    only the final sigmoid divides, rounded to 6 — engine-portable
    inference, not just engine-portable features."""
    from pyspark.sql.functions import broadcast

    spark = docs.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    # ±0.000001..1.0 fixed-point weight from the bucket id's md5:
    # sign from the low bit, magnitude from the next 20 bits
    h = F.conv(F.substring(F.md5(F.col("bucket").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    w9 = F.when(h % 2 == 0, (h % 1000000) + 1).otherwise(-((h % 1000000) + 1))
    weights = broadcast(buckets.select("bucket", w9.alias("w9")))
    tf = hashed_tf(docs, n_buckets=n_buckets, text_col=text_col)
    logit9 = F.sum(F.col("tf") * F.col("w9"))
    scored = (
        tf.join(weights, "bucket")
        .groupBy("doc_id")
        .agg(logit9.alias("_l9"))
        .select(
            "doc_id",
            F.round(F.col("_l9").cast("double") / F.lit(1e6), 6).alias("logit"),
        )
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit") / F.lit(100.0)))
    return scored.select("doc_id", "logit", F.round(sig, 6).alias("score"))


# ---------------------------------------------------------------------------
# HTML stripping, mojibake detection, sentence segmentation
# ---------------------------------------------------------------------------

_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: decoding it earlier would double-decode &amp;lt;
]


def html_strip(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cleaned, n_tags): strip markup from an HTML-ish text
    column — the first step of every web-corpus pipeline (tags out,
    core entities decoded, whitespace re-collapsed).  Script/style
    elements drop WITH their content (their text is code, not prose);
    remaining ``<...>`` tags drop keeping their inner text; the six
    core entities decode in fixed order with ``&amp;`` LAST so
    ``&amp;lt;`` becomes the literal ``&lt;`` (single-pass decode
    semantics, not recursive).  All regexp/replace built-ins — one
    map stage, no UDF, trivially mirrored in any engine."""
    t = F.col(text_col)
    t = F.regexp_replace(t, r"(?is)<(script|style)[^>]*>.*?</(script|style)\s*>", " ")
    n_tags = F.size(F.split(t, r"<[^>]+>")) - 1
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return docs.select(
        F.col(id_col), t.alias("cleaned"), n_tags.cast("int").alias("n_tags")
    )


# the visible markers of UTF-8 text decoded as Latin-1/CP1252:
# lead bytes 0xC3/0xC2 render as A-tilde/A-circumflex, and the
# 0xE2 0x80 xx (general punctuation) sequences start with a-circumflex
# + euro sign.  Printable-marker heuristic — deliberately no byte
# ranges, so the same pattern string is valid Java regex and RE2.
MOJIBAKE_PATTERN = "\u00c3|\u00c2|\u00e2\u20ac"


def mojibake_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_replacement, n_mojibake, verdict): encoding-damage
    signals — the U+FFFD replacement character (a decoder already
    gave up) and the classic UTF-8-read-as-Latin-1 marker characters
    (A-tilde / A-circumflex lead bytes, a-circumflex+euro punctuation
    sequences).  Cheap split-count algebra, no UDF; ``verdict``
    buckets docs for the quality gate (any replacement char or >= 2
    mojibake markers -> 'suspect')."""
    t = F.col(text_col)
    n_repl = F.size(F.split(t, "\ufffd")) - 1
    n_moji = F.size(F.split(t, MOJIBAKE_PATTERN)) - 1
    verdict = F.when(
        (n_repl > 0) | (n_moji >= 2), F.lit("suspect")
    ).otherwise(F.lit("clean"))
    return docs.select(
        F.col(id_col),
        n_repl.cast("int").alias("n_replacement"),
        n_moji.cast("int").alias("n_mojibake"),
        verdict.alias("verdict"),
    )


def sentence_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_sentences, n_tokens, avg_sentence_tokens): sentence
    segmentation on terminal-punctuation runs ([.!?]+ + whitespace or
    end) with per-doc length stats — the unit every
    readability/quality/chunking step downstream consumes.  Pure
    split/filter/aggregate algebra over the exploded sentence array;
    one map stage (the aggregate collapses in-place, the array never
    shuffles)."""
    t = F.col(text_col)
    sents = F.filter(
        F.split(t, r"[.!?]+(\s+|$)"), lambda s: F.trim(s) != ""
    )
    n_sent = F.size(sents)
    n_tok = F.size(
        F.filter(F.split(F.trim(t), r"[\s.!?]+"), lambda s: s != "")
    )
    return docs.select(
        F.col(id_col),
        n_sent.cast("int").alias("n_sentences"),
        n_tok.cast("int").alias("n_tokens"),
        F.when(
            n_sent > 0, F.round(n_tok.cast("double") / n_sent.cast("double"), 6)
        ).alias("avg_sentence_tokens"),
    )



# homoglyph / confusable normalization map (the high-frequency Cyrillic
# and Greek lookalikes plus zero-width characters) — string-to-string
# translate pairs shared verbatim with the oracle
CONFUSABLES = [
    ("\u0430", "a"), ("\u0435", "e"), ("\u043e", "o"), ("\u0440", "p"),
    ("\u0441", "c"), ("\u0445", "x"), ("\u0443", "y"),
    ("\u03bf", "o"), ("\u0391", "A"), ("\u0392", "B"), ("\u0395", "E"),
]
ZERO_WIDTH = ["\u200b", "\u200c", "\u200d", "\ufeff"]


def confusable_normalize(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, normalized, n_confusables, n_zero_width): homoglyph /
    confusable normalization — the anti-obfuscation step before
    hashing or blocklist matching (Cyrillic '\u0430' passes every
    ASCII filter while reading as 'a'; zero-width characters split
    tokens invisibly).  A fixed translate table maps the
    high-frequency lookalikes to their ASCII targets and strips
    zero-width characters, counting both so the damage rate is a
    quality signal.  Pure translate/replace built-ins, no UDF, table
    shared verbatim with the oracle."""
    t = F.col(text_col)
    src = "".join(c for c, _ in CONFUSABLES)
    dst = "".join(r for _, r in CONFUSABLES)
    n_conf = F.length(t) - F.length(F.translate(t, src, ""))
    zw = "".join(ZERO_WIDTH)
    n_zw = F.length(t) - F.length(F.translate(t, zw, ""))
    normalized = F.translate(F.translate(t, zw, ""), src, dst)
    return docs.select(
        F.col(id_col),
        normalized.alias("normalized"),
        n_conf.cast("int").alias("n_confusables"),
        n_zw.cast("int").alias("n_zero_width"),
    )


def luhn_card_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_candidates, n_luhn_valid, scrubbed): payment-card
    detection with the Luhn checksum — the PII category where a bare
    digit-run regex drowns in false positives (order ids, phone
    numbers): MAXIMAL digit runs of 13–16 digits are CANDIDATES, and
    only runs passing the mod-10 double-every-second-digit check
    count as cards and get redacted.

    Candidates come from splitting on non-digit runs — maximal-run
    extraction, so adjacent cards separated by one character are both
    found (a boundary-consuming regex misses the second) and a longer
    digit run containing card-like substrings is NOT a candidate.
    RE2 has no lookarounds, so this split formulation is what keeps
    the operator engine-portable.  The checksum is pure array algebra
    (reverse, conditional double with the 9-subtract fold, digit
    sum); scrubbing folds a boundary-anchored regexp_replace over the
    valid runs so embedded occurrences inside longer runs stay
    untouched.  Known limit: two ADJACENT occurrences of the same
    card value one character apart share a boundary and the global
    replace pass may keep the second — rerun for adversarial inputs.
    """
    runs = f"filter(split({text_col}, '[^0-9]+'), x -> length(x) between 13 and 16)"
    luhn_sum = (
        "aggregate(transform(sequence(1, length(x)), i -> "
        "  CASE WHEN i % 2 = 0 "
        "       THEN CASE WHEN CAST(substring(reverse(x), i, 1) AS INT) * 2 > 9 "
        "                 THEN CAST(substring(reverse(x), i, 1) AS INT) * 2 - 9 "
        "                 ELSE CAST(substring(reverse(x), i, 1) AS INT) * 2 END "
        "       ELSE CAST(substring(reverse(x), i, 1) AS INT) END), "
        " CAST(0 AS INT), (acc, d) -> acc + d)"
    )
    valid_expr = f"filter({runs}, x -> ({luhn_sum}) % 10 = 0)"
    scrub_expr = (
        f"aggregate(array_distinct({valid_expr}), {text_col}, (acc, x) -> "
        "regexp_replace(acc, concat('(^|[^0-9])', x, '($|[^0-9])'), '$1<CARD>$2'))"
    )
    return docs.select(
        F.col(id_col),
        F.size(F.expr(runs)).cast("int").alias("n_candidates"),
        F.size(F.expr(valid_expr)).cast("int").alias("n_luhn_valid"),
        F.expr(scrub_expr).alias("scrubbed"),
    )


def kneser_ney_trigram_score(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """(doc_id, n_trigrams, avg_logprob_kn3): THREE-level interpolated
    Kneser-Ney (Chen & Goodman's recursive form) — the trigram model
    real LM toolkits default to, built entirely from count algebra:

        P(c|a,b) = (c(abc)−D)/c(ab·) + D·N1+(ab·)/c(ab·) · P(c|b)
        P(c|b)   = (N1+(·bc)−D)/N1+(·b·) + D·N1+(b·)/N1+(·b·) · P(c)
        P(c)     = N1+(·c) / N1+(··)

    where the LOWER levels use continuation (type) counts, not raw
    counts — the KN signature.  Self-trained on the corpus, so every
    scored trigram exists and every discounted numerator stays
    positive (counts ≥ 1 > D = 0.75, exact in binary).  Model: five
    aggregates over the trigram count table + one scalar; scoring is
    one (a,b,c)-keyed join; per-doc log sums are decimal-pinned, so
    the whole model is engine-reproducible."""
    from terminus_server_spark.checkpoint import plan_checkpoint

    tk = F.concat(
        F.array(F.lit("<s>"), F.lit("<s>")),
        tokens_col(F.lower(F.col(text_col))),
        F.array(F.lit("</s>")),
    )
    tg = (
        docs.select("doc_id", tk.alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 2),"
                    " i -> struct(element_at(tk, i) AS a,"
                    " element_at(tk, i + 1) AS b, element_at(tk, i + 2) AS c))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b", "p.c")
    )
    tg = plan_checkpoint(tg)
    c3 = plan_checkpoint(
        tg.groupBy("a", "b", "c").agg(F.count(F.lit(1)).cast("bigint").alias("c3"))
    )
    ctx3 = c3.groupBy("a", "b").agg(F.sum("c3").cast("bigint").alias("ctx3"))
    nf3 = c3.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("nf3"))
    # middle level: continuation counts over (b, c)
    cc2 = plan_checkpoint(
        c3.groupBy("b", "c").agg(F.count(F.lit(1)).cast("bigint").alias("cc2"))
    )
    ctx2 = cc2.groupBy("b").agg(F.sum("cc2").cast("bigint").alias("ctx2"))
    nf2 = cc2.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("nf2"))
    # unigram level: continuation counts over c
    cc1 = cc2.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("cc1"))
    n1 = cc1.agg(F.sum("cc1").cast("bigint").alias("n1"))
    d = F.lit(discount)
    dbl = lambda c: F.col(c).cast("double")
    p1 = dbl("cc1") / dbl("n1")
    p2 = (dbl("cc2") - d) / dbl("ctx2") + ((d * dbl("nf2")) / dbl("ctx2")) * p1
    p3 = (dbl("c3") - d) / dbl("ctx3") + ((d * dbl("nf3")) / dbl("ctx3")) * p2
    model = (
        c3.join(ctx3, ["a", "b"])
        .join(nf3, ["a", "b"])
        .join(cc2, ["b", "c"])
        .join(ctx2, "b")
        .join(nf2, "b")
        .join(cc1, "c")
        .crossJoin(n1)
        .select("a", "b", "c", p3.alias("p"))
    )
    return (
        tg.join(model, ["a", "b", "c"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.round(
                F.sum(F.log("p").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob_kn3"),
        )
    )



def code_detect(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_code_symbols, symbol_ratio, n_code_keywords,
    verdict): code-vs-prose classification — the routing decision a
    mixed crawl makes before language-specific quality filters (code
    needs different dedup grain, different perplexity norms, its own
    mixture weight).  Two cheap signals: programming punctuation
    density ({};()=<> per char) and a fixed keyword list hit count
    (def/function/return/import/var/const) — both pure split/filter
    algebra, thresholds tuned for high precision ('code' only when
    both fire)."""
    t = F.col(text_col)
    n_sym = F.length(t) - F.length(F.translate(t, "{};()=<>[]", ""))
    ratio = F.when(
        F.length(t) > 0,
        F.round(n_sym.cast("double") / F.length(t).cast("double"), 6),
    ).otherwise(F.lit(0.0))
    kw = F.size(
        F.filter(
            F.split(F.lower(t), r"[^a-z_]+"),
            lambda x: x.isin(
                "def", "function", "return", "import", "var", "const",
                "class", "void", "println",
            ),
        )
    )
    verdict = F.when((ratio > 0.03) & (kw >= 2), F.lit("code")).otherwise(
        F.lit("prose")
    )
    return docs.select(
        F.col(id_col),
        n_sym.cast("int").alias("n_code_symbols"),
        ratio.alias("symbol_ratio"),
        kw.cast("int").alias("n_code_keywords"),
        verdict.alias("verdict"),
    )


def rake_keyphrases(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, phrase, score): RAKE keyphrase extraction (Rose et
    al. 2010) — candidate phrases are maximal runs of non-stopword
    tokens; each word scores degree/frequency within its document
    (degree = Σ length of phrases containing it, frequency = its
    phrase-word count), a phrase scores the sum of its words, and the
    top ``k`` phrases per document survive (score desc, phrase asc
    tie-break).  The multi-word complement of tf-idf keyword
    extraction: RAKE rewards words that co-occur inside long
    candidate phrases, so 'distributed stream processing' outranks
    its unigrams.

    Candidates split at BOTH stopwords and punctuation (Rose et al.
    2010 §1.2.1): any non-[a-z0-9] run is rewritten to a sentinel
    break token before tokenizing, so "processing." delimits the
    phrase and "the," is recognized as a stopword — phrases never
    span sentence boundaries and tokens carry no attached
    punctuation.

    Exactness: per-word scores floor onto a 1e-6 grid BEFORE the
    phrase sum, so phrase scores are order-free integer sums (a raw
    double Σ deg/freq would depend on summation order).  Dataflow:
    one explode, one islands pass (stopword/punct-delimited runs via
    the pos − row_number trick), two (doc, word)-grained aggregates,
    one per-doc top-k window — no joins beyond the doc key."""
    from pyspark.sql.window import Window

    stops = STOPWORDS["en"]
    brk = "\u0001"  # phrase-break sentinel: consumes a position, never scores
    cleaned = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]+", f" {brk} ")
    )
    toks = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(F.split(cleaned, r"\s+")).alias("pos", "w"),
        )
        .where(
            ~F.col("w").isin(stops) & (F.length("w") > 0) & (F.col("w") != brk)
        )
    )
    rn = F.row_number().over(Window.partitionBy(id_col).orderBy("pos"))
    runs = toks.withColumn("grp", F.col("pos") - rn)
    phrases = runs.groupBy(id_col, "grp").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    members = runs.join(phrases, [id_col, "grp"]).select(id_col, "grp", "w", "plen")
    wstats = members.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    wscore = wstats.select(
        id_col,
        "w",
        F.floor(
            F.col("deg").cast("double") / F.col("freq").cast("double") * F.lit(1e6)
        ).cast("bigint").alias("ws"),
    )
    pscore = (
        members.join(wscore, [id_col, "w"])
        .groupBy(id_col, "grp")
        .agg(F.sum("ws").alias("score_i"))
        .join(phrases.select(id_col, "grp", "phrase"), [id_col, "grp"])
    )
    wtop = Window.partitionBy(id_col).orderBy(F.col("score_i").desc(), F.col("phrase").asc())
    return (
        pscore.withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= k)
        .select(
            id_col,
            "phrase",
            (F.col("score_i").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


def script_composition(docs, text_col: str = "text", key_col: str = "doc_id"):
    """(key, latin, cyrillic, greek, cjk, other, dominant): Unicode
    SCRIPT composition per document + the dominant script label —
    the routing signal beside language-ID that survives transliterated
    or mixed-script spam (a "Russian" doc written in Latin homoglyphs
    scores latin-dominant here and cyrillic-dominant in langid —
    exactly the disagreement a curation pipeline flags; complements
    text_confusables' normalization).  Counts are letter-class chars
    per explicit codepoint range (portable literal ranges, not
    engine-specific \\p{script=} syntax), dominant = argmax with
    fixed label-order tie-break, all map-side rlike/regexp_replace —
    whole-stage codegen, no UDF, no shuffle."""
    t = F.col(text_col)

    def cnt(rng):
        return F.length(F.regexp_replace(t, f"[^{rng}]", ""))

    latin = cnt("A-Za-z")
    cyr = cnt("Ѐ-ӿ")
    grk = cnt("Ͱ-Ͽ")
    cjk = cnt("一-鿿")
    letters = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    other = letters - latin - cyr - grk - cjk
    scripts = [("latin", latin), ("cyrillic", cyr), ("greek", grk),
               ("cjk", cjk)]
    # fixed label order with strict > : earlier labels win ties
    dom = F.lit("none")
    dom_n = F.lit(-1).cast("bigint")
    for name, c in scripts:
        take = c > dom_n
        dom = F.when(take, F.lit(name)).otherwise(dom)
        dom_n = F.when(take, c).otherwise(dom_n)
    dom = F.when(dom_n <= 0, F.lit("none")).otherwise(dom)
    return docs.select(
        F.col(key_col),
        latin.cast("bigint").alias("latin"),
        cyr.cast("bigint").alias("cyrillic"),
        grk.cast("bigint").alias("greek"),
        cjk.cast("bigint").alias("cjk"),
        other.cast("bigint").alias("other"),
        dom.alias("dominant"),
    )
