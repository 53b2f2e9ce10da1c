"""BPE vocabulary training and application (byte-pair-encoding) as
pure DataFrame algebra — the tokenizer step of an LLM data pipeline
(Sennrich et al. 2016), distributed without a driver-side corpus
pass.

Each merge round is:

1. count adjacent symbol pairs across the (word, freq) vocabulary —
   one zip_with over each word's symbol array + explode + keyed agg
   (map-side partial);
2. pick the max-count pair (count desc, pair asc — fully
   deterministic tie-break) — a 1-row TakeOrdered, broadcast;
3. rewrite every word, merging non-overlapping occurrences of the
   pair left-to-right.

Step 3 is the part engines usually do imperatively.  The greedy
left-to-right rule is: within each maximal run of consecutive match
positions, every odd-indexed position merges.  Runs longer than one
only occur when the pair is (x, x) — for a != b, adjacent matches
would force a == b.  That rule is exactly a left-to-right fold over
the symbol array (merge when the last emitted symbol equals ``a``,
was not itself produced by a merge this round, and the current
symbol equals ``b``), so the rewrite is ONE ``aggregate``
higher-order function per round: no explode, no windows, no shuffle
— a narrow projection whose per-word cost is the word length.  The
same rule is expressible in ANSI SQL (gaps-and-islands over exploded
positions), so both training and application keep bit-exact unrolled
oracles, unusual for a tokenizer.

Scale shape: the only shuffles are the initial vocabulary aggregate
and one pair-count aggregate per round (map-side partial, keyed by
the symbol pair); the chosen pair is a broadcast scalar and the
rewrite is embarrassingly parallel.  Training vocabulary is capped
upstream by a distributed top-k; application runs over the DISTINCT
word set and joins token counts back to the corpus, so the heavy
stream is touched once per doc, not once per merge round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window

from terminus_server_spark.checkpoint import plan_checkpoint


def _chars_col(word_col: str):
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
    )


def _pairs_col(syms_col: str = "syms"):
    """array<struct<a,b>> of adjacent symbol pairs — zip_with over the
    two off-by-one slices (empty for single-symbol words; ``sequence``
    would wrongly emit a DESCENDING [1,0] there)."""
    return F.expr(
        f"zip_with(slice({syms_col}, 1, size({syms_col}) - 1),"
        f" slice({syms_col}, 2, size({syms_col}) - 1),"
        " (x, y) -> struct(x AS a, y AS b))"
    )


def _merged_syms_col(syms_col: str = "syms", a_col: str = "ba", b_col: str = "bb"):
    """Greedy left-to-right non-overlapping merge of (a, b) inside the
    symbol array, as one fold: merge when the previous emitted symbol
    equals ``a``, the current equals ``b``, and the previous was not
    itself created by a merge this round (``lm`` — a consumed symbol
    cannot start another merge; string equality alone already rules
    the merged token out since it is strictly longer than ``a``, the
    flag pins the documented island-parity semantics explicitly).
    NULL ``a``/``b`` (a group with no chosen pair this round) takes
    the else branch everywhere: the word passes through unchanged."""
    return F.expr(
        f"""aggregate(
          {syms_col},
          struct(cast(array() as array<string>) AS acc, false AS lm),
          (st, s) -> IF(NOT st.lm AND size(st.acc) > 0
                        AND element_at(st.acc, -1) = {a_col} AND s = {b_col},
                        struct(concat(slice(st.acc, 1, size(st.acc) - 1),
                                      array(concat({a_col}, {b_col}))) AS acc,
                               true AS lm),
                        struct(concat(st.acc, array(s)) AS acc, false AS lm)),
          st -> st.acc)"""
    )


def _initial_words(docs: DataFrame, text_col: str, top_words: int) -> DataFrame:
    """(word, freq, syms): top-`top_words` whitespace tokens of the
    lowercased corpus (count desc, word asc — a distributed
    TakeOrderedAndProject, never a single-partition window), each
    split into single-character symbols."""
    from terminus_server_spark.operators.text import tokens_col

    wf = (
        docs.select(F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(top_words)
    )
    return wf.select("word", "freq", _chars_col("word").alias("syms"))


def _rewrite(words: DataFrame, best: DataFrame) -> DataFrame:
    """Merge non-overlapping (ba, bb) occurrences left-to-right in
    every word — a narrow projection (one fold per word), no shuffle.
    ``best`` is the 1-row chosen pair; an empty ``best`` (no adjacent
    pair anywhere — every word already one symbol) empties the
    vocabulary, matching the exploded formulation this replaces."""
    return words.crossJoin(
        F.broadcast(best.select(F.col("a").alias("ba"), F.col("b").alias("bb")))
    ).select("word", "freq", _merged_syms_col().alias("syms"))


def _train(
    docs: DataFrame, text_col: str, rounds: int, top_words: int
) -> tuple[list[DataFrame], list[DataFrame]]:
    """Returns ([best_r one-row frames], [merge-table rows])."""
    words = _initial_words(docs, text_col, top_words).transform(plan_checkpoint)
    bests, merges = [], []
    for r in range(1, rounds + 1):
        best = (
            words.select("freq", F.explode(_pairs_col()).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
        ).transform(plan_checkpoint)
        bests.append(best)
        merges.append(
            best.select(
                F.lit(r).alias("rnd"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("c").alias("pair_count"),
            )
        )
        words = _rewrite(words, best)
    return bests, merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    top_words: int = 200,
) -> DataFrame:
    """(rnd, sym_a, sym_b, pair_count): the learned merge table —
    one row per round, the pair merged and its corpus-weighted
    adjacency count at the time it was chosen."""
    _, merges = _train(docs, text_col, rounds, top_words)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("rnd")


def bpe_apply(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    top_words: int = 200,
) -> DataFrame:
    """(doc_id, n_words, n_chars, n_bpe_tokens): tokenize every
    document with the merge table learned from the corpus's own
    top-`top_words` vocabulary — merges train on the capped
    vocabulary but APPLY to every distinct word, then per-word token
    counts join back to the exploded corpus (tokenization depends
    only on the word, so the rewrite cost is |distinct words|, not
    |corpus| — and each merge round is a narrow fold, so the whole
    application is one distinct + one projection + one join)."""
    bests, _ = _train(docs, text_col, rounds, top_words)
    from terminus_server_spark.operators.text import tokens_col

    corpus = docs.select(
        F.col(id_col), F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word")
    ).where(F.col("word") != "")
    all_words = (
        corpus.select("word")
        .distinct()
        .select("word", F.lit(1).cast("long").alias("freq"),
                _chars_col("word").alias("syms"))
    )
    for best in bests:
        all_words = _rewrite(all_words, best)
    counts = all_words.select(
        "word", F.size("syms").alias("w_bpe"), F.length("word").alias("w_chars")
    )
    return (
        corpus.join(counts, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("w_chars").cast("bigint").alias("n_chars"),
            F.sum("w_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
    )

# ---------------------------------------------------------------------------
# per-group (per-language) BPE training
# ---------------------------------------------------------------------------


def _initial_words_grouped(
    docs: DataFrame, text_col: str, group_col: str, top_words: int
) -> DataFrame:
    """(grp, word, freq, syms): per-group top-``top_words``
    vocabulary — the rank is a window PARTITIONED BY the group, so
    every language's vocabulary cap is computed in the same shuffle
    (no per-language job loop; languages are data, not code)."""
    from terminus_server_spark.operators.text import tokens_col

    wf = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("grp", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = wf.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.col("freq").desc(), "word")
        ),
    )
    return ranked.where(F.col("_rk") <= top_words).select(
        "grp", "word", "freq", _chars_col("word").alias("syms")
    )


def _rewrite_grouped(words: DataFrame, best: DataFrame) -> DataFrame:
    """Per-group greedy merge rewrite: ``best`` is (grp, a, b) — one
    chosen pair per group, joined on the group key (broadcast — one
    row per language), then the same narrow fold as the ungrouped
    rewrite.  A group with no chosen pair this round (all words
    already single-symbol) passes through unchanged via the left
    join's NULL pair (the fold's else branch)."""
    return words.join(
        F.broadcast(best.select("grp", F.col("a").alias("ba"), F.col("b").alias("bb"))),
        "grp",
        "left",
    ).select("grp", "word", "freq", _merged_syms_col().alias("syms"))


def bpe_train_grouped(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    rounds: int = 3,
    top_words: int = 100,
) -> DataFrame:
    """(grp, rnd, sym_a, sym_b, pair_count): one BPE merge table PER
    GROUP (per language), trained simultaneously — the multilingual
    tokenizer shape (separate vocabularies per language family, e.g.
    XLM-style per-language BPE) where a per-language driver loop
    would serialize |langs| training runs into one.

    Every round is one shuffle (pair count keyed by (grp, a, b));
    the rewrite is a narrow per-word fold and the chosen pairs are a
    |groups|-row broadcast.  Ties break (count desc, pair asc)
    within each group, so the merge tables are deterministic per
    group and independent across groups."""
    _, merges = _train_grouped(docs, text_col, group_col, rounds, top_words)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("grp", "rnd")


def _train_grouped(docs, text_col, group_col, rounds, top_words):
    """([per-round (grp, a, b) best frames], [merge-table rows])."""
    words = _initial_words_grouped(docs, text_col, group_col, top_words).transform(
        plan_checkpoint
    )
    bests, merges = [], []
    for r in range(1, rounds + 1):
        best = (
            words.select("grp", "freq", F.explode(_pairs_col()).alias("p"))
            .groupBy("grp", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("c"))
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("grp").orderBy(F.col("c").desc(), "a", "b")
                ),
            )
            .where(F.col("_rk") == 1)
            .drop("_rk")
        ).transform(plan_checkpoint)
        bests.append(best)
        merges.append(
            best.select(
                "grp",
                F.lit(r).alias("rnd"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("c").alias("pair_count"),
            )
        )
        words = _rewrite_grouped(words, best)
    return bests, merges


def bpe_fertility_grouped(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    rounds: int = 3,
    top_words: int = 100,
) -> DataFrame:
    """(grp, n_words, n_chars, n_bpe_tokens, fertility,
    chars_per_token): per-language tokenizer FERTILITY audit — train
    each language's merge table (same shared-shuffle grouped
    training), apply it to every distinct (lang, word) of the full
    corpus, and roll corpus-weighted token counts up per language.
    Fertility (BPE tokens per word) and compression (chars per BPE
    token) are THE cross-lingual tokenizer-equity metrics — a
    vocabulary trained per language shows directly which languages
    pay more tokens per word under the same budget.

    The heavy stream is touched once (distinct words rewrite;
    corpus-exploded counts join back), exactly like ``bpe_apply`` —
    the per-round rewrite is a narrow fold, no shuffle."""
    bests, _ = _train_grouped(docs, text_col, group_col, rounds, top_words)
    from terminus_server_spark.operators.text import tokens_col

    corpus = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("word"),
    ).where(F.col("word") != "")
    all_words = (
        corpus.select("grp", "word")
        .distinct()
        .select(
            "grp",
            "word",
            F.lit(1).cast("long").alias("freq"),
            _chars_col("word").alias("syms"),
        )
    )
    for best in bests:
        all_words = _rewrite_grouped(all_words, best)
    counts = all_words.select(
        "grp", "word", F.size("syms").alias("_bpe"), F.length("word").alias("_chars")
    )
    return (
        corpus.join(counts, ["grp", "word"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("_chars").cast("bigint").alias("n_chars"),
            F.sum("_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "grp",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )
