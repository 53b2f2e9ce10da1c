"""BPE vocabulary training and application (byte-pair-encoding) as
pure DataFrame algebra — the tokenizer step of an LLM data pipeline
(Sennrich et al. 2016), distributed without a driver-side corpus
pass.

Each merge round is:

1. count adjacent symbol pairs across the (word, freq) vocabulary —
   one explode + one keyed agg (map-side partial);
2. pick the max-count pair (count desc, pair asc — fully
   deterministic tie-break) — a 1-row TakeOrdered, broadcast;
3. rewrite every word, merging non-overlapping occurrences of the
   pair left-to-right.

Step 3 is the part engines usually do imperatively.  The greedy
left-to-right rule is: within each maximal run of consecutive match
positions, every odd-indexed position merges.  Runs longer than one
only occur when the pair is (x, x) — for a != b, adjacent matches
would force a == b.  That makes the rewrite a gaps-and-islands
computation over exploded symbol positions (two row_number windows
partitioned by word), which is exactly expressible in ANSI SQL — so
both training and application have bit-exact unrolled oracles,
unusual for a tokenizer.

Scale shape: every step shuffles on the word key only (window
partitions and the final re-agg reuse the same partitioning); the
pair-count agg is map-side partial; the chosen pair is a broadcast
scalar.  Training vocabulary is capped upstream by a distributed
top-k; application runs over the DISTINCT word set and joins token
counts back to the corpus, so the heavy stream is touched once per
doc, not once per merge round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from terminus_server_spark.checkpoint import plan_checkpoint

_W_WORD = Window.partitionBy("word").orderBy("i")


def _chars_col(word_col: str):
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
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


def _positions(words: DataFrame) -> DataFrame:
    """(word, freq, i, sym, nxt): exploded 1-based symbol positions
    with the following symbol."""
    return (
        words.select("word", "freq", F.posexplode("syms").alias("i0", "sym"))
        .select("word", "freq", (F.col("i0") + 1).alias("i"), "sym")
        .withColumn("nxt", F.lead("sym").over(_W_WORD))
    )


def _rewrite(pr: DataFrame, best: DataFrame) -> DataFrame:
    """Merge non-overlapping (ba, bb) occurrences left-to-right in
    every word of the exploded-position frame ``pr``; returns the
    re-assembled (word, freq, syms) frame.  Island-parity selection:
    see module docstring."""
    mt = pr.crossJoin(
        F.broadcast(best.select(F.col("a").alias("ba"), F.col("b").alias("bb")))
    ).withColumn("m", (F.col("sym") == F.col("ba")) & (F.col("nxt") == F.col("bb")))
    isl = (
        mt.where("m")
        .select("word", "i")
        .withColumn("island", F.col("i") - F.row_number().over(_W_WORD))
    )
    sel = isl.select(
        "word",
        "i",
        (
            F.row_number().over(Window.partitionBy("word", "island").orderBy("i")) % 2
            == 1
        ).alias("selected"),
    )
    rw = mt.join(sel, ["word", "i"], "left").select(
        "word",
        "freq",
        "i",
        F.when(F.col("selected"), F.concat("ba", "bb"))
        .otherwise(F.col("sym"))
        .alias("sym"),
        F.coalesce(F.lag("selected").over(_W_WORD), F.lit(False)).alias("consumed"),
    )
    return (
        rw.where(~F.col("consumed"))
        .groupBy("word")
        .agg(
            F.min("freq").alias("freq"),
            F.expr(
                "transform(array_sort(collect_list(struct(i, sym))), x -> x.sym)"
            ).alias("syms"),
        )
    ).transform(plan_checkpoint)


def _train(
    docs: DataFrame, text_col: str, rounds: int, top_words: int
) -> tuple[list[DataFrame], list[DataFrame]]:
    """Returns ([best_r one-row frames], [merge-table rows])."""
    words = _initial_words(docs, text_col, top_words).transform(plan_checkpoint)
    bests, merges = [], []
    for r in range(1, rounds + 1):
        pr = _positions(words)
        best = (
            pr.where(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
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
        words = _rewrite(pr, best)
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
    |corpus|)."""
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
    ).transform(plan_checkpoint)
    for best in bests:
        all_words = _rewrite(_positions(all_words), best)
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

_W_GWORD = Window.partitionBy("grp", "word").orderBy("i")


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


def _positions_grouped(words: DataFrame) -> DataFrame:
    return (
        words.select("grp", "word", "freq", F.posexplode("syms").alias("i0", "sym"))
        .select("grp", "word", "freq", (F.col("i0") + 1).alias("i"), "sym")
        .withColumn("nxt", F.lead("sym").over(_W_GWORD))
    )


def _rewrite_grouped(pr: DataFrame, best: DataFrame) -> DataFrame:
    """Per-group greedy merge rewrite: ``best`` is (grp, a, b) — one
    chosen pair per group, joined on the group key (broadcast — one
    row per language).  A group with no chosen pair this round (all
    words already single-symbol) passes through unchanged via the
    left join's NULL match flag."""
    mt = pr.join(
        F.broadcast(best.select("grp", F.col("a").alias("ba"), F.col("b").alias("bb"))),
        "grp",
        "left",
    ).withColumn("m", (F.col("sym") == F.col("ba")) & (F.col("nxt") == F.col("bb")))
    isl = (
        mt.where("m")
        .select("grp", "word", "i")
        .withColumn("island", F.col("i") - F.row_number().over(_W_GWORD))
    )
    sel = isl.select(
        "grp",
        "word",
        "i",
        (
            F.row_number().over(
                Window.partitionBy("grp", "word", "island").orderBy("i")
            )
            % 2
            == 1
        ).alias("selected"),
    )
    rw = mt.join(sel, ["grp", "word", "i"], "left").select(
        "grp",
        "word",
        "freq",
        "i",
        F.when(F.col("selected"), F.concat("ba", "bb"))
        .otherwise(F.col("sym"))
        .alias("sym"),
        F.coalesce(F.lag("selected").over(_W_GWORD), F.lit(False)).alias("consumed"),
    )
    return (
        rw.where(~F.col("consumed"))
        .groupBy("grp", "word")
        .agg(
            F.min("freq").alias("freq"),
            F.expr(
                "transform(array_sort(collect_list(struct(i, sym))), x -> x.sym)"
            ).alias("syms"),
        )
    ).transform(plan_checkpoint)


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

    Every round is still two shuffles (pair count keyed by
    (grp, a, b); rewrite windows keyed by (grp, word)); the chosen
    pairs are a |groups|-row broadcast.  Ties break (count desc,
    pair asc) within each group, so the merge tables are
    deterministic per group and independent across groups."""
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
        pr = _positions_grouped(words)
        best = (
            pr.where(F.col("nxt").isNotNull())
            .groupBy("grp", F.col("sym").alias("a"), F.col("nxt").alias("b"))
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
        words = _rewrite_grouped(pr, best)
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
    per round the rewrite shuffles on (lang, word) only."""
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
    ).transform(plan_checkpoint)
    for best in bests:
        all_words = _rewrite_grouped(_positions_grouped(all_words), best)
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
