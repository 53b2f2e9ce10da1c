"""BPE vocabulary training (byte-pair-encoding merge learning) as
pure DataFrame algebra — the tokenizer-training step of an LLM data
pipeline (Sennrich et al. 2016), distributed without a driver-side
corpus pass.

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
the whole training loop has a bit-exact unrolled oracle, unusual for
a tokenizer trainer.

Scale shape: every step shuffles on the word key only (window
partitions and the final re-agg reuse the same partitioning); the
pair-count agg is map-side partial; the chosen pair is a broadcast
scalar.  Vocabulary is capped upstream by a distributed top-k, so
round cost is O(sum word lengths), independent of corpus size after
the initial frequency count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from terminus_server_spark.checkpoint import plan_checkpoint


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
    return wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    top_words: int = 200,
) -> DataFrame:
    """(rnd, sym_a, sym_b, pair_count): the learned merge table —
    one row per round, the pair merged and its corpus-weighted
    adjacency count at the time it was chosen."""
    words = _initial_words(docs, text_col, top_words).transform(plan_checkpoint)
    w_word = Window.partitionBy("word").orderBy("i")
    merges = []
    for r in range(1, rounds + 1):
        pos = words.select(
            "word", "freq", F.posexplode("syms").alias("i0", "sym")
        ).select("word", "freq", (F.col("i0") + 1).alias("i"), "sym")
        pr = pos.withColumn("nxt", F.lead("sym").over(w_word))
        best = (
            pr.where(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("freq").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
        ).transform(plan_checkpoint)
        merges.append(
            best.select(
                F.lit(r).alias("rnd"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("c").alias("pair_count"),
            )
        )
        mt = pr.crossJoin(
            F.broadcast(best.select(F.col("a").alias("ba"), F.col("b").alias("bb")))
        ).withColumn("m", (F.col("sym") == F.col("ba")) & (F.col("nxt") == F.col("bb")))
        isl = (
            mt.where("m")
            .select("word", "i")
            .withColumn("island", F.col("i") - F.row_number().over(w_word))
        )
        sel = isl.select(
            "word",
            "i",
            (
                F.row_number().over(Window.partitionBy("word", "island").orderBy("i"))
                % 2
                == 1
            ).alias("selected"),
        )
        rw = (
            mt.join(sel, ["word", "i"], "left")
            .select(
                "word",
                "freq",
                "i",
                F.when(F.col("selected"), F.concat("ba", "bb"))
                .otherwise(F.col("sym"))
                .alias("sym"),
                F.coalesce(F.lag("selected").over(w_word), F.lit(False)).alias(
                    "consumed"
                ),
            )
        )
        words = (
            rw.where(~F.col("consumed"))
            .groupBy("word")
            .agg(
                F.min("freq").alias("freq"),
                F.expr(
                    "transform(array_sort(collect_list(struct(i, sym))), x -> x.sym)"
                ).alias("syms"),
            )
        ).transform(plan_checkpoint)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("rnd")
