"""Full-text retrieval operators over the documents corpus
(SURVEY §2.6): inverted-index construction, BM25 ranked search, and a
unigram language-model score (perplexity proxy for quality
filtering).

Parity note: the reference exposes text search through its document
API / datalog words (terminus-server: full-text-ish filtering via
`like`/`re` over literals); a training-data pipeline at 100 TB needs
the real IR primitives, so these follow the standard Lucene/BM25
formulation instead of the reference's regex-only surface.

Scale design:
- the inverted index is a *posting table* ``(tok, doc_id, tf, df,
  cf)`` — the distributed representation of posting lists (sorted /
  bucketed by term on write).  No per-term arrays are ever
  collected, so a hot term ("the") costs rows, not driver memory.
- BM25 for a K-term query is computed map-side: per-document term
  frequencies come from ``size(toks) - size(array_remove(toks, t))``
  column expressions that stay inside whole-stage codegen (no
  explode, no shuffle of the corpus); the corpus
  stats (N, avgdl, per-term df) are one tiny aggregate broadcast
  back with a crossJoin.  The only shuffle is the final top-k
  (TakeOrderedAndProject).
- the unigram LM joins exploded tokens against the term-frequency
  table — at real scale the frequency table is top-K-capped and
  broadcast; sums go through decimal(28,12) so partial-aggregation
  order can never change the result (bit-stable vs the DuckDB
  oracle).

All expressions are built-in ``pyspark.sql.functions`` — JVM codegen,
zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _ltoks(text_col: str = "text"):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Posting table ``(tok, doc_id, tf, df, cf)``.

    tf = term count in the document, df = number of documents
    containing the term, cf = total corpus occurrences.  Built with
    one explode + two aggregations; the df/cf stats join back on the
    term key (already the shuffle key, so AQE can plan it without an
    extra exchange on the posting side).
    """
    post = (
        docs.select("doc_id", F.explode(_ltoks(text_col)).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = post.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    return post.join(stats, "tok").select("tok", "doc_id", "tf", "df", "cf")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for ``query_terms`` under BM25
    (k1=1.2, b=0.75, Lucene-style idf = ln(1 + (N-df+.5)/(df+.5))).

    Map-side tf per query term (fixed small K → K column
    expressions over the token array, no corpus explode); corpus
    stats are a single-row aggregate crossJoined (broadcast) back.
    Scores are rounded to 6 decimals *before* the ordering so the
    top-k cut is reproducible across engines.
    """
    toks = _ltoks(text_col)
    feat = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[
            # size - size(array_remove) == term count, but stays in
            # whole-stage codegen (a filter() higher-order function
            # is interpreted per element — ~10x slower on this path)
            (F.size(toks) - F.size(F.array_remove(toks, t)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = feat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf{i}").cast("double")
        term = idf * tf * F.lit(BM25_K1 + 1.0) / (
            tf
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", vocab_k: int = 100_000
) -> DataFrame:
    """(doc_id, n_tokens, avg_logp): average natural-log unigram
    probability per document under the corpus's own unigram LM — the
    cheap perplexity proxy used to bucket training data by
    "typicality" (CCNet-style, with the LM swapped for the corpus
    itself so the operator is self-contained and exactly testable).

    Low avg_logp = rare-token-heavy document (often noise); high =
    boilerplate-typical.  Per-token log-probs are aggregated per
    (doc, tok) first (cnt * ln p), then summed through
    decimal(28,12) so partial-sum order never changes the result.
    """
    tok = docs.select("doc_id", F.explode(_ltoks(text_col)).alias("tok"))
    full_freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = full_freq.agg(F.sum("n_tok").cast("bigint").alias("n_total"))
    # top-K vocabulary cap: orderBy+limit executes as a distributed
    # TakeOrderedAndProject (never a single-partition window), and
    # bounds what the per-token join has to see at 100 TB; tokens
    # outside the vocabulary score at the Laplace floor count of 1
    freq = full_freq.orderBy(F.col("n_tok").desc(), F.col("tok")).limit(vocab_k)
    per_doc_tok = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
    )
    joined = per_doc_tok.join(freq, "tok", "left")
    contrib = (
        F.col("cnt").cast("double")
        * F.log(
            F.coalesce(F.col("n_tok"), F.lit(1)).cast("double") / F.col("n_total")
        )
    ).cast("decimal(28,12)")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(contrib).alias("_slp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                (F.col("_slp").cast("double") / F.col("n_tokens")), 6
            ).alias("avg_logp"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, top_n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, rank): each document's ``top_n`` terms by
    tf-idf (tf * ln(N/df)), deterministic (score desc, term asc)
    tie-break — the classic keyword-extraction signal.

    Built on the posting table (one explode + aggregations); the
    per-document ranking window partitions on doc_id, so it
    parallelizes with the documents and never creates a global
    ordering."""
    from pyspark.sql.window import Window

    post = inverted_index(docs, text_col)
    n_docs = docs.select(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = post.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        F.col("tok").alias("term"),
        "tf",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )
