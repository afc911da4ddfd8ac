"""Exact phrase retrieval — positional matching + BM25 ranking.

A doc matches the phrase ``"t0 t1 ... tm"`` iff its token stream contains
the terms CONSECUTIVELY in order (the pinned tokenizer on both sides, so
"Spark SQL engine" matches "spark, sql: ENGINE" — punctuation and case
fold away identically).

The match is pure relational algebra — the ANCHOR trick, no UDF:

    qpos(claim_id, idx, term)          # phrase tokenized WITH its offsets
    tokens(doc_id, pos, term)          # positional explode of the corpus
    hits   = tokens ⋈_term broadcast(qpos)         # only queried terms scan
    anchor = pos - idx                              # candidate start offset
    match  = groupBy(claim, doc, anchor).count() == phrase_len

``pos = anchor + idx`` is a bijection inside one group, so a plain
``count(*)`` is exact even when the phrase repeats a term ("to be or not
to be"). One shuffle on (claim, doc, anchor); the tokens relation is
pruned to the phrases' terms by the broadcast join before it moves.

Ranking: matching docs are scored with the SAME BM25 sum over the
phrase's distinct terms and the stored corpus stats as every other query
path — a phrase query is "conjunctive + adjacency", so its scores are
comparable with the engine's other retrieval modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defactonlp_spark.config import BM25Params
from defactonlp_spark.operators.bm25 import bm25_score_expr


def phrase_positions(phrases: DataFrame, id_col: str = "claim_id", text_col: str = "phrase") -> DataFrame:
    """phrases(claim_id, phrase) -> (claim_id, idx, term): the pinned
    tokenizer with per-phrase token offsets."""
    from defactonlp_spark.functions.tokenize import tokenize_tokens

    return tokenize_tokens(phrases, id_col=id_col, text_col=text_col).select(
        F.col("doc_id").alias("claim_id"),
        F.col("pos").alias("idx"),
        "term",
    )


def phrase_matches(tokens: DataFrame, qpos: DataFrame) -> DataFrame:
    """(doc_id, pos, term) x (claim_id, idx, term) -> matching
    (claim_id, doc_id) pairs (distinct)."""
    plen = qpos.groupBy("claim_id").agg(F.count(F.lit(1)).alias("plen"))
    hits = tokens.join(F.broadcast(qpos), "term", "inner").select(
        "claim_id",
        "doc_id",
        (F.col("pos").cast("long") - F.col("idx")).alias("anchor"),
    )
    return (
        hits.groupBy("claim_id", "doc_id", "anchor")
        .agg(F.count(F.lit(1)).alias("m"))
        .join(F.broadcast(plen), "claim_id", "inner")
        .filter(F.col("m") == F.col("plen"))
        .select("claim_id", "doc_id")
        .distinct()
    )


def score_phrase(
    postings: DataFrame,
    stats: DataFrame,
    tokens: DataFrame,
    phrases: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 5,
    params: BM25Params = BM25Params(),
) -> DataFrame:
    """Top-k phrase retrieval: adjacency via :func:`phrase_matches`, then
    the standard BM25 sum over the phrase's DISTINCT terms restricted to
    matching docs (stored df/N/avgdl — scores comparable with the other
    query paths). Phrases with no occurrence (or any out-of-corpus term)
    return no rows."""
    qpos = phrase_positions(phrases)
    matches = phrase_matches(tokens, qpos)
    qterms = qpos.select("claim_id", "term").distinct()
    q = qterms.join(stats, "term", "inner")
    scored = (
        postings.join(F.broadcast(q), "term", "inner")
        .withColumn("contrib", bm25_score_expr(n_docs, avgdl, params))
        .join(matches, ["claim_id", "doc_id"], "left_semi")
        .groupBy("claim_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("claim_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("claim_id", "rank", "doc_id", "score")
    )
