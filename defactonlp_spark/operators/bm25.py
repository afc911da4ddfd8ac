"""B6 — exhaustive BM25 scoring (the oracle path) + query-side helpers.

Pinned query semantics (must match WAND and the pytest numpy oracle):
- query terms = DISTINCT tokens of the claim (query-side tf is ignored);
- idf = ln(1 + (N - df + 0.5)/(df + 0.5)) with N/avgdl taken from the build
  manifest (NOT recomputed at query time — block-max bounds were computed
  with the build stats, and parity requires one consistent pair);
- score = sum of per-term contributions, float64;
- ranking: score desc, doc_id asc; top-k per claim.

This path is pure DataFrame algebra (broadcast join + hash aggregate +
window top-k) — Catalyst handles partial aggregation and the small query
side is broadcast, so the only full pass is the postings scan.

Reference analog (public, file-level): DrQA
``drqa/retriever/tfidf_doc_ranker.py::closest_docs`` — sparse dot product
over the CSR matrix + argpartition (SURVEY.md §2.A10/A11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defactonlp_spark.config import BM25Params
from defactonlp_spark.functions.tokenize import tokenize_postings


def claim_terms(claims: DataFrame, id_col: str = "claim_id", text_col: str = "claim") -> DataFrame:
    """claims -> distinct (claim_id, term)."""
    return (
        tokenize_postings(claims, id_col=id_col, text_col=text_col)
        .select(F.col("doc_id").alias(id_col), "term")
        .distinct()
    )


def bm25_score_expr(n_docs: int, avgdl: float, p: BM25Params):
    """Column expression: per-posting BM25 contribution from (tf, dl, df)."""
    idf = F.log1p((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    denom = tf + F.lit(p.k1) * (F.lit(1.0 - p.b) + F.lit(p.b) * dl / F.lit(float(avgdl)))
    return idf * tf * F.lit(p.k1 + 1.0) / denom


def score_exhaustive(
    postings: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 5,
    params: BM25Params = BM25Params(),
) -> DataFrame:
    """postings_long x (claim_id, term) -> top-k (claim_id, doc_id, score, rank).

    Plan: broadcast the (tiny) query-term table and per-term df onto the
    postings scan -> contribution expr (whole-stage codegen) -> hash agg on
    (claim_id, doc_id) -> window top-k. One wide scan, one narrow shuffle.
    """
    q = qterms.join(stats, "term", "inner")  # (claim_id, term, df)
    scored = (
        postings.join(F.broadcast(q), "term", "inner")
        .withColumn("contrib", bm25_score_expr(n_docs, avgdl, params))
        .groupBy("claim_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("claim_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("claim_id", "rank", "doc_id", "score")
    )

def score_conjunctive(
    postings: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 5,
    params: BM25Params = BM25Params(),
) -> DataFrame:
    """Conjunctive (match-ALL-terms) BM25 top-k: a doc qualifies for a claim
    only if it contains EVERY distinct query term; qualifying docs are
    BM25-ranked exactly like :func:`score_exhaustive`. A claim with any
    out-of-corpus term returns no rows (the AND over an empty postings list
    is empty).

    Plan: the same single postings scan + broadcast query join as the
    disjunctive path; the intersection is a group-count filter
    ``n_matched == n_query_terms`` inside the one hash aggregate — the
    Spark-first form of conjunctive evaluation (the classic rarest-term
    driver merge becomes a hash semi-intersection; Catalyst still only
    scans postings of queried terms because the broadcast join filters the
    scan). Same cost envelope as the disjunctive query, strictly fewer
    result rows.
    """
    # n_q from the RAW query terms (before the stats join) so out-of-corpus
    # terms still count toward the required match total
    nq = qterms.groupBy("claim_id").agg(F.count(F.lit(1)).alias("n_q"))
    q = qterms.join(stats, "term", "inner")
    scored = (
        postings.join(F.broadcast(q), "term", "inner")
        .withColumn("contrib", bm25_score_expr(n_docs, avgdl, params))
        .groupBy("claim_id", "doc_id")
        .agg(
            F.sum("contrib").alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .join(F.broadcast(nq), "claim_id", "inner")
        .filter(F.col("n_matched") == F.col("n_q"))
    )
    w = Window.partitionBy("claim_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("claim_id", "rank", "doc_id", "score")
    )
