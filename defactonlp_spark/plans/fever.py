"""E2E — the full DeFactoNLP fact-verification pipeline as ONE composed plan.

A reference user runs: NER/title doc retrieval + TF-IDF doc retrieval ->
candidate union -> sentence retrieval over candidates -> RTE over
(claim, sentence) pairs -> label aggregation -> FEVER-format predictions
(SURVEY.md §2.A12-A18). Every stage exists as a standalone operator (each
with its own driver-oracle harness entry); this module wires them into the
single call a pipeline user actually wants, and writes predictions in the
FEVER JSONL shape `{id, predicted_label, predicted_evidence: [[page,
sent_idx], ...]}` so downstream FEVER scorers consume it unchanged.

Plan shape (scale notes inline):
- doc candidates: title semi-join (broadcast of claim entities) UNION
  BM25/DrQA top-k — claims never touch the driver;
- sentence retrieval is SCOPED to candidate docs by a semi-join before any
  scoring (A15's pattern — the sentence corpus is never scored in full);
- RTE is one batched mapInPandas stage (the model-forward slot);
- evidence assembly is a groupBy collect_list over top sentences — k rows
  per claim, bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defactonlp_spark.operators.bm25 import claim_terms, score_exhaustive
from defactonlp_spark.operators.docretrieval import candidate_union, title_match_docs
from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats
from defactonlp_spark.operators.rte import label_aggregate, rte_classify
from defactonlp_spark.operators.sentences import sentence_retrieval


def fever_pipeline(
    docs: DataFrame,
    claims: DataFrame,
    sentences: DataFrame,
    k_docs: int = 5,
    k_sents: int = 3,
    title_col: str = "title",
) -> DataFrame:
    """corpus + claims -> FEVER predictions (claim_id, predicted_label,
    predicted_evidence array<struct<page, sent_idx>>, n_votes, n_sents).

    ``docs``: (doc_id, text[, title]) — when no title column exists the
    title match contributes nothing (empty candidates) and retrieval is
    purely TF-IDF/BM25, matching DeFactoNLP's behavior on corpora without
    page titles. ``sentences``: (doc_id, sent_idx, sentence) from
    split_fever_lines (FEVER wiki-pages) or split_chunks (flat corpora).
    """
    postings = build_postings(docs)
    cs = corpus_stats(postings).collect()[0]
    tfidf_docs = score_exhaustive(
        postings, term_stats(postings), claim_terms(claims),
        int(cs["n_docs"]), float(cs["avgdl"]), k=k_docs,
    ).select("claim_id", "doc_id")

    if title_col in docs.columns:
        ner_docs = title_match_docs(claims, docs, title_col=title_col).select(
            "claim_id", "doc_id"
        )
        cands = candidate_union(ner_docs, tfidf_docs)
    else:
        cands = tfidf_docs.dropDuplicates(["claim_id", "doc_id"])

    top_sents = sentence_retrieval(sentences, claims, candidates=cands, k=k_sents)

    pairs = (
        top_sents.select("claim_id", "doc_id", "sent_idx")
        .join(F.broadcast(claims.select("claim_id", "claim")), "claim_id")
        .join(sentences, ["doc_id", "sent_idx"])
        .select("claim_id", "claim", "doc_id", "sent_idx", "sentence")
    )
    scored = rte_classify(pairs)
    labels = label_aggregate(scored)

    # collect_list order is nondeterministic under parallel aggregation —
    # carry the rank in the struct, sort on it, then strip it
    ev = top_sents.groupBy("claim_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank"),
                        F.col("doc_id").alias("page"),
                        F.col("sent_idx").alias("sent_idx"),
                    )
                )
            ),
            lambda s: F.struct(s["page"].alias("page"), s["sent_idx"].alias("sent_idx")),
        ).alias("predicted_evidence")
    )
    return labels.join(ev, "claim_id").select(
        "claim_id", "predicted_label", "predicted_evidence", "n_votes", "n_sents"
    )


def write_fever_jsonl(predictions: DataFrame, path: str) -> None:
    """Write predictions in the FEVER submission shape: one JSON object per
    line, `{\"id\": ..., \"predicted_label\": ..., \"predicted_evidence\":
    [[page, sent_idx], ...]}` — distributed JSON text sink, no driver
    materialization."""
    out = predictions.select(
        F.to_json(
            F.struct(
                F.col("claim_id").alias("id"),
                F.col("predicted_label"),
                F.transform(
                    "predicted_evidence", lambda e: F.array(e["page"], e["sent_idx"])
                ).alias("predicted_evidence"),
            )
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)
