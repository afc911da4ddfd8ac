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


def with_wiki_doc_ids(
    pages: DataFrame, page_col: str = "page_id", n_buckets: int = 1024
) -> DataFrame:
    """String page ids -> DENSE engine doc_ids in ``[0, n_pages)``,
    collision-free and deterministic (a pure function of the page-name set).

    The engine's internals (sentence ids ``doc_id * 2^20 + sent_idx``,
    varbyte posting encode, tombstone masks) need NUMERIC doc ids; FEVER
    wiki pages are keyed by page-name strings (ADVICE r3: the pieces did
    not compose — ``doc_id.cast('long')`` silently NULLs string ids). Raw
    ``xxhash64`` ids would be the one-pass answer but they span the full
    signed-64 range, which both collides (birthday) and overflows the
    sentence-id packing under ANSI arithmetic; dense ids stay far below
    2^42, so the packing is exact.

    Plan — NO global ordering step (a bare row_number over everything is
    one reducer; zipWithIndex is an RDD round-trip): the two-phase
    distributed prefix sum this repo already uses for training-mix
    sampling. Pages hash into ``n_buckets`` groups; one tiny driver
    collect of the n_buckets group counts -> Python cumsum -> broadcast
    offsets; doc_id = bucket_offset + (row_number within the bucket,
    ordered by page name). Windows parallelize across buckets — pick
    ``n_buckets`` >= ~4x cores; the driver only ever holds n_buckets ints.

    Output: the input plus a ``doc_id`` long column. Keep the (doc_id,
    page) projection as the ``page_map`` for ``fever_pipeline`` so evidence
    comes back out in page-name strings (numeric engine ids in
    predicted_evidence break FEVER scorers, which join on page names).
    """
    b = pages.withColumn("_b", F.pmod(F.xxhash64(F.col(page_col)), F.lit(n_buckets)))
    counts = {r["_b"]: r["n"] for r in
              b.groupBy("_b").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    spark = pages.sparkSession
    off = spark.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()], "_b long, _off long"
    )
    w = Window.partitionBy("_b").orderBy(page_col)
    return (
        b.join(F.broadcast(off), "_b")
        .withColumn("doc_id", F.col("_off") + F.row_number().over(w) - 1)
        .drop("_b", "_off")
    )


def fever_pipeline_from_wiki(
    pages: DataFrame,
    claims: DataFrame,
    k_docs: int = 5,
    k_sents: int = 3,
) -> DataFrame:
    """``read_wiki_pages`` output -> FEVER predictions with PAGE-NAME
    evidence — the end-to-end composition over the reference's real input
    format (ADVICE r3: the pieces previously did not compose, because the
    pipeline required numeric ids and ``doc_id.cast('long')`` silently
    NULLed string page ids).

    ``pages``: (page_id string, title, text, lines) from
    ``sources/fever_jsonl.py::read_wiki_pages``. Ids are hashed via
    ``with_wiki_doc_ids``; sentences come from ``split_fever_lines`` over
    the same mapped relation, so every internal join key is numeric; the
    (doc_id, page_id) map travels to evidence assembly so
    ``predicted_evidence`` carries page-name strings that FEVER scorers
    (and ``write_fever_jsonl``) consume unchanged.
    """
    from defactonlp_spark.operators.sentences import split_fever_lines

    mapped = with_wiki_doc_ids(pages)
    docs = mapped.select("doc_id", "title", "text")
    sentences = split_fever_lines(mapped.select("doc_id", "lines"))
    page_map = mapped.select("doc_id", F.col("page_id").alias("page"))
    return fever_pipeline(
        docs, claims, sentences, k_docs=k_docs, k_sents=k_sents,
        page_map=page_map,
    )


def fever_pipeline(
    docs: DataFrame,
    claims: DataFrame,
    sentences: DataFrame,
    k_docs: int = 5,
    k_sents: int = 3,
    title_col: str = "title",
    page_map: DataFrame | None = None,
    rank_dp: int | None = None,
) -> DataFrame:
    """corpus + claims -> FEVER predictions (claim_id, predicted_label,
    predicted_evidence array<struct<page, sent_idx>>, n_votes, n_sents).

    ``docs``: (doc_id, text[, title]) — when no title column exists the
    title match contributes nothing (empty candidates) and retrieval is
    purely TF-IDF/BM25, matching DeFactoNLP's behavior on corpora without
    page titles. ``sentences``: (doc_id, sent_idx, sentence) from
    split_fever_lines (FEVER wiki-pages) or split_chunks (flat corpora).
    ``page_map``: optional (doc_id, page) — when given, evidence ``page``
    fields are the STRING page names from the map (the FEVER submission
    key; see ``fever_pipeline_from_wiki``) instead of numeric doc ids; the
    map is |corpus|-sized, so it joins doc-keyed (never broadcast).
    ``rank_dp``: rank both retrieval stages on round(score, rank_dp) with
    id tiebreaks — the engine-portable tie order (raw float64 tie order
    depends on summation order; chunked pseudo-sentences tie a lot).
    """
    postings = build_postings(docs)
    cs = corpus_stats(postings).collect()[0]
    tfidf_docs = score_exhaustive(
        postings, term_stats(postings), claim_terms(claims),
        int(cs["n_docs"]), float(cs["avgdl"]), k=k_docs, rank_dp=rank_dp,
    ).select("claim_id", "doc_id")

    if title_col in docs.columns:
        ner_docs = title_match_docs(claims, docs, title_col=title_col).select(
            "claim_id", "doc_id"
        )
        cands = candidate_union(ner_docs, tfidf_docs)
    else:
        cands = tfidf_docs.dropDuplicates(["claim_id", "doc_id"])

    top_sents = sentence_retrieval(
        sentences, claims, candidates=cands, k=k_sents, rank_dp=rank_dp
    )

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
    top_ev = top_sents
    if page_map is not None:
        top_ev = top_ev.join(
            page_map.select("doc_id", F.col("page").alias("_page")), "doc_id", "left"
        ).withColumn("_page", F.coalesce(F.col("_page"), F.col("doc_id").cast("string")))
    else:
        top_ev = top_ev.withColumn("_page", F.col("doc_id"))
    ev = top_ev.groupBy("claim_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank"),
                        F.col("_page").alias("page"),
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


def _json_string(col):
    """A column rendered as a JSON string literal with full escaping:
    ``to_json(array(x))`` emits ``["escaped"]``; strip the array brackets.
    (``to_json`` only accepts struct/array/map — this is the expression-only
    way to get Spark's own JSON string escaping for a bare column.)"""
    j = F.to_json(F.array(col))
    return F.substring(j, 2, F.length(j) - 2)


def fever_submission_lines(predictions: DataFrame) -> DataFrame:
    """Predictions -> one FEVER submission JSON line per claim:
    ``{"id": 1, "predicted_label": "SUPPORTS", "predicted_evidence":
    [["Page_Name", 0], ...]}``.

    FEVER evidence pairs are HETEROGENEOUS JSON arrays (string page, int
    sent_idx). ``F.array(page, sent_idx)`` coerces both elements to one
    type — numeric engine ids, or stringified sent_idx — which breaks FEVER
    scorers (ADVICE r3). The pairs are therefore assembled as strings:
    pages through Spark's own JSON escaping (``_json_string``), sent_idx as
    a bare integer literal. Output: (claim_id, predicted_label, line).
    """
    page_t = (
        predictions.schema["predicted_evidence"].dataType.elementType["page"].dataType
    )
    is_str = page_t.typeName() == "string"

    def pair(e):
        page_json = _json_string(e["page"]) if is_str else e["page"].cast("string")
        return F.concat(
            F.lit("["), page_json, F.lit(", "),
            e["sent_idx"].cast("string"), F.lit("]"),
        )

    ev_json = F.concat(
        F.lit("["),
        F.array_join(F.transform("predicted_evidence", pair), ", "),
        F.lit("]"),
    )
    line = F.concat(
        F.lit('{"id": '), F.col("claim_id").cast("string"),
        F.lit(', "predicted_label": '), _json_string(F.col("predicted_label")),
        F.lit(', "predicted_evidence": '), ev_json,
        F.lit("}"),
    )
    return predictions.select("claim_id", "predicted_label", line.alias("line"))


def write_fever_jsonl(predictions: DataFrame, path: str) -> None:
    """Write predictions in the FEVER submission shape (one JSON object per
    line; see ``fever_submission_lines`` for the heterogeneous-evidence
    assembly) — distributed text sink, no driver materialization."""
    out = fever_submission_lines(predictions).select(F.col("line").alias("value"))
    out.write.mode("overwrite").text(path)
