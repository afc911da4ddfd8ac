"""A14/A15 — sentence split + sentence-granularity retrieval.

Reference behavior (DeFactoNLP ``sentence_retrieval.py`` + FEVER wiki-pages
format [P, file-level]): each page carries a ``lines`` field
("0\\tsent0[\\ttag...]\\n1\\tsent1..."); candidate documents' sentences are
scored against the claim by TF-IDF vector comparison; top-5 kept.

Spark-first re-expression: ``posexplode(split(lines, '\\n'))`` -> tab-parse
-> the SAME retrieval engine (exhaustive BM25 or DrQA tf-idf) at sentence
granularity, scoped to candidate docs with a left-semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_fever_lines(docs: DataFrame, id_col: str = "doc_id", lines_col: str = "lines") -> DataFrame:
    """(doc_id, sent_idx, sentence) from the FEVER lines format. Empty
    sentences are kept out; the index comes from the leading field (not the
    array position) because FEVER lines can skip indices."""
    exploded = docs.select(
        F.col(id_col), F.explode(F.split(F.col(lines_col), "\n")).alias("line")
    )
    parts = exploded.withColumn("fields", F.split(F.col("line"), "\t"))
    return (
        parts.filter(F.size("fields") >= 2)
        .select(
            F.col(id_col),
            F.col("fields").getItem(0).cast("int").alias("sent_idx"),
            F.col("fields").getItem(1).alias("sentence"),
        )
        .filter(F.length("sentence") > 0)
    )


def split_chunks(docs: DataFrame, chunk_tokens: int = 10, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pseudo-sentences for corpora without sentence structure: consecutive
    ``chunk_tokens``-token windows — fast path.

    Tokenization stays JVM-side (same lower+split+filter as the SQL twin);
    only the window slicing + join runs in an Arrow-batched kernel, because
    the expression form evaluates ``transform``/``slice``/``array_join``
    INTERPRETED per chunk (no codegen for higher-order lambdas — the same
    measured pattern as operators/dedup.py::shingles_col). Byte-identical
    to ``split_chunks_sql`` (parity-tested)."""
    import pandas as pd
    from pyspark.sql import types as T

    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("sent_idx", T.IntegerType()),
            T.StructField("sentence", T.StringType()),
        ]
    )
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    prepared = docs.select(F.col(id_col), toks.alias("_toks"))

    def kern(batches):
        for pdf in batches:
            ids, idxs, sents = [], [], []
            for did, tl in zip(pdf[id_field.name], pdf["_toks"]):
                if tl is None or len(tl) == 0:
                    continue
                for i in range(0, (len(tl) + chunk_tokens - 1) // chunk_tokens):
                    ids.append(did)
                    idxs.append(i)
                    sents.append(" ".join(tl[i * chunk_tokens : (i + 1) * chunk_tokens]))
            yield pd.DataFrame(
                {
                    id_field.name: pd.Series(ids, dtype=pdf[id_field.name].dtype),
                    "sent_idx": pd.Series(idxs, dtype="int32"),
                    "sentence": sents,
                }
            )

    return prepared.mapInPandas(kern, schema)


def split_chunks_sql(docs: DataFrame, chunk_tokens: int = 10, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pure-Catalyst twin of ``split_chunks`` (mirrors the DuckDB oracle
    SQL); interpreted higher-order chunk building — kept for the parity test
    and as executable documentation of the chunk definition."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "))
        ).alias("sent_idx", "sentence"),
    )


def sentence_retrieval(
    corpus_sentences: DataFrame,
    claims: DataFrame,
    candidates: DataFrame | None = None,
    k: int = 5,
    persist: bool = True,
    rank_dp: int | None = None,
) -> DataFrame:
    """Top-k sentences per claim by exhaustive BM25 over sentences.

    ``candidates`` (claim_id, doc_id) optionally scopes scoring to candidate
    documents via a semi-join — the A15 pattern. Sentence ids are synthesized
    as doc_id * 2^20 + sent_idx (dense per corpus, reversible).

    ``persist`` (default True) materializes the sentence-postings relation
    before fan-out: it feeds the corpus-stats collect, the term-stats
    aggregate, AND the scoring scan — three differently-keyed consumers
    Catalyst will not share an exchange across, so without persist the
    chunk tokenize kernel runs ~3x (the same persist-before-fan-out rule as
    operators/dedup.py; tracked there for ``release_cached``)."""
    from defactonlp_spark.operators.bm25 import claim_terms, score_exhaustive
    from defactonlp_spark.operators.dedup import _track_persist
    from defactonlp_spark.operators.postings import (
        build_postings,
        corpus_stats,
        term_stats,
    )

    sents = corpus_sentences
    if candidates is not None:
        docs_in_play = candidates.select("doc_id").distinct()
        sents = sents.join(F.broadcast(docs_in_play), "doc_id", "left_semi")
    sents = sents.withColumn(
        "sent_id", (F.col("doc_id").cast("long") * F.lit(1 << 20)) + F.col("sent_idx")
    )
    p = build_postings(sents, id_col="sent_id", text_col="sentence")
    if persist:
        p = _track_persist(p)
    cs = corpus_stats(p).collect()[0]
    # rank_dp: rank on round(score, rank_dp) with id tiebreak instead of the
    # raw float — chunked pseudo-sentences tie in exact arithmetic and raw
    # float64 tie order depends on engine summation order (the same
    # portability knob as score_exhaustive everywhere else)
    res = score_exhaustive(
        p, term_stats(p), claim_terms(claims), int(cs["n_docs"]), float(cs["avgdl"]),
        k=k, rank_dp=rank_dp,
    )
    return res.select(
        "claim_id",
        "rank",
        (F.col("doc_id") / F.lit(1 << 20)).cast("long").alias("doc_id"),
        (F.col("doc_id") % F.lit(1 << 20)).cast("int").alias("sent_idx"),
        "score",
    )
