"""A12/A13 — entity-based document retrieval + candidate union.

Reference behavior (DeFactoNLP ``doc_retrieval.py`` [P, file-level]): run
NER over the claim, then select wiki pages whose TITLE exactly matches an
entity mention (after FEVER title unescaping: '_'->' ', -LRB-/-RRB- -> '(' /
')'). Candidates are unioned with the TF-IDF top-k (A13).

Spark-first re-expression:
- entity extraction: spaCy is not installed in-sandbox; the pinned stand-in
  is a deterministic capitalized-span heuristic inside a pandas UDF (the
  production swap-in is a spaCy/mapInPandas batch — same plumbing);
- title match: broadcast LEFT-SEMI join on the normalized title — no data
  moves except the (tiny) entity table;
- union: unionByName + dropDuplicates on (claim_id, doc_id).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CAP_SPAN = re.compile(r"(?:[A-Z][\w'-]*)(?:\s+[A-Z][\w'-]*)*")


def extract_entities_one(claim: str) -> list[str]:
    """Deterministic capitalized-span heuristic (spaCy stand-in)."""
    if not claim:
        return []
    spans = _CAP_SPAN.findall(claim)
    return [s for s in spans if len(s) > 1]


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_entities_udf(claims: pd.Series) -> pd.Series:  # pragma: no cover
    return claims.map(extract_entities_one)


def unescape_fever_title(col):
    """FEVER wiki-pages title unescaping: underscores and -LRB-/-RRB-."""
    c = F.regexp_replace(col, "_", " ")
    c = F.regexp_replace(c, "-LRB-", "(")
    c = F.regexp_replace(c, "-RRB-", ")")
    return c


def title_match_docs(
    claims: DataFrame,
    titled_docs: DataFrame,
    title_col: str = "title",
    id_col: str = "doc_id",
) -> DataFrame:
    """(claim_id, doc_id) for docs whose normalized title equals an extracted
    entity mention. Entities are exploded then broadcast into the join."""
    ents = (
        claims.withColumn("entity", F.explode(extract_entities_udf(F.col("claim"))))
        .select("claim_id", F.lower(F.col("entity")).alias("ent_norm"))
        .distinct()
    )
    titled = titled_docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(unescape_fever_title(F.col(title_col))).alias("title_norm"),
    )
    return (
        titled.join(F.broadcast(ents), F.col("title_norm") == F.col("ent_norm"))
        .select("claim_id", "doc_id")
        .distinct()
    )


def candidate_union(ner_docs: DataFrame, tfidf_docs: DataFrame) -> DataFrame:
    """A13: NER candidates ∪ retrieval top-k, deduplicated."""
    a = ner_docs.select("claim_id", "doc_id")
    b = tfidf_docs.select("claim_id", "doc_id")
    return a.unionByName(b).dropDuplicates(["claim_id", "doc_id"])
