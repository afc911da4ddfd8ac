"""FEVER JSONL readers — the reference pipeline's real input formats
(SURVEY.md §1.1 [P]; A1's `spark.read.json` path).

Two dump shapes, both schema-EXPLICIT (never inferred — schema drift must be
a loud failure, not a silent column of nulls):

- wiki-pages shards: ``{"id": "<page title>", "text": "...", "lines":
  "0\\tsent0[\\ttag...]\\n1\\tsent1..."}`` — page titles use ``_`` for
  spaces and ``-LRB-``/``-RRB-``/``-COLON-`` escapes.
- claims: ``{"id": 123, "claim": "...", "label": "SUPPORTS", "evidence":
  [[[annot_id, ev_id, page, sent_idx], ...], ...]}`` — evidence elements
  are heterogeneous JSON ARRAYS (ints + strings + nulls), which Spark
  ingests as ``array<array<array<string>>>`` (numeric coercion) and
  ``read_claims`` normalizes into the typed struct shape the FEVER scorer
  consumes (operators/fever.py, harness `fever_eval`).

Scale: both readers are plain distributed json scans — a 5.4M-page dump is
just files; Spark splits them. No driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIKI_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lines", T.StringType()),
    ]
)

CLAIMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("verifiable", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("claim", T.StringType()),
        # raw heterogeneous nested arrays; numbers arrive as strings
        T.StructField(
            "evidence",
            T.ArrayType(T.ArrayType(T.ArrayType(T.StringType()))),
        ),
    ]
)

EVIDENCE_T = (
    "array<array<struct<annot_id:bigint,ev_id:bigint,page:string,sent_idx:int>>>"
)


def fever_title_norm(col):
    """FEVER page id -> display title: ``_``->space, ``-LRB-``/``-RRB-``/
    ``-COLON-`` unescapes (the A12 title-match normalization)."""
    c = F.regexp_replace(col, "_", " ")
    c = F.regexp_replace(c, "-LRB-", "(")
    c = F.regexp_replace(c, "-RRB-", ")")
    return F.regexp_replace(c, "-COLON-", ":")


def read_wiki_pages(spark: SparkSession, path: str) -> DataFrame:
    """wiki-pages JSONL shards -> (page_id, title, text, lines).

    ``page_id`` keeps the raw escaped id (the join key everywhere in FEVER);
    ``title`` is the normalized display form for entity matching. Pages with
    empty ids (the dumps contain a handful) are dropped, matching the
    reference doc-store build.
    """
    raw = spark.read.schema(WIKI_SCHEMA).json(path)
    return (
        raw.filter(F.col("id").isNotNull() & (F.col("id") != ""))
        .select(
            F.col("id").alias("page_id"),
            fever_title_norm(F.col("id")).alias("title"),
            "text",
            "lines",
        )
    )


def read_claims(spark: SparkSession, path: str) -> DataFrame:
    """claims JSONL -> (claim_id, claim, label, evidence) with evidence in
    the typed struct shape of the FEVER scorer's gold input:
    ``array<array<struct<annot_id, ev_id, page, sent_idx>>>``.

    NOT-ENOUGH-INFO rows carry evidence sets of ``[null, null, null,
    null]`` in the dumps; those normalize to structs with NULL page — the
    scorer's containment logic already treats them as unprovable sets.
    """
    raw = spark.read.schema(CLAIMS_SCHEMA).json(path)
    ev = F.transform(
        F.col("evidence"),
        lambda es: F.transform(
            es,
            lambda e: F.struct(
                F.element_at(e, 1).cast("bigint").alias("annot_id"),
                F.element_at(e, 2).cast("bigint").alias("ev_id"),
                F.element_at(e, 3).alias("page"),
                F.element_at(e, 4).cast("int").alias("sent_idx"),
            ),
        ),
    ).cast(EVIDENCE_T)
    return raw.select(
        F.col("id").alias("claim_id"),
        "claim",
        "label",
        ev.alias("evidence"),
    )
