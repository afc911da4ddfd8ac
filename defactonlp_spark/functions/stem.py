"""Light English stemming — the Harman (1991) "S-stemmer".

Three suffix rules, applied first-match (the published algorithm):

1. ``-ies`` -> ``-y``   unless the word ends ``-eies`` / ``-aies``
2. ``-es``  -> ``-e``   (drop the s) unless it ends ``-aes`` / ``-ees`` / ``-oes``
3. ``-s``   -> drop     unless it ends ``-us`` / ``-ss``

Chosen over Porter because it is (a) the standard cheap recall booster for
web retrieval, (b) expressible as ONE whole-stage-codegen CASE expression
(no Python, no UDF), and (c) portable verbatim to the DuckDB oracle. A
production swap-in for Porter/Snowball would be a pandas_udf with the same
column contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def s_stem(col: Column) -> Column:
    """The S-stemmer as a codegen CASE expression over a string column.

    Guard semantics pinned here: suffix-CLASS dispatch — a word is handled
    by exactly the rule of its longest matching suffix, and a guard match
    leaves it UNCHANGED (it does not fall through to a shorter-suffix
    rule). The fall-through reading would strip the 's' from every guarded
    word via rule 3, making the aes/ees/oes guards dead letters ('goes' ->
    'goe'); this reading is the one where every published guard has effect.
    """
    n = F.length(col)
    return (
        F.when(
            col.endswith("eies") | col.endswith("aies"), col
        )
        .when(
            col.endswith("ies"), F.concat(F.substring(col, 1, n - 3), F.lit("y"))
        )
        .when(
            col.endswith("aes") | col.endswith("ees") | col.endswith("oes"), col
        )
        .when(col.endswith("es"), F.substring(col, 1, n - 1))
        .when(col.endswith("us") | col.endswith("ss"), col)
        .when(col.endswith("s"), F.substring(col, 1, n - 1))
        .otherwise(col)
    )


S_STEM_SQL_CASE = """CASE
  WHEN {t} LIKE '%eies' OR {t} LIKE '%aies' THEN {t}
  WHEN {t} LIKE '%ies' THEN substr({t}, 1, len({t}) - 3) || 'y'
  WHEN {t} LIKE '%aes' OR {t} LIKE '%ees' OR {t} LIKE '%oes' THEN {t}
  WHEN {t} LIKE '%es' THEN substr({t}, 1, len({t}) - 1)
  WHEN {t} LIKE '%us' OR {t} LIKE '%ss' THEN {t}
  WHEN {t} LIKE '%s' THEN substr({t}, 1, len({t}) - 1)
  ELSE {t} END"""
#: the same rules as ANSI SQL (DuckDB oracle twin) — format with t=<expr>


def stem_postings(postings: DataFrame) -> DataFrame:
    """Collapse a postings long table (term, doc_id, tf[, dl]) onto stemmed
    terms: tf re-summed per (stem, doc), df re-derivable downstream. The
    standard stemmed-index build step — one projection + one hash agg, the
    same shuffle key count as the unstemmed build."""
    keep_dl = "dl" in postings.columns
    aggs = [F.sum("tf").cast("int").alias("tf")]
    if keep_dl:
        aggs.append(F.first("dl").alias("dl"))
    return (
        postings.withColumn("term", s_stem(F.col("term")))
        .groupBy("term", "doc_id")
        .agg(*aggs)
    )
