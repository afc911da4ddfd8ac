"""One-pass corpus curation — the LLM-pretraining filter pipeline shape.

Composes the repo's per-doc curation operators into ONE pass over the
corpus: every whole-stage-codegen feature (quality ratios, PII counts) is
computed in the projection that FEEDS the Arrow kernel, the kernel adds the
repetition metrics (functions/textstats.py::repetition_metrics_row — the
same scalar core as repetition_stats) and passes the codegen columns
through, and the keep/drop gates are a codegen CASE over the kernel
output. No joins, no shuffle, no second corpus read: at 100 TB this is one
scan + one Python stage, the minimum any kernel-bearing curation pass can
cost. (Gates follow the Gopher/C4 recipe: token-count band, repetition
caps, quality floor, optional PII cap.)
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from defactonlp_spark.functions.pii import PII_PATTERNS
from defactonlp_spark.functions.textstats import (
    quality_feature_cols,
    repetition_metrics_row,
    sql_tokens_py,
)
from defactonlp_spark.session import floor_parallelism


@dataclass(frozen=True)
class CurationGates:
    """Keep a doc iff ALL hold (NULL text never keeps). The comparisons run
    on the 6-dp-rounded metric columns, so the DuckDB twin gates byte-equal
    values."""

    min_tokens: int = 5
    max_tokens: int = 100_000
    min_quality: float = 0.05
    max_dup_5gram_frac: float = 0.6
    max_top_bigram_frac: float = 0.6
    max_dup_line_frac: float = 0.5
    max_pii: int | None = None  # total matches across all PII families


_REP_FIELDS = ["rep_n_tokens", "dup_line_frac", "top_bigram_frac", "dup_5gram_frac"]


def curation_pass(
    docs: DataFrame,
    gates: CurationGates = CurationGates(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_tokens, n_chars, quality, dup_line_frac,
    top_bigram_frac, dup_5gram_frac, n_email, n_ipv4, n_phone, keep)."""
    qcols = quality_feature_cols(text_col)
    pii_counts = []
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        pii_counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)

    id_field = docs.schema[id_col]
    passthrough = (
        [F.col(id_col)]
        + [qcols[c].alias(c) for c in ("n_tokens", "n_chars", "quality")]
        + pii_counts
    )
    # ship only the TEXT into the kernel and tokenize Python-side
    # (functions/textstats.py::sql_tokens_py): Arrow-shipping the token
    # array cost ~20-170 s at 320k docs vs 1.6 s for the text column
    prepared = floor_parallelism(
        docs.select(*passthrough, F.col(text_col).alias("_text"))
    )
    pass_names = [f.name for f in prepared.schema.fields if f.name != "_text"]
    schema = StructType(
        [f for f in prepared.schema.fields if f.name in pass_names]
        + [StructField("dup_line_frac", DoubleType()),
           StructField("top_bigram_frac", DoubleType()),
           StructField("dup_5gram_frac", DoubleType())]
    )

    def kern(batches):
        for pdf in batches:
            dline, topbi, dup5 = [], [], []
            for text in pdf["_text"]:
                _, dl_, tb, d5 = repetition_metrics_row(text, sql_tokens_py(text))
                dline.append(dl_)
                topbi.append(tb)
                dup5.append(d5)
            out = pdf[pass_names].copy()
            out["dup_line_frac"] = pd.array(dline, dtype="Float64")
            out["top_bigram_frac"] = pd.array(topbi, dtype="Float64")
            out["dup_5gram_frac"] = pd.array(dup5, dtype="Float64")
            yield out

    metrics = prepared.mapInPandas(kern, schema)
    g = gates
    keep = (
        (F.col("n_tokens") >= g.min_tokens)
        & (F.col("n_tokens") <= g.max_tokens)
        & (F.col("quality") >= g.min_quality)
        & (F.col("dup_5gram_frac") <= g.max_dup_5gram_frac)
        & (F.col("top_bigram_frac") <= g.max_top_bigram_frac)
        & (F.col("dup_line_frac") <= g.max_dup_line_frac)
    )
    if g.max_pii is not None:
        total_pii = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0))
        keep = keep & (total_pii <= g.max_pii)
    return metrics.withColumn("keep", F.coalesce(keep, F.lit(False)))
