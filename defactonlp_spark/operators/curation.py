"""Corpus-curation operators for training-data pipelines (task-spec axis).

- ``with_split``   : deterministic, engine-portable train/val/test assignment
                     by md5 of the document id — reproducible across runs,
                     engines (same split in DuckDB/Trino/Spark), and cluster
                     sizes, with no RNG or global sort. The standard trick
                     for freezing dataset splits at web scale.
- ``source_stats`` : per-source curation dashboard: volume, exact-dup rate
                     (1 - distinct(md5(text))/docs), mean length. One
                     hash-aggregate — partial/final combine, no skew (md5
                     keys are uniform), scales to any corpus.

Portability contract: md5 only (identical in Spark and DuckDB — same rule
as operators/dedup.py), so every operator here has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default split percentages (train, val, test) — must sum to 100
SPLIT_WEIGHTS = (80, 10, 10)


def _split_bucket(id_col: str):
    """0-99 bucket from the first two hex chars of md5(id) — 256 raw values
    folded mod 100; deterministic and engine-portable."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return (F.conv(hx, 16, 10).cast("int") % 100).alias("bucket")


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = SPLIT_WEIGHTS,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test').

    The assignment is a pure function of the id — appending new documents
    never reshuffles existing ones between splits (critical for dataset
    versioning), unlike randomSplit whose assignment depends on partition
    layout and seed plumbing."""
    train, val, test = weights
    assert train + val + test == 100, "split weights must sum to 100"
    b = _split_bucket(id_col)
    return docs.withColumn(
        "split",
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(split, lang) -> n_docs. The reproducibility audit for the split."""
    return (
        with_split(docs, id_col)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def source_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source curation stats: volume, exact-dup rate, mean length.

    ``dup_rate`` = 1 - distinct texts / docs, with text identity = md5 so
    the distinct-aggregate shuffles 16-byte keys, never documents."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct(F.md5(F.col(text_col))) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
    )
