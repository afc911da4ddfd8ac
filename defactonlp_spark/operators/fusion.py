"""Reciprocal Rank Fusion — the ES 8.x ``rrf`` retriever (Cormack, Clarke
& Buettcher 2009 "Reciprocal rank fusion outperforms Condorcet and
individual rank learning methods").

Fuses N ranked lists per claim:  rrf(d) = sum over lists containing d of
1 / (rank_constant + rank_d).  ES defaults rank_constant = 60 and fuses
only each retriever's top ``rank_window_size`` — here the caller passes
already-truncated lists (each ranker's own k IS the window).

Determinism: contributions are combined by a FIXED left-to-right chain of
full-outer joins (never a groupBy-sum whose float addition order would be
partition-dependent), so the fused score is the bit-identical sum in any
engine — the DuckDB twin adds the same coalesced terms in the same order.
Ranking pinned: rrf desc, doc_id asc (1/(c+r) sums of small ints are exact
enough that cross-engine rounding can't flip adjacent ranks; doc_id breaks
genuine ties such as docs sharing the same rank vector).

Scale shape: each input list is already tiny (claims x k rows); the fusion
is a few broadcast-sized outer joins + one window — negligible next to the
retrievals that feed it. At 10^12 docs the cost IS the upstream retrievers;
fusion adds no scan and no shuffle of corpus-sized data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    rank_constant: int = 60,
) -> DataFrame:
    """Fuse ranked lists [(claim_id, rank, doc_id, ...), ...] into
    (claim_id, rank, doc_id, rrf_score). Each input must carry 1-based
    dense ranks per claim (every retrieval operator here emits exactly
    that shape)."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    c = float(rank_constant)
    parts = [
        df.select(
            "claim_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(c) + F.col("rank").cast("double"))).alias(f"c{i}"),
        )
        for i, df in enumerate(ranked_lists)
    ]
    fused = reduce(
        lambda a, b: a.join(b, ["claim_id", "doc_id"], "full_outer"), parts
    )
    score = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"c{i}"), F.lit(0.0)),
        range(1, len(parts)),
        F.coalesce(F.col("c0"), F.lit(0.0)),
    )
    w = Window.partitionBy("claim_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("claim_id", "rank", "doc_id", "rrf_score")
    )
