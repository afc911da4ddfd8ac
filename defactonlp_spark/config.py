"""Engine configuration. All constants that affect on-disk formats or score
parity are pinned here — changing any of them invalidates golden fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 with the idf variant used by DrQA-style rankers.

    score(q, d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))        (always > 0)

    Parity contract (SURVEY.md §2.B6): float64 throughout; per-document terms
    are summed in ascending term order so the pruned (WAND) and exhaustive
    paths produce bit-identical scores.
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class EngineConfig:
    bm25: BM25Params = field(default_factory=BM25Params)

    #: posting-list block size for block-max metadata (docs per block)
    block_size: int = 128

    #: number of term-range buckets for the index build (segment partitions)
    n_buckets: int = 32

    #: a term whose df exceeds this fraction of n_docs is "head" and gets
    #: salted across `n_salts` sub-lists (skew management, SURVEY.md §2.B3)
    salt_df_ratio: float = 0.10
    n_salts: int = 4

    #: arrow batch sizing for the wide-row extractor stage
    extract_batch_rows: int = 256
