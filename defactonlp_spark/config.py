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

    #: per-claim query planning: if the claim's total candidate postings
    #: (sum of slice lengths, known without decoding) are below this, score
    #: them all with the vectorized numpy kernel instead of walking WAND
    #: cursors. Measured on the 320k-doc fixture: the dense kernel scores
    #: ~100M postings/sec/core while cursor WAND steps ~30-100k/sec under
    #: weak pruning (flat score distributions), so cursors only pay off when
    #: pruning skips >99.9% of candidates — i.e. very large, highly
    #: selective/skewed candidate sets. Both kernels are bit-identical in
    #: output (same ascending-term float64 summation); SPEED choice only.
    dense_eval_threshold: int = 50_000_000

    #: batch query serving: claims are grouped into batches of this size and
    #: each segment slice ships/decodes ONCE PER BATCH instead of once per
    #: claim — head-term blobs dominate the gather shuffle, and claims
    #: overwhelmingly share head terms. Measured r3 (200 claims, 320k-doc
    #: index, warm ServingSession): a one-shot sweep read 8 -> 30.6
    #: claims/s, 16 -> 41.8, 32 -> 42.9; interleaved re-measurement (5
    #: alternating warm pairs, shared session) read 8 slightly AHEAD of 16
    #: on every pair (medians 9.9 vs 11.5 s under drift; quiet reps 6.75
    #: vs 7.39) — the sweep's 16-advantage was host drift, not the batch
    #: size. 8 keeps batch count >= core count down to ~256-claim sets;
    #: large sets saturate cores at any batch size.
    serve_claims_per_batch: int = 8

    #: pinned partition count for the distributed batch-id assignment in
    #: query serving (cluster-size independent, like doc-id assignment —
    #: batch membership must not depend on parallelism)
    serve_batch_parts: int = 64

    #: live-docs serving guard: the WAND kernels mask delete tombstones with
    #: a sorted int64 array that rides the task closure (IndexReader
    #: .deletes_array), so its size must stay broadcast-small. 1M ids = 8 MB
    #: — ample for the Lucene-style lifecycle (deletes accumulate between
    #: compactions, merge_builds drops them physically). Past the cap,
    #: deletes_array raises: compact instead of serving an ever-growing mask.
    max_serving_deletes: int = 1_000_000

    #: segment-scan pruning fast path: when the query set's DISTINCT terms
    #: number at most this, they are collected and pushed as an `isin`
    #: filter (parquet row-group stat pruning applies — segments are written
    #: term-sorted). The distinct-term count is bounded by the vocabulary
    #: (Heaps' law), not by |claims|; beyond the bound a term semi-join
    #: prunes instead (no driver materialization).
    isin_pushdown_max_terms: int = 20_000
