"""B7 — block-max WAND top-k over compressed segments.

Guarantee (the load-bearing one, BASELINE.json:6): for every claim the
result is rank-identical — docIDs AND float64 scores — to the exhaustive
BM25 path. Three pinned choices make that provable:

1. block-max bounds are EXACT maxima of the per-posting contributions,
   computed at build time with the same (N, avgdl, k1, b) used at query time
   (stored in the build manifest), so pruning is sound;
2. a pruned cursor group is skipped only when its upper bound is STRICTLY
   below the heap threshold — an equal bound is still evaluated because a
   tying doc can win on the doc_id tiebreak;
3. when a document is fully evaluated, its per-term contributions are summed
   in ascending term order in float64 — the same order the exhaustive oracle
   uses — so scores are bit-identical, not merely close.

Distribution model: segments are term-range partitioned (build layout), so a
claim's terms live in several partitions. The query plan gathers each
claim's (term, salt) slices with a broadcast join on term, then runs the
WAND kernel per claim via ``groupBy(claim_id).applyInPandas`` — the shuffle
moves only compressed blobs of the query's terms (bounded per slice by
salting), never the corpus. Inside the kernel, block decode is lazy: blocks
whose upper bound cannot beat the running threshold are never decompressed.

Reference analog: the WAND/BMW literature (Broder et al. 2003; Ding & Suel
2011) — the reference itself scores exhaustively with a sparse dot product
(SURVEY.md §2.A10); WAND is the from-scratch scale replacement mandated by
BASELINE.json.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from defactonlp_spark.config import BM25Params, EngineConfig
from defactonlp_spark.functions.varbyte import vb_decode
from defactonlp_spark.operators.segments import bm25_contrib, idf

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("claim_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


class _Cursor:
    """Lazy block-decoding cursor over one (term, salt) segment slice."""

    __slots__ = (
        "term", "n", "block_size", "docs_blob", "tfs_blob", "dls_blob",
        "last_ids", "max_scores", "doc_offs", "tf_offs", "dl_offs",
        "idf_t", "avgdl", "params", "ub",
        "blk", "pos", "blk_ids", "blk_contrib", "exhausted",
    )

    def __init__(self, row, n_docs: int, avgdl: float, params: BM25Params, block_size: int):
        self.term = row["term"]
        self.n = int(row["n"])
        self.block_size = block_size
        self.docs_blob = row["docs_blob"]
        self.tfs_blob = row["tfs_blob"]
        self.dls_blob = row["dls_blob"]
        bm = row["blockmax"]
        self.last_ids = np.array([b["last_doc_id"] for b in bm], dtype=np.int64)
        self.max_scores = np.array([b["max_score"] for b in bm], dtype=np.float64)
        self.doc_offs = np.array([b["doc_off"] for b in bm], dtype=np.int64)
        self.tf_offs = np.array([b["tf_off"] for b in bm], dtype=np.int64)
        self.dl_offs = np.array([b["dl_off"] for b in bm], dtype=np.int64)
        self.idf_t = float(idf(int(row["df"]), n_docs))
        self.avgdl = avgdl
        self.params = params
        self.ub = float(self.max_scores.max())
        self.exhausted = self.n == 0
        self.blk = -1
        self.pos = 0
        self.blk_ids = None
        self.blk_contrib = None
        if not self.exhausted:
            self._load_block(0)

    # -- block machinery ---------------------------------------------------
    def _block_extent(self, k: int) -> tuple[int, int, int]:
        start = k * self.block_size
        cnt = min(self.block_size, self.n - start)
        base = int(self.last_ids[k - 1]) if k > 0 else 0
        return start, cnt, base

    def _slice_blob(self, blob, offs, k, cnt_hint):
        lo = int(offs[k])
        hi = int(offs[k + 1]) if k + 1 < len(offs) else len(blob)
        return blob[lo:hi]

    def _load_block(self, k: int) -> None:
        start, cnt, base = self._block_extent(k)
        gaps = vb_decode(self._slice_blob(self.docs_blob, self.doc_offs, k, cnt), cnt)
        ids = np.cumsum(gaps.astype(np.int64)) + base
        tfs = vb_decode(self._slice_blob(self.tfs_blob, self.tf_offs, k, cnt), cnt)
        dls = vb_decode(self._slice_blob(self.dls_blob, self.dl_offs, k, cnt), cnt)
        self.blk = k
        self.pos = 0
        self.blk_ids = ids
        self.blk_contrib = bm25_contrib(tfs, dls, self.idf_t, self.avgdl, self.params)

    # -- WAND interface ------------------------------------------------------
    def doc(self) -> int:
        return int(self.blk_ids[self.pos])

    def contrib(self) -> float:
        return float(self.blk_contrib[self.pos])

    def block_max(self) -> float:
        return float(self.max_scores[self.blk])

    def block_last(self) -> int:
        return int(self.last_ids[self.blk])

    def shallow_block_for(self, target: int) -> int:
        """Index of the block that could contain target (no decode)."""
        return int(np.searchsorted(self.last_ids, target, side="left"))

    def advance_to(self, target: int) -> None:
        """Move to the first posting with doc_id >= target (lazy decode)."""
        if self.exhausted:
            return
        k = self.shallow_block_for(target)
        if k >= len(self.last_ids):
            self.exhausted = True
            return
        if k != self.blk:
            self._load_block(k)
            self.pos = 0
        self.pos = int(np.searchsorted(self.blk_ids, target, side="left"))
        if self.pos >= len(self.blk_ids):  # defensive; target <= block last
            self.exhausted = True

    def next(self) -> None:
        self.pos += 1
        if self.pos >= len(self.blk_ids):
            if self.blk + 1 < len(self.last_ids):
                self._load_block(self.blk + 1)
            else:
                self.exhausted = True


def wand_topk_kernel(
    slices: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    params: BM25Params,
    block_size: int,
) -> list[tuple[int, float]]:
    """Block-max WAND over one claim's segment slices -> [(doc_id, score)]
    sorted by (score desc, doc_id asc), len <= k."""
    cursors = [
        _Cursor(row, n_docs, avgdl, params, block_size)
        for _, row in slices.iterrows()
    ]
    cursors = [c for c in cursors if not c.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc_id): heap[0] is the WORST kept

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -np.inf

    while True:
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.doc())
        theta = threshold()
        # pivot: first prefix whose UB sum can reach theta
        acc = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = cursors[pivot].doc()
        if cursors[0].doc() == pivot_doc:
            # block-max refinement: shallow-advance prefix blocks, re-check
            bub = 0.0
            boundary = np.iinfo(np.int64).max
            prefix_end = pivot
            while prefix_end + 1 < len(cursors) and cursors[prefix_end + 1].doc() == pivot_doc:
                prefix_end += 1
            sound = True
            for c in cursors[: prefix_end + 1]:
                bk = c.shallow_block_for(pivot_doc)
                if bk >= len(c.last_ids):
                    continue
                bub += float(c.max_scores[bk])
                boundary = min(boundary, int(c.last_ids[bk]))
            if bub < theta:
                # No doc in [pivot_doc, boundary] can beat theta from the
                # prefix cursors alone — but a doc past the NEXT cursor's
                # position may draw on non-prefix terms, so never jump past it.
                nxt = cursors[prefix_end + 1].doc() if prefix_end + 1 < len(cursors) else np.iinfo(np.int64).max
                target = min(boundary + 1, nxt)
                for c in cursors[: prefix_end + 1]:
                    c.advance_to(target)
                continue
            # full evaluation, ascending-term summation (parity contract)
            parts = sorted(
                (c.term, c.contrib()) for c in cursors if not c.exhausted and c.doc() == pivot_doc
            )
            score = 0.0
            for _, v in parts:
                score += v
            key = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:
                heapq.heapreplace(heap, key)
            for c in cursors:
                if not c.exhausted and c.doc() == pivot_doc:
                    c.next()
        else:
            # advance all cursors before the pivot up to the pivot doc
            for c in cursors[:pivot]:
                c.advance_to(pivot_doc)
    out = sorted(((s, d) for s, d in heap), key=lambda t: (-t[0], -t[1]))
    return [(-d, s) for s, d in out]


def wand_topk(
    segments: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 5,
    cfg: EngineConfig = EngineConfig(),
) -> DataFrame:
    """segments x (claim_id, term) -> results(claim_id, rank, doc_id, score).

    Plan: prune the segment scan to query terms (isin filter -> parquet
    row-group stats apply because segments are written term-sorted), gather
    each claim's slices via broadcast join, WAND per claim in applyInPandas.
    """
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    hits = segments.filter(F.col("term").isin(terms))
    joined = hits.join(F.broadcast(qterms), "term", "inner")

    params, bs = cfg.bm25, cfg.block_size

    def per_claim(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (claim_id,) = key
        top = wand_topk_kernel(pdf, n_docs, avgdl, k, params, bs)
        return pd.DataFrame(
            {
                "claim_id": np.int64(claim_id),
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
                "doc_id": np.array([d for d, _ in top], dtype=np.int64),
                "score": np.array([s for _, s in top], dtype=np.float64),
            }
        )

    return joined.groupBy("claim_id").applyInPandas(per_claim, schema=RESULTS_SCHEMA)
