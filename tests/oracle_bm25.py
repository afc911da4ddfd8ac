"""Pure-numpy BM25 oracle (no Spark) — the parity reference for tests.

Pinned identically to the engine (config.BM25Params docstring):
idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-doc contributions summed in
ascending term order, float64. Shares the scalar formula helpers with the
engine so "parity" isolates the DISTRIBUTED/PRUNED machinery, not the
arithmetic.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from defactonlp_spark.config import BM25Params
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.segments import bm25_contrib, idf


def build_oracle_index(texts: dict[int, str]):
    """doc_id -> text  =>  (postings dict term->{doc:tf}, dl dict, N, avgdl)."""
    postings: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in texts.items():
        toks = tokenize_one(text)
        dl[doc_id] = len(toks)
        for t, c in Counter(toks).items():
            postings.setdefault(t, {})[doc_id] = c
    n = len(texts)
    avgdl = float(np.mean([np.float64(v) for v in dl.values()])) if dl else 0.0
    return postings, dl, n, avgdl


def bm25_topk_oracle(
    texts: dict[int, str],
    claims: dict[int, str],
    k: int = 5,
    params: BM25Params = BM25Params(),
    avgdl_override: float | None = None,
    n_override: int | None = None,
):
    postings, dl, n, avgdl = build_oracle_index(texts)
    if avgdl_override is not None:
        avgdl = avgdl_override
    if n_override is not None:
        n = n_override
    out: dict[int, list[tuple[int, float]]] = {}
    for cid, claim in claims.items():
        qterms = sorted(set(tokenize_one(claim)))
        scores: dict[int, np.float64] = {}
        for t in qterms:  # ascending term order — the parity contract
            plist = postings.get(t)
            if not plist:
                continue
            idf_t = float(idf(len(plist), n))
            for doc_id, tf in plist.items():
                c = np.float64(bm25_contrib(np.float64(tf), np.float64(dl[doc_id]), idf_t, avgdl, params))
                scores[doc_id] = scores.get(doc_id, np.float64(0.0)) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[cid] = [(d, float(s)) for d, s in ranked]
    return out
