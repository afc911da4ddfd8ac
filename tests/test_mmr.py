"""MMR diversified top-k vs a scalar numpy replay of the pinned spec:
candidates = cosine top-fetch_k (cos rounded 6dp, id tiebreak); greedy
step 1 = pure relevance, step i = lam*cos6 - (1-lam)*max sim6 to selected;
selection order (mmr desc, id asc)."""

import numpy as np
import pandas as pd

from defactonlp_spark.operators.similarity import cosine_topk, mmr_topk


def _replay(mat, qid, k, lam, fetch_k):
    n = mat.shape[0]
    norms = np.linalg.norm(mat, axis=1)

    def cos6(i, j):
        return round(float(mat[i] @ mat[j] / (norms[i] * norms[j])), 6)

    cand = sorted(
        ((cos6(qid, j), j) for j in range(n) if j != qid),
        key=lambda t: (-t[0], t[1]),
    )[:fetch_k]
    selected, out = [], []
    remaining = list(cand)
    for step in range(1, k + 1):
        best = None
        for c, j in remaining:
            m = c if step == 1 else lam * c - (1 - lam) * max(
                cos6(j, s) for s in selected
            )
            key = (m, -j)
            if best is None or key > best[0]:
                best = (key, c, j)
        (m, _negj), _c, j = best[0], best[1], best[2]
        selected.append(j)
        remaining = [(c, jj) for c, jj in remaining if jj != j]
        out.append((step, j, m))
    return out


def test_mmr_matches_scalar_replay(spark):
    rng = np.random.RandomState(5)
    n, d = 60, 8
    mat = rng.randn(n, d)
    # plant near-duplicates so the diversification penalty bites
    mat[10] = mat[3] + 0.001 * rng.randn(d)
    mat[11] = mat[3] + 0.001 * rng.randn(d)
    mat[12] = mat[7] + 0.002 * rng.randn(d)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(n), "embedding": [[float(x) for x in r] for r in mat]}
        )
    )
    # lam=0.4: the redundancy penalty outweighs the twin's ~1.0 relevance
    # (0.4*1 - 0.6*0.9999 < 0), so the planted-twin property below bites
    lam, k, fetch_k = 0.4, 5, 12
    got = (
        mmr_topk(emb, [3, 7], k=k, lam=lam, fetch_k=fetch_k)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    for qid in (3, 7):
        expect = _replay(mat, qid, k, lam, fetch_k)
        g = got[got.query_id == qid]
        assert list(g["rank"]) == [s for s, _, _ in expect]
        assert list(g["vec_id"]) == [j for _, j, _ in expect], qid
        for m_got, (_, _, m_exp) in zip(g["mmr"], expect):
            assert abs(m_got - m_exp) < 1e-6

    # the planted twins 10/11 are query 3's nearest neighbors; plain top-k
    # ranks both in the head, MMR must NOT take both back-to-back
    plain = cosine_topk(emb, [3], k=3).toPandas()
    assert {10, 11} <= set(plain["vec_id"])
    mmr_head = list(got[got.query_id == 3]["vec_id"][:2])
    assert not {10, 11} <= set(mmr_head)
