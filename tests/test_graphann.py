"""Graph-based ANN (per-cell NSW over the IVF coarse partition).

Pins: (1) kernel exactness when the beam covers the cell (ef >= n the
search is exhaustive-equivalent), (2) determinism / twin-replay parity —
the distributed applyInPandas pass must emit byte-identical candidates to
a single-node numpy replay of the same kernel (the contract the DuckDB
twin relies on), (3) recall@10 vs brute force at fixture scale, (4) the
exact-rescore tail (returned cos values match cosine_topk's on shared
ids)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.graphann import (
    GRAPH_EF,
    GRAPH_M,
    graph_ann_topk,
    nsw_candidates_np,
    probe_cells_np,
)
from defactonlp_spark.operators.similarity import (
    cosine_topk,
    ivf_train,
    ivf_train_np,
)

SF = "/root/testdata/sf0.001"
QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kernel_exact_when_beam_covers_cell():
    # NOTE: exhaustiveness at ef == n holds at THIS pinned fixture but is
    # not an NSW invariant — backlink pruning can orphan a node (see
    # test_properties.py::test_nsw_beam_output_contract for the general
    # contract); this test pins the deterministic behavior at seed 7.
    rng = np.random.RandomState(7)
    mat = rng.randn(30, 16)
    ids = np.arange(100, 130, dtype=np.int64)
    q = rng.randn(16)
    got = nsw_candidates_np(ids, mat, [(9, q)], M=8, ef=30)
    assert len(got) == 30 and {g[0] for g in got} == {9}
    # with ef == n every node is returned, ordered sim desc / id asc
    hmat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = hmat @ (q / np.linalg.norm(q))
    want = [int(ids[i]) for i in sorted(range(30), key=lambda i: (-sims[i], i))]
    assert [g[1] for g in got] == want


def test_kernel_row_order_invariant():
    rng = np.random.RandomState(3)
    mat = rng.randn(40, 8)
    ids = np.arange(40, dtype=np.int64)
    q = rng.randn(8)
    a = nsw_candidates_np(ids, mat, [(1, q)], M=4, ef=12)
    perm = rng.permutation(40)
    b = nsw_candidates_np(ids[perm], mat[perm], [(1, q)], M=4, ef=12)
    assert a == b


def test_engine_candidates_match_numpy_replay(spark, emb):
    """The twin contract: replay cells + probes + per-cell NSW on the
    driver in numpy and compare against the distributed result's
    candidate set (pre-rescore ids per query)."""
    res = graph_ann_topk(emb, QIDS, k=10).toPandas()

    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cents = ivf_train_np(mat, 16, 5)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    cells = np.argmax((mat / norms) @ cents.T, axis=1)
    qrows = np.isin(ids, QIDS)
    probes = probe_cells_np(mat[qrows], cents, 4)
    pairs: set[tuple[int, int]] = set()
    for qi, qid in enumerate(ids[qrows]):
        for c in probes[qi]:
            m = cells == c
            pairs.update(
                nsw_candidates_np(ids[m], mat[m], [(int(qid), mat[ids == qid][0])])
            )
    pairs = {(q, v) for q, v in pairs if q != v}

    # every returned row must be a replayed candidate (rescore only prunes)
    got = {(int(r.query_id), int(r.vec_id)) for r in res.itertuples()}
    assert got <= pairs
    # and per query the top-10 of the replayed candidate set (by exact
    # cosine) is exactly what the engine returned
    hmat = mat / norms
    for qid in QIDS:
        cand = sorted(v for q, v in pairs if q == qid)
        qv = hmat[ids == qid][0]
        sims = {v: round(float(hmat[ids == v][0] @ qv), 6) for v in cand}
        want = sorted(cand, key=lambda v: (-sims[v], v))[:10]
        mine = res[res.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert mine == want


def test_recall_vs_brute_force(spark, emb):
    approx = graph_ann_topk(emb, QIDS, k=10).toPandas()
    exact = cosine_topk(emb, QIDS, k=10).toPandas()
    hits = tot = 0
    for qid in QIDS:
        a = set(approx[approx.query_id == qid]["vec_id"])
        e = set(exact[exact.query_id == qid]["vec_id"])
        hits += len(a & e)
        tot += len(e)
    assert hits / tot >= 0.5, f"recall@10 {hits}/{tot}"
    # the tie-robust quality gate: returned neighbors must be essentially
    # as close as the exact ones even where identities churn (the ANN
    # relative-error metric — see bench_graph_ops for the measured story)
    ratio = float(approx.cos.mean()) / float(exact.cos.mean())
    assert ratio >= 0.9, f"sim ratio {ratio}"


def test_rescore_is_exact(spark, emb):
    """cos on returned rows equals the brute-force cosine for the same
    (query, doc) pair — graph approximation only affects WHICH ids
    surface, never their scores."""
    approx = graph_ann_topk(emb, [0], k=10).toPandas()
    exact = cosine_topk(emb, [0], k=200).toPandas()
    ex = {int(r.vec_id): r.cos for r in exact.itertuples()}
    for r in approx.itertuples():
        if int(r.vec_id) in ex:
            assert abs(r.cos - ex[int(r.vec_id)]) < 1e-9


def test_determinism(spark, emb):
    a = graph_ann_topk(emb, QIDS, k=10).toPandas()
    b = graph_ann_topk(emb, QIDS, k=10).toPandas()
    assert a.equals(b)
