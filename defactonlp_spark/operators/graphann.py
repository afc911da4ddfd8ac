"""Graph-based ANN: per-cell Navigable-Small-World graphs over an IVF
coarse partition — the README design note ("IVF-cell-partitioned per-cell
graphs", README.md §ANN) made real, closing the last missing tier of the
similarity surface (VERDICT r4 "What's missing" #4).

Algorithm (public): Malkov et al., "Approximate nearest neighbor search
based on navigable small world graphs" (Information Systems, 2014), and
the HNSW layer-0 insertion/search procedure (Malkov & Yashunin, 2018).
Reimplemented from the papers in numpy + heapq — no hnswlib/faiss (absent
in this environment, and a from-scratch kernel is what the twin needs).

Shape at scale
--------------
- The IVF quantizer (``similarity.ivf_train``, a tiny broadcast model)
  coarse-partitions the corpus into cells sized to fit one executor
  (10^5-10^7 vectors each at 10^12 total). Cells are the distribution
  unit: per-cell graphs are built INDEPENDENTLY inside one
  ``applyInPandas`` pass — construction parallelism = number of cells,
  zero cross-cell traffic, O(n_cell * M * ef) work per cell (incremental
  NSW insertion, NOT O(n^2) all-pairs).
- Queries are request-shaped (|Q| rows): collected once, probe their
  ``n_probe`` nearest cells, and ride into the cell pass via broadcast.
  The ONLY shuffle is the groupBy(cell) exchange over the (pruned) probed
  cells; search work per query is O(n_probe * ef * M) distance
  evaluations regardless of corpus size.
- Candidates (|Q| * n_probe * ef rows) are exact-cosine rescored with the
  same windowed top-k tail as every ANN path here, so precision on
  returned candidates is exact. In production the graphs persist
  alongside the vectors (like the segment table); at fixture scale they
  are rebuilt per call.

Determinism contract (what makes a full DuckDB value-hash twin possible
for a traversal SQL cannot express): candidate generation is a pure
function of the id-sorted cell matrix and the query vector
(:func:`nsw_candidates_np` — ties broken by id everywhere, float64
throughout). The oracle generator replays the SAME kernel on the SAME
float64 input at twin-generation time and inlines the resulting
(query_id, vec_id) candidate pairs; rescoring then runs independently in
SQL (cosine over raw vectors, round 6) — the ``ivf_train_np``
inlined-learned-constants convention applied to a graph.
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defactonlp_spark.operators.similarity import (
    cosine_expr,
    ivf_train,
)

GRAPH_M = 8  # max out-degree per node (HNSW M)
GRAPH_EF = 24  # beam width for construction AND search (efConstruction/efSearch)


def _nsw_search(nbrs: list[list[int]], hmat: np.ndarray, q: np.ndarray,
                ef: int, bound: int | None = None) -> list[int]:
    """Best-first beam search over the NSW graph (HNSW SEARCH-LAYER).

    ``hmat`` rows are L2-normalized; similarity = dot. Entry point is node
    0 (the lowest-id member — deterministic). ``bound`` restricts the
    search to nodes < bound (the insertion frontier during construction).
    Returns up to ``ef`` node indices ordered (sim desc, id asc). Pure
    function of its inputs: heap ties compare the int id, so traversal
    order is deterministic.
    """
    n = len(hmat) if bound is None else bound
    if n <= 0:
        return []
    entry = 0
    s0 = float(hmat[entry] @ q)
    visited = {entry}
    cand = [(-s0, entry)]  # max-heap by sim (negated)
    result = [(s0, entry)]  # min-heap of the current top-ef
    while cand:
        neg, u = heapq.heappop(cand)
        if len(result) >= ef and -neg < result[0][0]:
            break  # best unexplored candidate is worse than the worst kept
        for v in nbrs[u]:
            if v >= n or v in visited:
                continue
            visited.add(v)
            sv = float(hmat[v] @ q)
            if len(result) < ef or sv > result[0][0]:
                heapq.heappush(cand, (-sv, v))
                heapq.heappush(result, (sv, v))
                if len(result) > ef:
                    heapq.heappop(result)
    return [v for _, v in sorted(result, key=lambda t: (-t[0], t[1]))]


def _nsw_build(hmat: np.ndarray, M: int, ef: int) -> list[list[int]]:
    """Incremental NSW construction (HNSW layer-0 INSERT): nodes are
    inserted in id order; each new node links to its M nearest among the
    already-inserted (found by beam search over the partial graph), links
    are made bidirectional, and over-full neighbor lists are pruned back
    to the M highest-similarity edges (ties: lower id). O(n * M * ef)."""
    n = len(hmat)
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        found = _nsw_search(nbrs, hmat, hmat[i], max(ef, M), bound=i)
        sel = found[:M]
        nbrs[i] = list(sel)
        for j in sel:
            lst = nbrs[j]
            lst.append(i)
            if len(lst) > M:
                sims = hmat[lst] @ hmat[j]
                order = sorted(range(len(lst)), key=lambda t: (-sims[t], lst[t]))
                nbrs[j] = [lst[t] for t in order[:M]]
    return nbrs


def nsw_candidates_np(ids: np.ndarray, mat: np.ndarray,
                      queries: list[tuple[int, np.ndarray]],
                      M: int = GRAPH_M, ef: int = GRAPH_EF) -> list[tuple[int, int]]:
    """The shared engine/twin kernel: given one cell's members (``ids``
    int64, ``mat`` float64 raw vectors — any row order; sorted by id
    internally) and the queries probing the cell, build the cell's NSW
    graph and return the union of per-query beam results as
    (query_id, vec_id) pairs (order: per query, sim desc then id asc).

    Both the ``applyInPandas`` worker and the DuckDB twin generator call
    THIS function on identical float64 input, so candidates are
    bit-identically reproducible across engine and oracle."""
    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids, dtype=np.int64)[order]
    mat = np.asarray(mat, dtype=np.float64)[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    hmat = mat / norms
    nbrs = _nsw_build(hmat, M, ef)
    out: list[tuple[int, int]] = []
    for qid, qv in queries:
        qv = np.asarray(qv, dtype=np.float64)
        qn = np.linalg.norm(qv)
        qh = qv / (qn if qn != 0.0 else 1.0)
        for v in _nsw_search(nbrs, hmat, qh, ef):
            out.append((int(qid), int(ids[v])))
    return out


def probe_cells_np(qmat: np.ndarray, cents: np.ndarray, n_probe: int) -> np.ndarray:
    """Per-query probe cells: the ``n_probe`` highest-dot centroids of the
    normalized query (stable argsort, ties to the lower cell id) — the
    same rule ``ivf_ann_topk``'s probes_udf applies, factored to numpy so
    engine and twin share it. -> (|Q|, n_probe) int array."""
    norms = np.linalg.norm(qmat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    dots = (qmat / norms) @ cents.T
    return np.argsort(-dots, axis=1, kind="stable")[:, :n_probe]


def graph_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    M: int = GRAPH_M,
    ef: int = GRAPH_EF,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via per-cell NSW graph search (module docstring
    has the full scale story). -> (query_id, rank, vec_id, cos).

    Plan shape: one scan of the embeddings assigns cells (broadcast
    quantizer, vectorized pandas_udf); rows of UNPROBED cells are filtered
    before the exchange (the |Q|*n_probe probed-cell set is an isin
    pushdown); ONE groupBy(cell) shuffle feeds the applyInPandas graph
    pass; candidates rescore via two broadcast-side joins + windowed
    top-k. The query collect is request-shaped (|Q| rows), the standard
    cap-guarded materialization.
    """
    import pandas as pd

    from defactonlp_spark.operators.similarity import with_ivf_cell

    spark = embeddings.sparkSession
    cents = (
        ivf_train(embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
        if centroids is None
        else centroids
    )
    emb = with_ivf_cell(embeddings, cents, vec_col=vec_col)

    qpdf = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .orderBy(id_col)
        .toPandas()
    )
    if not len(qpdf):
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    qids = qpdf[id_col].to_numpy()
    qmat = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    probes = probe_cells_np(qmat, cents, min(n_probe, len(cents)))

    # cell -> [(query_id, qvec_f64)] routing table; tiny, broadcast.
    by_cell: dict[int, list[tuple[int, np.ndarray]]] = {}
    for qi in range(len(qids)):
        for c in probes[qi]:
            by_cell.setdefault(int(c), []).append((int(qids[qi]), qmat[qi]))
    bc = spark.sparkContext.broadcast(by_cell)
    probed = sorted(by_cell)

    def cell_worker(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        qs = bc.value.get(cell)
        if not qs:
            return pd.DataFrame({"query_id": [], "vec_id": []}).astype("int64")
        cids = pdf[id_col].to_numpy()
        cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        pairs = nsw_candidates_np(cids, cmat, qs, M=M, ef=ef)
        return pd.DataFrame(pairs, columns=["query_id", "vec_id"]).astype("int64")

    cand = (
        emb.filter(F.col("cell").isin(probed))
        .select(id_col, vec_col, "cell")
        .groupBy("cell")
        .applyInPandas(cell_worker, "query_id long, vec_id long")
        .filter(F.col("vec_id") != F.col("query_id"))
    )

    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": qids, "qvec": list(qmat)}),
        "query_id long, qvec array<double>",
    )
    rescored = (
        cand.join(F.broadcast(qdf), "query_id")
        .join(
            embeddings.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
            ),
            "vec_id",
        )
        .withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col("_v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )
