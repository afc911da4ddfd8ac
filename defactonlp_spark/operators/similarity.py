"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``     : brute-force cosine top-k (the correctness baseline) —
                        pure DataFrame algebra: broadcast the query vectors,
                        ``zip_with``/``aggregate`` dot product in whole-stage
                        codegen, windowed top-k. No Python.
- ``cosine_dup_pairs``: near-duplicate pairs by cosine >= threshold.
- ``lsh_ann_topk``    : the scale path — random-hyperplane LSH bucketing
                        (signs of h deterministic pseudo-projections), then
                        brute-force only WITHIN candidate buckets (multi-probe
                        by Hamming-adjacent buckets). Approximate by design.

Scale notes: brute-force is O(|Q| x |corpus|) — fine for reranking, wrong as
the primary path at 10^9 vectors. LSH bucketing turns it into one shuffle on
(bucket) with per-bucket brute force; bucket count 2^NBITS is tuned so the
mean bucket fits an executor. An IVF variant (k-means coarse quantizer) is
the next refinement; the plumbing (bucket column -> co-partitioned join) is
identical.

No reference analog: DeFactoNLP has no dense retrieval; this is part of the
training-data-pipeline surface (task spec) built on the driver's
``embeddings(vec_id, embedding float[64], label)`` fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a, b):
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors (excluding self) for each query id, by cosine.

    Output: (query_id, rank, vec_id, cos) — cos rounded to 6 dp so the
    DuckDB oracle hash-matches despite independent float summation.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = (
        embeddings.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("vec_id"), "cos")
    )


#: above this row count the all-pairs broadcast kernel refuses and the
#: expression self-join (or better: LSH) takes over — same philosophy as
#: Spark's broadcast-join threshold
BROADCAST_PAIRS_MAX_ROWS = 1_000_000


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_kernel: bool = True,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. The exactness baseline
    the LSH path is validated against.

    Default plan (broadcast kernel): the table is broadcast once as a dense
    float64 matrix (like a broadcast join's small side — all-pairs is only
    exact when one side fits anyway) and a mapInPandas pass computes each
    row-block x matrix cosine with a PER-DIMENSION left-to-right
    accumulation loop — numpy-vectorized across pairs but sequential in the
    dimension index, i.e. the exact float64 summation order of the SQL
    ``aggregate(zip_with(...))`` expression and DuckDB's
    ``list_dot_product``, so results hash-match the oracle bit-for-bit.
    Measured 88s -> ~3s on 2000 x 64-dim (2M pairs). Beyond
    BROADCAST_PAIRS_MAX_ROWS the expression self-join is used (and at real
    scale the LSH path is the answer, not exact all-pairs)."""
    import pandas as pd

    spark = embeddings.sparkSession
    if broadcast_kernel:
        # limit-probe BEFORE collecting: the guard must run before the
        # driver materialization it guards (ADVICE r1) — a limit(N+1).count()
        # stops scanning after N+1 rows and moves only a count to the driver
        probe = embeddings.select(id_col).limit(BROADCAST_PAIRS_MAX_ROWS + 1).count()
        if probe <= BROADCAST_PAIRS_MAX_ROWS:
            pdf = embeddings.select(id_col, vec_col).toPandas()
            ids = np.ascontiguousarray(pdf[id_col].to_numpy(np.int64))
            mat = np.ascontiguousarray(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            order = np.argsort(ids, kind="stable")
            ids, mat = ids[order], mat[order]
            dim = mat.shape[1]
            norms = np.zeros(len(ids), dtype=np.float64)
            for d in range(dim):  # sequential-in-d == SQL aggregate order
                norms += mat[:, d] * mat[:, d]
            norms = np.sqrt(norms)
            bc = spark.sparkContext.broadcast((ids, mat, norms))

            def gen(batches):
                b_ids, b_mat, b_norms = bc.value
                for batch in batches:
                    if batch.empty:
                        continue
                    a_ids = batch[id_col].to_numpy(np.int64)
                    a_mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
                    dots = np.zeros((len(a_ids), len(b_ids)), dtype=np.float64)
                    for d in range(dim):
                        dots += a_mat[:, d][:, None] * b_mat[:, d][None, :]
                    a_norms = np.zeros(len(a_ids), dtype=np.float64)
                    for d in range(dim):
                        a_norms += a_mat[:, d] * a_mat[:, d]
                    a_norms = np.sqrt(a_norms)
                    cos = np.round(dots / (a_norms[:, None] * b_norms[None, :]), 6)
                    keep = (a_ids[:, None] < b_ids[None, :]) & (cos >= threshold)
                    ai, bi = np.nonzero(keep)
                    yield pd.DataFrame(
                        {
                            "id_a": a_ids[ai],
                            "id_b": b_ids[bi],
                            "cos": cos[ai, bi],
                        }
                    )

            return embeddings.select(id_col, vec_col).mapInPandas(
                gen, schema="id_a long, id_b long, cos double"
            )
    # Exact all-pairs beyond the broadcast bound: the expression self-join —
    # still O(n^2) compare work by definition of EXACT all-pairs (one side
    # must be replicated somewhere; that is the nature of the operator, same
    # as a cartesian). The scale answer is not a better exact plan but
    # ``lsh_dup_pairs`` below: bucketed candidates + exact rescoring.
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


N_LSH_BITS = 8


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (seeded, no RNG call
    at plan time — reproducible across sessions and engines)."""
    import numpy as np

    rng = np.random.default_rng(1000 + bit)
    return [float(x) for x in rng.standard_normal(dim)]


def lsh_bucket_expr(vec_col, dim: int, n_bits: int = N_LSH_BITS):
    """bucket = sum_b (dot(v, H_b) > 0) << b — pure column expression.
    Kept as the executable spec; hot paths use ``with_lsh_bucket`` (same
    bits, vectorized kernel — higher-order array expressions evaluate
    interpreted per row, outside whole-stage codegen)."""
    v = _as_double(vec_col)
    acc = F.lit(0)
    for bit in range(n_bits):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, bit)])
        acc = acc + F.when(_dot(v, plane) > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return acc.cast("int")


def _stack_non_null(vecs: pd.Series):
    """(mask, mat): boolean non-null row mask + dense float64 matrix of the
    non-null vectors. Null/None embeddings get NULL outputs downstream
    instead of crashing np.stack (ADVICE r2 — dirty data must degrade to
    dropped rows, matching the expression path's null semantics)."""
    arr = vecs.to_numpy()
    mask = np.array([v is not None for v in arr], dtype=bool)
    mat = (
        np.stack(arr[mask]).astype(np.float64)
        if mask.any()
        else np.empty((0, 0), dtype=np.float64)
    )
    return mask, mat


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = N_LSH_BITS,
    out_col: str = "bucket",
) -> DataFrame:
    """Vectorized twin of ``lsh_bucket_expr``: one pandas_udf batch computes
    all plane dots with a per-dimension left-to-right accumulation (the SQL
    aggregate's float64 summation order, so the sign tests — and therefore
    the buckets — are bit-identical to the expression; pinned by
    tests/test_pipeline_ops.py::test_lsh_bucket_kernel_matches_expr).
    NULL embeddings get a NULL bucket (never join; same as the expression
    path's null propagation)."""
    from pyspark.sql import types as T

    planes = np.stack([_hyperplane(dim, b) for b in range(n_bits)])  # (bits, dim)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mask, mat = _stack_non_null(vecs)
        out = pd.array([None] * len(vecs), dtype="Int32")
        if mat.size:
            dots = np.zeros((len(mat), n_bits), dtype=np.float64)
            for d in range(dim):
                dots += mat[:, d][:, None] * planes[None, :, d]
            bits = (dots > 0).astype(np.int64)
            bucket = (bits << np.arange(n_bits)[None, :]).sum(axis=1)
            out[mask] = bucket.astype("int32")
        return pd.Series(out)

    return df.withColumn(out_col, bucket_udf(F.col(vec_col)))


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_bits: int = N_LSH_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (plus all
    Hamming-1 probes), then exact cosine within candidates."""
    emb = with_lsh_bucket(embeddings, vec_col, dim, n_bits)
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    probes = F.array(
        F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)]
    )
    q = q.withColumn("probe", F.explode(probes)).drop("qbucket")
    cand = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = cand.withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("vec_id"), "cos")
    )


def lsh_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    dim: int = 64,
    n_bits: int = N_LSH_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) via random-hyperplane LSH
    buckets — the 100-TB path ``cosine_dup_pairs`` is the oracle for.

    Plan: every vector gets a bucket (pure column expression, codegen); the
    lower-id side of each candidate pair probes its own bucket plus all
    Hamming-1 neighbors, the other side sits in its bucket — probing one
    side is lossless for bucket-Hamming<=1 because the probe relation is
    symmetric, and each pair meets on at most one probe value so no
    dedup pass is needed. Candidates are rescored with the EXACT cosine
    expression, so precision is 1.0 by construction; recall is the standard
    SimHash/LSH collision probability (1 - theta/pi per bit), tuned by
    n_bits (fewer bits = higher recall, bigger buckets). The shuffle is one
    equi-join keyed by bucket: |docs| x (n_bits + 1) probe rows against
    |docs| bucket rows — never all-pairs.

    Approximate BY DESIGN (like ``lsh_ann_topk``): validated on recall
    against ``cosine_dup_pairs`` in pytest; any pair it returns carries the
    exact rounded cosine, so returned rows are a subset of the exact
    operator's rows.
    """
    emb = with_lsh_bucket(embeddings, vec_col, dim, n_bits)
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)]
    )
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.explode(probes).alias("probe")
    )
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    cand = a.join(b, (F.col("probe") == F.col("bucket")) & (F.col("id_a") < F.col("id_b")))

    # rescoring kernel, NOT the cosine_expr SQL expression: higher-order
    # array functions (aggregate/zip_with) evaluate INTERPRETED per row —
    # measured 34.6 s for ~10^5 candidate pairs of dim 64 where this batched
    # numpy kernel does the same work in well under a second. Accumulation
    # is per-dimension left-to-right, the exact float64 summation order of
    # the SQL expression, so returned cosines stay bit-equal to
    # cosine_dup_pairs (the subset/equality pytest contract).
    def rescore(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            av = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            bv = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            dots = np.zeros(len(pdf), dtype=np.float64)
            na = np.zeros(len(pdf), dtype=np.float64)
            nb = np.zeros(len(pdf), dtype=np.float64)
            for d in range(av.shape[1]):
                dots += av[:, d] * bv[:, d]
                na += av[:, d] * av[:, d]
                nb += bv[:, d] * bv[:, d]
            cos = np.round(dots / (np.sqrt(na) * np.sqrt(nb)), 6)
            keep = cos >= threshold
            out = pdf.loc[keep, ["id_a", "id_b"]].copy()
            out["cos"] = cos[keep]
            yield out

    return cand.select("id_a", "id_b", "va", "vb").mapInPandas(
        rescore, schema="id_a long, id_b long, cos double"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means coarse-quantizer refinement of the
# LSH path. Same plumbing (cell column -> co-partitioned equi-join), but the
# partition of the vector space is LEARNED, so cells track the data
# distribution instead of random hyperplanes (tighter candidate sets at the
# same probe count — the standard IVF trade, cf. FAISS IVF-Flat [public]).
# ---------------------------------------------------------------------------


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
) -> np.ndarray:
    """Train the coarse quantizer: Lloyd's k-means on a deterministic sample,
    spherical (centroids L2-normalized; assignment by max dot = cosine).

    The quantizer is a TINY model (n_centroids x dim float64) held on the
    driver and broadcast — like FAISS's coarse quantizer it is trained on a
    sample, never the full corpus: at 10^12 vectors training reads
    ``sample_rows`` rows once (deterministic smallest-ids sample, so the
    model is reproducible across runs/cluster sizes), while assignment +
    search stay fully distributed.

    Pure numpy on the sample (n_centroids and dim are small); empty cells
    are re-seeded deterministically from the farthest points so exactly
    n_centroids cells survive."""
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .toPandas()
    )
    return ivf_train_np(np.stack(pdf[vec_col].to_numpy()).astype(np.float64),
                        n_centroids, n_iters)


def ivf_train_np(mat: np.ndarray, n_centroids: int = 16, n_iters: int = 5) -> np.ndarray:
    """Numpy core of :func:`ivf_train` over an id-sorted sample matrix —
    factored out so the DuckDB oracle can learn the IDENTICAL quantizer
    from the same rows (the inlined-constants convention the LSH
    hyperplanes use, applied to a LEARNED model: deterministic init,
    deterministic iteration, so the centroids are pure functions of the
    sample)."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    # deterministic init: evenly strided rows of the id-sorted sample
    idx = np.linspace(0, len(mat) - 1, n_centroids).astype(np.int64)
    cents = mat[idx].copy()
    for _ in range(n_iters):
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # re-seed dead cell with the worst-served point
                worst = np.argmin(np.max(mat @ cents.T, axis=1))
                cents[c] = mat[worst]
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def with_ivf_cell(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Add the IVF cell id: argmax_c dot(v_hat, centroid_c). Vectorized
    pandas_udf (one matmul per Arrow batch against the broadcast quantizer)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(centroids))

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        cents = bc.value
        mask, mat = _stack_non_null(vecs)
        out = pd.array([None] * len(vecs), dtype="Int32")
        if mat.size:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            out[mask] = np.argmax((mat / norms) @ cents.T, axis=1).astype("int32")
        return pd.Series(out)

    return embeddings.withColumn(out_col, cell_udf(F.col(vec_col)))


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its ``n_probe`` nearest
    cells; candidates = corpus rows in those cells; exact cosine rescoring +
    windowed top-k (identical tail to cosine_topk, so precision on returned
    candidates is exact).

    Plan shape at scale: the cell column is computed once (in production:
    persisted alongside the vectors, exactly like the segment table), the
    probe table is |Q| x n_probe rows — broadcast — and the single shuffle
    is the cell equi-join. Recall is tuned by n_probe/n_centroids; pytest
    validates recall >= 0.9 at the fixture scale vs brute force."""
    cents = ivf_train(embeddings, n_centroids, id_col=id_col, vec_col=vec_col) \
        if centroids is None else centroids
    emb = with_ivf_cell(embeddings, cents, vec_col=vec_col)

    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # per-query probe cells: n_probe highest-dot centroids (tiny — computed
    # with the same broadcast quantizer inside one pandas_udf)
    import pandas as pd
    from pyspark.sql import types as T

    bc = emb.sparkSession.sparkContext.broadcast(np.ascontiguousarray(cents))
    n_probe = min(n_probe, len(cents))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes_udf(vecs: pd.Series) -> pd.Series:
        c = bc.value
        mask, mat = _stack_non_null(vecs)
        out = [None] * len(vecs)
        if mat.size:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            order = np.argsort(-((mat / norms) @ c.T), axis=1, kind="stable")
            probes = list(order[:, :n_probe].astype("int32"))
            for i, pos in enumerate(np.nonzero(mask)[0]):
                out[pos] = probes[i]
        return pd.Series(out)

    q = q.withColumn("probe", F.explode(probes_udf(F.col("qvec"))))
    cand = emb.join(
        F.broadcast(q),
        (F.col("cell") == F.col("probe")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = cand.withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("vec_id"), "cos")
    )


def ann_recall_eval(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """ANN-method QA (the similarity-tier analog of ``dedup.pair_eval``,
    VERDICT r3 #4): per-query recall@k of an approximate top-k against the
    exact brute-force top-k — the acceptance gate a production ANN tier
    runs on a sample before trusting the index at full scale.

    Inputs: two (query_id, rank, vec_id, ...) rankings (``cosine_topk``
    shape). Output: (query_id, n_exact, n_approx, n_overlap, recall) with
    recall = n_overlap / k rounded to 6 dp. Queries present in ``exact``
    but absent from ``approx`` (empty candidate set) still get a row with
    recall 0.0 — silent drops would bias the mean upward (the same rule as
    ``analytics.ranking_rbo``).

    Plan: one (query, vec) equi-join of two k-row-per-query relations plus
    a query-keyed count — everything is query-sized, nothing corpus-sized
    moves.
    """
    hit = approx.select("query_id", "vec_id").withColumn("_hit", F.lit(1))
    n_approx = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_approx")
    )
    return (
        exact.select("query_id", "vec_id")
        .join(hit, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"),
        )
        .join(n_approx, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_approx"), F.lit(0)).cast("long").alias("n_approx"),
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def mmr_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    lam: float = 0.7,
    fetch_k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein,
    SIGIR 1998): greedily pick k of the fetch_k nearest neighbors, each step
    maximizing  lam*cos(q,d) - (1-lam)*max_{s in selected} cos(d,s)  — the
    standard redundancy-penalized re-rank (RAG context selection, dedup-
    aware retrieval). Output: (query_id, rank, vec_id, mmr).

    Engine-portability design (what makes the DuckDB twin EXACT despite the
    greedy feedback loop): both relevance (cos) and candidate-pair
    similarity (sim) enter the greedy already ROUNDED to 6 dp — computed by
    the same JVM column expressions as cosine_topk — so every mmr value is
    one IEEE multiply-subtract over identical doubles in either engine, and
    selection (ORDER BY mmr DESC, vec_id) can only diverge where the
    UNDERLYING cosines disagree at the 6th decimal, the same contract every
    other cosine entry already lives with. First pick is pure relevance
    (mmr = cos), the MMR convention.

    Scale: candidate fetch is the existing brute-force/LSH top-k (bounded
    fetch_k per query); the pairwise-sim relation is fetch_k^2 rows per
    query (JVM expression, no kernel); the greedy runs per-query in one
    cogrouped applyInPandas over O(fetch_k^2) rows — never corpus-sized.
    """
    cand = cosine_topk(embeddings, query_ids, k=fetch_k, id_col=id_col, vec_col=vec_col)
    cvec = cand.select("query_id", "vec_id", "cos").join(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")),
        "vec_id",
    )
    a, b = cvec.alias("a"), cvec.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.vec_id").alias("ca"),
            F.col("b.vec_id").alias("cb"),
            F.round(cosine_expr(F.col("a._v"), F.col("b._v")), 6).alias("sim"),
        )
    )

    schema = "query_id long, rank int, vec_id long, mmr double"

    def kern(cand_pdf: pd.DataFrame, pair_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=["query_id", "rank", "vec_id", "mmr"])
        qid = int(cand_pdf["query_id"].iloc[0])
        # candidates ordered by the cand relation's own (cos desc, id) rank
        cand_pdf = cand_pdf.sort_values(["cos", "vec_id"], ascending=[False, True])
        ids = cand_pdf["vec_id"].to_numpy(np.int64)
        cos = cand_pdf["cos"].to_numpy(np.float64)
        sim = {}
        for ca, cb, s in zip(pair_pdf["ca"], pair_pdf["cb"], pair_pdf["sim"]):
            sim[(int(ca), int(cb))] = float(s)
            sim[(int(cb), int(ca))] = float(s)
        selected: list[int] = []
        out = []
        remaining = list(range(len(ids)))
        for step in range(1, min(k, len(ids)) + 1):
            best_i, best_key = None, None
            for i in remaining:
                if step == 1:
                    m = float(cos[i])
                else:
                    msim = max(sim[(int(ids[i]), s)] for s in selected)
                    m = lam * float(cos[i]) - (1.0 - lam) * msim
                key = (m, -int(ids[i]))  # mmr desc, id asc
                if best_key is None or key > best_key:
                    best_i, best_key = i, key
            selected.append(int(ids[best_i]))
            remaining.remove(best_i)
            out.append((qid, step, int(ids[best_i]), best_key[0]))
        return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "mmr"])

    raw = (
        cand.select("query_id", "vec_id", "cos")
        .groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(kern, schema)
    )
    # final rounding in the JVM (F.round = HALF_UP on the decimal repr,
    # matching DuckDB's round) — Python's round() is banker's and diverges
    # on exact .5 boundaries that 7-decimal products of 6-dp inputs DO hit
    return raw.withColumn("mmr", F.round("mmr", 6))


# --------------------------------------------------------------------------
# SQ8 scalar quantization (Faiss IndexScalarQuantizer QT_8bit analog)
# --------------------------------------------------------------------------


def sq8_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: (id, scale, codes).

    Pinned spec (the DuckDB twin computes the identical integers):
      scale  = max(|x_i|)  over the float64-cast vector
      code_i = floor(x_i * 127.0 / scale + 0.5)   (round-half-up, exact in
               IEEE double for both engines; codes in [-127, 127])
      decode = code_i * scale / 127.0
    Zero vectors (scale == 0) encode to NULL codes — cosine against them is
    undefined and downstream scoring drops them (same null-degrade contract
    as the LSH/IVF kernels).

    Why this beats shipping float32 at 100 TB: 4x smaller vector storage and
    shuffle traffic, and — because cosine is scale-invariant — the quantized
    cosine is a ratio of EXACT int64 sums (dot and norms over codes), so
    scoring is integer arithmetic until one final divide: no float-summation
    noise anywhere, which is what makes the approximate path exactly
    oracle-checkable. The scale column exists for L2/dot rescoring, not for
    cosine.

    One Arrow-batched kernel, map-only: nothing corpus-sized shuffles.
    """
    id_field = embeddings.schema[id_col]
    schema = (
        f"{id_field.name} {id_field.dataType.simpleString()}, "
        "scale double, codes array<int>"
    )

    def kern(batches):
        for pdf in batches:
            n = len(pdf)
            scales = [None] * n
            codes = [None] * n
            mask, mat = _stack_non_null(pdf[vec_col])
            if mat.size:
                mx = np.max(np.abs(mat), axis=1)  # (m,)
                cm = np.floor((mat * 127.0) / np.where(mx == 0.0, 1.0, mx)[:, None] + 0.5).astype(np.int32)
                rows = np.nonzero(mask)[0]
                for j, r in enumerate(rows):
                    if mx[j] == 0.0:
                        scales[r] = 0.0
                    else:
                        scales[r] = float(mx[j])
                        codes[r] = cm[j].tolist()
            yield pd.DataFrame(
                {id_field.name: pdf[id_col], "scale": scales, "codes": codes}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(kern, schema)


def sq8_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Top-k neighbors by QUANTIZED cosine over SQ8 codes — the memory-tier
    sibling of :func:`cosine_topk` (which stays the exact baseline).

    cos_q = sum(ca_i * cb_i) / (sqrt(sum(ca_i^2)) * sqrt(sum(cb_i^2))),
    rounded 6 dp — the scales cancel, the three sums are exact int64, and
    both engines evaluate the same two sqrts and one divide on identical
    integers, so the twin hash-matches bit-for-bit (an approximate ANN
    method with an EXACT oracle).

    Plan: encode (map-only) -> broadcast the query codes as a dense int
    matrix -> one batched numpy kernel computes code-matrix products
    (int64 BLAS-shaped matmul); window top-k. Same envelope as cosine_topk
    with 4x less data in flight.
    """
    enc = encoded if encoded is not None else sq8_encode(embeddings, id_col, vec_col)
    enc = enc.filter(F.col("codes").isNotNull())
    # encode ONLY the query rows for the driver-side collect: the id filter
    # reaches the parquet scan (it cannot be pushed through the corpus
    # encode kernel), so this is a pruned scan + |q|-row kernel, and the
    # corpus-wide encode runs exactly once (in the scoring pass below)
    q_src = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        if encoded is None
        else enc.filter(F.col(id_col).isin(query_ids))
    )
    if encoded is None:
        q_src = sq8_encode(q_src, id_col, vec_col).filter(F.col("codes").isNotNull())
    q_rows = q_src.select(id_col, "codes").collect()
    if not q_rows:
        spark = embeddings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["codes"] for r in q_rows], dtype=np.int64)  # (Q, dim)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1).astype(np.float64))
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "query_id long, vec_id long, cos double"

    def kern(batches):
        qi, qm, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            cm = np.array([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            dots = cm @ qm.T  # (B, Q) exact int64
            norms = np.sqrt((cm * cm).sum(axis=1).astype(np.float64))
            cos = dots.astype(np.float64) / (norms[:, None] * qn[None, :])
            b, qn_ = cos.shape
            # Batch-local top-k pruning so the final per-query window sees
            # O(#batches * k) rows instead of the whole corpus (a
            # corpus-sized single-reducer window is the 100x killer).
            # Conservative guard band: the JVM rounds to 6 dp before
            # ranking, so keep everything within 2e-6 of the batch's
            # (k+1)-th raw cos — any dropped row still rounds strictly
            # below a kept one and can never enter the global top-k.
            # (k+1 because the self row, excluded later, may occupy a slot.)
            # RAW cos out; the 6-dp rounding happens JVM-side (F.round =
            # HALF_UP like DuckDB; np.round is banker's and integer-exact
            # code sums CAN produce exact .5e-6 boundaries, e.g. equal-norm
            # twins) — same rule as mmr_topk's final rounding above
            frames = []
            for j in range(qn_):
                col = cos[:, j]
                if b > k + 1:
                    kth = np.partition(col, -(k + 1))[-(k + 1)]
                    keep = col >= kth - 2e-6
                else:
                    keep = np.ones(b, dtype=bool)
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(int(keep.sum()), qi[j], dtype=np.int64),
                            "vec_id": ids[keep],
                            "cos": col[keep],
                        }
                    )
                )
            out = pd.concat(frames, ignore_index=True)
            yield out[out.query_id != out.vec_id]

    scored = enc.select(id_col, "codes").mapInPandas(kern, out_schema).withColumn(
        "cos", F.round("cos", 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos")
    )


def cosine_topk_filtered(
    embeddings: DataFrame,
    allowed: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PRE-filtered exact knn — the ES ``knn`` query's ``filter`` clause
    (and Lucene's ``KnnFloatVectorQuery(..., filter)``): candidates are
    restricted to ``allowed`` (any one-column (vec_id) relation — a
    metadata predicate, an ACL set, a dedup survivor list) BEFORE the
    similarity search, so the top-k is exact over the filtered set —
    unlike post-filtering a larger unfiltered top-k, which can return
    fewer than k (or miss) when the filter is selective. Query vectors
    are looked up from the UNFILTERED relation (the query point itself
    need not satisfy the filter — ES semantics).

    Output: (query_id, rank, vec_id, cos), cos rounded to 6 dp — the same
    contract as :func:`cosine_topk`; self-matches excluded.

    Scale shape: the filter is a left-semi join that Catalyst pushes below
    the broadcast-nested-loop scoring join, so a selective predicate
    shrinks the expensive kernel's input proportionally — the whole point
    of pre-filtering at 1B vectors. The LSH/IVF tiers compose the same
    way (semi-join the bucketed candidates before rescoring); this is the
    exact baseline those tiers are measured against.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = embeddings.join(
        allowed.select(F.col(allowed.columns[0]).alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    joined = (
        cand.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("vec_id"), "cos")
    )


def bq_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "bits",
) -> DataFrame:
    """Binary quantization (the ES 8.16 BBQ / RaBitQ storage idea at its
    simplest honest tier): 1 bit per dimension — bit_d = (v_d > 0), packed
    into ONE int64 for dim <= 64 (32x smaller than float32; the whole
    10^12-vector bit index is ~8 TB and scan-able). Pinned sign rule:
    strictly positive -> 1, zero or negative -> 0, computed on the RAW
    vector (normalization never changes signs).

    Entirely JVM-side: aggregate over (value, index) pairs OR-ing shifted
    bits — no UDF, codegen end to end. Dims past 64 raise EAGERLY, at
    execution of the first action touching ``out_col`` (this tier packs
    one word; multi-word packing is a storage-layout variant, not new
    semantics). The raise is in-plan via raise_error — an ADVICE r4 fix:
    a silent NULL here would sort FIRST under hamming ASC in bq_ann_topk
    and return meaningless candidates."""
    dim_probe = F.size(F.col(vec_col))
    # SQL form: the Python F.shiftleft only takes a literal shift count,
    # the SQL function takes an expression (the lambda's index)
    bits = F.expr(
        f"aggregate(zip_with({vec_col}, sequence(0, size({vec_col}) - 1), "
        f"(v, i) -> IF(v > 0, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc | x)"
    )
    guarded = F.when(dim_probe <= 64, bits).otherwise(
        F.raise_error(
            F.concat(
                F.lit("bq_encode: vector dim > 64 unsupported (got "),
                dim_probe.cast("string"),
                F.lit(")"),
            )
        ).cast("long")
    )
    return embeddings.select(
        F.col(id_col), F.col(vec_col), guarded.alias(out_col)
    )


def bq_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    fetch_k: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BBQ-style two-phase ANN: Hamming candidate generation over the
    packed sign bits (one xor + bit_count per pair — the binary index is
    what gets brute-force scanned, 8 bytes/vector), then EXACT cosine
    rescoring of the top ``fetch_k`` candidates per query (the ES BBQ
    oversample-and-rescore contract).

    Candidate ranking pinned (hamming asc, vec_id asc); final ranking
    (round(cos, 6) desc, vec_id asc) — the same tail as every other ANN
    path here, so precision on returned candidates is exact.
    -> (query_id, rank, vec_id, hamming, cos)

    Plan: the |Q|-row query-bit relation broadcasts onto ONE scan of the
    bit column; per-query WindowGroupLimit keeps fetch_k; only those
    candidates touch the full float vectors (second broadcast join by id).
    """
    enc = bq_encode(embeddings, id_col=id_col, vec_col=vec_col)
    qbits = enc.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bits").alias("qbits"),
    )
    ham = (
        enc.select(id_col, "bits")
        .join(F.broadcast(qbits), F.col(id_col) != F.col("query_id"), "inner")
        .withColumn(
            "hamming",
            F.bit_count(F.col("bits").bitwiseXOR(F.col("qbits"))).cast("int"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc(id_col))
    cand = (
        ham.withColumn("_rk", F.row_number().over(wc))
        .filter(F.col("_rk") <= fetch_k)
        .select("query_id", "qvec", id_col, "hamming")
    )
    rescored = cand.join(
        embeddings.select(F.col(id_col), F.col(vec_col).alias("_v")), id_col, "inner"
    ).withColumn("cos", F.round(cosine_expr(F.col("qvec"), F.col("_v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("vec_id"), "hamming", "cos")
    )
