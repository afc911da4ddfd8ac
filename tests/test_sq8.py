"""SQ8 scalar quantization: pinned encode values (incl. the round-half-up
boundary), null/zero degradation, integer-exact scalar replay of the
quantized cosine, and recall against the exact cosine baseline."""

import math

import numpy as np
import pytest

from defactonlp_spark.operators.similarity import (
    cosine_topk,
    sq8_cosine_topk,
    sq8_encode,
)


def _mk_emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq8_encode_pinned_values(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [-2.0, 2.0, 1.0, -1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> scale 0, NULL codes
        (3, None),                   # null vector -> NULL scale + codes
    ]
    got = {r["vec_id"]: r for r in sq8_encode(_mk_emb(spark, rows)).collect()}
    # row 0: mx=1.0; codes = floor([127, -63.5, 31.75, 0] + 0.5)
    #        -0.5*127 = -63.5 -> floor(-63.0) = -63 (round-half-up pinned)
    assert got[0]["scale"] == 1.0
    assert got[0]["codes"] == [127, -63, 32, 0]
    assert got[1]["scale"] == 2.0
    assert got[1]["codes"] == [-127, 127, 64, -63]  # 1*127/2=63.5 -> 64; -63.5 -> -63
    assert got[2]["scale"] == 0.0 and got[2]["codes"] is None
    assert got[3]["scale"] is None and got[3]["codes"] is None


def _sq8_oracle(rows, query_ids, k):
    """Pure-python integer replay of the pinned quantized cosine."""
    codes = {}
    for vid, v in rows:
        if v is None:
            continue
        x = np.asarray(v, dtype=np.float64)
        mx = float(np.max(np.abs(x))) if len(x) else 0.0
        if mx == 0.0:
            continue
        codes[vid] = np.floor((x * 127.0) / mx + 0.5).astype(np.int64)
    out = {}
    for q in query_ids:
        if q not in codes:
            continue
        cq = codes[q]
        nq = math.sqrt(float((cq * cq).sum()))
        scored = []
        for vid, c in codes.items():
            if vid == q:
                continue
            dot = float((c * cq).sum())
            nd = math.sqrt(float((c * c).sum()))
            scored.append((vid, round(dot / (nd * nq), 6)))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        out[q] = scored[:k]
    return out


@pytest.fixture(scope="module")
def gauss_rows():
    rng = np.random.default_rng(20240817)
    # 3 well-separated clusters of 40 + 2 exact twins (tie + .5-boundary bait)
    centers = rng.normal(size=(3, 16)) * 3.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(40):
            rows.append((vid, (c + rng.normal(size=16) * 0.3).astype(np.float32).tolist()))
            vid += 1
    rows.append((vid, rows[0][1]))  # exact duplicate of vec 0
    return rows


def test_sq8_cosine_matches_integer_replay(spark, gauss_rows):
    emb = _mk_emb(spark, gauss_rows)
    qids = [0, 40, 80]
    got = sq8_cosine_topk(emb, qids, k=8).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    want = _sq8_oracle(gauss_rows, qids, k=8)
    assert set(by_q) == set(want)
    for q in want:
        assert [v for v, _ in by_q[q]] == [v for v, _ in want[q]]
        for (gv, gc), (wv, wc) in zip(by_q[q], want[q]):
            assert gc == pytest.approx(wc, abs=1e-9)


def test_sq8_exact_twin_ranks_first(spark, gauss_rows):
    emb = _mk_emb(spark, gauss_rows)
    dup_id = gauss_rows[-1][0]
    top = sq8_cosine_topk(emb, [0], k=1).collect()[0]
    assert top["vec_id"] == dup_id and top["cos"] == 1.0


def test_sq8_recall_vs_exact_cosine(spark, gauss_rows):
    emb = _mk_emb(spark, gauss_rows).persist()
    qids = [0, 40, 80]
    k = 10
    exact = cosine_topk(emb, qids, k=k).collect()
    quant = sq8_cosine_topk(emb, qids, k=k).collect()
    ex = {}
    qu = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in quant:
        qu.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & qu[q]) / k for q in ex]
    emb.unpersist()
    assert min(recalls) >= 0.8, recalls


def test_sq8_null_and_zero_vectors_excluded(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),
        (3, None),
    ]
    res = sq8_cosine_topk(_mk_emb(spark, rows), [0, 2, 3], k=5).collect()
    assert {r["query_id"] for r in res} == {0}
    assert {r["vec_id"] for r in res} == {1}


def test_sq8_batch_local_pruning_layout_independent(spark, gauss_rows):
    """The kernel's conservative batch-local top-k must not change results
    when the corpus is split across many partitions/batches."""
    one = sq8_cosine_topk(_mk_emb(spark, gauss_rows), [0, 40, 80], k=7).collect()
    many = sq8_cosine_topk(
        _mk_emb(spark, gauss_rows).repartition(9), [0, 40, 80], k=7
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert [(r["query_id"], r["rank"], r["vec_id"], r["cos"]) for r in sorted(one, key=key)] == [
        (r["query_id"], r["rank"], r["vec_id"], r["cos"]) for r in sorted(many, key=key)
    ]
