"""Model-based quality filter + ES sampler aggregations — pure-Python
replays of the pinned specs."""

import hashlib
import math

import pytest

from defactonlp_spark.functions.textstats import (
    QL_BUCKETS,
    quality_linear,
    quality_weights,
)
from defactonlp_spark.operators.analytics import diversified_sampler, random_sampler


def py_quality(text, n=3, n_buckets=QL_BUCKETS):
    w = quality_weights(n_buckets)
    if text is None or len(text) < n:
        return 0, 0.5
    t = text.lower()
    cnt = len(t) - n + 1
    x = round(
        sum(
            w[int(hashlib.md5(t[i : i + n].encode()).hexdigest()[:8], 16) % n_buckets]
            for i in range(cnt)
        )
        / cnt,
        6,
    )
    return cnt, 1.0 / (1.0 + math.exp(-x))


def test_quality_weights_deterministic_and_bounded():
    w = quality_weights()
    assert len(w) == QL_BUCKETS
    assert all(-1.0 <= x <= 1.0 for x in w)
    assert w == quality_weights()  # pure function of the bucket index


def test_quality_linear_matches_replay(spark):
    texts = {
        0: "The quick brown fox jumps over the lazy dog",
        1: "aaaaaaaaaaaaaaaaaaaaaa",
        2: "Mixed CASE Text With Punctuation!!!",
        3: "ab",           # shorter than n -> 0.5
        4: None,            # NULL -> 0.5
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_linear(df).collect()}
    for d, t in texts.items():
        n, s = py_quality(t)
        assert got[d]["n_grams"] == n, d
        assert got[d]["quality_score"] == pytest.approx(s, rel=1e-12), d
    assert got[3]["quality_score"] == 0.5 and got[4]["quality_score"] == 0.5


def test_random_sampler_matches_hash_replay(spark):
    rows = [(i, "t" if i % 2 else "u", float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, grp string, value double")
    permille = 200
    got = {r["grp"]: r for r in random_sampler(df, "event_id", ["grp"], "value", permille).collect()}
    by_grp: dict = {}
    for i, g, v in rows:
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 < permille:
            by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        assert got[g]["n_sampled"] == len(vals)
        assert got[g]["est_count"] == pytest.approx(len(vals) * 5.0)
        assert got[g]["avg_value"] == pytest.approx(sum(vals) / len(vals))
    # determinism: second run identical
    again = {r["grp"]: r["n_sampled"] for r in random_sampler(df, "event_id", ["grp"], "value", permille).collect()}
    assert again == {g: r["n_sampled"] for g, r in got.items()}


def test_diversified_sampler_walk_replay(spark):
    # one claim: 8 ranked docs across 3 sources; max 2 per source, size 5
    ranked_rows = [(1, r, 100 + r, 10.0 - r) for r in range(1, 9)]
    meta_rows = [(100 + r, ["s1", "s1", "s1", "s2", "s2", "s2", "s3", "s3"][r - 1]) for r in range(1, 9)]
    ranked = spark.createDataFrame(ranked_rows, "claim_id long, rank int, doc_id long, score double")
    meta = spark.createDataFrame(meta_rows, "doc_id long, source string")
    got = diversified_sampler(ranked, meta, max_per_value=2, sample_size=5).collect()[0]
    # python walk: keep ranks 1,2 (s1), 4,5 (s2), 7 (s3) -> size 5
    kept = []
    per = {}
    for cid, r, d, s in ranked_rows:
        src = dict(meta_rows)[d]
        if per.get(src, 0) < 2:
            per[src] = per.get(src, 0) + 1
            kept.append((r, src, s))
        if len(kept) == 5:
            break
    assert got["n_sample"] == 5
    assert got["n_values"] == len({src for _, src, _ in kept})
    assert got["avg_score"] == pytest.approx(sum(s for _, _, s in kept) / 5)
    assert [r for r, _, _ in kept] == [1, 2, 4, 5, 7]


def test_apply_pinned_order_and_fill(spark):
    from defactonlp_spark.operators.bm25 import apply_pinned

    organic = spark.createDataFrame(
        [(1, r, 100 + r, 10.0 - r) for r in range(1, 6)],
        "claim_id long, rank int, doc_id long, score double",
    )
    # pin 104 first, then 999 (NOT in organic), then 101
    pins = spark.createDataFrame(
        [(1, 104, 1), (1, 999, 2), (1, 101, 3)],
        "claim_id long, doc_id long, pin_pos int",
    )
    got = sorted(apply_pinned(organic, pins, k=6).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [104, 999, 101, 102, 103, 105]
    assert [r["pinned"] for r in got] == [True, True, True, False, False, False]
    assert got[0]["score"] == 6.0      # organic score carried onto the pin
    assert got[1]["score"] == 0.0      # unmatched pin scores 0
    # organic tail keeps its own order and never repeats a pinned doc
    assert [r["doc_id"] for r in got if not r["pinned"]] == [102, 103, 105]


def test_apply_pinned_no_pins_is_identity(spark):
    from defactonlp_spark.operators.bm25 import apply_pinned

    organic = spark.createDataFrame(
        [(1, r, 100 + r, 10.0 - r) for r in range(1, 4)],
        "claim_id long, rank int, doc_id long, score double",
    )
    pins = spark.createDataFrame([], "claim_id long, doc_id long, pin_pos int")
    got = sorted(apply_pinned(organic, pins, k=3).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [101, 102, 103]
    assert not any(r["pinned"] for r in got)


# ------------------------------------------------------------------ bbq --


def test_bq_encode_matches_python_bits(spark):
    import numpy as np
    from defactonlp_spark.operators.similarity import bq_encode

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64)
    vecs[0, :] = 0.0           # all-zero vector -> bits 0
    vecs[1, 5] = 0.0           # a zero dim -> bit 0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["bits"] for r in bq_encode(df).collect()}
    for i in range(20):
        want = 0
        for d in range(64):
            if vecs[i, d] > 0:
                want |= 1 << d
        # compare as unsigned against the signed int64 the engine packs
        assert got[i] & 0xFFFFFFFFFFFFFFFF == want & 0xFFFFFFFFFFFFFFFF, i
    assert got[0] == 0


def test_bq_ann_matches_replay_and_recall(spark):
    import numpy as np
    from defactonlp_spark.operators.similarity import bq_ann_topk, cosine_topk

    rng = np.random.RandomState(11)
    base = rng.randn(8, 64)
    # 100 vectors clustered around 8 anchors -> sign bits correlate with
    # cosine, so Hamming candidates capture the true neighbors
    vecs = np.vstack([base[i % 8] + 0.15 * rng.randn(64) for i in range(100)])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qids = [0, 1, 2]
    got = bq_ann_topk(df, qids, k=5, fetch_k=40).collect()
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    # python replay: hamming candidates then exact rescore
    bits = [(int((vecs[i] > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))) for i in range(100)]
    for q in qids:
        hams = sorted(
            ((bin(bits[q] ^ bits[i]).count("1"), i) for i in range(100) if i != q)
        )[:40]
        cand = [i for _, i in hams]
        cos = {
            i: round(float(vecs[q] @ vecs[i] / (np.linalg.norm(vecs[q]) * np.linalg.norm(vecs[i]))), 6)
            for i in cand
        }
        want = sorted(cand, key=lambda i: (-cos[i], i))[:5]
        assert [r["vec_id"] for r in by_q[q]] == want, q
        for r in by_q[q]:
            assert r["cos"] == pytest.approx(cos[r["vec_id"]], abs=2e-6)
    # recall vs exact top-5 (clustered data -> binary candidates suffice)
    exact = cosine_topk(df, qids, k=5)
    ex: dict = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(ex[q] & {r["vec_id"] for r in by_q[q]}) for q in qids)
    assert hits / (5 * len(qids)) >= 0.8


def test_bq_encode_dim_over_64_raises(spark):
    # ADVICE r4: dims past 64 must raise eagerly, not silently NULL the
    # bits (NULL hamming sorts first under ASC and poisons candidates)
    from defactonlp_spark.operators.similarity import bq_encode

    df = spark.createDataFrame(
        [(0, [1.0] * 65)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim > 64"):
        bq_encode(df).collect()


def test_quality_linear_integer_sum_is_order_independent():
    # the 6dp-rounded mean must be a pure function of the gram MULTISET:
    # integer numerators sum exactly in any order (ADVICE r4)
    import hashlib
    import random

    from defactonlp_spark.functions.textstats import QL_BUCKETS, quality_weights_k

    w = quality_weights_k()
    text = "the quick brown fox jumps over the lazy dog" * 3
    grams = [text[i : i + 3] for i in range(len(text) - 2)]
    ks = [
        w[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % QL_BUCKETS]
        for g in grams
    ]
    want = round(sum(ks) / 1000.0 / len(ks), 6)
    rng = random.Random(11)
    for _ in range(5):
        rng.shuffle(ks)
        assert round(sum(ks) / 1000.0 / len(ks), 6) == want
