"""Corpus diagnostics (Zipf slope, Heaps growth) and graded ranking eval
(nDCG@k / MRR) — pure-Python replays."""

import math
from collections import Counter

import numpy as np
import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.analytics import corpus_zipf, heaps_growth, ndcg_eval
from defactonlp_spark.operators.postings import build_postings

TEXTS = {
    i: " ".join(
        ["the"] * 8 + ["data"] * 4 + ["merge"] * 2 + [f"u{i}"] + ["join"] * (i % 3)
    )
    for i in range(20)
}


@pytest.fixture(scope="module")
def zh_postings(spark):
    docs = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    p = build_postings(docs).persist()
    yield p
    p.unpersist()


def test_corpus_zipf_matches_numpy_fit(spark, zh_postings):
    freq = Counter()
    for t in TEXTS.values():
        freq.update(tokenize_one(t))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r2 = float(np.corrcoef(x, y)[0, 1] ** 2)
    r = corpus_zipf(zh_postings).collect()[0]
    assert r["n_terms"] == len(ranked)
    assert r["slope"] == pytest.approx(slope, rel=1e-9)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert r["r2"] == pytest.approx(r2, rel=1e-9)
    assert r["slope"] < 0  # frequency decays with rank


def test_corpus_zipf_min_freq_fits_filtered_head(spark, zh_postings):
    # min_freq drops the tail BEFORE ranking: ranks are reassigned over
    # the surviving head, exactly the numpy fit on the filtered counter
    freq = Counter()
    for t in TEXTS.values():
        freq.update(tokenize_one(t))
    ranked = sorted(
        ((t, c) for t, c in freq.items() if c >= 2), key=lambda kv: (-kv[1], kv[0])
    )
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = corpus_zipf(zh_postings, min_freq=2).collect()[0]
    assert r["n_terms"] == len(ranked) < len(freq)
    assert r["slope"] == pytest.approx(slope, rel=1e-9)
    assert r["intercept"] == pytest.approx(intercept, rel=1e-9)


def test_heaps_growth_matches_walk(spark, zh_postings):
    got = {r["bucket"]: r for r in heaps_growth(zh_postings, bucket_docs=5).collect()}
    seen: set = set()
    docs = toks = 0
    walk = {}
    for d in sorted(TEXTS):
        ts = tokenize_one(TEXTS[d])
        docs += 1
        toks += len(ts)
        seen.update(ts)
        if (d + 1) % 5 == 0:
            walk[d // 5] = (docs, toks, len(seen))
    for b, (nd, nt, vs) in walk.items():
        r = got[b]
        assert (r["n_docs_seen"], r["n_tokens_seen"], r["vocab_size"]) == (nd, nt, vs), b
    # growth is monotone
    bs = sorted(got)
    assert all(got[a]["vocab_size"] <= got[b]["vocab_size"] for a, b in zip(bs, bs[1:]))


def py_ndcg(truth_ranks, eval_order, k=10):
    g = {d: max(0.0, 4.0 - (r - 1) // 2) for d, r in truth_ranks.items()}
    idcg = sum(
        (2 ** g[d] - 1) / math.log2(r + 1) for d, r in truth_ranks.items() if r <= k
    )
    dcg = rr = 0.0
    for pos, d in enumerate(eval_order[:k], start=1):
        gd = g.get(d, 0.0)
        dcg += (2 ** gd - 1) / math.log2(pos + 1)
        if gd >= 3.0 and rr == 0.0:
            rr = 1.0 / pos
    return dcg, idcg, dcg / idcg, rr


def test_ndcg_eval_matches_replay(spark):
    truth_rows = [(1, r, 100 + r) for r in range(1, 11)]
    # eval: perfect for claim 1 except docs 101/103 swapped and 110 replaced
    # by an irrelevant doc; claim 2 exists only in truth -> scores 0
    eval_rows = [(1, 1, 103), (1, 2, 102), (1, 3, 101), (1, 4, 104), (1, 5, 999)]
    truth_rows += [(2, r, 200 + r) for r in range(1, 4)]
    truth = spark.createDataFrame(truth_rows, "claim_id long, rank int, doc_id long")
    ev = spark.createDataFrame(eval_rows, "claim_id long, rank int, doc_id long")
    got = {r["claim_id"]: r for r in ndcg_eval(ev, truth, k=10).collect()}
    t1 = {100 + r: r for r in range(1, 11)}
    dcg, idcg, nd, rr = py_ndcg(t1, [103, 102, 101, 104, 999])
    assert got[1]["dcg"] == pytest.approx(dcg, rel=1e-12)
    assert got[1]["idcg"] == pytest.approx(idcg, rel=1e-12)
    assert got[1]["ndcg"] == pytest.approx(nd, rel=1e-12)
    assert got[1]["rr"] == pytest.approx(rr)
    assert got[2]["ndcg"] == 0.0 and got[2]["rr"] == 0.0 and got[2]["idcg"] > 0


def test_ndcg_identity_ranking_is_one(spark):
    truth = spark.createDataFrame(
        [(1, r, 100 + r) for r in range(1, 11)], "claim_id long, rank int, doc_id long"
    )
    got = ndcg_eval(truth.selectExpr("claim_id", "rank", "doc_id"), truth, k=10).collect()[0]
    assert got["ndcg"] == pytest.approx(1.0, rel=1e-12)
    assert got["rr"] == 1.0


def test_ltr_rerank_matches_linear_replay(spark):
    from defactonlp_spark.operators.ltr import LTR_WEIGHTS, ltr_rerank

    rows = [
        (1, 1, 10, 8.0, -20.0, 3, 40, 0.9),
        (1, 2, 11, 7.5, -18.0, 3, 25, 0.2),
        (1, 3, 12, 6.0, -15.0, 2, 90, 0.95),
        (1, 4, 13, 2.0, -30.0, 1, 10, 0.5),
    ]
    schema = ("claim_id long, rank int, doc_id long, bm25 double, lm_qlh double, "
              "n_matched long, dl long, quality double")
    feats = spark.createDataFrame(rows, schema)
    got = sorted(ltr_rerank(feats, k=4).collect(), key=lambda r: r["rank"])
    want = []
    for _, brank, d, bm, lm, nm, dl, qu in rows:
        ms = (LTR_WEIGHTS["bm25"] * bm + LTR_WEIGHTS["lm_qlh"] * lm
              + LTR_WEIGHTS["n_matched"] * nm + LTR_WEIGHTS["dl"] * dl
              + LTR_WEIGHTS["quality"] * qu)
        want.append((d, ms, brank))
    want.sort(key=lambda t: (-round(t[1], 6), t[0]))
    assert [r["doc_id"] for r in got] == [d for d, _, _ in want]
    for r, (d, ms, brank) in zip(got, want):
        assert r["model_score"] == pytest.approx(ms, rel=1e-12)
        assert r["bm25_rank"] == brank
    # the model genuinely reorders (doc 12's quality beats doc 11's bm25)
    assert [r["doc_id"] for r in got] != [10, 11, 12, 13]


def test_frequent_item_sets_matches_walk(spark):
    from itertools import combinations

    from defactonlp_spark.operators.analytics import frequent_item_sets

    baskets = {
        0: ["milk", "bread", "eggs"],
        1: ["milk", "bread"],
        2: ["milk", "eggs"],
        3: ["bread", "eggs"],
        4: ["milk", "bread", "eggs", "jam"],
        5: ["jam"],
    }
    rows = [(d, i) for d, its in baskets.items() for i in its]
    df = spark.createDataFrame(rows, "doc_id long, item string")
    got = frequent_item_sets(df, min_support=3, per_doc_cap=10, top=50).collect()
    got_map = {(r["size"], r["items"]): r["support"] for r in got}
    # python walk
    sup1: dict = {}
    for its in baskets.values():
        for i in set(its):
            sup1[i] = sup1.get(i, 0) + 1
    l1 = {i for i, s in sup1.items() if s >= 3}
    want = {(1, i): s for i, s in sup1.items() if s >= 3}
    for size in (2, 3):
        cnt: dict = {}
        for its in baskets.values():
            for combo in combinations(sorted(set(its) & l1), size):
                cnt[combo] = cnt.get(combo, 0) + 1
        for combo, s in cnt.items():
            if s >= 3:
                want[(size, " ".join(combo))] = s
    assert got_map == want
    # ordering: support desc, items asc
    sups = [r["support"] for r in got]
    assert sups == sorted(sups, reverse=True)


def test_frequent_item_sets_per_doc_cap_bounds_pairs(spark):
    from defactonlp_spark.operators.analytics import frequent_item_sets

    # one doc with 30 items, cap 3 -> at most C(3,2)=3 pairs can reach L2
    rows = [(0, f"i{j:02d}") for j in range(30)] + [
        (d, f"i{j:02d}") for d in range(1, 4) for j in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, item string")
    got = frequent_item_sets(df, min_support=4, per_doc_cap=3, max_len=2, top=100).collect()
    pairs = [r for r in got if r["size"] == 2]
    assert len(pairs) <= 3
    # cap keeps the deterministic (support desc, item asc) head: i00,i01,i02
    assert {r["items"] for r in pairs} <= {"i00 i01", "i00 i02", "i01 i02"}


def test_degenerate_inputs_yield_nulls_not_errors(spark):
    from pyspark.sql import functions as F

    from defactonlp_spark.operators.analytics import (
        corpus_zipf,
        ndcg_eval,
        random_sampler,
        t_test_welch,
    )
    from defactonlp_spark.operators.postings import build_postings

    # Welch t with one empty and one singleton population -> NULL stats
    df = spark.createDataFrame([("a", 1.0)], "grp string, value double")
    r = t_test_welch(df, F.col("grp") == "a", F.col("grp") == "b", "value").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 0)
    assert r["t_stat"] is None and r["df"] is None and r["mean_b"] is None

    # zipf over a one-term corpus -> NULL fit
    docs = spark.createDataFrame([(0, "word word word")], "doc_id long, text string")
    z = corpus_zipf(build_postings(docs)).collect()[0]
    assert z["n_terms"] == 1 and z["slope"] is None and z["r2"] is None

    # ndcg with an all-grade-zero reference -> NULL ndcg (not 0/0)
    truth = spark.createDataFrame(
        [(1, r, 100 + r) for r in range(9, 12)], "claim_id long, rank int, doc_id long"
    )
    n = ndcg_eval(truth, truth, k=12).collect()[0]
    assert n["idcg"] == 0.0 and n["ndcg"] is None

    # invalid sampling probability raises up front
    ev = spark.createDataFrame([(1, "x", 1.0)], "event_id long, grp string, value double")
    import pytest as _pt

    with _pt.raises(ValueError):
        random_sampler(ev, "event_id", ["grp"], "value", permille=0)
