"""Round-4 continuation: the last three Lucene similarity families (DFI
chi-squared, IB SPL-D-H2, Axiomatic F2EXP) and ES reciprocal rank fusion —
each against a pure-Python scalar replay of the pinned spec."""

import math

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.bm25 import claim_terms
from defactonlp_spark.operators.analytics import rrf_fuse
from defactonlp_spark.operators.lm import (
    ctf_stats,
    score_axiomatic_f2exp,
    score_dfi_chisq,
    score_ib_spl,
)
from defactonlp_spark.operators.postings import term_stats
from tests.oracle_bm25 import build_oracle_index
from tests.test_geo_sims import CLAIMS, TEXTS, _by_claim, sim_claims, sim_corpus  # noqa: F401

INV_LN2 = 1.4426950408889634


def dfi_oracle(texts, claims, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    ctf = {t: sum(pl.values()) for t, pl in postings.items()}
    T = float(sum(dl.values()))
    out = {}
    for cid, claim in claims.items():
        scored: dict[int, float] = {}
        for t in set(tokenize_one(claim)):
            if t not in postings:
                continue
            for d, tf in postings[t].items():
                exp = dl[d] * ctf[t] / T
                c = math.log1p((tf - exp) ** 2 / exp) * INV_LN2 if tf > exp else 0.0
                scored[d] = scored.get(d, 0.0) + c
        out[cid] = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


def ib_oracle(texts, claims, c=1.0, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    out = {}
    for cid, claim in claims.items():
        scored: dict[int, float] = {}
        for t in set(tokenize_one(claim)):
            if t not in postings:
                continue
            lam = (len(postings[t]) + 1.0) / (n + 1.0)
            for d, tf in postings[t].items():
                tfn = tf * (math.log(1.0 + c * avgdl / dl[d]) * INV_LN2)
                v = -(math.log((lam ** (tfn / (tfn + 1.0)) - lam) / (1.0 - lam)) * INV_LN2)
                scored[d] = scored.get(d, 0.0) + v
        out[cid] = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


def ax_oracle(texts, claims, s=0.5, k_exp=0.35, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    out = {}
    for cid, claim in claims.items():
        scored: dict[int, float] = {}
        for t in set(tokenize_one(claim)):
            if t not in postings:
                continue
            idf = (n / len(postings[t])) ** k_exp
            for d, tf in postings[t].items():
                scored[d] = scored.get(d, 0.0) + idf * tf / (tf + s + s * dl[d] / avgdl)
        out[cid] = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


def _assert_matches(got, want):
    want = {c: v for c, v in want.items() if v}
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gd, gs), (wd, ws) in zip(got[cid], pairs):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_dfi_chisq_matches_scalar_oracle(spark, sim_corpus, sim_claims):
    p, _, _, total = sim_corpus
    res = score_dfi_chisq(p, ctf_stats(p), claim_terms(sim_claims), total, k=5).collect()
    _assert_matches(_by_claim(res), dfi_oracle(TEXTS, CLAIMS))


def test_dfi_below_expected_scores_zero(spark):
    # targeted corpus: 'data' is corpus-dominant (ctf=51 of T=60), so doc 1's
    # single 'data' in a 10-token doc sits BELOW its expected frequency
    # (dl*ctf/T = 8.5 > tf=1) — it must still MATCH but contribute exactly 0.
    from defactonlp_spark.operators.postings import build_postings

    texts = {0: " ".join(["data"] * 50), 1: "data x y z w v u t s r"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    p = build_postings(docs)
    claims = spark.createDataFrame([(0, "data")], "claim_id long, claim string")
    res = score_dfi_chisq(p, ctf_stats(p), claim_terms(claims), 60, k=99).collect()
    got = {r["doc_id"]: r["score"] for r in res}
    assert got[1] == 0.0 and got[0] > 0.0
    _assert_matches(_by_claim(res), dfi_oracle(texts, {0: "data"}))


def test_ib_spl_matches_scalar_oracle(spark, sim_corpus, sim_claims):
    p, n_docs, avgdl, _ = sim_corpus
    res = score_ib_spl(
        p, term_stats(p), claim_terms(sim_claims), n_docs, avgdl, c=1.0, k=5
    ).collect()
    _assert_matches(_by_claim(res), ib_oracle(TEXTS, CLAIMS))


def test_axiomatic_f2exp_matches_scalar_oracle(spark, sim_corpus, sim_claims):
    p, n_docs, avgdl, _ = sim_corpus
    res = score_axiomatic_f2exp(
        p, term_stats(p), claim_terms(sim_claims), n_docs, avgdl, k=5
    ).collect()
    _assert_matches(_by_claim(res), ax_oracle(TEXTS, CLAIMS))


def test_axiomatic_scores_positive_and_bounded(spark, sim_corpus, sim_claims):
    # each term contributes < (N/df)^k * 1 (since tf/(tf+s+s*dl/avgdl) < 1)
    p, n_docs, avgdl, _ = sim_corpus
    res = score_axiomatic_f2exp(
        p, term_stats(p), claim_terms(sim_claims), n_docs, avgdl, k=99
    ).collect()
    assert res and all(0.0 < r["score"] < 3 * n_docs**0.35 for r in res)


# ------------------------------------------------------------------ rrf --


def test_rrf_fuse_matches_python_replay(spark):
    a = [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20)]
    b = [(0, 1, 12), (0, 2, 13), (1, 1, 21), (1, 2, 20)]
    schema = "claim_id long, rank int, doc_id long"
    fused = rrf_fuse(
        [spark.createDataFrame(a, schema), spark.createDataFrame(b, schema)],
        k=10,
        rrf_k=60,
    ).collect()
    want: dict[tuple, float] = {}
    for lst in (a, b):
        for cid, r, d in lst:
            want[(cid, d)] = want.get((cid, d), 0.0) + 1.0 / (60.0 + r)
    got = {(r["claim_id"], r["doc_id"]): r["rrf"] for r in fused}
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(round(want[key], 9), rel=1e-12)
    by_claim = _by_claim(
        [
            {"claim_id": r["claim_id"], "rank": r["rank"], "doc_id": r["doc_id"], "score": r["rrf"]}
            for r in fused
        ]
    )
    for cid, pairs in by_claim.items():
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)
    # doc 12 appears in both lists for claim 0 -> must outrank docs seen once
    assert by_claim[0][0][0] == 12


def test_rrf_single_list_is_identity_order(spark):
    a = [(0, 1, 5), (0, 2, 7), (0, 3, 6)]
    fused = rrf_fuse(
        [spark.createDataFrame(a, "claim_id long, rank int, doc_id long")], k=3
    ).collect()
    order = [r["doc_id"] for r in sorted(fused, key=lambda r: r["rank"])]
    assert order == [5, 7, 6]


def test_rrf_empty_input_raises(spark):
    with pytest.raises(IndexError):
        rrf_fuse([])


def test_ib_spl_drops_corpus_wide_terms(spark):
    # 'x' occurs in EVERY doc -> lambda = 1 -> SPL information undefined;
    # the pinned spec DROPS it (under ANSI mode the naive formula is a hard
    # divide-by-zero). Scoring must equal the 'data'-only query.
    from defactonlp_spark.operators.postings import build_postings

    texts = {0: "x data engine", 1: "x data", 2: "x engine engine"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    p = build_postings(docs)
    claims = spark.createDataFrame(
        [(0, "x data"), (1, "data")], "claim_id long, claim string"
    )
    res = _by_claim(
        score_ib_spl(p, term_stats(p), claim_terms(claims), 3, 8.0 / 3.0, k=5).collect()
    )
    assert res[0] == res[1]  # corpus-wide 'x' contributed nothing
    # only docs containing 'data'; doc 1 is shorter (dl=2) -> higher tfn
    assert [d for d, _ in res[0]] == [1, 0]
