"""minimum_should_match / dis_max / boosting / explain / top_hits vs
scalar oracles.

Semantics pinned here:
- score_boolean(min_should_match=m): docs must additionally match >= m
  DISTINCT should terms; a claim with fewer should clauses than m is
  unmatchable (Lucene's MatchNoDocsQuery rewrite).
- score_dismax(tie_breaker=tb): score = max contrib + tb*(sum - max);
  tb=1 degenerates to the exhaustive BM25 sum, tb=0 is pure best-clause.
- score_boosting(negative_boost=nb): positive BM25 sum, multiplied by nb
  when the doc matches ANY negative term; negative-only docs never match.
- explain_topk: one row per matched term of every top-k hit; sum(contrib)
  over a hit's rows == its score; ranks identical to score_exhaustive.
- facet_top_hits: per (claim, facet value) the n best docs of the fed
  scored relation, ordered (score desc, doc_id asc).
"""

import math

import pytest

from defactonlp_spark.config import BM25Params
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.bm25 import (
    boolean_terms,
    claim_terms,
    explain_topk,
    score_boolean,
    score_boosting,
    score_dismax,
    score_exhaustive,
)

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha alpha beta epsilon"),
    (2, "beta gamma gamma zeta"),
    (3, "alpha delta delta"),
    (4, "epsilon zeta eta"),
    (5, "alpha beta gamma epsilon zeta"),
]
PARAMS = BM25Params()


def _contribs(did, terms, params=PARAMS):
    """term -> BM25 contribution of `did` for each matched query term."""
    texts = dict(DOCS)
    toks = tokenize_one(texts[did])
    n = len(texts)
    dl = {d: len(tokenize_one(t)) for d, t in texts.items()}
    avgdl = sum(dl.values()) / n
    out = {}
    for t in terms:
        tf = toks.count(t)
        if tf == 0:
            continue
        df = sum(1 for txt in texts.values() if t in tokenize_one(txt))
        idf = math.log1p((n - df + 0.5) / (df + 0.5))
        out[t] = (
            idf * tf * (params.k1 + 1.0)
            / (tf + params.k1 * (1 - params.b + params.b * dl[did] / avgdl))
        )
    return out


@pytest.fixture(scope="module")
def engine(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = P.build_postings(docs)
    n_docs, avgdl = P.corpus_stats(p).collect()[0][:2]
    return p, P.term_stats(p), int(n_docs), float(avgdl)


# ---------------------------------------------------------------- msm ----

MSM_QUERIES = [
    # (claim_id, must, should, must_not, expected doc set under msm=2)
    (0, "", "alpha beta zeta", "", {0, 1, 2, 5}),  # >=2 of 3 shoulds
    (1, "gamma", "alpha delta", "", {0}),          # must + 2-of-2 shoulds
    (2, "alpha", "", "", set()),                   # no shoulds -> MatchNoDocs
    (3, "", "eta qqunseen zeta", "", set()),       # only doc 4 has eta+zeta...
]


def test_msm_semantics(spark, engine):
    p, stats, n_docs, avgdl = engine
    # claim 3: eta+zeta both in doc 4 -> it DOES match 2 should terms
    expected3 = {4}
    bq = spark.createDataFrame(
        [(c, m, s, nn) for c, m, s, nn, _ in MSM_QUERIES],
        "claim_id long, must string, should string, must_not string",
    )
    res = score_boolean(
        p, stats, boolean_terms(bq), n_docs, avgdl, k=10, min_should_match=2
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["claim_id"], set()).add(r["doc_id"])
    assert got.get(0, set()) == MSM_QUERIES[0][4]
    assert got.get(1, set()) == MSM_QUERIES[1][4]
    assert 2 not in got  # msm=2 with zero should clauses -> unmatchable
    assert got.get(3, set()) == expected3


def test_msm_zero_is_default_boolean(spark, engine):
    p, stats, n_docs, avgdl = engine
    bq = spark.createDataFrame(
        [(0, "alpha", "gamma zeta", "epsilon")],
        "claim_id long, must string, should string, must_not string",
    )
    base = score_boolean(p, stats, boolean_terms(bq), n_docs, avgdl, k=10)
    msm0 = score_boolean(
        p, stats, boolean_terms(bq), n_docs, avgdl, k=10, min_should_match=0
    )
    assert sorted(base.collect()) == sorted(msm0.collect())


# ------------------------------------------------------------- dis_max ----


def _dismax_oracle(claim, tb, k=10):
    terms = sorted(set(tokenize_one(claim)))
    rows = []
    for did, _ in DOCS:
        cs = sorted(_contribs(did, terms).values())
        if not cs:
            continue
        rows.append((did, cs[-1] + tb * (sum(cs) - cs[-1])))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dismax_vs_oracle(spark, engine, tb):
    p, stats, n_docs, avgdl = engine
    claim = "alpha gamma zeta"
    q = claim_terms(spark.createDataFrame([(0, claim)], "claim_id long, claim string"))
    res = score_dismax(p, stats, q, n_docs, avgdl, k=10, tie_breaker=tb)
    got = [(r["doc_id"], r["score"]) for r in res.orderBy("rank").collect()]
    want = _dismax_oracle(claim, tb)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, hs), (_, ws) in zip(got, want):
        assert hs == pytest.approx(ws, abs=1e-9)


def test_dismax_tb1_equals_exhaustive(spark, engine):
    p, stats, n_docs, avgdl = engine
    q = claim_terms(
        spark.createDataFrame([(0, "alpha beta zeta")], "claim_id long, claim string")
    )
    dm = score_dismax(p, stats, q, n_docs, avgdl, k=10, tie_breaker=1.0)
    ex = score_exhaustive(p, stats, q, n_docs, avgdl, k=10)
    got = [(r["doc_id"], round(r["score"], 9)) for r in dm.orderBy("rank").collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in ex.orderBy("rank").collect()]
    assert got == want


# ------------------------------------------------------------ boosting ----


def test_boosting_demotes_not_excludes(spark, engine):
    p, stats, n_docs, avgdl = engine
    # positive: alpha; negative: epsilon -> docs 1 and 5 demoted, still present
    bq = spark.createDataFrame(
        [(0, "alpha", "epsilon")], "claim_id long, must string, must_not string"
    )
    res = score_boosting(
        p, stats, boolean_terms(bq), n_docs, avgdl, k=10, negative_boost=0.5
    )
    rows = {r["doc_id"]: r["score"] for r in res.collect()}
    assert set(rows) == {0, 1, 3, 5}  # every alpha doc kept, none vetoed
    for did in (0, 1, 3, 5):
        pos = sum(_contribs(did, ["alpha"]).values())
        factor = 0.5 if did in (1, 5) else 1.0
        assert rows[did] == pytest.approx(pos * factor, abs=1e-9)


def test_boosting_negative_only_never_matches(spark, engine):
    p, stats, n_docs, avgdl = engine
    bq = spark.createDataFrame(
        [(0, "eta", "zeta")], "claim_id long, must string, must_not string"
    )
    res = score_boosting(p, stats, boolean_terms(bq), n_docs, avgdl, k=10)
    # only doc 4 contains eta; docs 2/5 contain zeta only -> absent
    assert {r["doc_id"] for r in res.collect()} == {4}


# -------------------------------------------------------------- explain ----


def test_explain_breakdown_sums_and_ranks(spark, engine):
    p, stats, n_docs, avgdl = engine
    q = claim_terms(
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "zeta")], "claim_id long, claim string"
        )
    )
    ex = score_exhaustive(p, stats, q, n_docs, avgdl, k=3).collect()
    br = explain_topk(p, stats, q, n_docs, avgdl, k=3).collect()
    # breakdown rows cover exactly the top-k (claim, doc) pairs with the rank
    want = {(r["claim_id"], r["doc_id"]): (r["rank"], r["score"]) for r in ex}
    got = {}
    sums = {}
    for r in br:
        key = (r["claim_id"], r["doc_id"])
        got[key] = (r["rank"], r["score"])
        sums[key] = sums.get(key, 0.0) + r["contrib"]
        # contribution recomputed scalar-side
        want_c = _contribs(r["doc_id"], [r["term"]])[r["term"]]
        assert r["contrib"] == pytest.approx(want_c, abs=1e-9)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == pytest.approx(want[key][1], abs=1e-9)
        assert sums[key] == pytest.approx(want[key][1], abs=1e-9)


# ------------------------------------------------------------- top_hits ----


def test_facet_top_hits_buckets(spark):
    from defactonlp_spark.operators.analytics import facet_top_hits

    scored = spark.createDataFrame(
        [(0, d, s) for d, s in [(10, 5.0), (11, 4.0), (12, 3.0), (13, 2.0), (14, 4.0)]],
        "claim_id long, doc_id long, score double",
    )
    attrs = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "a"), (13, "a"), (14, "b")],
        "doc_id long, src string",
    )
    res = facet_top_hits(scored, attrs, "src", n_hits=2).collect()
    got = {(r["src"], r["hit_rank"]): r["doc_id"] for r in res}
    assert got == {("a", 1): 10, ("a", 2): 12, ("b", 1): 11, ("b", 2): 14}
    # tie inside bucket b (11 vs 14 both 4.0) resolved by doc_id asc
