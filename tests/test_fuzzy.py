"""Fuzzy-query expansion (Lucene FuzzyQuery analog) vs a pure-Python scalar
replay of the pinned spec: banded dictionary candidates, (dist, df, term)
ranking, 1/(1+dist) weights, max-wins combine, weighted BM25."""

import pytest

from defactonlp_spark.operators.bm25 import claim_terms
from defactonlp_spark.operators.expansion import expand_fuzzy, score_weighted
from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats
from tests.oracle_bm25 import build_oracle_index
from tests.test_lm import TEXTS, bm25_contrib_scalar
from defactonlp_spark.functions.tokenize import tokenize_one

CLAIMS = {
    0: "dta rankng",        # dta->data(1); rankng->ranking(1)
    1: "shufles partion",   # shufles->shuffles(1); partion->partition(2, dropped at max_dist=1)
    2: "data ranking",      # exact terms: expansion must keep dist-0 leaders
    3: "zzzzzzzz",          # nothing within distance
}
MAX_DIST, MAX_EXP = 1, 3


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_oracle(texts, claims, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    df = {t: len(p) for t, p in postings.items()}
    out = {}
    for cid, claim in claims.items():
        weights: dict[str, float] = {}
        for qt in sorted(set(tokenize_one(claim))):
            cands = [
                (d, t)
                for t in df
                if abs(len(t) - len(qt)) <= MAX_DIST
                and (d := _lev(qt, t)) <= MAX_DIST
            ]
            cands.sort(key=lambda dt: (dt[0], -df[dt[1]], dt[1]))
            for d, t in cands[:MAX_EXP]:
                w = round(1.0 / (1.0 + d), 6)
                weights[t] = max(weights.get(t, 0.0), w)
        scores: dict[int, float] = {}
        for t, w in sorted(weights.items()):
            for doc, tf in postings[t].items():
                scores[doc] = scores.get(doc, 0.0) + w * bm25_contrib_scalar(
                    tf, dl[doc], df[t], n, avgdl
                )
        top = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
        if top:
            out[cid] = top
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    p = build_postings(docs).persist()
    st = corpus_stats(p).collect()[0]
    yield p, int(st["n_docs"]), float(st["avgdl"])
    p.unpersist()


def test_expand_fuzzy_weights(spark, corpus):
    p, n_docs, avgdl = corpus
    claims = spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )
    got = {
        (r["claim_id"], r["term"]): r["weight"]
        for r in expand_fuzzy(
            term_stats(p), claim_terms(claims), MAX_DIST, MAX_EXP
        ).collect()
    }
    # dist-1 variants get 0.5; exact terms keep 1.0; no expansions for claim 3
    assert got[(0, "data")] == 0.5
    assert got[(0, "ranking")] == 0.5
    assert got[(2, "data")] == 1.0
    assert got[(2, "ranking")] == 1.0
    assert not [k for k in got if k[0] == 3]
    # partion (dist 2 to partition) must NOT expand at max_dist=1
    assert not [k for k in got if k[0] == 1 and k[1] == "partition"]
    assert got[(1, "shuffles")] == 0.5


def test_fuzzy_topk_matches_scalar_replay(spark, corpus):
    p, n_docs, avgdl = corpus
    claims = spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )
    wterms = expand_fuzzy(term_stats(p), claim_terms(claims), MAX_DIST, MAX_EXP)
    res = score_weighted(p, term_stats(p), wterms, n_docs, avgdl, k=5, rank_dp=6).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    want = fuzzy_oracle(TEXTS, CLAIMS, k=5)
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid in want:
        for (gd, gs), (wd, ws) in zip(got[cid], want[cid]):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_symspell_equals_banded_levenshtein(spark, corpus):
    """The deletion-neighborhood equi-join path must produce EXACTLY the
    banded theta-join's (claim_id, term, weight) relation at max_dist=1 —
    same contract, different (scalable) plan."""
    from defactonlp_spark.operators.expansion import expand_fuzzy_symspell

    p, n_docs, avgdl = corpus
    claims = spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )
    banded = expand_fuzzy(term_stats(p), claim_terms(claims), 1, MAX_EXP)
    sym = expand_fuzzy_symspell(term_stats(p), claim_terms(claims), MAX_EXP)
    assert banded.exceptAll(sym).count() == 0 and sym.exceptAll(banded).count() == 0


def test_symspell_catches_each_edit_kind(spark):
    """Insertion, deletion, and substitution typos each surface the true
    dictionary term through the deletion-key join."""
    from defactonlp_spark.operators.bm25 import claim_terms as ct
    from defactonlp_spark.operators.expansion import expand_fuzzy_symspell

    docs = spark.createDataFrame(
        [(0, "retrieval engines index documents")], "doc_id long, text string"
    )
    p = build_postings(docs)
    claims = spark.createDataFrame(
        [(0, "retrievall"), (1, "retrieal"), (2, "retrieval"), (3, "retrievol")],
        "claim_id long, claim string",
    )
    got = {
        (r["claim_id"], r["term"]): r["weight"]
        for r in expand_fuzzy_symspell(term_stats(p), ct(claims), 3).collect()
    }
    assert got[(0, "retrieval")] == 0.5   # insertion typo
    assert got[(1, "retrieval")] == 0.5   # deletion typo
    assert got[(2, "retrieval")] == 1.0   # exact
    assert got[(3, "retrieval")] == 0.5   # substitution typo
