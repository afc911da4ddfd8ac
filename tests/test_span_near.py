"""Ordered span-near (Lucene SpanNearQuery in_order=true) vs a brute-force
scalar replay: greedy-frontier exactness, order sensitivity, slop widths,
repeated phrase terms, mixed phrase lengths in one batch."""

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one, tokenize_tokens
from defactonlp_spark.operators.phrase import (
    phrase_positions,
    score_span_near,
    span_near_matches,
)
from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats

DOCS = {
    0: "alpha beta gamma delta",          # exact adjacency
    1: "alpha xx beta yy gamma",          # width 5 for a 3-term phrase
    2: "gamma beta alpha",                # right terms, wrong ORDER
    3: "alpha beta beta gamma",           # greedy must step past the 2nd beta
    4: "zz alpha alpha beta gamma",       # later anchor is the tight one
    5: "alpha zz zz zz beta zz gamma",    # too wide for small slop
    6: "unrelated words entirely here",
}


def brute_near(text: str, phrase: str, slop: int) -> bool:
    toks, q = tokenize_one(text), tokenize_one(phrase)
    m = len(q)

    def rec(qi: int, prev: int, anchor: int) -> bool:
        if qi == m:
            return True
        for p in range(prev + 1, len(toks)):
            if toks[p] == q[qi] and p <= anchor + m - 1 + slop:
                if rec(qi + 1, p, anchor):
                    return True
        return False

    return any(
        toks[a] == q[0] and rec(1, a, a) for a in range(len(toks))
    )


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS.items()], "doc_id long, text string"
    )
    toks = tokenize_tokens(docs).persist()
    yield docs, toks
    toks.unpersist()


def _matches(spark, toks, phrases, slop):
    qpos = phrase_positions(
        spark.createDataFrame(phrases, "claim_id long, phrase string")
    )
    return {
        (r["claim_id"], r["doc_id"])
        for r in span_near_matches(toks, qpos, slop).collect()
    }


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_near_matches_brute_force(spark, corpus, slop):
    docs, toks = corpus
    phrases = [(0, "alpha beta gamma"), (1, "beta gamma"), (2, "alpha")]
    got = _matches(spark, toks, phrases, slop)
    want = {
        (cid, did)
        for cid, ph in phrases
        for did, text in DOCS.items()
        if brute_near(text, ph, slop)
    }
    assert got == want


def test_span_near_order_sensitivity(spark, corpus):
    docs, toks = corpus
    # doc 2 has gamma..beta..alpha — unordered proximity would accept it,
    # ordered span-near must not, at ANY slop that keeps the span inside
    got = _matches(spark, toks, [(0, "alpha beta gamma")], 10)
    assert (0, 2) not in got
    assert (0, 0) in got and (0, 5) in got  # slop 10 admits the wide doc


def test_span_near_repeated_terms(spark, corpus):
    docs, toks = corpus
    # phrase with a repeated term: positions must strictly increase
    extra = spark.createDataFrame(
        [(10, "beta alpha beta"), (11, "beta alpha")], "doc_id long, text string"
    )
    toks2 = tokenize_tokens(extra)
    got = {
        (r["claim_id"], r["doc_id"])
        for r in span_near_matches(
            toks2,
            phrase_positions(
                spark.createDataFrame([(0, "beta alpha beta")], "claim_id long, phrase string")
            ),
            0,
        ).collect()
    }
    assert got == {(0, 10)}


def test_score_span_near_scores_match_bm25_restriction(spark, corpus):
    from defactonlp_spark.operators.bm25 import claim_terms, score_exhaustive

    docs, toks = corpus
    p = build_postings(docs)
    st_row = corpus_stats(p).collect()[0]
    n_docs, avgdl = int(st_row["n_docs"]), float(st_row["avgdl"])
    st = term_stats(p)
    phrases = spark.createDataFrame(
        [(0, "alpha beta gamma")], "claim_id long, phrase string"
    )
    res = score_span_near(p, st, toks, phrases, n_docs, avgdl, slop=1, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in res}
    # matching set from the brute replay at slop=1
    want_docs = {d for d, t in DOCS.items() if brute_near(t, "alpha beta gamma", 1)}
    assert set(got) == want_docs
    # scores equal the plain BM25 disjunction restricted to those docs
    full = {
        r["doc_id"]: r["score"]
        for r in score_exhaustive(
            p, st, claim_terms(phrases.withColumnRenamed("phrase", "claim")),
            n_docs, avgdl, k=100,
        ).collect()
    }
    for d, s in got.items():
        assert abs(s - full[d]) < 1e-9


def test_span_near_randomized_bulk(spark):
    """Seeded fuzz: 200 random docs over a 5-token alphabet x 12 random
    phrases (len 1-4, repeats allowed) x slops {0,1,2}, every (claim, doc)
    pair checked against the brute-force existential — the high-collision
    alphabet maximizes repeated-term and overlapping-anchor cases the
    planted fixtures can't enumerate."""
    import random

    rng = random.Random(42)
    alpha = ["a", "b", "c", "d", "e"]
    docs = {
        i: " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 30)))
        for i in range(200)
    }
    phrases = [
        (j, " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 4))))
        for j in range(12)
    ]
    docs_df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks = tokenize_tokens(docs_df).persist()
    try:
        for slop in (0, 1, 2):
            got = _matches(spark, toks, phrases, slop)
            want = {
                (cid, did)
                for cid, ph in phrases
                for did, text in docs.items()
                if brute_near(text, ph, slop)
            }
            assert got == want, f"slop={slop}: {got ^ want}"
    finally:
        toks.unpersist()
