"""Wildcard-query expansion (Lucene WildcardQuery + top-terms scoring
rewrite) vs a pure-Python scalar replay: dictionary-only expansion, df-desc
top-terms cut, literal passthrough, plain-disjunction BM25 scoring."""

import re
from fnmatch import fnmatchcase

import pytest

from defactonlp_spark.operators.bm25 import score_exhaustive
from defactonlp_spark.operators.expansion import expand_wildcards, wildcard_terms
from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats
from tests.oracle_bm25 import build_oracle_index
from tests.test_lm import TEXTS, bm25_contrib_scalar

CLAIMS = {
    0: "d* ranking",      # prefix with many dictionary matches -> df cut
    1: "?ata shuffl*",    # single-char + prefix
    2: "data ranking",    # all-literal control: must equal plain BM25
    3: "zz* spark",       # non-matching pattern + literal survivor
}
MAX_EXP = 3


def _wc_tokens(claim: str) -> list[str]:
    return sorted({t for t in re.split(r"[^a-z0-9*?]+", claim.lower()) if t})


def wildcard_oracle(texts, claims, max_exp, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    df = {t: len(p) for t, p in postings.items()}
    out = {}
    for cid, claim in claims.items():
        terms: set[str] = set()
        for tok in _wc_tokens(claim):
            if "*" in tok or "?" in tok:
                cands = sorted(
                    (t for t in df if fnmatchcase(t, tok)),
                    key=lambda t: (-df[t], t),
                )
                terms.update(cands[:max_exp])
            else:
                terms.add(tok)
        scores: dict[int, float] = {}
        for t in sorted(terms):
            for doc, tf in postings.get(t, {}).items():
                scores[doc] = scores.get(doc, 0.0) + bm25_contrib_scalar(
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


def _claims_df(spark):
    return spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )


def test_wildcard_terms_parse(spark):
    rows = wildcard_terms(_claims_df(spark)).collect()
    got = {(r["claim_id"], r["tok"]): r["is_pattern"] for r in rows}
    assert got[(0, "d*")] is True
    assert got[(0, "ranking")] is False
    assert got[(1, "?ata")] is True
    assert got[(2, "data")] is False
    assert got[(3, "zz*")] is True


def test_expand_wildcards_dictionary_cut(spark, corpus):
    p, n_docs, avgdl = corpus
    got = {}
    for r in expand_wildcards(
        term_stats(p), wildcard_terms(_claims_df(spark)), MAX_EXP
    ).collect():
        got.setdefault(r["claim_id"], set()).add(r["term"])
    # claim 0: d* expands to the MAX_EXP highest-df d-terms (ties term asc);
    # replay the cut from the oracle index so the test pins the rule, not
    # a hand-counted df snapshot
    postings, _, _, _ = build_oracle_index(TEXTS)
    df = {t: len(ps) for t, ps in postings.items()}
    d_terms = sorted((t for t in df if t.startswith("d")), key=lambda t: (-df[t], t))
    assert got[0] == set(d_terms[:MAX_EXP]) | {"ranking"}
    # claim 1: ?ata -> data only; shuffl* -> shuffles, shuffling
    assert got[1] == {"data", "shuffles", "shuffling"}
    # claim 2: literals pass through untouched
    assert got[2] == {"data", "ranking"}
    # claim 3: zz* matches nothing, the literal survives alone
    assert got[3] == {"spark"}


def test_wildcard_topk_matches_scalar_replay(spark, corpus):
    p, n_docs, avgdl = corpus
    st = term_stats(p)
    q = expand_wildcards(st, wildcard_terms(_claims_df(spark)), MAX_EXP)
    res = score_exhaustive(p, st, q, n_docs, avgdl, k=5, rank_dp=6).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    want = wildcard_oracle(TEXTS, CLAIMS, MAX_EXP, k=5)
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid in want:
        for (gd, gs), (wd, ws) in zip(got[cid], want[cid]):
            assert gd == wd and abs(gs - ws) < 1e-6


def test_all_literal_claim_equals_plain_bm25(spark, corpus):
    """A wildcard-free claim through the wildcard path must be bit-identical
    to claim_terms + score_exhaustive (the rewrite is a no-op)."""
    from defactonlp_spark.operators.bm25 import claim_terms

    p, n_docs, avgdl = corpus
    st = term_stats(p)
    claims = _claims_df(spark).filter("claim_id = 2")
    via_wc = score_exhaustive(
        p, st, expand_wildcards(st, wildcard_terms(claims), MAX_EXP),
        n_docs, avgdl, k=5, rank_dp=6,
    )
    plain = score_exhaustive(
        p, st, claim_terms(claims), n_docs, avgdl, k=5, rank_dp=6
    )
    a = sorted(map(tuple, via_wc.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


REGEX_CLAIMS = {
    0: "d.*a",               # full-match: data (not 'document' — no trailing a)
    1: "shuffl(es|ing)",
    2: "zzz+",               # no match
    3: "data",               # bare literal regex matches only itself
}


def test_expand_regex_full_match_semantics(spark, corpus):
    import re

    from defactonlp_spark.operators.expansion import expand_regex

    p, n_docs, avgdl = corpus
    pats = spark.createDataFrame(
        [(i, c) for i, c in REGEX_CLAIMS.items()], "claim_id long, pattern string"
    )
    got = {}
    for r in expand_regex(term_stats(p), pats, 16).collect():
        got.setdefault(r["claim_id"], set()).add(r["term"])
    postings, _, _, _ = build_oracle_index(TEXTS)
    want = {}
    for cid, pat in REGEX_CLAIMS.items():
        hits = {t for t in postings if re.fullmatch(pat, t)}
        if hits:
            want[cid] = hits
    assert got == want
    assert "document" not in got.get(0, set())  # anchored, not substring


def test_expand_regex_top_terms_cut(spark, corpus):
    from defactonlp_spark.operators.expansion import expand_regex

    p, n_docs, avgdl = corpus
    pats = spark.createDataFrame([(0, "d.*")], "claim_id long, pattern string")
    got = {r["term"] for r in expand_regex(term_stats(p), pats, 2).collect()}
    postings, _, _, _ = build_oracle_index(TEXTS)
    df = {t: len(ps) for t, ps in postings.items()}
    d_terms = sorted((t for t in df if t.startswith("d")), key=lambda t: (-df[t], t))
    assert got == set(d_terms[:2])
