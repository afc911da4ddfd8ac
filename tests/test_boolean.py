"""Boolean (must / should / must_not) retrieval vs a scalar oracle.

Semantics pinned here (operators/bm25.py::score_boolean, the Lucene
BooleanQuery analog): all must terms required, any must_not term vetoes,
should terms optional scorers with minimum-should-match=1 when no must
clause exists; score = BM25 sum over matched must+should terms only;
clause precedence per term: must_not > must > should.
"""

import math

import pytest

from defactonlp_spark.config import BM25Params, EngineConfig
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.bm25 import boolean_terms, score_boolean
from tests.oracle_bm25 import build_oracle_index

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha alpha beta epsilon"),
    (2, "beta gamma gamma zeta"),
    (3, "alpha delta delta"),
    (4, "epsilon zeta eta"),
    (5, "Alpha! BETA? gamma."),  # tokenizer folds case/punct
]
# (claim_id, must, should, must_not)
QUERIES = [
    (100, "alpha", "gamma", "epsilon"),       # 0, 3, 5 (1 and 4 vetoed/missing)
    (101, "", "zeta eta", "beta"),            # pure should: 4 (2 vetoed)
    (102, "alpha beta", "", ""),              # pure must == conjunctive: 0, 1, 5
    (103, "alpha qqunseen", "beta", ""),      # out-of-corpus must -> no rows
    (104, "gamma", "gamma", "gamma"),         # precedence: must_not wins -> none
    (105, None, "delta", None),               # NULL clause columns tolerated
]


def _oracle(k=5, params=BM25Params()):
    postings, dl, n, avgdl = build_oracle_index(dict(DOCS))
    out = {}
    for cid, must, should, must_not in QUERIES:
        pri = {}
        for txt, p in ((must_not, 0), (must, 1), (should, 2)):
            for t in set(tokenize_one(txt or "")):
                pri[t] = min(pri.get(t, 9), p)
        must_terms = {t for t, p in pri.items() if p == 1}
        rows = []
        for did in dl:
            toks = set(tokenize_one(dict(DOCS)[did]))
            if any(t in toks for t, p in pri.items() if p == 0):
                continue
            if not must_terms <= toks:
                continue
            matched = [t for t, p in pri.items() if p >= 1 and t in toks]
            if not must_terms and not any(
                t in toks for t, p in pri.items() if p == 2
            ):
                continue
            score = 0.0
            for t in sorted(matched):
                tf = tokenize_one(dict(DOCS)[did]).count(t)
                df = len(postings.get(t, {}))
                idf = math.log1p((n - df + 0.5) / (df + 0.5))
                score += (
                    idf
                    * tf
                    * (params.k1 + 1.0)
                    / (tf + params.k1 * (1 - params.b + params.b * dl[did] / avgdl))
                )
            rows.append((did, score))
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[cid] = rows[:k]
    return out


def test_scalar_oracle_expectations():
    got = {cid: [d for d, _ in rows] for cid, rows in _oracle().items()}
    assert got[100] == [5, 0, 3]
    assert got[101] == [4]
    assert sorted(got[102]) == [0, 1, 5]
    assert got[103] == []
    assert got[104] == []
    assert sorted(got[105]) == [0, 3]


@pytest.fixture(scope="module")
def fixtures(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        QUERIES, "claim_id long, must string, should string, must_not string"
    )
    return docs, queries


def _check(result_df, k=5):
    oracle = _oracle(k=k)
    got: dict[int, list] = {cid: [] for cid, *_ in QUERIES}
    for r in result_df.orderBy("claim_id", "rank").collect():
        got[r["claim_id"]].append((r["doc_id"], r["score"]))
    for cid, want in oracle.items():
        have = got[cid]
        assert [d for d, _ in have] == [d for d, _ in want], cid
        for (_, hs), (_, ws) in zip(have, want):
            assert hs == pytest.approx(ws, abs=1e-12), cid


def test_score_boolean_adhoc(spark, fixtures):
    docs, queries = fixtures
    p = P.build_postings(docs)
    n_docs, avgdl = P.corpus_stats(p).collect()[0][:2]
    res = score_boolean(
        p, P.term_stats(p), boolean_terms(queries), int(n_docs), float(avgdl)
    )
    _check(res)


def test_query_boolean_index_path(spark, fixtures, tmp_path):
    from defactonlp_spark.plans.build import IndexBuild, IndexReader
    from defactonlp_spark.plans.query import query_boolean

    docs, queries = fixtures
    cfg = EngineConfig(n_buckets=4)
    corpus = docs.selectExpr("doc_id", "text", "cast(null as string) url")
    IndexBuild(str(tmp_path / "idx"), cfg, build_id="t").run(
        spark, corpus, input_snapshot="t"
    )
    r = IndexReader(spark, str(tmp_path / "idx"))
    _check(query_boolean(r, queries, k=5, cfg=cfg))


def test_percolate_conjunctive_matching(spark):
    """Reverse search: docs match stored rules iff they contain every rule
    term; duplicate rule words collapse; rules with an absent term match
    nothing."""
    from defactonlp_spark.operators.bm25 import percolate
    from defactonlp_spark.operators.postings import build_postings

    docs = spark.createDataFrame(
        [
            (0, "breaking news about spark release and performance"),
            (1, "spark performance tuning guide"),
            (2, "cooking pasta news"),
        ],
        "doc_id long, text string",
    )
    rules = spark.createDataFrame(
        [
            (10, "spark performance"),
            (11, "news"),
            (12, "news news news"),       # dup terms -> single term rule
            (13, "spark zzzmissing"),     # unmatchable term
        ],
        "query_id long, query string",
    )
    got = {
        (r["doc_id"], r["query_id"]): r["n_terms"]
        for r in percolate(build_postings(docs), rules).collect()
    }
    assert got == {
        (0, 10): 2, (1, 10): 2,          # both contain spark+performance
        (0, 11): 1, (2, 11): 1,          # news docs
        (0, 12): 1, (2, 12): 1,          # dedup'd rule == rule 11
    }


def test_percolate_v2_bool_clauses(spark):
    """ES bool-query percolation: must/should/must_not over term and phrase
    clauses — all must + no must_not + (>=1 should iff no must); phrase
    clauses need exact adjacency (anchor trick), not mere co-occurrence."""
    import pytest

    from defactonlp_spark.functions.tokenize import tokenize_tokens
    from defactonlp_spark.operators.bm25 import percolate_v2
    from defactonlp_spark.operators.postings import build_postings

    docs = spark.createDataFrame(
        [
            (0, "breaking news about spark release and performance"),
            (1, "spark performance tuning guide"),
            (2, "cooking pasta news and performance spark tricks"),
            (3, "spark spark performance performance"),
        ],
        "doc_id long, text string",
    )
    rules = spark.createDataFrame(
        [
            # q10: must terms + must_not veto
            (10, 0, "must", "terms", "spark performance"),
            (10, 1, "must_not", "terms", "cooking"),
            # q11: should-only disjunction — terms OR phrase
            (11, 0, "should", "terms", "pasta"),
            (11, 1, "should", "phrase", "tuning guide"),
            # q12: phrase must — adjacency required ("performance spark"
            # occurs in doc 2 only; docs 0/1/3 have both words, not adjacent)
            (12, 0, "must", "phrase", "performance spark"),
            # q13: repeated-term phrase — doc 3 only
            (13, 0, "must", "phrase", "spark spark performance"),
            # q14: must + optional should (ES minimum_should_match=0)
            (14, 0, "must", "terms", "news"),
            (14, 1, "should", "terms", "pasta"),
            # q15: unmatchable must
            (15, 0, "must", "terms", "zzzmissing"),
        ],
        "query_id long, clause_id long, occur string, kind string, text string",
    )
    got = {
        (r["doc_id"], r["query_id"]): (r["n_must_matched"], r["n_should_matched"])
        for r in percolate_v2(
            build_postings(docs), rules, tokens=tokenize_tokens(docs)
        ).collect()
    }
    assert got == {
        (0, 10): (1, 0), (1, 10): (1, 0), (3, 10): (1, 0),  # doc 2 vetoed
        (2, 11): (0, 1),                                    # pasta (should)
        (1, 11): (0, 1),                                    # phrase 'tuning guide'
        (2, 12): (1, 0),                                    # adjacency only in doc 2
        (3, 13): (1, 0),                                    # repeated-term phrase
        (0, 14): (1, 0), (2, 14): (1, 1),                   # should optional; counted
    }

    # only-must_not rules are rejected loudly
    bad = spark.createDataFrame(
        [(20, 0, "must_not", "terms", "spark")],
        "query_id long, clause_id long, occur string, kind string, text string",
    )
    with pytest.raises(ValueError, match="must_not"):
        percolate_v2(build_postings(docs), bad)

    # phrase clause without a tokens relation is a loud failure
    pr = spark.createDataFrame(
        [(21, 0, "must", "phrase", "spark performance")],
        "query_id long, clause_id long, occur string, kind string, text string",
    )
    with pytest.raises(ValueError, match="positional tokens"):
        percolate_v2(build_postings(docs), pr)


def test_ann_recall_eval_arithmetic(spark):
    """ann_recall_eval: overlap counting, recall arithmetic, and the
    zero-candidate row rule (queries absent from approx still get a row)."""
    from defactonlp_spark.operators.similarity import ann_recall_eval

    exact = spark.createDataFrame(
        [(0, r, 100 + r, 0.9) for r in range(1, 6)]
        + [(1, r, 200 + r, 0.8) for r in range(1, 6)],
        "query_id long, rank int, vec_id long, cos double",
    )
    # q0: approx recovers 3 of 5 (plus 2 non-exact ids); q1: empty
    approx = spark.createDataFrame(
        [(0, 1, 101, 0.9), (0, 2, 103, 0.9), (0, 3, 105, 0.9),
         (0, 4, 999, 0.1), (0, 5, 998, 0.1)],
        "query_id long, rank int, vec_id long, cos double",
    )
    got = {r["query_id"]: r for r in ann_recall_eval(exact, approx, k=5).collect()}
    assert (got[0]["n_exact"], got[0]["n_approx"], got[0]["n_overlap"]) == (5, 5, 3)
    assert got[0]["recall"] == 0.6
    assert (got[1]["n_exact"], got[1]["n_approx"], got[1]["n_overlap"]) == (5, 0, 0)
    assert got[1]["recall"] == 0.0
