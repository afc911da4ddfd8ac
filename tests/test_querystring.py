"""simple_query_string: parser grammar cases + a pure-Python replay of the
pinned execution semantics (term BM25 / phrase-restricted BM25 /
constant-score prefix under must/should/must_not)."""

import math

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats
from defactonlp_spark.functions.tokenize import tokenize_tokens
from defactonlp_spark.operators.querystring import (
    QsClause,
    parse_simple_query_string,
    score_query_string,
)
from tests.oracle_bm25 import build_oracle_index
from defactonlp_spark.config import BM25Params
from defactonlp_spark.operators.segments import bm25_contrib, idf

# ------------------------------------------------------------- parser --


def test_parser_grammar_cases():
    assert parse_simple_query_string("merge +join") == [
        QsClause(2, "term", ("merge",)),
        QsClause(1, "term", ("join",)),
    ]
    assert parse_simple_query_string('"hash join" -stream') == [
        QsClause(2, "phrase", ("hash", "join")),
        QsClause(0, "term", ("stream",)),
    ]
    assert parse_simple_query_string("+quer* scan") == [
        QsClause(1, "prefix", ("quer",)),
        QsClause(2, "term", ("scan",)),
    ]
    assert parse_simple_query_string('-"a b" +c') == [
        QsClause(0, "phrase", ("a", "b")),
        QsClause(1, "term", ("c",)),
    ]
    # | is whitespace; bare +/- dropped; empty quotes dropped
    assert parse_simple_query_string('x | y + - ""') == [
        QsClause(2, "term", ("x",)),
        QsClause(2, "term", ("y",)),
    ]
    # multi-token unit -> phrase; star on multi-token unit dropped
    assert parse_simple_query_string("state-of-art state-of* one*") == [
        QsClause(2, "phrase", ("state", "of", "art")),
        QsClause(2, "phrase", ("state", "of")),
        QsClause(2, "prefix", ("one",)),
    ]
    # single-token quote degrades to term; lenient on junk
    assert parse_simple_query_string('"solo" ... ') == [QsClause(2, "term", ("solo",))]
    assert parse_simple_query_string("") == []
    assert parse_simple_query_string(None) == []


# ------------------------------------------------------------- replay --

TEXTS = {
    0: "merge join beats hash join on sorted input",
    1: "the hash join build side must fit in memory",
    2: "stream stream processing with windows and state",
    3: "query planner picks merge join for sorted scan",
    4: "scan the table then join and merge the results",
    5: "group by pushes partial aggregation before the join",
    6: "quergroup quer quirk",  # prefix bait: quer* matches quergroup + quer
}

QS = {
    0: "merge +join",
    1: '"hash join" -stream',
    2: "+quer* scan",
    3: '+"merge join" scan',
    4: "stream | windows -state",
    5: "+zzznope merge",   # out-of-corpus must -> no rows
    6: "-merge",           # must_not only -> no rows (nothing can qualify)
}


def qs_oracle(texts, queries, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    tokslist = {d: tokenize_one(t) for d, t in texts.items()}

    def phrase_docs(toks):
        out = set()
        for d, ts in tokslist.items():
            for i in range(len(ts) - len(toks) + 1):
                if ts[i : i + len(toks)] == list(toks):
                    out.add(d)
                    break
        return out

    def bm25(term, d):
        tf = postings[term][d]
        return float(
            bm25_contrib(float(tf), float(dl[d]), float(idf(len(postings[term]), n)), avgdl, BM25Params())
        )

    result = {}
    for cid, q in queries.items():
        clauses = parse_simple_query_string(q)
        n_must = sum(1 for c in clauses if c.pri == 1)
        per_doc: dict[int, dict] = {}
        for j, c in enumerate(clauses):
            if c.kind == "term":
                t = c.tokens[0]
                hits = {d: bm25(t, d) for d in postings.get(t, {})}
            elif c.kind == "prefix":
                terms = [t for t in postings if t.startswith(c.tokens[0])]
                docs = set().union(*[set(postings[t]) for t in terms]) if terms else set()
                hits = {d: 1.0 for d in docs}
            else:
                docs = phrase_docs(c.tokens)
                hits = {
                    d: sum(bm25(t, d) for t in sorted(set(c.tokens)) if d in postings.get(t, {}))
                    for d in docs
                }
            for d, contrib in hits.items():
                st = per_doc.setdefault(d, {"score": 0.0, "must": 0, "not": 0, "should": 0})
                if c.pri == 1:
                    st["must"] += 1
                    st["score"] += contrib
                elif c.pri == 2:
                    st["should"] += 1
                    st["score"] += contrib
                else:
                    st["not"] += 1
        kept = {
            d: st["score"]
            for d, st in per_doc.items()
            if st["not"] == 0
            and st["must"] == n_must
            and (n_must > 0 or st["should"] >= 1)
        }
        result[cid] = sorted(kept.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return result


@pytest.fixture(scope="module")
def qs_env(spark):
    docs = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    p = build_postings(docs).persist()
    st = corpus_stats(p).collect()[0]
    toks = tokenize_tokens(docs).persist()
    yield p, term_stats(p), toks, int(st["n_docs"]), float(st["avgdl"])
    p.unpersist()
    toks.unpersist()


def test_query_string_matches_scalar_replay(spark, qs_env):
    p, stats, toks, n_docs, avgdl = qs_env
    parsed = {cid: parse_simple_query_string(q) for cid, q in QS.items()}
    res = score_query_string(p, stats, toks, parsed, n_docs, avgdl, k=5).collect()
    got: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    want = {c: v for c, v in qs_oracle(TEXTS, QS).items() if v}
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gd, gs), (wd, ws) in zip(got[cid], pairs):
            assert gs == pytest.approx(ws, rel=1e-9), (cid, gd)
    # the two unmatchable claims really are absent
    assert 5 not in got and 6 not in got
    # claim 1: doc 1 has the phrase 'hash join' and no 'stream'; doc 2 excluded
    assert 1 in got and all(d != 2 for d, _ in got[1])


def test_query_string_empty_parse_returns_empty(spark, qs_env):
    p, stats, toks, n_docs, avgdl = qs_env
    res = score_query_string(p, stats, toks, {7: []}, n_docs, avgdl, k=5)
    assert res.count() == 0


def test_query_string_prefix_constant_score(spark, qs_env):
    # a pure prefix query scores every matching doc exactly 1.0
    p, stats, toks, n_docs, avgdl = qs_env
    parsed = {0: parse_simple_query_string("quer*")}
    rows = score_query_string(p, stats, toks, parsed, n_docs, avgdl, k=10).collect()
    assert rows and all(r["score"] == 1.0 for r in rows)
    assert {r["doc_id"] for r in rows} == {3, 6}  # query / quergroup+quer


def test_parse_clause_cap_raises():
    # ADVICE r4: >QS_MAX_CLAUSES must raise (ES too_many_clauses), keeping
    # score_query_string's cid*10000+j phrase uids collision-free
    from defactonlp_spark.operators.querystring import (
        QS_MAX_CLAUSES,
        parse_simple_query_string,
    )

    ok = parse_simple_query_string(" ".join(f"t{i}" for i in range(QS_MAX_CLAUSES)))
    assert len(ok) == QS_MAX_CLAUSES
    with pytest.raises(ValueError, match="too many clauses"):
        parse_simple_query_string(" ".join(f"t{i}" for i in range(QS_MAX_CLAUSES + 1)))
