"""Simple BM25F vs a pure-Python scalar replay of the pinned spec
(field split, per-field length norm, weighted combine, any-field df)."""

import math
from collections import Counter

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.bm25 import claim_terms
from defactonlp_spark.operators.bm25f import (
    BM25F_B,
    BM25F_K1,
    BM25F_WEIGHTS,
    lead_body_fields,
    score_bm25f,
)
from tests.test_lm import CLAIMS, TEXTS

LEAD_N = 4


def bm25f_oracle(texts, claims, lead_n=LEAD_N, k=5):
    fields: dict[tuple, Counter] = {}
    dl: dict[tuple, int] = {}
    docs_with_term: dict[str, set] = {}
    for d, text in texts.items():
        toks = tokenize_one(text)
        lead, body = toks[:lead_n], toks[lead_n:]
        for fname, ftoks in (("lead", lead), ("body", body)):
            if not ftoks:
                continue
            fields[(d, fname)] = Counter(ftoks)
            dl[(d, fname)] = len(ftoks)
        for t in set(toks):
            docs_with_term.setdefault(t, set()).add(d)
    n = float(len(texts))
    avgdl = {}
    for fname in ("lead", "body"):
        ls = [v for (d, f), v in dl.items() if f == fname]
        avgdl[fname] = sum(ls) / len(ls)
    out = {}
    for cid, claim in claims.items():
        qts = sorted(set(tokenize_one(claim)))
        scores: dict[int, float] = {}
        for t in qts:
            if t not in docs_with_term:
                continue
            df = float(len(docs_with_term[t]))
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            for d in docs_with_term[t]:
                tfc = 0.0
                for fname in ("lead", "body"):
                    c = fields.get((d, fname), {}).get(t, 0)
                    if not c:
                        continue
                    norm = 1.0 - BM25F_B[fname] + BM25F_B[fname] * dl[(d, fname)] / avgdl[fname]
                    tfc += BM25F_WEIGHTS[fname] * c / norm
                scores[d] = scores.get(d, 0.0) + idf * tfc / (BM25F_K1 + tfc)
        top = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
        if top:
            out[cid] = top
    return out


@pytest.fixture(scope="module")
def fielded(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    fp = lead_body_fields(docs, lead_n=LEAD_N).persist()
    yield fp
    fp.unpersist()


def test_lead_body_split_pinned(spark, fielded):
    rows = fielded.filter(fielded.doc_id == 0).collect()
    lead_terms = {r["term"] for r in rows if r["field"] == "lead"}
    # doc 0: "spark shuffles data across the cluster ..." -> first 4 tokens
    assert lead_terms == {"spark", "shuffles", "data", "across"}
    dls = {(r["field"]): r["dl_f"] for r in rows}
    toks = tokenize_one(TEXTS[0])
    assert dls["lead"] == LEAD_N and dls["body"] == len(toks) - LEAD_N


def test_bm25f_matches_scalar_oracle(spark, fielded):
    claims = spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )
    res = score_bm25f(fielded, claim_terms(claims), k=5).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    want = bm25f_oracle(TEXTS, CLAIMS)
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid in want:
        for (gd, gs), (wd, ws) in zip(got[cid], want[cid]):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_bm25f_lead_boost_changes_ranking(spark):
    """A term in the LEAD of one doc and deep in the BODY of another (equal
    counts/lengths) must rank the lead doc first — the field boost doing
    its one job."""
    filler_a = " ".join(f"xa{i}" for i in range(20))
    filler_b = " ".join(f"xb{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (0, "needle starts this document " + filler_a),
            (1, filler_b + " and then needle appears late"),
        ],
        "doc_id long, text string",
    )
    fp = lead_body_fields(docs, lead_n=4)
    claims = spark.createDataFrame([(0, "needle")], "claim_id long, claim string")
    res = score_bm25f(fp, claim_terms(claims), k=2).collect()
    ranked = [r["doc_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert ranked[0] == 0
