"""ES phrase suggester (did-you-mean): pure-Python replay of the pinned
candidate-generation + stupid-backoff scoring spec."""

import itertools
import math
from collections import Counter

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.analytics import token_bigrams
from defactonlp_spark.operators.expansion import phrase_suggest
from defactonlp_spark.operators.lm import ctf_stats
from defactonlp_spark.operators.postings import build_postings

TEXTS = {
    0: "merge join beats hash join on sorted input",
    1: "the hash join build side fits in memory",
    2: "merge join wins when both sides are sorted",
    3: "hash table lookup is constant time",
    4: "sort merge join needs sorted runs",
    5: "query scan reads the table pages",
}

PHRASES = [
    (0, "mrge join"),
    (1, "hash tble"),
    (2, "qury scan"),
    (3, "merge join"),   # already correct -> itself must rank 1
    (4, "zzzzzzz qqqqqqq"),  # hopeless OOV -> no rows
    (5, "sorted"),       # single token
]


def lev(a, b):
    # classic DP, fine at these sizes
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[n]


def suggest_oracle(texts, phrases, max_dist=1, per_term=3, topn=3, alpha=0.4):
    ctf = Counter()
    big = Counter()
    total = 0
    for t in texts.values():
        toks = tokenize_one(t)
        total += len(toks)
        ctf.update(toks)
        big.update(zip(toks, toks[1:]))
    out = {}
    for cid, phrase in phrases:
        toks = tokenize_one(phrase)[:6]
        if not toks:
            continue
        cands = []
        for q in toks:
            cs = [
                (lev(q, c), -ctf[c], c)
                for c in ctf
                if abs(len(c) - len(q)) <= max_dist and lev(q, c) <= max_dist
            ]
            cs.sort()
            cands.append([(c, d) for d, _, c in cs[:per_term]])
        if any(not cs for cs in cands):
            continue
        scored = []
        for seq in itertools.product(*cands):
            words = [wd[0] for wd in seq]
            s = math.log(ctf[words[0]] / total) - math.log(1 + seq[0][1])
            for (w1, _), (w2, d2) in zip(seq, seq[1:]):
                if (w1, w2) in big:
                    s += math.log(big[(w1, w2)] / ctf[w1])
                else:
                    s += math.log(alpha * ctf[w2] / total)
                s -= math.log(1 + d2)
            scored.append((" ".join(words), s))
        scored.sort(key=lambda kv: (-round(kv[1], 6), kv[0]))
        out[cid] = scored[:topn]
    return out


@pytest.fixture(scope="module")
def sugg_env(spark):
    docs = spark.createDataFrame(list(TEXTS.items()), "doc_id long, text string")
    p = build_postings(docs)
    total = sum(len(tokenize_one(t)) for t in TEXTS.values())
    from pyspark.sql import functions as F

    big = token_bigrams(docs).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return ctf_stats(p), big, total


def test_phrase_suggest_matches_replay(spark, sugg_env):
    cstats, big, total = sugg_env
    res = phrase_suggest(cstats, big, PHRASES, total).collect()
    got: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["suggestion"], r["score"]))
    want = {c: v for c, v in suggest_oracle(TEXTS, PHRASES).items() if v}
    assert {c: [s for s, _ in v] for c, v in got.items()} == {
        c: [s for s, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gs, gv), (ws, wv) in zip(got[cid], pairs):
            assert gv == pytest.approx(wv, rel=1e-9), (cid, gs)
    # the headline corrections
    assert got[0][0][0] == "merge join"
    assert got[1][0][0] == "hash table"
    assert got[2][0][0] == "query scan"
    # correct input suggests itself first
    assert got[3][0][0] == "merge join"
    # hopeless OOV absent
    assert 4 not in got


def test_phrase_suggest_empty_inputs(spark, sugg_env):
    cstats, big, total = sugg_env
    assert phrase_suggest(cstats, big, [(9, "...")], total).count() == 0
    assert phrase_suggest(cstats, big, [], total).count() == 0
