"""combined_fields / match_phrase_prefix / filtered knn / composite agg
vs scalar + brute-force oracles.

Semantics pinned here:
- score_combined_fields: term-centric multi-field BM25 (Lucene
  CombinedFieldQuery): tf_c = sum_f w_f*tf_f, dl_c = sum_f w_f*dl_f,
  ordinary BM25 over the virtual merged field; with ONE field at weight 1
  it must equal plain exhaustive BM25 exactly.
- score_phrase_prefix: last token expands as a dictionary prefix
  (df desc, term asc, capped); a doc matches iff fixed terms + ANY
  expansion occur consecutively; scoring = BM25 disjunction over the
  DISTINCT expanded set restricted to matching docs.
- cosine_topk_filtered: exact knn over the PRE-filtered candidate set —
  must equal cosine_topk run on the filtered subset, and must return k
  rows where post-filtering an unfiltered top-k would return fewer.
- composite_agg: successive after-key pages partition the full bucket
  set in key order with no overlap.
"""

import math

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.config import BM25Params
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.bm25 import claim_terms, score_exhaustive
from defactonlp_spark.operators.bm25f import (
    lead_body_fields,
    score_bm25f,
    score_combined_fields,
)
from defactonlp_spark.operators.phrase import (
    prefix_expanded_positions,
    score_phrase_prefix,
)
from defactonlp_spark.operators.similarity import cosine_topk, cosine_topk_filtered
from defactonlp_spark.operators.analytics import composite_agg
from defactonlp_spark.functions.tokenize import tokenize_tokens

DOCS = [
    (0, "alpha beta gamma delta alpha"),
    (1, "alpha alpine beta epsilon"),
    (2, "beta gamma gamma zeta alpine albedo"),
    (3, "alpha delta delta beta alpha gamma"),
    (4, "epsilon zeta eta albedo"),
    (5, "alpha beta gamma epsilon zeta alpine"),
]
PARAMS = BM25Params()


@pytest.fixture(scope="module")
def engine(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = P.build_postings(docs)
    n_docs, avgdl = P.corpus_stats(p).collect()[0][:2]
    tokens = tokenize_tokens(docs)
    return docs, p, P.term_stats(p), int(n_docs), float(avgdl), tokens


# ------------------------------------------------------ combined_fields ----


def test_combined_fields_single_field_equals_bm25(spark, engine):
    docs, p, stats, n_docs, avgdl, tokens = engine
    # lead_n=0 puts every token in 'body': one field, weight 1 -> plain BM25
    fp = lead_body_fields(docs, lead_n=0)
    claims = spark.createDataFrame([(0, "alpha gamma"), (1, "beta zeta")],
                                   "claim_id long, claim string")
    qt = claim_terms(claims)
    cf = score_combined_fields(fp, qt, k=10, weights={"lead": 1.0, "body": 1.0})
    ex = score_exhaustive(p, stats, qt, n_docs, avgdl, k=10)
    got = {(r["claim_id"], r["doc_id"]): r["score"] for r in cf.collect()}
    want = {(r["claim_id"], r["doc_id"]): r["score"] for r in ex.collect()}
    assert got.keys() == want.keys()
    for k_ in got:
        assert got[k_] == pytest.approx(want[k_], abs=1e-9)


def _combined_oracle(terms, weights, lead_n, k1=1.2, b=0.75):
    """Scalar combined_fields oracle over DOCS."""
    texts = dict(DOCS)
    toks = {d: tokenize_one(t) for d, t in texts.items()}
    n = len(texts)

    def fields(d):
        return {"lead": toks[d][:lead_n], "body": toks[d][lead_n:]}

    dl_c = {
        d: sum(weights[f] * len(ts) for f, ts in fields(d).items() if ts)
        for d in texts
    }
    avgdl_c = sum(dl_c.values()) / n
    out = {}
    for d in texts:
        s = 0.0
        for t in terms:
            tf_c = sum(
                weights[f] * ts.count(t) for f, ts in fields(d).items() if ts
            )
            if tf_c == 0:
                continue
            df = sum(1 for dd in texts if t in toks[dd])
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            s += idf * tf_c * (k1 + 1.0) / (
                tf_c + k1 * (1 - b + b * dl_c[d] / avgdl_c)
            )
        if s > 0:
            out[d] = s
    return out


def test_combined_fields_scalar_oracle(spark, engine):
    docs, *_ = engine
    w = {"lead": 2.0, "body": 1.0}
    fp = lead_body_fields(docs, lead_n=2)
    claims = spark.createDataFrame([(0, "alpha gamma zeta")],
                                   "claim_id long, claim string")
    res = score_combined_fields(fp, claim_terms(claims), k=10, weights=w)
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    want = _combined_oracle(["alpha", "gamma", "zeta"], w, lead_n=2)
    assert got.keys() == want.keys()
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_combined_fields_differs_from_bm25f(spark, engine):
    """Same weights, same corpus: term-centric merge is a genuinely
    different scoring function from per-field-normalized BM25F."""
    docs, *_ = engine
    fp = lead_body_fields(docs, lead_n=2)
    claims = spark.createDataFrame([(0, "alpha gamma")],
                                   "claim_id long, claim string")
    qt = claim_terms(claims)
    cf = {r["doc_id"]: r["score"] for r in score_combined_fields(fp, qt, k=10).collect()}
    ff = {r["doc_id"]: r["score"] for r in score_bm25f(fp, qt, k=10).collect()}
    assert cf.keys() == ff.keys()  # same match set (disjunction)
    assert any(abs(cf[d] - ff[d]) > 1e-9 for d in cf)


# -------------------------------------------------- match_phrase_prefix ----


def _expansions(prefix, max_expansions=16):
    texts = dict(DOCS)
    toks = {d: tokenize_one(t) for d, t in texts.items()}
    vocab = {}
    for d in texts:
        for t in set(toks[d]):
            vocab[t] = vocab.get(t, 0) + 1
    cand = sorted(
        [(t, df) for t, df in vocab.items() if t.startswith(prefix)],
        key=lambda x: (-x[1], x[0]),
    )
    return [t for t, _ in cand[:max_expansions]]


def _phrase_prefix_oracle(fixed, prefix, max_expansions=16, k1=1.2, b=0.75):
    texts = dict(DOCS)
    toks = {d: tokenize_one(t) for d, t in texts.items()}
    n = len(texts)
    dl = {d: len(toks[d]) for d in texts}
    avgdl = sum(dl.values()) / n
    exp = _expansions(prefix, max_expansions)
    matches = set()
    for d in texts:
        seq = toks[d]
        m = len(fixed)
        for i in range(len(seq) - m):
            if seq[i : i + m] == fixed and seq[i + m] in exp:
                matches.add(d)
                break
    qterms = sorted(set(fixed) | set(exp))
    out = {}
    for d in matches:
        s = 0.0
        for t in qterms:
            tf = toks[d].count(t)
            if tf == 0:
                continue
            df = sum(1 for dd in texts if t in toks[dd])
            idf = math.log1p((n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
        out[d] = s
    return out


@pytest.mark.parametrize(
    "phrase",
    ["beta gam", "alpha al", "al", "gamma qq", "alpha beta gamm"],
)
def test_phrase_prefix_brute_force(spark, engine, phrase):
    docs, p, stats, n_docs, avgdl, tokens = engine
    toks = phrase.split()
    fixed, prefix = toks[:-1], toks[-1]
    phrases = spark.createDataFrame([(0, phrase)], "claim_id long, phrase string")
    res = score_phrase_prefix(
        p, stats, tokens, phrases, n_docs, avgdl, k=10, max_expansions=16
    )
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    want = _phrase_prefix_oracle(fixed, prefix)
    assert got.keys() == want.keys(), phrase
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_phrase_prefix_expansion_cap(spark, engine):
    """max_expansions=1 keeps only the highest-df prefix term (ties term
    asc) — the deterministic top-terms rewrite cut."""
    docs, p, stats, n_docs, avgdl, tokens = engine
    phrases = spark.createDataFrame([(0, "al")], "claim_id long, phrase string")
    qpos = prefix_expanded_positions(stats, phrases, max_expansions=1)
    terms = sorted(r["term"] for r in qpos.collect())
    assert terms == [_expansions("al", 1)[0]]
    res = score_phrase_prefix(
        p, stats, tokens, phrases, n_docs, avgdl, k=10, max_expansions=1
    )
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    want = _phrase_prefix_oracle([], "al", max_expansions=1)
    assert got.keys() == want.keys()
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_phrase_prefix_no_dictionary_match(spark, engine):
    docs, p, stats, n_docs, avgdl, tokens = engine
    phrases = spark.createDataFrame([(0, "alpha qqqq")], "claim_id long, phrase string")
    res = score_phrase_prefix(p, stats, tokens, phrases, n_docs, avgdl, k=10)
    assert res.count() == 0


# ------------------------------------------------------- filtered knn ----


def test_filtered_knn_equals_subset_topk(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)], int(i % 3))
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    allowed = emb.filter(F.col("label") == 1).select("vec_id")
    got = cosine_topk_filtered(emb, allowed, query_ids=[0, 1, 2], k=5)
    # reference: brute-force subset top-k, query vectors from the FULL set
    sub = emb.filter(F.col("label") == 1)
    want_rows = []
    full = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    subset = {r["vec_id"]: full[r["vec_id"]] for r in sub.collect()}
    for qid in [0, 1, 2]:
        qv = full[qid]
        scored = sorted(
            (
                (round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6), -vid)
                for vid, v in subset.items()
                if vid != qid
            ),
            reverse=True,
        )[:5]
        for rk, (cos, nvid) in enumerate(scored, 1):
            want_rows.append((qid, rk, -nvid, cos))
    got_rows = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["cos"]) for r in got.collect()
    )
    assert got_rows == sorted(want_rows)
    # pre-filter returns k=5 for query 0 even though label=1 is 1/3 of the
    # corpus — a post-filter of an unfiltered top-5 would keep ~1.7
    assert sum(1 for r in got_rows if r[0] == 0) == 5


# ------------------------------------------------------- composite agg ----


def test_composite_pages_partition_buckets(spark):
    df = spark.createDataFrame(
        [(s, l, i) for i, (s, l) in enumerate(
            [(s, l) for s in "abcde" for l in ("en", "fr", "de")]
        ) for _ in range(i % 3 + 1)],
        "source string, lang string, v long",
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("v").cast("long").alias("v_sum")]
    full = df.groupBy("source", "lang").agg(*aggs).orderBy("source", "lang").collect()
    pages, after = [], None
    while True:
        page = composite_agg(df, ["source", "lang"], aggs, size=4, after=after).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1]["source"], page[-1]["lang"])
        assert len(page) <= 4
    assert [tuple(r) for r in pages] == [tuple(r) for r in full]


def test_composite_after_is_strict(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    aggs = [F.count(F.lit(1)).cast("long").alias("c")]
    page = composite_agg(df, ["k"], aggs, size=10, after=("a",)).collect()
    assert [r["k"] for r in page] == ["b"]


# ---------------------------------------------------------- terms_set ----


def test_terms_set_per_doc_threshold(spark, engine):
    from defactonlp_spark.operators.bm25 import claim_terms, score_terms_set

    docs, p, stats, n_docs, avgdl, tokens = engine
    claims = spark.createDataFrame(
        [(0, "alpha beta gamma zeta")], "claim_id long, claim string"
    )
    # doc 5 contains all 4 query terms, doc 0 three, doc 4 one
    th = spark.createDataFrame(
        [(0, 3), (1, 3), (2, 2), (3, 4), (4, 1), (5, 4)], "doc_id long, required int"
    )
    res = score_terms_set(
        p, stats, claim_terms(claims), n_docs, avgdl, th, k=10
    )
    got = {r["doc_id"] for r in res.collect()}
    # matched counts: d0={a,b,g}=3>=3 ok; d1={a,b}=2<3; d2={b,g,z}=3>=2 ok;
    # d3={a}..: d3 has alpha,delta,beta,gamma -> {a,b,g}=3<4; d4={z}=1>=1 ok;
    # d5={a,b,g,z}=4>=4 ok
    assert got == {0, 2, 4, 5}


def test_terms_set_missing_doc_and_zero_floor(spark, engine):
    from defactonlp_spark.operators.bm25 import (
        claim_terms,
        score_exhaustive,
        score_terms_set,
    )

    docs, p, stats, n_docs, avgdl, tokens = engine
    claims = spark.createDataFrame([(0, "alpha zeta")], "claim_id long, claim string")
    # doc 5 absent -> never matches even though it contains both terms;
    # required=0 floors to 1 (CoveringQuery: >=1 scorer must match)
    th = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)], "doc_id long, required int"
    )
    res = score_terms_set(p, stats, claim_terms(claims), n_docs, avgdl, th, k=10)
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    assert 5 not in got
    ex = {
        r["doc_id"]: r["score"]
        for r in score_exhaustive(
            p, stats, claim_terms(claims), n_docs, avgdl, k=10
        ).collect()
    }
    for d, s in got.items():
        assert s == pytest.approx(ex[d], abs=1e-9)


# -------------------------------------------------------- cardinality ----


def test_cardinality_exact_two_phase(spark):
    from defactonlp_spark.operators.analytics import cardinality_agg

    rows = [(f"s{i % 3}", i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, uid int")
    got = {
        r["source"]: r["distinct_count"]
        for r in cardinality_agg(df, ["source"], "uid").collect()
    }
    want = {
        r["source"]: r["c"]
        for r in df.groupBy("source")
        .agg(F.countDistinct("uid").alias("c"))
        .collect()
    }
    assert got == want


def test_cardinality_approx_within_rsd(spark):
    from defactonlp_spark.operators.analytics import cardinality_agg

    rows = [("g", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, uid int")
    exact = cardinality_agg(df, ["g"], "uid").collect()[0]["distinct_count"]
    approx = cardinality_agg(df, ["g"], "uid", mode="approx", rsd=0.02).collect()[0][
        "distinct_count"
    ]
    assert abs(approx - exact) / exact < 0.06  # 3 sigma of rsd=0.02


def test_phrase_prefix_randomized_bulk(spark):
    """Seeded fuzz: 150 random docs over a prefix-colliding alphabet
    (aa/ab/abc/b/ba/bac) x 12 random phrase-prefixes, engine vs the
    brute-force oracle on BOTH the match set and the scores — repeated
    terms, overlapping anchors, shared-prefix expansions, and empty
    expansions all arise naturally."""
    import random

    from defactonlp_spark.operators.postings import (
        build_postings,
        corpus_stats,
        term_stats,
    )

    rng = random.Random(7)
    alpha = ["aa", "ab", "abc", "b", "ba", "bac"]
    docs = {
        i: " ".join(rng.choice(alpha) for _ in range(rng.randint(1, 25)))
        for i in range(150)
    }
    queries = []
    for j in range(12):
        n = rng.randint(1, 3)
        toks = [rng.choice(alpha) for _ in range(n)]
        # truncate the last token to a 1-2 char prefix
        last = toks[-1][: rng.randint(1, 2)]
        queries.append((j, " ".join(toks[:-1] + [last])))

    docs_df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    p = build_postings(docs_df).persist()
    n_docs, avgdl = corpus_stats(p).collect()[0][:2]
    toks_df = tokenize_tokens(docs_df).persist()
    max_exp = 3
    try:
        phrases = spark.createDataFrame(queries, "claim_id long, phrase string")
        res = score_phrase_prefix(
            p, term_stats(p), toks_df, phrases, int(n_docs), float(avgdl),
            k=1000, max_expansions=max_exp,
        )
        got = {(r["claim_id"], r["doc_id"]): r["score"] for r in res.collect()}

        # brute-force oracle over the same corpus
        toks = {d: t.split() for d, t in docs.items()}
        vocab = {}
        for d in docs:
            for t in set(toks[d]):
                vocab[t] = vocab.get(t, 0) + 1
        n = len(docs)
        dl = {d: len(toks[d]) for d in docs}
        av = sum(dl.values()) / n
        want = {}
        for cid, phrase in queries:
            q = phrase.split()
            fixed, prefix = q[:-1], q[-1]
            exp = [
                t for t, _ in sorted(
                    ((t, df) for t, df in vocab.items() if t.startswith(prefix)),
                    key=lambda x: (-x[1], x[0]),
                )[:max_exp]
            ]
            qterms = set(fixed) | set(exp)
            m = len(fixed)
            for d in docs:
                seq = toks[d]
                if not any(
                    seq[i : i + m] == fixed and seq[i + m] in exp
                    for i in range(len(seq) - m)
                ):
                    continue
                s = 0.0
                for t in qterms:
                    tf = seq.count(t)
                    if tf == 0:
                        continue
                    df = vocab[t]
                    idf = math.log1p((n - df + 0.5) / (df + 0.5))
                    s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[d] / av))
                want[(cid, d)] = s
        assert got.keys() == want.keys()
        for key in got:
            assert got[key] == pytest.approx(want[key], abs=1e-9)
    finally:
        p.unpersist()
        toks_df.unpersist()


# ------------------------------------------------------ top_fragments ----


def _greedy_fragments_oracle(docs, qterms_by_claim, scope, window, n_frags):
    """Greedy non-overlapping passage selection, brute force."""
    toks = {d: t.split() for d, t in docs.items()}
    out = []
    for cid, did in scope:
        terms = qterms_by_claim[cid]
        hits = [i for i, t in enumerate(toks[did]) if t in terms]
        cands = {}
        for s in hits:
            span = toks[did][s : s + window]
            # candidate windows anchor at hit positions
            in_win = [
                (i, t) for i, t in enumerate(toks[did])
                if s <= i <= s + window - 1 and t in terms
            ]
            cands[s] = (len({t for _, t in in_win}), len(in_win))
        picked = []
        for frag in range(1, n_frags + 1):
            avail = [
                (s, nt, nh) for s, (nt, nh) in cands.items()
                if all(abs(s - p) >= window for p in picked)
            ]
            if not avail:
                break
            s, nt, nh = sorted(avail, key=lambda x: (-x[1], -x[2], x[0]))[0]
            picked.append(s)
            out.append((cid, did, frag, s, nt, nh))
    return set(out)


def test_top_fragments_greedy_oracle(spark):
    import random

    from defactonlp_spark.operators.phrase import best_passage, top_fragments

    rng = random.Random(11)
    alpha = ["x", "y", "z", "q", "r", "s"]
    docs = {
        i: " ".join(rng.choice(alpha) for _ in range(rng.randint(5, 60)))
        for i in range(60)
    }
    qterms_by_claim = {0: {"x", "y"}, 1: {"q", "z", "r"}}
    scope = [(c, d) for c in qterms_by_claim for d in range(0, 60, 7)]

    docs_df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    toks_df = tokenize_tokens(docs_df)
    qt = spark.createDataFrame(
        [(c, t) for c, ts in qterms_by_claim.items() for t in ts],
        "claim_id long, term string",
    )
    scope_df = spark.createDataFrame(scope, "claim_id long, doc_id long")
    window, n_frags = 6, 3
    res = top_fragments(toks_df, qt, scope_df, window=window, n_fragments=n_frags)
    got = {
        (r["claim_id"], r["doc_id"], r["frag"], r["start_pos"], r["n_terms"], r["n_hits"])
        for r in res.collect()
    }
    want = _greedy_fragments_oracle(docs, qterms_by_claim, scope, window, n_frags)
    assert got == want

    # frag 1 must equal best_passage exactly
    bp = {
        (r["claim_id"], r["doc_id"], r["start_pos"], r["n_terms"], r["n_hits"])
        for r in best_passage(toks_df, qt, scope_df, window=window).collect()
    }
    frag1 = {
        (c, d, s, nt, nh) for (c, d, f, s, nt, nh) in got if f == 1
    }
    assert frag1 == bp


# ------------------------------------------- multi_match best_fields ----


def _best_fields_oracle(terms, boosts, lead_n, tb=0.0, k1=1.2, b=0.75):
    """Scalar best_fields oracle over DOCS: each field its own BM25 index."""
    texts = dict(DOCS)
    toks = {d: tokenize_one(t) for d, t in texts.items()}

    def fields(d):
        out = {}
        if toks[d][:lead_n]:
            out["lead"] = toks[d][:lead_n]
        if toks[d][lead_n:]:
            out["body"] = toks[d][lead_n:]
        return out

    havers = {f: [d for d in texts if f in fields(d)] for f in ("lead", "body")}
    out = {}
    for d in texts:
        fscores = {}
        for f, ts in fields(d).items():
            n_f = len(havers[f])
            avgdl_f = sum(len(fields(dd)[f]) for dd in havers[f]) / n_f
            s = 0.0
            for t in terms:
                tf = ts.count(t)
                if tf == 0:
                    continue
                df_f = sum(1 for dd in havers[f] if t in fields(dd)[f])
                idf = math.log1p((n_f - df_f + 0.5) / (df_f + 0.5))
                s += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl_f)
                )
            if s > 0:
                fscores[f] = boosts[f] * s
        if fscores:
            mx, sm = max(fscores.values()), sum(fscores.values())
            out[d] = mx + tb * (sm - mx)
    return out


@pytest.mark.parametrize("tb", [0.0, 0.4])
def test_best_fields_scalar_oracle(spark, engine, tb):
    from defactonlp_spark.operators.bm25f import score_multi_match_best_fields

    docs, *_ = engine
    w = {"lead": 2.0, "body": 1.0}
    fp = lead_body_fields(docs, lead_n=2)
    claims = spark.createDataFrame([(0, "alpha gamma zeta")],
                                   "claim_id long, claim string")
    res = score_multi_match_best_fields(
        fp, claim_terms(claims), k=10, boosts=w, tie_breaker=tb
    )
    got = {r["doc_id"]: r["score"] for r in res.collect()}
    want = _best_fields_oracle(["alpha", "gamma", "zeta"], w, lead_n=2, tb=tb)
    assert got.keys() == want.keys()
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_best_fields_single_field_equals_bm25(spark, engine):
    from defactonlp_spark.operators.bm25f import score_multi_match_best_fields

    docs, p, stats, n_docs, avgdl, tokens = engine
    fp = lead_body_fields(docs, lead_n=0)  # one field (body), boost 1
    claims = spark.createDataFrame([(0, "alpha zeta")], "claim_id long, claim string")
    qt = claim_terms(claims)
    bf = {
        r["doc_id"]: r["score"]
        for r in score_multi_match_best_fields(
            fp, qt, k=10, boosts={"lead": 1.0, "body": 1.0}
        ).collect()
    }
    ex = {
        r["doc_id"]: r["score"]
        for r in score_exhaustive(p, stats, qt, n_docs, avgdl, k=10).collect()
    }
    assert bf.keys() == ex.keys()
    for d in bf:
        assert bf[d] == pytest.approx(ex[d], abs=1e-9)
