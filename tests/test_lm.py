"""Unigram-LM operators (Dirichlet QL, corpus perplexity), static index
pruning, and doc-prior boosting — each against a pure-Python scalar replay
of the pinned spec (tests/oracle_bm25.py style: the replay isolates the
distributed machinery, not the arithmetic)."""

import math
from collections import Counter

import pytest

from defactonlp_spark.config import BM25Params
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.bm25 import claim_terms, score_boosted, score_exhaustive
from defactonlp_spark.operators.lm import ctf_stats, doc_perplexity, score_lm_dirichlet
from defactonlp_spark.operators.postings import (
    build_postings,
    corpus_stats,
    prune_postings,
    term_stats,
)
from tests.oracle_bm25 import build_oracle_index

MU = 1500.0

TEXTS = {
    # ties: docs 20/21 share an identical token profile (argmax must break
    # on doc_id); vocab mixes head terms ("data") with singletons.
    0: "spark shuffles data across the cluster for wide operations",
    1: "posting lists compress deltas with variable byte encoding",
    2: "the query engine scores documents with bm25 ranking",
    3: "data skew makes one partition slow the whole stage down",
    4: "broadcast joins avoid shuffling the small dimension table",
    5: "language models assign probability to token sequences",
    6: "dirichlet smoothing mixes document and collection statistics",
    7: "perplexity measures how surprised the model is by text",
    8: "quality filters drop boilerplate and low information pages",
    9: "the crawler fetches pages and extracts text from html",
    10: "data data data repeated tokens stress term frequency paths",
    11: "an unrelated document about gardening roses and soil",
    12: "another unrelated document about cooking pasta and sauce",
    20: "identical twin document about data and ranking",
    21: "identical twin document about data and ranking",
}

CLAIMS = {
    0: "data ranking with bm25",
    1: "dirichlet smoothing perplexity model",
    2: "shuffle partition skew",
    3: "zzzunknownterm data",  # OOV term mixed with an in-collection one
}


def _corpus_model(texts):
    postings, dl, n, avgdl = build_oracle_index(texts)
    ctf = {t: sum(pl.values()) for t, pl in postings.items()}
    T = float(sum(dl.values()))
    return postings, dl, ctf, T


def lm_dirichlet_oracle(texts, claims, mu=MU, k=5):
    postings, dl, ctf, T = _corpus_model(texts)
    out = {}
    for cid, claim in claims.items():
        in_coll = sorted(t for t in set(tokenize_one(claim)) if t in ctf)
        nq = float(len(in_coll))
        tsum: dict[int, float] = {}
        for t in in_coll:
            pc = ctf[t] / T
            for d, tf in postings[t].items():
                tsum[d] = tsum.get(d, 0.0) + math.log1p(tf / (mu * pc))
        scored = [
            (d, s + nq * math.log(mu / (dl[d] + mu))) for d, s in tsum.items()
        ]
        out[cid] = sorted(scored, key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


def perplexity_oracle(texts):
    postings, dl, ctf, T = _corpus_model(texts)
    out = {}
    for d, text in texts.items():
        toks = tokenize_one(text)
        h = -sum(c * math.log(ctf[t] / T) for t, c in Counter(toks).items()) / len(toks)
        out[d] = (len(toks), round(h, 6))
    return out


def bm25_contrib_scalar(tf, dl, df, n, avgdl, p=BM25Params()):
    idf = math.log1p((n - df + 0.5) / (df + 0.5))
    return idf * tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def prune_oracle(texts, keep_n):
    """term -> kept doc set under the pinned (round(impact,6) desc, doc_id)."""
    postings, dl, n, avgdl = build_oracle_index(texts)
    kept = {}
    for t, plist in postings.items():
        ranked = sorted(
            plist.items(),
            key=lambda kv: (
                -round(bm25_contrib_scalar(kv[1], dl[kv[0]], len(plist), n, avgdl), 6),
                kv[0],
            ),
        )
        kept[t] = {d for d, _ in ranked[:keep_n]}
    return kept


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    p = build_postings(docs).persist()
    st = corpus_stats(p).collect()[0]
    yield p, int(st["n_docs"]), float(st["avgdl"]), int(st["total_tokens"])
    p.unpersist()


@pytest.fixture(scope="module")
def claims_df(spark):
    return spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )


def test_lm_dirichlet_matches_scalar_oracle(spark, corpus, claims_df):
    p, n_docs, avgdl, total = corpus
    res = score_lm_dirichlet(
        p, ctf_stats(p), claim_terms(claims_df), total, mu=MU, k=5
    ).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    want = lm_dirichlet_oracle(TEXTS, CLAIMS, mu=MU, k=5)
    want = {cid: v for cid, v in want.items() if v}
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gd, gs), (wd, ws) in zip(got[cid], pairs):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_lm_dirichlet_twin_docs_tie_on_doc_id(spark, corpus, claims_df):
    p, n_docs, avgdl, total = corpus
    res = score_lm_dirichlet(
        p, ctf_stats(p), claim_terms(claims_df), total, mu=MU, k=15
    ).toPandas()
    one = res[res.claim_id == 0].sort_values("rank")
    ranks = {int(r.doc_id): int(r.rank) for r in one.itertuples()}
    assert ranks[21] == ranks[20] + 1  # exact tie -> doc_id order, adjacent


def test_doc_perplexity_matches_scalar_oracle(spark, corpus):
    p, n_docs, avgdl, total = corpus
    res = {
        r["doc_id"]: r for r in doc_perplexity(p, ctf_stats(p), total).collect()
    }
    want = perplexity_oracle(TEXTS)
    assert set(res) == set(want)
    for d, (ntok, h6) in want.items():
        assert res[d]["n_tokens"] == ntok
        assert res[d]["cross_entropy"] == pytest.approx(h6, abs=1.1e-6)
        assert res[d]["ppl"] == pytest.approx(round(math.exp(h6), 4), abs=2e-4)


def test_prune_noop_when_keep_n_covers_df(spark, corpus):
    p, n_docs, avgdl, total = corpus
    pruned = prune_postings(p, term_stats(p), n_docs, avgdl, keep_n=10**6)
    assert pruned.exceptAll(p).count() == 0 and p.exceptAll(pruned).count() == 0


def test_prune_matches_scalar_keep_rule(spark, corpus):
    p, n_docs, avgdl, total = corpus
    pruned = prune_postings(p, term_stats(p), n_docs, avgdl, keep_n=2).collect()
    got: dict[str, set] = {}
    for r in pruned:
        got.setdefault(r["term"], set()).add(r["doc_id"])
    assert got == {t: s for t, s in prune_oracle(TEXTS, 2).items() if s}


def test_serving_over_pruned_index_uses_full_stats(spark, corpus, claims_df):
    """Query over the pruned index with UNpruned stats == scalar replay of
    full-stats BM25 restricted to the kept postings."""
    p, n_docs, avgdl, total = corpus
    keep_n = 3
    pruned = prune_postings(p, term_stats(p), n_docs, avgdl, keep_n=keep_n)
    res = score_exhaustive(
        pruned, term_stats(p), claim_terms(claims_df), n_docs, avgdl, k=5
    ).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append(r["doc_id"])

    postings, dl, n, avg = build_oracle_index(TEXTS)
    kept = prune_oracle(TEXTS, keep_n)
    want = {}
    for cid, claim in CLAIMS.items():
        scores: dict[int, float] = {}
        for t in sorted(set(tokenize_one(claim))):
            if t not in postings:
                continue
            df = len(postings[t])  # FULL df, pre-pruning
            for d, tf in postings[t].items():
                if d not in kept[t]:
                    continue
                scores[d] = scores.get(d, 0.0) + bm25_contrib_scalar(
                    tf, dl[d], df, n, avg
                )
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        if top:
            want[cid] = [d for d, _ in top]
    assert got == want


def test_score_boosted_matches_scalar_replay(spark, corpus, claims_df):
    p, n_docs, avgdl, total = corpus
    # deterministic prior: longer docs get a higher boost (6-dp exact)
    boosts = (
        p.groupBy("doc_id")
        .agg({"dl": "first"})
        .withColumnRenamed("first(dl)", "dl")
        .selectExpr("doc_id", "round(0.5 + dl / 100.0, 6) AS boost")
    )
    res = score_boosted(
        p, term_stats(p), claim_terms(claims_df), n_docs, avgdl, boosts, k=5
    ).collect()
    got = {}
    for r in sorted(res, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))

    postings, dl, n, avg = build_oracle_index(TEXTS)
    want = {}
    for cid, claim in CLAIMS.items():
        scores: dict[int, float] = {}
        for t in sorted(set(tokenize_one(claim))):
            if t not in postings:
                continue
            for d, tf in postings[t].items():
                scores[d] = scores.get(d, 0.0) + bm25_contrib_scalar(
                    tf, dl[d], len(postings[t]), n, avg
                )
        boosted = [(d, s * round(0.5 + dl[d] / 100.0, 6)) for d, s in scores.items()]
        top = sorted(boosted, key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
        if top:
            want[cid] = top
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid in want:
        for (gd, gs), (wd, ws) in zip(got[cid], want[cid]):
            assert gs == pytest.approx(ws, rel=1e-9)


# ---- index-serving path ---------------------------------------------------


@pytest.fixture(scope="module")
def built_idx(spark, tmp_path_factory):
    from defactonlp_spark.config import EngineConfig
    from defactonlp_spark.plans.build import IndexBuild, IndexReader, prepare_webpages
    from defactonlp_spark.sources.fixtures import gen_webpages

    out = str(tmp_path_factory.mktemp("lmidx"))
    pages = spark.createDataFrame(gen_webpages(n=400, seed=7))
    corpus = prepare_webpages(pages).persist()
    cfg = EngineConfig(n_buckets=4)
    IndexBuild(out, cfg, build_id="lm").run(spark, corpus, input_snapshot="f:400")
    reader = IndexReader(spark, out)
    yield reader, corpus, cfg
    corpus.unpersist()


def test_query_lm_dirichlet_matches_adhoc(spark, built_idx):
    """Index path (stored dictionary ctf + manifest total_tokens + pruned
    segment decode) == ad-hoc operator over the same corpus."""
    from defactonlp_spark.plans.query import query_lm_dirichlet
    from defactonlp_spark.sources.fixtures import gen_claims

    reader, corpus, cfg = built_idx
    claims = spark.createDataFrame(gen_claims(30)[["claim_id", "claim"]])
    got = query_lm_dirichlet(reader, claims, mu=MU, k=5).toPandas()

    p = build_postings(corpus)
    want = score_lm_dirichlet(
        p, ctf_stats(p), claim_terms(claims), reader.total_tokens, mu=MU, k=5
    ).toPandas()
    g = got.sort_values(["claim_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["claim_id", "rank"]).reset_index(drop=True)
    assert list(g.claim_id) == list(w.claim_id)
    assert list(g.doc_id) == list(w.doc_id)
    assert (g.score - w.score).abs().max() < 1e-9


def test_query_lm_dirichlet_stored_stats_under_deletes(spark, built_idx):
    """Tombstoned docs vanish from results; survivors keep their AS-BUILT
    scores (collection model unchanged until compaction)."""
    from defactonlp_spark.plans.build import delete_docs
    from defactonlp_spark.plans.query import query_lm_dirichlet
    from defactonlp_spark.sources.fixtures import gen_claims

    reader, corpus, cfg = built_idx
    claims = spark.createDataFrame(gen_claims(10)[["claim_id", "claim"]])
    before = query_lm_dirichlet(reader, claims, mu=MU, k=3).toPandas()
    victims = sorted(before.doc_id.unique())[:2]
    delete_docs(spark, reader.out_dir, victims, note="test")
    reader2 = type(reader)(spark, reader.out_dir)
    after = query_lm_dirichlet(reader2, claims, mu=MU, k=3).toPandas()
    assert not set(victims) & set(after.doc_id)
    merged = before.merge(after, on=["claim_id", "doc_id"], suffixes=("_b", "_a"))
    assert len(merged) and (merged.score_b - merged.score_a).abs().max() < 1e-12


def test_search_after_equals_rank_slice(spark, corpus, claims_df):
    """Cursor paging == the rank slice [k+1, 2k] of a double-size first
    page with the same (round(score,6), doc_id) order key."""
    from defactonlp_spark.operators.bm25 import score_page_after

    p, n_docs, avgdl, total = corpus
    stats = term_stats(p)
    qt = claim_terms(claims_df)
    K = 4
    both = score_exhaustive(p, stats, qt, n_docs, avgdl, k=2 * K, rank_dp=6).toPandas()
    page1 = both[both["rank"] <= K]
    cursors_rows = [
        (int(r.claim_id), round(float(r.score), 6), int(r.doc_id))
        for r in page1[page1["rank"] == K].itertuples()
    ]
    cursors = spark.createDataFrame(
        cursors_rows, "claim_id long, after_score double, after_doc long"
    )
    page2 = score_page_after(p, stats, qt, n_docs, avgdl, cursors, k=K).toPandas()
    want = both[both["rank"] > K].copy()
    want["rank"] = want["rank"] - K
    g = page2.sort_values(["claim_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["claim_id", "rank"]).reset_index(drop=True)
    assert list(g.claim_id) == list(w.claim_id)
    assert list(g.doc_id) == list(w.doc_id)
    assert (g.score - w.score).abs().max() < 1e-9


def test_search_after_no_cursor_no_page(spark, corpus, claims_df):
    from defactonlp_spark.operators.bm25 import score_page_after

    p, n_docs, avgdl, total = corpus
    empty = spark.createDataFrame([], "claim_id long, after_score double, after_doc long")
    assert score_page_after(
        p, term_stats(p), claim_terms(claims_df), n_docs, avgdl, empty, k=3
    ).count() == 0


def test_prune_two_phase_equals_single_window(spark, corpus):
    """The salted two-phase top-N must equal the plain per-term window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from defactonlp_spark.operators.bm25 import bm25_score_expr

    p, n_docs, avgdl, total = corpus
    two = prune_postings(p, term_stats(p), n_docs, avgdl, keep_n=2)
    impact = F.round(bm25_score_expr(n_docs, avgdl, BM25Params()), 6)
    w = W.partitionBy("term").orderBy(F.desc("impact"), F.asc("doc_id"))
    ref = (
        p.join(term_stats(p), "term", "inner")
        .withColumn("impact", impact)
        .withColumn("_prn", F.row_number().over(w))
        .filter(F.col("_prn") <= 2)
        .select("term", "doc_id", "tf", "dl")
    )
    assert two.exceptAll(ref).count() == 0 and ref.exceptAll(two).count() == 0


def test_ltr_features_consistent_with_component_scorers(spark, corpus, claims_df):
    """Each feature column must equal the standalone operator's value for
    the same (claim, doc): bm25 == score_exhaustive, lm_qlh ==
    score_lm_dirichlet, quality == quality_features."""
    from defactonlp_spark.functions.textstats import quality_features
    from defactonlp_spark.operators.ltr import ltr_features

    p, n_docs, avgdl, total = corpus
    docs = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    qual = quality_features(docs).select("doc_id", "quality")
    qt = claim_terms(claims_df)
    feats = ltr_features(
        p, term_stats(p), ctf_stats(p), qt, qual, n_docs, avgdl, total,
        k=6, mu=MU,
    ).toPandas()
    assert (feats.groupby("claim_id")["rank"].max() <= 6).all()

    bm = score_exhaustive(p, term_stats(p), qt, n_docs, avgdl, k=6, rank_dp=6).toPandas()
    bm_map = {(r.claim_id, r.doc_id): r.score for r in bm.itertuples()}
    lm = score_lm_dirichlet(p, ctf_stats(p), qt, total, mu=MU, k=100).toPandas()
    lm_map = {(r.claim_id, r.doc_id): r.score for r in lm.itertuples()}
    qmap = {r["doc_id"]: r["quality"] for r in qual.collect()}
    for r in feats.itertuples():
        key = (r.claim_id, r.doc_id)
        assert abs(bm_map[key] - r.bm25) < 1e-9
        assert abs(lm_map[key] - r.lm_qlh) < 1e-9
        assert qmap[r.doc_id] == r.quality
        assert r.dl == len(TEXTS[r.doc_id].split())
