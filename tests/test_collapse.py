"""Field-collapsed BM25 (score_collapsed) vs the exhaustive scorer.

The collapse is a pure post-rule over the full scored relation, so the
oracle is score_exhaustive with k = everything + a pandas replay of the
rule: per (claim, group) keep the best doc (round(score,6) desc, doc_id),
then top-k across groups with the same key.
"""

import pandas as pd

from defactonlp_spark.operators.bm25 import (
    claim_terms,
    score_collapsed,
    score_exhaustive,
)
from defactonlp_spark.operators.postings import term_stats
from defactonlp_spark.functions.tokenize import tokenize_postings


DOCS = [
    (0, "alpha beta gamma", "a.com"),
    (1, "alpha alpha beta", "a.com"),   # same site as 0: only one may rank
    (2, "alpha beta beta gamma", "b.com"),
    (3, "alpha", "b.com"),
    (4, "beta gamma gamma", "c.com"),
    (5, "alpha beta gamma", "c.com"),   # identical text to 0: tie broken by id
    (6, "delta epsilon", "d.com"),
]
CLAIMS = [(100, "alpha beta"), (101, "gamma"), (102, "qqunseen"), (103, "delta")]


def _setup(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )
    groups = spark.createDataFrame(
        [(i, g) for i, _, g in DOCS], "doc_id long, group string"
    )
    claims = spark.createDataFrame(CLAIMS, "claim_id long, claim string")
    p = tokenize_postings(docs).persist()
    stats = term_stats(p)
    dl = p.groupBy("doc_id").sum("tf").collect()
    n_docs = len(dl)
    avgdl = sum(r[1] for r in dl) / n_docs
    return p, stats, claim_terms(claims), groups, n_docs, avgdl


def test_collapsed_matches_exhaustive_replay(spark):
    p, stats, qt, groups, n_docs, avgdl = _setup(spark)
    k = 2
    got = score_collapsed(p, stats, qt, n_docs, avgdl, groups, k=k).toPandas()

    full = score_exhaustive(p, stats, qt, n_docs, avgdl, k=10**6).toPandas()
    gmap = {i: g for i, _, g in DOCS}
    full["group"] = full["doc_id"].map(gmap)
    full["rk"] = full["score"].round(6)
    full = full.sort_values(
        ["claim_id", "rk", "doc_id"], ascending=[True, False, True]
    )
    expect = (
        full.drop_duplicates(["claim_id", "group"])
        .groupby("claim_id", group_keys=False)
        .head(k)
    )
    expect["rank"] = expect.groupby("claim_id").cumcount() + 1

    cols = ["claim_id", "rank", "doc_id", "group"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = expect[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # pinned semantics: for claim 100, a.com contributes exactly one doc,
    # and the 0-vs-5 identical-text tie goes to doc 0
    c100 = got[got.claim_id == 100]
    assert list(c100.groupby("group").size().unique()) == [1]
    by_claim = got[got.claim_id == 101].sort_values("rank")
    assert 5 not in by_claim[by_claim.group == "c.com"].doc_id.values or (
        0 not in by_claim.doc_id.values
    )
    # unseen term -> no rows for claim 102
    assert (got.claim_id == 102).sum() == 0
    p.unpersist()


def test_query_collapsed_index_path(spark, tmp_path):
    """Index-path collapse == ad-hoc replay of the same rule over
    query_exhaustive's full ranking (stored stats, pruned decode)."""
    from defactonlp_spark.config import EngineConfig
    from defactonlp_spark.plans.build import IndexBuild, IndexReader, prepare_webpages
    from defactonlp_spark.plans.query import query_collapsed, query_exhaustive
    from defactonlp_spark.sources.fixtures import gen_claims, gen_webpages
    from pyspark.sql import functions as F

    cfg = EngineConfig(n_buckets=4)
    pages = spark.createDataFrame(gen_webpages(n=250, seed=31))
    corpus = prepare_webpages(pages).persist()
    d = str(tmp_path / "idx")
    IndexBuild(d, cfg, build_id="c").run(spark, corpus, input_snapshot="c")
    reader = IndexReader(spark, d)

    # group = last hex char of md5(doc_id): ~16 pseudo-domains
    groups = corpus.select(
        "doc_id", F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1).alias("group")
    ).persist()
    claims = spark.createDataFrame(gen_claims(12)[["claim_id", "claim"]])

    k = 3
    got = query_collapsed(reader, claims, groups, k=k, cfg=cfg).toPandas()

    full = query_exhaustive(reader, claims, k=10**6, cfg=cfg).toPandas()
    gmap = {r["doc_id"]: r["group"] for r in groups.collect()}
    full["group"] = full["doc_id"].map(gmap)
    full["rk"] = full["score"].round(6)
    full = full.sort_values(["claim_id", "rk", "doc_id"], ascending=[True, False, True])
    expect = (
        full.drop_duplicates(["claim_id", "group"])
        .groupby("claim_id", group_keys=False)
        .head(k)
    )
    expect["rank"] = expect.groupby("claim_id").cumcount() + 1

    cols = ["claim_id", "rank", "doc_id", "group"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = expect[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert got.groupby(["claim_id", "group"]).size().max() == 1
    corpus.unpersist(); groups.unpersist()
