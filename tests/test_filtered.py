"""Filtered retrieval: exact top-k BM25 restricted to an allowed doc set
(metadata-predicate queries — the Lucene filter-query analog).

Contracts:
- query_filtered == rank-with-stored-stats over the allowed subset
  (oracle: corpus postings semi-joined to the allowed set, scored with
  full-corpus df/N/avgdl).
- an all-covering filter degenerates to query_exhaustive exactly.
- tombstones compose: deleted docs never rank even when the filter
  allows them.
"""

import numpy as np
from pyspark.sql import functions as F

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.operators.bm25 import claim_terms, score_exhaustive
from defactonlp_spark.operators.postings import build_postings, term_stats
from defactonlp_spark.plans.build import (
    IndexBuild,
    IndexReader,
    delete_docs,
    prepare_webpages,
)
from defactonlp_spark.plans.query import query_exhaustive, query_filtered
from defactonlp_spark.sources.fixtures import gen_claims, gen_webpages

CFG = EngineConfig(n_buckets=4)


def _sorted_pdf(df):
    return (
        df.toPandas().sort_values(["claim_id", "rank"]).reset_index(drop=True)
    )


def test_query_filtered(spark, tmp_path):
    pages = spark.createDataFrame(gen_webpages(n=250, seed=21))
    corpus = prepare_webpages(pages).persist()
    d = str(tmp_path / "idx")
    IndexBuild(d, CFG, build_id="f", n_groups=1).run(spark, corpus, input_snapshot="f")
    r = IndexReader(spark, d)
    claims = spark.createDataFrame(gen_claims(10)[["claim_id", "claim"]])

    allowed = corpus.filter(F.col("lang") == "en").select("doc_id")
    got = _sorted_pdf(query_filtered(r, claims, allowed, k=5, cfg=CFG))

    en_ids = {int(x["doc_id"]) for x in allowed.collect()}
    assert len(got) > 0
    assert set(got["doc_id"].astype(int)) <= en_ids

    # oracle: corpus postings restricted to allowed, STORED stats
    pl = build_postings(corpus)
    o = _sorted_pdf(
        score_exhaustive(
            pl.join(allowed, "doc_id", "left_semi"), term_stats(pl),
            claim_terms(claims), r.n_docs, r.avgdl, k=5, params=CFG.bm25,
        )
    )
    assert (got["doc_id"] == o["doc_id"]).all()
    assert np.allclose(got["score"], o["score"], rtol=0, atol=1e-12)

    # the filter actually bites: unfiltered top-k differs somewhere
    unf = _sorted_pdf(query_exhaustive(r, claims, k=5, cfg=CFG))
    assert not (unf["doc_id"] == got["doc_id"]).all()

    # all-covering filter degenerates to the unfiltered path exactly
    full = _sorted_pdf(
        query_filtered(r, claims, corpus.select("doc_id"), k=5, cfg=CFG)
    )
    assert (full["doc_id"] == unf["doc_id"]).all()
    assert np.allclose(full["score"], unf["score"], rtol=0, atol=1e-12)

    # tombstones compose: delete the filtered winners; they vanish while
    # the filter semantics stay intact
    winners = sorted(set(got.loc[got["rank"] == 1, "doc_id"].astype(int)))
    delete_docs(spark, d, winners)
    r2 = IndexReader(spark, d)
    got2 = _sorted_pdf(query_filtered(r2, claims, allowed, k=5, cfg=CFG))
    assert not set(got2["doc_id"].astype(int)) & set(winners)
    assert set(got2["doc_id"].astype(int)) <= en_ids
    corpus.unpersist()
