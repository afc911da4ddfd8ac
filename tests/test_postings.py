"""Posting construction + stats + salting over the driver documents table."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators import postings as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def postings(spark, docs):
    return P.build_postings(docs).cache()


def test_postings_match_bruteforce(docs, postings):
    pdf = docs.select("doc_id", "text").toPandas()
    expect = {}
    for r in pdf.itertuples(index=False):
        for t, c in Counter(tokenize_one(r.text)).items():
            expect[(t, r.doc_id)] = c
    got = postings.toPandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        assert expect[(r.term, r.doc_id)] == r.tf


def test_term_stats_df(postings):
    stats = {r["term"]: r["df"] for r in P.term_stats(postings).collect()}
    brute = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("d")).collect()
    for r in brute:
        assert stats[r["term"]] == r["d"]


def test_corpus_stats(docs, postings):
    cs = P.corpus_stats(postings).collect()[0]
    pdf = docs.select("text").toPandas()
    dls = [len(tokenize_one(t)) for t in pdf["text"]]
    assert cs["n_docs"] == len([d for d in dls if d > 0])
    assert cs["total_tokens"] == sum(dls)
    assert abs(cs["avgdl"] - sum(dls) / len(dls)) < 1e-9


def test_salting_disjoint_and_complete(postings):
    cfg = EngineConfig(n_salts=4, salt_df_ratio=0.10)
    stats = P.term_stats(postings)
    n_docs = postings.select("doc_id").distinct().count()
    plan = P.salt_plan(stats, n_docs, cfg)
    head_terms = {r["term"] for r in plan.collect()}
    assert "the" in head_terms  # Zipf head of the fixture vocab
    salted = P.with_salt(postings, plan)
    # same rows, salt in range, head terms actually split
    assert salted.count() == postings.count()
    assert salted.filter((F.col("salt") < 0) | (F.col("salt") >= 4)).count() == 0
    assert salted.filter(~F.col("term").isin(list(head_terms)) & (F.col("salt") != 0)).count() == 0
    per = salted.filter(F.col("term") == "the").groupBy("salt").count().collect()
    assert len(per) == 4
    # salt is doc_id % n_salts -> each (term, doc) appears exactly once
    dup = salted.groupBy("term", "doc_id").count().filter("count > 1").count()
    assert dup == 0


def test_latest_per_url_and_doc_ids(spark):
    from defactonlp_spark.sources.fixtures import gen_webpages

    pdf = gen_webpages(n=100, seed=3, dup_frac=0.10)
    df = spark.createDataFrame(pdf)
    latest = P.latest_per_url(df)
    assert latest.count() == 100
    # recrawled urls must keep the +7d text (ends with 'recrawl')
    recrawled = {r.url for r in pdf[pdf.text.str.endswith("recrawl")].itertuples(index=False)}
    kept = {r["url"] for r in latest.filter(F.col("text").endswith("recrawl")).collect()}
    assert kept == recrawled

    with_ids = P.assign_doc_ids(latest, "global")
    ids = [r["doc_id"] for r in with_ids.orderBy("url").collect()]
    assert ids == list(range(100))  # dense, deterministic by url

    part_ids = P.assign_doc_ids(latest, "partitioned")
    assert part_ids.select("doc_id").distinct().count() == 100
