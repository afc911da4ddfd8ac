"""Round-5 operators: top_metrics / serial_diff / rare_terms /
date_range_agg / filters_agg / BM25+ / domain_mix_kl / significant_text.

Each test pins the operator's distinguishing semantic (the thing its ES or
paper counterpart is FOR), not just a smoke row count.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.analytics import (
    date_range_agg,
    domain_mix_kl,
    filters_agg,
    rare_terms,
    serial_diff,
    significant_text,
    top_metrics,
)
from defactonlp_spark.operators.lm import score_bm25_plus


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (event_id, ts_sec, user_id, event_type, value)
        (i, 1704067200 + i * 3600, i % 5, ["click", "view"][i % 2], float(i))
        for i in range(48)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts_sec long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_sec")))


def test_top_metrics_argmax_and_ties(spark, events):
    res = top_metrics(
        events, "event_type", "ts", ["value", "user_id"], size=2, tie_col="event_id"
    ).collect()
    by_type = {}
    for r in res:
        by_type.setdefault(r.event_type, []).append(r)
    # click rows are even event_ids, view odd; latest two of each
    assert [r.value for r in sorted(by_type["view"], key=lambda r: r.rank)] == [47.0, 45.0]
    assert [r.value for r in sorted(by_type["click"], key=lambda r: r.rank)] == [46.0, 44.0]
    # tie on sort key: duplicate ts rows break on event_id asc
    dup = spark.createDataFrame(
        [(1, 100, "a", 1.0), (2, 100, "a", 2.0), (3, 50, "a", 3.0)],
        "event_id long, ts long, event_type string, value double",
    )
    r = top_metrics(dup, "event_type", "ts", ["value"], size=1, tie_col="event_id").collect()
    assert r[0].value == 1.0  # event_id 1 wins the tie at ts=100


def test_serial_diff_lag_and_nulls(spark, events):
    res = sorted(
        serial_diff(events, lag=1, bucket_sec=86400).collect(),
        key=lambda r: r.bucket_start,
    )
    assert res[0].serial_diff is None  # first bucket has no lag
    # two daily buckets of 24 hourly events: sum(0..23), sum(24..47)
    assert res[0].sum_value == sum(range(24))
    assert res[1].sum_value == sum(range(24, 48))
    assert res[1].serial_diff == sum(range(24, 48)) - sum(range(24))
    # lag beyond the bucket count -> all NULL
    res7 = serial_diff(events, lag=7, bucket_sec=86400).collect()
    assert all(r.serial_diff is None for r in res7)
    # empty input -> empty result, no error
    empty = spark.createDataFrame([], "ts timestamp, value double")
    assert serial_diff(empty, lag=1).count() == 0


def test_rare_terms_filter_cap_order(spark):
    stats = spark.createDataFrame(
        [("common", 100), ("rare_b", 2), ("rare_a", 1), ("mid", 3)],
        "term string, df long",
    )
    res = rare_terms(stats, max_doc_count=2, limit=10).collect()
    assert [(r.term, r.df) for r in res] == [("rare_a", 1), ("rare_b", 2)]
    assert len(rare_terms(stats, max_doc_count=100, limit=1).collect()) == 1


def test_date_range_overlap_and_empty_bucket(spark, events):
    lo = 1704067200
    ranges = [
        ("all", None, None),
        ("first_day", lo, lo + 86400),
        ("overlap", lo + 43200, lo + 86400 + 43200),  # overlaps both days
        ("empty", lo - 10000, lo - 5000),
    ]
    res = {r.range_key: r for r in date_range_agg(events, ranges).collect()}
    assert res["all"].doc_count == 48 and res["all"].from_sec is None
    assert res["first_day"].doc_count == 24
    assert res["overlap"].doc_count == 24  # rows counted AGAIN — independent buckets
    assert res["empty"].doc_count == 0 and res["empty"].sum_value is None
    total = sum(r.doc_count for r in res.values())
    assert total == 48 + 24 + 24  # multi-counting is the semantics


def test_filters_agg_counts_and_null_avg(spark, events):
    named = {
        "clicks": F.col("event_type") == "click",
        "none": F.col("value") < -1.0,
    }
    res = {r.bucket: r for r in filters_agg(events, named).collect()}
    assert res["clicks"].doc_count == events.filter("event_type = 'click'").count()
    assert res["none"].doc_count == 0 and res["none"].avg_value is None
    exp = events.filter("event_type = 'click'").agg(F.avg("value")).collect()[0][0]
    assert abs(res["clicks"].avg_value - exp) < 1e-9


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [(0, "spark merge join"), (1, "spark " + "filler " * 200), (2, "other words here")],
        "doc_id long, text string",
    )
    from defactonlp_spark.operators.postings import build_postings, corpus_stats, term_stats

    p = build_postings(docs)
    row = corpus_stats(p).collect()[0]
    return p, term_stats(p), int(row["n_docs"]), float(row["avgdl"])


def test_bm25_plus_floor_and_delta_zero(spark, tiny_index):
    p, stats, n_docs, avgdl = tiny_index
    q = spark.createDataFrame([(0, "spark")], "claim_id long, term string")
    res = {r.doc_id: r.score for r in
           score_bm25_plus(p, stats, q, n_docs, avgdl, k=10).collect()}
    # the delta floor: the very long matching doc 1 still contributes
    # >= delta * idf > 0, and doc 2 (non-matching) is absent entirely
    assert 0 in res and 1 in res and 2 not in res
    assert res[1] > 0
    # delta=0 degrades exactly to classic BM25
    from defactonlp_spark.operators.bm25 import score_exhaustive

    plain = {(r.claim_id, r.doc_id): r.score for r in
             score_exhaustive(p, stats, q, n_docs, avgdl, k=10).collect()}
    zero = {(r.claim_id, r.doc_id): r.score for r in
            score_bm25_plus(p, stats, q, n_docs, avgdl, delta=0.0, k=10).collect()}
    assert set(plain) == set(zero)
    assert all(abs(plain[k] - zero[k]) < 1e-12 for k in plain)


def test_domain_mix_kl(spark):
    docs = spark.createDataFrame(
        [(i, "src_a" if i < 6 else "src_b", 100) for i in range(10)],
        "doc_id long, source string, n_chars long",
    )
    # actual = (0.6, 0.4); target matches exactly -> contribs ~ 0
    res = {r.source: r for r in
           domain_mix_kl(docs, {"src_a": 0.6, "src_b": 0.4}).collect()}
    assert abs(res["src_a"].kl_contrib) < 1e-8
    assert abs(res["src_b"].kl_contrib) < 1e-8
    # drifted target -> positive total KL; missing source -> NULL surfaced
    res2 = {r.source: r for r in
            domain_mix_kl(docs, {"src_a": 0.2}).collect()}
    assert res2["src_a"].kl_contrib == pytest.approx(
        0.6 * math.log(0.6 / 0.2), abs=1e-6)
    assert res2["src_b"].target_share is None and res2["src_b"].kl_contrib is None


def test_significant_text_dedups_foreground(spark):
    # docs 1 and 2 are EXACT duplicates carrying the boilerplate term; with
    # filter_duplicate_text the pair votes once, dropping fg_count below
    # the min_fg_count=2 gate that plain significant_terms would pass
    docs = spark.createDataFrame(
        [(0, "query anchor unique"), (1, "query boiler plate copy"),
         (2, "query boiler plate copy"), (3, "background words only"),
         (4, "more background text")],
        "doc_id long, text string",
    )
    from defactonlp_spark.operators.analytics import significant_terms
    from defactonlp_spark.operators.postings import build_postings, term_stats

    p = build_postings(docs)
    stats = term_stats(p)
    fg = spark.createDataFrame([(0, 0), (0, 1), (0, 2)], "claim_id long, doc_id long")
    qt = spark.createDataFrame([(0, "query")], "claim_id long, term string")
    with_dup = {r.term for r in significant_terms(
        p, stats, fg, n_docs=5, k=10, min_fg_count=2, exclude=qt).collect()}
    deduped = {r.term for r in significant_text(
        docs, p, stats, fg, n_docs=5, k=10, min_fg_count=2, exclude=qt).collect()}
    assert "boiler" in with_dup and "boiler" not in deduped
