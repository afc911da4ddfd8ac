"""Parent-child block join (ES has_child / has_parent), rank_feature
saturation, date_histogram pipeline aggs, and the _termvectors lookup —
each checked against hand-computed expectations on corpora small enough
to verify by eye."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.blockjoin import score_has_child, score_has_parent

# (claim_id, child_id, score); parent = child_id // 10
CHILD_SCORES = [
    (0, 10, 1.0), (0, 11, 3.0), (0, 12, 2.0),   # parent 1: max 3.0, sum 6.0, n 3
    (0, 20, 5.0),                                # parent 2: n 1
    (0, 30, 2.5), (0, 31, 2.5),                  # parent 3: max 2.5, n 2
    (1, 10, 4.0), (1, 20, 1.0), (1, 21, 2.0),    # claim 1
]


@pytest.fixture()
def child_scores(spark):
    return spark.createDataFrame(CHILD_SCORES, "claim_id long, child_id long, score double")


def _rows(df):
    return {(r["claim_id"], r["parent_id"]): r for r in df.collect()}


def test_has_child_max_and_min_children(child_scores):
    out = _rows(
        score_has_child(child_scores, (F.col("child_id") / 10).cast("long"),
                        score_mode="max", min_children=2, k=5)
    )
    # parent 2 of claim 0 (single child) and both claim-1 parents with n<2 gated out
    assert set(out) == {(0, 1), (0, 3), (1, 2)}
    assert out[(0, 1)]["score"] == 3.0 and out[(0, 1)]["n_children"] == 3
    assert out[(0, 3)]["score"] == 2.5 and out[(0, 3)]["n_children"] == 2
    assert out[(0, 1)]["rank"] == 1 and out[(0, 3)]["rank"] == 2


def test_has_child_modes(child_scores):
    parent = (F.col("child_id") / 10).cast("long")
    sums = _rows(score_has_child(child_scores, parent, score_mode="sum", k=5))
    assert sums[(0, 1)]["score"] == 6.0 and sums[(0, 2)]["score"] == 5.0
    avgs = _rows(score_has_child(child_scores, parent, score_mode="avg", k=5))
    assert avgs[(0, 1)]["score"] == 2.0
    mins = _rows(score_has_child(child_scores, parent, score_mode="min", k=5))
    assert mins[(0, 1)]["score"] == 1.0
    none = _rows(score_has_child(child_scores, parent, score_mode="none", k=2))
    # constant-score: rank by parent_id; every matched parent scores 0.0
    assert all(r["score"] == 0.0 for r in none.values())
    assert {(c, p) for c, p in none} == {(0, 1), (0, 2), (1, 1), (1, 2)}


def test_has_child_max_children_and_bad_mode(child_scores):
    parent = (F.col("child_id") / 10).cast("long")
    capped = _rows(score_has_child(child_scores, parent, score_mode="max",
                                   max_children=2, k=5))
    assert (0, 1) not in capped and (0, 3) in capped
    with pytest.raises(ValueError):
        score_has_child(child_scores, parent, score_mode="median")


def test_has_parent_propagates_parent_score(spark):
    parents = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 4.0)], "claim_id long, parent_id long, score double"
    )
    children = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 200), (3, 300)], "parent_id long, child_id long"
    )
    out = score_has_parent(parents, children).collect()
    got = {(r["claim_id"], r["parent_id"], r["child_id"]): r["score"] for r in out}
    assert got == {(0, 1, 100): 9.0, (0, 1, 101): 9.0, (0, 2, 200): 4.0}


def test_rank_feature_additive_saturation(spark):
    from defactonlp_spark.operators.bm25 import claim_terms, score_rank_feature
    from defactonlp_spark.operators.postings import build_postings, term_stats

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    p = build_postings(docs)
    feats = spark.createDataFrame([(1, 1.0), (3, 1.0)], "doc_id long, feature double")
    claims = spark.createDataFrame([(0, "alpha")], "claim_id long, claim string")
    out = {
        r["doc_id"]: r
        for r in score_rank_feature(
            p, term_stats(p), claim_terms(claims), 3, 2.0, feats,
            pivot=1.0, boost=2.0, k=5,
        ).collect()
    }
    # docs 1 and 2 have identical bm25; doc 1's feature adds 2.0 * 1/(1+1) = 1.0,
    # doc 2 (no feature row) adds exactly 0; doc 3 doesn't match at all
    assert set(out) == {1, 2}
    assert out[1]["bm25"] == pytest.approx(out[2]["bm25"])
    assert out[1]["score"] == pytest.approx(out[1]["bm25"] + 1.0)
    assert out[2]["score"] == pytest.approx(out[2]["bm25"])
    assert out[1]["rank"] == 1


def test_date_histogram_pipeline_gap_fill_and_pipeline_metrics(spark):
    from defactonlp_spark.operators.analytics import date_histogram_pipeline

    t0 = dt.datetime(2026, 1, 1, 0, 30)
    rows = [
        (t0, 1.0), (t0.replace(minute=45), 2.0),          # hour 0: n=2, sum=3
        (t0 + dt.timedelta(hours=2), 4.0),                # hour 2: n=1 (hour 1 empty)
        (t0 + dt.timedelta(hours=3), 1.5),
        (t0 + dt.timedelta(hours=3, minutes=10), 0.5),
        (t0 + dt.timedelta(hours=3, minutes=20), 1.0),    # hour 3: n=3, sum=3
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = date_histogram_pipeline(ev).collect()
    assert [r["n_events"] for r in out] == [2, 0, 1, 3]
    assert [r["sum_value"] for r in out] == [3.0, 0.0, 4.0, 3.0]
    assert out[0]["derivative"] is None
    assert [r["derivative"] for r in out[1:]] == [-2, 1, 2]
    assert [r["cumulative"] for r in out] == [2, 2, 3, 6]
    assert out[3]["moving_avg"] == pytest.approx((0 + 1 + 3) / 3)
    assert out[1]["moving_avg"] == pytest.approx(1.0)  # trailing window clips at start


def test_term_vectors_lookup(spark):
    from defactonlp_spark.operators.postings import build_postings, term_stats, term_vectors

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b")], "doc_id long, text string"
    )
    p = build_postings(docs)
    out = {(r["doc_id"], r["term"]): r for r in term_vectors(p, term_stats(p), [1, 3]).collect()}
    assert set(out) == {(1, "a"), (1, "b"), (3, "b")}
    r = out[(1, "a")]
    assert (r["tf"], r["dl"], r["df"], r["ttf"]) == (2, 3, 2, 3)
    r = out[(3, "b")]
    assert (r["tf"], r["dl"], r["df"], r["ttf"]) == (2, 2, 2, 3)


def test_extended_stats_moments(spark):
    from defactonlp_spark.operators.analytics import extended_stats

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: r for r in extended_stats(df, ["k"], "v").collect()}
    a = out["a"]
    assert (a["count"], a["min"], a["max"], a["sum"]) == (3, 1.0, 3.0, 6.0)
    assert a["avg"] == pytest.approx(2.0)
    assert a["sum_of_squares"] == pytest.approx(14.0)
    assert a["variance"] == pytest.approx(2.0 / 3.0)  # population variance
    assert a["std_deviation"] == pytest.approx((2.0 / 3.0) ** 0.5)
    b = out["b"]
    assert b["variance"] == pytest.approx(0.0) and b["count"] == 1
