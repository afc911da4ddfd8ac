"""function_score gauss decay + ES rescore window (round-4 surface)."""

import math

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.bm25 import gauss_decay_expr

ORIGIN, OFFSET, SCALE = 300.0, 50.0, 150.0


def _decay_vals(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    return [
        r["m"]
        for r in df.select(
            gauss_decay_expr(F.col("x"), ORIGIN, OFFSET, SCALE).alias("m")
        ).collect()
    ]


def test_gauss_decay_pinned_points(spark):
    # flat top inside [origin-offset, origin+offset]; exactly `decay` at
    # distance offset+scale; symmetric; monotone outside the plateau
    xs = [300, 250, 350, 300 + 50 + 150, 300 - 50 - 150, 420, 560]
    m = dict(zip(xs, _decay_vals(spark, xs)))
    assert m[300] == 1.0 and m[250] == 1.0 and m[350] == 1.0
    assert abs(m[300 + 200] - 0.5) < 1e-12
    assert abs(m[300 - 200] - 0.5) < 1e-12
    assert 0.5 < m[420] < 1.0 and m[560] < 0.5
    # closed form: exp(-(d^2) / (2 * (-scale^2 / (2 ln 0.5))))
    sigma2 = -(SCALE ** 2) / (2.0 * math.log(0.5))
    d = 560 - ORIGIN - OFFSET
    assert abs(m[560] - math.exp(-(d * d) / (2 * sigma2))) < 1e-12


def test_rescore_reorders_by_secondary(spark):
    """rescore_weight=0 reproduces the BM25 window order; a dominant
    rescore weight follows the secondary scorer instead."""
    from defactonlp_spark.operators.ltr import rescore_topk

    # synthetic feature window: bm25 and lm deliberately disagree
    feats = spark.createDataFrame(
        [
            (0, 1, 10, 5.0, 1.0),
            (0, 2, 20, 4.0, 9.0),
            (0, 3, 30, 3.0, 5.0),
        ],
        "claim_id long, rank int, doc_id long, bm25 double, lm_qlh double",
    )
    bm_order = [
        r["doc_id"]
        for r in rescore_topk(feats, k=3, query_weight=1.0, rescore_weight=0.0)
        .orderBy("rank").collect()
    ]
    assert bm_order == [10, 20, 30]
    lm_order = [
        r["doc_id"]
        for r in rescore_topk(feats, k=3, query_weight=0.0, rescore_weight=1.0)
        .orderBy("rank").collect()
    ]
    assert lm_order == [20, 30, 10]
    # null lm (secondary never matched) coalesces to 0, stays in window
    feats2 = spark.createDataFrame(
        [(0, 1, 10, 5.0, None), (0, 2, 20, 4.0, 8.0)],
        "claim_id long, rank int, doc_id long, bm25 double, lm_qlh double",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in rescore_topk(feats2, k=2, query_weight=0.5, rescore_weight=0.5).collect()
    }
    assert set(got) == {10, 20}
    assert abs(got[10] - 2.5) < 1e-12 and abs(got[20] - 6.0) < 1e-12
