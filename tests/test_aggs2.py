"""Round-4 continuation ES aggregations — string_stats, exact MAD, boxplot,
Welch t_test, rate, multi_terms, auto_date_histogram, geo_centroid_bounds —
each against a numpy/pure-Python replay."""

import datetime as dt
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.analytics import (
    AUTO_DH_LADDER,
    auto_date_histogram,
    boxplot_agg,
    median_absolute_deviation,
    multi_terms,
    rate_agg,
    string_stats,
    t_test_welch,
)
from defactonlp_spark.operators.geo import geo_centroid_bounds, with_coords

INV_LN2 = 1.4426950408889634


@pytest.fixture(scope="module")
def values_df2(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 100, 7, 9]] + [
        ("b", float(v)) for v in [10, 20, 30, 40]
    ]
    return spark.createDataFrame(rows, "grp string, value double")


def test_string_stats_matches_counter_replay(spark):
    texts = {0: ("g", "aab"), 1: ("g", "abc def"), 2: ("h", "zzzz")}
    df = spark.createDataFrame(
        [(k, g, t) for k, (g, t) in texts.items()], "doc_id long, grp string, text string"
    )
    got = {r["grp"]: r for r in string_stats(df, ["grp"], "text").collect()}
    for grp in ("g", "h"):
        docs = [t for g, t in texts.values() if g == grp]
        chars = Counter("".join(docs))
        tot = sum(chars.values())
        ent = -sum(c / tot * math.log(c / tot) * INV_LN2 for c in chars.values())
        r = got[grp]
        assert r["count"] == len(docs)
        assert r["min_length"] == min(len(d) for d in docs)
        assert r["max_length"] == max(len(d) for d in docs)
        assert r["avg_length"] == pytest.approx(sum(map(len, docs)) / len(docs))
        assert r["entropy"] == pytest.approx(ent, rel=1e-12)
    # single-char group: entropy exactly 0
    assert got["h"]["entropy"] == pytest.approx(0.0, abs=1e-15)


def test_mad_matches_numpy(values_df2):
    got = {r["grp"]: r for r in median_absolute_deviation(values_df2, ["grp"], "value").collect()}
    for grp, vals in {
        "a": [1, 2, 3, 4, 100, 7, 9],
        "b": [10, 20, 30, 40],
    }.items():
        med = float(np.percentile(vals, 50, method="linear"))
        mad = float(np.percentile(np.abs(np.array(vals, dtype=float) - med), 50, method="linear"))
        assert got[grp]["median"] == pytest.approx(med)
        assert got[grp]["mad"] == pytest.approx(mad)


def test_boxplot_matches_numpy(values_df2):
    got = {r["grp"]: r for r in boxplot_agg(values_df2, ["grp"], "value").collect()}
    for grp, vals in {"a": [1, 2, 3, 4, 100, 7, 9], "b": [10, 20, 30, 40]}.items():
        q1, q2, q3 = (float(np.percentile(vals, p, method="linear")) for p in (25, 50, 75))
        r = got[grp]
        assert (r["min"], r["max"]) == (min(vals), max(vals))
        assert r["q1"] == pytest.approx(q1)
        assert r["q2"] == pytest.approx(q2)
        assert r["q3"] == pytest.approx(q3)
        assert r["iqr"] == pytest.approx(q3 - q1)


def test_t_test_welch_matches_manual(spark):
    a = [2.1, 2.5, 2.3, 2.7, 2.4]
    b = [1.9, 2.0, 2.2, 1.8]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = t_test_welch(df, F.col("grp") == "a", F.col("grp") == "b", "value").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = np.mean(a), np.mean(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    dof = (va / na + vb / nb) ** 2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["mean_a"] == pytest.approx(ma) and r["mean_b"] == pytest.approx(mb)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    assert r["df"] == pytest.approx(dof, rel=1e-9)


def test_rate_agg_per_hour(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=h), float(v))
        for h, v in [(0, 12.0), (5, 12.0), (30, 48.0)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r["day"].day: r for r in rate_agg(df).collect()}
    assert got[1]["n_events"] == 2 and got[1]["sum_value"] == 24.0
    assert got[1]["rate_per_hour"] == pytest.approx(1.0)
    assert got[2]["rate_per_hour"] == pytest.approx(2.0)


def test_multi_terms_order_and_metric(spark):
    rows = [
        ("s1", "en", 10.0), ("s1", "en", 20.0), ("s1", "de", 5.0),
        ("s2", "en", 7.0), ("s2", "en", 9.0), ("s0", "de", 1.0),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, v double")
    got = multi_terms(df, ["source", "lang"], "v", size=3).collect()
    keys = [(r["source"], r["lang"], r["doc_count"]) for r in got]
    # count desc, then source asc, lang asc
    assert keys == [("s1", "en", 2), ("s2", "en", 2), ("s0", "de", 1)]
    assert got[0]["avg_metric"] == pytest.approx(15.0)


def test_auto_date_histogram_ladder_selection(spark):
    # 10-day span, target 20 buckets -> daily rung (86400): 10-11 buckets;
    # the next smaller rung (12h) would need ~21 > 20
    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(hours=6 * i), 1.0) for i in range(41)]  # 10.25 days
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = auto_date_histogram(df, target_buckets=20).collect()
    assert all(r["interval_sec"] == 86400 for r in got)
    assert len(got) == 11
    assert sum(r["doc_count"] for r in got) == 41
    # python replay of the selection rule
    epochs = [int(dt.datetime.timestamp(base + dt.timedelta(hours=6 * i))) for i in range(41)]
    lo, hi = min(epochs), max(epochs)
    want = next(r for r in AUTO_DH_LADDER if hi // r - lo // r + 1 <= 20)
    assert want == 86400


def test_auto_date_histogram_tiny_span_picks_first_rung(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(seconds=30 * i), 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = auto_date_histogram(df, target_buckets=20).collect()
    assert all(r["interval_sec"] == 60 for r in got)


def test_geo_centroid_bounds_matches_python(spark):
    rows = [(i, f"s{i % 2}") for i in range(40)]
    df = with_coords(
        spark.createDataFrame(rows, "doc_id long, source string")
    )
    got = {r["group"]: r for r in geo_centroid_bounds(df).collect()}
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in df.collect()}
    for g in ("s0", "s1"):
        mine = [(la, lo) for d, (la, lo) in pts.items() if f"s{d % 2}" == g]
        r = got[g]
        assert r["n_docs"] == len(mine)
        assert r["centroid_lat"] == pytest.approx(np.mean([la for la, _ in mine]), rel=1e-12)
        assert r["centroid_lon"] == pytest.approx(np.mean([lo for _, lo in mine]), rel=1e-12)
        assert r["top_left_lat"] == max(la for la, _ in mine)
        assert r["top_left_lon"] == min(lo for _, lo in mine)
        assert r["bottom_right_lat"] == min(la for la, _ in mine)
        assert r["bottom_right_lon"] == max(lo for _, lo in mine)


def test_auto_date_histogram_empty_input(spark):
    # ADVICE r4: empty input must yield an empty result, not a TypeError
    # from None // rung in the ladder selection
    df = spark.createDataFrame([], "ts timestamp, value double")
    out = auto_date_histogram(df, target_buckets=20)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "interval_sec", "bucket_start", "doc_count", "sum_value",
    ]
