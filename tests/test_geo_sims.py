"""Round-4 final wave: geo query family, Jelinek-Mercer / DFR I(n)L2
similarities, and the ES aggregation stragglers (percentile_ranks,
matrix_stats, bucket pipeline trio, adjacency_matrix) — each against a
pure-Python scalar replay of the pinned spec."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators.analytics import (
    adjacency_matrix,
    matrix_stats,
    percentile_ranks,
    terms_bucket_pipeline,
)
from defactonlp_spark.operators.bm25 import claim_terms
from defactonlp_spark.operators.geo import (
    EARTH_RADIUS_KM,
    MERCATOR_LAT_MAX,
    geo_bbox_stats,
    geo_distance_topk,
    geo_grid,
    geotile_grid,
    with_coords,
)
from defactonlp_spark.operators.lm import (
    ctf_stats,
    score_dfr_inl2,
    score_lm_jelinek_mercer,
)
from defactonlp_spark.operators.postings import (
    build_postings,
    corpus_stats,
    term_stats,
)
from tests.oracle_bm25 import build_oracle_index

# ----------------------------------------------------------------- geo --


def py_coords(doc_id: int):
    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    lat = int(hx[:8], 16) / 4294967296.0 * 180.0 - 90.0
    lon = int(hx[8:16], 16) / 4294967296.0 * 360.0 - 180.0
    return lat, lon


def py_haversine(lat1, lon1, lat2, lon2):
    rad = math.pi / 180.0
    p1, p2 = lat1 * rad, lat2 * rad
    dphi, dlam = (lat2 - lat1) * rad, (lon2 - lon1) * rad
    a = (
        math.sin(dphi / 2.0) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlam / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


N_GEO = 400


@pytest.fixture(scope="module")
def geo_docs(spark):
    rows = [(i, f"doc {i}", 100 + (i * 37) % 900) for i in range(N_GEO)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    return with_coords(df.withColumn("source", F.concat(F.lit("s"), F.col("doc_id") % 3)))


def test_with_coords_matches_python_md5(geo_docs):
    got = {r["doc_id"]: (r["lat"], r["lon"]) for r in geo_docs.collect()}
    for d in range(N_GEO):
        lat, lon = py_coords(d)
        assert got[d] == (lat, lon), d  # bit-identical, not approx


def test_geo_distance_topk_matches_scalar_replay(geo_docs):
    qlat, qlon, radius, k = 37.5, -122.0, 6000.0, 15
    want = []
    for d in range(N_GEO):
        lat, lon = py_coords(d)
        dist = py_haversine(lat, lon, qlat, qlon)
        if round(dist, 6) <= radius:
            want.append((d, dist))
    want.sort(key=lambda kv: (round(kv[1], 6), kv[0]))
    want = want[:k]
    got = geo_distance_topk(geo_docs, qlat, qlon, radius, k=k).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        d for d, _ in want
    ]
    for r in got:
        assert r["dist_km"] == pytest.approx(dict(want)[r["doc_id"]], abs=1e-6)


def test_geo_distance_radius_filters(geo_docs):
    # tight radius: every returned doc is inside it
    res = geo_distance_topk(geo_docs, 0.0, 0.0, 500.0, k=50).collect()
    assert all(r["dist_km"] <= 500.0 + 1e-9 for r in res)


@pytest.mark.parametrize(
    "qlat,qlon,radius",
    [
        (55.0, 10.0, 2000.0),   # mid-high latitude, moderate radius
        (-70.0, 170.0, 3000.0), # near-polar center (box caps at 89.9)
        (0.0, 179.0, 1500.0),   # antimeridian-adjacent center
        (80.0, 0.0, 1500.0),    # circle contains the pole region
    ],
)
def test_geo_box_prefilter_never_drops_in_radius_docs(geo_docs, qlat, qlon, radius):
    """The sargable bounding-box pre-filter must be a SUPERSET of the
    radius circle: compare the operator's result set against brute-force
    haversine over all docs (which wraps the antimeridian naturally — the
    operator drops its lon predicate whenever the box would cross a pole
    or +/-180, so no in-circle doc can be lost to the box)."""
    want = set()
    for d in range(N_GEO):
        lat, lon = py_coords(d)
        if round(py_haversine(lat, lon, qlat, qlon), 6) <= radius:
            want.add(d)
    got = {
        r["doc_id"]
        for r in geo_distance_topk(geo_docs, qlat, qlon, radius, k=10**6).collect()
    }
    assert got == want


def test_geo_bbox_stats_matches_replay(geo_docs):
    lat_lo, lat_hi, lon_lo, lon_hi = -30.0, 40.0, -90.0, 60.0
    by = {}
    for r in geo_docs.collect():
        if lat_lo <= r["lat"] <= lat_hi and lon_lo <= r["lon"] <= lon_hi:
            by.setdefault(r["source"], []).append(r["n_chars"])
    got = {
        r["group"]: (r["n_docs"], r["avg_chars"])
        for r in geo_bbox_stats(geo_docs, lat_lo, lat_hi, lon_lo, lon_hi).collect()
    }
    assert set(got) == set(by)
    for s, vals in by.items():
        assert got[s][0] == len(vals)
        assert got[s][1] == pytest.approx(sum(vals) / len(vals))


def test_geo_grid_matches_replay(geo_docs):
    zoom, top = 3, 10
    n, hi = float(1 << zoom), (1 << zoom) - 1
    cells = Counter()
    for d in range(N_GEO):
        lat, lon = py_coords(d)
        cx = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), hi)
        cy = min(max(math.floor((lat + 90.0) / 180.0 * n), 0), hi)
        cells[(cx, cy)] += 1
    want = sorted(cells.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:top]
    got = geo_grid(geo_docs, zoom, top=top).collect()
    got = sorted(got, key=lambda r: r["rank"])
    assert [((r["cell_x"], r["cell_y"]), r["n_docs"]) for r in got] == want


def test_geotile_grid_matches_python_reference(geo_docs):
    zoom = 4
    n, hi = float(1 << zoom), (1 << zoom) - 1
    tiles = Counter()
    for d in range(N_GEO):
        lat, lon = py_coords(d)
        lat = min(max(lat, -MERCATOR_LAT_MAX), MERCATOR_LAT_MAX)
        x = min(max(math.floor((lon + 180.0) / 360.0 * n), 0), hi)
        lr = lat * math.pi / 180.0
        y = math.floor((1.0 - math.asinh(math.tan(lr)) / math.pi) / 2.0 * n)
        y = min(max(y, 0), hi)
        tiles[f"{zoom}/{x}/{y}"] += 1
    got = {r["tile"]: r["n_docs"] for r in geotile_grid(geo_docs, zoom).collect()}
    assert got == dict(tiles)


# -------------------------------------------------------- similarities --

TEXTS = {
    0: "spark shuffles data across the cluster for wide operations",
    1: "posting lists compress deltas with variable byte encoding",
    2: "the query engine scores documents with bm25 ranking",
    3: "data skew makes one partition slow the whole stage down",
    4: "broadcast joins avoid shuffling the small dimension table",
    5: "language models assign probability to token sequences",
    10: "data data data repeated tokens stress term frequency paths",
    20: "identical twin document about data and ranking",
    21: "identical twin document about data and ranking",
}
CLAIMS = {0: "data ranking engine", 1: "compress posting deltas", 2: "zzz data"}
LAM = 0.1


def jm_oracle(texts, claims, lam=LAM, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    ctf = {t: sum(pl.values()) for t, pl in postings.items()}
    T = float(sum(dl.values()))
    ratio = (1.0 - lam) / lam
    out = {}
    for cid, claim in claims.items():
        scored: dict[int, float] = {}
        for t in set(tokenize_one(claim)):
            if t not in ctf:
                continue
            pc = ctf[t] / T
            for d, tf in postings[t].items():
                scored[d] = scored.get(d, 0.0) + math.log1p(ratio * (tf / dl[d]) / pc)
        out[cid] = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


def dfr_oracle(texts, claims, c=1.0, k=5):
    postings, dl, n, avgdl = build_oracle_index(texts)
    inv_ln2 = 1.4426950408889634
    out = {}
    for cid, claim in claims.items():
        scored: dict[int, float] = {}
        for t in set(tokenize_one(claim)):
            if t not in postings:
                continue
            df = len(postings[t])
            inf = math.log((n + 1.0) / (df + 0.5)) * inv_ln2
            for d, tf in postings[t].items():
                tfn = tf * (math.log(1.0 + c * avgdl / dl[d]) * inv_ln2)
                scored[d] = scored.get(d, 0.0) + (1.0 / (tfn + 1.0)) * tfn * inf
        out[cid] = sorted(scored.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:k]
    return out


@pytest.fixture(scope="module")
def sim_corpus(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )
    p = build_postings(docs).persist()
    st = corpus_stats(p).collect()[0]
    yield p, int(st["n_docs"]), float(st["avgdl"]), int(st["total_tokens"])
    p.unpersist()


@pytest.fixture(scope="module")
def sim_claims(spark):
    return spark.createDataFrame(
        [(i, c) for i, c in CLAIMS.items()], "claim_id long, claim string"
    )


def _by_claim(rows):
    got = {}
    for r in sorted(rows, key=lambda r: (r["claim_id"], r["rank"])):
        got.setdefault(r["claim_id"], []).append((r["doc_id"], r["score"]))
    return got


def test_jelinek_mercer_matches_scalar_oracle(spark, sim_corpus, sim_claims):
    p, n_docs, avgdl, total = sim_corpus
    res = score_lm_jelinek_mercer(
        p, ctf_stats(p), claim_terms(sim_claims), total, lam=LAM, k=5
    ).collect()
    got = _by_claim(res)
    want = {c: v for c, v in jm_oracle(TEXTS, CLAIMS).items() if v}
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gd, gs), (wd, ws) in zip(got[cid], pairs):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_jm_identical_docs_tie_on_doc_id(spark, sim_corpus, sim_claims):
    p, _, _, total = sim_corpus
    res = _by_claim(
        score_lm_jelinek_mercer(
            p, ctf_stats(p), claim_terms(sim_claims), total, lam=LAM, k=9
        ).collect()
    )
    for pairs in res.values():
        ds = [d for d, _ in pairs]
        if 20 in ds and 21 in ds:
            assert ds.index(20) + 1 == ds.index(21)  # twin docs adjacent, 20 first


def test_dfr_inl2_matches_scalar_oracle(spark, sim_corpus, sim_claims):
    p, n_docs, avgdl, _ = sim_corpus
    res = score_dfr_inl2(
        p, term_stats(p), claim_terms(sim_claims), n_docs, avgdl, c=1.0, k=5
    ).collect()
    got = _by_claim(res)
    want = {c: v for c, v in dfr_oracle(TEXTS, CLAIMS).items() if v}
    assert {c: [d for d, _ in v] for c, v in got.items()} == {
        c: [d for d, _ in v] for c, v in want.items()
    }
    for cid, pairs in want.items():
        for (gd, gs), (wd, ws) in zip(got[cid], pairs):
            assert gs == pytest.approx(ws, rel=1e-12)


# ----------------------------------------------------------- ES aggs --


@pytest.fixture(scope="module")
def values_df(spark):
    rows = [
        ("a", float(v)) for v in [1, 2, 3, 4, 100]
    ] + [("b", float(v)) for v in [10, 20, 30]] + [("c", 5.0)]
    return spark.createDataFrame(rows, "grp string, value double")


def test_percentile_ranks_exact(values_df):
    got = {
        (r["grp"], r["value"]): r["pct"]
        for r in percentile_ranks(values_df, ["grp"], "value", [3.0, 25.0]).collect()
    }
    assert got[("a", 3.0)] == pytest.approx(60.0)
    assert got[("a", 25.0)] == pytest.approx(80.0)
    assert got[("b", 3.0)] == pytest.approx(0.0)
    assert got[("b", 25.0)] == pytest.approx(2.0 / 3.0 * 100.0)
    assert got[("c", 25.0)] == pytest.approx(100.0)


def test_matrix_stats_matches_numpy_style_replay(spark):
    rows = [
        ("g", 1.0, 2.0, 0.5),
        ("g", 2.0, 4.1, 0.4),
        ("g", 3.0, 5.9, 0.3),
        ("g", 4.0, 8.2, 0.1),
        ("h", 1.0, -1.0, 9.0),
        ("h", 2.0, -2.0, 8.0),
    ]
    df = spark.createDataFrame(rows, "grp string, x double, y double, z double")
    res = matrix_stats(df, ["grp"], ["x", "y", "z"]).collect()
    got = {(r["grp"], r["field_x"], r["field_y"]): r for r in res}
    assert len(got) == 6  # 3 pairs x 2 groups

    def repl(vals_a, vals_b):
        n = len(vals_a)
        ma, mb = sum(vals_a) / n, sum(vals_b) / n
        cov = sum(a * b for a, b in zip(vals_a, vals_b)) / n - ma * mb
        va = sum(a * a for a in vals_a) / n - ma * ma
        vb = sum(b * b for b in vals_b) / n - mb * mb
        return cov, cov / math.sqrt(va * vb)

    gx = [r[1] for r in rows if r[0] == "g"]
    gy = [r[2] for r in rows if r[0] == "g"]
    cov, corr = repl(gx, gy)
    r = got[("g", "x", "y")]
    assert r["count"] == 4
    assert r["covariance"] == pytest.approx(cov)
    assert r["correlation"] == pytest.approx(corr)
    assert got[("h", "x", "y")]["correlation"] == pytest.approx(-1.0)
    assert got[("h", "x", "z")]["correlation"] == pytest.approx(-1.0)


def test_terms_bucket_pipeline(values_df):
    # avgs: a = 22.0, b = 20.0, c = 5.0; selector min_avg=10 keeps a, b
    got = terms_bucket_pipeline(values_df, "grp", "value", min_avg=10.0, size=10).collect()
    assert [(r["bucket"], r["n_rows"]) for r in got] == [("a", 5), ("b", 3)]
    assert got[0]["avg_value"] == pytest.approx(22.0)
    # bucket_sort size cut
    one = terms_bucket_pipeline(values_df, "grp", "value", min_avg=0.0, size=1).collect()
    assert [r["bucket"] for r in one] == ["a"]


def test_adjacency_matrix_matches_replay(spark):
    docs = spark.createDataFrame(
        [
            (0, "data query system"),
            (1, "data only here"),
            (2, "query and system together"),
            (3, "nothing relevant"),
            (4, "data query again"),
        ],
        "doc_id long, text string",
    )
    res = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix(
            docs, {"a": "data", "b": "query", "c": "system"}
        ).collect()
    }
    assert res == {"a": 3, "b": 3, "c": 2, "a&b": 2, "a&c": 1, "b&c": 2}


def test_geo_distance_rings_matches_replay(geo_docs):
    from defactonlp_spark.operators.geo import geo_distance_rings

    qlat, qlon, edges = 37.5, -122.0, [3000.0, 9000.0]
    rings = {}
    for r in geo_docs.collect():
        d = round(py_haversine(r["lat"], r["lon"], qlat, qlon), 6)
        if d < edges[0]:
            key = f"*-{edges[0]}"
        elif d < edges[1]:
            key = f"{edges[0]}-{edges[1]}"
        else:
            key = f"{edges[1]}-*"
        rings.setdefault(key, []).append(r["n_chars"])
    got = {
        r["ring"]: r for r in geo_distance_rings(geo_docs, qlat, qlon, edges).collect()
    }
    assert set(got) == set(rings)
    for key, vals in rings.items():
        assert got[key]["n_docs"] == len(vals)
        assert got[key]["avg_chars"] == pytest.approx(sum(vals) / len(vals))
    assert got[f"*-{edges[0]}"]["from_km"] == 0.0
    assert got[f"{edges[1]}-*"]["to_km"] is None


def test_weighted_avg_skips_nulls(spark):
    from defactonlp_spark.operators.analytics import weighted_avg

    rows = [
        ("g", 1.0, 2.0),
        ("g", 3.0, 6.0),
        ("g", None, 5.0),   # null value skipped
        ("g", 9.0, None),   # null weight skipped
        ("h", 4.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "grp string, v double, w double")
    got = {r["grp"]: r for r in weighted_avg(df, ["grp"], "v", "w").collect()}
    assert got["g"]["n_rows"] == 2
    assert got["g"]["weighted_avg"] == pytest.approx((1 * 2 + 3 * 6) / 8.0)
    assert got["h"]["weighted_avg"] == pytest.approx(4.0)


def test_bigram_completion_ranks_by_frequency(spark):
    from defactonlp_spark.operators.analytics import bigram_completion

    docs = spark.createDataFrame(
        [
            (0, "merge table fast merge table slow merge tree"),
            (1, "merge table wins merge tree loses"),
            (2, "data spark here"),
        ],
        "doc_id long, text string",
    )
    pref = spark.createDataFrame(
        [(0, "merge", "t"), (1, "data", "s"), (2, "merge", "zz")],
        "sugg_id long, first string, prefix string",
    )
    res = bigram_completion(docs, pref, k=2).collect()
    by = {}
    for r in sorted(res, key=lambda r: (r["sugg_id"], r["rank"])):
        by.setdefault(r["sugg_id"], []).append((r["completion"], r["n_occurrences"]))
    assert by[0] == [("merge table", 3), ("merge tree", 2)]
    assert by[1] == [("data spark", 1)]
    assert 2 not in by  # no bigram matches the 'zz' prefix -> NO rows
