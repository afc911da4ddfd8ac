"""Collocation PMI, TF-IDF keywords (operators/analytics.py) and chunk
dedup (operators/dedup.py::chunk_dedup) vs scalar oracles."""

import math
from collections import Counter

import pytest

from defactonlp_spark.functions.tokenize import tokenize_one
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.analytics import bigram_pmi, doc_keywords
from defactonlp_spark.operators.dedup import chunk_dedup

DOCS = [
    (0, "new york is big and new york is old"),
    (1, "san francisco and new york"),
    (2, "york new is not a phrase but new york is"),
    (3, "big and old and big and old"),
]


def _scalar_pmi(min_count, top):
    uni: Counter = Counter()
    big: Counter = Counter()
    for _, text in DOCS:
        toks = tokenize_one(text)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    t = sum(uni.values())
    t2 = sum(big.values())
    rows = []
    for (w1, w2), c12 in big.items():
        if c12 < min_count:
            continue
        pmi = round(math.log(((c12 * t) * t) / ((t2 * uni[w1]) * uni[w2])), 6)
        rows.append((w1, w2, c12, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top]


def test_bigram_pmi(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["w1"], r["w2"], r["c12"], r["pmi"])
        for r in bigram_pmi(docs, min_count=2, top=10).collect()
    ]
    want = _scalar_pmi(2, 10)
    assert got == want
    # 'new york' (4 occurrences) must be present and beat 'is big'-style
    assert ("new", "york") in {(a, b) for a, b, _, _ in got}


def test_doc_keywords(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = P.build_postings(docs)
    n_docs = 4
    got = {}
    for r in doc_keywords(p, n_docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["weight"]))
    # scalar: weight = tf * ln(N/df)
    postings = {}
    for did, text in DOCS:
        for t, tf in Counter(tokenize_one(text)).items():
            postings.setdefault(t, {})[did] = tf
    for did, text in DOCS:
        ws = [
            (t, round(tf * math.log(n_docs / len(postings[t])), 6))
            for t, tf in Counter(tokenize_one(text)).items()
        ]
        ws.sort(key=lambda kv: (-kv[1], kv[0]))
        want = [(i + 1, t, w) for i, (t, w) in enumerate(ws[:2])]
        assert sorted(got[did]) == want, did


def test_chunk_dedup(spark):
    # chunk_tokens=3: doc 10 = [a b c][a b c][d e f]; doc 11 = [a b c][x y z]
    docs = spark.createDataFrame(
        [
            (10, "a b c a b c d e f"),
            (11, "a b c x y z"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_tokens=3).collect()}
    assert rows[10]["n_chunks"] == 3
    # first [a b c] kept (smallest doc_id, sent_idx), second dropped
    assert rows[10]["n_kept"] == 2 and rows[10]["n_dropped"] == 1
    assert rows[11]["n_chunks"] == 2
    # doc 11's [a b c] loses to doc 10's first chunk
    assert rows[11]["n_kept"] == 1 and rows[11]["n_dropped"] == 1


def test_more_like_this(spark):
    from defactonlp_spark.operators.analytics import more_like_this

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = P.build_postings(docs)
    n_docs, avgdl = P.corpus_stats(p).collect()[0][:2]
    seeds = spark.createDataFrame([(0,), (3,)], "doc_id long")
    got = more_like_this(
        p, P.term_stats(p), seeds, int(n_docs), float(avgdl),
        like_terms=3, k=3,
    ).collect()
    by_seed: dict = {}
    for r in got:
        by_seed.setdefault(r["seed_id"], []).append((r["rank"], r["doc_id"]))
    # seed never appears in its own results
    for sid, rows in by_seed.items():
        assert sid not in {d for _, d in rows}
        assert [rk for rk, _ in sorted(rows)] == list(range(1, len(rows) + 1))
    # scalar oracle: top-3 corpus-idf keywords of seed 0, then bm25
    import math
    from tests.oracle_bm25 import bm25_topk_oracle, build_oracle_index

    texts = dict(DOCS)
    postings, dl, n, _ = build_oracle_index(texts)
    kws = sorted(
        (
            (t, round(tf * math.log(n / len(postings[t])), 6))
            for t, tf in Counter(tokenize_one(texts[0])).items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    want = bm25_topk_oracle(texts, {0: " ".join(t for t, _ in kws)}, k=4)[0]
    want_ids = [d for d, _ in want if d != 0][:3]
    assert [d for _, d in sorted(by_seed[0])] == want_ids


def test_facet_counts(spark):
    from defactonlp_spark.operators.analytics import facet_counts

    matches = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 11)], "claim_id long, doc_id long"
    )
    attrs = spark.createDataFrame(
        [(10, "en", "a"), (11, "de", "a"), (12, "en", "b")],
        "doc_id long, lang string, source string",
    )
    got = {
        (r["claim_id"], r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(matches, attrs, ["lang", "source"]).collect()
    }
    assert got == {
        (1, "lang", "en"): 2,
        (1, "lang", "de"): 1,
        (1, "source", "a"): 2,
        (1, "source", "b"): 1,
        (2, "lang", "de"): 1,
        (2, "source", "a"): 1,
    }


def test_query_more_like_this_index_path(spark, tmp_path):
    from defactonlp_spark.config import EngineConfig
    from defactonlp_spark.operators.analytics import more_like_this
    from defactonlp_spark.plans.build import IndexBuild, IndexReader
    from defactonlp_spark.plans.query import query_more_like_this

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = P.build_postings(docs)
    n_docs, avgdl = P.corpus_stats(p).collect()[0][:2]
    seeds = spark.createDataFrame([(0,), (3,)], "doc_id long")
    adhoc = more_like_this(
        p, P.term_stats(p), seeds, int(n_docs), float(avgdl),
        like_terms=3, k=3, rank_dp=9,
    ).collect()
    cfg = EngineConfig(n_buckets=4)
    IndexBuild(str(tmp_path / "idx"), cfg, build_id="m").run(
        spark, docs, input_snapshot="m"
    )
    r = IndexReader(spark, str(tmp_path / "idx"))
    idx = query_more_like_this(
        r, seeds, like_terms=3, k=3, cfg=cfg, rank_dp=9
    ).collect()
    key = lambda rows: sorted((x["seed_id"], x["rank"], x["doc_id"]) for x in rows)
    assert key(adhoc) == key(idx)


def test_rrf_fuse(spark):
    from defactonlp_spark.operators.analytics import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 101), (1, 3, 102)], "claim_id long, rank int, doc_id long"
    )
    b = spark.createDataFrame(
        [(1, 1, 102), (1, 2, 100), (2, 1, 200)], "claim_id long, rank int, doc_id long"
    )
    got = {
        (r["claim_id"], r["doc_id"]): (r["rank"], r["rrf"])
        for r in rrf_fuse([a, b], k=3, rrf_k=60).collect()
    }
    # doc 100: 1/61 + 1/62 ; doc 102: 1/63 + 1/61 ; doc 101: 1/62
    s100 = round(1 / 61 + 1 / 62, 9)
    s102 = round(1 / 63 + 1 / 61, 9)
    s101 = round(1 / 62, 9)
    assert got[(1, 100)] == (1, s100)
    assert got[(1, 102)] == (2, s102)
    assert got[(1, 101)] == (3, s101)
    assert got[(2, 200)] == (1, round(1 / 61, 9))
    assert s100 > s102 > s101


def test_suggest_corrections(spark):
    from defactonlp_spark.operators.postings import suggest_corrections, term_stats

    docs = spark.createDataFrame(
        [(0, "merge merge join batch"), (1, "merge stream window"), (2, "marge")],
        "doc_id long, text string",
    )
    p = P.build_postings(docs)
    q = spark.createDataFrame(
        [(1, "mrge"), (1, "join"), (2, "windoww"), (3, "zzzzzzzz")],
        "claim_id long, term string",
    )
    got = {
        (r["claim_id"], r["term"]): (r["suggestion"], r["dist"])
        for r in suggest_corrections(term_stats(p), q, max_dist=2, topn=1).collect()
    }
    # 'mrge' -> distance-1 candidates 'merge' (df 2) and 'marge' (df 1):
    # distance ties break on df desc
    assert got[(1, "mrge")] == ("merge", 1)
    # in-vocabulary terms are never "corrected"
    assert (1, "join") not in got
    assert got[(2, "windoww")] == ("window", 1)
    # nothing within distance 2
    assert (3, "zzzzzzzz") not in got


def test_s_stem(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from defactonlp_spark.functions.stem import s_stem

    cases = {
        "queries": "query", "stories": "story", "tables": "table",
        "glasses": "glasse",    # -es rule; the -ss guard protects 'glass', not '-sses'
        "corpus": "corpus",     # -us guard
        "goes": "goes",         # -oes guard (terminal: no fall-through to -s)
        "trees": "trees",       # -ees guard (terminal)
        "cats": "cat", "is": "i", "a": "a", "merge": "merge",
        "ies": "y", "glass": "glass",
    }
    df = spark.createDataFrame(pd.DataFrame({"w": list(cases)}))
    got = {r["w"]: r["s"] for r in df.select("w", s_stem(F.col("w")).alias("s")).collect()}
    assert got == cases


def test_s_stem_matches_duckdb_case(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F
    from defactonlp_spark.functions.stem import S_STEM_SQL_CASE, s_stem

    words = ["queries", "stories", "tables", "glasses", "corpus", "goes",
             "trees", "cats", "is", "a", "merge", "ies", "aies", "eies",
             "aes", "s", "ss", "us", "es"]
    df = spark.createDataFrame(pd.DataFrame({"w": words}))
    got = df.select("w", s_stem(F.col("w")).alias("s")).toPandas().sort_values("w")
    con = duckdb.connect()
    con.register("words", pd.DataFrame({"w": words}))
    want = con.execute(
        f"SELECT w, {S_STEM_SQL_CASE.format(t='w')} AS s FROM words ORDER BY w"
    ).df()
    assert list(got["s"]) == list(want["s"])


def test_significant_terms_scalar_replay(spark):
    """JLH scoring replay: planted foreground docs share a marker term that
    is rare in the background — it must rank first; query terms excluded."""
    from collections import Counter

    from defactonlp_spark.functions.tokenize import tokenize_one
    from defactonlp_spark.operators.analytics import significant_terms
    from defactonlp_spark.operators.bm25 import claim_terms
    from defactonlp_spark.operators.postings import build_postings, term_stats

    texts = {}
    for i in range(30):
        texts[i] = f"common filler words number{i % 7} appear everywhere"
    # foreground docs 0-4: add the query term + a rare marker
    for i in range(5):
        texts[i] = texts[i] + " target marker signal"
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    p = build_postings(docs).persist()
    claims = spark.createDataFrame([(0, "target")], "claim_id long, claim string")
    qt = claim_terms(claims)
    fg = spark.createDataFrame([(0, d) for d in range(5)], "claim_id long, doc_id long")
    res = significant_terms(p, term_stats(p), fg, n_docs=30, k=5, exclude=qt).collect()
    got = [(r["rank"], r["term"], r["fg_count"], r["bg_count"], r["jlh"]) for r in
           sorted(res, key=lambda r: r["rank"])]

    # scalar replay
    df = Counter()
    for t in texts.values():
        for term in set(tokenize_one(t)):
            df[term] += 1
    fg_counts = Counter()
    for d in range(5):
        for term in set(tokenize_one(texts[d])):
            fg_counts[term] += 1
    rows = []
    for term, c in fg_counts.items():
        if c < 2 or term == "target":
            continue
        fgp, bgp = c / 5.0, df[term] / 30.0
        if fgp > bgp:
            rows.append((term, c, df[term], round((fgp - bgp) * (fgp / bgp), 6)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    want = [(i + 1, t, c, b, j) for i, (t, c, b, j) in enumerate(rows[:5])]
    p.unpersist()
    assert got == want
    assert got[0][1] in ("marker", "signal")  # the planted rare markers lead


def test_value_histogram_bins_pinned(spark):
    from defactonlp_spark.operators.analytics import value_histogram

    rows = [("a", -0.1), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("b", 25.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        (r["event_type"], r["bin"]): (r["lo"], r["n"])
        for r in value_histogram(df, width=10.0, group_col="event_type").collect()
    }
    # floor(-0.1/10) = -1 (negative values fall in the -1 bucket, ES semantics)
    assert got == {
        ("a", -1): (-10.0, 1),
        ("a", 0): (0.0, 2),
        ("a", 1): (10.0, 1),
        ("b", 2): (20.0, 1),
    }


def test_ranking_rbo_pinned_cases(spark):
    from defactonlp_spark.operators.analytics import ranking_rbo

    K, P = 5, 0.9
    ident = [(0, r, 100 + r) for r in range(1, K + 1)]
    a = spark.createDataFrame(ident, "claim_id long, rank int, doc_id long")
    r = ranking_rbo(a, a, k=K, p=P).collect()[0]
    assert r["overlap_k"] == K
    assert r["rbo"] == round(sum((1 - P) * P ** (d - 1) for d in range(1, K + 1)), 6)

    # disjoint rankings: no common doc -> the claim still gets a row with
    # rbo = 0.0 (ADVICE r3: dropping it biased downstream mean-RBO upward)
    b = spark.createDataFrame(
        [(0, r, 200 + r) for r in range(1, K + 1)], "claim_id long, rank int, doc_id long"
    )
    zr = ranking_rbo(a, b, k=K, p=P).collect()
    assert [(r["claim_id"], r["overlap_k"], r["rbo"]) for r in zr] == [(0, 0, 0.0)]

    # scalar replay on a partial overlap (docs 101,102 swapped + one swap-out)
    b2 = spark.createDataFrame(
        [(0, 1, 102), (0, 2, 101), (0, 3, 999), (0, 4, 104), (0, 5, 105)],
        "claim_id long, rank int, doc_id long",
    )
    got = ranking_rbo(a, b2, k=K, p=P).collect()[0]
    ar = {100 + r: r for r in range(1, K + 1)}
    br = {102: 1, 101: 2, 999: 3, 104: 4, 105: 5}
    rbo = 0.0
    for d in range(1, K + 1):
        x_d = len({doc for doc, r_ in ar.items() if r_ <= d}
                  & {doc for doc, r_ in br.items() if r_ <= d})
        rbo += (1 - P) * P ** (d - 1) * x_d / d
    assert got["overlap_k"] == 4
    import pytest as _pt
    assert got["rbo"] == _pt.approx(round(rbo, 6), abs=1e-6)
