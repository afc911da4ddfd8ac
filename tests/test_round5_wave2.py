"""Round-5 wave 2: URL canonicalization / blocklist gate / stratified
sampling / span_first. Each test pins the rule the operator exists for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.functions.urls import canonical_dup_groups, url_canonical_col
from defactonlp_spark.operators.curation import stratified_sample, url_blocklist_filter


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(url_canonical_col(F.col("url")).alias("c")).collect()]


def test_url_canonical_rules(spark):
    # one rule per assertion: fragment, prefix-only lowercasing, default
    # port, www, trailing slash, tracking params + param sort, kept port
    got = _canon(spark, [
        "https://a.example.com/x#frag",
        "HTTPS://A.Example.COM/x",
        "https://a.example.com:443/x",
        "http://a.example.com:80/x",
        "https://www.a.example.com/x",
        "https://a.example.com/x/",
        "https://a.example.com/x?utm_source=f&b=2&a=1",
        "https://a.example.com:8080/x",
        "https://a.example.com/X",         # path case PRESERVED
        "https://a.example.com/",          # root path == no path
    ])
    assert got[:3] == ["https://a.example.com/x"] * 3
    assert got[3] == "http://a.example.com/x"   # :80 dropped, scheme kept
    assert got[4:6] == ["https://a.example.com/x"] * 2
    assert got[6] == "https://a.example.com/x?a=1&b=2"
    assert got[7] == "https://a.example.com:8080/x"
    assert got[8] == "https://a.example.com/X"
    assert got[9] == "https://a.example.com"


def test_url_canonical_null_and_schemeless(spark):
    df = spark.createDataFrame([(None,), ("no-scheme/path",)], "url string")
    got = df.select(url_canonical_col(F.col("url")).alias("c")).collect()
    assert got[0].c is None and got[1].c is None


def test_canonical_dup_groups_keep_min(spark):
    df = spark.createDataFrame(
        [(0, "https://a.com/x"), (5, "https://WWW.A.com/x#f"),
         (3, "https://a.com/x?utm_source=z"), (9, "https://b.com/y")],
        "doc_id long, url string",
    )
    res = canonical_dup_groups(df).collect()
    assert len(res) == 1
    assert res[0].canonical_url == "https://a.com/x"
    assert res[0].n_variants == 3 and res[0].keep_id == 0


def test_blocklist_domain_subdomain_prefix_firstmatch(spark):
    df = spark.createDataFrame(
        [(0, "https://bad.com/x"), (1, "https://sub.bad.com:8080/x"),
         (2, "https://notbad.com/x"), (3, "https://ok.com/spam/1?utm_source=z"),
         (4, "https://ok.com/fine")],
        "doc_id long, url string",
    )
    rules = [("r1", "domain", "bad.com"), ("r0", "prefix", "https://ok.com/spam")]
    res = {r.doc_id: r for r in url_blocklist_filter(df, rules).collect()}
    assert res[0].rule_id == "r1" and res[0].blocked
    assert res[1].rule_id == "r1"          # subdomain + non-default port
    assert res[2].rule_id is None and not res[2].blocked  # no substring match
    assert res[3].rule_id == "r0"          # prefix matches CANONICAL url
    assert res[4].rule_id is None
    # first-match-wins: a url hitting both rules reports min(rule_id)
    both = spark.createDataFrame([(9, "https://bad.com/spam")], "doc_id long, url string")
    r = url_blocklist_filter(
        both, [("r1", "domain", "bad.com"), ("r0", "prefix", "https://bad.com/spam")]
    ).collect()[0]
    assert r.rule_id == "r0"


def test_stratified_sample_rates_and_default_drop(spark):
    docs = spark.createDataFrame(
        [(i, "keep_all" if i < 100 else ("half" if i < 200 else "unlisted"))
         for i in range(300)],
        "doc_id long, source string",
    )
    res = stratified_sample(docs, {"keep_all": 1000, "half": 500})
    by_src = {r.source: r.n for r in res.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["keep_all"] == 100                    # permille 1000 keeps all
    assert 20 <= by_src.get("half", 0) <= 80            # ~50 of 100
    assert "unlisted" not in by_src                     # absent stratum -> dropped
    # determinism: identical on re-run
    again = {r.doc_id for r in stratified_sample(docs, {"keep_all": 1000, "half": 500}).collect()}
    assert again == {r.doc_id for r in res.collect()}
    with pytest.raises(ValueError):
        stratified_sample(docs, {"keep_all": 1001})


def test_span_first_subset_of_phrase(spark):
    from defactonlp_spark.operators.phrase import (
        phrase_positions,
        phrase_matches,
        span_first_matches,
    )
    from defactonlp_spark.functions.tokenize import tokenize_tokens

    docs = spark.createDataFrame(
        [(0, "alpha beta early words " + "pad " * 40),
         (1, "pad " * 40 + " alpha beta late"),
         (2, "alpha gamma beta never adjacent")],
        "doc_id long, text string",
    )
    tokens = tokenize_tokens(docs)
    phrases = spark.createDataFrame([(0, "alpha beta")], "claim_id long, phrase string")
    qpos = phrase_positions(phrases)
    all_m = {(r.claim_id, r.doc_id) for r in phrase_matches(tokens, qpos).collect()}
    first = {(r.claim_id, r.doc_id) for r in span_first_matches(tokens, qpos, end=10).collect()}
    assert all_m == {(0, 0), (0, 1)}
    assert first == {(0, 0)}              # doc 1 matches but past position 10
    assert first <= all_m                 # span_first is always a subset
    # boundary: end exactly at span end (anchor 0 + plen 2 <= 2) matches
    exact = {(r.claim_id, r.doc_id) for r in span_first_matches(tokens, qpos, end=2).collect()}
    assert exact == {(0, 0)}
    assert span_first_matches(tokens, qpos, end=1).count() == 0


def test_blocklist_join_parity(spark):
    # the rule-volume suffix-join variant must be bit-identical to the
    # literal-scan variant on every tricky case: subdomain, exact host,
    # non-default port, prefix-with-utm-noise, multi-rule overlap, no match
    from defactonlp_spark.operators.curation import url_blocklist_join

    df = spark.createDataFrame(
        [(0, "https://bad.com/x"), (1, "https://sub.deep.bad.com:8080/x"),
         (2, "https://notbad.com/x"), (3, "https://ok.com/spam/1?utm_source=z"),
         (4, "https://ok.com/fine"), (5, "https://bad.com/spam"),
         (6, "HTTP://WWW.Bad.COM:80/y#f")],
        "doc_id long, url string",
    )
    rules = [
        ("r2", "domain", "bad.com"),
        ("r1", "prefix", "https://ok.com/spam"),
        ("r0", "prefix", "https://bad.com/spam"),
    ]
    lit_res = {r.doc_id: (r.canonical_url, r.rule_id, r.blocked)
               for r in url_blocklist_filter(df, rules).collect()}
    join_res = {r.doc_id: (r.canonical_url, r.rule_id, r.blocked)
                for r in url_blocklist_join(df, rules).collect()}
    assert lit_res == join_res
    assert lit_res[5][1] == "r0"      # overlap: min rule wins in both
    assert lit_res[1][1] == "r2"      # deep subdomain via suffix chain
    assert lit_res[6][1] == "r2"      # www + default port canonicalized
    # domain-only and prefix-only rule lists also agree
    for sub in ([rules[0]], rules[1:]):
        a = {r.doc_id: r.rule_id for r in url_blocklist_filter(df, sub).collect()}
        b = {r.doc_id: r.rule_id for r in url_blocklist_join(df, sub).collect()}
        assert a == b
    # empty rule list: nothing blocked, schema intact
    z = url_blocklist_join(df, []).collect()
    assert all(not r.blocked and r.rule_id is None for r in z)
