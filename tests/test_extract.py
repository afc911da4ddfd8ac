"""B1 extractor: byte-identical per-url extraction against golden fixtures."""

import hashlib
import json
import os

import pandas as pd
import pytest

from defactonlp_spark.functions.extract import extract_text_one, with_extracted_text
from defactonlp_spark.sources.fixtures import gen_webpages, make_html

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract", "golden.json")


def test_scalar_basics():
    assert extract_text_one(b"<html><body><p>hello world</p></body></html>") == "hello world"
    assert extract_text_one(b"<body>a &amp; b &lt;c&gt;</body>") == "a & b <c>"
    assert extract_text_one(b"<head><title>nope</title></head><body>x</body>") == "x"
    assert extract_text_one(b"<script>var x=1;</script>yes<style>.a{}</style>") == "yes"
    assert extract_text_one(b"  <p>a</p>\n\t<p>b</p> ") == "a b"
    assert extract_text_one(b"") == ""
    assert extract_text_one(None) is None
    assert extract_text_one(b"\xff\xfe broken") is None  # not utf-8 -> NULL
    # unicode survives byte-exactly
    s = "café naïve 漢字"
    assert extract_text_one(f"<body>{s}</body>".encode()) == s


def test_inverts_fixture_wrapper():
    texts = ["the merge join", "a & b < c > d", "café Σigma", ""]
    for i, t in enumerate(texts):
        assert extract_text_one(make_html(i, t)) == t


def test_golden_bytes():
    """50 representative pages frozen as (url, sha256(text)). Regenerating the
    fixture must reproduce EXACT bytes — the extraction invariant."""
    pages = gen_webpages(n=50, seed=4242, dup_frac=0.0)
    if not os.path.exists(GOLDEN):  # first run freezes the goldens
        rows = [
            {"url": r.url, "sha256": hashlib.sha256(r.text.encode()).hexdigest()}
            for r in pages.itertuples(index=False)
        ]
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(rows, f, indent=1)
    with open(GOLDEN) as f:
        golden = {r["url"]: r["sha256"] for r in json.load(f)}
    assert len(golden) == 50
    for r in pages.itertuples(index=False):
        extracted = extract_text_one(r.html)
        assert hashlib.sha256(extracted.encode()).hexdigest() == golden[r.url], r.url


def test_spark_udf_matches_scalar(spark):
    pdf = gen_webpages(n=40, seed=7, dup_frac=0.0)
    df = spark.createDataFrame(pdf[["url", "html", "text"]])
    out = with_extracted_text(df, "html", "extracted").select("url", "text", "extracted").toPandas()
    pd.testing.assert_series_equal(
        out["extracted"], out["text"], check_names=False
    )
