"""PII redaction (functions/pii.py) and URL analytics (functions/urls.py):
pinned values, NULL propagation, and Spark-vs-DuckDB dialect parity of the
shared regex patterns."""

import duckdb
import pytest

from defactonlp_spark.functions.pii import PII_PATTERNS, pii_oracle_sql, redact_pii
from defactonlp_spark.functions.urls import domain_rollup, url_features

PII_DOCS = [
    (0, "mail bob.smith+x@mail.example.org now"),
    (1, "server at 10.0.255.7 and 192.168.1.1, call 555-123-4567"),
    (2, "dotted phone 555.123.4567 vs ip 1.2.3.4"),
    (3, "no pii here at all"),
    (4, "e1@a.io e2@b.co 555 123 4567"),
    (5, None),
    (6, "phone-in-email 555.123.4567@x.com stays an email"),
]


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_redact_pinned(spark, pii_docs):
    rows = {r["doc_id"]: r for r in redact_pii(pii_docs).collect()}
    assert rows[0]["n_email"] == 1 and "<EMAIL>" in rows[0]["clean_text"]
    assert "bob" not in rows[0]["clean_text"]
    assert rows[1]["n_ipv4"] == 2 and rows[1]["n_phone"] == 1
    assert rows[1]["clean_text"] == "server at <IP> and <IP>, call <PHONE>"
    # dotted phone is NOT an ipv4 (last quad would need 4 digits)
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_phone"] == 1
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == rows[3]["n_phone"] == 0
    assert rows[3]["clean_text"] == "no pii here at all"
    assert rows[4]["n_email"] == 2 and rows[4]["n_phone"] == 1
    assert rows[5]["n_email"] is None and rows[5]["clean_text"] is None
    # chain order: the email eats the phone-looking local part first
    assert rows[6]["n_email"] == 1 and rows[6]["n_phone"] == 0


def test_duckdb_twin_parity(spark, pii_docs):
    got = (
        redact_pii(pii_docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(object)
    )
    con = duckdb.connect()
    con.register("pii_docs", pii_docs.toPandas())
    want = (
        con.execute(pii_oracle_sql("pii_docs") + " ORDER BY doc_id")
        .df()
        .astype(object)
    )
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        for g, w in zip(got[c], want[c]):
            assert (g is None and w is None) or (
                g != g and w != w
            ) or g == w, (c, g, w)


URLS = [
    (0, "https://www.example.com/a/b/c?q=1"),
    (1, "http://sub.host.example.co.uk:8080/x"),
    (2, "https://example.org"),
    (3, "http://localhost/p"),
    (4, None),
    (5, "ftp://files.example.net/pub/file.txt"),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_url_features_pinned(spark, urls_df):
    rows = {r["doc_id"]: r for r in url_features(urls_df).collect()}
    r0 = rows[0]
    assert (r0["scheme"], r0["host"], r0["port"]) == ("https", "www.example.com", None)
    assert r0["path"] == "/a/b/c" and r0["query"] == "q=1"
    assert r0["registrable_domain"] == "example.com"
    assert r0["path_depth"] == 3 and r0["is_https"] is True
    r1 = rows[1]
    assert r1["port"] == 8080 and r1["host"] == "sub.host.example.co.uk"
    # naive last-2-label rule (PSL swap-in documented in the module)
    assert r1["registrable_domain"] == "co.uk"
    r2 = rows[2]
    assert r2["path"] is None and r2["path_depth"] == 0
    assert rows[3]["registrable_domain"] is None  # single-label host
    assert rows[4]["scheme"] is None and rows[4]["path_depth"] is None
    assert rows[5]["scheme"] == "ftp" and rows[5]["is_https"] is False


def test_domain_rollup(spark, urls_df):
    rows = {
        r["registrable_domain"]: r for r in domain_rollup(urls_df).collect()
    }
    assert set(rows) == {"example.com", "co.uk", "example.org", "example.net"}
    assert rows["example.com"]["n_pages"] == 1
    assert rows["example.com"]["https_frac"] == 1.0
    assert rows["co.uk"]["https_frac"] == 0.0
    assert rows["example.net"]["mean_path_depth"] == 2.0
