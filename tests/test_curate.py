"""Fused curation pass (plans/curate.py): column parity with the
standalone operators and gate semantics."""

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.functions.pii import redact_pii
from defactonlp_spark.functions.textstats import quality_features, repetition_stats
from defactonlp_spark.plans.curate import CurationGates, curation_pass

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),   # repetition
    (2, "ok"),                                                  # too short
    (3, None),                                                  # NULL text
    (4, "Contact me at a.user@mail.example.org or 10.0.0.1 for the "
        "complete quarterly report and the updated revenue projections"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_columns_match_standalone_operators(spark, docs):
    fused = curation_pass(docs).toPandas().set_index("doc_id").sort_index()
    q = quality_features(docs).toPandas().set_index("doc_id").sort_index()
    r = repetition_stats(docs).toPandas().set_index("doc_id").sort_index()
    p = redact_pii(docs).toPandas().set_index("doc_id").sort_index()
    for c in ("n_tokens", "n_chars", "quality"):
        assert fused[c].astype(object).equals(q[c].astype(object)), c
    for c in ("dup_line_frac", "top_bigram_frac", "dup_5gram_frac"):
        assert fused[c].astype(object).equals(r[c].astype(object)), c
    for c in ("n_email", "n_ipv4", "n_phone"):
        assert fused[c].astype(object).equals(p[c].astype(object)), c


def test_gate_semantics(spark, docs):
    rows = {r["doc_id"]: r for r in curation_pass(docs).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False  # top_bigram_frac = 1.0 > cap
    assert rows[2]["keep"] is False  # n_tokens < 5
    assert rows[3]["keep"] is False  # NULL text never keeps
    assert rows[4]["keep"] is True   # PII present but max_pii unset
    strict = {
        r["doc_id"]: r["keep"]
        for r in curation_pass(docs, CurationGates(max_pii=0)).collect()
    }
    assert strict[4] is False and strict[0] is True


def test_single_python_stage(spark, docs):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        curation_pass(docs).explain("formatted")
    plan = buf.getvalue()
    # formatted explain prints each node twice (tree line + detail header):
    # exactly ONE MapInPandas node = 2 mentions
    assert plan.count("MapInPandas") == 2
    assert "Join" not in plan
