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


def test_training_mix_two_phase_equals_single_window(spark):
    """The bucketed two-phase prefix sum must pick EXACTLY the docs a single
    global per-source window would, and the choice must be partition-layout
    independent (repartitioned input -> same keep set)."""
    import hashlib

    import pandas as pd

    from defactonlp_spark.operators.curation import mix_stats, training_mix

    rng_rows = []
    for i in range(400):
        src = f"s{i % 3}"
        rng_rows.append((i, src, "tok " * ((i * 7) % 29 + 1)))
    docs = spark.createDataFrame(rng_rows, "doc_id long, source string, text string")
    budgets = {"s0": 500, "s1": 0, "s2": 100000}

    got = {
        r["doc_id"]: (r["keep"], r["n_tokens"])
        for r in training_mix(docs, budgets, n_buckets=16).collect()
    }
    assert len(got) == 400

    # scalar oracle: sort by (md5(source:id), id) within source, cumsum
    pdf = pd.DataFrame(rng_rows, columns=["doc_id", "source", "text"])
    pdf["n_tokens"] = pdf["text"].str.split().str.len()
    pdf["k"] = [
        hashlib.md5(f"{s}:{i}".encode()).hexdigest()
        for s, i in zip(pdf["source"], pdf["doc_id"])
    ]
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values(["k", "doc_id"])
        cum = 0
        for _, row in grp.iterrows():
            expect_keep = cum < budgets[src]
            cum += row["n_tokens"]
            assert got[row["doc_id"]] == (expect_keep, row["n_tokens"]), (
                src,
                row["doc_id"],
            )

    # partition-layout independence
    got2 = {
        r["doc_id"]: r["keep"]
        for r in training_mix(docs.repartition(7, "text"), budgets, n_buckets=4).collect()
    }
    assert got2 == {k: v[0] for k, v in got.items()}

    # budget overshoot bounded by one document; s1 keeps nothing; s2 keeps all
    stats = {r["source"]: r for r in mix_stats(docs, budgets).collect()}
    assert stats["s1"]["kept_docs"] == 0
    assert stats["s2"]["kept_docs"] == stats["s2"]["n_docs"]
    assert 500 <= stats["s0"]["kept_tokens"] <= 500 + 29


def test_training_mix_unbudgeted_source_dropped(spark):
    from defactonlp_spark.operators.curation import training_mix

    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y")], "doc_id long, source string, text string"
    )
    got = {r["doc_id"]: r["keep"] for r in training_mix(docs, {"a": 10}).collect()}
    assert got == {1: True, 2: False}
