"""Repetition quality gates (functions/textstats.py::repetition_stats):
pinned values on crafted docs + kernel-vs-Catalyst-twin byte parity."""

import pytest

from defactonlp_spark.functions.textstats import (
    repetition_stats,
    repetition_stats_sql,
)

DOCS = [
    # doc 0: "a b" bigram 3x of 5 bigrams; lines: x3 dup of "a b a b"? no
    (0, "a b a b a b"),                      # 5 bigrams: a-b x3, b-a x2 -> 0.6
    (1, "one two three four five six"),      # all grams unique
    (2, "r s t u v r s t u v r s t u v"),    # heavy 5-gram repetition
    (3, "dup line\ndup line\nother\n\ndup line"),  # 4 non-empty lines, 2 dup
    (4, ""),                                  # empty text
    (5, "solo"),                              # single token
    (6, None),                                # NULL text
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pinned_values(spark, docs):
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["top_bigram_frac"] == pytest.approx(3 / 5)
    # 5-grams of doc 0: ababa / babab -> both unique among 2 positions
    assert rows[0]["dup_5gram_frac"] == 0.0
    assert rows[1]["top_bigram_frac"] == pytest.approx(1 / 5)
    assert rows[1]["dup_5gram_frac"] == 0.0
    # doc 2: 15 tokens -> 11 five-gram positions, every gram is a rotation
    # of (r s t u v) so each of the 5 distinct grams appears 2-3 times
    assert rows[2]["dup_5gram_frac"] == 1.0
    assert rows[3]["dup_line_frac"] == pytest.approx(round(2 / 4, 6))
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["dup_line_frac"] == 0.0
    assert rows[4]["top_bigram_frac"] == 0.0
    assert rows[5]["top_bigram_frac"] == 0.0
    assert rows[5]["dup_5gram_frac"] == 0.0
    assert rows[6]["n_tokens"] is None
    assert rows[6]["dup_line_frac"] is None
    assert rows[6]["top_bigram_frac"] is None
    assert rows[6]["dup_5gram_frac"] is None


def test_kernel_matches_sql_twin(spark, docs):
    kern = repetition_stats(docs)
    twin = repetition_stats_sql(docs)
    assert kern.schema == twin.schema
    assert kern.exceptAll(twin).count() == 0
    assert twin.exceptAll(kern).count() == 0
