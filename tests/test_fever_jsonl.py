"""FEVER JSONL readers: explicit schemas, title unescaping, evidence
normalization into the scorer's typed shape — real dump fragments inline."""

import json
import os

from pyspark.sql import functions as F


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_wiki_pages(spark, tmp_path):
    from defactonlp_spark.sources.fever_jsonl import read_wiki_pages

    p = str(tmp_path / "wiki.jsonl")
    _write(p, [
        {"id": "Colin_Kaepernick", "text": "Colin Kaepernick is a quarterback .",
         "lines": "0\tColin Kaepernick is a quarterback .\tColin Kaepernick\n1\tHe plays ."},
        {"id": "Savages_-LRB-2012_film-RRB-", "text": "Savages is a film .",
         "lines": "0\tSavages is a film ."},
        {"id": "", "text": "dropped", "lines": ""},
    ])
    got = {r["page_id"]: r for r in read_wiki_pages(spark, p).collect()}
    assert set(got) == {"Colin_Kaepernick", "Savages_-LRB-2012_film-RRB-"}
    assert got["Savages_-LRB-2012_film-RRB-"]["title"] == "Savages (2012 film)"
    assert got["Colin_Kaepernick"]["title"] == "Colin Kaepernick"

    # splits into the sentence operator unchanged
    from defactonlp_spark.operators.sentences import split_fever_lines

    sents = split_fever_lines(
        read_wiki_pages(spark, p).withColumnRenamed("page_id", "doc_id"), id_col="doc_id"
    ).collect()
    assert {(r["doc_id"], r["sent_idx"]) for r in sents} == {
        ("Colin_Kaepernick", 0), ("Colin_Kaepernick", 1),
        ("Savages_-LRB-2012_film-RRB-", 0),
    }


def test_read_claims_evidence_normalization(spark, tmp_path):
    from defactonlp_spark.operators.fever import fever_score
    from defactonlp_spark.sources.fever_jsonl import read_claims

    p = str(tmp_path / "claims.jsonl")
    _write(p, [
        {"id": 137334, "verifiable": "VERIFIABLE", "label": "SUPPORTS",
         "claim": "Fox 2000 Pictures released Soul Food.",
         "evidence": [[[74143, 85656, "Soul_Food_-LRB-film-RRB-", 0]]]},
        {"id": 111897, "verifiable": "NOT VERIFIABLE", "label": "NOT ENOUGH INFO",
         "claim": "Nobody knows.",
         "evidence": [[[62701, None, None, None]]]},
    ])
    got = {r["claim_id"]: r for r in read_claims(spark, p).collect()}
    ev = got[137334]["evidence"][0][0]
    assert (ev["annot_id"], ev["ev_id"], ev["page"], ev["sent_idx"]) == (
        74143, 85656, "Soul_Food_-LRB-film-RRB-", 0)
    nei = got[111897]["evidence"][0][0]
    assert nei["page"] is None and nei["ev_id"] is None

    # the normalized gold shape feeds the scorer directly
    gold = read_claims(spark, p).select("claim_id", "label", "evidence")
    pred = spark.createDataFrame(
        [(137334, "SUPPORTS", [("Soul_Food_-LRB-film-RRB-", 0)]),
         (111897, "NOT ENOUGH INFO", [])],
        "claim_id long, predicted_label string, "
        "predicted_evidence array<struct<page:string,sent_idx:int>>",
    )
    row = fever_score(pred, gold).collect()[0]
    assert row["label_accuracy"] == 1.0
