"""M6 — DeFactoNLP-surface operators: DrQA tf-idf mode, title doc retrieval,
sentence retrieval, FEVER scorer."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from defactonlp_spark.operators.docretrieval import (
    candidate_union,
    extract_entities_one,
    title_match_docs,
)
from defactonlp_spark.operators.drqa import (
    drqa_closest_docs,
    ngrams_filtered,
    simple_tokenize,
)
from defactonlp_spark.operators.fever import fever_score
from defactonlp_spark.operators.sentences import (
    sentence_retrieval,
    split_chunks,
    split_fever_lines,
)


# ---------------------------------------------------------------- DrQA mode
def test_simple_tokenize_semantics():
    assert simple_tokenize("Obama was born in Hawaii.") == [
        "obama", "was", "born", "in", "hawaii", ".",
    ]
    assert simple_tokenize("don't") == ["don", "'", "t"]
    assert simple_tokenize("") == []


def test_ngram_stopword_filter():
    toks = simple_tokenize("Obama was born in Hawaii.")
    grams = ngrams_filtered(toks, 2)
    # stopwords (was, in) and punctuation dropped, also from bigrams
    assert "obama" in grams and "hawaii" in grams
    assert "was" not in grams and "." not in grams
    assert "born in" not in grams and "obama was" not in grams
    assert "born" in grams


def _pure_python_drqa(texts, queries, k):
    """Closed-form reimplementation (SURVEY.md §5.2 test_drqa_parity)."""
    from collections import Counter

    post = {}
    for d, t in texts.items():
        for g, c in Counter(ngrams_filtered(simple_tokenize(t))).items():
            post.setdefault(g, {})[d] = c
    n = len(texts)
    out = {}
    for qid, q in queries.items():
        scores = {}
        qcnt = Counter(ngrams_filtered(simple_tokenize(q)))
        for g, qtf in qcnt.items():
            if g not in post:
                continue
            nt = len(post[g])
            idf = max(0.0, math.log((n - nt + 0.5) / (nt + 0.5)))
            qw = math.log1p(qtf) * idf
            for d, tf in post[g].items():
                scores[d] = scores.get(d, 0.0) + math.log1p(tf) * idf * qw
        # zero-weight overlap is no evidence (engine filters score > 0)
        out[qid] = sorted(
            ((d, s) for d, s in scores.items() if s > 0), key=lambda kv: (-kv[1], kv[0])
        )[:k]
    return out


def test_drqa_matches_pure_python(spark):
    texts = {
        0: "Colin Kaepernick is a quarterback in the National Football League.",
        1: "The National Football League is an American sports league.",
        2: "Hawaii is an island state of the United States.",
        3: "Barack Obama was born in Hawaii and led the United States.",
        4: "Quarterback play decides many football games.",
    }
    queries = {10: "Colin Kaepernick plays quarterback football", 11: "Obama born Hawaii"}
    corpus = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    qdf = spark.createDataFrame(list(queries.items()), "claim_id long, claim string")
    got = drqa_closest_docs(corpus, qdf, k=3).toPandas()
    expect = _pure_python_drqa(texts, queries, 3)
    for qid, exp in expect.items():
        mine = got[got.claim_id == qid].sort_values("rank")
        assert list(mine.doc_id) == [d for d, _ in exp]
        for s1, (_, s2) in zip(mine.score, exp):
            assert math.isclose(s1, s2, rel_tol=1e-9)


# ------------------------------------------------------------ doc retrieval
def test_entity_heuristic():
    assert extract_entities_one("Colin Kaepernick became a starter.") == [
        "Colin Kaepernick",
    ]
    assert extract_entities_one("the national football league") == []


def test_title_match_and_union(spark):
    docs = spark.createDataFrame(
        [(0, "Colin_Kaepernick"), (1, "National_Football_League"), (2, "Hawaii -LRB-island-RRB-")],
        "doc_id long, title string",
    )
    claims = spark.createDataFrame(
        [(1, "Colin Kaepernick plays in the National Football League")],
        "claim_id long, claim string",
    )
    hits = title_match_docs(claims, docs)
    assert {r["doc_id"] for r in hits.collect()} == {0, 1}

    tfidf = spark.createDataFrame([(1, 2), (1, 0)], "claim_id long, doc_id long")
    uni = candidate_union(hits, tfidf)
    assert uni.count() == 3  # {0,1,2} deduped


# ---------------------------------------------------------------- sentences
def test_split_fever_lines(spark):
    docs = spark.createDataFrame(
        [(7, "0\tFirst sentence .\tTag1\n1\tSecond sentence .\n3\tFourth , index skipped .")],
        "doc_id long, lines string",
    )
    got = split_fever_lines(docs).orderBy("sent_idx").collect()
    assert [(r["sent_idx"], r["sentence"]) for r in got] == [
        (0, "First sentence ."),
        (1, "Second sentence ."),
        (3, "Fourth , index skipped ."),
    ]


def test_split_chunks_and_retrieval(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["alpha"] * 10 + ["beta"] * 10 + ["gamma"] * 3)),
         (2, "delta " * 5)],
        "doc_id long, text string",
    )
    chunks = split_chunks(docs, chunk_tokens=10)
    got = chunks.orderBy("doc_id", "sent_idx").collect()
    assert [(r["doc_id"], r["sent_idx"]) for r in got] == [(1, 0), (1, 1), (1, 2), (2, 0)]
    assert got[1]["sentence"] == " ".join(["beta"] * 10)

    claims = spark.createDataFrame([(5, "beta")], "claim_id long, claim string")
    res = sentence_retrieval(chunks, claims, k=2).collect()
    assert res[0]["doc_id"] == 1 and res[0]["sent_idx"] == 1


def test_sentence_retrieval_scoped_by_candidates(spark):
    docs = spark.createDataFrame(
        [(1, "match term here"), (2, "match term here")], "doc_id long, text string"
    )
    chunks = split_chunks(docs, chunk_tokens=10)
    claims = spark.createDataFrame([(5, "match")], "claim_id long, claim string")
    cand = spark.createDataFrame([(5, 2)], "claim_id long, doc_id long")
    res = sentence_retrieval(chunks, claims, candidates=cand, k=5).collect()
    assert {r["doc_id"] for r in res} == {2}


# ------------------------------------------------------------- FEVER scorer
def test_fever_score(spark):
    ev_t = (
        "array<array<struct<annot_id:bigint, ev_id:bigint, page:string, sent_idx:int>>>"
    )
    gold = spark.createDataFrame(
        [
            (1, "SUPPORTS", [[(1, 1, "A", 0)], [(2, 2, "B", 1), (2, 3, "C", 2)]]),
            (2, "REFUTES", [[(3, 4, "D", 0)]]),
            (3, "NOT ENOUGH INFO", None),
        ],
        f"claim_id long, label string, evidence {ev_t}",
    )
    pe_t = "array<struct<page:string, sent_idx:int>>"
    preds = spark.createDataFrame(
        [
            (1, "SUPPORTS", [("B", 1), ("C", 2), ("X", 9)]),  # set 2 fully covered
            (2, "SUPPORTS", [("D", 0)]),                      # evidence ok, label wrong
            (3, "NOT ENOUGH INFO", []),                       # NEI: evidence free
        ],
        f"claim_id long, predicted_label string, predicted_evidence {pe_t}",
    )
    row = fever_score(preds, gold).collect()[0]
    assert row["n"] == 3
    assert math.isclose(row["label_accuracy"], 2 / 3, abs_tol=1e-6)
    assert math.isclose(row["evidence_recall"], 1.0, abs_tol=1e-6)
    assert math.isclose(row["fever_score"], 2 / 3, abs_tol=1e-6)


def test_fever_evidence_partial_set_not_enough(spark):
    ev_t = "array<array<struct<annot_id:bigint, ev_id:bigint, page:string, sent_idx:int>>>"
    gold = spark.createDataFrame(
        [(1, "SUPPORTS", [[(1, 1, "A", 0), (1, 2, "B", 1)]])],
        f"claim_id long, label string, evidence {ev_t}",
    )
    preds = spark.createDataFrame(
        [(1, "SUPPORTS", [("A", 0)])],
        "claim_id long, predicted_label string, predicted_evidence array<struct<page:string, sent_idx:int>>",
    )
    row = fever_score(preds, gold).collect()[0]
    assert row["evidence_recall"] == 0.0 and row["fever_score"] == 0.0


def test_rte_classify_deterministic_and_batched(spark):
    """A16: the fake-model scorer must be deterministic, match an
    independent recomputation of the pinned hash contract, and run as a
    mapInPandas map (row count preserved, schema extended)."""
    import hashlib

    from defactonlp_spark.operators.rte import RTE_LABELS, rte_classify

    rows = [
        (0, "the merge join", 5, 0, "merge join table scan"),
        (0, "the merge join", 7, 2, "window hash batch"),
        (1, "sort vector", 5, 1, "sort the vector stream"),
    ]
    pairs = spark.createDataFrame(
        rows, "claim_id long, claim string, doc_id long, sent_idx int, sentence string"
    )
    got = rte_classify(pairs).toPandas().sort_values(["claim_id", "doc_id", "sent_idx"])
    assert len(got) == 3
    for r in got.itertuples():
        h = hashlib.sha256(f"{r.claim}|{r.sentence}".encode()).hexdigest()
        s = (h[0:8], h[8:16], h[16:24])
        assert r.rte_label == RTE_LABELS[max(range(3), key=lambda j: (s[j], -j))]
    again = rte_classify(pairs).toPandas().sort_values(["claim_id", "doc_id", "sent_idx"])
    assert list(got.rte_label) == list(again.rte_label)

    with pytest.raises(Exception, match="NotImplementedError|real RTE model"):
        rte_classify(pairs, fake=False).collect()


def test_label_aggregate_majority_and_ties(spark):
    from defactonlp_spark.operators.rte import label_aggregate

    rows = [
        (0, "SUPPORTS"), (0, "SUPPORTS"), (0, "REFUTES"),           # clear majority
        (1, "REFUTES"), (1, "SUPPORTS"),                            # 1-1 tie
        (2, "NOT ENOUGH INFO"),
    ]
    scored = spark.createDataFrame(rows, "claim_id long, rte_label string")
    got = {r["claim_id"]: r for r in label_aggregate(scored).collect()}
    assert got[0]["predicted_label"] == "SUPPORTS" and got[0]["n_votes"] == 2 and got[0]["n_sents"] == 3
    # tie breaks to the lexicographically smallest label
    assert got[1]["predicted_label"] == "REFUTES" and got[1]["n_sents"] == 2
    assert got[2]["predicted_label"] == "NOT ENOUGH INFO" and got[2]["n_votes"] == 1


def test_split_chunks_kernel_matches_sql_twin(spark):
    """The Arrow chunk kernel must be byte-identical to the pure-expression
    twin (which mirrors the DuckDB oracle SQL), incl. empty/null text."""
    from pyspark.sql import functions as F

    from defactonlp_spark.operators.sentences import split_chunks, split_chunks_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [(900, ""), (901, None), (902, "one two three four five six seven eight nine ten eleven")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn("n_chars", F.lit(0).cast("long"))
    alld = docs.unionByName(edge)
    a = split_chunks(alld, chunk_tokens=10)
    b = split_chunks_sql(alld, chunk_tokens=10)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fever_pipeline_end_to_end(spark, tmp_path):
    """The composed A12-A18 plan: doc retrieval -> candidate union ->
    scoped sentence retrieval -> RTE -> label agg -> FEVER-shaped
    predictions, plus the JSONL writer (FEVER submission format)."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from defactonlp_spark.operators.sentences import split_chunks
    from defactonlp_spark.plans.fever import fever_pipeline, write_fever_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    claims = spark.createDataFrame(
        [(0, "the merge join"), (1, "sort table scan"), (2, "zzz-oov-claim")],
        "claim_id long, claim string",
    )
    sents = split_chunks(docs, chunk_tokens=10)
    pred = fever_pipeline(docs, claims, sents, k_docs=5, k_sents=3)
    rows = {r["claim_id"]: r for r in pred.collect()}
    # OOV claim retrieves nothing -> no prediction row (reference behavior:
    # no evidence, scorer counts it wrong); others carry <= 3 evidence pairs
    assert 2 not in rows and set(rows) == {0, 1}
    for r in rows.values():
        assert r["predicted_label"] in ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")
        assert 1 <= len(r["predicted_evidence"]) <= 3
        assert r["n_sents"] == len(r["predicted_evidence"])
    # determinism: same input -> same predictions
    again = {r["claim_id"]: r for r in fever_pipeline(docs, claims, sents).collect()}
    assert {k: (v["predicted_label"], [tuple(e) for e in v["predicted_evidence"]]) for k, v in rows.items()} == \
           {k: (v["predicted_label"], [tuple(e) for e in v["predicted_evidence"]]) for k, v in again.items()}
    # JSONL writer round-trip
    out = str(tmp_path / "preds")
    write_fever_jsonl(pred, out)
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            lines += [l for l in open(os.path.join(out, fn)) if l.strip()]
    parsed = {d["id"]: d for d in map(_json.loads, lines)}
    assert set(parsed) == {0, 1}
    assert all(isinstance(d["predicted_evidence"][0], list) for d in parsed.values())


def test_fever_pipeline_from_wiki_pages(spark, tmp_path):
    """ADVICE r3 (medium): the composed pipeline must run end-to-end from
    read_wiki_pages output — STRING page ids in, page-name strings back out
    in predicted_evidence, and write_fever_jsonl emitting heterogeneous
    [page:str, sent_idx:int] pairs that json.loads round-trips."""
    import json as _json
    import os

    from defactonlp_spark.plans.fever import (
        fever_pipeline_from_wiki,
        with_wiki_doc_ids,
        write_fever_jsonl,
    )
    from defactonlp_spark.sources.fever_jsonl import read_wiki_pages

    pages = [
        {"id": "Merge_Join", "text": "the merge join wins",
         "lines": "0\tthe merge join wins here\n1\tbut sorting is harder"},
        {"id": "Sort-LRB-Table-RRB-", "text": "sort table scan basics",
         "lines": "0\tsort table scan basics\n1\tvector scans differ"},
        {"id": "Window_Stream", "text": "window stream batch processing",
         "lines": "0\twindow stream batch processing\n1\tbatches flow in windows"},
        {"id": "Unrelated Éclair", "text": "pastry recipes only",
         "lines": "0\tpastry recipes only"},
    ]
    p = str(tmp_path / "wiki.jsonl")
    with open(p, "w") as f:
        for row in pages:
            f.write(_json.dumps(row) + "\n")
    wiki = read_wiki_pages(spark, p)

    # dense id assignment: a bijection onto [0, n_pages), deterministic
    mapped = with_wiki_doc_ids(wiki)
    ids = {r["page_id"]: r["doc_id"] for r in mapped.collect()}
    assert sorted(ids.values()) == list(range(len(pages)))
    again = {r["page_id"]: r["doc_id"]
             for r in with_wiki_doc_ids(wiki).collect()}
    assert ids == again

    claims = spark.createDataFrame(
        [(0, "the merge join"), (1, "sort table scan"), (2, "window stream")],
        "claim_id long, claim string",
    )
    pred = fever_pipeline_from_wiki(wiki, claims, k_docs=2, k_sents=2)
    rows = {r["claim_id"]: r for r in pred.collect()}
    assert set(rows) == {0, 1, 2}
    page_names = {pg["id"] for pg in pages}
    for r in rows.values():
        assert r["predicted_label"] in ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")
        for ev in r["predicted_evidence"]:
            # evidence pages are page-NAME strings, not numeric engine ids
            assert ev["page"] in page_names
            assert isinstance(ev["sent_idx"], int)

    out = str(tmp_path / "wiki_preds")
    write_fever_jsonl(pred, out)
    lines = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            lines += [l for l in open(os.path.join(out, fn)) if l.strip()]
    parsed = {d["id"]: d for d in map(_json.loads, lines)}
    assert set(parsed) == {0, 1, 2}
    for d in parsed.values():
        for pair in d["predicted_evidence"]:
            # the FEVER submission contract: heterogeneous [str, int] pairs
            assert isinstance(pair[0], str) and pair[0] in page_names
            assert isinstance(pair[1], int)
