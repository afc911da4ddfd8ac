"""B5 merge: k-way merge of segment generations == single-shot build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.segments import decode_slice, encode_segments, merge_segments
from defactonlp_spark.sources.fixtures import gen_webpages

CFG = EngineConfig(n_buckets=4)


def _segments_for(spark, pdf, n_docs, avgdl):
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    postings = P.build_postings(df)
    stats = P.term_stats(postings)
    plan = P.salt_plan(stats, n_docs, CFG)
    return encode_segments(P.with_salt(postings, plan), stats, n_docs, avgdl, CFG, n_partitions=4)


def test_merge_equals_single_shot(spark):
    pdf = gen_webpages(n=200, seed=5, dup_frac=0.0)
    pdf["doc_id"] = range(len(pdf))

    # global stats fixed across generations (the merge contract: one corpus)
    from defactonlp_spark.functions.tokenize import tokenize_one

    dls = [len(tokenize_one(t)) for t in pdf["text"]]
    n_docs, avgdl = len(pdf), float(np.mean(dls))

    single = _segments_for(spark, pdf, n_docs, avgdl).toPandas()

    gen_a = _segments_for(spark, pdf.iloc[:90], n_docs, avgdl)
    gen_b = _segments_for(spark, pdf.iloc[90:], n_docs, avgdl)
    # salt depends on full-corpus df; halves may salt differently — that's
    # exactly what merge must reconcile: re-salt to salt 0 for comparison
    merged = merge_segments(gen_a.unionByName(gen_b), n_docs, avgdl, CFG).toPandas()

    def flat(seg_pdf):
        out = {}
        for _, row in seg_pdf.iterrows():
            ids, tfs, dls_ = decode_slice(row)
            for i in range(len(ids)):
                out[(row["term"], int(ids[i]))] = (int(tfs[i]), int(dls_[i]))
        return out

    f_single, f_merged = flat(single), flat(merged)
    assert f_single == f_merged

    # df on every slice equals the full-term posting count
    tdf = merged.groupby("term")["n"].sum()
    for _, row in merged.iterrows():
        assert row["df"] == tdf[row["term"]]

    # block maxima recomputed exactly: spot-check vs fresh encode
    sm = {(r["term"], r["salt"]): r for _, r in single.iterrows()}
    hits = 0
    for _, row in merged.iterrows():
        key = (row["term"], row["salt"])
        if key in sm and sm[key]["n"] == row["n"]:
            exp = [b["max_score"] for b in sm[key]["blockmax"]]
            got = [b["max_score"] for b in row["blockmax"]]
            assert got == exp
            hits += 1
    assert hits > 0


def test_merge_rejects_overlapping_docsets(spark):
    pdf = gen_webpages(n=30, seed=6, dup_frac=0.0)
    pdf["doc_id"] = range(len(pdf))
    seg = _segments_for(spark, pdf, 30, 100.0)
    with pytest.raises(Exception, match="duplicate doc_id"):
        merge_segments(seg.unionByName(seg), 30, 100.0, CFG).collect()
