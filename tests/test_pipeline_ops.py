"""Training-data pipeline operators: dedup recall/precision sanity, LSH ANN
vs brute force, multimodal plumbing, incremental streaming build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from defactonlp_spark.operators.similarity import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """40 base docs + exact dups + near dups (one token changed)."""
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(40):
        toks = list(rng.choice(vocab, size=60))
        rows.append((i, " ".join(toks)))
        if i < 5:  # exact dups
            rows.append((100 + i, " ".join(toks)))
        if 5 <= i < 10:  # near dups: flip one token
            toks2 = toks.copy()
            toks2[30] = "CHANGED"
            rows.append((200 + i, " ".join(toks2)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_corpus):
    got = exact_dedup(dup_corpus).toPandas()
    assert int(got["n_dups"].sum()) == dup_corpus.count()
    assert (got["n_dups"] >= 2).sum() == 5
    reps = set(got[got.n_dups >= 2].rep_id)
    assert reps == {0, 1, 2, 3, 4}  # min doc_id wins


def test_jaccard_finds_near_dups(spark, dup_corpus):
    pairs = ngram_jaccard_pairs(dup_corpus, threshold=0.7).toPandas()
    got = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert {(i, 100 + i) for i in range(5)} <= got       # exact dups: jaccard 1.0
    assert {(i, 200 + i) for i in range(5, 10)} <= got   # near dups: ~0.9
    # unrelated random docs must not pair at 0.7
    assert all(b - a in (100, 195, 194, 193, 192, 191) or b >= 200 or a >= 100 for a, b in got) or len(got) <= 15


def test_minhash_lsh_recall(spark, dup_corpus):
    got = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(dup_corpus).collect()}
    # exact dups share all 16 minhashes -> every band collides
    assert {(i, 100 + i) for i in range(5)} <= got


def test_simhash_near_dups(spark, dup_corpus):
    got = {(r["id_a"], r["id_b"]) for r in simhash_dup_pairs(dup_corpus, max_hamming=2).collect()}
    assert {(i, 100 + i) for i in range(5)} <= got  # exact dups: hamming 0


def test_lsh_ann_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = cosine_topk(emb, [0, 1, 2], k=5).toPandas()
    # 4-bit LSH + Hamming-1 probes scans ~5/16 of the corpus; on random
    # gaussian vectors (weak neighbors) that still recovers ~half of top-5
    approx = lsh_ann_topk(emb, [0, 1, 2], k=5, dim=64, n_bits=4).toPandas()
    hits = 0
    for q in (0, 1, 2):
        b = set(brute[brute.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(a & b)
    assert hits >= 6
    # and the scored candidates it does return carry EXACT cosines
    merged = brute.merge(approx, on=["query_id", "vec_id"], suffixes=("_b", "_a"))
    if len(merged):
        assert (merged.cos_b == merged.cos_a).all()


def test_multimodal_stub_plumbing(spark):
    from defactonlp_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_media_features,
        frame_sample_plan,
    )

    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 32, 32, None),
        (2, "video", b"\x00\x00ftyp fake", "video/mp4", 640, 480, 3500),
        (3, "image", None, "image/png", 0, 0, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms long",
    )
    feats = extract_media_features(media, fake=True).toPandas().sort_values("media_id")
    assert list(feats.media_id) == [1, 2, 3]
    assert all(len(f) == FEATURE_DIM for f in feats.features)
    # deterministic: same payload -> same features
    feats2 = extract_media_features(media, fake=True).toPandas().sort_values("media_id")
    assert [list(f) for f in feats.features] == [list(f) for f in feats2.features]

    plan = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in plan] == [(2, 0), (2, 1000), (2, 2000)]

    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_media_features(media, fake=False).collect()


def test_incremental_streaming_build(spark, tmp_path):
    import pandas as pd

    from defactonlp_spark.sources.fixtures import gen_webpages
    from defactonlp_spark.streaming.incremental import start_incremental_build
    from defactonlp_spark.sources.tableio import LocalTable

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    import os

    os.makedirs(in_dir)
    pdf = gen_webpages(n=40, seed=21, dup_frac=0.0)
    pdf["doc_id"] = range(len(pdf))
    pdf[["doc_id", "text"]].iloc[:20].to_parquet(f"{in_dir}/a.parquet")
    pdf[["doc_id", "text"]].iloc[20:].to_parquet(f"{in_dir}/b.parquet")

    schema = "doc_id long, text string"
    q = start_incremental_build(spark, in_dir, out_dir, schema)
    q.awaitTermination(120)

    table = LocalTable(f"{out_dir}/segments")
    seg = table.read(spark)
    decoded_docs = seg.selectExpr("n").agg(F.sum("n")).collect()[0][0]
    assert decoded_docs > 0
    # every doc indexed exactly once across generations
    from defactonlp_spark.plans.query import decode_segments

    ids = decode_segments(seg).select("doc_id").distinct()
    assert ids.count() == 40
