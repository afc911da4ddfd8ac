"""MurmurHash3 x86_32 parity: published test vectors + an independent
per-string reference implementation (written straight from the public
MurmurHash3.cpp spec, scalar Python ints — deliberately NOT sharing code
with the vectorized kernel)."""

import numpy as np
import pytest

from defactonlp_spark.functions.mmh3 import drqa_term_ids, murmur3_32

M = 0xFFFFFFFF


def _ref_mmh3(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    rotl = lambda x, r: ((x << r) | (x >> (32 - r))) & M
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & M
        k = rotl(k, 15)
        k = (k * c2) & M
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & M
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & M
        k = rotl(k, 15)
        k = (k * c2) & M
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h


# widely published MurmurHash3 x86_32 seed-0 vectors
VECTORS = [
    ("", 0x00000000),
    ("hello", 0x248BFA47),
    ("abc", 0xB3DD93FA),
    ("The quick brown fox jumps over the lazy dog", 0x2E4FF723),
]


@pytest.mark.parametrize("s,expect", VECTORS)
def test_published_vectors(s, expect):
    assert _ref_mmh3(s.encode()) == expect, "reference impl off the spec"
    assert int(murmur3_32([s])[0]) == expect


def test_vectorized_matches_reference_on_random_strings():
    rng = np.random.default_rng(5)
    strs = []
    for _ in range(500):
        n = int(rng.integers(0, 24))
        strs.append("".join(chr(int(rng.integers(32, 0x2FF))) for _ in range(n)))
    strs += ["naïve café", "日本語テキスト", "a b", "merge join"]
    got = murmur3_32(strs)
    for s, g in zip(strs, got):
        assert int(g) == _ref_mmh3(s.encode("utf-8")), repr(s)


def test_drqa_term_ids_space_and_determinism():
    ids = drqa_term_ids(["the merge", "join", "the merge"])
    assert ids.dtype == np.int64
    assert (ids >= 0).all() and (ids < (1 << 24)).all()
    assert ids[0] == ids[2]


def test_drqa_murmur_mode_parity_and_collision_merge(spark):
    """hash_mode='murmur' must (a) rank identically to raw mode on a
    collision-free vocabulary and (b) MERGE colliding ngrams into one term
    id with summed tf — the exact DrQA hashed-CSR behavior (A5)."""
    from defactonlp_spark.operators.drqa import drqa_closest_docs, ngram_postings

    rows = [
        (0, "merge join table scan vector stream"),
        (1, "window hash batch stream merge"),
        (2, "customer value order small table"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    claims = spark.createDataFrame([(0, "merge join"), (1, "table small")], "claim_id long, claim string")
    raw = drqa_closest_docs(docs, claims, k=3).toPandas().sort_values(["claim_id", "rank"])
    mm = drqa_closest_docs(docs, claims, k=3, hash_mode="murmur").toPandas().sort_values(["claim_id", "rank"])
    assert list(raw.doc_id) == list(mm.doc_id)
    assert all(abs(a - b) < 1e-12 for a, b in zip(raw.score, mm.score))

    # tok00118 / tok02111 collide at 2921114 in the 2^24 space (found by
    # scan; stable because the hash is pinned)
    cdocs = spark.createDataFrame([(0, "tok00118 tok02111 tok00118")], "doc_id long, text string")
    post = {r["ngram"]: r["tf"] for r in ngram_postings(cdocs, hash_mode="murmur").collect()}
    assert post["2921114"] == 3  # all three unigram occurrences merged
