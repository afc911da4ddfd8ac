"""B4 segment encode/decode: round trip, block structure, exact block maxima."""

import numpy as np

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.operators.segments import (
    bm25_contrib,
    decode_slice,
    encode_slice,
    idf,
)

CFG = EngineConfig()


def _random_slice(rng, n, id_hi=10**9):
    ids = np.sort(rng.choice(id_hi, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(20, 400, size=n).astype(np.int64)
    return ids, tfs, dls


def test_roundtrip_multiblock():
    rng = np.random.default_rng(42)
    for n in [1, 127, 128, 129, 1000, 5000]:
        ids, tfs, dls = _random_slice(rng, n)
        row = {"term": "t", "salt": 0, **encode_slice(ids, tfs, dls, n, 10_000, 200.0, CFG)}
        assert row["n"] == n
        assert row["n_blocks"] == (n + CFG.block_size - 1) // CFG.block_size
        out_ids, out_tfs, out_dls = decode_slice(row)
        np.testing.assert_array_equal(out_ids, ids)
        np.testing.assert_array_equal(out_tfs, tfs)
        np.testing.assert_array_equal(out_dls, dls)


def test_blockmax_exact():
    rng = np.random.default_rng(7)
    n, n_docs, avgdl, term_df = 1000, 50_000, 180.0, 1234
    ids, tfs, dls = _random_slice(rng, n)
    row = encode_slice(ids, tfs, dls, term_df, n_docs, avgdl, CFG)
    scores = bm25_contrib(tfs, dls, float(idf(term_df, n_docs)), avgdl, CFG.bm25)
    B = CFG.block_size
    for k, bm in enumerate(row["blockmax"]):
        blk = slice(k * B, min((k + 1) * B, n))
        assert bm["last_doc_id"] == ids[blk][-1]
        assert bm["max_score"] == scores[blk].max()  # EXACT, bit-equal


def test_block_independent_decode():
    """A block is decodable given only the previous block's last_doc_id."""
    from defactonlp_spark.functions.varbyte import vb_decode

    rng = np.random.default_rng(3)
    n = 500
    ids, tfs, dls = _random_slice(rng, n)
    row = encode_slice(ids, tfs, dls, n, 10_000, 100.0, CFG)
    B = CFG.block_size
    bm = row["blockmax"]
    for k in range(row["n_blocks"]):
        start = k * B
        cnt = min(B, n - start)
        lo = bm[k]["doc_off"]
        hi = bm[k + 1]["doc_off"] if k + 1 < row["n_blocks"] else len(row["docs_blob"])
        gaps = vb_decode(row["docs_blob"][lo:hi], cnt)
        base = bm[k - 1]["last_doc_id"] if k > 0 else 0
        got = np.cumsum(gaps.astype(np.int64)) + base
        np.testing.assert_array_equal(got, ids[start : start + cnt])


def test_compression_wins():
    """Delta+varbyte of dense sorted ids beats raw int64 by a wide margin."""
    ids = np.arange(0, 100_000, 3, dtype=np.int64)
    tfs = np.ones(ids.size, dtype=np.int64)
    dls = np.full(ids.size, 200, dtype=np.int64)
    row = encode_slice(ids, tfs, dls, ids.size, 10**6, 200.0, CFG)
    assert len(row["docs_blob"]) == ids.size  # gaps of 3 -> 1 byte each
    assert len(row["docs_blob"]) < ids.size * 8 / 7
