import numpy as np
import pytest

from defactonlp_spark.functions.varbyte import delta_decode, delta_encode, vb_decode, vb_encode


def roundtrip(arr):
    enc = vb_encode(np.asarray(arr, dtype=np.uint64))
    dec = vb_decode(enc, len(arr))
    np.testing.assert_array_equal(dec, np.asarray(arr, dtype=np.uint64))
    return enc


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_boundaries():
    vals = [0, 1, 126, 127, 128, 129, 16383, 16384, (1 << 21) - 1, 1 << 21,
            (1 << 28) - 1, 1 << 28, (1 << 35), (1 << 62), (1 << 63) - 1]
    enc = roundtrip(vals)
    # 0..127 is one byte
    assert vb_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vb_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert len(vb_encode(np.array([128], dtype=np.uint64))) == 2
    assert len(enc) == sum(max(1, (int(v).bit_length() + 6) // 7) for v in vals)


def test_rejects_too_large():
    with pytest.raises(ValueError):
        vb_encode(np.array([1 << 63], dtype=np.uint64))


def test_random_roundtrip():
    rng = np.random.default_rng(42)
    for size in [1, 7, 100, 10_000]:
        for hi in [2, 128, 1 << 14, 1 << 30, 1 << 62]:
            roundtrip(rng.integers(0, hi, size=size, dtype=np.uint64))


def test_runs_and_zeros():
    roundtrip(np.zeros(1000, dtype=np.uint64))
    roundtrip(np.full(1000, 127, dtype=np.uint64))
    roundtrip(np.full(1000, 128, dtype=np.uint64))


def test_decode_count_mismatch():
    enc = vb_encode(np.array([5, 6], dtype=np.uint64))
    with pytest.raises(ValueError):
        vb_decode(enc, 3)


def test_delta():
    ids = np.array([0, 3, 4, 10, 1000, 10**12], dtype=np.int64)
    gaps = delta_encode(ids)
    np.testing.assert_array_equal(delta_decode(gaps), ids)
    gaps2 = delta_encode(ids[2:], base=int(ids[1]))
    np.testing.assert_array_equal(delta_decode(gaps2, base=int(ids[1])), ids[2:])
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 4], dtype=np.int64))
