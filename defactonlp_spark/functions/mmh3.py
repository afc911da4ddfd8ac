"""Vectorized MurmurHash3 x86_32 — the DrQA term-hash (A5 parity).

DrQA/fever-baselines hash ngrams with sklearn's ``murmurhash3_32(ngram,
positive=True) % 2**24`` (seed 0). The public MurmurHash3 reference
(Austin Appleby, public domain) defines the algorithm; sklearn's wrapper
applies it to the UTF-8 bytes with seed 0 and reinterprets the result as
unsigned. This module reimplements it in pure numpy, vectorized across a
batch of strings: strings are grouped by byte length so each group is a
dense (n, L) uint8 matrix and every round of the hash is a whole-array
uint32 operation (wrap-around multiply/shift are exactly the modular
arithmetic the algorithm wants).

Pinned by test vectors in tests/test_mmh3.py against published values and
an independent per-string reference implementation.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mmh3_same_len(arr: np.ndarray, seed: int) -> np.ndarray:
    """MurmurHash3 x86_32 over rows of a (n, L) uint8 matrix."""
    n, L = arr.shape
    h = np.full(n, seed, dtype=np.uint32)
    nblocks = L // 4
    if nblocks:
        blocks = arr[:, : nblocks * 4].reshape(n, nblocks, 4).astype(np.uint32)
        k_all = (
            blocks[:, :, 0]
            | (blocks[:, :, 1] << np.uint32(8))
            | (blocks[:, :, 2] << np.uint32(16))
            | (blocks[:, :, 3] << np.uint32(24))
        )
        for j in range(nblocks):
            k = k_all[:, j] * _C1
            k = _rotl(k, 15) * _C2
            h ^= k
            h = _rotl(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
    rem = L % 4
    if rem:
        tail = arr[:, nblocks * 4 :].astype(np.uint32)
        k = np.zeros(n, dtype=np.uint32)
        if rem == 3:
            k ^= tail[:, 2] << np.uint32(16)
        if rem >= 2:
            k ^= tail[:, 1] << np.uint32(8)
        k ^= tail[:, 0]
        k *= _C1
        k = _rotl(k, 15) * _C2
        h ^= k
    h ^= np.uint32(L)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h


def murmur3_32(strings, seed: int = 0) -> np.ndarray:
    """Batch hash -> uint32 ndarray (sklearn ``positive=True`` semantics).

    Grouped by encoded length so the kernel stays dense; the per-group
    gather/scatter is O(n) Python on indices only.
    """
    data = [s.encode("utf-8") for s in strings]
    out = np.zeros(len(data), dtype=np.uint32)
    by_len: dict[int, list[int]] = {}
    for i, b in enumerate(data):
        by_len.setdefault(len(b), []).append(i)
    for L, idxs in by_len.items():
        if L == 0:
            out[idxs] = _mmh3_same_len(np.zeros((len(idxs), 0), dtype=np.uint8), seed)
            continue
        flat = np.frombuffer(b"".join(data[i] for i in idxs), dtype=np.uint8)
        out[idxs] = _mmh3_same_len(flat.reshape(len(idxs), L), seed)
    return out


def drqa_term_ids(strings, hash_size: int = 1 << 24) -> np.ndarray:
    """DrQA ``utils.hash``: murmur3_32 seed-0 positive, mod the hash space."""
    return (murmur3_32(strings, seed=0) % np.uint32(hash_size)).astype(np.int64)
