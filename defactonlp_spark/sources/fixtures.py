"""Deterministic synthetic fixtures (seed=42) — FIXTURES.md §1-2.

``gen_webpages``: Common-Crawl-style pages with the exact input shape pinned
by BASELINE.json:15 — ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``. The html is an exact-invertible wrapper of
``text`` (entities escaped, script/style/head noise added) so the B1
extractor must recover ``text`` byte-identically.

``gen_claims``: FEVER-1.0-shaped claim set (claim_id, claim, label, evidence)
so the real dev set drops in unchanged (SURVEY.md §1.1).

Pure numpy/pandas; vectorized generation scales to the 1M-row bench size.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd

SEED = 42
EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

# 30 head terms mirroring the driver documents vocabulary + 5000 tail terms
HEAD_TERMS = (
    "the merge join sort table scan window hash batch stream spark group query "
    "row data slow small filter customer line value agg part column big fast key "
    "order vector dup"
).split()
N_TAIL = 5000
UNICODE_SNIPPETS = ["café naïve", "Σigma über", "漢字 測試", "touché résumé"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.55, 0.12, 0.12, 0.11, 0.10]


def _vocab() -> list[str]:
    return HEAD_TERMS + [f"term{j:04d}" for j in range(N_TAIL)]


def _zipf_probs(n: int, a: float = 1.3) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), a)
    return p / p.sum()


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_html(i: int, text: str) -> bytes:
    return (
        f"<html><head><title>t{i}</title><script>x=1;</script>"
        f"<style>.a{{}}</style></head><body><p>{_escape(text)}</p></body></html>"
    ).encode("utf-8")


def gen_webpages(
    n: int = 2000, seed: int = SEED, dup_frac: float = 0.03, start: int = 0
) -> pd.DataFrame:
    """n unique pages + ~dup_frac*n recrawled urls (later warc_ts, same text
    but a marker change — dedup must keep the LATEST crawl).

    ``start`` offsets the url/timestamp index space so separate calls
    produce URL-DISJOINT corpora — the incremental-generation fixture
    (gen A = start 0, gen B = start n_A)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    lens = rng.integers(20, 401, size=n)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    all_toks = rng.choice(vocab, size=int(offsets[-1]), p=probs)
    texts = ["" for _ in range(n)]
    for i in range(n):
        texts[i] = " ".join(all_toks[offsets[i] : offsets[i + 1]])
    # ~1% rows get unicode NFD test content appended
    uni_rows = rng.choice(n, size=max(1, n // 100), replace=False)
    for r in uni_rows:
        snip = UNICODE_SNIPPETS[int(r) % len(UNICODE_SNIPPETS)]
        texts[r] = texts[r] + " " + unicodedata.normalize("NFC", snip)

    idx = np.arange(start, start + n)
    urls = [f"https://example{i % 97}.test/p/{i:08d}" for i in idx]
    ts = EPOCH + (idx.astype("int64") * 1009 * 1_000_000).astype("timedelta64[us]")
    langs = rng.choice(np.array(LANGS, dtype=object), size=n, p=LANG_P)

    base = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": [make_html(int(i), t) for i, t in zip(idx, texts)],
            "text": texts,
            "lang": langs,
        }
    )
    # recrawls: same url, +7 days, text gets a recrawl marker token
    n_dup = int(n * dup_frac)
    if n_dup:
        drows = rng.choice(n, size=n_dup, replace=False)
        dup = base.iloc[drows].copy()
        dup["warc_ts"] = dup["warc_ts"] + np.timedelta64(7, "D").astype("timedelta64[us]")
        dup["text"] = dup["text"] + " recrawl"
        dup["html"] = [make_html(int(i) + start, t) for i, t in zip(drows, dup["text"])]
        base = pd.concat([base, dup], ignore_index=True)
    base["warc_ts"] = pd.to_datetime(base["warc_ts"])
    return base


def gen_claims(n: int = 200, seed: int = SEED + 1) -> pd.DataFrame:
    """FEVER-shaped claims over the same vocabulary (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    head = np.array(HEAD_TERMS, dtype=object)
    mid = np.array([f"term{j:04d}" for j in range(0, 200)], dtype=object)
    labels = ["SUPPORTS", "REFUTES", "NOT ENOUGH INFO"]
    rows = []
    for cid in range(n):
        k = int(rng.integers(3, 13))
        mode = rng.random()
        if mode < 0.6:
            toks = rng.choice(head, size=k)
        elif mode < 0.9:
            toks = rng.choice(mid, size=k)
        else:
            toks = np.concatenate([rng.choice(head, size=k - 1), np.array([f"oov{cid:05d}"], dtype=object)])
        rows.append(
            {
                "claim_id": cid,
                "claim": " ".join(toks.tolist()),
                "label": labels[cid % 3],
                "evidence": None,
            }
        )
    return pd.DataFrame(rows)


def write_webpages_parquet(
    path: str, n: int, seed: int = SEED, n_files: int | None = None, start: int = 0
) -> str:
    """Write as a DIRECTORY of parquet files with small row groups — the
    shape real crawl corpora have (many WARC-derived files). A single file
    with one row group is unsplittable: the whole corpus scan (and the
    shuffle map feeding recrawl dedup) would run as ONE task regardless of
    cluster size, silently serializing the most expensive stage."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = gen_webpages(n=n, seed=seed, start=start)
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    k = n_files or max(8, min(64, len(pdf) // 10000))
    os.makedirs(path, exist_ok=True)
    rows = len(pdf)
    per = (rows + k - 1) // k
    for i in range(k):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:04d}.parquet"),
                           row_group_size=4096)
    return path
