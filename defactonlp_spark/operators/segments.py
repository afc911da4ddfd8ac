"""B4/B5 — posting-list segment encode, decode, write, and k-way merge.

Physical layout (one segment row per (term, salt) slice):

  term      string   — raw term (no hashing; SURVEY.md §2.A5 rationale)
  salt      int      — skew sub-list id (0 for unsalted terms)
  df        long     — document frequency of the FULL term (all salts)
  n         long     — postings in this slice
  n_bytes   long     — total blob bytes (metrics scans read this int column
                       instead of length()-ing the blobs)
  n_blocks  int
  docs_blob binary   — delta+varbyte doc_ids (gaps continuous across blocks)
  tfs_blob  binary   — varbyte term frequencies
  dls_blob  binary   — varbyte document lengths (needed for exact BM25 at
                       query time; keeps block-max bounds EXACT, which is
                       what makes WAND score-parity provable)
  blockmax  array<struct<last_doc_id long, max_score double,
                         doc_off int, tf_off int, dl_off int>>
            — per 128-entry block: last doc_id (skip pointer), exact max
              BM25 contribution of any doc in the block, byte offsets of the
              block start in each blob.

Encode runs inside ``mapInPandas`` AFTER ``repartitionByRange(term, salt)``
+ ``sortWithinPartitions(term, salt, doc_id)`` — the exact physical plan the
north star mandates. The kernel is a streaming group-by over the sorted
Arrow batches (a term slice may span batch boundaries; a buffer carries the
open group), so memory is bounded by one term-slice, which salting bounds in
turn. All hot loops are numpy (varbyte kernels, score computation).

Reference analog: DrQA's CSR ``.npz`` is a single non-compressed in-memory
matrix (SURVEY.md §1.3); segments are its distributed, compressed,
mergeable replacement.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from defactonlp_spark.config import BM25Params, EngineConfig
from defactonlp_spark.functions.varbyte import delta_encode, vb_decode, vb_encode

BLOCKMAX_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("last_doc_id", T.LongType(), False),
            T.StructField("max_score", T.DoubleType(), False),
            T.StructField("doc_off", T.IntegerType(), False),
            T.StructField("tf_off", T.IntegerType(), False),
            T.StructField("dl_off", T.IntegerType(), False),
        ]
    )
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("docs_blob", T.BinaryType(), False),
        T.StructField("tfs_blob", T.BinaryType(), False),
        T.StructField("dls_blob", T.BinaryType(), False),
        T.StructField("blockmax", BLOCKMAX_T, False),
    ]
)


def idf(df_: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — pinned BM25 idf (always > 0)."""
    return np.log1p((n_docs - df_ + 0.5) / (df_ + 0.5))


def bm25_contrib(tf, dl, idf_t, avgdl, p: BM25Params):
    """Per-posting BM25 contribution, float64 (vectorized)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf_t * tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def _vb_sizes(values: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1 << (7 * k))).astype(np.int64)
    return nbytes


def encode_slice(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_df: int,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> dict:
    """Encode one sorted (term, salt) slice to a segment-row dict."""
    n = int(doc_ids.size)
    B = cfg.block_size
    gaps = delta_encode(doc_ids, base=0).astype(np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    scores = bm25_contrib(tfs, dls, float(idf(term_df, n_docs)), avgdl, cfg.bm25)

    starts = np.arange(0, n, B, dtype=np.int64)
    n_blocks = int(starts.size)
    d_sz, t_sz, l_sz = (np.cumsum(_vb_sizes(a)) for a in (gaps, tfs, dls))

    def offs(csz: np.ndarray) -> np.ndarray:
        o = np.zeros(n_blocks, dtype=np.int64)
        o[1:] = csz[starts[1:] - 1]
        return o

    d_off, t_off, l_off = offs(d_sz), offs(t_sz), offs(l_sz)
    ends = np.minimum(starts + B, n)
    last_ids = doc_ids[ends - 1]
    max_scores = np.maximum.reduceat(scores, starts)
    blockmax = [
        {
            "last_doc_id": int(last_ids[k]),
            "max_score": float(max_scores[k]),
            "doc_off": int(d_off[k]),
            "tf_off": int(t_off[k]),
            "dl_off": int(l_off[k]),
        }
        for k in range(n_blocks)
    ]
    docs_blob, tfs_blob, dls_blob = vb_encode(gaps), vb_encode(tfs), vb_encode(dls)
    return {
        "df": int(term_df),
        "n": n,
        # blob bytes as a plain column so build metrics scan ints, not blobs
        "n_bytes": len(docs_blob) + len(tfs_blob) + len(dls_blob),
        "n_blocks": n_blocks,
        "docs_blob": docs_blob,
        "tfs_blob": tfs_blob,
        "dls_blob": dls_blob,
        "blockmax": blockmax,
    }


def decode_slice(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full decode of one segment row -> (doc_ids, tfs, dls)."""
    n = int(row["n"]) if not hasattr(row, "n") else int(row.n)
    get = (lambda k: row[k]) if isinstance(row, (dict, pd.Series)) else (lambda k: getattr(row, k))
    gaps = vb_decode(get("docs_blob"), n)
    doc_ids = np.cumsum(gaps.astype(np.int64))
    tfs = vb_decode(get("tfs_blob"), n).astype(np.int64)
    dls = vb_decode(get("dls_blob"), n).astype(np.int64)
    return doc_ids, tfs, dls


def encode_segments(
    salted_postings: DataFrame,
    stats_df: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
    n_partitions: int | None = None,
) -> DataFrame:
    """postings_long(term, doc_id, tf, dl, salt) -> segment rows.

    Physical plan: broadcast-join full-term df -> repartitionByRange(term,
    salt) [THE big shuffle, skew-managed by salt] -> sortWithinPartitions
    (term, salt, doc_id) -> streaming mapInPandas encode.
    """
    P = n_partitions or cfg.n_buckets
    joined = salted_postings.join(F.broadcast(stats_df), "term", "inner")
    arranged = joined.repartitionByRange(P, "term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id"
    )

    def encode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []

        def flush(pdf: pd.DataFrame, complete_only: bool):
            # input is sorted by (term, salt, doc_id), so groups are
            # contiguous RUNS: detect boundaries on numpy arrays once and
            # encode array views — the pandas groupby built a frame per
            # group and re-converted each column (measured ~2x the whole
            # kernel's cost on realistic batches)
            terms = pdf["term"].to_numpy(object)
            salts = pdf["salt"].to_numpy(np.int64)
            n_rows = len(pdf)
            change = np.empty(n_rows, dtype=bool)
            change[0] = True
            np.not_equal(terms[1:], terms[:-1], out=change[1:])
            change[1:] |= salts[1:] != salts[:-1]
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], n_rows)
            doc = pdf["doc_id"].to_numpy(np.int64)
            tf = pdf["tf"].to_numpy(np.int64)
            dl = pdf["dl"].to_numpy(np.int64)
            dfreq = pdf["df"].to_numpy(np.int64)
            rows = []
            tail = None
            for s, e in zip(starts, ends):
                if complete_only and e == n_rows:
                    tail = pdf.iloc[s:]  # open group: may continue next batch
                    break
                rows.append(
                    {
                        "term": terms[s],
                        "salt": int(salts[s]),
                        **encode_slice(
                            doc[s:e], tf[s:e], dl[s:e], int(dfreq[s]),
                            n_docs, avgdl, cfg,
                        ),
                    }
                )
            return rows, tail

        for pdf in batches:
            if pdf.empty:
                continue
            buf.append(pdf)
            whole = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            rows, tail = flush(whole, complete_only=True)
            buf = [tail] if tail is not None else []
            if rows:
                yield pd.DataFrame(rows)
        if buf:
            rows, _ = flush(pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0], complete_only=False)
            if rows:
                yield pd.DataFrame(rows)

    return arranged.mapInPandas(encode_iter, schema=SEGMENT_SCHEMA)


def merge_segments(
    spark_segments: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: EngineConfig,
) -> DataFrame:
    """K-way merge of segment generations (SURVEY.md §2.B5).

    Input: union of segment rows from multiple builds over DISJOINT doc_id
    sets. Decodes each slice, merges by doc_id, recomputes df and block-max
    (N/avgdl of the merged corpus), re-encodes. Salt slices stay separate;
    df(term) = total postings across all salts/generations of the term,
    recomputed exactly.

    Shuffle discipline (verified in the physical plan): the WHOLE merge is
    ONE exchange of the blob rows. The window's hash partitioning on term
    also satisfies the downstream ``groupBy(term, salt)`` clustering
    requirement (every (term, salt) group is co-located once term is), so
    Catalyst inserts no second exchange before the merge kernel. An
    aggregate-plus-join formulation of df was tried and is strictly worse
    statically: the join re-exchanges the blob side (SortMergeJoin) unless
    AQE happens to broadcast the (term, df) relation at runtime.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("term")
    with_df = spark_segments.withColumn("df_new", F.sum("n").over(w))

    def merge_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt = key
        ids_l, tfs_l, dls_l = [], [], []
        for r in pdf.itertuples(index=False):
            ids, tfs, dls = decode_slice(r._asdict() if hasattr(r, "_asdict") else r)
            ids_l.append(ids)
            tfs_l.append(tfs)
            dls_l.append(dls)
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        if ids.size > 1 and (np.diff(ids) == 0).any():
            raise ValueError(f"merge_segments: duplicate doc_id in term={term!r}")
        tfs = np.concatenate(tfs_l)[order]
        dls = np.concatenate(dls_l)[order]
        row = {
            "term": term,
            "salt": int(salt),
            **encode_slice(ids, tfs, dls, int(pdf["df_new"].iloc[0]), n_docs, avgdl, cfg),
        }
        return pd.DataFrame([row])

    return with_df.groupBy("term", "salt").applyInPandas(merge_group, schema=SEGMENT_SCHEMA)
