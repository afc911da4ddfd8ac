"""Streaming percolator (streaming/alerts.py).

Contract under test:
- the foreachBatch composition produces EXACTLY the batch percolator's
  matches over the union of all drained files (stateless per batch, so
  streaming vs batch can differ only by batch_id stamping);
- the checkpoint makes a second AvailableNow drain incremental: only
  files that arrived after the first drain are matched (no duplicate
  alerts for old docs);
- batch_id is stamped so a notifier can checkpoint on it.
"""

from __future__ import annotations

import os

import pytest

from defactonlp_spark.streaming.alerts import (
    percolate_batch,
    start_streaming_percolator,
)

RULES = [
    (0, "merge join"),
    (1, "window batch"),
    (2, "zzznever matches"),
]


def _write_batch(dirpath, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    pq.write_table(tbl, os.path.join(dirpath, f"{name}.parquet"))


def _docs(lo, hi):
    return [
        (i, "merge join spark" if i % 3 == 0
            else "window batch stream" if i % 3 == 1
            else "unrelated text entirely")
        for i in range(lo, hi)
    ]


@pytest.fixture()
def dirs(tmp_path):
    inp, out, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(inp)
    return inp, out, ck


def _drain(spark, inp, rules_df, out, ck):
    q = start_streaming_percolator(spark, inp, rules_df, out, ck)
    q.awaitTermination()


def test_streaming_matches_equal_batch_percolate(spark, dirs):
    inp, out, ck = dirs
    rules_df = spark.createDataFrame(RULES, "query_id long, query string")
    _write_batch(inp, "a", _docs(0, 30))
    _write_batch(inp, "b", _docs(30, 60))
    _drain(spark, inp, rules_df, out, ck)

    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.read.parquet(out).collect()
    }
    all_docs = spark.createDataFrame(_docs(0, 60), "doc_id long, text string")
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate_batch(all_docs, rules_df).collect()
    }
    assert got == want and want  # non-vacuous
    # the never-matching rule produced no alerts
    assert not [1 for d, q in got if q == 2]
    # maxFilesPerTrigger=1 -> two files = (at least) two batch ids
    assert spark.read.parquet(out).select("batch_id").distinct().count() >= 2


def test_streaming_percolator_checkpoint_resume(spark, dirs):
    inp, out, ck = dirs
    rules_df = spark.createDataFrame(RULES, "query_id long, query string")
    _write_batch(inp, "a", _docs(0, 30))
    _drain(spark, inp, rules_df, out, ck)
    n_first = spark.read.parquet(out).count()

    # second drain with NO new files: checkpoint must suppress re-alerts
    _drain(spark, inp, rules_df, out, ck)
    assert spark.read.parquet(out).count() == n_first

    # new file arrives -> only ITS matches append
    _write_batch(inp, "c", _docs(100, 110))
    _drain(spark, inp, rules_df, out, ck)
    new_rows = spark.read.parquet(out).filter("doc_id >= 100")
    assert new_rows.count() > 0
    assert spark.read.parquet(out).count() == n_first + new_rows.count()
