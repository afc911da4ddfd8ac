"""Blue-green deployment drill (VERDICT r4 next-round #8): streamed
generation drain -> publish_generations -> atomic alias swap under
concurrent reads -> rollback.

Contract under test:
- publish_generations compacts ALL streamed generations into a serveable
  index whose results equal a single-shot batch build of the same corpus;
- the alias flip is atomic under a concurrent reader hammering the
  pointer: every read parses, points at a COMPLETE index (manifest
  present), and serves either fully-old or fully-new results — never a
  blend and never a torn pointer;
- rollback restores the previous generation's results exactly.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.plans.alias import (
    open_alias,
    read_alias,
    rollback_alias,
    set_alias,
)
from defactonlp_spark.plans.build import IndexBuild
from defactonlp_spark.plans.query import query_wand
from defactonlp_spark.streaming.incremental import (
    publish_generations,
    start_incremental_build,
)

CORPUS_SCHEMA = "doc_id long, text string"
CFG = EngineConfig(n_buckets=4)


def _write_batch(dirpath, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    pq.write_table(tbl, os.path.join(dirpath, f"{name}.parquet"))


def _docs(lo, hi, extra=""):
    return [(i, f"merge join term{i % 7} window {extra}".strip())
            for i in range(lo, hi)]


def _drain(spark, inp, out):
    q = start_incremental_build(spark, inp, out, CORPUS_SCHEMA, cfg=CFG)
    q.awaitTermination()


def _serve(spark, alias_path, claims):
    reader = open_alias(spark, alias_path)
    return sorted(
        query_wand(reader, claims, k=3, cfg=CFG)
        .select("claim_id", "rank", "doc_id").collect()
    )


def test_bluegreen_drill(spark, tmp_path):
    inp = str(tmp_path / "in")
    stream = str(tmp_path / "stream")
    os.makedirs(inp)
    alias = str(tmp_path / "serving.alias")

    # generation 1 -> publish v1 -> alias points at v1
    _write_batch(inp, "b0", _docs(0, 60))
    _drain(spark, inp, stream)
    v1 = str(tmp_path / "idx_v1")
    p1 = publish_generations(spark, stream, v1, cfg=CFG)
    assert p1["n_docs"] == 60 and p1["generations"] == 1
    set_alias(alias, v1)

    claims = spark.createDataFrame(
        [(0, "merge join"), (1, "window term3"), (2, "freshterm window")],
        "claim_id long, claim string",
    )
    res_v1 = _serve(spark, alias, claims)
    # claim 2's 'freshterm' is not in generation 1
    assert all(r.claim_id != 2 or "freshterm" not in "" for r in res_v1)

    # generation 2 lands (disjoint ids, a distinctive new term) -> publish v2
    _write_batch(inp, "b1", _docs(1000, 1020, extra="freshterm"))
    _drain(spark, inp, stream)
    v2 = str(tmp_path / "idx_v2")
    p2 = publish_generations(spark, stream, v2, cfg=CFG)
    assert p2["n_docs"] == 80 and p2["generations"] == 2

    # publish equals a single-shot batch build of the SAME corpus
    batch_dir = str(tmp_path / "idx_batch")
    full = spark.createDataFrame(
        _docs(0, 60) + _docs(1000, 1020, extra="freshterm"), CORPUS_SCHEMA
    )
    IndexBuild(batch_dir, CFG, build_id="batch").run(
        spark, full, input_snapshot="batch"
    )
    from defactonlp_spark.plans.build import IndexReader

    a = sorted(
        query_wand(IndexReader(spark, v2), claims, k=3, cfg=CFG)
        .select("claim_id", "rank", "doc_id", F.round("score", 9).alias("s"))
        .collect()
    )
    b = sorted(
        query_wand(IndexReader(spark, batch_dir), claims, k=3, cfg=CFG)
        .select("claim_id", "rank", "doc_id", F.round("score", 9).alias("s"))
        .collect()
    )
    assert a == b, "published index must score identically to a batch build"

    # atomic swap under a concurrent pointer reader: hammer read_alias
    # while the flip happens; every observation must be a COMPLETE pointer
    # to a COMPLETE index — torn JSON or a manifest-less dir is a failure
    seen, errs = set(), []
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            try:
                rec = read_alias(alias)
                tgt = rec["index_dir"]
                if not os.path.exists(os.path.join(tgt, "manifest")):
                    errs.append(f"half-swapped target {tgt}")
                seen.add(os.path.basename(tgt))
            except Exception as e:  # torn pointer file
                errs.append(repr(e))

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for _ in range(25):  # repeated flips under the reader
            set_alias(alias, v2)
            set_alias(alias, v1)
        set_alias(alias, v2)
    finally:
        stop.set()
        t.join()
    assert not errs, errs[:3]
    assert seen <= {"idx_v1", "idx_v2"} and "idx_v2" in seen

    # serving after the swap sees the new generation (claim 2 now matches)
    res_v2 = _serve(spark, alias, claims)
    assert res_v2 != res_v1
    c2_docs = {r.doc_id for r in res_v2 if r.claim_id == 2}
    assert c2_docs and all(d >= 1000 for d in c2_docs), c2_docs

    # rollback: flip back to v1, results are exactly the originals
    rollback_alias(alias)
    assert read_alias(alias)["index_dir"] == os.path.abspath(v1)
    assert _serve(spark, alias, claims) == res_v1

    # a half-built dir (no manifest) is refused by the alias layer
    half = str(tmp_path / "idx_half")
    os.makedirs(half)
    import pytest

    with pytest.raises(FileNotFoundError):
        set_alias(alias, half)
