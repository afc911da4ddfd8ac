"""B8 resume: crash after the first bucket-group commit -> resume -> the
final index is identical to a single-shot build, and done buckets are not
re-encoded (checkpoint statuses + snapshot lineage prove it)."""

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.plans.build import IndexBuild, IndexReader
from defactonlp_spark.sources.fixtures import gen_webpages

CFG = EngineConfig(n_buckets=8)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = gen_webpages(n=300, seed=9, dup_frac=0.0)
    pdf["doc_id"] = range(len(pdf))
    return spark.createDataFrame(pdf[["doc_id", "text"]])


def _flatten(seg_pdf):
    from defactonlp_spark.operators.segments import decode_slice

    out = {}
    for _, row in seg_pdf.iterrows():
        ids, tfs, dls = decode_slice(row)
        for i in range(len(ids)):
            out[(row["term"], int(row["salt"]), int(ids[i]))] = (int(tfs[i]), int(dls[i]))
    return out


def test_crash_then_resume(spark, corpus, tmp_path):
    crash_dir, clean_dir = str(tmp_path / "crash"), str(tmp_path / "clean")

    # single-shot reference build
    IndexBuild(clean_dir, CFG, build_id="b1", n_groups=4).run(
        spark, corpus, input_snapshot="s1"
    )

    # crash after 1 of 4 group commits
    b = IndexBuild(crash_dir, CFG, build_id="b1", n_groups=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        b.run(spark, corpus, input_snapshot="s1", fail_after_groups=1)

    ck = b.checkpoints.read(spark).toPandas()
    done_before = set(ck[ck.status == "done"].partition_id)
    assert 0 < len(done_before) < CFG.n_buckets
    # the partially-built table is still readable (snapshot isolation)
    partial = b.segments.read(spark)
    assert partial.count() > 0

    # resume: same build_id, same out_dir
    b2 = IndexBuild(crash_dir, CFG, build_id="b1", n_groups=4)
    props = b2.run(spark, corpus, input_snapshot="s1")
    assert props["build_id"] == "b1"

    # no bucket was done twice
    ck2 = b2.checkpoints.read(spark).toPandas()
    done = ck2[ck2.status == "done"].partition_id
    assert len(done) == CFG.n_buckets
    assert len(set(done)) == CFG.n_buckets
    assert done_before <= set(done)

    # resumed index == single-shot index, posting for posting
    resumed = _flatten(b2.segments.read(spark).toPandas())
    clean = _flatten(IndexBuild(clean_dir, CFG, build_id="bX").segments.read(spark).toPandas())
    assert resumed == clean

    # lineage recorded
    snap = b2.segments.current_snapshot()
    assert snap.properties["input_snapshot"] == "s1"
    assert snap.properties["build_id"] == "b1"

    # metrics persisted per bucket (B9)
    m = b2.metrics.read(spark).toPandas()
    assert set(m.partition_id) == set(range(CFG.n_buckets))
    assert (m.postings_per_sec > 0).all()
    assert (m["bytes"] > 0).sum() > 0


def test_noop_resume_is_cheap(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    b = IndexBuild(out, CFG, build_id="b2", n_groups=2)
    b.run(spark, corpus, input_snapshot="s2")
    v_before = b.segments.current_version()
    b.run(spark, corpus, input_snapshot="s2")  # all buckets done -> no appends
    assert b.segments.current_version() == v_before
    reader = IndexReader(spark, out)
    assert reader.n_docs == 300
