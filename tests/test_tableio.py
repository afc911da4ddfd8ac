"""TableIO: the Iceberg shim's API shape under mocks (the runtime jar is
absent in-sandbox — the shim must lower EXACTLY onto the public Iceberg
Spark DSv2 surface so a cluster deployment is a drop-in) and the factory."""

from unittest import mock

import pytest

from defactonlp_spark.sources.tableio import IcebergTable, LocalTable, make_table


class _Recorder:
    """Chainable stub that records every (method, args) call."""

    def __init__(self, log, name=""):
        self.log, self.name = log, name

    def __getattr__(self, attr):
        def call(*args, **kw):
            self.log.append((f"{self.name}{attr}", args, kw))
            return _Recorder(self.log, self.name)

        return call


def test_factory():
    assert isinstance(make_table("/tmp/t", "localparquet"), LocalTable)
    t = make_table("lake.search.segments", "iceberg")
    assert isinstance(t, IcebergTable) and t.identifier == "lake.search.segments"
    with pytest.raises(ValueError):
        make_table("x", "deltalake")


class TestIcebergShim:
    def test_append_with_snapshot_properties(self):
        log = []
        df = mock.Mock()
        df.writeTo.return_value = _Recorder(log)
        IcebergTable("lake.db.seg").append(df, properties={"build_id": "b1", "buckets": [0, 1]})
        df.writeTo.assert_called_once_with("lake.db.seg")
        assert ("option", ("snapshot-property.build_id", "b1"), {}) in log
        assert ("option", ("snapshot-property.buckets", "[0, 1]"), {}) in log
        assert log[-1] == ("append", (), {})

    def test_overwrite_uses_create_or_replace(self):
        log = []
        df = mock.Mock()
        df.writeTo.return_value = _Recorder(log)
        IcebergTable("lake.db.manifest").overwrite(df, properties={"n_docs": 5})
        assert log[0] == ("using", ("iceberg",), {})
        assert ("option", ("snapshot-property.n_docs", "5"), {}) in log
        assert log[-1] == ("createOrReplace", (), {})

    def test_read_and_time_travel(self):
        spark = mock.Mock()
        t = IcebergTable("lake.db.seg")
        t.read(spark)
        spark.read.table.assert_called_once_with("lake.db.seg")
        t.read(spark, version=12345)
        spark.read.option.assert_called_once_with("snapshot-id", "12345")
        spark.read.option.return_value.table.assert_called_once_with("lake.db.seg")

    def test_exists_and_snapshots(self):
        spark = mock.Mock()
        t = IcebergTable("lake.db.seg")
        t.exists(spark)
        spark.catalog.tableExists.assert_called_once_with("lake.db.seg")
        t.snapshots(spark)
        spark.read.table.assert_called_once_with("lake.db.seg.snapshots")


def test_local_partitioned_append_read(spark, tmp_path):
    """Partitioned appends: hive layout on disk, partition column recovered
    on read, file-level PartitionFilters in the scan, spec pinned across
    appends."""
    import os

    from pyspark.sql import functions as F

    t = LocalTable(str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, 0, "a"), (2, 1, "b")], "id long, bucket int, v string")
    df2 = spark.createDataFrame([(3, 0, "c")], "id long, bucket int, v string")
    t.append(df1, partition_by=["bucket"])
    t.append(df2, partition_by=["bucket"])
    snap = t.current_snapshot()
    assert snap.partition_by == ["bucket"] and len(snap.dirs) == 2
    assert any("bucket=0" in f for f in snap.files)
    got = t.read(spark)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]
    assert dict(got.dtypes)["bucket"] == "int"
    # partition pruning reaches the scan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.filter(F.col("bucket") == 0).explain("formatted")
    assert "PartitionFilters: [" in buf.getvalue()
    # spec mismatch is refused
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.append(df2)


def test_upsert_replaces_by_key_and_time_travels(spark, tmp_path):
    from defactonlp_spark.sources.tableio import LocalTable

    t = LocalTable(str(tmp_path / "docs"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"))
    snap = t.upsert(
        spark,
        spark.createDataFrame([(2, "B2"), (4, "d")], "doc_id long, text string"),
        key_cols=["doc_id"],
    )
    assert snap.operation == "upsert" and snap.parent_id is not None
    now = {r["doc_id"]: r["text"] for r in t.read(spark).collect()}
    assert now == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # time travel: version 1 still reads the pre-upsert rows
    old = {r["doc_id"]: r["text"] for r in t.read(spark, version=1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_upsert_on_empty_table_is_overwrite(spark, tmp_path):
    from defactonlp_spark.sources.tableio import LocalTable

    t = LocalTable(str(tmp_path / "fresh"))
    snap = t.upsert(
        spark, spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        key_cols=["doc_id"],
    )
    assert snap.operation == "overwrite"
    assert t.read(spark).count() == 1


def test_snapshot_diff_add_remove_update(spark, tmp_path):
    from defactonlp_spark.sources.tableio import LocalTable

    t = LocalTable(str(tmp_path / "cdc"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"))
    # v2: 2 updated, 3 removed, 4 added (1 untouched)
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string"))
    diff = {
        (r["doc_id"], r["change"])
        for r in t.snapshot_diff(spark, 1, 2, ["doc_id"]).collect()
    }
    assert diff == {(4, "added"), (3, "removed"), (2, "updated")}
