"""Event-time windows + watermark late-data policy + custom stateful
operator (streaming/windows.py) — the §2.C streaming checklist rows."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from defactonlp_spark.streaming.windows import (
    run_to_memory,
    stateful_url_seen,
    windowed_crawl_counts,
)

SCHEMA = "url string, warc_ts timestamp"


_MTIME = [1_700_000_000]


def _write(dirpath, name, rows):
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    path = os.path.join(dirpath, f"{name}.parquet")
    pq.write_table(tbl, path)
    # the file source orders micro-batches by modification time; same-ms
    # writes make batch order (and thus watermark progression) ambiguous
    _MTIME[0] += 60
    os.utime(path, (_MTIME[0], _MTIME[0]))


def _ts(minute: int):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


@pytest.fixture()
def feed(tmp_path):
    d = str(tmp_path / "feed")
    os.makedirs(d)
    return d


def test_windowed_counts_and_watermark_drop(spark, feed):
    # three files, drained one per micro-batch (maxFilesPerTrigger=1), so
    # the watermark advances BETWEEN batches:
    #   b0: base events (minutes 0-25)            -> watermark 00:05 after b1
    #   b1: advancer at minute 59                 -> watermark 00:39 at b2
    #   b2: filler — during ITS trigger the 00:39 watermark finalizes and
    #       EVICTS the [00:00,00:10) window (emitted with count 3)
    #   b3: late row at minute 2 — its window was already emitted+evicted,
    #       so the row must be DROPPED and the window must NOT re-emit.
    #       (Measured Spark 4 nuance: a late row landing in the SAME trigger
    #       where its window finalizes is still counted — the drop guarantee
    #       starts one trigger later; hence the filler batch.)
    _write(feed, "b0", [
        (f"https://a.test/p/{i}", _ts(m)) for i, m in enumerate([0, 5, 9, 12, 25])
    ] + [
        (f"https://b.test/p/{i}", _ts(15)) for i in range(2)
    ])
    _write(feed, "b1", [("https://a.test/p/new", _ts(59))])
    _write(feed, "b2", [("https://b.test/p/filler", _ts(60))])
    _write(feed, "b3", [("https://a.test/p/late", _ts(2))])
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(feed)
    counts = windowed_crawl_counts(stream, window="10 minutes", watermark="20 minutes")
    run_to_memory(counts, "wc2", "append")
    rows = spark.sql("select * from wc2").collect()
    final = {(r["window_start"], r["host"]): r["n_pages"] for r in rows}
    # append mode emits each window exactly once, on finalization
    assert len(rows) == len(final), "append must not re-emit a window"
    assert final[("2024-01-01 00:00:00", "a.test")] == 3   # 0,5,9 — late row NOT added
    assert final[("2024-01-01 00:10:00", "a.test")] == 1   # 12
    assert final[("2024-01-01 00:10:00", "b.test")] == 2   # 15,15
    assert final[("2024-01-01 00:20:00", "a.test")] == 1   # 25
    assert ("2024-01-01 00:50:00", "a.test") not in final  # not finalized yet


def test_stateful_url_seen(spark, feed):
    _write(feed, "b0", [
        ("https://a.test/p/1", _ts(10)),
        ("https://a.test/p/2", _ts(4)),
        ("https://b.test/p/1", _ts(7)),
    ])
    _write(feed, "b1", [
        ("https://a.test/p/3", _ts(20)),
    ])
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(feed)
    seen = stateful_url_seen(stream)
    run_to_memory(seen, "seen1", "update")
    rows = spark.sql(
        "select host, max(n_events) n, min(first_seen) f from seen1 group by host"
    ).collect()
    got = {r["n"]: None for r in rows}
    by_host = {r["host"]: (r["n"], r["f"]) for r in rows}
    # state accumulates ACROSS micro-batches: a.test ends at 3 events with
    # the earliest timestamp as first_seen
    assert by_host["a.test"][0] == 3
    assert by_host["a.test"][1].startswith("2024-01-01 00:04")
    assert by_host["b.test"][0] == 1


def test_streaming_dedup_first_occurrence_wins(spark, tmp_path):
    """Each distinct text emits exactly once across micro-batches — the
    first (warc_ts, url) occurrence — and a resumed drain over the same
    checkpoint emits nothing new for seen hashes."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from defactonlp_spark.streaming.windows import streaming_dedup

    feed = str(tmp_path / "dfeed")
    os.makedirs(feed)

    def write(name, rows):
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        path = os.path.join(feed, f"{name}.parquet")
        pq.write_table(tbl, path)
        _MTIME[0] += 60
        os.utime(path, (_MTIME[0], _MTIME[0]))

    # b0: A twice (u2 earlier ts wins), B once; b1: A again (dup), C new
    write("b0", [
        ("https://x/u1", _ts(10), "text A"),
        ("https://x/u2", _ts(5), "text A"),
        ("https://x/u3", _ts(7), "text B"),
    ])
    write("b1", [
        ("https://x/u4", _ts(1), "text A"),   # earlier ts but LATER batch: stays dropped
        ("https://x/u5", _ts(9), "text C"),
    ])

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain(_qname):
        # parquet sink: unlike the memory sink it RECOVERS from the
        # checkpoint, which is the whole point of the second drain below
        stream = (
            spark.readStream.schema("url string, warc_ts timestamp, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(feed)
        )
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    rows = drain("sd1")
    got = {r["doc_url"]: r["warc_ts"] for r in rows}
    assert len(rows) == 3 and set(got) == {
        "https://x/u2",
        "https://x/u3",
        "https://x/u5",
    }, rows

    # append one more batch: only the genuinely-new text may emit
    write("b2", [
        ("https://x/u6", _ts(2), "text B"),   # seen in a prior DRAIN: state persists
        ("https://x/u7", _ts(3), "text D"),
    ])
    rows2 = drain("sd2")
    # the sink is cumulative: the new drain may add ONLY the new text's row
    assert {r["doc_url"] for r in rows2} - {r["doc_url"] for r in rows} == {
        "https://x/u7"
    }, rows2
    assert len(rows2) == 4  # u6 ("text B", seen in drain 1) never re-emits
