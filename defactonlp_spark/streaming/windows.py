"""Event-time streaming aggregation + custom stateful operators.

The north rule needs no event-time windows (the index is an append-only
monoid — see incremental.py), but a training-data pipeline over live crawl
feeds does: crawl-rate monitoring, per-host politeness counters, dedup
state. These are the Structured-Streaming building blocks, each with the
idiomatic construct:

- ``windowed_crawl_counts``: tumbling event-time windows with a WATERMARK —
  late rows beyond the watermark are DROPPED by Spark, the canonical
  late-data policy; append output mode emits a window only once it is
  final (watermark passed), which is exactly the semantics an append-only
  metrics table needs.
- ``stateful_url_seen``: ``applyInPandasWithState`` — per-key custom state
  (first-seen timestamp + running count per host), the pattern for
  streaming dedup / rate limiting where built-in aggregations can't
  express the per-group logic.

Both are exercised by tests/test_streaming_window.py on file sources with
``Trigger.AvailableNow`` (deterministic drains, no long-running driver).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_SCHEMA = "host string, n_events long, first_seen string"
SEEN_STATE_SCHEMA = "n long, first_seen string"


def windowed_crawl_counts(
    pages_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Pages-per-host per tumbling event-time window, late data dropped
    beyond the watermark. Returns a streaming DataFrame (append mode)."""
    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1).alias("host")
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), host)
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "host",
            "n_pages",
        )
    )


def _seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    n, first_seen = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_min = str(pdf["warc_ts"].min())
        if first_seen is None or batch_min < first_seen:
            first_seen = batch_min
    state.update((n, first_seen))
    yield pd.DataFrame({"host": [host], "n_events": [n], "first_seen": [first_seen]})


def stateful_url_seen(pages_stream: DataFrame) -> DataFrame:
    """Per-host running (count, first-seen) via applyInPandasWithState —
    the custom-stateful-operator pattern (streaming dedup / politeness)."""
    host = F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1).alias("host")
    keyed = pages_stream.select(host, "url", "warc_ts")
    return keyed.groupBy("host").applyInPandasWithState(
        _seen_fn,
        outputStructType=SEEN_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="update",
        # NoTimeout: a processing-time TTL keeps the AvailableNow drain
        # alive waiting for timeouts to fire — production eviction belongs
        # to a periodic compaction pass, not the micro-batch loop
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> None:
    """Drain an AvailableNow query into an in-memory table (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

DEDUP_SCHEMA = "text_md5 string, doc_url string, warc_ts string"
DEDUP_STATE_SCHEMA = "seen boolean"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_md5,) = key
    if state.exists:
        # hash already emitted in an earlier micro-batch: drop everything
        return
    first = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["warc_ts", "url"])
        head = (str(pdf["url"].iloc[0]), str(pdf["warc_ts"].iloc[0]))
        if first is None or (head[1], head[0]) < (first[1], first[0]):
            first = head
    state.update((True,))
    yield pd.DataFrame(
        {"text_md5": [text_md5], "doc_url": [first[0]], "warc_ts": [first[1]]}
    )


def streaming_dedup(pages_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Cross-micro-batch EXACT dedup over a live crawl feed: emit each
    distinct document text exactly ONCE (its first occurrence by
    (warc_ts, url)), suppress every later arrival forever — the streaming
    twin of operators/dedup.py::exact_dedup, via applyInPandasWithState.

    State per distinct md5(text) is one boolean — the minimal streaming
    dedup ledger; the state store shards it by the md5 key (uniform, no
    skew). Built-in ``dropDuplicates`` on a stream needs a watermark and
    forgets keys when it passes; this keeps keys indefinitely (the ledger
    IS the product: at web scale you bound it with a periodic compaction
    into the batch dedup table, same lifecycle note as stateful_url_seen).
    Output mode: APPEND — a hash emits exactly once ever, so every row is
    final, which is what lets this feed file sinks (parquet/Iceberg)
    directly.
    """
    keyed = pages_stream.select(
        F.md5(F.col(text_col)).alias("text_md5"), "url", "warc_ts"
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
