"""Incremental index refresh via Structured Streaming.

The north rule is batch (build + resume); the reference has no streaming at
all (SURVEY.md §2.C). This module is the documented scale path for CONTINUOUS
corpora: new page files land in a directory, each micro-batch becomes a new
SEGMENT GENERATION appended to the segments table, and a periodic
``merge_segments`` compacts generations (the LSM pattern).

Design notes:
- ``Trigger.AvailableNow`` drains what exists and stops — the right trigger
  for scheduled incremental builds (no long-running driver);
- ``foreachBatch`` gives each micro-batch a normal batch DataFrame, so the
  EXACT batch encode path (tokenize -> salt -> encode_segments) is reused —
  no second implementation to keep in sync;
- corpus stats (N, avgdl) drift as generations accumulate; block-max scores
  are recomputed from the merged stats at compaction time (merge_segments
  already does this), so WAND bounds stay sound after every compaction.
  Between compactions, queries use the manifest stats of the last
  compaction — scores are consistent, coverage lags by <1 generation.
- no event-time windows/watermarks are needed: the index is an append-only
  monoid, not a windowed aggregation. Late files simply join the next batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.segments import encode_segments
from defactonlp_spark.sources.tableio import LocalTable


def start_incremental_build(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema,
    cfg: EngineConfig | None = None,
    checkpoint_dir: str | None = None,
    reader_options: dict[str, str] | None = None,
):
    """Stream parquet page files from ``input_dir``; append one segment
    generation per micro-batch. Returns the StreamingQuery (AvailableNow).

    ``reader_options``: file-source options (e.g. ``maxFilesPerTrigger`` to
    bound micro-batch size — at scale one generation per ~N files keeps the
    per-batch encode shuffle small and the compaction cadence predictable).
    """
    cfg = cfg or EngineConfig()
    table = LocalTable(f"{out_dir}/segments")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        corpus = batch_df
        postings = P.build_postings(corpus)
        stats = P.term_stats(postings)
        cs = P.corpus_stats(postings).collect()[0]
        n_docs, avgdl = int(cs["n_docs"]), float(cs["avgdl"])
        plan = P.salt_plan(stats, n_docs, cfg)
        seg = encode_segments(P.with_salt(postings, plan), stats, n_docs, avgdl, cfg)
        table.append(seg, properties={"batch_id": batch_id, "n_docs": n_docs, "avgdl": avgdl})

    reader = spark.readStream.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir or f"{out_dir}/_stream_checkpoint")
        .start()
    )
