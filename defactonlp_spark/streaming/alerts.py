"""Streaming percolator — saved-search alerting over a document stream.

The percolator's production deployment: alert rules are STORED queries,
documents ARRIVE continuously, and every new document must be matched
against every rule ("tell me when a crawled page matches my saved
search"). The batch operator (operators/bm25.py::percolate, and the
bool-query percolate_v2) is stateless by design, so the streaming form is
the textbook foreachBatch composition:

- new page files land in a directory (the same file-source contract as
  streaming/incremental.py);
- each micro-batch is a NORMAL batch DataFrame inside ``foreachBatch`` —
  the exact batch tokenize + percolate path is reused, no second matching
  implementation to keep in sync;
- matches append to a parquet sink with the micro-batch id stamped on, so
  downstream consumers (notifiers, routers) can checkpoint on batch_id;
- ``Trigger.AvailableNow`` drains what exists and stops — right for both
  tests and scheduled alerting sweeps; a live deployment drops the
  trigger for continuous micro-batches.

Stateless-per-batch is semantically CORRECT here, not a shortcut: a
percolator match depends only on the document and the rule table — no
cross-batch state, no watermark, no window. Exactly-once lands on the
sink's idempotent (batch_id-keyed) append plus the checkpoint dir.

Rule-table refresh: rules are read ONCE and broadcast per batch; a
deployment that must hot-reload rules re-reads inside ``foreachBatch``
(documented trade: one tiny parquet read per micro-batch).

Scale: per batch the work is one tokenize pass over the batch's pages +
the broadcast rule join — identical cost to the batch percolator at batch
size; rules are query-sized, never corpus-sized; nothing accumulates in
executor state between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from defactonlp_spark.functions.tokenize import tokenize_postings

PAGES_SCHEMA = "doc_id long, text string"


def percolate_batch(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """One micro-batch's matches: tokenize the batch's pages and run the
    stateless conjunctive percolator against the broadcast rule table.
    -> (doc_id, query_id, n_terms)."""
    from defactonlp_spark.operators.bm25 import percolate

    return percolate(tokenize_postings(pages), rules)


def start_streaming_percolator(
    spark: SparkSession,
    input_dir: str,
    rules: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream parquet page files from ``input_dir``; append each
    micro-batch's (doc_id, query_id, n_terms, batch_id) matches to
    ``out_dir``. Returns the StreamingQuery (caller awaits/stops)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            percolate_batch(batch_df, rules)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
