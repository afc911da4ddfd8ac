"""E1 — the resumable index build (SURVEY.md §3.1, operators B3-B5, B8, B9).

Stage graph (boundaries = materializations, which double as checkpoints):

  corpus ->(tokenize mapInPandas)-> postings_long
         ->(write, partitioned by term-range bucket)        [stage: postings]
  per bucket-group: read its buckets (partition-pruned scan)
         ->(salt + repartitionByRange + sort + encode)-> segment rows
         ->(append to segments table, commit checkpoints)   [stage: bucket i]
  finally: manifest snapshot with corpus stats + lineage, metrics append.

Resumability: every bucket writes a checkpoint row
(build_id, partition_id, term_lo, term_hi, status, input_snapshot, rows,
bytes, wall_ms). A re-run with the same build_id skips buckets whose status
is 'done' — segments are append-committed via the LocalTable snapshot
protocol, so a crash between group commits leaves a readable, resumable
table. Lineage = input_snapshot (content fingerprint of the corpus read) +
engine code version, recorded in checkpoint rows and the manifest.

Why materialize postings_long: at 100 TB the tokenize pass is the most
expensive scan; persisting its output partitioned by bucket means a resumed
build (and every bucket-group job) re-reads only the buckets it needs —
partition pruning on `bucket=` paths — instead of re-tokenizing the corpus.
This is the same trade MapReduce makes by materializing the shuffle.

Skew: bucket boundaries are df-WEIGHTED term quantiles (equal postings per
bucket, not equal vocabulary), and head terms are additionally salted into
n_salts sub-lists before the range shuffle — the two mandated skew controls
(BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import defactonlp_spark
from defactonlp_spark.config import EngineConfig
from defactonlp_spark.operators import postings as P
from defactonlp_spark.operators.segments import encode_segments
from defactonlp_spark.sources.tableio import LocalTable

CHECKPOINT_COLS = (
    "build_id string, partition_id int, term_lo string, term_hi string, "
    "status string, input_snapshot string, rows long, bytes long, wall_ms long"
)
METRICS_COLS = (
    "build_id string, partition_id int, postings_per_sec double, rows long, "
    "bytes long, wall_ms long, ts double"
)


def bucket_boundaries(stats: DataFrame, n_buckets: int) -> list[str]:
    """df-weighted term-range boundaries: cut the term axis (sorted) into
    n_buckets ranges of roughly equal posting mass.

    Distributed two-phase prefix sum — NO global single-partition sort:
    range-partition the vocabulary on term, cumsum locally per partition
    (window partitioned by the range-partition id), collect only the P
    per-partition totals to the driver to form offsets, add them back via a
    broadcast join. Driver traffic is O(P + n_buckets) rows regardless of
    vocabulary size. Result is deterministic: the cumulative mass of a term
    depends only on the global term order, not on how ranges were sampled.
    """
    spark = stats.sparkSession
    P_parts = max(spark.sparkContext.defaultParallelism, 2)
    total = stats.agg(F.sum("df")).collect()[0][0] or 1

    parted = (
        stats.repartitionByRange(P_parts, "term")
        .withColumn("_pid", F.spark_partition_id())
    )
    partials = (
        parted.groupBy("_pid").agg(F.sum("df").alias("psum")).orderBy("_pid").collect()
    )
    off, offsets = 0, []
    for r in partials:
        offsets.append((r["_pid"], off))
        off += int(r["psum"])
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy("term").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        parted.withColumn("_local_cum", F.sum("df").over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("cum", F.col("_local_cum") + F.col("_off"))
    )
    bucketed = cum.withColumn(
        "bucket",
        F.least(
            F.floor((F.col("cum") - F.col("df")) * n_buckets / F.lit(float(total))),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )
    firsts = bucketed.groupBy("bucket").agg(F.min("term").alias("lo")).orderBy("bucket").collect()
    return [r["lo"] for r in firsts]


def bucket_expr(boundaries: list[str]):
    """bucket(term) = #boundaries <= term - 1 (pure expression, no join)."""
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.greatest(
        F.size(F.filter(arr, lambda b: b <= F.col("term"))) - F.lit(1), F.lit(0)
    ).cast("int")


def prepare_webpages(pages: DataFrame, id_strategy: str = "global") -> DataFrame:
    """(url, warc_ts, html, ...) -> corpus(doc_id, url, text, lang).
    Dedup to the latest crawl, extract text from html (B1), assign doc ids."""
    from defactonlp_spark.functions.extract import with_extracted_text

    latest = P.latest_per_url(pages)
    extracted = with_extracted_text(latest, "html", "text")
    return P.assign_doc_ids(extracted, strategy=id_strategy).select(
        "doc_id", "url", "text", "lang"
    )


class IndexBuild:
    def __init__(self, out_dir: str, cfg: EngineConfig | None = None, build_id: str | None = None, n_groups: int = 4):
        self.out_dir = out_dir
        self.cfg = cfg or EngineConfig()
        self.build_id = build_id or uuid.uuid4().hex[:12]
        self.n_groups = n_groups
        self.postings_dir = os.path.join(out_dir, "postings")
        self.segments = LocalTable(os.path.join(out_dir, "segments"))
        self.checkpoints = LocalTable(os.path.join(out_dir, "checkpoints"))
        self.metrics = LocalTable(os.path.join(out_dir, "metrics"))
        self.manifest = LocalTable(os.path.join(out_dir, "manifest"))

    # -- helpers -----------------------------------------------------------
    def _done_buckets(self, spark: SparkSession) -> set[int]:
        if not self.checkpoints.exists():
            return set()
        rows = (
            self.checkpoints.read(spark)
            .filter((F.col("build_id") == self.build_id) & (F.col("status") == "done"))
            .select("partition_id")
            .collect()
        )
        return {r["partition_id"] for r in rows}

    def run(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        input_snapshot: str = "unknown",
        fail_after_groups: int | None = None,
    ) -> dict:
        """Build (or resume) the index for ``corpus(doc_id, text, ...)``.

        Returns the manifest properties dict. ``fail_after_groups`` aborts
        after that many bucket-group commits (crash-injection for tests).
        """
        cfg = self.cfg
        t0 = time.time()
        lineage = {
            "build_id": self.build_id,
            "input_snapshot": input_snapshot,
            "code_version": defactonlp_spark.__version__,
        }

        # ---- stage 1: postings long table, partitioned by bucket ----------
        stats_path = os.path.join(self.out_dir, "term_stats")
        bounds_path = os.path.join(self.out_dir, "boundaries.json")
        if not (os.path.exists(self.postings_dir) and os.path.exists(bounds_path)):
            postings = P.build_postings(corpus)
            stats = P.term_stats(postings)
            stats.write.mode("overwrite").parquet(stats_path)
            stats = spark.read.parquet(stats_path)
            boundaries = bucket_boundaries(stats, cfg.n_buckets)
            (
                postings.withColumn("bucket", bucket_expr(boundaries))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(self.postings_dir)
            )
            # pin the bucket map for resume: a resumed build MUST slice the
            # persisted postings with the exact boundaries they were written
            # with (atomic rename, same protocol as the manifest)
            tmp = bounds_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(boundaries, f)
            os.replace(tmp, bounds_path)
        stats = spark.read.parquet(stats_path)
        postings = spark.read.parquet(self.postings_dir)
        with open(bounds_path) as f:
            boundaries = json.load(f)

        cs = P.corpus_stats(postings).collect()[0]
        n_docs, avgdl, total_tokens = int(cs["n_docs"]), float(cs["avgdl"]), int(cs["total_tokens"])

        # ---- stage 2: per bucket-group encode + commit ---------------------
        done = self._done_buckets(spark)
        pending = [b for b in range(cfg.n_buckets) if b not in done]
        groups = [
            pending[i :: self.n_groups] for i in range(self.n_groups)
        ]
        groups = [g for g in groups if g]

        plan = P.salt_plan(stats, n_docs, cfg)
        committed = 0
        for g in groups:
            tg = time.time()
            part = postings.filter(F.col("bucket").isin(g))
            salted = P.with_salt(part.drop("bucket"), plan)
            seg = encode_segments(
                salted, stats, n_docs, avgdl, cfg,
                n_partitions=max(len(g), 1),
            ).withColumn("bucket", bucket_expr(boundaries))
            self.segments.append(seg, properties={**lineage, "buckets": g})
            wall_ms = int((time.time() - tg) * 1000)

            seg_now = self.segments.read(spark).filter(F.col("bucket").isin(g))
            per_bucket = (
                seg_now.groupBy("bucket")
                .agg(
                    F.sum("n").alias("rows"),
                    F.sum(
                        F.length("docs_blob") + F.length("tfs_blob") + F.length("dls_blob")
                    ).alias("bytes"),
                    F.min("term").alias("term_lo"),
                    F.max("term").alias("term_hi"),
                )
                .collect()
            )
            found = {r["bucket"]: r for r in per_bucket}
            ck_rows, m_rows = [], []
            share = max(wall_ms // max(len(g), 1), 1)
            for b in g:
                r = found.get(b)
                rows = int(r["rows"]) if r else 0
                nbytes = int(r["bytes"]) if r else 0
                ck_rows.append(
                    (self.build_id, b, r["term_lo"] if r else None, r["term_hi"] if r else None,
                     "done", input_snapshot, rows, nbytes, share)
                )
                m_rows.append(
                    (self.build_id, b, rows / (share / 1000.0), rows, nbytes, share, time.time())
                )
            self.checkpoints.append(spark.createDataFrame(ck_rows, CHECKPOINT_COLS))
            self.metrics.append(spark.createDataFrame(m_rows, METRICS_COLS))
            committed += 1
            if fail_after_groups is not None and committed >= fail_after_groups:
                raise RuntimeError(f"injected failure after {committed} group commits")

        props = {
            **lineage,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "total_tokens": total_tokens,
            "n_buckets": cfg.n_buckets,
            "boundaries": boundaries,
            "k1": cfg.bm25.k1,
            "b": cfg.bm25.b,
            "block_size": cfg.block_size,
            "wall_s": time.time() - t0,
        }
        self.manifest.overwrite(
            spark.createDataFrame([(self.build_id,)], "build_id string"), properties=props
        )
        return props


class IndexReader:
    """Open a built index: segments DF + the manifest stats the scorers need."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.table = LocalTable(os.path.join(out_dir, "segments"))
        snap = LocalTable(os.path.join(out_dir, "manifest")).current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no manifest in {out_dir}")
        self.props = snap.properties
        self.n_docs = int(self.props["n_docs"])
        self.avgdl = float(self.props["avgdl"])

    def segments(self) -> DataFrame:
        return self.table.read(self.spark)
