"""spark-submit entry point for the index build + batch query job.

The north rule mandates the engine "runs via spark-submit --py-files on
multi-executor clusters". This is that entry point — no SparkSession.builder
master/config here: spark-submit supplies master, executor topology, and
deploy mode. Package the engine and submit:

    cd /root/repo && zip -qr /tmp/defactonlp_spark.zip defactonlp_spark
    spark-submit --master local[8] \
        --py-files /tmp/defactonlp_spark.zip \
        --conf spark.sql.shuffle.partitions=8 \
        scripts/submit_build.py \
        --pages /path/to/webpages.parquet \
        --out /path/to/index \
        --claims-out /path/to/results.parquet \
        --n-buckets 8 --n-claims 100

On a real cluster: --master yarn/k8s, --num-executors N; the job code is
identical (the engine never reads local paths except those given here).

Resumability: re-submitting with the same --out and --build-id skips
completed bucket groups (checkpoint table); see plans/build.py.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="input webpages parquet/dir (required unless --merge)")
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--build-id", default="submit")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--n-groups", type=int, default=4)
    ap.add_argument("--claims-out", default=None, help="if set, run fixture claims and write results")
    ap.add_argument("--n-claims", type=int, default=100)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--corpus-path", action="store_true",
                    help="use the extract-projection corpus path (doc-store jobs) "
                         "instead of the fused single-shuffle scale path")
    ap.add_argument("--id-offset", type=int, default=0,
                    help="doc-id base for this build's generation "
                         "(incremental appends pass generation * 2^50 so "
                         "generations stay id-disjoint for --merge)")
    ap.add_argument("--merge", nargs="+", default=None, metavar="SRC_DIR",
                    help="compact the given generation index dirs into --out "
                         "(skips the build; --pages is ignored)")
    args = ap.parse_args()

    # session comes from spark-submit; only app-level confs belong here
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("defactonlp-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from defactonlp_spark.config import EngineConfig
    from defactonlp_spark.plans.build import (
        IndexBuild,
        IndexReader,
        prepare_webpages,
        prepare_webpages_fused,
    )

    cfg = EngineConfig(n_buckets=args.n_buckets)
    if args.merge:
        from defactonlp_spark.plans.build import merge_builds

        t0 = time.time()
        props = merge_builds(spark, args.merge, args.out, cfg)
        result = {
            "n_docs": props["n_docs"],
            "merge_sec": round(time.time() - t0, 2),
            "generations": len(args.merge),
        }
    else:
        if not args.pages:
            ap.error("--pages is required unless --merge is given")
        pages = spark.read.parquet(args.pages)
        # fused single-shuffle scale path by default (same doc ids — parity
        # tests); --corpus-path keeps the extracted-text projection for jobs
        # that also sink a doc store
        if args.corpus_path:
            corpus = prepare_webpages(pages, id_strategy="partitioned")
        else:
            corpus = prepare_webpages_fused(pages)

        t0 = time.time()
        props = IndexBuild(
            args.out, cfg, build_id=args.build_id, n_groups=args.n_groups,
            id_offset=args.id_offset,
        ).run(spark, corpus, input_snapshot=args.pages)
        build_wall = time.time() - t0

        result = {
            "n_docs": props["n_docs"],
            "build_sec": round(build_wall, 2),
            "docs_per_sec": round(props["n_docs"] / build_wall, 1),
        }

    if args.claims_out:
        from defactonlp_spark.plans.query import query_wand
        from defactonlp_spark.sources.fixtures import gen_claims

        reader = IndexReader(spark, args.out)
        claims = spark.createDataFrame(gen_claims(args.n_claims)[["claim_id", "claim"]])
        t0 = time.time()
        res = query_wand(reader, claims, k=args.k, cfg=cfg)
        res.write.mode("overwrite").parquet(args.claims_out)
        result["query_sec"] = round(time.time() - t0, 2)
        result["result_rows"] = spark.read.parquet(args.claims_out).count()

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
