"""defactonlp_spark — a from-scratch, PySpark-native inverted-index + BM25
evidence-retrieval engine with the query/data-processing capabilities of
DeFacto/DeFactoNLP's TF-IDF retrieval core (see SURVEY.md).

Architecture (Spark-first, not a port):

- ``sources/``    table IO (Iceberg-style manifests over parquet), fixture generators
- ``functions/``  vectorized kernels: html->text extraction, tokenization,
                  varbyte compression, text statistics, minhash/simhash
- ``operators/``  engine operators: postings build, segment encode/merge,
                  exhaustive BM25, block-max WAND, dedup, similarity search
- ``plans/``      end-to-end pipelines: resumable index build, batch query
- ``streaming/``  incremental segment append (Trigger.AvailableNow)

Reference parity notes: the reference mount ``/root/reference`` is empty in
this sandbox (SURVEY.md §0); semantics are pinned from the public
DeFacto/DeFactoNLP repo + DrQA (arXiv:1809.00509) at file level only.
"""

__version__ = "0.1.0"

from defactonlp_spark.config import BM25Params, EngineConfig  # noqa: F401
