"""Link-graph analytics over the web corpus: PageRank (and the shared
edge/out-degree relations a hyperlink graph needs).

At web scale the link graph is THE classic iterative Spark workload
(Brin & Page 1998; the power-iteration formulation with damping and
dangling-mass redistribution follows the standard treatment, e.g.
Langville & Meyer). Everything here is DataFrame algebra:

- one shuffle per iteration (the contribution groupBy on dst) plus the
  rank join — exactly the PageRank lower bound; no RDDs, no per-row
  Python.
- the dangling-node mass is a ONE-ROW aggregate crossJoin'd back
  (broadcast), never a driver round-trip inside the loop.
- lineage is cut with eager ``localCheckpoint`` every
  ``checkpoint_every`` iterations — the same guard the Kiveris
  connected-components loop uses (operators/dedup.py); without it 10+
  chained join-agg plans blow up Catalyst analysis time and executor
  stack depth at scale.

The corpus fixture has no href column, so the edge relation is
SYNTHESIZED deterministically from doc ids by pure integer arithmetic
(``synthetic_edges``): dst_j = (src * 1103 + j * 2477) mod N for
j = 1..out_degree, self-loops dropped, deduplicated. The formula is
engine-portable (same semantics in Spark SQL and DuckDB), which is what
makes the twin possible: the DuckDB oracle rebuilds the identical graph
and runs the identical power iteration as a programmatically UNROLLED
chain of CTEs (one pair of CTEs per iteration) — a full value-hash twin
for an iterative algorithm that would otherwise get only a rows-only
check. In production the same operators run over real (src, dst) edges
extracted from the HTML (functions/extract.py's link extraction slot);
only ``synthetic_edges`` is fixture-specific.

Float contract: ranks are reported scaled by N (so magnitudes are O(1))
and rounded to 6 dp; per-node in-degree is ~out_degree, so cross-engine
summation-order drift is ~1e-15 against a 5e-7 rounding quantum — the
same magnitude-vs-quantum argument every round-6 twin here relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_MULT_A = 1103
PR_MULT_B = 2477
PR_OUT_DEGREE = 5
PR_DAMPING = 0.85
PR_ITERS = 10


def synthetic_edges(
    docs: DataFrame,
    n_docs: int,
    out_degree: int = PR_OUT_DEGREE,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random directed edges over the doc-id space:
    dst_j = (src * A + j * B) mod N, j = 1..out_degree; self-loops
    dropped, (src, dst) deduplicated, and dst semi-joined back to the
    node set so non-contiguous id spaces cannot leak rank mass to
    nonexistent nodes. Pure codegen arithmetic — one projection + one
    distinct."""
    nodes = docs.select(F.col(id_col).cast("long").alias("id"))
    edges = (
        nodes.withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(out_degree))))
        .select(
            F.col("id").alias("src"),
            ((F.col("id") * PR_MULT_A + F.col("j") * PR_MULT_B) % n_docs).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )
    return edges.join(nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_docs: int,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Power iteration with damping and dangling-mass redistribution:

        r_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} r_t(u)/outdeg(u) + D_t/N )

    where D_t is the total rank held by dangling nodes (no out-edges).
    ``nodes`` must have column ``id``; ``edges`` columns (src, dst).
    Returns (id, pr) with raw (unscaled, unrounded) double ranks summing
    to ~1. One shuffle per iteration; dangling mass is a 1-row broadcast.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # (src, dst, deg) — materialized once, reused every iteration
    ed = edges.join(outdeg, "src").persist()
    dangling = nodes.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    base = (1.0 - damping) / n_docs

    ranks = nodes.withColumn("pr", F.lit(1.0 / n_docs))
    for t in range(iters):
        dm = dangling.join(ranks, "id").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("c"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dmass") / n_docs)
                ).alias("pr"),
            )
        )
        if (t + 1) % checkpoint_every == 0 and t + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks
    ed.unpersist()
    dangling.unpersist()
    return out


def link_pagerank_topn(
    docs: DataFrame,
    topn: int = 20,
    out_degree: int = PR_OUT_DEGREE,
    damping: float = PR_DAMPING,
    iters: int = PR_ITERS,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end fixture entry: synthesize the deterministic link graph,
    run ``iters`` damped power iterations, return the top-``topn`` docs.
    -> (rank, doc_id, pr_scaled) with pr_scaled = round(pr * N, 6) and
    ordering (pr_scaled desc, doc_id asc)."""
    n_docs = docs.count()
    nodes = docs.select(F.col(id_col).cast("long").alias("id"))
    edges = synthetic_edges(docs, n_docs, out_degree, id_col=id_col)
    pr = pagerank(nodes, edges, n_docs, damping=damping, iters=iters)
    scored = pr.select(
        F.col("id").alias("doc_id"), F.round(F.col("pr") * n_docs, 6).alias("pr_scaled")
    )
    # top-n via sort+limit (TakeOrderedAndProject: per-partition top-n,
    # driver merge of topn rows) — NOT an unpartitioned row_number window,
    # which would single-task the whole node set; the rank column is then
    # numbered over the topn-row result only.
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("pr_scaled"), F.asc("doc_id")).limit(topn)
    w = Window.orderBy(F.desc("pr_scaled"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "pr_scaled"
    )
