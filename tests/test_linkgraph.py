"""Link-graph PageRank: mass conservation, dangling redistribution,
damping limit cases, determinism, and the synthetic edge contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.operators.linkgraph import (
    PR_OUT_DEGREE,
    link_pagerank_topn,
    pagerank,
    synthetic_edges,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_synthetic_edges_shape(spark, docs):
    n = docs.count()
    e = synthetic_edges(docs, n).toPandas()
    assert (e.src != e.dst).all()
    assert e.dst.between(0, n - 1).all()
    assert len(e) == len(e.drop_duplicates())
    # out-degree at most PR_OUT_DEGREE (collisions/self-loops may lower it)
    assert e.groupby("src").size().max() <= PR_OUT_DEGREE


def test_rank_mass_conserved(spark, docs):
    """With dangling-mass redistribution the ranks stay a probability
    distribution: sum(pr) == 1 within float tolerance, every pr > 0."""
    n = docs.count()
    nodes = docs.select(F.col("doc_id").alias("id"))
    edges = synthetic_edges(docs, n)
    pr = pagerank(nodes, edges, n, iters=5).toPandas()
    assert len(pr) == n
    assert abs(pr.pr.sum() - 1.0) < 1e-9
    assert (pr.pr > 0).all()


def test_dangling_node_redistribution(spark):
    """3-node chain a->b->c: c is dangling; its mass must recycle
    uniformly (classic random-surfer fix), keeping sum(pr)=1 and giving
    b more rank than a (b has an in-edge, a only teleport + recycle)."""
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    pr = pagerank(nodes, edges, 3, iters=20).toPandas().set_index("id")
    assert abs(pr.pr.sum() - 1.0) < 1e-9
    assert pr.loc[1, "pr"] > pr.loc[0, "pr"]
    assert pr.loc[2, "pr"] > pr.loc[1, "pr"]  # chain accumulates


def test_no_damping_is_uniform(spark):
    """damping=0 -> pure teleport: every node gets exactly 1/N."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    pr = pagerank(nodes, edges, 4, damping=0.0, iters=3).toPandas()
    assert (abs(pr.pr - 0.25) < 1e-12).all()


def test_topn_entry_shape_and_determinism(spark, docs):
    a = link_pagerank_topn(docs, topn=20).toPandas()
    b = link_pagerank_topn(docs, topn=20).toPandas()
    assert a.equals(b)
    assert list(a.columns) == ["rank", "doc_id", "pr_scaled"]
    assert list(a["rank"]) == list(range(1, 21))
    # scaled ranks are O(1) by construction (pr * N)
    assert a.pr_scaled.between(0.0, 10.0).all()
    # descending, ties broken by doc_id ascending
    for i in range(1, len(a)):
        prev, cur = a.iloc[i - 1], a.iloc[i]
        assert (cur.pr_scaled < prev.pr_scaled) or (
            cur.pr_scaled == prev.pr_scaled and cur.doc_id > prev.doc_id
        )
