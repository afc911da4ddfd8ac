"""connected_components / duplicate_clusters vs a scalar union-find oracle.

The star-contraction algorithm (Kiveris et al. 2014) is easy to get subtly
wrong (a half-round that drops connectivity converges happily to WRONG
components), so every shape that historically breaks implementations is
pinned: long chains (diameter >> log n), cliques, star-already inputs,
duplicate/reversed/self-loop pairs, and randomized graphs.
"""

import random

import pandas as pd
import pytest

from defactonlp_spark.operators.dedup import connected_components, duplicate_clusters


def _uf_components(edges):
    """Scalar union-find oracle: {node: min-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _spark_components(spark, edges):
    pdf = pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    df = spark.createDataFrame(pdf)
    rows = connected_components(df).collect()
    got = {r["id"]: r["component_id"] for r in rows}
    assert len(rows) == len(got), "duplicate id rows in components output"
    return got


CASES = {
    "chain": [(i, i + 1) for i in range(60)],  # diameter 60 >> log n
    "clique": [(a, b) for a in range(8) for b in range(a + 1, 8)],
    "two_clusters": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "star_already": [(9, 0), (8, 0), (7, 0)],
    "dirty_pairs": [(5, 5), (3, 4), (4, 3), (3, 4), (100, 4)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_components_match_union_find(spark, name):
    edges = CASES[name]
    expect = _uf_components(e for e in edges if e[0] != e[1])
    assert _spark_components(spark, edges) == expect


def test_components_randomized(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 140))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _spark_components(spark, edges) == _uf_components(edges), (
            f"trial {trial}: {edges}"
        )


def test_components_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_duplicate_clusters_keep_rule(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(8))}).astype("int64")
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 1, 5], "id_b": [1, 2, 6]}).astype("int64")
    )
    got = {
        r["doc_id"]: (r["component_id"], r["keep"])
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert got == {
        0: (0, True),
        1: (0, False),
        2: (0, False),
        3: (3, True),
        4: (4, True),
        5: (5, True),
        6: (5, False),
        7: (7, True),
    }


def test_decontaminate_scalar_replay(spark):
    """decontaminate vs a scalar set-overlap replay (distinct n-gram
    shingles, same definition as the jaccard family)."""
    from defactonlp_spark.operators.dedup import decontaminate

    train = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "one two three four"),
        (2, "alpha beta gamma one two three"),   # hits both eval docs
        (3, "zeta eta theta"),
        (4, ""),                                  # too short: no shingles
        (5, "beta gamma delta beta gamma delta"), # repeated shingle counts once
    ]
    evals = [(100, "xx alpha beta gamma yy"), (101, "one two three")]
    docs = spark.createDataFrame(train, "doc_id long, text string")
    ev = spark.createDataFrame(evals, "doc_id long, text string")

    def sh3(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    ev_sh = set().union(*(sh3(t) for _, t in evals))
    expect = {
        i: len(sh3(t) & ev_sh) for i, t in train
    }
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, ev, n=3).collect()
    }
    assert got == {i: (h, h > 0) for i, h in expect.items()}


def test_pair_eval_counts_and_ratios(spark):
    from defactonlp_spark.operators.dedup import pair_eval

    pred = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 5), (4, 5), (6, 7)], "id_a long, id_b long"
    )  # (2,3) reversed; (4,5) duplicated -> 4 distinct normalized pairs
    truth = spark.createDataFrame(
        [(2, 1), (2, 3), (8, 9)], "id_a long, id_b long"
    )  # 3 pairs; tp = {1,2},{2,3} = 2
    r = pair_eval(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"], r["tp"]) == (4, 3, 2)
    assert r["precision"] == 0.5
    assert r["recall"] == round(2 / 3, 6)
    f1 = 2 * 0.5 * (2 / 3) / (0.5 + 2 / 3)
    import pytest as _pt
    assert r["f1"] == _pt.approx(round(f1, 6), abs=1e-6)


def test_pair_eval_empty_sides(spark):
    from defactonlp_spark.operators.dedup import pair_eval

    empty = spark.createDataFrame([], "id_a long, id_b long")
    some = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = pair_eval(empty, some).collect()[0]
    assert (r["n_pred"], r["tp"], r["precision"], r["f1"]) == (0, 0, 0.0, 0.0)
    r2 = pair_eval(some, empty).collect()[0]
    assert (r2["n_truth"], r2["recall"], r2["f1"]) == (0, 0.0, 0.0)


def test_dup_spans_planted_repeats(spark):
    """Planted spans: a 10-token passage shared by docs 0/1 (cross-doc), a
    6-token phrase repeated twice INSIDE doc 2 (within-doc), unique text
    elsewhere -> exactly the planted spans come back, maximally merged."""
    from defactonlp_spark.operators.dedup import dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    inner = "red orange yellow green blue violet"
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (0, uniq("a", 5) + " " + shared + " " + uniq("b", 5)),
            (1, uniq("c", 7) + " " + shared + " " + uniq("d", 3)),
            (2, inner + " " + uniq("e", 4) + " " + inner),
            (3, uniq("f", 30)),
        ],
        "doc_id long, text string",
    )
    L = 5
    got = {
        r["doc_id"]: (r["start_pos"], r["end_pos"], r["n_tokens"])
        for r in dup_spans(docs, gram_len=L).collect()
    }
    # doc 0: shared starts at token 5, 10 tokens -> [5, 14]
    assert got[0] == (5, 14, 10)
    # doc 1: shared starts at token 7 -> [7, 16]
    assert got[1] == (7, 16, 10)
    # doc 3 has no duplicated grams
    assert 3 not in got
    # doc 2: inner (6 tokens) at 0 and at 10; both occurrences are spans —
    # collect returns one row per span, so re-query without the dict
    rows = sorted(
        (r["start_pos"], r["end_pos"]) for r in
        dup_spans(docs, gram_len=L).filter("doc_id = 2").collect()
    )
    assert rows == [(0, 5), (10, 15)]


def test_decontaminate_spans_planted(spark):
    """Planted contamination: only spans whose every L-gram occurs in the
    EVAL set come back — corpus-internal duplication alone must not flag
    (the property that separates decontaminate_spans from dup_spans)."""
    from defactonlp_spark.operators.dedup import decontaminate_spans

    bench = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens, L=5
    inner = "red orange yellow green blue violet"
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            # full benchmark run at tokens 5..11
            (0, uniq("a", 5) + " " + bench + " " + uniq("b", 3)),
            # only a 4-token prefix of the benchmark (< gram_len) -> clean
            (1, uniq("c", 4) + " alpha beta gamma delta " + uniq("d", 4)),
            # corpus-internal duplicate NOT in the eval set -> clean
            (2, inner + " " + uniq("e", 4) + " " + inner),
            (3, inner + " " + uniq("g", 10)),
            # TWO disjoint benchmark hits -> two spans, not one merged
            (4, bench + " " + uniq("f", 6) + " " + bench),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "q1 q2 " + bench + " q3")], "eval_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_tokens"])
        for r in decontaminate_spans(docs, ev, gram_len=5).collect()
    )
    assert got == [(0, 5, 11, 7), (4, 0, 6, 7), (4, 13, 19, 7)]


def test_dup_spans_respects_min_gram_length(spark):
    from defactonlp_spark.operators.dedup import dup_spans

    # shared run of only 4 tokens < gram_len=5 -> no span anywhere
    docs = spark.createDataFrame(
        [(0, "one two three four x1 x2 x3"), (1, "one two three four y1 y2 y3")],
        "doc_id long, text string",
    )
    assert dup_spans(docs, gram_len=5).count() == 0
