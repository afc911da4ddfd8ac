"""Fused curation pass (plans/curate.py): column parity with the
standalone operators and gate semantics."""

import pytest
from pyspark.sql import functions as F

from defactonlp_spark.functions.pii import redact_pii
from defactonlp_spark.functions.textstats import quality_features, repetition_stats
from defactonlp_spark.plans.curate import CurationGates, curation_pass

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),   # repetition
    (2, "ok"),                                                  # too short
    (3, None),                                                  # NULL text
    (4, "Contact me at a.user@mail.example.org or 10.0.0.1 for the "
        "complete quarterly report and the updated revenue projections"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_columns_match_standalone_operators(spark, docs):
    fused = curation_pass(docs).toPandas().set_index("doc_id").sort_index()
    q = quality_features(docs).toPandas().set_index("doc_id").sort_index()
    r = repetition_stats(docs).toPandas().set_index("doc_id").sort_index()
    p = redact_pii(docs).toPandas().set_index("doc_id").sort_index()
    for c in ("n_tokens", "n_chars", "quality"):
        assert fused[c].astype(object).equals(q[c].astype(object)), c
    for c in ("dup_line_frac", "top_bigram_frac", "dup_5gram_frac"):
        assert fused[c].astype(object).equals(r[c].astype(object)), c
    for c in ("n_email", "n_ipv4", "n_phone"):
        assert fused[c].astype(object).equals(p[c].astype(object)), c


def test_gate_semantics(spark, docs):
    rows = {r["doc_id"]: r for r in curation_pass(docs).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False  # top_bigram_frac = 1.0 > cap
    assert rows[2]["keep"] is False  # n_tokens < 5
    assert rows[3]["keep"] is False  # NULL text never keeps
    assert rows[4]["keep"] is True   # PII present but max_pii unset
    strict = {
        r["doc_id"]: r["keep"]
        for r in curation_pass(docs, CurationGates(max_pii=0)).collect()
    }
    assert strict[4] is False and strict[0] is True


def test_single_python_stage(spark, docs):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        curation_pass(docs).explain("formatted")
    plan = buf.getvalue()
    # formatted explain prints each node twice (tree line + detail header):
    # exactly ONE MapInPandas node = 2 mentions
    assert plan.count("MapInPandas") == 2
    assert "Join" not in plan


def test_training_mix_two_phase_equals_single_window(spark):
    """The bucketed two-phase prefix sum must pick EXACTLY the docs a single
    global per-source window would, and the choice must be partition-layout
    independent (repartitioned input -> same keep set)."""
    import hashlib

    import pandas as pd

    from defactonlp_spark.operators.curation import mix_stats, training_mix

    rng_rows = []
    for i in range(400):
        src = f"s{i % 3}"
        rng_rows.append((i, src, "tok " * ((i * 7) % 29 + 1)))
    docs = spark.createDataFrame(rng_rows, "doc_id long, source string, text string")
    budgets = {"s0": 500, "s1": 0, "s2": 100000}

    got = {
        r["doc_id"]: (r["keep"], r["n_tokens"])
        for r in training_mix(docs, budgets, n_buckets=16).collect()
    }
    assert len(got) == 400

    # scalar oracle: sort by (md5(source:id), id) within source, cumsum
    pdf = pd.DataFrame(rng_rows, columns=["doc_id", "source", "text"])
    pdf["n_tokens"] = pdf["text"].str.split().str.len()
    pdf["k"] = [
        hashlib.md5(f"{s}:{i}".encode()).hexdigest()
        for s, i in zip(pdf["source"], pdf["doc_id"])
    ]
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values(["k", "doc_id"])
        cum = 0
        for _, row in grp.iterrows():
            expect_keep = cum < budgets[src]
            cum += row["n_tokens"]
            assert got[row["doc_id"]] == (expect_keep, row["n_tokens"]), (
                src,
                row["doc_id"],
            )

    # partition-layout independence
    got2 = {
        r["doc_id"]: r["keep"]
        for r in training_mix(docs.repartition(7, "text"), budgets, n_buckets=4).collect()
    }
    assert got2 == {k: v[0] for k, v in got.items()}

    # budget overshoot bounded by one document; s1 keeps nothing; s2 keeps all
    stats = {r["source"]: r for r in mix_stats(docs, budgets).collect()}
    assert stats["s1"]["kept_docs"] == 0
    assert stats["s2"]["kept_docs"] == stats["s2"]["n_docs"]
    assert 500 <= stats["s0"]["kept_tokens"] <= 500 + 29


def test_training_mix_unbudgeted_source_dropped(spark):
    from defactonlp_spark.operators.curation import training_mix

    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y")], "doc_id long, source string, text string"
    )
    got = {r["doc_id"]: r["keep"] for r in training_mix(docs, {"a": 10}).collect()}
    assert got == {1: True, 2: False}


def test_prepare_training_set_composition(spark):
    """The composed pipeline's flags must equal manually chaining the four
    stage operators through the public API (each stage runs only over the
    previous stage's survivors), flags must be cumulative-monotone, and the
    funnel rollup must agree with the per-doc output."""
    from defactonlp_spark.operators.curation import training_mix
    from defactonlp_spark.operators.dedup import (
        decontaminate,
        duplicate_clusters,
        minhash_lsh_pairs,
        minhash_signature,
        release_cached,
    )
    from defactonlp_spark.plans.curate import (
        curation_pass,
        prepare_training_set,
        training_set_stats,
    )
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(160):
        src = f"s{i % 3}"
        if i % 17 == 0:
            text = "dup dup dup"  # fails gates (too short / repetitive)
        elif i % 11 == 0:
            text = " ".join(["spam"] * 40)  # fails top-bigram/dup5 gates
        else:
            text = " ".join(rng.choice(vocab, size=30))
        rows.append((i, src, text))
    # planted near-dup family (identical long docs -> all LSH bands collide)
    fam = " ".join(rng.choice(vocab, size=40))
    for j, i in enumerate((200, 201, 202)):
        rows.append((i, "s0", fam))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ev = spark.createDataFrame([(900, rows[5][2])], "doc_id long, text string")
    budgets = {"s0": 400, "s1": 10**9, "s2": 0}

    got = prepare_training_set(docs, budgets, eval_docs=ev).toPandas()
    g = got.set_index("doc_id").sort_index()

    # cumulative monotone flags
    assert ((g.keep_curation.astype(int) >= g.keep_dedup.astype(int)).all()
            and (g.keep_dedup.astype(int) >= g.keep_decontam.astype(int)).all()
            and (g.keep_decontam.astype(int) >= g.keep_mix.astype(int)).all())
    assert (g.keep == g.keep_mix).all()

    # manual chain through the public API
    cur = {r["doc_id"]: r["keep"] for r in curation_pass(docs).collect()}
    assert {i: k for i, k in zip(g.index, g.keep_curation)} == cur
    s1 = docs.filter(F.col("doc_id").isin([i for i, k in cur.items() if k]))
    dup = {
        r["doc_id"]: r["keep"]
        for r in duplicate_clusters(
            s1, minhash_lsh_pairs(signatures=minhash_signature(s1).persist())
        ).collect()
    }
    for i in g.index:
        assert bool(g.keep_dedup[i]) == (cur[i] and dup.get(i, False)), i
    s2 = s1.filter(F.col("doc_id").isin([i for i, k in dup.items() if k and cur[i]]))
    dec = {
        r["doc_id"]: not r["contaminated"]
        for r in decontaminate(s2, ev, n=3).collect()
    }
    for i in g.index:
        assert bool(g.keep_decontam[i]) == (
            bool(g.keep_dedup[i]) and dec.get(i, False)
        ), i
    s3 = s2.filter(F.col("doc_id").isin([i for i, c in dec.items() if c]))
    mix = {r["doc_id"]: r["keep"] for r in training_mix(s3, budgets).collect()}
    for i in g.index:
        assert bool(g.keep_mix[i]) == (
            bool(g.keep_decontam[i]) and mix.get(i, False)
        ), i

    # planted facts: the near-dup family keeps exactly its min id through
    # dedup; s2-source docs never survive the mix (budget 0); the eval twin
    # of doc 5 is dropped by decontamination
    assert bool(g.keep_dedup[200]) and not (g.keep_dedup[201] or g.keep_dedup[202])
    assert not g[g.source == "s2"].keep_mix.any()
    assert bool(g.keep_dedup[5]) and not bool(g.keep_decontam[5])

    # funnel rollup agrees with per-doc flags
    stats = {
        r["source"]: r for r in training_set_stats(docs, budgets, eval_docs=ev).collect()
    }
    for src, grp in got.groupby("source"):
        st = stats[src]
        assert st["n_docs"] == len(grp)
        assert st["kept_curation"] == int(grp.keep_curation.sum())
        assert st["kept_mix"] == int(grp.keep_mix.sum())
    release_cached()


def test_pack_sequences_matches_scalar_replay(spark):
    import hashlib

    from defactonlp_spark.operators.curation import pack_sequences

    rows = [(i, "tok " * (3 + (i * 7) % 40)) for i in range(211)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(docs, seq_len=64, n_buckets=16).collect()
    }
    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    excl = 0
    for doc_id, text in order:
        ntok = len(text.split())
        assert got[doc_id] == (ntok, excl // 64, excl % 64), doc_id
        excl += ntok
    # every sequence except possibly the last is exactly filled: total
    # boundary check via the final exclusive sum
    assert excl == sum(n for n, _, _ in got.values())


def test_pack_sequences_partition_layout_independent(spark):
    from defactonlp_spark.operators.curation import pack_sequences

    rows = [(i, "w " * (1 + i % 13)) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = pack_sequences(docs, seq_len=32, n_buckets=8).collect()
    b = pack_sequences(docs.repartition(7), seq_len=32, n_buckets=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
