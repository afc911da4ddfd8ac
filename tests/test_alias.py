"""Index aliases (plans/alias.py): atomic blue-green swap contract.

- open_alias serves the pointed-at index; a flip changes results at the
  next open with NO change to serving code;
- half-built directories (no manifest) are refused;
- rollback returns to the previous distinct target;
- history records every flip with increasing versions.
"""

from __future__ import annotations

import os

import pytest

from defactonlp_spark.config import EngineConfig
from defactonlp_spark.plans.alias import (
    alias_history,
    open_alias,
    read_alias,
    rollback_alias,
    set_alias,
)
from defactonlp_spark.plans.build import IndexBuild
from defactonlp_spark.plans.query import query_wand

CFG = EngineConfig(n_buckets=4)


def _build(spark, out, tag, n):
    docs = spark.createDataFrame(
        [(i, f"{tag} merge join term{i % 5} window") for i in range(n)],
        "doc_id long, text string",
    )
    IndexBuild(out, CFG, build_id=tag).run(spark, docs, input_snapshot=tag)
    return out


def test_alias_swap_and_rollback(spark, tmp_path):
    blue = _build(spark, str(tmp_path / "blue"), "blue", 40)
    green = _build(spark, str(tmp_path / "green"), "green", 60)
    alias = str(tmp_path / "prod.alias")

    set_alias(alias, blue)
    claims = spark.createDataFrame([(0, "merge join")], "claim_id long, claim string")
    r_blue = open_alias(spark, alias)
    assert r_blue.n_docs == 40
    assert query_wand(r_blue, claims, k=3, cfg=CFG).count() == 3

    # blue-green flip: same alias, new index, next open serves green
    rec = set_alias(alias, green)
    assert rec["version"] == 2
    r_green = open_alias(spark, alias)
    assert r_green.n_docs == 60

    # rollback returns to blue
    rb = rollback_alias(alias)
    assert rb["index_dir"] == os.path.abspath(blue)
    assert open_alias(spark, alias).n_docs == 40

    versions = [h["version"] for h in alias_history(alias)]
    assert versions == [1, 2, 3]
    # pointer file is the current record
    assert read_alias(alias)["version"] == 3


def test_alias_refuses_incomplete_build(tmp_path):
    half = tmp_path / "half_built"
    half.mkdir()
    with pytest.raises(FileNotFoundError):
        set_alias(str(tmp_path / "a.alias"), str(half))


def test_rollback_without_prior_target_raises(spark, tmp_path):
    idx = _build(spark, str(tmp_path / "only"), "only", 30)
    alias = str(tmp_path / "solo.alias")
    set_alias(alias, idx)
    with pytest.raises(ValueError):
        rollback_alias(alias)
