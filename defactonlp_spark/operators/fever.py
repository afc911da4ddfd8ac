"""A18 — FEVER scorer: label accuracy, evidence recall, FEVER score.

Reference behavior (fever-scorer [P, file-level]): a claim is FEVER-correct
iff its predicted label is right AND (for non-NEI claims) at least one full
gold evidence SET is contained in the predicted evidence@k.

Inputs:
  predictions(claim_id, predicted_label,
              predicted_evidence: array<struct<page string, sent_idx int>>)
  gold(claim_id, label,
       evidence: array<array<struct<annot_id long, ev_id long,
                                    page string, sent_idx int>>>)

Pure DataFrame set algebra: explode gold evidence SETS (outer arrays),
check per-set containment with ``forall`` over the set's members against
the predicted array, then aggregate per claim and globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEI = "NOT ENOUGH INFO"


def fever_score(predictions: DataFrame, gold: DataFrame, max_evidence: int = 5) -> DataFrame:
    """One row: (n, label_accuracy, evidence_recall, fever_score)."""
    pred = predictions.select(
        "claim_id",
        "predicted_label",
        F.slice(
            F.transform(
                F.col("predicted_evidence"),
                lambda e: F.concat_ws("#", e["page"], e["sent_idx"].cast("string")),
            ),
            1,
            max_evidence,
        ).alias("pred_keys"),
    )
    # a gold SET is satisfied iff every (page, sent_idx) member is predicted;
    # evaluated AFTER the join so pred_keys is in scope
    joined = gold.join(pred, "claim_id", "left").select(
        "claim_id",
        "label",
        "predicted_label",
        F.coalesce(
            F.exists(
                F.col("evidence"),
                lambda ev_set: F.forall(
                    ev_set,
                    lambda m: F.array_contains(
                        F.col("pred_keys"),
                        F.concat_ws("#", m["page"], m["sent_idx"].cast("string")),
                    ),
                ),
            ),
            F.lit(False),
        ).alias("set_hit"),
    )
    per_claim = joined.select(
        "claim_id",
        (F.col("label") == F.col("predicted_label")).cast("int").alias("label_ok"),
        F.when(F.col("label") == NEI, F.lit(1))
        .otherwise(F.col("set_hit").cast("int"))
        .alias("evidence_ok"),
    ).withColumn("fever_ok", (F.col("label_ok") * F.col("evidence_ok")).alias("fever_ok"))
    return per_claim.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("label_ok"), 6).alias("label_accuracy"),
        F.round(F.avg("evidence_ok"), 6).alias("evidence_recall"),
        F.round(F.avg("fever_ok"), 6).alias("fever_score"),
    )
