"""A16/A17 — RTE batch inference over (claim, sentence) pairs + per-claim
label aggregation.

Reference semantics (SURVEY.md §2.A16-A17, [P] arXiv:1809.00509): DeFactoNLP
runs an AllenNLP decomposable-attention model over every retrieved (claim,
sentence) pair -> {SUPPORTS, REFUTES, NOT ENOUGH INFO} scores, then a
classifier/rule layer aggregates per-sentence verdicts into the claim label.
Model weights are unavailable in this offline sandbox, so the MODEL is a
loudly-marked deterministic fake; the SPARK SURFACE is real and what this
module actually pins:

- batch inference as one ``mapInPandas`` stage (Arrow batches in, label rows
  out — exactly where a torch/AllenNLP ``model(batch)`` forward would slot,
  same shape as functions/multimodal.py's codec stub);
- aggregation as a plain relational groupBy + deterministic argmax.

Fake model contract (DuckDB-reproducible, so the driver oracle checks the
WHOLE pipeline end to end): h = sha256(claim || '|' || sentence), the three
8-hex-char slices h[0:8], h[8:16], h[16:24] are the class "logits" for
(SUPPORTS, REFUTES, NOT ENOUGH INFO), and the label is the argmax — on
fixed-width lowercase hex, string comparison IS numeric comparison, so both
engines compute it with no int conversion. Slice ties (2^-32) break toward
the earlier class index.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: class order pins the logit-slice assignment AND the tie-break preference
RTE_LABELS = ("SUPPORTS", "REFUTES", "NOT ENOUGH INFO")


def rte_classify(
    pairs: DataFrame,
    claim_col: str = "claim",
    sentence_col: str = "sentence",
    fake: bool = True,
) -> DataFrame:
    """(.., claim, sentence) -> same rows + ``rte_label``.

    ``fake=False`` is the documented real-model slot: batch-forward an
    entailment model inside the same mapInPandas generator. No weights ship
    with this repo, so it raises — the deterministic fake exercises every
    piece of the distributed plumbing (schema, batching, shuffle-free map).
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pairs.schema.fields
    ) + ", rte_label string"
    cols = [f.name for f in pairs.schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real RTE model unavailable offline: load an entailment model "
                "here and replace the hash scorer with model(batch) logits"
            )
        for pdf in batches:
            if pdf.empty:
                continue
            digests = [
                hashlib.sha256(f"{c}|{s}".encode()).hexdigest()
                for c, s in zip(pdf[claim_col], pdf[sentence_col])
            ]
            labels = []
            for h in digests:
                slices = (h[0:8], h[8:16], h[16:24])
                labels.append(RTE_LABELS[max(range(3), key=lambda j: (slices[j], -j))])
            out = pdf[cols].copy()
            out["rte_label"] = labels
            yield out

    return pairs.mapInPandas(gen, schema=out_schema)


def label_aggregate(
    scored: DataFrame,
    claim_col: str = "claim_id",
    label_col: str = "rte_label",
) -> DataFrame:
    """A17: per-claim majority vote over sentence-level RTE labels.

    Deterministic argmax: most votes wins, ties break on the
    lexicographically smallest label — a window over the tiny per-claim
    label-count relation (<= 3 rows per claim), preceded by a partial+final
    hash aggregation, so the shuffle carries label counts, not sentences.

    Output: (claim_id, predicted_label, n_votes, n_sents).
    """
    counts = scored.groupBy(claim_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    totals = scored.groupBy(claim_col).agg(F.count(F.lit(1)).cast("long").alias("n_sents"))
    w = Window.partitionBy(claim_col).orderBy(F.desc("n_votes"), F.asc(label_col))
    best = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(claim_col, F.col(label_col).alias("predicted_label"), "n_votes")
    )
    return best.join(totals, claim_col)
