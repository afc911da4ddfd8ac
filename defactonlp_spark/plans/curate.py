"""One-pass corpus curation — the LLM-pretraining filter pipeline shape.

Composes the repo's per-doc curation operators into ONE pass over the
corpus: a single Python kernel computes every per-doc COUNT (tokens, alpha
chars, digits, stopword hits, chained PII counts) plus the repetition
metrics (functions/textstats.py::repetition_metrics_row — the same scalar
core as repetition_stats); Catalyst keeps only the ratio/round/gate
arithmetic over those integer-exact counts, so outputs are byte-identical
to the standalone JVM operators (test_curate). No joins, no shuffle, no
second corpus read: at 100 TB this is one scan + one Python stage, the
minimum any kernel-bearing curation pass can cost. (Gates follow the
Gopher/C4 recipe: token-count band, repetition caps, quality floor,
optional PII cap.)
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from defactonlp_spark.functions.pii import PII_PATTERNS
from defactonlp_spark.functions.textstats import (
    EN_STOPWORDS,
    repetition_metrics_row,
    sql_tokens_py,
)
from defactonlp_spark.session import floor_parallelism


@dataclass(frozen=True)
class CurationGates:
    """Keep a doc iff ALL hold (NULL text never keeps). The comparisons run
    on the 6-dp-rounded metric columns, so the DuckDB twin gates byte-equal
    values."""

    min_tokens: int = 5
    max_tokens: int = 100_000
    min_quality: float = 0.05
    max_dup_5gram_frac: float = 0.6
    max_top_bigram_frac: float = 0.6
    max_dup_line_frac: float = 0.5
    max_pii: int | None = None  # total matches across all PII families


_REP_FIELDS = ["rep_n_tokens", "dup_line_frac", "top_bigram_frac", "dup_5gram_frac"]


#: Python twins of the quality/PII counting expressions, compiled with
#: re.ASCII so \d / \b / \w match Java-regex DEFAULTS (Python's \d is
#: otherwise Unicode-wide). Counts are integers — engine-exact — and the
#: ratio/round/gate arithmetic stays in Catalyst, so curation_pass outputs
#: are byte-identical to the standalone JVM operators (test_curate parity).
_NONALPHA_RE = _re.compile(r"[^A-Za-z]+")
_DIGIT_RE = _re.compile(r"[0-9]+")
_STOP_RE = _re.compile(
    "(?<![a-z0-9])(?:" + "|".join(EN_STOPWORDS) + ")(?![a-z0-9])"
)
_PII_RES = [(name, _re.compile(pat, _re.ASCII), repl) for name, pat, repl in PII_PATTERNS]


def curation_pass(
    docs: DataFrame,
    gates: CurationGates = CurationGates(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_tokens, n_chars, quality, n_email, n_ipv4, n_phone,
    dup_line_frac, top_bigram_frac, dup_5gram_frac, keep).

    ONE Python kernel computes every per-doc COUNT (tokens, alpha chars,
    digits, stopword hits, the chained PII counts) alongside the repetition
    metrics; the JVM keeps only the ratio/round/gate expressions over those
    counts (copied from quality_feature_cols — integer inputs make them
    byte-identical to the standalone operators). The previous form computed
    the counts as ~8 full-text JVM regex passes in the projection FEEDING
    the kernel — measured ~100 s of the 320k corpus pass vs ~2 s for the
    kernel itself; the text crosses the Arrow boundary exactly once either
    way, so counting inside the kernel is free parallelism (the same
    boundary lesson as operators/dedup.py::minhash_signature).
    """
    id_field = docs.schema[id_col]
    prepared = floor_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    )
    count_fields = [
        "n_tokens", "n_chars", "alpha", "digits", "stop_hits",
    ] + [f"n_{name}" for name, _, _ in PII_PATTERNS]
    schema = StructType(
        [id_field]
        + [StructField(c, LongType()) for c in count_fields]
        + [StructField("dup_line_frac", DoubleType()),
           StructField("top_bigram_frac", DoubleType()),
           StructField("dup_5gram_frac", DoubleType())]
    )

    def kern(batches):
        for pdf in batches:
            counts: dict = {c: [] for c in count_fields}
            dline, topbi, dup5 = [], [], []
            for text in pdf["_text"]:
                if text is None:
                    for c in count_fields:
                        counts[c].append(None)
                    dline.append(None)
                    topbi.append(None)
                    dup5.append(None)
                    continue
                toks = sql_tokens_py(text)
                counts["n_tokens"].append(len(toks))
                n_ch = len(text)
                counts["n_chars"].append(n_ch)
                counts["alpha"].append(len(_NONALPHA_RE.sub("", text)))
                counts["digits"].append(n_ch - len(_DIGIT_RE.sub("", text)))
                counts["stop_hits"].append(len(_STOP_RE.findall(text.lower())))
                cur = text
                for name, cre, repl in _PII_RES:
                    counts[f"n_{name}"].append(len(cre.findall(cur)))
                    cur = cre.sub(repl, cur)
                _, dl_, tb, d5 = repetition_metrics_row(text, toks)
                dline.append(dl_)
                topbi.append(tb)
                dup5.append(d5)
            out = pd.DataFrame({id_col: pdf[id_col]})
            for c in count_fields:
                out[c] = pd.array(counts[c], dtype="Int64")
            out["dup_line_frac"] = pd.array(dline, dtype="Float64")
            out["top_bigram_frac"] = pd.array(topbi, dtype="Float64")
            out["dup_5gram_frac"] = pd.array(dup5, dtype="Float64")
            yield out

    raw = prepared.mapInPandas(kern, schema)
    # ratios + quality exactly as functions/textstats.py::quality_feature_cols,
    # fed by the kernel's integer counts instead of recomputing from text
    ntok = F.col("n_tokens")
    stop_ratio = F.when(ntok > 0, F.col("stop_hits").cast("double") / ntok).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(
        F.col("n_chars") > 0, F.col("alpha").cast("double") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    quality = F.round(
        F.when(ntok < 5, F.lit(0.0)).otherwise(
            F.least(
                F.greatest(
                    alpha_ratio * (F.lit(1.0) - F.greatest(stop_ratio - 0.5, F.lit(0.0))),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            )
        ),
        6,
    )
    metrics = raw.select(
        F.col(id_col),
        "n_tokens",
        "n_chars",
        quality.alias("quality"),
        *[F.col(f"n_{name}") for name, _, _ in PII_PATTERNS],
        "dup_line_frac",
        "top_bigram_frac",
        "dup_5gram_frac",
    )
    g = gates
    keep = (
        (F.col("n_tokens") >= g.min_tokens)
        & (F.col("n_tokens") <= g.max_tokens)
        & (F.col("quality") >= g.min_quality)
        & (F.col("dup_5gram_frac") <= g.max_dup_5gram_frac)
        & (F.col("top_bigram_frac") <= g.max_top_bigram_frac)
        & (F.col("dup_line_frac") <= g.max_dup_line_frac)
    )
    if g.max_pii is not None:
        total_pii = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0))
        keep = keep & (total_pii <= g.max_pii)
    return metrics.withColumn("keep", F.coalesce(keep, F.lit(False)))


def prepare_training_set(
    docs: DataFrame,
    budgets: dict[str, int],
    gates: CurationGates = CurationGates(),
    eval_docs: DataFrame | None = None,
    dedup_n: int = 3,
    decontam_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The complete LLM training-set preparation pipeline as ONE composed
    plan — the end-to-end path a pretraining data team runs:

        1. quality gates   (curation_pass: Gopher/C4 quality+repetition+PII)
        2. near-dup dedup  (minhash LSH pairs -> connected components ->
                            keep-min-id rule)
        3. decontamination (drop docs sharing any n-gram with eval_docs)
        4. dataset mixing  (training_mix: per-source token budgets)

    Returns one row per input doc with CUMULATIVE survival flags
    (keep_curation >= keep_dedup >= keep_decontam >= keep_mix == keep):

        (doc_id, source, n_tokens, keep_curation, keep_dedup,
         keep_decontam, keep_mix, keep)

    Each stage runs only over the previous stage's survivors — exactly the
    production cost shape (dedup never hashes garbage the gates already
    killed; the mix never budgets contaminated docs). Every stage is the
    repo's oracle-checked operator; the composition itself is DuckDB-
    twinned end-to-end in the driver harness (`training_pipeline_stats`).

    Scale notes: stage flags join back on the id — hash joins on a
    high-entropy key; the minhash/LSH/star-contraction core touches only
    survivor ids and signatures; broadcast is used only for the eval
    n-gram set (guarded) and the per-(source,bucket) mix offsets.
    """
    from defactonlp_spark.operators.curation import training_mix
    from defactonlp_spark.operators.dedup import (
        _track_persist,
        decontaminate,
        duplicate_clusters,
        minhash_lsh_pairs,
        minhash_signature,
    )

    base = docs.select(id_col, source_col, text_col).join(
        curation_pass(docs, gates, id_col=id_col, text_col=text_col).select(
            id_col, F.col("keep").alias("keep_curation")
        ),
        id_col,
    )

    # registered with dedup.release_cached() — the documented long-session
    # release hook for operator-persisted intermediates
    s1 = _track_persist(base.filter(F.col("keep_curation")))
    sig = _track_persist(
        minhash_signature(s1, n=dedup_n, id_col=id_col, text_col=text_col)
    )
    dup = duplicate_clusters(s1, minhash_lsh_pairs(signatures=sig), id_col=id_col)
    flags = base.join(
        dup.select(id_col, F.col("keep").alias("_dup_keep")), id_col, "left"
    ).withColumn(
        "keep_dedup",
        F.col("keep_curation") & F.coalesce(F.col("_dup_keep"), F.lit(False)),
    )

    # flags fans out twice below (decontam input + join left side, then mix
    # input + final join left side). Catalyst issues no ReusedExchange across
    # those aliased branches, so without a persist the curation_pass text
    # kernel re-runs once per branch (4x at the leaves) — measured ~2.5x the
    # whole pipeline wall at 320k docs. Registered with release_cached().
    flags = _track_persist(flags)

    if eval_docs is not None:
        s2 = flags.filter(F.col("keep_dedup")).select(id_col, text_col)
        dec = decontaminate(
            s2, eval_docs, n=decontam_n, id_col=id_col, text_col=text_col
        )
        flags = _track_persist(
            flags.join(
                dec.select(id_col, (~F.col("contaminated")).alias("_clean")),
                id_col,
                "left",
            ).withColumn(
                "keep_decontam",
                F.col("keep_dedup") & F.coalesce(F.col("_clean"), F.lit(False)),
            )
        )
    else:
        flags = flags.withColumn("keep_decontam", F.col("keep_dedup"))

    s3 = flags.filter(F.col("keep_decontam")).select(id_col, source_col, text_col)
    mix = training_mix(s3, budgets, id_col=id_col, source_col=source_col)
    out = (
        flags.join(
            mix.select(
                id_col,
                F.col("n_tokens").alias("_mix_tokens"),
                F.col("keep").alias("_mix_keep"),
            ),
            id_col,
            "left",
        )
        .withColumn(
            "keep_mix",
            F.col("keep_decontam") & F.coalesce(F.col("_mix_keep"), F.lit(False)),
        )
        .withColumn(
            "n_tokens",
            F.coalesce(
                F.col("_mix_tokens"),
                F.regexp_count(F.col(text_col), F.lit("[A-Za-z0-9]+")).cast("long"),
            ),
        )
        .select(
            id_col,
            source_col,
            "n_tokens",
            "keep_curation",
            "keep_dedup",
            "keep_decontam",
            "keep_mix",
            F.col("keep_mix").alias("keep"),
        )
    )
    return out


def training_set_stats(
    docs: DataFrame,
    budgets: dict[str, int],
    **kwargs,
) -> DataFrame:
    """Per-source funnel of :func:`prepare_training_set`: cumulative
    survivor counts through every stage plus final kept tokens."""
    res = prepare_training_set(docs, budgets, **kwargs)
    return res.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep_curation").cast("long")).cast("long").alias("kept_curation"),
        F.sum(F.col("keep_dedup").cast("long")).cast("long").alias("kept_dedup"),
        F.sum(F.col("keep_decontam").cast("long")).cast("long").alias("kept_decontam"),
        F.sum(F.col("keep_mix").cast("long")).cast("long").alias("kept_mix"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_tokens"),
    )
