"""Text analysis for training-data pipelines: quality scoring, language-id
heuristic, token counting, document fingerprinting.

Every operator has a direct ANSI-SQL twin in __spark_entry__.oracle_sql —
the md5-based fingerprint is reproducible in DuckDB verbatim. The scalar
features (counts, ratios) are pure Spark column expressions (whole-stage
codegen). ``fingerprint`` and ``lang_id`` iterate a per-element function
over token/gram arrays, which Catalyst evaluates INTERPRETED (higher-order
lambdas get no codegen), so their default paths are Arrow-batched kernels
over JVM-prepared inputs (lower/tokenize stay in the JVM — locale and
regex semantics are exactly Spark's); the `_sql`-suffixed twins keep the
pure-expression definition and are parity-tested byte-identical.

No reference analog (DeFactoNLP consumes curated wiki text); mandated by the
task's training-data-pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import re as _re

from defactonlp_spark.operators.dedup import tokens_col
from defactonlp_spark.session import floor_parallelism

#: Python twin of operators.dedup.tokens_col (lower + keep [a-z0-9]+ runs).
#: Kernels tokenize INSIDE Python from the shipped text instead of
#: Arrow-shipping a list<string> column: serializing ~600 small strings per
#: row cost 19-170 s for 320k webpages vs 1.6 s for the text itself.
_SQL_TOKEN_RE = _re.compile(r"[a-z0-9]+")


def sql_tokens_py(text):
    """tokens_col semantics, scalar (ASCII-equal to the JVM expression)."""
    return None if text is None else _SQL_TOKEN_RE.findall(text.lower())

# tiny per-language stopword marker lists (deterministic heuristic lang-id)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
    "de": ["der", "die", "und", "das", "ist"],
}
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def token_count_col(text_col: str = "text"):
    """Whitespace-ish token count (the pinned SQL-portable tokenizer)."""
    return F.size(tokens_col(text_col)).cast("long")


#: BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct runs with a
#: leading-space option) restricted to constructs RE2 and Java regex agree
#: on — no lookarounds, ASCII classes — so Spark and DuckDB produce the
#: SAME count (checked empirically by the `bpe_token_counts` oracle row).
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def bpe_token_count_col(text_col: str = "text"):
    """BPE-ish token count: number of pre-tokenizer matches — the standard
    fast estimate of LLM token cost per document (a real BPE merges within
    these pieces, so this upper-bounds word-level and tracks true token
    counts closely). Pure column expression, codegen."""
    return F.size(
        F.expr(f"regexp_extract_all({text_col}, '{BPE_PATTERN}', 0)")
    ).cast("long")


def quality_feature_cols(text_col: str = "text") -> dict:
    """The quality-feature expressions as a name->Column map, so composed
    plans (plans/curate.py) can inline them into one projection instead of
    joining a second pass."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast("double")
    # stopword hits via ONE codegen regexp_count, not size(filter(lambda)):
    # higher-order lambdas evaluate INTERPRETED per row — measured 77 s for
    # 320k webpages vs ~2 s for this regex. Zero-width [a-z0-9] lookarounds
    # reproduce the tokenizer's boundary rule exactly (incl. consecutive
    # stopwords); Java-regex-only is fine — the DuckDB twin counts via
    # list_filter on its side, the contract is equal COUNTS.
    stop_pat = "(?<![a-z0-9])(?:" + "|".join(EN_STOPWORDS) + ")(?![a-z0-9])"
    stop_hits = F.regexp_count(F.lower(F.col(text_col)), F.lit(stop_pat)).cast("double")
    # digit COUNT as a length difference after removing the RARE class:
    # regexp_replace(text, '[^0-9]', '') deletes ~every char (one regex
    # match + append per character — measured 75 s over 320k webpages);
    # removing just the digits matches a handful of chars per doc (~1 s)
    # and n_chars - len(rest) is the identical count.
    digits = (
        n_chars.cast("double")
        - F.length(F.regexp_replace(F.col(text_col), "[0-9]", "")).cast("double")
    )
    mean_tok_len = F.when(n_tok > 0, (alpha + digits) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    score = F.when(n_tok < 5, F.lit(0.0)).otherwise(
        F.least(F.greatest(alpha_ratio * (F.lit(1.0) - F.greatest(stop_ratio - 0.5, F.lit(0.0))), F.lit(0.0)), F.lit(1.0))
    )
    return {
        "n_tokens": n_tok,
        "n_chars": n_chars,
        "mean_tok_len": F.round(mean_tok_len, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "alpha_ratio": F.round(alpha_ratio, 6),
        "quality": F.round(score, 6),
    }


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: lengths, ratios, and a composite score.

    score = 0 if too short; else alpha_ratio * (1 - stop_excess) bounded to
    [0, 1] and rounded — a deterministic stand-in for a learned quality model.
    """
    cols = quality_feature_cols(text_col)
    return docs.select(
        F.col(id_col),
        cols["n_tokens"].alias("n_tokens"),
        cols["n_chars"].alias("n_chars"),
        cols["mean_tok_len"].alias("mean_tok_len"),
        cols["stopword_ratio"].alias("stopword_ratio"),
        cols["alpha_ratio"].alias("alpha_ratio"),
        cols["quality"].alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language-id: argmax over per-language marker hit counts,
    ties and zero-evidence -> 'und' (undetermined). Deterministic heuristic —
    real pipelines drop in fastText here; the Spark plumbing is identical.

    Fast path: tokens come from the JVM tokenizer; hit counting + argmax run
    in one Arrow-batched kernel (a Counter per doc, then 5 dictionary sums
    per language) instead of one interpreted ``filter(toks, isin)`` pass per
    language. Byte-identical to ``lang_id_sql`` (parity-tested, including
    NULL text: hits are NULL, pred is 'und' — matching size(filter(NULL)) =
    NULL in the expression twin); measured 3.9 s -> ~1 s at sf0.1."""
    id_field = docs.schema[id_col]
    schema = StructType(
        [StructField(id_field.name, id_field.dataType)]
        + [StructField(f"hits_{lang}", LongType()) for lang in LANG_MARKERS]
        + [StructField("pred_lang", StringType())]
    )
    markers = {lang: list(words) for lang, words in LANG_MARKERS.items()}
    langs = list(markers)

    def kern(batches):
        from collections import Counter

        for pdf in batches:
            hit_cols = {lang: [] for lang in langs}
            preds = []
            for toks in (sql_tokens_py(t) for t in pdf["_text"]):
                if toks is None:
                    # NULL text: the SQL twin's size(filter(NULL)) is NULL,
                    # and greatest(NULL..)>0 is never true -> pred 'und'
                    for lang in langs:
                        hit_cols[lang].append(None)
                    preds.append("und")
                    continue
                c = Counter(toks)
                hits = [sum(c[w] for w in markers[lang]) for lang in langs]
                for lang, h in zip(langs, hits):
                    hit_cols[lang].append(h)
                best = max(hits)
                preds.append(langs[hits.index(best)] if best > 0 else "und")
            out = {id_field.name: pdf[id_field.name]}
            for lang in langs:
                out[f"hits_{lang}"] = pd.array(hit_cols[lang], dtype="Int64")
            out["pred_lang"] = preds
            yield pd.DataFrame(out)

    prepared = floor_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    )
    return prepared.mapInPandas(kern, schema)


def lang_id_sql(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pure-Catalyst twin of ``lang_id`` (mirrors the DuckDB oracle SQL);
    interpreted higher-order filters — kept for the parity test and as
    executable documentation of the marker-count definition."""
    toks = tokens_col(text_col)
    hit_cols = {
        lang: F.size(F.filter(toks, lambda t: t.isin(words))).cast("long")
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later .when override
    for lang in reversed(list(hit_cols)):
        pred = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = docs.select(
        F.col(id_col),
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(
    docs: DataFrame,
    n: int = 5,
    n_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document fingerprint: minima of md5 over character n-gram shingles
    (winnowing-style content signature; portable to any SQL engine).

    fp_i = min over shingles s of substr(md5(i || ':' || s), 1, 8).

    Fast path: lowercasing stays JVM-side; gram extraction + hashing run in
    one Arrow-batched kernel with a bounded gram->hashes memo — natural
    text repeats common n-grams heavily both within and ACROSS documents,
    so the memo collapses the md5 count from |doc| x n_hashes per doc to
    |distinct grams seen| x n_hashes (measured ~6x fewer digests at
    sf0.1). The memo is cleared whenever it exceeds ``_MEMO_CAP`` entries
    (~100 MB worst case) so worker memory stays bounded on partitions with
    many distinct grams (ADVICE r2). Duplicate grams never affect a min, so
    deduping is semantics-preserving; Python str min is a code-point compare
    over hex chars == the SQL string min. Byte-identical to ``fingerprint_sql``
    (parity-tested). Docs shorter than n grams yield NULL fps in both paths
    (empty transform -> array_min(NULL) / kernel emits None).

    The kernel is CPU-bound, so parallelism is floored at the session's
    default parallelism: when the input has fewer partitions (a handful of
    large parquet files — the local-fixture shape), it is repartitioned
    first. The shuffle moves each document byte exactly once, which is noise
    next to per-gram hashing; at production scale the input already has
    >= cores partitions and this no-ops.
    """
    lowered = docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_s"))
    lowered = floor_parallelism(lowered)
    id_field = lowered.schema[id_col]
    schema = StructType(
        [StructField(id_field.name, id_field.dataType)]
        + [StructField(f"fp_{i}", StringType()) for i in range(n_hashes)]
    )
    prefixes = [f"{i}:".encode() for i in range(n_hashes)]

    def kern(batches):
        from hashlib import md5

        _MEMO_CAP = 1_000_000  # entries; ~100 MB upper bound incl. overhead
        memo: dict = {}

        def gram_hashes(g):
            h = memo.get(g)
            if h is None:
                if len(memo) >= _MEMO_CAP:
                    memo.clear()
                gb = g.encode("utf-8")
                h = tuple(md5(p + gb).hexdigest()[:8] for p in prefixes)
                memo[g] = h
            return h

        for pdf in batches:
            fps = [[] for _ in range(n_hashes)]
            for s in pdf["_s"]:
                if s is None or len(s) < n:
                    for col in fps:
                        col.append(None)
                    continue
                grams = {s[j : j + n] for j in range(len(s) - n + 1)}
                mins = [min(col) for col in zip(*(gram_hashes(g) for g in grams))]
                for i, col in enumerate(fps):
                    col.append(mins[i])
            out = {id_field.name: pdf[id_field.name]}
            for i, col in enumerate(fps):
                out[f"fp_{i}"] = col
            yield pd.DataFrame(out)

    return lowered.mapInPandas(kern, schema)


def fingerprint_sql(docs: DataFrame, n: int = 5, n_hashes: int = 4, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pure-Catalyst twin of ``fingerprint`` (mirrors the DuckDB oracle SQL
    literally); interpreted per-gram md5 — kept for the parity test and as
    executable documentation of the fingerprint definition.
    """
    # evaluate lower(text) and the gram array ONCE each via aliased
    # projections: Catalyst performs no CSE inside lambda bodies and
    # duplicates a multi-referenced expression tree (here: 4 fp columns),
    # so inlining `s`/`grams` re-lowercases the document per gram and
    # re-builds the gram array per hash — measured 5x slower
    lowered = docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_s"))
    s = F.col("_s")
    idx = F.when(
        F.length(s) >= n, F.sequence(F.lit(1), F.length(s) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    with_grams = lowered.select(
        F.col(id_col), F.transform(idx, lambda i: s.substr(i, F.lit(n))).alias("_grams")
    )
    grams = F.col("_grams")
    mins = [
        F.array_min(F.transform(grams, lambda g: F.substring(F.md5(F.concat(F.lit(f"{i}:"), g)), 1, 8))).alias(f"fp_{i}")
        for i in range(n_hashes)
    ]
    return with_grams.select(F.col(id_col), *mins)


# -- repetition statistics (Gopher/C4-style quality gates) -------------------

def repetition_metrics_row(text, toks):
    """Scalar core of :func:`repetition_stats` for ONE doc: returns
    (n_tokens, dup_line_frac, top_bigram_frac, dup_5gram_frac), all None
    for NULL text. Shared with the fused curation kernel
    (plans/curate.py) so both paths pin identical semantics."""
    from collections import Counter

    if toks is None or text is None:
        return None, None, None, None
    toks = list(toks)
    n = len(toks)
    lines = [l for l in text.split("\n") if l != ""]
    dline = (
        round((len(lines) - len(set(lines))) / len(lines), 6) if lines else 0.0
    )
    if n >= 2:
        bc = Counter(zip(toks, toks[1:]))
        topbi = round(max(bc.values()) / (n - 1), 6)
    else:
        topbi = 0.0
    if n >= 5:
        gc = Counter(tuple(toks[i : i + 5]) for i in range(n - 4))
        dup5 = round(sum(c for c in gc.values() if c >= 2) / (n - 4), 6)
    else:
        dup5 = 0.0
    return n, dline, topbi, dup5


def repetition_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc repetition metrics — the Gopher/C4 quality-gate family
    (public refs: Rae et al. 2021 "Scaling Language Models" §A1.1 repetition
    filters; Raffel et al. 2020 C4 line dedup), token-occurrence flavored:

    - ``n_tokens``        engine-tokenizer token count
    - ``dup_line_frac``   duplicated newline-split non-empty lines over all
                          such lines: (n_lines - n_distinct_lines)/n_lines
    - ``top_bigram_frac`` occurrences of the most frequent token bigram over
                          all bigram positions (n_tokens - 1)
    - ``dup_5gram_frac``  occurrences of 5-grams appearing >= 2 times over
                          all 5-gram positions (n_tokens - 4)

    Zero-denominator cases are 0.0; NULL text yields NULL metrics. All
    fractions rounded to 6 dp. One Arrow-batched kernel (tokens from the
    JVM tokenizer), shuffle-free — byte-identical to
    :func:`repetition_stats_sql` (parity-tested) and the DuckDB oracle.
    """
    from collections import Counter

    id_field = docs.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("n_tokens", LongType()),
        ]
        + [
            StructField(c, DoubleType())
            for c in ("dup_line_frac", "top_bigram_frac", "dup_5gram_frac")
        ]
    )

    def kern(batches):
        for pdf in batches:
            n_toks, dline, topbi, dup5 = [], [], [], []
            for text in pdf["_text"]:
                n, dl_, tb, d5 = repetition_metrics_row(text, sql_tokens_py(text))
                n_toks.append(n)
                dline.append(dl_)
                topbi.append(tb)
                dup5.append(d5)
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "n_tokens": pd.array(n_toks, dtype="Int64"),
                    "dup_line_frac": pd.array(dline, dtype="Float64"),
                    "top_bigram_frac": pd.array(topbi, dtype="Float64"),
                    "dup_5gram_frac": pd.array(dup5, dtype="Float64"),
                }
            )

    prepared = floor_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    )
    return prepared.mapInPandas(kern, schema)


def _gram_counts(grams):
    """counts per distinct gram, as an interpreted higher-order expr."""
    return F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )


def repetition_stats_sql(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pure-Catalyst twin of :func:`repetition_stats` — interpreted
    higher-order expressions; parity-test + executable spec only (the
    kernel is the production path)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    lines = F.filter(F.split(F.col(text_col), "\n", -1), lambda l: l != F.lit(""))
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines, 6),
    ).otherwise(F.when(n_lines.isNotNull(), F.lit(0.0)))

    def grams_of(width: int):
        return F.when(
            n >= width,
            F.transform(
                F.sequence(F.lit(1), n - (width - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(width)]
                ),
            ),
        ).otherwise(F.when(n.isNotNull(), F.array().cast("array<string>")))

    bi = grams_of(2)
    top_bi = F.when(
        F.size(bi) > 0,
        F.round(F.array_max(_gram_counts(bi)).cast("double") / F.size(bi), 6),
    ).otherwise(F.when(n.isNotNull(), F.lit(0.0)))
    g5 = grams_of(5)
    dup5_occ = F.aggregate(
        _gram_counts(g5),
        F.lit(0),
        lambda acc, c: acc + F.when(c >= 2, c).otherwise(F.lit(0)),
    )
    dup5 = F.when(
        F.size(g5) > 0, F.round(dup5_occ.cast("double") / F.size(g5), 6)
    ).otherwise(F.when(n.isNotNull(), F.lit(0.0)))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        dup_line.alias("dup_line_frac"),
        top_bi.alias("top_bigram_frac"),
        dup5.alias("dup_5gram_frac"),
    )


# ---------------------------------------------------------------------------
# Model-based quality filter (fastText/CCNet-classifier slot)
# ---------------------------------------------------------------------------

QL_BUCKETS = 64


def quality_weights(n_buckets: int = QL_BUCKETS) -> list[float]:
    """Deterministic stand-in weights for the linear quality model:
    w_b = ((int(md5(str(b))[:8], 16) % 2001) - 1000) / 1000 in [-1, 1].
    A real deployment swaps in trained fastText/logistic weights — the
    hashing, feature extraction, and scoring plumbing are identical."""
    import hashlib

    return [k / 1000.0 for k in quality_weights_k(n_buckets)]


def quality_weights_k(n_buckets: int = QL_BUCKETS) -> list[int]:
    """Integer numerators of :func:`quality_weights` (w_b = k_b / 1000,
    k_b in [-1000, 1000]). Exposed so scoring can accumulate EXACT integer
    sums — integer addition is associative, so the per-doc mean (and the
    6dp rounding in quality_linear) is independent of summation order and
    therefore engine-independent (ADVICE r4)."""
    import hashlib

    return [
        (int(hashlib.md5(str(b).encode()).hexdigest()[:8], 16) % 2001) - 1000
        for b in range(n_buckets)
    ]


def quality_linear(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = QL_BUCKETS,
) -> DataFrame:
    """fastText-style linear quality classifier over HASHED char n-gram
    features (the model-based tier above the heuristic ``quality_score``;
    CCNet pairs exactly this classifier shape with its LM filter):

      bucket(g) = int(md5(g)[:8], 16) % n_buckets   over char n-grams of
                  lower(text)
      x         = mean over grams of w[bucket(g)]
      score     = sigmoid(round(x, 6))              (x rounded BEFORE the
                  sigmoid so both engines exponentiate bit-identical input
                  — the doc_perplexity convention)

    The mean is computed as round(sum_k / 1000.0 / n, 6) over the EXACT
    integer weight numerators (quality_weights_k): integer addition is
    associative, so the pre-round value is identical regardless of gram
    order or engine aggregation order — the DuckDB twin performs the same
    integer sum and the same two divisions (ADVICE r4: a float
    accumulation could flip the 6dp rounding at a boundary).

    Docs with no grams (NULL or shorter than n chars) score exactly 0.5 —
    the uninformative-prior midpoint. -> (doc_id, n_grams, quality_score).

    Scale shape: ONE Arrow-batched kernel pass, no explode — the n-gram
    bag never leaves the batch (at 10^12 docs an exploded gram relation
    would be ~10^15 rows; the kernel is the fastText execution model). The
    DuckDB twin explodes (fine at oracle scale) and recomputes the same
    hash/weights.
    """
    import hashlib

    w = quality_weights_k(n_buckets)
    id_field = docs.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField("n_grams", LongType()),
            StructField("quality_score", DoubleType()),
        ]
    )

    def kern(batches):
        import math

        # gram -> weight memo: the corpus char-3-gram vocabulary is small
        # (tens of thousands for natural text), so each DISTINCT gram pays
        # its md5 exactly once per worker; bounded like the fingerprint
        # memo (ADVICE r2 pattern) so adversarial inputs can't grow it
        # unboundedly. Measured 7.9k -> ~40k docs/s at 320k docs.
        memo: dict[str, int] = {}
        _CAP = 1_000_000

        def gram_w(g: str) -> int:
            v = memo.get(g)
            if v is None:
                if len(memo) >= _CAP:
                    memo.clear()
                v = w[int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets]
                memo[g] = v
            return v

        for pdf in batches:
            ngrams_out, score_out = [], []
            for t in pdf["_text"]:
                if t is None or len(t) < n:
                    ngrams_out.append(0)
                    score_out.append(0.5)
                    continue
                t = t.lower()
                cnt = len(t) - n + 1
                total_k = 0  # exact: integer numerators, order-independent
                for i in range(cnt):
                    total_k += gram_w(t[i : i + n])
                x = round(total_k / 1000.0 / cnt, 6)
                ngrams_out.append(cnt)
                score_out.append(1.0 / (1.0 + math.exp(-x)))
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "n_grams": pd.array(ngrams_out, dtype="Int64"),
                    "quality_score": score_out,
                }
            )

    prepared = floor_parallelism(
        docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    )
    return prepared.mapInPandas(kern, schema)
