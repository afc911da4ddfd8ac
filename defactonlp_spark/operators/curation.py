"""Corpus-curation operators for training-data pipelines (task-spec axis).

- ``with_split``   : deterministic, engine-portable train/val/test assignment
                     by md5 of the document id — reproducible across runs,
                     engines (same split in DuckDB/Trino/Spark), and cluster
                     sizes, with no RNG or global sort. The standard trick
                     for freezing dataset splits at web scale.
- ``source_stats`` : per-source curation dashboard: volume, exact-dup rate
                     (1 - distinct(md5(text))/docs), mean length. One
                     hash-aggregate — partial/final combine, no skew (md5
                     keys are uniform), scales to any corpus.

Portability contract: md5 only (identical in Spark and DuckDB — same rule
as operators/dedup.py), so every operator here has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default split percentages (train, val, test) — must sum to 100
SPLIT_WEIGHTS = (80, 10, 10)


def _split_bucket(id_col: str):
    """0-99 bucket from the first two hex chars of md5(id) — 256 raw values
    folded mod 100; deterministic and engine-portable."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return (F.conv(hx, 16, 10).cast("int") % 100).alias("bucket")


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = SPLIT_WEIGHTS,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'val' | 'test').

    The assignment is a pure function of the id — appending new documents
    never reshuffles existing ones between splits (critical for dataset
    versioning), unlike randomSplit whose assignment depends on partition
    layout and seed plumbing."""
    train, val, test = weights
    assert train + val + test == 100, "split weights must sum to 100"
    b = _split_bucket(id_col)
    return docs.withColumn(
        "split",
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(split, lang) -> n_docs. The reproducibility audit for the split."""
    return (
        with_split(docs, id_col)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def source_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source curation stats: volume, exact-dup rate, mean length.

    ``dup_rate`` = 1 - distinct texts / docs, with text identity = md5 so
    the distinct-aggregate shuffles 16-byte keys, never documents."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("distinct_texts"),
        F.round(
            F.lit(1.0) - F.countDistinct(F.md5(F.col(text_col))) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
    )


def training_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col_name: str | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic per-source token-budget sampling — the dataset-mixing
    step of an LLM training pipeline (Pile/Dolma-style: 'take N tokens of
    source X, M of source Y'). Adds ``(n_tokens, keep)``; a doc is kept iff
    the cumulative token count of all docs BEFORE it (in a deterministic
    pseudo-random order) is under its source's budget, so each source
    overshoots by at most one document and the selection is a pure function
    of (id, source) — appending new docs never evicts previously kept ones
    ranked ahead of them, and re-runs at any cluster size pick the same set.

    Order key = md5(source || ':' || id): an unbiased, reproducible shuffle
    without RNG plumbing (same rule as ``with_split``).

    Scale: the naive form is ONE window per source — a single reducer per
    source, dead at 10^9-doc sources. This runs the classic two-phase
    distributed prefix sum instead (same pattern as the index build's
    bucket_boundaries): docs hash into ``n_buckets`` ordered buckets by key
    prefix; per-(source,bucket) cumulative sums run in parallel windows;
    bucket offsets (n_sources x n_buckets tiny rows) prefix-sum on top and
    broadcast back. Equivalent to the single window because the bucket id
    is the key's leading hex — bucket order IS key order.

    Sources absent from ``budgets`` get keep=false (budget 0).
    """
    assert 1 <= n_buckets <= 65536
    hex_chars = 4  # bucket from leading 4 hex chars (65536 >= any n_buckets)
    key = F.md5(
        F.concat_ws(":", F.col(source_col), F.col(id_col).cast("string"))
    )
    # default token count via regexp_count (match-counting, no array
    # materialization): on ASCII text it equals size(tokens_col) — each
    # [A-Za-z0-9]+ run in the raw text is one token of lower(text) split on
    # [^a-z0-9]+. (Non-ASCII text CAN differ: lower() may map non-ASCII
    # codepoints into [a-z] — e.g. 'İ' -> 'i'+combining dot. Either count
    # is a valid budget unit; what matters is that the DuckDB twin uses the
    # SAME raw-text regex, so the two engines agree on every input.)
    # Measured at 320k webpages: the split+size form paid ~2x (the base
    # relation feeds two consumers, so the count expression runs twice).
    ntok = (
        F.col(tokens_col_name).cast("long")
        if tokens_col_name
        else F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+")).cast("long")
    )
    base = docs.withColumn("_key", key).withColumn("n_tokens", ntok).withColumn(
        "_bucket",
        (F.conv(F.substring("_key", 1, hex_chars), 16, 10).cast("long") * n_buckets
         / (16 ** hex_chars)).cast("int"),
    )

    from pyspark.sql import Window

    intra = Window.partitionBy(source_col, "_bucket").orderBy(
        "_key", id_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = base.withColumn("_cum_in", F.sum("n_tokens").over(intra))

    per_bucket = base.groupBy(source_col, "_bucket").agg(
        F.sum("n_tokens").alias("_btok")
    )
    off_w = Window.partitionBy(source_col).orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = per_bucket.withColumn(
        "_offset", F.sum("_btok").over(off_w) - F.col("_btok")
    ).select(source_col, "_bucket", "_offset")

    budget_rows = [(s, int(b)) for s, b in sorted(budgets.items())]
    budget_df = docs.sparkSession.createDataFrame(
        budget_rows, f"{source_col} string, _budget long"
    )

    return (
        base.join(F.broadcast(offsets), [source_col, "_bucket"])
        .join(F.broadcast(budget_df), source_col, "left")
        .withColumn(
            "keep",
            (F.col("_offset") + F.col("_cum_in") - F.col("n_tokens"))
            < F.coalesce(F.col("_budget"), F.lit(0)),
        )
        .drop("_key", "_bucket", "_cum_in", "_btok", "_offset", "_budget")
    )


def mix_stats(
    docs: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source audit of a training_mix: docs/tokens kept vs available vs
    budget. kept_tokens <= budget + max doc length by construction."""
    mixed = training_mix(docs, budgets, id_col=id_col, source_col=source_col)
    return mixed.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("avail_tokens"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("kept_docs"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_tokens"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col_name: str | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """LLM training-sequence packing (concat-then-chunk pretraining layout):
    lay every document's tokens end-to-end in a deterministic pseudo-random
    order and cut fixed ``seq_len`` windows — each doc gets the sequence id
    and intra-sequence offset where it STARTS (docs may straddle sequence
    boundaries; that is the standard GPT-style packing, not an error).

    Output: (doc_id, n_tokens, seq_id, seq_offset) with
      offset_excl = sum of n_tokens of all docs BEFORE this one in
                    md5(id) order (ties impossible: md5 keys + id tiebreak)
      seq_id      = floor(offset_excl / seq_len)
      seq_offset  = offset_excl % seq_len

    The order key md5(id) doubles as the training shuffle (the same
    RNG-free, engine-portable rule as ``with_split``/``training_mix``), so
    re-runs at any cluster size produce the identical packing — the
    reproducibility a curriculum/ablation pipeline needs.

    Scale: one window ORDER BY key is a single reducer; this uses the same
    two-phase distributed prefix sum as ``training_mix`` (ordered buckets
    from the key's leading hex — bucket order IS key order — parallel
    intra-bucket windows + a tiny broadcast offset join). The DuckDB twin
    is the single-window definition, so the oracle checks the decomposition
    exactly.
    """
    assert 1 <= n_buckets <= 65536 and seq_len >= 1
    hex_chars = 4
    key = F.md5(F.col(id_col).cast("string"))
    ntok = (
        F.col(tokens_col_name).cast("long")
        if tokens_col_name
        else F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+")).cast("long")
    )
    base = docs.withColumn("_key", key).withColumn("n_tokens", ntok).withColumn(
        "_bucket",
        (F.conv(F.substring("_key", 1, hex_chars), 16, 10).cast("long") * n_buckets
         / (16 ** hex_chars)).cast("int"),
    )

    from pyspark.sql import Window

    intra = Window.partitionBy("_bucket").orderBy("_key", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = base.withColumn("_cum_in", F.sum("n_tokens").over(intra))

    per_bucket = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
    off_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = per_bucket.withColumn(
        "_offset", F.sum("_btok").over(off_w) - F.col("_btok")
    ).select("_bucket", "_offset")
    # the offsets relation is n_buckets rows — the one global window runs
    # over 256 rows, and the join back is broadcast
    packed = base.join(F.broadcast(offsets), "_bucket").withColumn(
        "_excl", F.col("_offset") + F.col("_cum_in") - F.col("n_tokens")
    )
    return packed.select(
        id_col,
        "n_tokens",
        F.floor(F.col("_excl") / seq_len).cast("long").alias("seq_id"),
        (F.col("_excl") % seq_len).cast("long").alias("seq_offset"),
    )


# --- URL blocklist + stratified sampling (round 5) --------------------------


def url_blocklist_filter(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    url_col: str = "url",
) -> DataFrame:
    """URL blocklist gate — the first filter a web-corpus pipeline runs
    (CCNet / Dolma / RefinedWeb all gate on a URL blocklist before fetching
    text features). ``rules`` = [(rule_id, kind, pattern)] with two kinds:

      - ``domain``: matches when the URL host equals the pattern or is a
        subdomain of it (``example.com`` blocks ``a.example.com``),
      - ``prefix``: matches when the CANONICAL url starts with the pattern
        (so ``?utm_`` noise can't dodge a path rule).

    Zero shuffle, zero join: the rule list compiles into a literal array
    of structs scanned per row with higher-order functions — the corpus
    never moves, never duplicates (a theta-join would emit one row per
    matching rule and need a re-aggregate). First-match-wins is
    ``array_min`` over matched rule_ids (asc, pinned) so a URL hitting
    several rules reports ONE rule deterministically.

    The per-row cost discipline that makes this viable: the canonical URL
    and the bare host are BOUND ONCE per row through a one-element
    transform() before the rule lambda runs, so each rule element touches
    only cheap bound-variable string ops. Referencing the projected
    canonical column from inside the lambda instead re-inlines the whole
    regexp-heavy canonicalization PER RULE ELEMENT (measured: 2 rules
    already doubled the wall; 1000 rules extrapolated to hours). The scan
    is O(rules) interpreted string ops per row — right for policy lists up
    to a few hundred rules; at real rule VOLUME (thousands+), switch to
    :func:`url_blocklist_join`, the broadcast suffix-join variant.

    -> df columns + (canonical_url, blocked boolean, rule_id string|NULL).
    Callers keep ``filter(~blocked)`` or audit ``groupBy(rule_id)``.
    """
    from defactonlp_spark.functions.urls import (
        HOSTPORT_RE,
        url_canonical_col,
    )

    rarr = F.array(*[
        F.struct(
            F.lit(rid).alias("rule_id"),
            F.lit(kind).alias("kind"),
            F.lit(pat).alias("pattern"),
        )
        for rid, kind, pat in rules
    ])
    canon_expr = url_canonical_col(F.col(url_col))
    # host WITHOUT the port — a canonical URL keeps non-default ports, but
    # domain rules match the bare host (example.com:8080 is still blocked
    # by an example.com rule)

    def _host_of(c):
        return F.regexp_extract(
            F.regexp_extract(F.coalesce(c, F.lit("")), HOSTPORT_RE, 1),
            "^([^:]+)",
            1,
        )

    def _matches(r, c, h):
        return (
            (r["kind"] == "domain")
            & ((h == r["pattern"]) | h.endswith(F.concat(F.lit("."), r["pattern"])))
        ) | (
            (r["kind"] == "prefix")
            & F.coalesce(c, F.lit("")).startswith(r["pattern"])
        )

    # one-element transform = per-row let-binding: s["c"]/s["h"] inside the
    # rule lambda are NamedLambdaVariables, evaluated once per row
    scan = F.transform(
        F.array(F.struct(canon_expr.alias("c"), _host_of(canon_expr).alias("h"))),
        lambda s: F.struct(
            s["c"].alias("c"),
            F.array_min(
                F.transform(
                    F.filter(rarr, lambda r: _matches(r, s["c"], s["h"])),
                    lambda r: r["rule_id"],
                )
            ).alias("rid"),
        ),
    )[0]
    return df.withColumn("_scan", scan).select(
        *df.columns,
        F.col("_scan")["c"].alias("canonical_url"),
        F.col("_scan")["rid"].alias("rule_id"),
        F.col("_scan")["rid"].isNotNull().alias("blocked"),
    )


def url_blocklist_join(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    url_col: str = "url",
    id_col: str = "doc_id",
    max_labels: int = 8,
) -> DataFrame:
    """Rule-VOLUME variant of :func:`url_blocklist_filter` — same rules,
    same first-match-wins semantics (pytest pins the two bit-identical),
    different plan shape for when the blocklist is PSL-scale (10^5-10^6
    rules) and a per-row linear scan stops being viable:

      - ``domain`` rules become an EQUI-join: each row emits its host's
        suffix chain (``a.b.example.com`` -> [a.b.example.com,
        b.example.com, example.com, com], bounded by ``max_labels``) and
        hash-joins it against the broadcast rule relation — per-row cost
        is O(host labels), independent of rule count.
      - ``prefix`` rules equi-join on the pattern's own host first (a
        prefix rule pins a host by construction), then check startswith
        on the tiny per-host residual.

    The hit relations are narrow (id, rule_id) and re-aggregate to one
    row per BLOCKED id; the final attach is a left join on ``id_col``.
    At 100 TB that join is the one data movement: broadcast when the
    blocked set is small (the common case — blocklists hit a few percent),
    a narrow-key shuffle otherwise; either way the corpus text moves at
    most once, vs never for the literal-scan variant — the price of rule
    volume. -> same schema as url_blocklist_filter.
    """
    from defactonlp_spark.functions.urls import HOSTPORT_RE, url_canonical_col

    spark = df.sparkSession
    canon = df.withColumn("canonical_url", url_canonical_col(F.col(url_col)))
    host = F.regexp_extract(
        F.regexp_extract(F.coalesce(F.col("canonical_url"), F.lit("")), HOSTPORT_RE, 1),
        "^([^:]+)",
        1,
    )
    narrow = canon.select(F.col(id_col), F.col("canonical_url"), host.alias("_host"))

    import re as _re

    def _host_of_pattern(pat: str) -> str:
        m = _re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", pat)
        hp = m.group(1) if m else ""
        return hp.split(":")[0]

    dom = [(rid, pat) for rid, kind, pat in rules if kind == "domain"]
    pre = [(rid, _host_of_pattern(pat), pat) for rid, kind, pat in rules if kind == "prefix"]

    hits = None
    if dom:
        ddf = spark.createDataFrame(dom, "rule_id string, pattern string")
        parts = F.split(F.col("_host"), "\\.")
        nlab = F.size(parts)
        suffixes = F.transform(
            F.sequence(F.lit(1), F.least(nlab, F.lit(max_labels))),
            lambda k: F.array_join(F.slice(parts, nlab - k + 1, k), "."),
        )
        d_hits = (
            narrow.select(id_col, F.explode(suffixes).alias("_sfx"))
            .join(F.broadcast(ddf), F.col("_sfx") == F.col("pattern"), "inner")
            .select(id_col, "rule_id")
        )
        hits = d_hits
    if pre:
        pdf = spark.createDataFrame(pre, "rule_id string, phost string, pattern string")
        p_hits = (
            narrow.join(F.broadcast(pdf), F.col("_host") == F.col("phost"), "inner")
            .filter(F.col("canonical_url").startswith(F.col("pattern")))
            .select(id_col, "rule_id")
        )
        hits = p_hits if hits is None else hits.unionByName(p_hits)
    if hits is None:
        return canon.withColumn("rule_id", F.lit(None).cast("string")).withColumn(
            "blocked", F.lit(False)
        )
    first = hits.groupBy(id_col).agg(F.min("rule_id").alias("rule_id"))
    return canon.join(first, id_col, "left").withColumn(
        "blocked", F.col("rule_id").isNotNull()
    )


def stratified_sample(
    df: DataFrame,
    rates_permille: dict[str, int],
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Stratified deterministic sampling: keep each row iff its md5 bucket
    (of 1000) falls below its STRATUM's permille rate — the mixture-
    sampling primitive a training-data pipeline uses to hit a target recipe
    (downsample CommonCrawl to 30%, keep Wikipedia at 100%, ...).

    Same pinned hash as random_sampler / with_split:
    ``bucket(id) = int(md5(id)[:8], 16) % 1000`` — reproducible across
    runs, engines, and cluster sizes; a row's fate never depends on other
    rows, so the sample composes with any upstream filter. Strata absent
    from ``rates_permille`` default to 0 (dropped) — an explicit recipe,
    not a passthrough. The rate map is policy-sized: broadcast join, one
    codegen filter, no shuffle of the corpus.
    """
    for k, v in rates_permille.items():
        if not 0 <= v <= 1000:
            raise ValueError(f"rate for {k!r} must be in [0, 1000], got {v}")
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        list(rates_permille.items()), f"{group_col} string, _permille int"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        df.join(F.broadcast(rdf), group_col, "left")
        .filter(bucket < F.coalesce(F.col("_permille"), F.lit(0)))
        .drop("_permille")
    )
