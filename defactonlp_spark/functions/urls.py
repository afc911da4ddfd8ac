"""URL / domain analytics for Common-Crawl-style corpora.

Pure whole-stage-codegen column expressions (regexp_extract + string ops) —
no UDFs, no shuffle for the per-row features; the rollup is one hash
aggregate on the registrable domain. Every expression is written in the
regex dialect subset shared by Java (Spark) and RE2 (DuckDB), so the DuckDB
oracle runs the same patterns verbatim.

Scale note: per-URL parsing is a map-only projection that pushes through
the parquet scan; the domain rollup shuffles one small row per URL — the
standard per-domain crawl-stats job shape. The registrable-domain rule here
is the NAIVE last-two-labels heuristic; production swaps in the Mozilla
Public Suffix List (a broadcast lookup joined on the host suffix — same
plan shape, offline-unavailable here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
HOSTPORT_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
PORT_RE = ":([0-9]+)$"
PATH_RE = "://[^/?#]*(/[^?#]*)"
QUERY_RE = "\\?([^#]*)"
REG_DOMAIN_RE = "([^.]+\\.[^.]+)$"


def url_feature_cols(url: Column) -> dict[str, Column]:
    """Column map of parsed URL features; '' -> NULL normalization on the
    optional parts so downstream aggregates treat 'absent' uniformly."""
    scheme = F.nullif(F.regexp_extract(url, SCHEME_RE, 1), F.lit(""))
    hostport = F.nullif(F.regexp_extract(url, HOSTPORT_RE, 1), F.lit(""))
    host = F.nullif(F.regexp_extract(hostport, "^([^:]+)", 1), F.lit(""))
    port = F.nullif(F.regexp_extract(hostport, PORT_RE, 1), F.lit("")).cast("int")
    path = F.nullif(F.regexp_extract(url, PATH_RE, 1), F.lit(""))
    query = F.nullif(F.regexp_extract(url, QUERY_RE, 1), F.lit(""))
    reg = F.nullif(F.regexp_extract(host, REG_DOMAIN_RE, 1), F.lit(""))
    depth = F.when(
        path.isNotNull(),
        (F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))).cast("int"),
    ).otherwise(F.when(url.isNotNull(), F.lit(0)))
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
        "registrable_domain": reg,
        "path_depth": depth,
        "is_https": F.when(url.isNotNull(), (scheme == "https").cast("boolean")),
    }


def url_features(df: DataFrame, url_col: str = "url", keep: list[str] | None = None) -> DataFrame:
    """Append parsed URL feature columns (scheme, host, port, path, query,
    registrable_domain, path_depth, is_https) to ``df``."""
    cols = url_feature_cols(F.col(url_col))
    base = [F.col(c) for c in (keep if keep is not None else df.columns)]
    return df.select(*base, *[c.alias(n) for n, c in cols.items()])


def domain_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain crawl stats: page count, distinct hosts,
    https fraction, mean path depth. One map-side-combined hash aggregate."""
    feats = url_features(df, url_col=url_col, keep=[])
    return (
        feats.filter(F.col("registrable_domain").isNotNull())
        .groupBy("registrable_domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.round(F.avg(F.col("is_https").cast("double")), 6).alias("https_frac"),
            F.round(F.avg("path_depth"), 6).alias("mean_path_depth"),
        )
    )
