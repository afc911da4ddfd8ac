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


# --- canonicalization (round 5) ---------------------------------------------

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="
_PREFIX_RE = "^([^/?#]*://[^/?#]*)"


def url_canonical_col(url: Column) -> Column:
    """Canonical form of a URL — the dedup key a crawl pipeline groups on
    (CCNet / Dolma dedup by canonical URL before any content hashing; the
    rules below are the common subset of their normalizers and RFC 3986
    §6.2 syntax-based normalization):

      1. strip the fragment (``#...`` never reaches the server),
      2. lowercase the scheme and authority ONLY (path/query are
         case-sensitive by RFC 3986),
      3. drop a leading ``www.`` host label,
      4. drop the scheme's default port (https:443, http:80); keep others,
      5. strip trailing slashes from the path (root ``/`` == no path),
      6. drop tracking params (``utm_*``, fbclid, gclid, msclkid, ref),
         byte-sort the survivors, rejoin; an emptied query drops its ``?``.

    Pure codegen column expression — regexp + higher-order array ops, no
    UDF; the same rules are re-implemented independently in the DuckDB
    twin, so an oracle match cross-checks the normalizer itself. NULL or
    scheme-less input -> NULL (surfaced, not guessed).
    """
    nofrag = F.regexp_replace(url, "#.*$", "")
    prefix = F.lower(F.regexp_extract(nofrag, _PREFIX_RE, 1))
    rest = nofrag.substr(F.length(prefix) + 1, F.length(nofrag))
    u = F.concat(prefix, rest)

    scheme = F.nullif(F.regexp_extract(u, SCHEME_RE, 1), F.lit(""))
    hostport = F.regexp_extract(u, HOSTPORT_RE, 1)
    host = F.regexp_replace(
        F.regexp_extract(hostport, "^([^:]+)", 1), "^www\\.", ""
    )
    port = F.nullif(F.regexp_extract(hostport, PORT_RE, 1), F.lit(""))
    default_port = (
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    portpart = F.when(
        port.isNotNull() & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))

    path = F.regexp_replace(F.regexp_extract(u, PATH_RE, 1), "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(u, QUERY_RE, 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.concat_ws("&", F.array_sort(params))),
    ).otherwise(F.lit(""))

    return F.when(
        scheme.isNotNull(),
        F.concat(scheme, F.lit("://"), host, portpart, path, qpart),
    )


def canonical_dup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level duplicate groups: rows whose URLs CANONICALIZE to the same
    key. The cheapest dedup tier a web pipeline runs (before any content
    hash — no text ever shuffles, only the canonical string + id), and the
    one that removes ``?utm_source=`` / ``#section`` / ``www.`` recrawls.

    One projection + one hash aggregate on the canonical key.
    -> (canonical_url, n_variants, keep_id) for groups of >= 2, with
    keep_id = min id (the same keep-min rule the content-dedup tiers pin).
    """
    return (
        df.select(
            url_canonical_col(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_variants") >= 2)
    )
