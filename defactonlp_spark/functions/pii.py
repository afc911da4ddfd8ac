"""PII scrubbing for web-text training corpora (email / IPv4 / phone).

Pure whole-stage-codegen regexp expressions — the standard pre-training
redaction pass (public refs: C4/The-Pile style cleaning, BigScience ROOTS
PII pipeline), deliberately regex-only: the patterns below are written in
the dialect subset shared by Java regex (Spark) and RE2 (DuckDB), so the
DuckDB oracle runs them verbatim and the whole pass stays JVM-side (no
Python, no shuffle — a map-only projection fused into the scan).

Redaction is a CHAIN (email -> ipv4 -> phone), and each category's count
is taken on the text as it stood when that category was applied — the
counts always reconcile with the placeholders present in ``clean_text``.
NULL text propagates NULLs. Production swaps in NER-based scrubbers for
names/addresses (a mapInPandas model kernel, same plumbing as
operators/rte.py); the regex families here are the deterministic core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) — order IS the redaction chain order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
]


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, n_email, n_ipv4, n_phone, clean_text)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(F.col(id_col), *counts, cur.alias("clean_text"))


def pii_oracle_sql(table_expr: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """The DuckDB twin of :func:`redact_pii`, generated from the SAME
    pattern table (regexp_extract_all length = non-overlapping match count;
    'g' flag = Spark's replace-all default)."""
    cur = text_col
    counts = []
    for name, pat, repl in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        counts.append(
            f"len(regexp_extract_all({cur}, '{sql_pat}'))::BIGINT AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{sql_pat}', '{repl}', 'g')"
    return (
        f"SELECT {id_col}, " + ", ".join(counts) + f", {cur} AS clean_text "
        f"FROM {table_expr}"
    )
