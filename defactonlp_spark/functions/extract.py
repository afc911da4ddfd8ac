"""B1 — deterministic HTML -> text extraction (pandas UDF, BinaryType -> StringType).

Pinned spec (SURVEY.md §5.3 — normative here; the reference extractor is not
mounted, so these rules ARE the contract and are frozen by golden byte
fixtures under ``tests/golden/extract/``):

1. UTF-8 decode, errors=strict (a page that fails to decode yields NULL),
2. drop ``<head>...</head>``, ``<script>...</script>``, ``<style>...</style>``
   blocks entirely (case-insensitive, non-greedy),
3. strip all remaining tags ``<...>``,
4. unescape HTML entities (``html.unescape``),
5. collapse all whitespace runs to a single space, strip ends.

The per-url output must be byte-identical across runs and across cluster
sizes — pure function of the html bytes, no locale or env dependence.

Reference analog (public, file-level): fever-baselines / DrQA
``scripts/retriever/build_db.py`` ingests pre-extracted wiki text; DeFactoNLP
never parses HTML itself — extraction is the new web-scale front door
mandated by BASELINE.json:15.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK_RE = re.compile(
    r"<head\b.*?</head\s*>|<script\b.*?</script\s*>|<style\b.*?</style\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_one(html_bytes: bytes | None) -> str | None:
    """Scalar reference implementation (used by tests and the UDF)."""
    if html_bytes is None:
        return None
    try:
        s = bytes(html_bytes).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def _extract_series(s: pd.Series) -> pd.Series:
    return s.map(extract_text_one)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:  # pragma: no cover (thin wrapper)
    return _extract_series(html)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Add/replace ``out_col`` with the extracted text of ``html_col``."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
