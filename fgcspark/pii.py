"""PII detection + masking over the `documents` table.

A training-data corpus scrubber in the C4 / FineWeb style: detect
email addresses, IPv4 addresses and international phone numbers with
regexes, count them per document, and rewrite the text with typed
placeholders. Everything is JVM-side `regexp_count` /
`regexp_replace` — pure whole-stage codegen, no Python in the hot
path, map-only (zero shuffles).

The patterns are deliberately restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
bounded repetition and ASCII word boundaries — no lookaround, no
backreferences — so the oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{9,14}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_ips, n_phones, scrubbed): per-doc PII counts
    and the text with every match replaced by a typed placeholder.

    Replacement order matters and is fixed: emails first (so the
    user@host digits can never be re-matched as an IP or phone), then
    IPv4, then phone numbers. Counts are taken against the ORIGINAL
    text, before any replacement.
    """
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def pii_clean(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rows containing no detectable PII at all (map-only filter);
    preserves every input column. The drop-rather-than-mask policy
    some pipelines prefer."""
    c = F.col(text_col)
    return df.where(
        (F.regexp_count(c, F.lit(EMAIL_RE)) == 0)
        & (F.regexp_count(c, F.lit(IPV4_RE)) == 0)
        & (F.regexp_count(c, F.lit(PHONE_RE)) == 0)
    )
