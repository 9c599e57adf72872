"""PII detection and redaction — pure column expressions.

Webtext pipelines scrub personally identifiable information before a
corpus ships (the C4/RefinedWeb-style recipes drop or mask emails, IP
addresses, and long ID-like digit runs). Everything here is a chained
``regexp_replace`` / ``regexp_extract_all`` pipeline: JVM-side,
whole-stage-codegen'd, zero Python in the hot path, so a 100 TB scrub
is a single map stage with no shuffle.

The patterns deliberately stay inside the regex subset Java's engine
and RE2 (DuckDB) interpret identically — character classes, bounded
repetition, ``(?:...)`` groups, ASCII ``\\b`` — so the DuckDB oracle
can mirror redaction byte-for-byte (md5-compared in the driver's
``pii_scrub`` query).

Redaction ORDER is part of the contract: emails first (their local
part may contain digit runs), then IPv4 (dotted digit runs), then bare
long digit runs; each later pattern sees the earlier replacements'
output. Both engines apply the same order. Match COUNTS, by contrast,
are raw per-pattern counts over the original text — a digit run inside
an email address counts for both ``email`` and ``longnum`` — so counts
are independent audit signals, not a decomposition of the redactions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java- and RE2-compatible (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
LONGNUM_RE = r"\b\d{9,}\b"  # SSN/CC/account-ish runs

# (name, pattern) in redaction order.
PII_PATTERNS = [("email", EMAIL_RE), ("ipv4", IPV4_RE), ("longnum", LONGNUM_RE)]

DEFAULT_MASK = "[PII]"


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrences of one PII pattern (0 for clean/empty strings)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def redact_pii(col: Column, mask: str = DEFAULT_MASK) -> Column:
    """Replace every PII match with ``mask``, applying the patterns in
    :data:`PII_PATTERNS` order."""
    out = col
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, mask)
    return out


def pii_columns(
    df: DataFrame, text_col: str = "text", mask: str = DEFAULT_MASK
) -> DataFrame:
    """Append per-pattern match counts (``n_email``/``n_ipv4``/
    ``n_longnum``) and the scrubbed text (``text_redacted``)."""
    c = F.col(text_col)
    for name, pat in PII_PATTERNS:
        df = df.withColumn(f"n_{name}", pii_count(c, pat))
    return df.withColumn("text_redacted", redact_pii(c, mask))
