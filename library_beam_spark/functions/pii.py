"""PII detection and redaction for training-data scrubbing.

All JVM-side ``regexp_*`` built-ins — the hot path stays inside
WholeStageCodegen with zero Python. Patterns deliberately avoid
lookaround so the identical regex runs under both Java's engine (Spark)
and RE2 (the DuckDB oracle): email, dotted-quad IP, and international
phone forms.

Redaction replaces matches with stable placeholder tokens (``<EMAIL>``
etc.) rather than deleting, preserving token positions for downstream
span-based operators. Order matters: emails first (they contain dots and
digits), then IPs, then phones — so the looser phone pattern never eats
a fragment of an already-recognized entity.

Scale: pure per-row projection, no shuffle; at 100 TB the regex cost
rides the scan. This extends the engine's LLM-data surface (SURVEY §6);
the reference pipeline has no PII stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{1,2}[-. ]\d{3}[-. ]\d{4}"

#: (pattern, placeholder) in redaction order.
PII_PATTERNS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (IP_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]


def count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def count_emails(col: Column) -> Column:
    return count_matches(col, EMAIL_RE)


def count_ips(col: Column) -> Column:
    return count_matches(col, IP_RE)


def count_phones(col: Column) -> Column:
    return count_matches(col, PHONE_RE)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its placeholder token."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (RE2; 'g' flag for global)."""
    out = expr
    for pattern, token in PII_PATTERNS:
        pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
