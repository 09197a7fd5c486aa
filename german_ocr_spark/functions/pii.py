"""PII detection and redaction — 3-way consistent (Spark Column /
DuckDB SQL / plain Python via the same pattern strings).

The detector the corpus-curation pipeline runs before training: count
and strip emails, international phone numbers, and IBANs. Patterns are
written in the RE2 ∩ Java ∩ Python dialect the repo standardizes on
(no lookarounds, no ``\\b``, greedy character classes only — for these
alternation-free patterns leftmost-first (Java/Python) and
leftmost-longest (RE2) agree), so the Spark expression and the DuckDB
oracle match byte for byte. Counting uses the split-count trick
(`textstats._count_col`) — occurrences = split parts − 1 — which both
engines implement identically.

The inventory is deliberately minimal config, like the stopword lists:
the operator is the count/redact plumbing; production swaps in its own
pattern set (SSNs, credit cards with checksum post-filters, …) without
touching the dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .textstats import _count_col, _count_sql

# kind -> (pattern, redaction token). Order matters for redaction:
# IBAN before phone so a digit-heavy IBAN isn't half-eaten by the
# phone pattern first.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "iban": (r"[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}", "[IBAN]"),
    "phone": (r"\+[0-9]{2}[0-9 /-]{6,12}[0-9]", "[PHONE]"),
}


def pii_count_col(col: Column, kind: str) -> Column:
    return _count_col(col, PII_PATTERNS[kind][0])


def pii_count_sql(expr: str, kind: str) -> str:
    return _count_sql(expr, PII_PATTERNS[kind][0])


def pii_total_col(col: Column) -> Column:
    out = F.lit(0)
    for kind in PII_PATTERNS:
        out = out + pii_count_col(col, kind)
    return out


def pii_total_sql(expr: str) -> str:
    return "(" + " + ".join(pii_count_sql(expr, k) for k in PII_PATTERNS) + ")"


def pii_redact_col(col: Column) -> Column:
    """All PII spans replaced by their kind token, applied in
    PII_PATTERNS order (Spark regexp_replace is replace-all)."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_redact_sql(expr: str) -> str:
    out = expr
    for pat, token in PII_PATTERNS.values():
        lit = pat.replace("\\", "\\\\").replace("'", "''")
        out = f"regexp_replace({out}, E'{lit}', '{token}', 'g')"
    return out
