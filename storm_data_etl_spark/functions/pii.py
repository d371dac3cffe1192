"""PII detection / redaction expressions for corpus scrubbing.

Pure ``Column`` expressions (JVM regex, no UDFs) so the scrub pass fuses
into the same WholeStageCodegen stage as the rest of the document pipeline
— at 100 TB the redaction costs one scan, zero shuffles.

Patterns are deliberately RE2-safe (no backrefs, no lookbehind) so the
exact same strings run under Java regex (Spark), RE2 (DuckDB oracle), and
Go — mirroring the cross-engine parity discipline the reference applies to
its own regexes (internal/domain/transform.go:14-21 keeps both patterns
RE2-compatible).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.column import Column as _Col

#: pattern → replacement token. Order matters: emails contain dots, so they
#: are redacted before the IPv4 pass can nibble at their host part.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def _c(col) -> Column:
    return col if isinstance(col, _Col) else F.col(col)


def pii_count(col, kind: str) -> Column:
    """Number of matches of one PII kind in the text."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), 0))


def redact(col) -> Column:
    """Text with every known PII pattern replaced by its token, applied in
    PII_PATTERNS order (email → phone → ipv4)."""
    out = _c(col)
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def luhn_valid(col) -> Column:
    """True iff the digit string passes the Luhn mod-10 checksum — the
    false-positive gate real PII scrubbers apply to card-number candidates
    (a 16-digit match that fails Luhn is almost never a card). Pure JVM
    expressions: reverse the string, double every second digit from the
    right (subtracting 9 above 9), sum mod 10 == 0. Non-digit input
    yields false (filter on a digits-only regex first). The DuckDB twin
    expresses the identical arithmetic with list_transform over an index
    range — see plans/lake_queries.pii_luhn_audit."""
    c = _c(col)
    ds = F.filter(F.split(F.reverse(c), ""), lambda ch: ch != F.lit(""))
    term = F.transform(
        ds,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(F.ascii(ch) * 2 - 96 > 9, F.ascii(ch) * 2 - 96 - 9).otherwise(
                F.ascii(ch) * 2 - 96
            ),
        ).otherwise(F.ascii(ch) - 48),
    )
    total = F.aggregate(term, F.lit(0), lambda acc, x: acc + x)
    return (
        c.rlike(r"^\d{2,}$") & (F.pmod(total, F.lit(10)) == 0)
    )
