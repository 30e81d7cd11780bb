"""PII redaction — scrub emails / phone numbers / IPv4 addresses / SSNs
from a text column and count what was removed.

The standard pre-training scrub pass. Pure-Column `regexp_replace` /
`regexp_count` chains — JVM-side, narrow, zero shuffles; a 100 TB corpus
redacts at scan speed. Patterns stay inside the regex subset Java
(Spark) and RE2 (DuckDB) treat identically: character classes, bounded
repetition, ``\\b`` ASCII word boundaries — no lookaround, no backrefs —
so the battery entry hash-matches DuckDB including the redacted-text
fingerprints.

Category patterns are intentionally conservative (precision over
recall); swap in stricter sets per deployment. No reference
counterpart; part of the corpus-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; patterns are disjoint
# so order only matters for overlapping matches (none here).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """``df`` + per-category match counts (``n_email``, ``n_ssn``,
    ``n_phone``, ``n_ipv4``) + the redacted text in ``out_col``
    (default: replaces ``text_col``).

    Counts are taken BEFORE any replacement (on the original text), then
    replacements apply in ``PII_PATTERNS`` order — so SSN/phone counts
    are not perturbed by earlier substitutions.
    """
    out_col = out_col or text_col
    for name, pat, _ in PII_PATTERNS:
        df = df.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint"),
        )
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn(out_col, red)
