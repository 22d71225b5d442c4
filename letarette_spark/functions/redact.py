"""PII / URL scrubbing for training-data pipelines.

One linear scan of pure JVM `regexp_replace` / `regexp_count` column
expressions — zero shuffle, no Python. Patterns are deliberately written
in the common subset of Java regex and RE2 (no backreferences, no
lookaround, ASCII classes only) so every operator has an exact DuckDB
twin and behaves identically under Spark's Java engine and RE2-based
engines.

The usual hygiene pass before tokenization: emails, URLs, IPv4s, SSNs,
US-style phone numbers → fixed placeholder tokens (placeholders contain
no digits or '@', so later patterns never re-match an earlier
replacement). Redaction order is the dict order below — fixed, because
order matters when spans could overlap (a URL may contain an '@').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kind -> (pattern, replacement); ORDER MATTERS (applied top to bottom)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url": (r"https?://[^\s]+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def _kinds(kinds) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}")
    # keep canonical order regardless of caller order
    return [k for k in PII_PATTERNS if k in set(kinds)]


def redact_text(col: Column | str, kinds=None) -> Column:
    """Column expression: *col* with every selected PII kind replaced by
    its placeholder. Chained regexp_replace — whole-stage codegen."""
    out = F.col(col) if isinstance(col, str) else col
    for k in _kinds(kinds):
        pat, repl = PII_PATTERNS[k]
        out = F.regexp_replace(out, pat, repl)
    return out


def redact(
    df: DataFrame, text_col: str = "text", kinds=None,
    out_col: str | None = None,
) -> DataFrame:
    """*df* with *text_col* scrubbed (in place, or into *out_col*)."""
    return df.withColumn(out_col or text_col, redact_text(text_col, kinds))


def pii_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    kinds=None,
) -> DataFrame:
    """(id, n_<kind>...) match counts per document — the audit view used
    to decide drop-vs-redact thresholds. Counts are measured on the text
    as-is (not after redaction), each kind independently."""
    cols = [F.col(id_col)]
    for k in _kinds(kinds):
        pat, _ = PII_PATTERNS[k]
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long").alias(f"n_{k}")
        )
    return df.select(*cols)
