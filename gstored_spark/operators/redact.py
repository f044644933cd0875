"""PII redaction for web-corpus training data.

Training pipelines scrub personally identifiable information before text
reaches a model; at corpus scale this must be a pure column expression —
one `regexp_replace` chain per document, map-only, fused into whatever
scan/filter stage already touches the text (no UDF, no shuffle, no
second pass). Patterns deliberately use only RE2-compatible syntax (no
lookarounds) so an external engine reproduces the byte-exact output —
the DuckDB oracle hash-matches full redacted documents.

Redaction REPLACES with typed placeholder tokens rather than deleting:
downstream tokenizers see a stable vocabulary item, and counts stay
auditable (per-document match counts are emitted alongside)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order matters: emails contain dots and digits, so they redact FIRST,
# before the looser IP / phone digit patterns can eat their local parts
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted`` (scrubbed text) and one ``n_<kind>`` count column
    per pattern. Counts are computed on the ORIGINAL text, before earlier
    patterns rewrite it."""
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)
