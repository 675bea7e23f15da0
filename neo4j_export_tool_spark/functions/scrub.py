"""PII scrubbing for training-data pipelines.

Web text headed for a training corpus gets personally-identifying spans
replaced with typed placeholders before anything downstream sees it.  The
reference tool has no scrub stage (it exports a trusted graph); this is one
of the training-pipeline operators the engine adds beyond the reference's
own set (driver brief: "the operations a large-scale training-data pipeline
would need").

Everything here is a pure column expression (``regexp_replace`` /
``regexp_extract_all`` chains) — JVM-side, whole-stage-codegen'd, no Python
in the row path, linear in input bytes at any scale.  The patterns are
restricted to the regex subset with identical semantics in Java regex
(Spark) and RE2 (DuckDB), so the oracle can run the SAME patterns verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern subset valid in BOTH Java regex and RE2 (no backrefs, no
# lookaround).  Order matters: emails are redacted before IPs so the
# host part of an address can't be half-eaten by the IP rule.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (kind, pattern, placeholder)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (computed on the ORIGINAL text, before any
    placeholder insertion can shadow a later pattern)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii_col(text: Column) -> Column:
    """Text with every PII span replaced by its typed placeholder."""
    out = text
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def pii_scrub(text: Column) -> dict[str, Column]:
    """(redacted text + per-kind counts) in one expression bundle."""
    cols: dict[str, Column] = {"text_redacted": redact_pii_col(text)}
    cols.update(pii_counts(text))
    return cols
