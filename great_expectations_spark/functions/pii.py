"""PII pattern classes shared by the pii_scan corpus query and the
expect_column_values_to_not_contain_pii expectation.

Patterns stay inside the common subset of Java regex (Spark executors)
and RE2 (the DuckDB oracle): no lookarounds, no backreferences, ASCII
word boundaries only. Extend via the expectation's extra_patterns
kwarg rather than editing these — the scan query and the expectation
face must keep matching the same classes.
"""

from __future__ import annotations

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
