"""PII detection and redaction (training-data pipeline extension).

The reference's only scalar surface is the anonymiser (SURVEY §2.7); this
module adds the scan-side counterpart a large-scale training-data pipeline
needs: find and mask PII-shaped spans (emails, IP addresses, long digit
runs such as account/phone/card numbers) *inside free text*, where the
anonymiser's column-level fakers can't reach.

Rules are declarative ``PiiRule`` values compiled to BOTH Spark Columns
(Java regex) and portable SQL (DuckDB/RE2) — patterns stay inside the
dialect-shared subset (character classes, bounded quantifiers, alternation,
``\\b`` word boundaries, non-capturing groups; no lookaround, no
backreferences), so both engines match identical spans and the driver's
value-hash gate holds.

Scale notes: redaction and counting are narrow per-row maps — no shuffle,
no skew sensitivity; pushdown/pruning reach the scan untouched. Regex
evaluation happens JVM-side inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class PiiRule:
    """One detect/redact rule.

    ``pattern`` must stay in the Java-regex ∩ RE2 subset (see module doc);
    ``replacement`` is a literal token (no ``$``/``\\`` escapes so the
    replacement string means the same thing in both dialects).
    """

    name: str
    pattern: str
    replacement: str


EMAIL = PiiRule(
    "email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
IPV4 = PiiRule(
    "ipv4", r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b", "<IP>")
# runs of >= 6 digits: account numbers, phone numbers, card fragments
LONG_DIGITS = PiiRule("long_digits", r"[0-9]{6,}", "<NUM>")

# Order matters and is part of the contract: emails first (their local
# parts may contain digit runs), then IPs (dotted short runs), then bare
# digit runs. Sequential replacement is identical in both engines.
DEFAULT_RULES: tuple[PiiRule, ...] = (EMAIL, IPV4, LONG_DIGITS)


def redact(col: Column | str, rules: tuple[PiiRule, ...] = DEFAULT_RULES
           ) -> Column:
    """Mask every rule's matches with its replacement token, applying the
    rules in order (JVM regexp_replace replaces all occurrences)."""
    c = F.col(col) if isinstance(col, str) else col
    for r in rules:
        c = F.regexp_replace(c, r.pattern, r.replacement)
    return c


def match_count(col: Column | str, rule: PiiRule) -> Column:
    """How many spans of ``rule`` appear in the raw text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(rule.pattern)).cast("bigint")


def pii_scan(df: DataFrame, text_col: str,
             rules: tuple[PiiRule, ...] = DEFAULT_RULES,
             out_col: str | None = None) -> DataFrame:
    """Append ``<text_col>_redacted`` plus one ``n_<rule>`` counter per
    rule. Counters are computed on the RAW text (before any replacement),
    so rule order affects only the redacted output, never the counts."""
    out = out_col or f"{text_col}_redacted"
    cols = [df[c] for c in df.columns]
    cols.append(redact(text_col, rules).alias(out))
    cols.extend(match_count(text_col, r).alias(f"n_{r.name}") for r in rules)
    return df.select(*cols)


# --------------------------------------------------------------------------
# Portable-SQL twins (DuckDB / RE2)
# --------------------------------------------------------------------------

def _sql_quote(pattern: str) -> str:
    return "'" + pattern.replace("'", "''") + "'"


def redact_sql(expr: str, rules: tuple[PiiRule, ...] = DEFAULT_RULES) -> str:
    """DuckDB expression equivalent of :func:`redact` (note the ``'g'``
    flag — DuckDB replaces only the first match by default, Spark all)."""
    for r in rules:
        expr = (f"regexp_replace({expr}, {_sql_quote(r.pattern)}, "
                f"'{r.replacement}', 'g')")
    return expr


def match_count_sql(expr: str, rule: PiiRule) -> str:
    """DuckDB expression equivalent of :func:`match_count`."""
    return (f"CAST(length(regexp_extract_all({expr}, "
            f"{_sql_quote(rule.pattern)})) AS BIGINT)")
