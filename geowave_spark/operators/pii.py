"""PII redaction for training-data pipelines: scrub emails, phone numbers,
IPv4 addresses, and SSN-style ids from a text column, JVM-side.

Every pattern uses ONLY regex constructs with identical semantics in Java
regex (Spark's ``regexp_replace``/``regexp_count``) and RE2 (DuckDB's
``regexp_*`` — the oracle engine): character classes, bounded quantifiers,
alternation.  No backreferences, no lookaround (RE2 has neither), no word
boundaries (``\\b`` differs at the margins).  The same discipline as the
BPE subword regex (`queries_text.SUBWORD_RX`).

Counts are taken against the text AS EACH RULE SEES IT (after the previous
rules' replacements), so ``n_<kind>`` is exactly the number of substitutions
that rule performed — the auditable contract a compliance pass needs.

Rule order is semantic, not cosmetic: emails go first (their local/domain
parts can contain digit runs the later rules would chew up), SSN-style ids
before phones (both are dash-joined digit groups; the 3-2-4 shape must not
be left for the 3-3-4 rule's partial matches to mangle).

100 TB shape: four chained ``regexp_replace`` expressions inside one
whole-stage-codegen projection — zero shuffles, zero Python, linear scan.
(Beyond-reference scope: the reference's visibility layer —
`core/store/.../VisibilityExpression.java` — controls row access; content
redaction is the training-data analog.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — applied in list order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``<text_col>_redacted`` plus one ``n_<kind>`` int column per rule.

    The input column is left untouched; downstream writers drop it when the
    redacted corpus is the product."""
    cur = F.col(text_col)
    counts = []
    for kind, pat, rep in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    return df.select("*", *counts, cur.alias(f"{text_col}_redacted"))


def pii_rules_sql(text_expr: str) -> tuple[list[str], str]:
    """The DuckDB twin: (count expressions in rule order, redacted expr).
    RE2 needs the explicit ``'g'`` flag — unlike Java, its replace is
    first-match-only by default."""
    cur = text_expr
    counts = []
    for kind, pat, rep in PII_RULES:
        counts.append(f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INT) AS n_{kind}")
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return counts, cur
