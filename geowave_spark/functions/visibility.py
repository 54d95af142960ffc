"""Visibility/auth filtering (F9) — the reference's field/row visibility
model re-expressed for a DataFrame engine.

The reference stores Accumulo-style column-visibility boolean expressions
per entry/field ("alpha&(bravo|charlie)") and lets the store evaluate them
against the scanner's authorization set
(`core/store/.../data/visibility/VisibilityManagement.java`,
`FieldLevelVisibilityHandler.java`; the JSON field->expression policy in
`adapter/vector/plugin/visibility/JsonDefinitionColumnVisibilityManagement.java:13-30`).
Accumulo evaluates per key-value server-side; the Spark-native equivalent
exploits that visibility expressions are POLICY LABELS — their distinct
cardinality is tiny and independent of row count:

- :func:`filter_by_visibility`: one bounded ``distinct`` scan over the
  expression column, each distinct expression evaluated ONCE on the driver,
  then a pure-Catalyst ``isin`` filter (pushed to the parquet scan as an In
  predicate).  Zero per-row Python at any scale.  A corpus whose label
  cardinality exceeds the gate falls back to an Arrow-batched UDF that
  factorizes per batch and memoizes evaluations — still one parse per
  distinct expression per batch.
- :func:`visible_fields` / :func:`mask_fields`: the JSON field->expression
  policy resolved at PLAN time (exact field key first, then the definition's
  regex keys in order — the documented precedence), unauthorized columns
  nulled in the projection so column pruning still applies.

Expression grammar (Accumulo ColumnVisibility, public format): tokens are
``[A-Za-z0-9_.:/-]+`` or double-quoted strings (``\"`` and ``\\`` escapes);
``&`` and ``|`` combine terms but may NOT be mixed at one nesting level
without parentheses; the empty expression is visible to everyone.
"""

from __future__ import annotations

import re
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_TOKEN_RE = re.compile(r"[A-Za-z0-9_.:/-]+")


class VisibilityParseError(ValueError):
    pass


def _tokenize(expr: str) -> list[str]:
    out, i, n = [], 0, len(expr)
    while i < n:
        c = expr[i]
        if c in "&|()":
            out.append(c)
            i += 1
        elif c == '"':
            j, buf = i + 1, []
            while j < n and expr[j] != '"':
                if expr[j] == "\\":
                    j += 1
                    if j >= n or expr[j] not in ('"', "\\"):
                        raise VisibilityParseError(f"bad escape in {expr!r}")
                buf.append(expr[j])
                j += 1
            if j >= n:
                raise VisibilityParseError(f"unterminated quote in {expr!r}")
            out.append("\x00" + "".join(buf))  # marker: literal token
            i = j + 1
        else:
            m = _TOKEN_RE.match(expr, i)
            if not m:
                raise VisibilityParseError(f"bad character {c!r} in {expr!r}")
            out.append("\x00" + m.group(0))
            i = m.end()
    return out


def evaluate_visibility(expr: str | None, auths: frozenset[str] | set[str]) -> bool:
    """True iff ``expr`` is satisfied by the authorization set.  The empty /
    null expression is visible to everyone (Accumulo convention).  Raises
    :class:`VisibilityParseError` on malformed expressions, including the
    grammar's mixed ``a&b|c`` (parentheses required)."""
    if expr is None or expr == "":
        return True
    toks = _tokenize(expr)
    pos = 0

    def parse_expr() -> bool:
        nonlocal pos
        val = parse_term()
        op = None
        while pos < len(toks) and toks[pos] in ("&", "|"):
            if op is not None and toks[pos] != op:
                raise VisibilityParseError(
                    f"cannot mix & and | without parentheses in {expr!r}"
                )
            op = toks[pos]
            pos += 1
            rhs = parse_term()
            val = (val and rhs) if op == "&" else (val or rhs)
        return val

    def parse_term() -> bool:
        nonlocal pos
        if pos >= len(toks):
            raise VisibilityParseError(f"unexpected end of expression in {expr!r}")
        t = toks[pos]
        if t == "(":
            pos += 1
            val = parse_expr()
            if pos >= len(toks) or toks[pos] != ")":
                raise VisibilityParseError(f"unbalanced parentheses in {expr!r}")
            pos += 1
            return val
        if t.startswith("\x00"):
            pos += 1
            return t[1:] in auths
        raise VisibilityParseError(f"unexpected {t!r} in {expr!r}")

    val = parse_expr()
    if pos != len(toks):
        raise VisibilityParseError(f"trailing tokens in {expr!r}")
    return val


def filter_by_visibility(
    df: DataFrame,
    vis_col: str,
    auths: set[str] | frozenset[str] | list[str],
    max_distinct: int = 10_000,
) -> DataFrame:
    """Rows whose visibility expression is satisfied by ``auths``.

    Fast path: the distinct expressions are probed with a bounded
    ``limit(max_distinct + 1)`` collect (the catalog-gate pattern), each
    evaluated once on the driver, and the filter ships as a Catalyst ``IN``
    over the satisfied expressions (plus the always-visible null/empty) —
    pushable to the scan, no UDF.  Above the gate: Arrow-batched UDF with
    per-batch factorize + cross-batch memoization."""
    auths = frozenset(auths)
    distinct = [
        r[0]
        for r in df.select(vis_col).distinct().limit(max_distinct + 1).collect()
    ]
    always = F.col(vis_col).isNull() | (F.col(vis_col) == "")
    if len(distinct) <= max_distinct:
        visible = [
            e for e in distinct if e not in (None, "") and evaluate_visibility(e, auths)
        ]
        if not visible:
            return df.filter(always)
        return df.filter(always | F.col(vis_col).isin(visible))

    memo: dict[str, bool] = {}

    @F.pandas_udf(BooleanType())
    def _vis_ok(vis: pd.Series) -> pd.Series:
        import numpy as np

        codes, uniq = pd.factorize(vis)
        verdicts = np.empty(len(uniq), dtype=bool)
        for i, e in enumerate(uniq):
            if e not in memo:
                memo[e] = evaluate_visibility(e, auths)
            verdicts[i] = memo[e]
        out = np.zeros(len(vis), dtype=bool)
        ok = codes >= 0
        out[ok] = verdicts[codes[ok]]
        out[~ok] = True  # null expression: visible
        return pd.Series(out)

    return df.filter(always | _vis_ok(F.col(vis_col)))


def visible_fields(
    fields: list[str],
    definition: dict[str, str],
    auths: set[str] | frozenset[str] | list[str],
) -> list[str]:
    """The subset of ``fields`` the auth set may read under a JSON-style
    field->expression policy.  Resolution per the reference: exact field key
    first, else the FIRST definition key (in insertion order) whose regex
    fully matches the field name; unmatched fields are unrestricted."""
    auths = frozenset(auths)
    out = []
    for f in fields:
        if f in definition:
            expr = definition[f]
        else:
            expr = next(
                (v for k, v in definition.items() if re.fullmatch(k, f)), None
            )
        if expr is None or evaluate_visibility(expr, auths):
            out.append(f)
    return out


def mask_fields(
    df: DataFrame,
    definition: dict[str, str],
    auths: set[str] | frozenset[str] | list[str],
) -> DataFrame:
    """Null out columns the auth set may not read (plan-time projection —
    the reader-side analog of FieldLevelVisibilityHandler's per-field
    visibility, with no runtime cost)."""
    allowed = set(visible_fields(df.columns, definition, auths))
    dtypes = dict(df.dtypes)
    return df.select(
        *[
            F.col(c) if c in allowed else F.lit(None).cast(dtypes[c]).alias(c)
            for c in df.columns
        ]
    )
