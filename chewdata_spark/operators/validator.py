"""Validator step: named boolean rules → ``_error`` column.

Reference semantics (src/step/validator.rs:116-362): each rule is a
boolean template; failing rules' messages are concatenated with
``error_separator`` (default CRLF) into the record's ``_error`` field.
The record becomes an Err record but **still flows** — downstream steps
route on ``data_type`` ok/err.

Spark-first: one ``concat_ws(sep, when(~rule, msg)...)`` projection —
no UDF, no shuffle, codegen'd.  The Ok/Err channel is two filters on
``_error`` nullity (see :mod:`chewdata_spark.operators.errors`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chewdata_spark.operators.transformer import template_to_column

ERROR_COL = "_error"
DEFAULT_SEPARATOR = "\r\n"


@dataclass
class Rule:
    """A named validation rule (reference: src/step/validator.rs:17-34)."""

    name: str
    pattern: str | Column  # boolean template/expression; False => rule failed
    message: str | None = None  # defaults to "rule <name> failed"


def _rule_condition(rule: Rule) -> Column:
    if isinstance(rule.pattern, Column):
        return rule.pattern
    return template_to_column(rule.pattern).cast("boolean")


def apply_rules(
    df: DataFrame,
    rules: list[Rule | dict],
    *,
    error_separator: str = DEFAULT_SEPARATOR,
) -> DataFrame:
    """Append/extend the ``_error`` column from failing rules.

    A rule evaluating to NULL counts as failed (the reference's template
    render error → Err record).  All-pass records keep ``_error`` NULL.
    """
    parts: list[Column] = []
    if ERROR_COL in df.columns:
        parts.append(F.col(ERROR_COL))
    for r in rules:
        if isinstance(r, dict):
            r = Rule(**r)
        msg = r.message if r.message is not None else f"rule {r.name} failed"
        cond = _rule_condition(r)
        parts.append(F.when(~F.coalesce(cond, F.lit(False)), F.lit(msg)))
    err = F.nullif(F.concat_ws(error_separator, *parts), F.lit(""))
    return df.withColumn(ERROR_COL, err)
