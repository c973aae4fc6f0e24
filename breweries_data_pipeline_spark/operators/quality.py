"""Declarative data-quality rules (SURVEY.md §2.3 F3-F5).

The reference evaluates each rule as its own ``filter(...).count()``
Spark job (breweries_data_quality_gold.py:28-33) — N rules = N full
scans. This engine compiles ALL rules into ONE single-pass aggregate
(``sum(when(violation, 1))`` per rule), so a 100 TB table is scanned
once regardless of rule count.

Unknown rule types raise (the reference silently passes them —
``invalid_count = 0`` — which hides config typos; SURVEY.md F5 flags
this as an engine-policy fix).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = dict[str, Any]  # {rule: str, column: str, ...extras}


def _violation_predicate(rule: Rule) -> Column:
    kind = rule["rule"]
    col = F.col(rule["column"])
    if kind == "not_null":
        return col.isNull()
    if kind == "greater_than_zero":
        return col <= 0  # null passes, matching reference filter semantics
    if kind == "non_negative":
        return col < 0
    if kind == "unique":
        raise ValueError("'unique' is aggregate-level; handled separately")
    if kind == "in_set":
        return ~col.isin(list(rule["values"])) | col.isNull()
    if kind == "matches_regex":
        return ~col.rlike(rule["pattern"]) | col.isNull()
    if kind == "between":
        return ~col.between(rule["min"], rule["max"]) | col.isNull()
    if kind == "expression":
        # rule-supplied SQL predicate that each row must satisfy
        return ~F.expr(rule["expr"])
    raise ValueError(f"unknown quality rule type: {kind!r}")


def rules_dataframe(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules in one pass; returns a long-format DataFrame
    ``(rule, column, invalid_count, passed)`` with one row per rule.

    ``unique`` rules are computed in the same job via
    ``count - count_distinct`` (exact; needs the full-key distinct
    hash — at extreme cardinality consider approx_count_distinct and a
    tolerance instead).
    """
    row_rules = [r for r in rules if r["rule"] != "unique"]
    uniq_rules = [r for r in rules if r["rule"] == "unique"]

    aggs = []
    for i, r in enumerate(row_rules):
        pred = _violation_predicate(r)
        aggs.append(
            F.coalesce(F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))), F.lit(0))
            .cast("long")
            .alias(f"__r{i}")
        )
    for j, r in enumerate(uniq_rules):
        aggs.append(
            (F.count(r["column"]) - F.count_distinct(F.col(r["column"])))
            .cast("long")
            .alias(f"__u{j}")
        )
    counts = df.agg(*aggs)

    # pivot the single wide row to long format with one inline() — the
    # scan+agg subplan appears exactly once in the physical plan (a
    # union of N selects would re-run the scan N times)
    pairs = [(r, f"__r{i}") for i, r in enumerate(row_rules)]
    pairs += [(r, f"__u{j}") for j, r in enumerate(uniq_rules)]
    structs = [
        F.struct(
            F.lit(r["rule"]).alias("rule"),
            F.lit(r["column"]).alias("column"),
            F.col(tmp).alias("invalid_count"),
            (F.col(tmp) == 0).alias("passed"),
        )
        for r, tmp in pairs
    ]
    return counts.select(F.inline(F.array(*structs)))


def evaluate_rules(df: DataFrame, rules: list[Rule]) -> list[dict[str, Any]]:
    """Driver-side rule results (for the JSON report sink), computed in
    one Spark job."""
    rows = rules_dataframe(df, rules).collect()
    return [row.asDict() for row in rows]
