"""Declarative data-quality checks (dbt schema tests, Spark-first).

The reference acknowledges tests as roadmap work (reference
``README.md:46`` "Add tests and documentation"; ``tests/.gitkeep``) —
dbt's test surface is part of the capability a dbt project ships, so
the engine provides it: the four dbt built-ins (``not_null``,
``unique``, ``accepted_values``, ``relationships``) plus arbitrary
predicate checks, declared per model and runnable standalone or
inside :class:`~dbt_lakehouse_aws_spark.plans.graph.ModelGraph` runs
(``checks=`` → dbt-build semantics: a failing check raises before
downstream models consume bad data).

Scale shape — a check is never a row materialization:

* ``not_null`` / ``accepted_values`` / ``expression`` compile into
  ONE combined conditional aggregate per model (a single scan
  produces every columnar check's violation count, map-side
  combined);
* ``unique`` is a groupBy on the key with one post-agg filter —
  shuffle O(distinct keys), counted, never collected;
* ``relationships`` is a left-anti join against the (usually
  broadcastable) parent key set — orphan COUNT, not orphan rows.

Results come back as a tiny DataFrame (one row per check) so the
report itself is queryable/joinable — and, in the driver gate,
value-checkable against a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null_violations(df: DataFrame, col: str) -> F.Column:
    """Aggregate expression: rows where ``col`` IS NULL."""
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("long")


def accepted_values_violations(df: DataFrame, col: str, values: Sequence) -> F.Column:
    """Aggregate expression: non-NULL rows outside ``values``
    (dbt semantics — NULLs are not_null's job, not this check's)."""
    return F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(list(values)), 1).otherwise(0)
    ).cast("long")


def expression_violations(df: DataFrame, predicate: str) -> F.Column:
    """Aggregate expression: rows FAILING the SQL ``predicate``
    (dbt's ``expression_is_true``). NULL predicate results count as
    failures — an unknown is not a pass."""
    return F.sum(
        F.when(F.coalesce(F.expr(predicate), F.lit(False)), 0).otherwise(1)
    ).cast("long")


def unique_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """1-row frame: number of ROWS involved in duplicate key groups
    (dbt's unique test counts rows beyond the first per key... it
    reports each duplicated value; we report the duplicated-row
    count, the actionable number). NULL keys are exempt, as in dbt."""
    key_cols = [F.col(c) for c in cols]
    non_null = df
    for c in cols:
        non_null = non_null.filter(F.col(c).isNotNull())
    return (
        non_null.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("failed_rows"))
    )


def relationship_violations(
    child: DataFrame, col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """1-row frame: non-NULL child keys with no parent (orphans)."""
    parents = parent.select(F.col(parent_col).alias(col)).distinct()
    return (
        child.filter(F.col(col).isNotNull())
        .select(col)
        .join(parents, col, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("failed_rows"))
    )


def run_checks(
    df: DataFrame,
    spec: dict,
    *,
    model: str = "model",
    parents: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Run a dbt-style check spec against one DataFrame.

    ``spec`` mirrors a dbt schema.yml block::

        {
          "not_null": ["o_orderkey", "o_custkey"],
          "unique": [["o_orderkey"]],                 # list of key tuples
          "accepted_values": {"o_orderstatus": ["O", "F", "P"]},
          "expression": {"positive_price": "o_totalprice > 0"},
          "relationships": [("o_custkey", "customer", "c_custkey")],
        }

    ``parents`` supplies the referenced tables for ``relationships``.
    Returns one row per check: (model, check, column, failed_rows,
    passed) — columnar checks share a single scan/aggregate.
    """
    parents = parents or {}
    results: list[DataFrame] = []

    agg_exprs: list[tuple[str, str, F.Column]] = []
    for c in spec.get("not_null", ()):
        agg_exprs.append(("not_null", c, not_null_violations(df, c)))
    for c, vals in spec.get("accepted_values", {}).items():
        agg_exprs.append(("accepted_values", c, accepted_values_violations(df, c, vals)))
    for name, predicate in spec.get("expression", {}).items():
        agg_exprs.append(("expression", name, expression_violations(df, predicate)))
    if agg_exprs:
        one = df.agg(
            *[e.alias(f"_c{i}") for i, (_, _, e) in enumerate(agg_exprs)]
        ).select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(kind).alias("check"),
                            F.lit(col).alias("column"),
                            F.coalesce(F.col(f"_c{i}"), F.lit(0)).alias("failed_rows"),
                        )
                        for i, (kind, col, _) in enumerate(agg_exprs)
                    ]
                )
            ).alias("r")
        ).select("r.check", "r.column", "r.failed_rows")
        results.append(one)

    for cols in spec.get("unique", ()):
        cols = [cols] if isinstance(cols, str) else list(cols)
        results.append(
            unique_violations(df, cols).select(
                F.lit("unique").alias("check"),
                F.lit(",".join(cols)).alias("column"),
                "failed_rows",
            )
        )
    for col, parent_name, parent_col in spec.get("relationships", ()):
        if parent_name not in parents:
            raise KeyError(f"relationships check needs parents[{parent_name!r}]")
        results.append(
            relationship_violations(df, col, parents[parent_name], parent_col).select(
                F.lit("relationships").alias("check"),
                F.lit(f"{col}->{parent_name}.{parent_col}").alias("column"),
                "failed_rows",
            )
        )
    if not results:
        raise ValueError("empty check spec")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        F.lit(model).alias("model"),
        "check",
        "column",
        "failed_rows",
        (F.col("failed_rows") == 0).alias("passed"),
    )


class CheckFailure(AssertionError):
    """Raised by ModelGraph when a declared check fails (dbt-build
    semantics: bad data stops the DAG before downstream reads it)."""


def freshness_report(
    df: DataFrame,
    *,
    loaded_at_col: str,
    as_of: str,
    warn_after_hours: float,
    error_after_hours: float,
    group_col: str | None = None,
) -> DataFrame:
    """dbt ``source freshness`` semantics: how stale is the newest
    row, overall or per group (per partition/feed), against warn /
    error SLAs.

    ``as_of`` is an EXPLICIT timestamp literal, not wall-clock —
    freshness evaluated in a plan must be reproducible (reruns,
    backfills, oracles); the orchestrator passes its own now().

    One max() aggregate per group — shuffle O(groups), no row
    materialization, same scale shape as the other checks. Returns
    (group?, max_loaded_at, hours_stale, status) with status in
    pass | warn | error, and NULL max_loaded_at (empty group set →
    no rows at all) reported as error.
    """
    if error_after_hours < warn_after_hours:
        raise ValueError("error_after_hours must be >= warn_after_hours")
    keys = [group_col] if group_col else []
    agg = df.groupBy(*keys).agg(F.max(loaded_at_col).alias("max_loaded_at"))
    hours = (
        F.unix_timestamp(F.lit(as_of).cast("timestamp"))
        - F.unix_timestamp("max_loaded_at")
    ).cast("double") / 3600.0
    out = agg.withColumn("hours_stale", F.round(hours, 4)).withColumn(
        "status",
        F.when(F.col("hours_stale").isNull(), "error")
        .when(F.col("hours_stale") > error_after_hours, "error")
        .when(F.col("hours_stale") > warn_after_hours, "warn")
        .otherwise("pass"),
    )
    return out.orderBy(*keys) if keys else out
