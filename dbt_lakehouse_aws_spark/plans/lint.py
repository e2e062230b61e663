"""Physical-plan linter: "would this plan survive 100×?" as code.

The engine's scale rules (PERF.md "Standing scale rules") are
enforced by tests for OUR queries; this module makes the same
checks available to users for THEIR queries, pre-submission:

>>> from dbt_lakehouse_aws_spark.plans.lint import assert_scalable
>>> assert_scalable(df)            # raises PlanSmell with a report
>>> report = plan_report(df)       # or inspect without raising

Checks are string-level over the formatted physical plan — the same
surface ``df.explain("formatted")`` prints — so they track exactly
what Catalyst decided, after AQE static planning, not what the
author hoped. Each smell is something that is fine at notebook
scale and a cluster-killer at 100 TB:

- ``cartesian``: CartesianProduct — O(|L|·|R|) partitions.
- ``nested_loop``: BroadcastNestedLoopJoin — every probe row scans
  the whole broadcast side; fine for tiny inner sides only, so it
  is a *warning* unless paired with a non-equi join of two facts.
- ``python_row_udf``: BatchEvalPython — row-pickling Python UDF in
  the hot path (Arrow paths FlatMapGroupsInPandas / ArrowEvalPython
  / MapInPandas do NOT trigger this).
- ``single_partition_exchange``: Exchange SinglePartition — a
  global funnel (typically ``Window.orderBy`` without partitioning
  or ``coalesce(1)``); use the scalable-rank primitive instead.
- ``expand``: Expand — multiple count(DISTINCT) in one aggregate
  multiplies shuffle volume by the distinct-column count.
- ``unpushed_scan``: a parquet scan whose ``PushedFilters: []`` is
  empty while the plan filters the same relation directly above —
  the predicate did not reach the reader.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_ERROR_SMELLS = ("cartesian", "python_row_udf", "single_partition_exchange")
_WARN_SMELLS = ("nested_loop", "expand", "unpushed_scan")


class PlanSmell(AssertionError):
    """Raised by :func:`assert_scalable` with the full report."""


@dataclass
class PlanReport:
    smells: dict[str, bool]
    shuffle_count: int
    plan: str = field(repr=False)

    @property
    def errors(self) -> list[str]:
        return [s for s in _ERROR_SMELLS if self.smells.get(s)]

    @property
    def warnings(self) -> list[str]:
        return [s for s in _WARN_SMELLS if self.smells.get(s)]


def _formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


#: structural wrappers that sit between an Exchange and its real
#: consumer in AQE plans
_EXCHANGE_WRAPPERS = ("AQEShuffleRead", "ShuffleQueryStage", "ReusedExchange", "Sort")


def _single_partition_funnel(p: str) -> bool:
    """True only for a REAL global funnel: an Exchange SinglePartition
    whose consumer is not a no-grouping-key final aggregate.

    A scalar aggregate (``df.agg(...)`` with no groupBy) also plans
    ``Exchange SinglePartition``, but its input is one pre-combined
    partial row per map task — bounded by task count, not data size —
    so flagging it would outlaw every COUNT(*)/global-sum in the
    engine. The hazard case is a Window/row-funnel consumer, which
    materializes the full child relation in one task.
    """
    sections = p.split("== Physical Plan ==")
    if len(sections) < 2:
        return "SinglePartition" in p
    tree = sections[1].split("\n\n")[0].splitlines()
    nodes = []  # (indent, name, id)
    for ln in tree:
        m = re.search(r"([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", ln)
        if m:
            indent = len(ln) - len(ln.lstrip(" +:-*"))
            nodes.append((indent, m.group(1).strip(), int(m.group(2))))
    sp_ids = set()
    for block in p.split("\n\n"):
        m = re.match(r"\((\d+)\) Exchange\b", block)
        if m and "Arguments: SinglePartition" in block:
            sp_ids.add(int(m.group(1)))
    if not sp_ids:
        return False
    by_pos = list(enumerate(nodes))
    for i, (ind, name, nid) in by_pos:
        if nid not in sp_ids:
            continue
        # nearest ancestor that is not a structural wrapper
        j, cur_ind = i - 1, ind
        while j >= 0:
            p_ind, p_name, _ = nodes[j]
            if p_ind < cur_ind:
                # exact match: "Sort" is a pass-through wrapper under a
                # final SortAggregate, but "SortAggregate" itself is a
                # consumer (startswith would conflate them)
                if p_name in _EXCHANGE_WRAPPERS or p_name.startswith(
                    ("AQEShuffleRead", "ShuffleQueryStage", "ReusedExchange")
                ):
                    cur_ind = p_ind
                    j -= 1
                    continue
                if "Aggregate" not in p_name:
                    return True
                break
            j -= 1
    return False


def plan_report(df: DataFrame) -> PlanReport:
    """Lint ``df``'s physical plan; never raises."""
    p = _formatted_plan(df)
    smells = {
        "cartesian": "CartesianProduct" in p,
        "nested_loop": "BroadcastNestedLoopJoin" in p,
        "python_row_udf": "BatchEvalPython" in p,
        "single_partition_exchange": _single_partition_funnel(p),
        "expand": bool(re.search(r"\bExpand\b", p)),
        "unpushed_scan": bool(
            re.search(r"PushedFilters: \[\]", p) and re.search(r"\(\d+\) Filter", p)
        ),
    }
    return PlanReport(
        smells=smells,
        shuffle_count=len(re.findall(r"\bExchange\b", p)),
        plan=p,
    )


def assert_scalable(
    df: DataFrame,
    *,
    allow: tuple[str, ...] = (),
    max_shuffles: int | None = None,
    strict: bool = False,
) -> PlanReport:
    """Raise :class:`PlanSmell` if the plan has scale hazards.

    Error-class smells always raise; warning-class smells raise only
    under ``strict=True`` (a BroadcastNestedLoopJoin over a 10-row
    literal frame is legitimate — e.g. hard-negative mining — so
    warnings need a human call). ``allow`` exempts named smells;
    ``max_shuffles`` optionally bounds Exchange count.
    """
    rep = plan_report(df)
    bad = [s for s in rep.errors if s not in allow]
    if strict:
        bad += [s for s in rep.warnings if s not in allow]
    if max_shuffles is not None and rep.shuffle_count > max_shuffles:
        bad.append(f"shuffles={rep.shuffle_count}>{max_shuffles}")
    if bad:
        raise PlanSmell(
            f"plan smells: {bad}\n(smells: {rep.smells}, "
            f"shuffles: {rep.shuffle_count})\n{rep.plan[:4000]}"
        )
    return rep
