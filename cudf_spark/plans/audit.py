"""Scale-audit linting of physical plans.

``scale_audit(df)`` walks a DataFrame's executed plan string and reports
the anti-patterns that are invisible at test scale but fatal at 100 TB —
the same checklist tests/test_plans.py pins for the built-in queries,
exposed as a library API so users can vet their own pipelines:

- ``single_partition_funnel`` — ``Exchange SinglePartition`` feeding a
  row-preserving operator (global ``Window.partitionBy()``, ``sort`` to
  one partition, ``repartition(1)``): the whole dataset flows through one
  task. NOT flagged when it feeds a merge aggregate (a global ``agg`` moves
  only one partial row per upstream partition) or a limit collector —
  those are bounded by design.
- ``cartesian_product`` — ``CartesianProduct`` in the plan: O(N·M) blowup.
  ``BroadcastNestedLoopJoin`` is flagged only with ``allow_bnlj=False``;
  the default tolerates it because BNLJ over a 1-row broadcast (the
  scalar-subquery pattern) is the *recommended* shape.
- ``python_row_udf`` — ``BatchEvalPython`` (row-at-a-time Python UDF);
  Arrow-batched variants (``ArrowEvalPython``/``MapInPandas``/
  ``FlatMapGroupsInPandas``) pass.

Returns a list of ``(code, detail)`` findings; empty list == clean.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_BOUNDED_CONSUMERS = (
    "HashAggregate",        # merge side of a global agg: one row per partition in
    "SortAggregate",
    "ObjectHashAggregate",
    "CollectLimit",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "AdaptiveSparkPlan",    # AQE root wrapper, not a consumer
)


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _depth(line: str) -> int:
    """Tree depth of a plan line from its prefix glyphs.

    Each ancestor level contributes 3 chars — ``':  '``/``'   '`` for
    pass-through levels and ``'+- '``/``':- '`` for the node marker — so
    depth == prefix_len / 3.
    """
    m = re.match(r"^((?::  |   )*)(?:[+:]- )?", line)
    return len(m.group(0)) // 3


def scale_audit(df: DataFrame, *, allow_bnlj: bool = True) -> list[tuple[str, str]]:
    """Lint ``df``'s physical plan for patterns that break at cluster scale."""
    plan = _plan_text(df)
    findings: list[tuple[str, str]] = []

    lines = plan.split("\n")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # The consumer is the nearest line ABOVE at one level shallower —
        # the immediately preceding line may be the deepest leaf of a prior
        # sibling subtree (e.g. when the Exchange is a join's second child),
        # so walk the tree-prefix glyph depth, not text adjacency.
        d = _depth(line)
        parent = ""
        for j in range(i - 1, -1, -1):
            cand = lines[j]
            if not cand.strip() or "==" in cand:  # section headers, blanks
                continue
            if _depth(cand) < d:
                parent = cand
                break
        if not any(k in parent for k in _BOUNDED_CONSUMERS):
            findings.append(
                ("single_partition_funnel", f"feeds: {parent.strip()[:90] or '<plan root>'}")
            )

    if "CartesianProduct" in plan:
        findings.append(("cartesian_product", "CartesianProduct in plan"))
    if not allow_bnlj and "BroadcastNestedLoopJoin" in plan:
        findings.append(("cartesian_product", "BroadcastNestedLoopJoin in plan"))

    if "BatchEvalPython" in plan:
        findings.append(
            ("python_row_udf", "row-at-a-time Python UDF; use pandas_udf/mapInPandas")
        )

    return findings
