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


def scale_audit(df: DataFrame, *, allow_bnlj: bool = True) -> list[tuple[str, str]]:
    """Lint ``df``'s physical plan for patterns that break at cluster scale."""
    plan = _plan_text(df)
    findings: list[tuple[str, str]] = []

    for m in re.finditer(r"Exchange SinglePartition", plan):
        # plan[:start] ends inside the Exchange's own line (its tree-prefix
        # glyphs) — the consumer is the last FULL line above it.
        lines = plan[: m.start()].split("\n")
        parent = lines[-2] if len(lines) >= 2 else ""
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
