"""Physical-plan lint over the ENTIRE query registry.

Two invariants every registered query's plan must satisfy — the two
failure modes that silently kill a plan at 100 TB:

- no ``CartesianProduct``: an un-broadcast cross join is O(n·m) shuffle
  work. Deliberate tiny-side cross joins (queries × corpus, 1-row
  aggregates) plan as ``BroadcastNestedLoopJoin``, which is allowed.
- no row-at-a-time Python UDF (``BatchEvalPython`` node): Python in a
  plan is only acceptable Arrow-batched (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``) or as the deliberate UDTF
  surface (``BatchEvalPythonUDTF`` — token_runs' lateral join demo).

Planning at sf0.001 exercises exactly what the driver/bench will run;
iterative operators execute their (tiny) fixpoint loops during plan
construction, which is part of the point — the lint sees the real plan.
"""

from __future__ import annotations

import re

import pytest

from is3107datapipelineproject_spark.workload import registry

SF_SMOKE = "/root/testdata/sf0.001"

# BatchEvalPython <- row UDF (forbidden); BatchEvalPythonUDTF <- allowed.
ROW_UDF = re.compile(r"BatchEvalPython(?!UDTF)")


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_plan_has_no_cartesian_or_row_python(spark, name):
    fn = registry.queries()[name]
    plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert not ROW_UDF.search(plan), f"{name}: row-at-a-time Python UDF in plan"
