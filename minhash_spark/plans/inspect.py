"""Physical-plan inspection helpers — used by tests to pin the plan
properties that matter at scale (column pruning reaching the scan, partition
pruning, no Python in JVM-only stages, broadcast joins where intended).
A plan that silently regresses to reading `html` for a 2-column projection
or to a row-at-a-time Python filter is a bug even when results are correct.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanReport:
    text: str

    @property
    def has_python(self) -> bool:
        return bool(re.search(r"(ArrowEvalPython|BatchEvalPython|PythonUDF|MapInPandas|FlatMapGroupsInPandas)", self.text))

    @property
    def python_stages(self) -> list[str]:
        return re.findall(
            r"(ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)",
            self.text,
        )

    @property
    def joins(self) -> list[str]:
        return re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)",
            self.text,
        )

    @property
    def read_schemas(self) -> list[str]:
        return re.findall(r"ReadSchema: (struct<[^\n]*>)", self.text)

    @property
    def partition_filters(self) -> list[str]:
        return re.findall(r"PartitionFilters: \[([^\]]*)\]", self.text)

    @property
    def pushed_filters(self) -> list[str]:
        return re.findall(r"PushedFilters: \[([^\]]*)\]", self.text)


def plan_report(df: DataFrame) -> PlanReport:
    return PlanReport(executed_plan(df))
