"""Physical-plan introspection: the library behind ``tools/audit_plans.py``
and the bucketed-join tests.

Plan text is the ground truth for every scale claim this repo makes —
pushdown reached the scan, the small side broadcast, no accidental
cartesian — so assertions run against ``explain("formatted")`` output
rather than trusting the DataFrame API to have done the right thing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full formatted physical plan (what ``df.explain("formatted")``
    prints), untruncated — ``executedPlan().toString()`` elides fields."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def check_plan(
    df: DataFrame, must: list[str], must_not: list[str]
) -> tuple[list[str], list[str]]:
    """Return (missing must-patterns, present forbidden-patterns) for the
    DataFrame's physical plan; both empty = the plan is the one we want."""
    plan = formatted_plan(df)
    missing = [p for p in must if not re.search(p, plan)]
    present = [p for p in must_not if re.search(p, plan)]
    return missing, present


def assert_plan(df: DataFrame, must: list[str], must_not: list[str]) -> None:
    """Raise AssertionError (with the offending patterns) unless the plan
    matches every ``must`` regex and no ``must_not`` regex."""
    missing, present = check_plan(df, must, must_not)
    if missing or present:
        raise AssertionError(
            f"plan check failed: missing={missing} forbidden-present={present}"
        )
