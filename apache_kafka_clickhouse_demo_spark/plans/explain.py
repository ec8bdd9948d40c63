"""Plan-shape assertions — the tests' guard that scale properties hold.

Correctness tests prove the numbers; these prove the PLAN: filters reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema), small
dimensions broadcast.  A query that silently regresses to a full scan or a
shuffle join still passes value checks at sf0.01 but dies at 100 TB — this
is the tripwire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in a PushedFilters list of the plan."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    joined = "\n".join(pushed)
    for frag in fragments:
        if frag not in joined:
            raise AssertionError(
                f"filter fragment {frag!r} not pushed to scan.\nPushedFilters lines:\n{joined}\n\nfull plan:\n{plan}"
            )


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines of all file scans (column-pruning check)."""
    plan = formatted_plan(df)
    return [line.strip() for line in plan.splitlines() if "ReadSchema" in line]


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < expect:
        raise AssertionError(f"expected >= {expect} broadcast joins, found {n}.\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains CartesianProduct:\n{plan}")
