"""Physical-plan assertions for tests and tuning."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a filter fragment reached the data source scan
    (PushedFilters: [...] in the formatted plan)."""
    plan = formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    if not any(fragment in l for l in pushed):
        raise AssertionError(
            f"filter fragment {fragment!r} not pushed to scan; pushed lines: "
            f"{pushed}\nfull plan:\n{plan}"
        )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """Assert at least ``min_count`` broadcast joins in the plan."""
    plan = formatted(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < min_count:
        raise AssertionError(
            f"expected ≥{min_count} broadcast join(s), found {n}\n{plan}"
        )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded) — the thing to minimize at scale. Counts
    unique node ids from the formatted plan's detail section, so tree
    and detail listings aren't double-counted."""
    import re

    plan = formatted(df)
    ids = set(re.findall(r"^\((\d+)\) Exchange\b", plan, flags=re.M))
    return len(ids)
