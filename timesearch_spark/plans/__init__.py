"""Physical-plan inspection helpers.

The brief's rule: after an operator is correct, ``.explain("formatted")``
it and iterate until the plan is the one you'd want at 100 TB.  These
helpers make those properties assertable in tests so regressions in
pushdown / pruning / join strategy / partial aggregation fail CI instead
of shipping.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) plan string without executing."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip()
            if body not in ("[]", ""):
                out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning witness."""
    return [
        line.strip().split(":", 1)[1].strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has(df: DataFrame, fragment: str) -> bool:
    return fragment in formatted_plan(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return has(df, "BroadcastHashJoin")


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial+final hash aggregation (map-side combine) present."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial" in plan


def num_shuffles(df: DataFrame) -> int:
    """Count of Exchange operators (each is one detail header
    ``(N) Exchange`` in the formatted plan — the tree line would double
    count)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))


def count_codegen_spans(plan: str) -> int:
    """Distinct ``[codegen id : N]`` markers in an explain string — the
    ONE parser for the marker, shared by the DataFrame helper below and
    tools/dump_plans.py (which feeds it a post-AQE final explain)."""
    ids = set()
    for token in plan.split("[codegen id : ")[1:]:
        ids.add(token.split("]")[0].strip())
    return len(ids)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen subtrees (wider = better).
    Formatted explain marks membership as ``[codegen id : N]``."""
    return count_codegen_spans(formatted_plan(df))
