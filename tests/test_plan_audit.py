"""Plan audit across ALL driver-contract queries: no contract plan may
contain an unpartitioned window (the single-task scale hazard —
`WARN WindowExec: No Partition Defined`). Spark renders a window node as
``Window [funcs], [partitionSpec], [orderSpec]`` when partitioned and
with only two bracket groups when not; the audit parses top-level
bracket groups per Window line."""

import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _bracket_groups(line: str) -> int:
    depth, groups = 0, 0
    for ch in line:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth -= 1
    return groups


def test_no_unpartitioned_windows_in_contract_plans(spark):
    offenders = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            stripped = line.strip().lstrip("+-*( ")
            if stripped.startswith("Window "):
                if _bracket_groups(stripped) < 3:
                    offenders.append((name, stripped[:120]))
    assert not offenders, offenders


def test_topk_contract_queries_use_bounded_heap(spark):
    """The global top-k queries must plan as TakeOrderedAndProject
    (per-partition heap + k-row merge), not a global sort."""
    for name in ("bm25_topk", "tfidf_topk", "embedding_cosine_topk",
                 "events_user_topk"):
        df = entrymod.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan[:500])
