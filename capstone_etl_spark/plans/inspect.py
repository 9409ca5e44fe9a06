"""Physical-plan inspection utilities.

The engine's performance contract is enforced in tests with these
helpers: joins that must broadcast assert broadcast_hash_join_count,
candidate-based operators assert not has_cartesian, scan pushdown
asserts pushed_filters, and shuffle budgets assert exchange_count.
Inspecting the *executed* plan (post-AQE) keeps the assertions honest —
they see what would actually run, not the pre-optimization sketch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post planning, pre/post-AQE root)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (operator tree + details)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (each is a full
    materialize-and-repartition of its input — the scale currency)."""
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
                          executed_plan(df)))


def broadcast_hash_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def has_cartesian(df: DataFrame) -> bool:
    p = executed_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def wholestage_codegen_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (wider is better — JVM-side
    fused pipelines, no Python in the hot path)."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def unpartitioned_window_count(df: DataFrame) -> int:
    """Window nodes with an EMPTY partition spec — the shape behind
    Spark's "No Partition Defined for Window operation! Moving all data
    to a single partition" warning. A physical Window node prints as
    `Window [exprs], [partitionSpec], [orderSpec]`; an unpartitioned one
    omits the middle group. Count top-level bracket groups per node:
    fewer than 3 means no partition spec."""
    n = 0
    for line in executed_plan(df).splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        groups, depth = 0, 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            n += 1
    return n


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the columnar scan (PushedFilters: [...]).
    Parsed from explain('formatted'), NOT executedPlan().toString() —
    the latter truncates long scan-metadata entries mid-list (no
    closing bracket), silently dropping every filter from the match
    whenever more than a few predicates push."""
    hits = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))
    out: list[str] = []
    for h in hits:
        out.extend(s.strip() for s in h.split(",") if s.strip())
    return out
