"""Physical-plan inspection — the engine's efficiency contract, as code.

SURVEY.md §4: the reference has no optimizer of its own; on Spark the
optimizer IS the engine, so plan *shape* is part of correctness here. These
helpers parse ``df.explain("formatted")`` output so tests can assert the
plans we designed for 100 TB actually materialize at any scale:

- filters reach the parquet scan (``PushedFilters``),
- scans read only referenced columns (``ReadSchema`` pruning),
- small dims broadcast (BroadcastHashJoin, never SortMergeJoin),
- nothing degenerates into a CartesianProduct,
- hot expression chains stay inside WholeStageCodegen spans,
- shuffle (Exchange) count matches the designed plan.

A plan regression (a lost pushdown, a join that stops broadcasting) fails
tests/test_plans.py even though results stay correct — catching at sf0.001
what would only hurt at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (explain output, captured)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's file scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Per file scan, the list of column names actually read (pruning)."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def _count_op(df: DataFrame, op: str) -> int:
    """Count physical operators by their detail-section header ``(N) Op`` —
    formatted explain prints each operator in both the tree and the details,
    so a bare substring count would double."""
    return len(re.findall(rf"^\(\d+\) {op}\b", formatted_plan(df), re.M))


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    return _count_op(df, "Exchange")


def broadcast_hash_joins(df: DataFrame) -> int:
    return _count_op(df, "BroadcastHashJoin")


def sort_merge_joins(df: DataFrame) -> int:
    return _count_op(df, "SortMergeJoin")


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans (wider = fewer interpreter breaks).
    Codegen ids only appear once stages have run — under AQE, call an action
    on ``df`` first, then inspect."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def broadcast_hint_count(df: DataFrame) -> int:
    """Explicit ``F.broadcast()`` hints surviving in the analyzed logical
    plan. A forced hint bypasses AQE's size check, so any table that grows
    with the corpus (per-doc sizes, loser lists) must contribute ZERO here —
    AQE may still broadcast it at runtime when it is genuinely small, which
    is the behavior we want and this counter deliberately ignores."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return plan.count("strategy=broadcast")


def broadcast_hint_sites(df: DataFrame) -> int:
    """Distinct broadcast-hinted SUBTREES in the analyzed logical plan,
    deduped by the hinted child's semantic hash. ``broadcast_hint_count``
    counts plan OCCURRENCES, which multiply when the analyzer re-expands a
    shared subtree per reference — a number that moves with Spark's planner
    internals, not with the code. This counter is the stable site-level
    invariant: a NEW hint on a different side moves it; re-expansion of an
    existing one does not (ADVICE r11).

    Known blind spot (ADVICE r12): the walk covers ``node.children()``
    only — a hint nested inside a SUBQUERY EXPRESSION (ScalarSubquery /
    exists / in-subquery) lives under the expression tree, not the child
    list, and would be invisible here. No registry query hints inside a
    subquery expression today; if one starts to, extend the walk over
    ``node.subqueries()`` alongside children."""
    seen: set[int] = set()
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "ResolvedHint" and "broadcast" in str(
            node.hints()
        ):
            seen.add(node.child().semanticHash())
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return len(seen)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan combines map-side (partial_*) before the shuffle —
    the difference between shuffling group states and shuffling raw rows."""
    return bool(re.search(r"partial_(sum|avg|count|min|max)", formatted_plan(df)))


def partition_filters(df: DataFrame) -> list[str]:
    """Every non-empty PartitionFilters entry across the plan's file scans —
    non-empty means the scan prunes whole directories/files from a
    hive-partitioned layout before any row is read."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out
