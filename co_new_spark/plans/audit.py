"""Plan-shape audit helpers: walk a DataFrame's optimized logical plan (via
py4j) and report structural scale hazards.  Used by the
tests/test_plan_shapes.py gates and tools/scan_global_windows.py.

The one hazard currently audited is the unpartitioned Window — a
``Window.orderBy(...)`` with no ``partitionBy`` compiles to an Exchange
SinglePartition + global Sort, i.e. every row of the window's input funnels
through ONE reducer.  That is a 100 TB scale-killer unless the input is
already bounded by a Limit (the distributed-top-k-then-rank pattern,
e.g. queries/training4.py::t_substring_hotspans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _subtree_has_limit(node) -> bool:
    if node.nodeName() in ("GlobalLimit", "LocalLimit"):
        return True
    ch = node.children()
    return any(_subtree_has_limit(ch.apply(i)) for i in range(ch.size()))


def global_windows(df: DataFrame) -> list[tuple[str, bool]]:
    """All unpartitioned Window nodes in the optimized logical plan.

    Returns ``[(window_node_string, input_bounded_by_limit)]``.  An entry
    with ``input_bounded_by_limit=False`` means a single-partition global
    sort over an unbounded input — the pattern the plan gate bans.
    """
    out: list[tuple[str, bool]] = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().size() == 0:
            ch = node.children()
            bounded = any(_subtree_has_limit(ch.apply(i))
                          for i in range(ch.size()))
            out.append((node.simpleString(25), bounded))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """The gate predicate: unpartitioned windows NOT fed by a Limit."""
    return [s for s, bounded in global_windows(df) if not bounded]
