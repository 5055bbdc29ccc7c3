"""Physical-plan introspection — the engine's "is this the plan I
wanted?" API.

At 100 TB a correct answer with the wrong plan is a failed query:
a missed broadcast is an hours-long shuffle, a missed pushdown reads
the whole table. These helpers turn the executed-plan string into
checkable facts so plan shape can be asserted in tests
(tests/test_storage_layout.py) and inspected interactively:

    >>> from coviddatapipeline_spark.plans import audit
    >>> audit(df)["n_exchanges"], audit(df)["broadcast_joins"]

The reference has no notion of plans at all (row-at-a-time Python,
/root/reference/dags/ETL.py:91-107); this module exists because Spark
does, and the difference is the whole point of the engine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as a string — post-AQE wrapper,
    pre-execution."""
    return df._jdf.queryExecution().executedPlan().toString()


def audit(df: DataFrame) -> dict:
    """Summarize scale-relevant plan facts for a DataFrame."""
    plan = executed_plan(df)
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "nested_loop_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "cartesian_products": len(re.findall(r"\bCartesianProduct\b", plan)),
        "single_partition_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "pushed_filters": _section(plan, "PushedFilters"),
        "partition_filters": _section(plan, "PartitionFilters"),
        "read_schema": _section(plan, "ReadSchema"),
        "has_aqe": "AdaptiveSparkPlan" in plan,
        "plan": plan,
    }


def _section(plan: str, key: str) -> str:
    """Payload following ``key:`` in the plan string, up to the NEXT
    metadata section or end of line. FileScan prints every section
    comma-separated on ONE line (…, PartitionFilters: [...],
    PushedFilters: [...], ReadSchema: struct<...>), so a capture-to-
    end-of-line would swallow all later sections — and since every
    scanned column name appears in the trailing ReadSchema text, a
    pushdown assertion like ``"l_quantity" in pushed_filters`` would
    then pass vacuously even with pushdown regressed to nothing. The
    lookahead stops at ``, SomeSection: `` (capitalized word + colon +
    space, which filter payloads like ``GreaterThanOrEqual(...)`` and
    paths like ``file:/...`` never match)."""
    m = re.search(
        re.escape(key) + r":\s*(.*?)(?=, [A-Z][A-Za-z]*: |\n|$)", plan
    )
    return m.group(1) if m else ""


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the plan contains any Exchange — used to prove bucketed
    / co-partitioned paths stay shuffle-free."""
    a = audit(df)
    if a["n_exchanges"]:
        raise AssertionError(f"expected shuffle-free plan, found {a['n_exchanges']} Exchange(s):\n{a['plan'][:3000]}")


def assert_no_single_partition(df: DataFrame) -> None:
    """Raise if the plan funnels data through ONE partition (``Exchange
    SinglePartition``) — the compiled form of an unpartitioned window or
    global sort-aggregate, which serializes the whole input on one task
    (the round-1 ``WindowExec: No Partition Defined`` scale-killer)."""
    a = audit(df)
    if a["single_partition_exchanges"]:
        raise AssertionError(
            f"plan funnels through Exchange SinglePartition:\n{a['plan'][:3000]}"
        )


def assert_single_partition_windows_bounded(
    df: DataFrame, bound_regex: str
) -> int:
    """Every ``Exchange SinglePartition`` in the plan must sit ABOVE a
    row-bounding prune: its subtree (deeper-indented lines below it)
    must contain a line matching ``bound_regex`` — typically the
    per-bucket top-k ``Filter (lbk#n <= k)`` that caps the window's
    input at k * n_buckets rows. This turns the "that global window is
    safe, its input is pruned" comment into a test: deleting the prune
    leaves the SinglePartition exchange with no bound in its subtree
    and this raises. Returns the number of single-partition exchanges
    checked (0 is legal — no global window at all is even better).

    A ``Window.partitionBy(F.pmod(key, F.lit(1)))`` global window
    plans as ``Exchange hashpartitioning(_w0#N, ...)`` over a projected
    always-zero key instead of SinglePartition (the house trick that
    silences WindowExec's no-partition warning without changing
    semantics — pmod(key, 1) is 0 for every row, so one partition; a
    bare ``F.lit(0)`` does NOT survive: Catalyst folds foldable
    partition keys away). Those projected-key exchanges funnel all
    rows to one task exactly like SinglePartition, so they are held to
    the same bounded-input rule here. Expression partition keys are
    the only producers of ``_w*`` exchange keys (column keys keep
    their names), and this helper's sole caller is the RRF plan test
    whose only expression keys are these constants — a future
    non-constant expression key entering that plan would be flagged
    and forced to show a bound, which is the conservative failure."""
    plan = executed_plan(df)
    lines = plan.splitlines()

    def indent(line: str) -> int:
        m = re.search(r"[A-Za-z*(]", line)
        return m.start() if m else len(line)

    checked = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line and not re.search(
            r"Exchange hashpartitioning\(_w\d+#", line
        ):
            continue
        checked += 1
        d = indent(line)
        subtree = []
        for below in lines[i + 1 :]:
            if below.strip() and indent(below) <= d:
                break
            subtree.append(below)
        # A global scalar aggregate funnels ONE partial row per input
        # partition through SinglePartition — bounded by n_partitions,
        # not by data. Its immediate child is the keyless partial/merge
        # aggregate (count-distinct plans lead with merge_count).
        first_child = next((s for s in subtree if s.strip()), "")
        if re.search(
            r"Aggregate\(keys?=\[\], functions=\[(partial_|merge_)", first_child
        ):
            continue
        if not any(re.search(bound_regex, s) for s in subtree):
            raise AssertionError(
                f"Exchange SinglePartition at plan line {i} has no "
                f"row-bounding prune matching {bound_regex!r} below it:\n"
                + "\n".join([line] + subtree)[:3000]
            )
    return checked


def assert_no_cartesian(df: DataFrame) -> None:
    """Raise if the plan degenerated into a nested-loop/cartesian join —
    the failure mode of an inequality join missing its equi-key."""
    a = audit(df)
    if a["nested_loop_joins"] or a["cartesian_products"]:
        raise AssertionError(f"plan contains a cartesian/nested-loop join:\n{a['plan'][:3000]}")
