"""Mechanical plan audit over EVERY declared query: no declared plan
may contain a scale-killer (CartesianProduct, BroadcastNestedLoopJoin,
row-at-a-time Python UDF, single-partition global-sort window) unless
the (query, flag) pair is explicitly allowlisted with a reason in
tools/plan_audit.py — the same discipline the per-operator plan gates
enforce, generalized so a future query cannot regress unnoticed.

Runs at sf0.001 (planning is the point, not execution; recursive
queries do execute their fixpoints while building the result frame,
which is why the smallest sf backs this gate)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_every_declared_plan_is_scale_clean(spark):
    import __spark_entry__ as entry
    from plan_audit import ALLOWLIST, FLAGS, global_sort_windows

    violations = []
    for key, fn in entry.queries().items():
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        for flag in FLAGS:
            if flag in plan and (key, flag) not in ALLOWLIST:
                violations.append((key, flag))
        if global_sort_windows(plan) and (key, "GlobalWindow") not in ALLOWLIST:
            violations.append((key, "GlobalSortWindow"))
    assert violations == [], f"scale-killers in declared plans: {violations}"


def test_allowlist_entries_still_apply(spark):
    """Every allowlist entry must still be justified: its query exists
    and its plan still contains the allowed flag (a stale entry means
    the query improved — drop the exemption so it cannot mask a
    future regression)."""

    import __spark_entry__ as entry
    from plan_audit import ALLOWLIST, global_sort_windows

    qs = entry.queries()
    stale = []
    for (key, flag), reason in ALLOWLIST.items():
        assert key in qs, f"allowlist references unknown query {key}"
        plan = qs[key](spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        present = (
            global_sort_windows(plan) if flag == "GlobalWindow" else flag in plan
        )
        if not present:
            stale.append((key, flag, reason))
    assert stale == [], f"stale allowlist entries (drop them): {stale}"
