"""Plan audit: scan every declared query's physical plan for
scale-killers and print a report.

Red flags (each one is a shape that stops scaling somewhere between
sf0.1 and 100 TB):

- ``CartesianProduct`` — all-pairs blowup.
- ``BroadcastNestedLoopJoin`` — usually an inequality join that
  should have been bucketized (interval_join) or windowed (asof_join);
  quadratic per key group.
- ``Window`` with an EMPTY partition spec (``windowspecdefinition(``
  starting with an order spec) — a single-partition global sort: the
  whole dataset funnels through one task.
- ``BatchEvalPython`` / ``PythonUDF`` outside ArrowEvalPython — a
  row-at-a-time Python UDF in the hot path.

Known-legitimate exceptions are allowlisted per query with the reason
(single-row broadcasts for plane weights / model scalars, semantically
required cartesians for disjoint variables). The pytest gate
(tests/test_plan_audit.py) runs the same scan and FAILS on any
non-allowlisted hit, so a scale-killer cannot land in a declared query
unnoticed.

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query key, flag) pairs that are DESIGNED, with the reason.
ALLOWLIST: dict[tuple[str, str], str] = {
    # One-row broadcasts: Spark lowers a one-row cross join to
    # BroadcastNestedLoopJoin; the "loop" side is a single row of
    # plane weights / corpus scalars — constant work per row.
    ("ann_ivf", "BroadcastNestedLoopJoin"): "one-row query-vector broadcast",
    ("ann_recall", "BroadcastNestedLoopJoin"): (
        "probe broadcasts riding cosine_topk (exact side) and "
        "ivf_topk (centroid table) — both probe/k-bounded"
    ),
    ("rrf_fusion", "BroadcastNestedLoopJoin"): "one-row (N, avgdl) + query-vector broadcasts",
    ("bm25_topk", "BroadcastNestedLoopJoin"): "one-row (N, avgdl) broadcast",
    ("ngram_lm_score", "BroadcastNestedLoopJoin"): "one-row vocab-size broadcast",
    ("lm_buckets", "BroadcastNestedLoopJoin"): "one-row cut-points broadcast",
    ("nb_quality", "BroadcastNestedLoopJoin"): "one-row class-prior broadcast",
    ("mix_weights", "BroadcastNestedLoopJoin"): "one-row total/normalizer broadcasts",
    ("dsir_weights", "BroadcastNestedLoopJoin"): "one-row totals broadcasts",
    ("tfidf_topk", "BroadcastNestedLoopJoin"): "one-row doc-count broadcast",
    ("hll_distinct", "BroadcastNestedLoopJoin"): "one-row register-table fold",
    ("hist_quantiles", "BroadcastNestedLoopJoin"): "one-row total broadcast",
    ("token_kl_shift", "BroadcastNestedLoopJoin"): (
        "one-row (vocab, NA, NB) totals broadcast"
    ),
    ("collocations", "BroadcastNestedLoopJoin"): (
        "one-row total-token-count broadcast"
    ),
    ("vocab_coverage", "BroadcastNestedLoopJoin"): (
        "rk <= k inequality join of the <= max(ks) TakeOrdered "
        "survivors against the 4-row cut-point list, plus the "
        "one-row total broadcast"
    ),
    ("vocab_coverage", "GlobalWindow"): (
        "rank over the max(ks) TakeOrdered survivors"
    ),
    ("embed_drift", "BroadcastNestedLoopJoin"): (
        "one-row slice-count broadcasts onto the one-row mean fold"
    ),
    ("tpch_q22", "BroadcastNestedLoopJoin"): (
        "one-row global-average-balance broadcast (keyless plan "
        "Aggregate joined via Join([]))"
    ),
    ("rfm", "BroadcastNestedLoopJoin"): (
        "one-row corpus-max-date broadcast onto the per-customer "
        "aggregate"
    ),
    # Empty-partition rank windows that run over BOUNDED inputs: the
    # global sort they imply touches <= k (or <= 2*depth) rows that a
    # TakeOrderedAndProject already reduced — not the corpus.
    ("vocab_topk", "GlobalWindow"): "rank over the k TakeOrdered survivors",
    ("bm25_topk", "GlobalWindow"): "rank over the k TakeOrdered survivors",
    ("cms_topk", "GlobalWindow"): "rank over the k TakeOrdered survivors",
    ("rrf_fusion", "GlobalWindow"): "row_number over <= 2*depth fused rows",
}

FLAGS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)

def global_sort_windows(plan: str) -> bool:
    """True when some window runs with an empty PARTITION BY (the
    single-partition global sort). Detected structurally: a
    windowspecdefinition whose first argument is already an ordering
    spec (``x ASC NULLS FIRST``) rather than a partition column list."""

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        first = args.split(",")[0]
        if " ASC" in first or " DESC" in first:
            return True
    return False


def audit(sf_dir: str) -> list[tuple[str, str]]:
    from declarative_dataflow_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("plan_audit", master="local[4]")
    violations: list[tuple[str, str]] = []
    for key, fn in entry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - surfaced in report
            violations.append((key, f"PLAN ERROR: {e}"))
            continue
        hits = []
        for flag in FLAGS:
            if flag in plan and (key, flag) not in ALLOWLIST:
                hits.append(flag)
        if global_sort_windows(plan) and (key, "GlobalWindow") not in ALLOWLIST:
            hits.append("GlobalSortWindow")
        for h in hits:
            violations.append((key, h))
        status = "ok" if not hits else "FLAG " + ",".join(hits)
        allowed = [f for (k, f) in ALLOWLIST if k == key and f in plan]
        note = f" (allowed: {', '.join(allowed)})" if allowed else ""
        print(f"{key:24s} {status}{note}")
    return violations


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = audit(sf_dir)
    if bad:
        print("\nVIOLATIONS:")
        for key, flag in bad:
            print(f"  {key}: {flag}")
        sys.exit(1)
    print("\nALL PLANS CLEAN")
