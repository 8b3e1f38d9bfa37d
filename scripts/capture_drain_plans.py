#!/usr/bin/env python
"""Capture the FINAL adaptive (AQE) physical plans of a full drain.

VERDICT r4 item 4: at small drains the round's verdict join and the
non-deferred anti-join broadcast their "small" sides; near the 64 MB
threshold AQE can silently flip them to sort-merge.  This script runs a
drain at a given frontier size, then reads the Spark SQL status store —
the same source as the SQL UI — whose ``physicalPlanDescription`` holds
the executed plan with ``isFinalPlan=true``, i.e. the join strategies
AQE actually picked at runtime, not the static estimate.

Usage:
    python scripts/capture_drain_plans.py --urls 10000000 \
        --out PLANS_10M.txt [--cpus 32]

Prints a per-execution join-node census (+ per-round job counts) and
writes the full final plans to ``--out`` for PLANS.md citation.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import tempfile
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\s+(\w+)?[^(]*\((\d+)\)"
)


def final_plan_joins(plan: str) -> Counter:
    """Join-node census over ONLY the ``== Final Plan ==`` segments of
    an AQE physical-plan description (the Initial Plan records the
    pre-runtime estimate — counting it would hide exactly the
    broadcast→sort-merge flips this capture exists to surface).
    Deduped by plan node id: cached subtrees (the decisions cache) are
    re-printed verbatim under every consumer, so raw occurrence counts
    multiply one join by its consumer count."""
    by_id: dict[str, str] = {}
    in_final = False
    for ln in plan.splitlines():
        if "== Final Plan ==" in ln:
            in_final = True
            continue
        if "== Initial Plan ==" in ln:
            in_final = False
            continue
        if ln.startswith("("):  # node-detail section ends the tree
            in_final = False
        if in_final:
            for m in JOIN_RE.finditer(ln):
                by_id[m.group(3)] = (
                    f"{m.group(1)} {m.group(2) or ''}".strip()
                )
    return Counter(by_id.values())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--out", default="PLANS_drain.txt")
    ap.add_argument(
        "--budget", type=int, default=None,
        help="per-host budget_per_round (default: --urls = full one-round "
        "drain, which skips the deferral anti-join by construction; set "
        "lower to force multi-round deferral and exercise it)",
    )
    args = ap.parse_args()

    import os

    from pyspark.sql import functions as F

    from cex_crawler_spark.catalog import SnapshotCatalog
    from cex_crawler_spark.plans.driver import bootstrap, crawl
    from cex_crawler_spark.session import get_spark
    from cex_crawler_spark.synth import gen_frontier, gen_host_policy

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="drain-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    watermark = "2025-08-29 00:00:00"
    with tempfile.TemporaryDirectory() as tmp:
        cat = SnapshotCatalog(tmp)
        bootstrap(
            cat, gen_frontier(spark, args.urls, n_payloads=1000), watermark
        )
        policy = gen_host_policy(spark).withColumn(
            "budget_per_round", F.lit(args.budget or args.urls)
        )
        t0 = time.perf_counter()
        stats = crawl(
            spark, cat, policy, watermark, max_rounds=20,
            bloom_expected=max(args.urls * 2, 100_000),
        )
        elapsed = time.perf_counter() - t0
        n_results = cat.read(spark, "results").count()

    tracker = spark.sparkContext.statusTracker()
    job_counts = {
        f"round-{i}": len(tracker.getJobIdsForGroup(f"round-{i}"))
        for i in range(len(stats))
    }

    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    lines: list[str] = []
    census: list[dict] = []
    for i in range(execs.size()):
        e = execs.apply(i)
        desc = str(e.description())
        if "crawl round" not in desc:
            continue
        plan = str(
            store.execution(e.executionId()).get().physicalPlanDescription()
        )
        joins = final_plan_joins(plan)
        census.append(
            {
                "execution": int(e.executionId()),
                "desc": desc,
                "is_final": "isFinalPlan=true" in plan,
                "joins": dict(joins),
            }
        )
        lines.append(f"{'=' * 72}\nexecution {e.executionId()}  {desc}\n")
        lines.append(plan)

    Path(args.out).write_text("\n".join(lines))
    print(
        json.dumps(
            {
                "urls": args.urls,
                "cpus": cpus,
                "seconds": round(elapsed, 1),
                "urls_per_sec": round(n_results / elapsed, 1),
                "rounds": len(stats),
                "jobs_per_round": job_counts,
                "executions": census,
                "plans_file": args.out,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
