#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Cluster:
    spark-submit --py-files cex_crawler_spark.zip scripts/run_crawl.py \\
        --catalog s3://bucket/crawl --seeds 10000000 --watermark "2025-08-29 00:00:00"

(build the zip with ``python -c "from cex_crawler_spark.session import
make_pyfiles_zip; print(make_pyfiles_zip('cex_crawler_spark.zip'))"``)

Local sandbox:
    python scripts/run_crawl.py --catalog /tmp/crawl --seeds 100000

Resumable: re-invoking with the same --catalog continues after the last
committed round (the manifest is the checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="snapshot catalog root")
    ap.add_argument("--seeds", type=int, default=100_000,
                    help="synthetic seed frontier size (ignored on resume)")
    ap.add_argument("--watermark", default="2025-08-29 00:00:00")
    ap.add_argument("--max-rounds", type=int, default=100)
    ap.add_argument("--budget", type=int, default=None,
                    help="override per-host budget_per_round")
    ap.add_argument("--expand", action="store_true",
                    help="enable link discovery (S8)")
    ap.add_argument("--master", default=None,
                    help="override master (default: local[$SPARK_GRAFT_CPUS]; "
                         "under spark-submit pass --master there instead)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cex_crawler_spark.catalog import SnapshotCatalog
    from cex_crawler_spark.plans.driver import bootstrap, crawl
    from cex_crawler_spark.session import get_spark
    from cex_crawler_spark.synth import gen_frontier, gen_host_policy

    spark = get_spark(app_name="crawl", master=args.master)
    catalog = SnapshotCatalog(args.catalog)
    policy = gen_host_policy(spark)
    if args.budget:
        policy = policy.withColumn("budget_per_round", F.lit(args.budget))

    if not catalog.has_table("frontier"):
        bootstrap(catalog, gen_frontier(spark, args.seeds), args.watermark)
    stats = crawl(
        spark, catalog, policy, args.watermark,
        max_rounds=args.max_rounds,
        bloom_expected=max(args.seeds * 4, 100_000),
        expand=args.expand,
    )
    print(json.dumps({"rounds": stats, "final_round": catalog.current_round()}))


if __name__ == "__main__":
    main()
