#!/usr/bin/env python
"""spark-submit entrypoint for the county workflow.

Cluster:   spark-submit --py-files bpp.zip scripts/run_pipeline.py \
               --tier sf0.1 --out /data/bpp_out
Local dev: python scripts/run_pipeline.py --tier sf0.001 --out /tmp/bpp_out

Re-running after a failure resumes from the per-partition lineage
(only missing cell-prefix buckets are processed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf0.001", help="fixture tier (sfX)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--master", default=None, help="override spark master")
    ap.add_argument("--prefix-level", type=int, default=5)
    args = ap.parse_args()

    from biomass_processing_pipeline_spark.session import get_spark
    from biomass_processing_pipeline_spark.workflow import (
        county_summary, run_county_workflow,
    )

    spark = get_spark(app_name="bpp_pipeline", master=args.master)
    stats = run_county_workflow(
        spark, args.tier, args.out, prefix_level=args.prefix_level
    )
    print(json.dumps(stats))
    county_summary(spark, args.out).orderBy("fips").show(50, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
