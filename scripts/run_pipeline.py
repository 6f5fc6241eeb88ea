#!/usr/bin/env python
"""spark-submit entry point for the flagship DAG (north rule: "ships via
spark-submit --py-files to a multi-executor cluster").

Usage (cluster):
    python -m ai_log_analyzer_spark... or:
    spark-submit --py-files $(python -c 'from ai_log_analyzer_spark.packaging \
        import package_zip; print(package_zip())') \
        scripts/run_pipeline.py --pages /path/pages --workdir /path/work

Usage (local sandbox):
    python scripts/run_pipeline.py --pages /tmp/pages --workdir /tmp/work \
        --generate 100000 --cores 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--workdir", required=True, help="checkpoint/output dir")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a synthetic pages table of N rows first")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--fit-sample", type=float, default=None,
                    help="fit the catalog on a sample fraction (big inputs)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    if active is not None:           # launched via spark-submit
        spark = active
    else:
        from ai_log_analyzer_spark.conf import build_session
        spark = build_session(app="log-pipeline", cores=args.cores)

    if args.generate:
        from ai_log_analyzer_spark.sources import pages as P
        P.generate_and_write(spark, args.pages, args.generate)

    from ai_log_analyzer_spark.plans.pipeline import PipelineRunner
    result = PipelineRunner(spark, args.pages, args.workdir,
                            fit_sample=args.fit_sample).run()
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
