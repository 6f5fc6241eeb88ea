"""Stage-level breakdown of the flagship_scored DAG (guide §1):
fit / parse / window+score / route, each timed with a noop sink.

Usage: SPARK_GRAFT_SF_DIR=/root/profdata/sf1.0 python scripts/profile_flagship.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_log_analyzer_spark.conf import build_session
    spark = build_session(app="profile_flagship")

    from ai_log_analyzer_spark.operators import fit as fit_op
    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import route as route_op
    from ai_log_analyzer_spark.operators import windows as win_op
    from ai_log_analyzer_spark.queries import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    spark.sparkContext.setJobDescription("flagship: fit")
    t0 = time.time()
    cat = fit_op.fit_catalog(pages)
    t_fit = round(time.time() - t0, 2)
    print(f"fit_catalog: {t_fit}s, {len(cat)} templates", flush=True)

    for rep in range(3):
        spark.sparkContext.setJobDescription("flagship: parse only")
        parsed = parse_op.parse_template_ids(pages, cat)
        t_parse = noop(parsed)

        spark.sparkContext.setJobDescription("flagship: parse+winscore")
        scored = win_op.window_score_grouped(parse_op.matched(parsed),
                                             len(cat), carry=(),
                                             host_lookup=pages)
        t_score = noop(scored)

        spark.sparkContext.setJobDescription("flagship: full")
        routed = route_op.with_severity(scored)
        from pyspark.sql import functions as F
        full = routed.select("host", "seq_no", "template_id", "label_id",
                             F.round("anomaly_score", 4).alias("anomaly_score"),
                             "severity")
        t_full = noop(full)
        print(f"rep{rep}: parse={t_parse}s  parse+winscore={t_score}s  "
              f"full={t_full}s", flush=True)


if __name__ == "__main__":
    main()
