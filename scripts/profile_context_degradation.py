"""Reproduce + localize the in-sweep slowdown (guide §1/§7): run an
alphabetical prefix of registry queries in one session, then break the
flagship DAG into stages and compare with a fresh-session run.  Prints
JVM GC totals and block-manager/broadcast counts between phases.

Usage:
  SPARK_GRAFT_SF_DIR=/root/profdata/sf1.0 \
      python scripts/profile_context_degradation.py [n_prefix]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    sc = spark.sparkContext
    try:
        n_rdds = sc._jsc.sc().getPersistentRDDs().size()
    except Exception:
        n_rdds = -1
    return {"gc_s": round(gc_ms / 1000, 1),
            "heap_gb": round(heap.getUsed() / 2**30, 1),
            "persistent_rdds": n_rdds}


def noop(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def flagship_stages(spark, sf_dir, tag):
    from ai_log_analyzer_spark.operators import fit as fit_op
    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import route as route_op
    from ai_log_analyzer_spark.operators import windows as win_op
    from ai_log_analyzer_spark.queries import pages_from_documents
    from pyspark.sql import functions as F

    pages = pages_from_documents(spark, sf_dir)
    t0 = time.time()
    cat = fit_op.fit_catalog(pages)
    t_fit = round(time.time() - t0, 2)
    for rep in range(2):
        parsed = parse_op.parse_template_ids(pages, cat)
        t_parse = noop(parsed)
        scored = win_op.window_score_grouped(parse_op.matched(parsed),
                                             len(cat), carry=(),
                                             host_lookup=pages)
        t_score = noop(scored)
        routed = route_op.with_severity(scored)
        full = routed.select("host", "seq_no", "template_id", "label_id",
                             F.round("anomaly_score", 4).alias("anomaly_score"),
                             "severity")
        t_full = noop(full)
        print(f"[{tag}] rep{rep}: fit={t_fit} parse={t_parse} "
              f"winscore={t_score} full={t_full} {jvm_stats(spark)}",
              flush=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/profdata/sf1.0")
    n_prefix = int(sys.argv[1]) if len(sys.argv) > 1 else 999
    from ai_log_analyzer_spark.conf import build_session
    spark = build_session(app="profile_degradation")

    import __spark_entry__ as E
    qs = E.queries()
    names = [n for n in sorted(qs) if n < "flagship_scored"][:n_prefix]

    flagship_stages(spark, sf_dir, "fresh")

    t_all0 = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"prefix {name} FAILED: {exc}"[-200:], flush=True)
        if i % 10 == 9:
            print(f"prefix {i+1}/{len(names)} ({name}: "
                  f"{round(time.time()-t0,2)}s) {jvm_stats(spark)}",
                  flush=True)
    print(f"prefix done in {round(time.time()-t_all0,1)}s", flush=True)

    flagship_stages(spark, sf_dir, "after-prefix")


if __name__ == "__main__":
    main()
