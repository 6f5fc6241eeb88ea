"""Per-query isolation bench (guide §1.4): noop-sink timing for an
arbitrary subset of the registry, separate from the FROZEN bench.py.

Usage:
  python bench_extra.py [query ...]            # default: all
Env:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores (default 32)
  BENCH_EXTRA_RUNS     runs per query (default 2, min-of-N reported)
  BENCH_EXTRA_OUT      write the full JSON here (default stdout only)
  BENCH_EXTRA_EXPLAIN  if set, write <dir>/<query>.txt explain("formatted")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_EXTRA_RUNS", "2"))
    out_path = os.environ.get("BENCH_EXTRA_OUT")
    explain_dir = os.environ.get("BENCH_EXTRA_EXPLAIN")

    from ai_log_analyzer_spark.conf import build_session
    spark = build_session(app="bench_extra", cores=cores)

    import __spark_entry__ as E
    qs = E.queries()
    names = sys.argv[1:] or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    times, walls, errs = {}, {}, {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ws = []
        try:
            if explain_dir:
                os.makedirs(explain_dir, exist_ok=True)
                plan = qs[name](spark, sf_dir)._jdf.queryExecution() \
                    .explainString(spark._jvm.org.apache.spark.sql.execution
                                   .ExplainMode.fromString("formatted"))
                with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                ws.append(round(time.time() - t0, 3))
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errs[name] = f"{type(exc).__name__}: {exc}"[-400:]
            print(f"bench_extra: {name} FAILED: {errs[name]}",
                  file=sys.stderr)
        if ws:
            times[name] = min(ws)
            walls[name] = ws
            print(f"bench_extra: {name}: {ws}", file=sys.stderr)
    payload = {"sf_dir": sf_dir, "cores": cores, "queries": times,
               "walls": walls, "errors": errs}
    line = json.dumps(payload)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
