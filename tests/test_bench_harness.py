"""The bench harness itself must be crash-proof (round-4 verdict item 2:
one raising query erased the whole round-4 sweep).  A deliberately
broken query must land in ``errors`` while every other query is still
timed and the result stays JSON-serializable."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_sweep_isolates_a_crashing_query(spark):
    def good(s, sf_dir):
        return s.range(5).toDF("n")

    def bad(s, sf_dir):
        raise RuntimeError("injected failure")

    def bad_lazy(s, sf_dir):
        # fails only at execution time (the round-4 failure mode: the
        # star CC raised inside an action, not at plan-build time)
        from pyspark.sql import functions as F
        return s.range(3).select(
            F.raise_error(F.lit("deferred boom")).alias("x"))

    qs = {"good_a": good, "broken": bad, "broken_lazy": bad_lazy,
          "good_b": good}
    q_times, q_walls, q_errs = bench.sweep_queries(spark, qs, "", q_runs=1)

    assert set(q_times) == {"good_a", "good_b"}
    assert set(q_walls) == {"good_a", "good_b"}
    assert set(q_errs) == {"broken", "broken_lazy"}
    assert "injected failure" in q_errs["broken"]
    # the driver parses one JSON line — the payload must always dump
    json.loads(json.dumps(
        {"queries": q_times, "walls": q_walls, "errors": q_errs}))
