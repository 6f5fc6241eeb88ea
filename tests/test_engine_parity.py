"""Engine ↔ oracle parity (SURVEY.md §5.1-5.2): the correctness core.

Asserts, on the same deterministic pages corpus:
- identical frozen catalog (distributed fit + canonical merge vs oracle)
- identical per-url template assignment and BYTE-IDENTICAL extracted
  text (BASELINE.json per-row invariant)
- identical per-severity routed counts AND routed row sets (left-anti
  empty both directions — north rule acceptance)
- checkpoint resume: second run executes zero stages
- property 3c: catalog invariant to input partition count
"""

import json
import os

import pandas as pd
import pytest

from ai_log_analyzer_spark import grammar
from ai_log_analyzer_spark.operators import fit as fit_op
from ai_log_analyzer_spark.plans.pipeline import PipelineRunner
from ai_log_analyzer_spark.sources import pages as pages_src


@pytest.fixture(scope="module")
def workspace(spark, pages_df, tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    pages_path = str(base / "pages")
    pages_src.write_pages(pages_src.pages_to_spark(spark, pages_df), pages_path,
                          n_buckets=8)
    runner = PipelineRunner(spark, pages_path, str(base / "work"))
    result = runner.run()
    return {"base": base, "pages_path": pages_path, "result": result,
            "runner": runner}


def test_catalog_parity(spark, workspace, oracle_result):
    got = fit_op.read_catalog(spark, workspace["result"]["catalog_path"])
    exp = oracle_result.catalog
    assert list(got["template"]) == list(exp["template"])
    assert list(got["template_id"]) == list(exp["template_id"])
    assert list(got["freq"]) == list(exp["freq"])
    assert list(got["regex"]) == list(exp["regex"])


def test_parse_byte_identity(spark, workspace, oracle_result):
    got = (spark.read.parquet(workspace["result"]["parsed_path"])
           .select("url", "template_id", "extracted_text")
           .toPandas().sort_values("url").reset_index(drop=True))
    exp = (oracle_result.parsed[["url", "template_id", "extracted_text"]]
           .sort_values("url").reset_index(drop=True))
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["template_id"].tolist() == exp["template_id"].astype("int64").tolist()
    # THE byte-identity invariant
    assert got["extracted_text"].tolist() == exp["extracted_text"].tolist()


def test_id_only_parse_matches_full_parse(spark, workspace):
    """parse_template_ids (projection pushdown into the parse UDF — the
    scoring branch's fast path) must assign the IDENTICAL template_id
    per url as the full extracting parse."""
    from ai_log_analyzer_spark.operators import parse as parse_op
    pages = spark.read.parquet(workspace["pages_path"])
    cat = fit_op.read_catalog(spark, workspace["result"]["catalog_path"])
    full = (parse_op.parse_pages(pages, cat).select("url", "template_id")
            .toPandas().sort_values("url").reset_index(drop=True))
    ids = (parse_op.parse_template_ids(pages, cat).select("url", "template_id")
           .toPandas().sort_values("url").reset_index(drop=True))
    assert ids["url"].tolist() == full["url"].tolist()
    assert ids["template_id"].fillna(-1).tolist() == \
        full["template_id"].fillna(-1).tolist()


def test_pruned_carry_equals_full_sink_counts(spark, workspace):
    """The bench/entry fast path (id-only parse + carry=() windows, url
    never crossing Arrow) must produce per-sink counts identical to the
    full-column DAG — n_urls via the 1:1 (host, seq_no) key."""
    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import route as route_op
    from ai_log_analyzer_spark.operators import windows as win_op
    pages = spark.read.parquet(workspace["pages_path"])
    cat = fit_op.read_catalog(spark, workspace["result"]["catalog_path"])
    nc = len(cat)
    full = route_op.sink_counts(route_op.with_severity(
        win_op.window_score_grouped(
            parse_op.matched(parse_op.parse_pages(pages, cat)), nc))).collect()
    pruned = route_op.sink_counts(route_op.with_severity(
        win_op.window_score_grouped(
            parse_op.matched(parse_op.parse_template_ids(pages, cat)), nc,
            carry=()))).collect()
    assert [r.asDict() for r in full] == [r.asDict() for r in pruned]


def test_routed_counts_and_row_sets(spark, workspace, oracle_result):
    res = workspace["result"]
    got_counts = pd.DataFrame(res["sink_counts"]).sort_values("severity") \
        .reset_index(drop=True)
    exp_counts = oracle_result.routed_counts.rename(
        columns={}).sort_values("severity").reset_index(drop=True)
    assert got_counts[["severity", "n_rows", "n_urls"]].to_dict("records") == \
        exp_counts[["severity", "n_rows", "n_urls"]].to_dict("records")

    got_rows = (spark.read.parquet(res["routed_path"])
                .select("url", "severity").toPandas())
    exp_rows = oracle_result.scored[["url", "severity"]]
    g = set(map(tuple, got_rows.itertuples(index=False)))
    e = set(map(tuple, exp_rows.itertuples(index=False)))
    assert g == e  # routed-row equality, both directions


def test_scores_match_oracle(spark, workspace, oracle_result):
    got = (spark.read.parquet(workspace["result"]["scored_path"])
           .select("url", "anomaly_score", "is_anomaly")
           .toPandas().sort_values("url").reset_index(drop=True))
    exp = (oracle_result.scored[["url", "anomaly_score", "is_anomaly"]]
           .sort_values("url").reset_index(drop=True))
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["is_anomaly"].tolist() == exp["is_anomaly"].tolist()
    pd.testing.assert_series_equal(got["anomaly_score"], exp["anomaly_score"],
                                   check_exact=False, rtol=1e-12)


def test_resume_skips_done_stages(spark, workspace):
    r2 = PipelineRunner(spark, workspace["pages_path"],
                        str(workspace["base"] / "work"))
    out = r2.run()
    assert out["executed"] == []
    assert out["sink_counts"] == workspace["result"]["sink_counts"]


def test_lineage_written(spark, workspace):
    lin = spark.read.parquet(str(workspace["base"] / "work" / "lineage"))
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"fit", "parse", "enrich", "score", "route"} <= stages
    assert lin.filter("rows < 0").count() == 0


def test_fit_partition_invariance(spark, pages_df, oracle_result):
    """Property 3c: catalog identical for 1-partition vs 8-partition fit."""
    df1 = pages_src.pages_to_spark(spark, pages_df).coalesce(1)
    df8 = pages_src.pages_to_spark(spark, pages_df).repartition(8, "url")
    cat1 = fit_op.fit_catalog(df1)
    cat8 = fit_op.fit_catalog(df8)
    assert list(cat1["template"]) == list(cat8["template"])
    assert list(cat1["freq"]) == list(cat8["freq"])
    assert list(cat1["template"]) == list(oracle_result.catalog["template"])


def test_fused_window_score_equals_two_step(spark, workspace, oracle_result):
    """window_score_grouped (fused applyInPandas) must produce the exact
    row set of the round-1 two-step window_samples -> score_windows."""
    import pandas as pd

    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import windows as win_op

    parsed = spark.read.parquet(workspace["result"]["parsed_path"])
    ncls = workspace["result"]["num_classes"]
    two = win_op.score_windows(
        win_op.window_samples(parse_op.matched(parsed)), ncls).toPandas()
    fused = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls).toPandas()
    assert len(two) == len(fused)
    cols = ["host", "seq_no", "url", "warc_ts", "template_id", "label_id",
            "is_anomaly"]
    t = two.sort_values(["host", "seq_no"]).reset_index(drop=True)
    f = fused.sort_values(["host", "seq_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(t[cols], f[cols], check_exact=True)
    # scores: the two-step path batches score() across hosts (GEMM
    # blocking depends on batch shape), the fused path scores per host
    # exactly like the oracle — equal to float32 resolution, not bitwise
    import numpy as np
    np.testing.assert_allclose(t["anomaly_score"], f["anomaly_score"],
                               rtol=2e-6, atol=0)


def test_compact_shuffle_equals_string_path(spark, workspace):
    """r2 verdict item 1: the compact-shuffle path (int host key through
    the exchange + broadcast restore) must be BIT-IDENTICAL to the
    string-key path — same per-host slices feed the same kernel, so even
    the float64 scores match exactly."""
    import pandas as pd

    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import windows as win_op

    parsed = spark.read.parquet(workspace["result"]["parsed_path"])
    ncls = workspace["result"]["num_classes"]
    base = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls).toPandas()
    compact = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls, host_lookup=parsed).toPandas()
    assert list(base.columns) == list(compact.columns)
    b = base.sort_values(["host", "seq_no"]).reset_index(drop=True)
    c = compact.sort_values(["host", "seq_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, c, check_exact=True)
    # and with carry=() — the flagship shape
    base0 = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls, carry=()).toPandas()
    comp0 = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls, carry=(),
        host_lookup=parsed).toPandas()
    b0 = base0.sort_values(["host", "seq_no"]).reset_index(drop=True)
    c0 = comp0.sort_values(["host", "seq_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b0, c0, check_exact=True)


def test_compact_shuffle_host_restore_shuffle_join_fallback(spark, workspace):
    """r3 verdict item 3: above HOST_BROADCAST_LIMIT distinct hosts the
    restore dictionary must switch from broadcast to a shuffle hash join
    — drive that branch via n_hosts_hint and require output equality
    with the broadcast path."""
    import pandas as pd

    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import windows as win_op

    parsed = spark.read.parquet(workspace["result"]["parsed_path"])
    ncls = workspace["result"]["num_classes"]
    bcast = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls, host_lookup=parsed)
    shuf = win_op.window_score_grouped(
        parse_op.matched(parsed), ncls, host_lookup=parsed,
        n_hosts_hint=win_op.HOST_BROADCAST_LIMIT + 1)
    # the fallback plan must NOT broadcast the host dictionary
    assert "BroadcastHashJoin" in bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in shuf._jdf.queryExecution().executedPlan().toString()
    b = bcast.toPandas().sort_values(["host", "seq_no"]).reset_index(drop=True)
    s = shuf.toPandas().sort_values(["host", "seq_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s, check_exact=True)


def test_compact_shuffle_missing_host_raises(spark, workspace):
    """r3 advice item 2: a host present in matched_events but absent
    from host_lookup must raise at execution time, not silently drop
    that host's scored rows."""
    import pytest
    from pyspark.sql import functions as F

    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import windows as win_op

    parsed = spark.read.parquet(workspace["result"]["parsed_path"])
    ncls = workspace["result"]["num_classes"]
    one_host = parsed.select("host").distinct().limit(1).collect()[0]["host"]
    incomplete = parsed.filter(F.col("host") != one_host)
    with pytest.raises(Exception, match="missing from host_lookup"):
        win_op.window_score_grouped(
            parse_op.matched(parsed), ncls,
            host_lookup=incomplete).toPandas()
