"""Stateful streaming scorer (applyInPandasWithState) ↔ batch parity.

The incremental per-host scorer must produce the same samples as the
batch fused windows+score stage on the same corpus — including windows
that SPAN micro-batch boundaries (state carries the tail).  Decisions
(is_anomaly, label, template) must match exactly; anomaly_score to
float32-GEMM tolerance (BLAS accumulation order varies with the batch
shape the rows arrive in)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark.operators import fit as fit_op
from ai_log_analyzer_spark.operators import parse as parse_op
from ai_log_analyzer_spark.operators import windows as win_op
from ai_log_analyzer_spark.sources import pages as pages_src
from ai_log_analyzer_spark.streaming import stream_pipeline as SP


@pytest.fixture(scope="module")
def split_corpus(spark, pages_df, tmp_path_factory):
    """Pages corpus written as 4 seq-ordered parquet files so that
    maxFilesPerTrigger=1 yields 4 micro-batches and every host's series
    crosses batch boundaries."""
    import time
    base = tmp_path_factory.mktemp("stream_split")
    sdf = pages_src.pages_to_spark(spark, pages_df)
    n = len(pages_df)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    # generation order: per-host seq_no ascends with global row order, so
    # row-range chunks keep every host's series in order across files
    pdf = pages_df
    for i in range(4):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        pages_src.pages_to_spark(spark, part.reset_index(drop=True)) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(str(base / f"chunk{i}"))
        time.sleep(1.1)   # file-source ordering is mtime-based
    cat = fit_op.fit_catalog(sdf)
    return str(base), cat


def _batch_expected(spark, path, cat):
    pages = spark.read.option("recursiveFileLookup", "true").parquet(path)
    parsed = parse_op.parse_template_ids(pages, cat)
    return (win_op.window_score_grouped(parse_op.matched(parsed), len(cat),
                                        carry=())
            .toPandas().sort_values(["host", "seq_no"])
            .reset_index(drop=True))


def test_stateful_stream_scores_match_batch(spark, split_corpus):
    path, cat = split_corpus
    got = (SP.run_stateful_scores_available_now(
               spark, path, cat, len(cat), max_files_per_trigger=1)
           .toPandas().sort_values(["host", "seq_no"]).reset_index(drop=True))
    exp = _batch_expected(spark, path, cat)
    assert len(got) == len(exp) and len(got) > 0
    for c in ("host", "seq_no", "template_id", "label_id", "is_anomaly"):
        assert got[c].tolist() == exp[c].tolist(), f"column {c} diverges"
    np.testing.assert_allclose(got["anomaly_score"], exp["anomaly_score"],
                               rtol=1e-5, atol=1e-7)


def test_stateful_stream_multiple_batches_ran(spark, split_corpus):
    """Sanity: the parity above must actually exercise cross-batch
    state — with 4 files and maxFilesPerTrigger=1 the expected sample
    count per host (n_host − w − 1) only comes out right if tails carry
    across micro-batches (otherwise each batch drops w+lead−1 samples)."""
    path, cat = split_corpus
    pages = spark.read.option("recursiveFileLookup", "true").parquet(path)
    per_host = (pages.groupBy("host").count().toPandas()
                .set_index("host")["count"])
    import ai_log_analyzer_spark.scorer as SC
    expected_total = sum(max(0, int(c) - SC.WINDOW_SIZE - SC.LABEL_LEAD + 1)
                         for c in per_host)
    got = SP.run_stateful_scores_available_now(
        spark, path, cat, len(cat), max_files_per_trigger=1)
    assert got.count() == expected_total


def test_stateful_parquet_sink_checkpoint_restart(spark, split_corpus,
                                                  tmp_path):
    """r3 verdict item 4: the parquet-sink wrapper must survive a
    mid-corpus restart — drain half the files, stop, land the rest,
    re-run with the SAME checkpoint, and the sink must hold exactly the
    batch stage's scored row set (per-host state recovered, no window
    dropped or double-scored at the restart boundary)."""
    import shutil

    path, cat = split_corpus
    src = tmp_path / "incoming"
    out = str(tmp_path / "scored_out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for i in range(2):
        shutil.copytree(f"{path}/chunk{i}", src / f"chunk{i}")
    SP.run_stateful_scores_to_parquet(spark, str(src), cat, len(cat),
                                      out, ckpt, max_files_per_trigger=1)
    mid_rows = spark.read.parquet(out).count()
    for i in (2, 3):
        shutil.copytree(f"{path}/chunk{i}", src / f"chunk{i}")
    SP.run_stateful_scores_to_parquet(spark, str(src), cat, len(cat),
                                      out, ckpt, max_files_per_trigger=1)
    got = (spark.read.parquet(out).toPandas()
           .sort_values(["host", "seq_no"]).reset_index(drop=True))
    exp = _batch_expected(spark, path, cat)
    assert mid_rows < len(got) == len(exp)   # restart actually appended
    for c in ("host", "seq_no", "template_id", "label_id", "is_anomaly"):
        assert got[c].tolist() == exp[c].tolist(), f"column {c} diverges"
    np.testing.assert_allclose(got["anomaly_score"], exp["anomaly_score"],
                               rtol=1e-5, atol=1e-7)
