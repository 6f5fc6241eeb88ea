"""Sequence windows + frozen-scorer stage (SURVEY.md O29/O32/O33, D6-D8).

The reference's DataLoader windowing (/root/reference/ailoganalyzer/
dataset/dataset.py:73-123) re-expressed relationally:

  matched events ──shuffle by host──► Window.partitionBy(host).orderBy(seq_no)
      collect_list over rowsBetween(-(w-1), 0)   = the sliding window
      lead(template_id, 2)                        = the label (the
        reference's off-by-one lookahead, dataset.py:77 — replicated)
  ──► filter complete windows ──► scorer pandas UDF (Arrow-batched numpy)

This is shuffle #1 of the flagship DAG: one hash exchange on ``host``
keeps every series whole on one partition — no cross-partition window
stitching.  The count-vector + autoencoder + top-k all happen inside
one vectorized UDF batch (count vectors are built densely ONLY inside
the batch, never shuffled — spill safety per SURVEY.md §4.4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import schemas, scorer


def window_samples(matched_events: DataFrame,
                   w: int = scorer.WINDOW_SIZE) -> DataFrame:
    win = (Window.partitionBy("host").orderBy("seq_no")
           .rowsBetween(-(w - 1), 0))
    lead_w = Window.partitionBy("host").orderBy("seq_no")
    return (
        matched_events
        .select("host", "seq_no", "url", "warc_ts", "template_id")
        .withColumn("window_ids", F.collect_list("template_id").over(win))
        .withColumn("label_id", F.lead("template_id", scorer.LABEL_LEAD).over(lead_w))
        .filter((F.size("window_ids") == w) & F.col("label_id").isNotNull())
    )


def score_windows(samples: DataFrame, num_classes: int,
                  repartition: bool = False) -> DataFrame:
    """Adds anomaly_score / is_anomaly via the frozen numpy scorer.

    The scorer is compute-bound per row, so its partitions must be
    sized for CPU, not bytes.  Normal path: the preceding host shuffle
    plus a small AQE advisory size (conf.py, 16m) keeps parallelism ≥
    core count.  ``repartition=True`` adds an explicit round-robin
    shuffle first — use only when the series-key cardinality is below
    the core count (degenerate corpora)."""

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.drop(columns=["window_ids"]).assign(
                    anomaly_score=pd.Series(dtype="float64"),
                    is_anomaly=pd.Series(dtype="bool"))
                continue
            win = np.stack(pdf["window_ids"].to_numpy()).astype(np.int64)
            labels = pdf["label_id"].to_numpy(dtype=np.int64)
            err, anom = scorer.score(win, labels, num_classes)
            # window contents are consumed here; the routed output never
            # carries the 10-wide arrays (shuffle/sink bytes ∝ rows only)
            out = pdf.drop(columns=["window_ids"])
            out["anomaly_score"] = err
            out["is_anomaly"] = anom
            yield out

    if repartition:
        n = samples.sparkSession.sparkContext.defaultParallelism
        samples = samples.repartition(n)
    return samples.mapInPandas(_score, schema=schemas.SCORED)
