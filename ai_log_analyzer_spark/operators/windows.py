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

from typing import Iterator, Tuple

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

    Scalar struct-returning pandas_udf: ONLY (window_ids, label_id)
    cross the JVM↔Python Arrow boundary — keys/urls/timestamps stay in
    the JVM, and the 10-wide window arrays are consumed here, never
    shuffled or written downstream.

    The scorer is compute-bound per row, so its partitions must be
    sized for CPU, not bytes (AQE byte-coalescing is off in conf.py).
    ``repartition=True`` adds an explicit round-robin shuffle first —
    use only when series-key cardinality is below the core count."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    result = T.StructType([
        T.StructField("anomaly_score", T.DoubleType(), False),
        T.StructField("is_anomaly", T.BooleanType(), False),
    ])

    @pandas_udf(result)
    def _score(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
        for window_ids, label_id in batches:
            if len(label_id) == 0:
                yield pd.DataFrame({"anomaly_score": pd.Series(dtype="float64"),
                                    "is_anomaly": pd.Series(dtype="bool")})
                continue
            win = np.stack(window_ids.to_numpy()).astype(np.int64)
            labels = label_id.to_numpy(dtype=np.int64)
            err, anom = scorer.score(win, labels, num_classes)
            yield pd.DataFrame({"anomaly_score": err, "is_anomaly": anom})

    if repartition:
        n = samples.sparkSession.sparkContext.defaultParallelism
        samples = samples.repartition(n)
    return (samples
            .withColumn("_s", _score(F.col("window_ids"), F.col("label_id")))
            .select("host", "seq_no", "url", "warc_ts", "template_id",
                    "label_id",
                    F.col("_s.anomaly_score").alias("anomaly_score"),
                    F.col("_s.is_anomaly").alias("is_anomaly")))
