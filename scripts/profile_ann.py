"""Component breakdown of the PQ / IVF-PQ / SQ8 queries (guide §1).

Usage: SPARK_GRAFT_SF_DIR=/root/profdata/sf1.0 python scripts/profile_ann.py
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/profdata/sf1.0")
    from ai_log_analyzer_spark.conf import build_session
    spark = build_session(app="profile_ann")
    from pyspark.sql import functions as F

    from ai_log_analyzer_spark.functions import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(spark.sparkContext.defaultParallelism)
    emb.count()
    print("n_emb:", emb.count(), flush=True)

    t0 = time.time()
    cents, books = S.ivfpq_fit(emb, sample_n=256)
    print(f"ivfpq_fit: {round(time.time()-t0,2)}s", flush=True)

    for rep in range(2):
        t0 = time.time()
        codes = S.ivfpq_codes(emb, cents, books)
        t_build = round(time.time() - t0, 2)   # plan construction only
        t_codes = noop(codes)
        print(f"rep{rep}: ivfpq_codes plan={t_build}s exec={t_codes}s",
              flush=True)

        t0 = time.time()
        out = S.ivfpq_topk(emb, query_ids=[0, 1, 2, 3, 4],
                           cents=cents, books=books, nprobe=2, k=5)
        t_plan = round(time.time() - t0, 2)    # includes localCheckpoint!
        t_exec = noop(out)
        print(f"rep{rep}: ivfpq_topk ckpt+plan={t_plan}s exec={t_exec}s",
              flush=True)

    t0 = time.time()
    pbooks = S.pq_codebooks(emb, sample_n=256)
    print(f"pq_codebooks: {round(time.time()-t0,2)}s", flush=True)
    for rep in range(2):
        enc = S.pq_encode(emb, pbooks)
        print(f"rep{rep}: pq_encode exec={noop(enc)}s", flush=True)
        t0 = time.time()
        topk = S.pq_adc_topk(emb, [0, 1, 2, 3, 4], pbooks, k=5)
        t_plan = round(time.time() - t0, 2)
        print(f"rep{rep}: pq_adc ckpt+plan={t_plan}s exec={noop(topk)}s",
              flush=True)

    t0 = time.time()
    params = S.sq8_params(emb, sample_n=256)
    print(f"sq8_params: {round(time.time()-t0,2)}s", flush=True)
    for rep in range(2):
        enc = S.sq8_encode(emb, params)
        print(f"rep{rep}: sq8_encode exec={noop(enc)}s", flush=True)
        topk = S.sq8_topk(emb, [0, 1, 2, 3, 4], params, k=5)
        print(f"rep{rep}: sq8_topk exec={noop(topk)}s", flush=True)


if __name__ == "__main__":
    main()
