"""Stage-level breakdown of the minhash_lsh_pairs family (guide §1):
shingles / signatures / band-candidates / verify / CC rounds, each
noop-sinked.

Usage: SPARK_GRAFT_SF_DIR=/root/profdata/sf1.0 python scripts/profile_lsh.py
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
    from pyspark.sql import functions as F

    from ai_log_analyzer_spark.conf import build_session
    from ai_log_analyzer_spark.functions import dedup as D
    spark = build_session(app="profile_lsh")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism))

    for rep in range(2):
        spark.sparkContext.setJobDescription("lsh: shingles")
        sh = D.shingles(docs, n=3)
        t_sh = noop(sh)
        spark.sparkContext.setJobDescription("lsh: signatures")
        sig = D.minhash_signatures(docs, n_hashes=8, n=3)
        t_sig = noop(sig)
        spark.sparkContext.setJobDescription("lsh: full pairs")
        pairs = D.minhash_lsh_pairs(docs, n_hashes=8, bands=4, n=3,
                                    threshold=0.5)
        t_pairs = noop(pairs)
        print(f"rep{rep}: shingles={t_sh}s signatures={t_sig}s "
              f"pairs={t_pairs}s", flush=True)

    spark.sparkContext.setJobDescription("lsh: n_candidates")
    t0 = time.time()
    n_cand = (pairs.count())
    print(f"pairs rows={n_cand} ({round(time.time() - t0, 2)}s)", flush=True)

    spark.sparkContext.setJobDescription("lsh: clusters")
    t0 = time.time()
    ct = D.dedup_cluster_table(pairs, docs=docs)
    t_ct = noop(ct)
    print(f"cluster_table={t_ct}s (incl pairs recompute)", flush=True)

    spark.sparkContext.setJobDescription("lsh: cluster_canonical")
    ct2 = D.dedup_cluster_table(
        D.minhash_lsh_pairs(docs, n_hashes=8, bands=4, n=3, threshold=0.5),
        docs=docs)
    cc = D.cluster_canonical(ct2, docs)
    t_cc = noop(cc)
    print(f"cluster_canonical={t_cc}s", flush=True)


if __name__ == "__main__":
    main()
