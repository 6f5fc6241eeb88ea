"""Build a profiling-scale replica of an sf dir (default 10x sf0.1 ->
~sf1.0 shape) OUTSIDE /root/testdata, for guide-§1 measurement only.

Replicates each table K times with shifted integer keys (and shifted
timestamps for events) so distributions keep their shape while ids
stay unique.  NOT used by bench.py or any query path — purely an input
generator so local profiling sees driver-scale row counts.

Usage: python scripts/gen_profile_scale.py [src_dir] [dst_dir] [K] [--diversify]

--diversify additionally appends a per-replica alphabetic token to each
document's text so the Drain catalog grows ~K-fold with the corpus
(matching how real-corpus template diversity scales), instead of K
exact copies of every template.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEYED = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    # region/nation: tiny dimension tables, copied once (not replicated)
}


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--diversify"]
    diversify = "--diversify" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/root/profdata/sf1.0"
    k = int(args[2]) if len(args) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        tb = pq.read_table(os.path.join(src, fn))
        if name not in KEYED:
            shutil.copyfile(os.path.join(src, fn), os.path.join(dst, fn))
            print(f"{name}: copied ({tb.num_rows} rows)")
            continue
        keys = KEYED[name]
        spans = {c: (pc.max(tb[c]).as_py() or 0) + 1 for c in keys}
        chunks = []
        for rep in range(k):
            t = tb
            if rep:
                for c in keys:
                    shifted = pc.add(t[c], rep * spans[c])
                    t = t.set_column(t.schema.get_field_index(c),
                                     t.field(c), shifted.cast(t.schema.field(c).type))
                if diversify and name == "documents":
                    i = t.schema.get_field_index("text")
                    # rep+1 copies of a distinct token: different token
                    # COUNTS keep Drain's length-grouped tree from
                    # merging replicas into one wildcarded template
                    tok = " ".join([f"replica{chr(97 + rep)}varies"]
                                   * (rep + 1))
                    suffixed = pc.binary_join_element_wise(
                        t["text"].cast(pa.string()),
                        pa.array([tok] * t.num_rows), " ")
                    t = t.set_column(i, t.field(i), suffixed)
                if name == "events":
                    # keep the time axis growing so watermarks/session
                    # logic sees a longer stream, not K identical days
                    i = t.schema.get_field_index("ts")
                    shifted_ts = pc.add(t["ts"].cast(pa.int64()),
                                        rep * 86_400_000_000)
                    t = t.set_column(i, t.field(i),
                                     shifted_ts.cast(t.schema.field(i).type))
            chunks.append(t)
        out = pa.concat_tables(chunks)
        pq.write_table(out, os.path.join(dst, fn))
        print(f"{name}: {tb.num_rows} -> {out.num_rows} rows")
    with open(os.path.join(dst, "_DONE"), "w") as f:
        f.write("profiling replica; not driver data\n")


if __name__ == "__main__":
    main()
