#!/usr/bin/env python3
"""Synthesize an sf1-equivalent dataset for bench scale-validation.

The driver ships sf{0.001,0.01,0.1} only; the sf1 validation pass
(BENCH_SF1) replicates sf0.1 ten times with per-replica key offsets so
all intra-replica join relationships survive, while dimension tables
(region, nation) keep their real-world cardinality. Text/embedding
payloads replicate verbatim — a 10x corpus genuinely has 10x the
duplicate mass, which is the load dedup operators must survive.

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf1 [replicas]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# columns that carry entity keys and must be offset per replica so the
# replicas are disjoint key spaces (joins resolve within a replica only)
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# dimension tables copied once, unmodified
SINGLETON = ["region", "nation"]
OFFSET = 100_000_000  # > any sf0.1 key; 10 replicas stay under 2^31


def replicate(src: str, dst: str, name: str, replicas: int) -> None:
    t = pq.read_table(f"{src}/{name}.parquet")
    parts = []
    for r in range(replicas):
        if r == 0:
            parts.append(t)
            continue
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in KEY_COLS[name]:
                col = pc.add(col, pa.scalar(r * OFFSET, type=field.type))
            cols.append(col)
        parts.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/{name}.parquet", version="2.6")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for name in SINGLETON:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} (singleton)")
    for name in KEY_COLS:
        replicate(src, dst, name, replicas)


if __name__ == "__main__":
    main()
