#!/usr/bin/env python3
"""Synthesize a ~10x scale-up of sf0.1 for the 8-vs-32-core scaling
spot-check (r12 verdict Next-round #9). Fact tables are replicated
REPLICAS times with shifted keys (FK pairs shifted together so join
semantics survive); text gets a per-replica suffix token so dedup
shingles aren't 10 exact copies; dimension tables are copied as-is.
Timing-only data — never used for oracle checks or the driver bench.

Usage: python tools_make_bigsf.py [out_dir] (default /tmp/sfbig)
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from starrocks_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
REPLICAS = 10

KEY_SHIFTS = {
    # table -> columns shifted by i * 10_000_000_000 per replica
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TEXT_SUFFIX = {"documents": "text"}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    spark = get_spark(app_name="make-bigsf")
    os.makedirs(OUT, exist_ok=True)
    for t in DIMS:
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SRC, f"{t}.parquet"), dst)
    shift = 10_000_000_000
    for t, keys in KEY_SHIFTS.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(REPLICAS):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * shift))
            tc = TEXT_SUFFIX.get(t)
            if tc and i > 0:
                df = df.withColumn(tc, F.concat(F.col(tc), F.lit(f" r{i}")))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
        print(f"{t}: written")
    print("done:", OUT)


if __name__ == "__main__":
    main()
