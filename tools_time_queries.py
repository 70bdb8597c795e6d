#!/usr/bin/env python3
"""Time a list of declared queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] — same methodology as bench.py (warm-up
first query, collect() per query, perf_counter) for ad-hoc scaling
measurements. Prints one JSON line."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from starrocks_spark import registry
from starrocks_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="starrocks-spark-timer")
    queries = registry.all_queries()
    spark.sparkContext.setJobDescription("warmup")
    queries[names[0]](spark, SF_DIR).collect()
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"sf_dir": SF_DIR,
                      "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                      "queries": timings,
                      "total": round(sum(timings.values()), 3),
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
