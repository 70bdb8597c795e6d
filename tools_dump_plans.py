#!/usr/bin/env python3
"""Dump .explain('formatted') for named queries to plans/r13/<name>_<tag>.txt.

Usage: python tools_dump_plans.py <tag> <query> [<query> ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from starrocks_spark import registry
from starrocks_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="starrocks-spark-plandump")
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(txt)
        print(f"{path}: {len(txt)} bytes")


if __name__ == "__main__":
    main()
