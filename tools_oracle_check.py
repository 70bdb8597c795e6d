#!/usr/bin/env python3
"""Value-level oracle check for a list of declared queries at one SF.

Usage: python tools_oracle_check.py [sf_dir] <query> [<query> ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

import duckdb

from _compare import assert_matches_oracle
from starrocks_spark import registry
from starrocks_spark.catalog import TABLES
from starrocks_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    spark = get_spark(app_name="starrocks-spark-oraclecheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    fails = 0
    for name in args:
        try:
            assert_matches_oracle(
                queries[name](spark, sf_dir), con, oracles[name], name
            )
            print(f"OK    {name}")
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"FAIL  {name}: {str(e)[:300]}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
