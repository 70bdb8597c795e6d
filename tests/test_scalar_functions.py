"""Unit tests for the net/geo scalar function library
(functions/net.py, functions/geo.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starrocks_spark.functions.geo import st_distance_sphere
from starrocks_spark.functions.net import inet_aton, inet_ntoa


def test_inet_aton_known_values(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("255.255.255.255",), ("192.168.1.1",),
         ("10.0.0.256",), ("not.an.ip",), ("1.2.3",)],
        "ip string",
    )
    got = [r[0] for r in df.select(inet_aton(F.col("ip"))).collect()]
    assert got == [0, 4294967295, 3232235777, None, None, None]


def test_inet_ntoa_roundtrip(spark):
    df = spark.createDataFrame(
        [(0,), (4294967295,), (3232235777,), (-1,), (2**32,)], "n long"
    )
    got = [r[0] for r in df.select(inet_ntoa(F.col("n"))).collect()]
    assert got == ["0.0.0.0", "255.255.255.255", "192.168.1.1", None, None]


@pytest.mark.parametrize(
    "lon1,lat1,lon2,lat2,km,tol",
    [
        # Paris → London ≈ 344 km
        (2.3522, 48.8566, -0.1276, 51.5072, 344, 5),
        # equator quarter-circumference ≈ 10008 km
        (0.0, 0.0, 90.0, 0.0, 10008, 15),
        # same point → 0
        (13.4, 52.5, 13.4, 52.5, 0, 0.001),
    ],
)
def test_haversine_known_distances(spark, lon1, lat1, lon2, lat2, km, tol):
    df = spark.range(1).select(
        (st_distance_sphere(
            F.lit(lon1), F.lit(lat1), F.lit(lon2), F.lit(lat2)
        ) / 1000.0).alias("km")
    )
    got = df.collect()[0][0]
    assert abs(got - km) <= tol


# ---------------------------------------------------------------------------
# scalar-function coverage ledger (FUNCTIONS.md source of truth)

def test_coverage_ledger_is_total_and_consistent():
    """Every reference scalar name is classified exactly once, every
    ledger key really is a reference name, and the snapshot matches
    the reference checkout when present."""
    import os
    import re

    from starrocks_spark.functions import coverage as cov

    assert cov.unclassified() == []
    ref_set = set(cov.REFERENCE_NAMES)
    assert len(cov.REFERENCE_NAMES) == len(ref_set), "snapshot has dups"
    for ledger in (cov.MAPPED, cov.REPO, cov.NA):
        stray = set(ledger) - ref_set
        assert not stray, f"ledger keys not in reference list: {stray}"
    # classification buckets must not overlap
    overlap = (cov.MAPPED.keys() & cov.REPO.keys()) | \
        (cov.MAPPED.keys() & cov.NA.keys()) | \
        (cov.REPO.keys() & cov.NA.keys())
    assert not overlap, f"multi-classified: {overlap}"
    # every repo pointer must exist
    for target in set(cov.REPO.values()):
        assert os.path.exists(target), target

    ref_reg = "/root/reference/gensrc/script/functions.py"
    if os.path.exists(ref_reg):
        src = open(ref_reg).read()
        derived = sorted(set(
            re.findall(r"\[\d+,\s*'?\"?([a-z0-9_]+)", src)))
        assert sorted(ref_set) == derived, "snapshot drifted"
