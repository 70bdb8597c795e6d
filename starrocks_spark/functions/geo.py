"""Geo functions (reference: be/src/exprs/geo_functions.cpp —
st_distance_sphere, st_point ops). Implemented as built-in math
expression trees (sin/cos/atan2 stay JVM-side in codegen); marked
optional in SURVEY.md §2.10 — correctness is covered by unit tests
rather than the cross-engine oracle because libm vs JVM trig can
differ in the last ulp."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean Earth radius, same constant family the


def st_distance_sphere(lon1: Column, lat1: Column,
                       lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (haversine), the reference's
    st_distance_sphere (geo_functions.cpp)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    c = F.lit(2.0) * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))
    return F.lit(EARTH_RADIUS_M) * c
