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


# ---------------------------------------------------------------------------
# ST_Point / ST_Polygon / ST_Contains (geo_functions.cpp st_contains;
# the reference parses WKT then point-in-polygon tests). Polygons are
# arrays of (x, y) structs; containment is the standard ray-cast over
# the edge list, expressed as ONE aggregate higher-order function —
# row-local, JVM-side, no UDF.


def st_point(x, y) -> Column:
    return F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))


def st_polygon(coords: list[tuple[float, float]]) -> Column:
    """Literal polygon (closed implicitly: last edge joins the final
    vertex back to the first — same contract as WKT rings without the
    repeated closing vertex)."""
    return F.array(*[st_point(x, y) for x, y in coords])


def st_contains(poly: Column, x: Column, y: Column) -> Column:
    """Ray-cast point-in-polygon (odd crossings of the +x ray).

    Division-free: the usual ``x < xi + (y-yi)/(yj-yi)*(xj-xi)`` is
    multiplied through by (yj - yi) with an explicit sign factor, so
    horizontal edges never divide by zero (ANSI mode would raise) and
    both engines evaluate the identical IEEE product chain. Edge
    pairs where the ray can't cross ((yi > y) == (yj > y)) contribute
    nothing. Boundary points follow ray-cast convention (not
    specially cased — the reference's GEOS-based boundary semantics
    differ only exactly ON an edge)."""
    n = F.size(poly)

    def crossing(acc, i):
        p1 = F.element_at(poly, i + 1)
        p2 = F.element_at(poly, ((i + 1) % n) + 1)
        xi, yi = p1["x"], p1["y"]
        xj, yj = p2["x"], p2["y"]
        straddles = (yi > y) != (yj > y)
        d = yj - yi
        sign = F.when(d > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        left_of_edge = (
            ((x - xi) * d - (xj - xi) * (y - yi)) * sign < F.lit(0.0)
        )
        return acc + F.when(straddles & left_of_edge, 1).otherwise(0)

    crossings = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(0), crossing
    )
    return crossings % 2 == 1
