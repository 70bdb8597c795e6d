"""IP/network functions (reference: be/src/exprs/inet_aton.cpp,
string_functions.cpp inet_ntoa) — pure built-in column expressions,
JVM-side, codegen-friendly; no UDFs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def inet_aton(ip: Column) -> Column:
    """'a.b.c.d' → 32-bit integer (NULL on malformed input), as a
    single codegen-able expression tree."""
    parts = F.split(ip, r"\.")
    valid = (F.size(parts) == 4) & F.forall(
        parts, lambda p: p.rlike(r"^\d{1,3}$") & (p.cast("long") <= 255)
    )
    octet = lambda i: F.element_at(parts, i).cast("long")  # noqa: E731
    return F.when(
        valid,
        octet(1) * F.lit(16777216)
        + octet(2) * F.lit(65536)
        + octet(3) * F.lit(256)
        + octet(4),
    )


def inet_ntoa(n: Column) -> Column:
    """32-bit integer → 'a.b.c.d' (NULL when out of range)."""
    n = n.cast("long")
    in_range = (n >= 0) & (n <= F.lit(4294967295))
    return F.when(
        in_range,
        F.concat_ws(
            ".",
            (n / 16777216).cast("long") % 256,
            (n / 65536).cast("long") % 256,
            (n / 256).cast("long") % 256,
            n % 256,
        ),
    )
