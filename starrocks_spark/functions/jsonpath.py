"""JSONPath subset (reference: be/src/exprs/jsonpath.cpp — the
flattened-path engine behind json_query/get_json_xxx).

Spark's ``get_json_object`` natively covers the core grammar the
reference implements: ``$.a.b``, array index ``[n]``, and the
wildcard ``[*]`` (returning the matches as a JSON array). Two gaps
are closed here, both as built-in expression desugars (no UDF):

- ``json_path(col, path)`` — dispatcher: wildcard/indexed paths go
  straight to ``get_json_object``; ``$..key`` recursive descent is
  desugared below.
- ``json_path_values(col, path, type)`` — wildcard/descent path →
  ARRAY of typed scalars (``from_json`` over the JSON-array match),
  ready to explode.
- recursive descent ``$..key`` → ``regexp_extract_all`` for the
  key's SCALAR occurrences at any depth. This is the documented
  subset: scalar leaf values whose strings contain no escaped
  quotes (the reference's engine matches objects/arrays too —
  jsonpath.cpp handles full values; a regex cannot, and a Python
  row-UDF to do it would be the slow path this engine bans).

Scale: per-row string expressions inside whole-stage codegen —
behaves like any other projection at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DESCENT_RE = re.compile(r"^\$\.\.([A-Za-z_][A-Za-z0-9_]*)$")

# a scalar JSON value: string (no escaped quotes), number, bool, null
_SCALAR_VALUE = r'("(?:[^"\\]*)"|-?[0-9][0-9.eE+-]*|true|false|null)'


def _descent_regex(key: str) -> str:
    return f'"{key}"\\s*:\\s*{_SCALAR_VALUE}'


def json_descent_all(col: Column, key: str) -> Column:
    """``$..key`` → array of the key's scalar values (JSON-encoded
    strings: string values keep their quotes, numbers/bools/null are
    literal) in document order, at any nesting depth."""
    return F.regexp_extract_all(col, F.lit(_descent_regex(key)), 1)


def json_path(col: Column, path: str) -> Column:
    """StarRocks get_json_xxx path semantics: native for ``$.a[0].b``
    and ``$.a[*].b``; ``$..key`` desugars to the descent regex and
    returns the matches as a JSON array string (same shape the
    wildcard form returns)."""
    m = _DESCENT_RE.match(path)
    if m:
        return F.concat(
            F.lit("["),
            F.array_join(json_descent_all(col, m.group(1)), ","),
            F.lit("]"),
        )
    return F.get_json_object(col, path)


def json_path_values(col: Column, path: str, dtype: str) -> Column:
    """Typed ARRAY of a wildcard/descent path's matches, e.g.
    ``json_path_values(j, '$.items[*].pk', 'bigint')`` →
    array<bigint>. Explode it for one row per match.

    get_json_object quirk: a wildcard with exactly ONE match returns
    the bare element (unquoted for strings), not a one-element JSON
    array — normalize it back to an array so single-item documents
    aren't silently dropped. (Subset caveat: a single STRING match
    that itself starts with '[' would be misread as an array.)"""
    raw = json_path(col, path)
    return (
        F.when(raw.isNull(), F.lit(None).cast(f"array<{dtype}>"))
        .when(raw.startswith("["), F.from_json(raw, f"array<{dtype}>"))
        .otherwise(F.array(raw.cast(dtype)))
    )
