"""encode_sort_key(...) — order-preserving composite binary key.

Mirrors the reference's encoding exactly (byte-for-byte: the
test_make_sort_key R file records the raw key bytes):
- per field, a NULL marker byte (0x01 non-null / 0x00 null)
- integrals: sign-bit flip + big-endian, width = storage width
  (be/src/storage_primitive/primary_key_encoder.h:62 encode_integral)
- floats: flip all bits when negative else flip the sign bit,
  big-endian (be/src/exprs_ext/utility/utility_functions.cpp:459)
- strings: last field appends raw; earlier fields escape 0x00 ->
  0x00 0x01 and terminate with 0x00 0x00 (primary_key_encoder.h:91)
- a 0x00 separator byte between fields
  (utility_functions.cpp:594 encode_sort_key)

Arrow-batched pandas UDF (variadic) — the per-element loop runs over
one Arrow batch at a time, never row-at-a-time over the wire.
"""
from __future__ import annotations

import struct

_REGISTERED: set[int] = set()

_INT_WIDTH = {"int8": 1, "int16": 2, "int32": 4, "int64": 8,
              "uint8": 1, "uint16": 2, "uint32": 4, "uint64": 8,
              "Int8": 1, "Int16": 2, "Int32": 4, "Int64": 8}


def _enc_int(v: int, width: int) -> bytes:
    u = int(v) ^ (1 << (width * 8 - 1))
    return u.to_bytes(width, "big", signed=False)


def _enc_float(v: float, width: int) -> bytes:
    if width == 4:
        (u,) = struct.unpack(">I", struct.pack(">f", v))
        u ^= 0xFFFFFFFF if (u & 0x80000000) else 0x80000000
        return struct.pack(">I", u)
    (u,) = struct.unpack(">Q", struct.pack(">d", v))
    u ^= (0xFFFFFFFFFFFFFFFF if (u & 0x8000000000000000)
          else 0x8000000000000000)
    return struct.pack(">Q", u)


def _enc_slice(v, is_last: bool) -> bytes:
    b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
    if is_last:
        return bytes(b)
    return bytes(b).replace(b"\x00", b"\x00\x01") + b"\x00\x00"


def encode_rows(cols: list, is_int32: list[bool] | None = None) -> list:
    """cols: list of pandas Series (one per field). Returns a list of
    composite key bytes, one per row."""
    n = len(cols[0])
    buffs = [bytearray() for _ in range(n)]
    last = len(cols) - 1
    for j, s in enumerate(cols):
        dt = str(s.dtype)
        width = _INT_WIDTH.get(dt)
        is_float = dt in ("float32", "float64", "Float32", "Float64")
        fwidth = 4 if dt in ("float32", "Float32") else 8
        for i, v in enumerate(s):
            try:
                import pandas as pd
                isnull = v is None or (not isinstance(
                    v, (bytes, bytearray, str)) and pd.isna(v))
            except Exception:  # noqa: BLE001 — odd scalars: non-null
                isnull = False
            if isnull:
                buffs[i] += b"\x00"
            else:
                buffs[i] += b"\x01"
                if width is not None:
                    buffs[i] += _enc_int(v, width)
                elif is_float:
                    buffs[i] += _enc_float(v, fwidth)
                elif isinstance(v, bool):
                    buffs[i] += _enc_int(int(v), 1)
                elif isinstance(v, int):
                    buffs[i] += _enc_int(v, 8)
                elif isinstance(v, float):
                    buffs[i] += _enc_float(v, 8)
                else:
                    buffs[i] += _enc_slice(v, j == last)
            if j != last:
                buffs[i] += b"\x00"
    return [bytes(b) for b in buffs]


def register(spark) -> None:
    """Register ``__encode_sort_key(*cols) -> binary`` (idempotent)."""
    if id(spark) in _REGISTERED:
        return
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _fn(*cols):
        return pd.Series(encode_rows(list(cols)))

    # variadic pandas UDFs need the explicit SCALAR eval type (the
    # type-hint inference path rejects *args signatures)
    __encode_sort_key = pandas_udf(_fn, "binary",
                                   PandasUDFType.SCALAR)

    def _dstr(v):
        # C++ shortest-round-trip double render (fmt/to_chars) =
        # Python repr; whole values print without the trailing .0
        # (be column cast_to_string; test_full_sort_use_german_string)
        def one(x):
            if x is None or pd.isna(x):
                return None
            f = float(x)
            if f == int(f) and abs(f) < 1e16:
                return str(int(f))
            return repr(f)
        return pd.Series([one(x) for x in v])

    # explicit eval type: `from __future__ import annotations` makes
    # the hints strings pandas_udf cannot resolve here
    __sr_dstr = pandas_udf(_dstr, "string", PandasUDFType.SCALAR)
    spark.udf.register("__sr_dstr", __sr_dstr)
    spark.udf.register("__encode_sort_key", __encode_sort_key)
    _REGISTERED.add(id(spark))
