"""encode_sort_key byte-vector + type-fidelity tests (r12 ADVICE).

Reference byte contract: be/src/storage_primitive/primary_key_encoder.h
encode_integral (unsigned sign-bit flip, big-endian) and
be/src/exprs_ext/utility/utility_functions.cpp:594 encode_sort_key.
"""
from __future__ import annotations

import pyarrow as pa
import pytest

from starrocks_spark.functions.sortkey import (_enc_int, encode_arrays,
                                               register)


def test_enc_int_negative_byte_vectors():
    # unsigned sign-bit flip: value + 2^(w*8-1) mod 2^(w*8), big-endian
    assert _enc_int(-1, 1) == b"\x7f"
    assert _enc_int(-128, 1) == b"\x00"
    assert _enc_int(127, 1) == b"\xff"
    assert _enc_int(0, 1) == b"\x80"
    assert _enc_int(-1, 4) == b"\x7f\xff\xff\xff"
    assert _enc_int(-(2 ** 31), 4) == b"\x00\x00\x00\x00"
    assert _enc_int(-1, 8) == b"\x7f" + b"\xff" * 7
    assert _enc_int(-(2 ** 63), 8) == b"\x00" * 8
    assert _enc_int(2 ** 63 - 1, 8) == b"\xff" * 8


def test_enc_int_order_preserving():
    vals = [-(2 ** 63), -12345, -1, 0, 1, 99, 2 ** 53 + 1, 2 ** 63 - 1]
    enc = [_enc_int(v, 8) for v in vals]
    assert enc == sorted(enc)


def test_encode_arrays_nullable_int64_keeps_integral_encoding():
    # a batch WITH a null must encode non-null ints identically to a
    # batch WITHOUT one (the old pandas path saw float64 and switched
    # encodings batch-to-batch), and must keep exact precision > 2^53
    big = 2 ** 53 + 1
    with_null = encode_arrays([pa.array([5, None, big], pa.int64())])
    without = encode_arrays([pa.array([5, big], pa.int64())])
    assert with_null[0].as_py() == without[0].as_py()
    assert with_null[1].as_py() == b"\x00"
    assert with_null[2].as_py() == without[1].as_py()
    assert with_null[2].as_py() == b"\x01" + _enc_int(big, 8)


def test_encode_arrays_negative_int_widths():
    out = encode_arrays([pa.array([-7], pa.int8()),
                         pa.array([-7], pa.int32()),
                         pa.array([-7], pa.int64())])
    assert out[0].as_py() == (
        b"\x01" + _enc_int(-7, 1) + b"\x00"
        + b"\x01" + _enc_int(-7, 4) + b"\x00"
        + b"\x01" + _enc_int(-7, 8))


@pytest.mark.usefixtures("spark")
def test_sql_nullable_batch_parity(spark):
    register(spark)
    a = spark.sql(
        "select __encode_sort_key(y) k from values "
        "(cast(5 as bigint)), (cast(null as bigint)) t(y) "
        "order by y nulls last").collect()
    b = spark.sql(
        "select __encode_sort_key(y) k from values "
        "(cast(5 as bigint)) t(y)").collect()
    assert a[0].k == b[0].k == b"\x01" + _enc_int(5, 8)


def test_sr_dstr_negative_zero(spark):
    register(spark)
    rows = spark.sql(
        "select __sr_dstr(cast(s as double)) r from values "
        "('-0.0'), ('0.0'), ('2.5'), ('4') t(s)").collect()
    assert [r.r for r in rows] == ["-0", "0", "2.5", "4"]
