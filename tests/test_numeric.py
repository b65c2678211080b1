"""NUMERIC field encodings (`pg_search/src/query/numeric.rs:1-472`):
Numeric64 scaled-i64 exactness and NumericBytes order preservation."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from paradedb_ray.numeric import (
    numeric_bytes,
    numeric_term_count,
    scale_array,
    scale_i64,
)


def test_scale_i64_exact():
    assert scale_i64("123.45", 2) == 12345
    assert scale_i64(100, 2) == 10000
    assert scale_i64(0.07, 2) == 7          # shortest-repr float, not 6
    assert scale_i64(Decimal("-1.005"), 2) == -101  # HALF_UP: away from 0
    assert scale_i64("1.005", 2) == 101
    with pytest.raises(OverflowError):
        scale_i64("1e30", 2)


def test_scale_array_float_and_string():
    col = pa.array([1.05, None, 0.07, -2.5], pa.float64())
    out, valid = scale_array(col, 2)
    assert list(valid) == [True, False, True, True]
    assert list(out[valid]) == [105, 7, -250]
    col = pa.array(["1.05", "x", None], pa.string())
    out, valid = scale_array(col, 2)
    assert list(valid) == [True, False, False]
    assert out[0] == 105


def test_scale_array_decimal():
    col = pa.array([Decimal("12.34"), Decimal("-0.01")],
                   pa.decimal128(10, 2))
    out, valid = scale_array(col, 2)
    assert list(out) == [1234, -1]
    assert valid.all()


_decimals = st.decimals(min_value=Decimal("-1e20"), max_value=Decimal("1e20"),
                        allow_nan=False, allow_infinity=False, places=6)


@settings(max_examples=300, deadline=None)
@given(_decimals, _decimals)
def test_numeric_bytes_order_preserving(a, b):
    ea, eb = numeric_bytes(a), numeric_bytes(b)
    if a == b:
        assert ea == eb
    elif a < b:
        assert ea < eb
    else:
        assert ea > eb


def test_numeric_bytes_trailing_zeros_equal():
    assert numeric_bytes("1.50") == numeric_bytes("1.5")
    assert numeric_bytes("0.0") == numeric_bytes(0)
    assert numeric_bytes("-0") == numeric_bytes(0)


def test_numeric_term_count():
    col = pa.array([1.0, 2.5, 2.5, None], pa.float64())
    assert numeric_term_count(col, "2.50", 2) == 2
    assert numeric_term_count(col, "2.50", None) == 2  # NumericBytes path
    assert numeric_term_count(col, "junk", 2) == 0


def test_numeric_field_search(ray_session):
    """Term + range over a NUMERIC(., 2) column through the full search
    path, incl. an unscaled (NumericBytes) variant."""
    import ray.data

    from paradedb_ray.pipelines.search import search
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import I64, IndexSchema

    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "price": pa.array([9.99, 10.00, 10.01, None],
                                    pa.float64())})
    for scale in (2, None):
        schema = IndexSchema.build(
            key_field="id", id={"type": I64, "fast": True},
            price={"type": "numeric", "scale": scale})
        ds = ray.data.from_arrow(t)
        got = search(ds, schema, pdb.term("price", "10.00"),
                     with_score=False, output_columns=["id"]).to_pandas()
        assert set(got["id"]) == {2}, scale
        got = search(ds, schema,
                     pdb.range("price", lower="9.99", upper="10.01",
                               lower_inclusive=False, upper_inclusive=True),
                     with_score=False, output_columns=["id"]).to_pandas()
        assert set(got["id"]) == {2, 3}, scale
