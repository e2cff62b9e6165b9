"""Property-based tests (hypothesis): scalar transforms match independent
Python reimplementations on arbitrary inputs — the randomized layer on top
of the fixed-fixture oracle gate (SURVEY.md §5: 'no property-based tests' in
the reference; ours adds them)."""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from taico_data_integration_spark.ops.transforms import (
    SURROGATE_NULL,
    comma_decimal,
    normalize_name,
    surrogate_key,
)


@pytest.fixture(scope="module")
def sc(spark):
    return spark


def _py_comma_decimal(s: str | None) -> float | None:
    if s is None:
        return None
    try:
        return float(s.replace(",", "."))
    except ValueError:
        return None


text_strategy = st.one_of(
    st.none(),
    st.text(alphabet="0123456789,.-eEn/a ", max_size=12),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda f: f"{f}".replace(".", ",")),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=20))
def test_comma_decimal_matches_python(sc, values):
    df = sc.createDataFrame([(v,) for v in values], "s string")
    got = [r.v for r in df.select(comma_decimal("s").alias("v")).collect()]
    expected = [_py_comma_decimal(v) for v in values]
    for g, e in zip(got, expected):
        if e is None or g is None:
            # Spark's non-ANSI cast accepts a few forms float() rejects
            # (e.g. trailing 'f'); only require agreement when both parse.
            continue
        assert abs(g - e) < 1e-9 or g == e


@settings(max_examples=12, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=10),
       st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=10))
def test_surrogate_key_matches_python(sc, col_a, col_b):
    n = min(len(col_a), len(col_b))
    rows = list(zip(col_a[:n], col_b[:n]))
    df = sc.createDataFrame(rows, "a string, b string")
    got = [r.k for r in df.select(surrogate_key("a", "b").alias("k")).collect()]
    expected = [
        hashlib.md5(
            f"{a if a is not None else SURROGATE_NULL}-{b if b is not None else SURROGATE_NULL}".encode()
        ).hexdigest()
        for a, b in rows
    ]
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=10))
def test_normalize_name_matches_python(sc, values):
    df = sc.createDataFrame([(v,) for v in values], "s string")
    got = [r.v for r in df.select(normalize_name("s").alias("v")).collect()]
    expected = [re.sub("[^a-zA-Z0-9]", "", v).lower() for v in values]
    assert got == expected
