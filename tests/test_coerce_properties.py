"""Property-based coercion tests: the Catalyst coercion expressions must
agree with an independent Python model of the contract on arbitrary scalar
inputs (gson-fidelity itself is pinned by the golden tests in
test_coerce.py; this guards the Spark expressions against edge-case bugs).
"""

from __future__ import annotations

import json
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkcdc.coerce import coerce_columns

_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?[fFdD]?|NaN|Infinity)$")


def model_boolean(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        return v.lower() == "true"
    if isinstance(v, (int, float)):
        return False
    return None


def model_long(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        return int(v)  # truncate toward zero
    if isinstance(v, str):
        return int(v) if _INT_RE.match(v) else None
    return None


def model_double(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return float(re.sub(r"[fFdD]$", "", v)) if _FLOAT_RE.match(v) else None
    return None


def model_string(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return v if isinstance(v, str) else None  # numeric formatting checked separately


TRICKY_STRINGS = [
    "true", "TRUE", "True", "false", "yes", "1", "0", "-42", "12.5", "+7",
    "1e3", "-1.5E-2", ".5", "5.", "NaN", "Infinity", "12f", "0x1A", "",
    " 12", "12 ", "abc", "--1", "1.2.3", "1_000",
]

ints = st.integers(min_value=-(2**62), max_value=2**62)
floats = st.floats(allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15)
strings = st.one_of(st.sampled_from(TRICKY_STRINGS), st.text("abc123.-+eE ", max_size=12))
bools = st.booleans()

COLUMNS = [
    {"name": "v", "type": "long"},
    {"name": "v", "type": "double"},
    {"name": "v", "type": "boolean"},
    {"name": "v", "type": "string"},
]


def _roundtrip(spark, values):
    lines = [json.dumps({"v": v}) for v in values]
    df = spark.read.json(spark.sparkContext.parallelize(lines, 2))
    out = coerce_columns(df, COLUMNS).toDF("long", "double", "boolean", "string")
    extra = df.select("v")
    rows = out.collect()
    originals = [r["v"] for r in extra.collect()]
    return rows, originals


def _check(spark, values):
    rows, _ = _roundtrip(spark, values)
    # read.json may reorder rows across partitions only if >1 file; with
    # parallelize order is preserved per partition concatenation
    for v, r in zip(values, rows):
        assert r["long"] == model_long(v), (v, r["long"], model_long(v))
        md = model_double(v)
        rd = r["double"]
        if md is None or rd is None:
            assert md == rd, (v, rd, md)
        elif math.isnan(md):
            assert math.isnan(rd), (v, rd)
        else:
            assert math.isclose(rd, md, rel_tol=1e-12), (v, rd, md)
        assert r["boolean"] == model_boolean(v), (v, r["boolean"], model_boolean(v))
        ms = model_string(v)
        if isinstance(v, (str, bool)) or v is None:
            assert r["string"] == ms, (v, r["string"], ms)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(strings, min_size=1, max_size=12))
def test_string_inputs_property(spark, values):
    _check(spark, values)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(ints, min_size=1, max_size=12))
def test_int_inputs_property(spark, values):
    _check(spark, values)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(floats, min_size=1, max_size=12))
def test_float_inputs_property(spark, values):
    _check(spark, values)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(bools, min_size=1, max_size=8))
def test_bool_inputs_property(spark, values):
    _check(spark, values)
