"""Coercion-matrix golden tests — the allRight/allWrong/allMissing/
arrayAsString cases of the reference (util/JiraUtilTest.java:259-329),
independently re-authored, plus strftime translation."""

from __future__ import annotations

import datetime
import json
import math

from pyspark.sql import functions as F

from sparkcdc.coerce import (
    DEFAULT_STRFTIME,
    coerce_columns,
    normalize_token_arrays,
    strftime_to_java,
)

COLUMNS = [
    {"name": "boolean", "type": "boolean"},
    {"name": "long", "type": "long"},
    {"name": "double", "type": "double"},
    {"name": "string", "type": "string"},
    {"name": "date", "type": "timestamp", "format": DEFAULT_STRFTIME},
    {"name": "json", "type": "json"},
]


def _coerced(spark, record):
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(record)]))
    return coerce_columns(df, COLUMNS).collect()[0].asDict()


def test_all_right(spark):
    row = _coerced(spark, {
        "boolean": True, "long": 42, "double": 1.25, "string": "hello",
        "date": "2024-03-05T10:11:12.123+0000", "json": {"a": [1, 2]},
    })
    assert row["boolean"] is True and row["long"] == 42 and row["double"] == 1.25
    assert row["string"] == "hello"
    assert row["date"] == datetime.datetime(2024, 3, 5, 10, 11, 12, 123000)
    assert json.loads(row["json"]) == {"a": [1, 2]}


def test_all_wrong_types_yield_null_or_parseboolean(spark):
    row = _coerced(spark, {
        "boolean": {"x": 1}, "long": "not-a-number", "double": "nope",
        "string": None, "date": "not a date", "json": "primitive",
    })
    assert row["boolean"] is None            # object → null
    assert row["long"] is None and row["double"] is None
    assert row["string"] is None             # json null → null
    assert row["date"] is None               # unparseable → null
    assert row["json"] is None               # primitive not valid json col


def test_all_missing_paths_yield_typed_nulls(spark):
    df = spark.read.json(spark.sparkContext.parallelize(['{"other": 1}']))
    out = coerce_columns(df, COLUMNS)
    row = out.collect()[0].asDict()
    assert all(v is None for v in row.values())
    dt = dict(out.dtypes)
    assert dt["boolean"] == "boolean" and dt["long"] == "bigint"
    assert dt["double"] == "double" and dt["date"] == "timestamp"


def test_array_as_string_joins_with_comma(spark):
    # heterogeneous JSON array [1, {}, []] — Spark infers array<string>
    # keeping raw texts; golden expectation "1,{},[]"
    row = _coerced(spark, {"string": [1, {}, []]})
    assert row["string"] == "1,{},[]"


def test_array_of_structs_as_string(spark):
    df = spark.read.json(spark.sparkContext.parallelize(
        ['{"string": [{"a": 1}, {"a": 2}]}']))
    row = coerce_columns(df, [{"name": "string", "type": "string"}]).collect()[0]
    assert row["string"] == '{"a":1},{"a":2}'


def test_parseboolean_semantics(spark):
    # Boolean.parseBoolean: only "true" (any case) is true; "yes"/"1"/numbers → false
    for val, want in [("true", True), ("TRUE", True), ("yes", False), ("1", False)]:
        row = _coerced(spark, {"boolean": val})
        assert row["boolean"] is want, (val, row["boolean"])
    assert _coerced(spark, {"boolean": 1})["boolean"] is False  # number → false


def test_numeric_coercions(spark):
    assert _coerced(spark, {"long": "123"})["long"] == 123
    assert _coerced(spark, {"long": "12.5"})["long"] is None      # strict parse
    assert _coerced(spark, {"long": 12.9})["long"] == 12          # truncate
    assert _coerced(spark, {"double": "1.5e3"})["double"] == 1500.0
    assert math.isnan(_coerced(spark, {"double": "NaN"})["double"])
    assert _coerced(spark, {"double": True})["double"] is None    # bool → null


def test_timestamp_custom_format(spark):
    df = spark.read.json(spark.sparkContext.parallelize(['{"d": "2024/03/05"}']))
    row = coerce_columns(df, [{"name": "d", "type": "timestamp", "format": "%Y/%m/%d"}]).collect()[0]
    assert row["d"] == datetime.datetime(2024, 3, 5)


def test_strftime_translation():
    assert strftime_to_java(DEFAULT_STRFTIME) == "yyyy-MM-dd'T'HH:mm:ss.SSSXX"
    assert strftime_to_java("%Y/%m/%d %H:%M") == "yyyy/MM/dd HH:mm"
    assert strftime_to_java("%b %e, %Y") == "MMM d, yyyy"
    # bare letters are quoted so they aren't pattern chars
    assert strftime_to_java("%HhM") == "HH'h''M'"


def test_normalize_token_arrays_is_identity_int32(spark):
    df = spark.createDataFrame(
        [([1, 2, 3],), (None,), ([2**20, 0],)], "tokens: array<int>"
    )
    out = df.select(normalize_token_arrays(F.col("tokens")).alias("t")).collect()
    assert [r["t"] for r in out] == [[1, 2, 3], None, [2**20, 0]]


def test_strftime_unsupported_directives_raise():
    import pytest

    for bad in ("%s since epoch", "%C%y", "%U week"):
        with pytest.raises(ValueError, match="unsupported strftime"):
            strftime_to_java(bad)


def test_epoch_seconds_whole_pattern(spark):
    """%s as the whole format parses epoch-second strings/numbers;
    garbage → NULL (null-on-error contract)."""
    df = spark.createDataFrame(
        [("1700000000",), ("garbage",), ("17.5",), (None,)], "d: string"
    )
    rows = coerce_columns(df, [{"name": "d", "type": "timestamp", "format": "%s"}]).collect()
    assert rows[0]["d"] == datetime.datetime(2023, 11, 14, 22, 13, 20)  # UTC session
    assert rows[1]["d"] is None and rows[2]["d"] is None and rows[3]["d"] is None


def test_epoch_millis_whole_pattern(spark):
    df = spark.createDataFrame([("1700000000123",), ("nope",)], "d: string")
    rows = coerce_columns(df, [{"name": "d", "type": "timestamp", "format": "%Q"}]).collect()
    assert rows[0]["d"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 123000)
    assert rows[1]["d"] is None
