"""Schema guess + evolution detector tests (reference guess golden analog,
jira_input_plugin.json:62-90 — all six types detected, sorted names)."""

from __future__ import annotations

import json

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from sparkcdc.schema_infer import detect_evolution, guess_columns

SAMPLE = {
    "flag": True,
    "num": 12,
    "ratio": 0.5,
    "title": "plain text",
    "created": "2024-03-05T10:11:12.123+0000",
    "day": "2024-03-05",
    "nested": {"payload": {"deep": {"a": 1}}},
}


def test_guess_all_types_sorted(spark):
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(SAMPLE)]))
    specs = guess_columns(df)
    names = [s["name"] for s in specs]
    assert names == sorted(names)
    by = {s["name"]: s for s in specs}
    assert by["flag"]["type"] == "boolean"
    assert by["num"]["type"] == "long"
    assert by["ratio"]["type"] == "double"
    assert by["title"]["type"] == "string"
    assert by["created"] == {"name": "created", "type": "timestamp",
                             "format": "%Y-%m-%dT%H:%M:%S.%L%z"}
    assert by["day"] == {"name": "day", "type": "timestamp", "format": "%Y-%m-%d"}
    # deep object without heuristic keys → json column at its (2-dot) prefix
    assert by["nested.payload.deep"]["type"] == "json"


def test_guess_mixed_timestamp_strings_stay_string(spark):
    rows = ['{"v": "2024-03-05"}', '{"v": "not a date"}']
    df = spark.read.json(spark.sparkContext.parallelize(rows))
    assert guess_columns(df) == [{"name": "v", "type": "string"}]


V1 = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
    T.StructField("n_tok", T.IntegerType()),
])


def test_detect_evolution_add_and_widen():
    batch = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("seq", T.LongType()),
    ])
    evolved, changes = detect_evolution(V1, batch, ignore={"seq"})
    assert sorted(changes) == ["add column lang: string", "widen n_tok: int -> bigint"]
    by = {f.name: f.dataType.simpleString() for f in evolved.fields}
    assert by == {"doc_id": "string", "tokens": "array<int>", "n_tok": "bigint", "lang": "string"}
    # field order: existing first, additions appended
    assert [f.name for f in evolved.fields][:3] == ["doc_id", "tokens", "n_tok"]


def test_detect_evolution_noop_and_narrowing():
    assert detect_evolution(V1, V1) == (None, [])
    # a NARROWER batch (int where table has long) needs no change
    wide = T.StructType([T.StructField("n", T.LongType())])
    narrow = T.StructType([T.StructField("n", T.IntegerType())])
    assert detect_evolution(wide, narrow) == (None, [])


def test_detect_evolution_incompatible_raises():
    a = T.StructType([T.StructField("x", T.StringType())])
    b = T.StructType([T.StructField("x", T.ArrayType(T.IntegerType()))])
    with pytest.raises(ValueError, match="incompatible"):
        detect_evolution(a, b)


def test_widen_array_elements():
    a = T.StructType([T.StructField("tokens", T.ArrayType(T.IntegerType()))])
    b = T.StructType([T.StructField("tokens", T.ArrayType(T.LongType()))])
    evolved, changes = detect_evolution(a, b)
    assert changes == ["widen tokens: array<int> -> array<bigint>"]
    assert evolved.fields[0].dataType.simpleString() == "array<bigint>"


def test_guess_broader_timestamp_formats(spark):
    """SchemaGuess-style coverage: slash/dot dates, space+zone, epoch
    seconds (range-checked)."""
    df = spark.createDataFrame(
        [("05/03/2024", "1700000000", "2024-03-05 10:00:00 +0000", "2024/03/05")],
        "a: string, b: string, c: string, d: string",
    )
    specs = {s["name"]: s for s in guess_columns(df)}
    assert specs["a"] == {"name": "a", "type": "timestamp", "format": "%d/%m/%Y"}
    assert specs["b"] == {"name": "b", "type": "timestamp", "format": "%s"}
    assert specs["c"]["format"] == "%Y-%m-%d %H:%M:%S %z"
    assert specs["d"]["format"] == "%Y/%m/%d"


def test_epoch_out_of_range_stays_string(spark):
    # 10 digits but outside the sane epoch window (year 2286)
    df = spark.createDataFrame([("9999999999",)], "a: string")
    assert guess_columns(df)[0]["type"] == "string"


def test_string_widens_to_timestamp_for_dynamic_reguess():
    a = T.StructType([T.StructField("created", T.StringType())])
    b = T.StructType([T.StructField("created", T.TimestampType())])
    evolved, changes = detect_evolution(a, b)
    assert changes == ["widen created: string -> timestamp"]


def test_guess_epoch_millis(spark):
    df = spark.createDataFrame([("1700000000123",)], "a: string")
    assert guess_columns(df)[0] == {"name": "a", "type": "timestamp", "format": "%Q"}
