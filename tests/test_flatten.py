"""Golden tests for the flatten walker + dot-path projection — the same
case matrix as the reference's IssueTest (9 flatten cases, 17 getValue
cases) with independently-authored fixtures."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkcdc.flatten import flatten_df, flatten_fields, merge_fields_to_root, project_path

RECORD = {
    "id": "9001",
    "status": "open",
    "count": 7,
    "active": True,
    "score": 1.5,
    "missing_holder": None,
    "meta": {  # two levels
        "created": "2024-03-05T10:11:12.123+0000",
        "wrap": {"author": {"name": "ada", "id": "u1", "extra": "drop-me"}},  # 2-dot prefix → heuristic
        "audit": {"depth": {"nokeys": {"x": 1, "y": 2}}},  # deep, no heuristic keys
    },
    "labels": ["red", "blue"],  # primitive array → sentinel
    "comments": [  # array of all-objects → transpose
        {"author": "ada", "body": "first"},
        {"author": "bob", "body": "second"},
    ],
}


def _df(spark, record=RECORD):
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(record)]))


def test_flatten_names_and_heuristics(spark):
    df = _df(spark)
    fields = {f.name: f for f in flatten_fields(df.schema)}
    # primitives at root survive
    assert fields["id"].kind == "value" and fields["status"].kind == "value"
    # two-level recursion
    assert "meta.created" in fields
    # object at a 2-dot prefix with heuristic keys: only name/id children kept
    assert "meta.wrap.author.name" in fields and "meta.wrap.author.id" in fields
    assert "meta.wrap.author.extra" not in fields
    # deep object without heuristic keys → JSON string at its prefix
    assert fields["meta.audit.depth"].kind == "json"
    # primitive array → "String value" sentinel
    assert fields["labels"].kind == "sentinel"


def test_empty_object_kinds():
    # spark.read.json drops empty structs at inference; feed the schema
    # directly (the walker is pure metadata). Shallow {} stays a json
    # object; at 2-dot depth with no heuristic keys it stringifies to "{}".
    import pyspark.sql.types as T

    from sparkcdc.flatten import flatten_fields

    schema = T.StructType([
        T.StructField("shallow", T.StructType([])),
        T.StructField("a", T.StructType([
            T.StructField("b", T.StructType([
                T.StructField("c", T.StructType([])),
            ])),
        ])),
    ])
    fields = {f.name: f for f in flatten_fields(schema)}
    assert fields["shallow"].kind == "json"
    assert fields["a.b.c"].kind == "json" and isinstance(fields["a.b.c"].dtype, T.StringType)


def test_flatten_values(spark):
    row = flatten_df(_df(spark)).collect()[0].asDict()
    assert row["id"] == "9001" and row["count"] == 7 and row["active"] is True
    assert row["meta.wrap.author.name"] == "ada"
    assert row["labels"] == "String value"
    assert json.loads(row["meta.audit.depth"]) == {"nokeys": {"x": 1, "y": 2}}


def test_array_of_structs_transposes(spark):
    df = _df(spark)
    fields = {f.name: f for f in flatten_fields(df.schema)}
    # comments: array<struct<author,body>> → pseudo-object {author: [...], body: [...]}
    # whose children are primitive arrays → sentinel per key
    assert fields["comments.author"].kind == "sentinel"
    assert fields["comments.body"].kind == "sentinel"
    assert "comments" not in fields


def test_deep_transpose_with_heuristic_keys(spark):
    rec = {"a": {"b": {"c": [{"name": "n1", "z": 1}, {"name": "n2", "z": 2}]}}}
    df = _df(spark, rec)
    fields = {f.name: f for f in flatten_fields(df.schema)}
    # transposed pseudo-object sits at prefix a.b.c (2 dots) → heuristic:
    # keep only the name member (as an array)
    assert list(fields) == ["a.b.c.name"]
    row = flatten_df(df).collect()[0]
    assert row["a.b.c.name"] == ["n1", "n2"]


def test_getvalue_paths(spark):
    df = _df(spark)
    got = df.select(
        project_path(df, "status", "a"),
        project_path(df, "meta.created", "b"),
        project_path(df, "meta.wrap.author.name", "c"),
        project_path(df, "nope", "d"),                 # missing level 1
        project_path(df, "meta.nope.deeper", "e"),     # missing level 2
        project_path(df, "missing_holder", "f"),       # explicit null
        project_path(df, "comments.author", "g"),      # array mapping
        project_path(df, "labels", "h"),               # array passthrough
    ).collect()[0]
    assert got["a"] == "open"
    assert got["b"] == "2024-03-05T10:11:12.123+0000"
    assert got["c"] == "ada"
    assert got["d"] is None and got["e"] is None and got["f"] is None
    assert got["g"] == ["ada", "bob"]
    assert got["h"] == ["red", "blue"]


def test_getvalue_array_null_padding(spark):
    rec = {"arr": [{"only1": "v1"}, {"other": "v2"}]}
    df = _df(spark, rec)
    got = df.select(project_path(df, "arr.only1", "x")).collect()[0]
    # key absent in second element → null-padded, like the reference golden
    assert got["x"] == ["v1", None]


def test_fields_merge_to_root(spark):
    rec = {"id": "1", "key": "K-1", "fields": {"summary": "s", "points": 3}}
    df = merge_fields_to_root(_df(spark, rec))
    assert set(df.columns) == {"id", "key", "summary", "points"}
    row = df.collect()[0]
    assert row["summary"] == "s" and row["points"] == 3
    # no `fields` struct → no-op passthrough
    assert merge_fields_to_root(df).columns == df.columns
