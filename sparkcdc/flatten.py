"""Nested-JSON flatten + dot-path projection, as pure plan rewrites.

Re-expresses the reference's most intricate logic
(/root/reference/src/main/java/org/embulk/input/jira/Issue.java:28-142) as a
*static* walk over the DataFrame's StructType producing native column
expressions — metadata-only work at plan-build time, no UDF, fully inside
whole-stage codegen.

Contract (pinned by reference goldens issue_flatten_expected.json /
issue_get_expected.json):

dot-path getValue (Issue.java:28-57):
  * missing key or null at any step → NULL
  * a step landing on array<struct> maps over the array (null-padded)
  * empty arrays pass through; primitive array elements pass through
    unchanged when more path remains

flatten (Issue.java:68-120):
  * objects recurse, keys joined with '.'
  * depth cap: an object whose own prefix contains >1 dot collapses via the
    heuristic (Issue.java:73-76,122-142): emit only non-null name/key/id
    children, else the whole object as a JSON string
  * array of all-objects → transposed to struct-of-arrays and re-flattened
    at the same prefix (Issue.java:88-108)
  * any other array → the literal "String value" (type-guess sentinel,
    Issue.java:109-112) — feeds only the schema guesser
  * empty object kept as `{}` (json kind) at shallow depth

Divergence (documented): the reference decides array shape per *record* at
runtime; this walker decides per *schema*. On typed data the two agree; an
empty array<struct> instance transposes to empty per-key arrays instead of
the "String value" sentinel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEURISTIC_KEYS = ("name", "key", "id")


# ---------------- dot-path projection (getValue) ----------------

def resolve_path(schema: T.StructType, path: str) -> tuple[Column | None, T.DataType | None]:
    """Walk ``a.b.c`` through structs/arrays with reference semantics.
    Returns (expr, dtype); (None, None) when the path cannot exist →
    caller projects NULL (null-on-missing, Issue.java:36-38)."""
    expr: Column | None = None
    dt: T.DataType = schema
    for part in path.split("."):
        if isinstance(dt, T.StructType):
            match = next((f for f in dt.fields if f.name == part), None)
            if match is None:
                return None, None
            expr = F.col(f"`{part}`") if expr is None else expr.getField(part)
            dt = match.dataType
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            elem = dt.elementType
            match = next((f for f in elem.fields if f.name == part), None)
            if expr is None:
                return None, None
            if match is None:
                # key absent from every element → array of NULLs (Issue.java:44-54)
                expr = F.transform(expr, lambda x: F.lit(None).cast("string"))
                dt = T.ArrayType(T.StringType())
            else:
                expr = F.transform(expr, lambda x: x.getField(part))
                dt = T.ArrayType(match.dataType)
        elif isinstance(dt, T.ArrayType):
            # primitive elements pass through unchanged; key consumed (Issue.java:48-51)
            continue
        else:
            return None, None
    return expr, dt


def project_path(df: DataFrame, path: str, alias: str | None = None) -> Column:
    expr, _ = resolve_path(df.schema, path)
    return (expr if expr is not None else F.lit(None)).alias(alias or path)


# ---------------- flatten walker ----------------

@dataclass
class FlatField:
    name: str  # dotted path
    expr: Column
    dtype: T.DataType
    kind: str  # 'value' | 'json' | 'sentinel'


def _append(prefix: str, key: str) -> str:
    return key if not prefix else f"{prefix}.{key}"


def flatten_fields(schema: T.StructType) -> list[FlatField]:
    out: list[FlatField] = []

    def walk(dtype: T.DataType, expr: Column, prefix: str) -> None:
        if isinstance(dtype, T.StructType):
            fields = [(f.name, expr.getField(f.name) if prefix else F.col(f"`{f.name}`"), f.dataType)
                      for f in dtype.fields]
            walk_object(fields, expr, prefix)
        elif isinstance(dtype, T.ArrayType):
            elem = dtype.elementType
            if isinstance(elem, T.StructType) and elem.fields:
                # transpose array<struct> → pseudo-object of per-key arrays
                def _getter(name):
                    return lambda x: x.getField(name)

                fields = [
                    (f.name, F.transform(expr, _getter(f.name)), T.ArrayType(f.dataType))
                    for f in elem.fields
                ]
                obj = F.struct(*[e.alias(n) for n, e, _ in fields])
                walk_object(fields, obj, prefix)
            else:
                out.append(FlatField(prefix, F.lit("String value"), T.StringType(), "sentinel"))
        elif isinstance(dtype, T.NullType):
            out.append(FlatField(prefix, F.lit(None).cast("string"), T.NullType(), "value"))
        else:
            out.append(FlatField(prefix, expr, dtype, "value"))

    def walk_object(fields: list[tuple[str, Column, T.DataType]], obj_expr: Column, prefix: str) -> None:
        if prefix.count(".") > 1:
            heuristic = [(n, e, d) for n, e, d in fields
                         if n in HEURISTIC_KEYS and not isinstance(d, T.NullType)]
            if heuristic:
                for n, e, d in heuristic:
                    out.append(FlatField(_append(prefix, n), e, d, "value"))
            else:
                js = F.to_json(obj_expr) if fields else F.lit("{}")
                out.append(FlatField(prefix, js, T.StringType(), "json"))
            return
        if not fields:
            out.append(FlatField(prefix, F.lit("{}"), T.StructType([]), "json"))
            return
        for n, e, d in fields:
            walk(d, e, _append(prefix, n))

    walk(schema, F.lit(None), "")
    return out


def flatten_df(df: DataFrame) -> DataFrame:
    """Flattened view: one column per dotted leaf (guess-path analog of
    Issue.getFlatten)."""
    fields = flatten_fields(df.schema)
    return df.select(*[f.expr.alias(f.name) for f in fields])


def merge_fields_to_root(df: DataFrame, nested: str = "fields") -> DataFrame:
    """The reference's fields-merge normalizer (client/JiraClient.java:72-81):
    hoist every key of the `fields` struct to the root, drop the struct —
    Spark-native star expansion."""
    if nested not in df.columns:
        return df
    others = [c for c in df.columns if c != nested]
    return df.select(*others, F.col(f"{nested}.*"))
