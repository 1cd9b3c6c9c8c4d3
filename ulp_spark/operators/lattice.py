"""A1/A2 — distributed schema inference (the type-lattice fold).

Reference: every worker thread folds each record into a global ``Mapping``
under a mutex taken PER RECORD (``src/evtx.rs:55-64``, ``src/job.rs:16``) —
the pipeline's single biggest bottleneck.  Here the fold is a plain
Catalyst aggregation with no shared state:

    per-row sniff mask (1 << type_code)            -- map side, codegen
    -> partial bit_or per partition                -- map-side combine
    -> final bit_or (+ groupBy(route) for A2)      -- one tiny shuffle
    -> resolve_mask to a type code                 -- constant-time

bit_or is associative and commutative, so partial aggregation is exact —
this is why the lattice had to be canonicalized (functions.sniff docstring).
Output rows are one per (route ×) field: KiB-sized at any input scale, so
collecting to the driver / re-broadcasting for the cast stage is free.

Nested records: ``json_field_schema`` infers per-key types inside a JSON
object column by exploding key/value pairs first — the flat analog of the
reference's recursive ``Object⊔Object`` merge (``type_casting/src/
lib.rs:27-45``); list indices would map the same way with ``posexplode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ulp_spark.functions import sniff


def field_masks(df: DataFrame, fields: list[str]) -> list:
    """bit_or aggregates per field; reuses parse-stage ``<f>__t`` sniff codes
    when present (one regex battery per value, total — not one per stage)."""
    bits = F.array(*[F.lit(b) for b in sniff.BIT[:8]])
    aggs = []
    for f in fields:
        if f"{f}__t" in df.columns:
            mask = F.element_at(bits, F.col(f"{f}__t") + 1)
        else:
            mask = sniff.sniff_mask(F.col(f))
        aggs.append(F.bit_or(mask).alias(f))
    return aggs


def global_schema(df: DataFrame, fields: list[str]) -> dict[str, int]:
    """A1: merged type code per field over the whole frame (driver dict)."""
    row = df.agg(*field_masks(df, fields)).collect()[0]
    return {f: sniff.resolve_mask_py(row[f]) for f in fields}


def route_schemas(df: DataFrame, fields: list[str], route_col: str = "route"
                  ) -> dict[str, dict[str, int]]:
    """A2: per-route merged schema (reference ``src/type_map.rs:162-172``).

    One groupBy over the already-parsed frame; result is |routes| rows —
    collected to a driver dict that the cast stage compiles into
    expressions (the re-broadcast of J1 happens inside those literals).
    """
    rows = df.groupBy(route_col).agg(*field_masks(df, fields)).collect()
    return {
        r[route_col]: {f: sniff.resolve_mask_py(r[f]) for f in fields if r[f] is not None}
        for r in rows
    }


def route_schema_frame(df: DataFrame, fields: list[str], route_col: str = "route"
                       ) -> DataFrame:
    """A2 as a DataFrame (route, field, type_code) — oracle-comparable."""
    masks = df.groupBy(route_col).agg(*field_masks(df, fields))
    pairs = F.array(*[
        F.struct(F.lit(f).alias("field"),
                 sniff.resolve_mask(F.col(f)).alias("type_code"))
        for f in fields
    ])
    return (
        masks.select(route_col, F.explode(pairs).alias("kv"))
        .select(route_col, "kv.field", "kv.type_code")
    )


def json_field_schema(df: DataFrame, json_col: str, key_cols: list[str] | None = None
                      ) -> DataFrame:
    """Dynamic per-key schema of a JSON-object string column.

    Output: (*key_cols, field, type_code, n_values).  The recursive-merge
    analog for one nesting level; values are re-serialized scalars so the
    sniff battery sees exactly what the reference's ``Types::get_type``
    saw (JSON numbers/bools print canonically).
    """
    keys = key_cols or []
    kv = df.select(
        *keys,
        F.explode(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("field", "value"),
    )
    return (
        kv.groupBy(*keys, "field")
        .agg(
            F.bit_or(sniff.sniff_mask(F.col("value"))).alias("mask"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select(*keys, "field", sniff.resolve_mask(F.col("mask")).alias("type_code"),
                "n_values")
    )
