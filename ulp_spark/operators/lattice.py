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


def json_field_schema_sql(table: str, json_col: str) -> str:
    """DuckDB twin of :func:`json_field_schema` (this DuckDB build has no
    ``json_each`` TVF: keys come from ``json_keys`` + unnest, per-key values
    from ``json_extract``; a JSON null extracts to SQL NULL, whose untyped
    path lands on the NULL code in both engines)."""
    from ulp_spark.functions import sniff as _sniff

    code = _sniff.json_runtime_code_sql("json_type(jval)", "jval")
    mask = f"bit_or(1::BIGINT << ({code}))"
    return f"""
    WITH kv AS (
      SELECT unnest(json_keys({json_col})) AS field, {json_col} AS j
      FROM {table} WHERE json_valid({json_col})
    ),
    vals AS (
      SELECT field, json_extract(j, '$."' || field || '"') AS jval FROM kv
    )
    SELECT field,
           CAST({_sniff.resolve_mask_sql(mask)} AS INTEGER) AS type_code,
           count(*)::BIGINT AS n_values
    FROM vals GROUP BY field
    """


def json_tree_schema(df: DataFrame, json_col: str):
    """A1 full-tree: recursive type-tree inference over a JSON string column.

    The distributed shape of the reference's mutex-guarded global fold
    (``Mapping::map_json``, ``src/type_map.rs:156-161``) for arbitrarily
    nested records: each Arrow batch folds its records into one partial
    tree (pure Python, but O(batches) not O(rows) in transfer), the driver
    merges the per-batch partials — the ``treeAggregate`` shape.  The
    lattice is the canonical commutative one, so batch/partition boundaries
    cannot change the result.

    Returns an ``ulp_spark.oracle`` Tree.  Malformed JSON rows are skipped
    (they belong to the quarantine path).
    """
    import json as _json

    import pandas as _pd

    from ulp_spark import oracle as _oracle
    from ulp_spark.functions import sniff as _sniff

    def partials(batches):
        acc = _sniff.NULL
        n = 0
        for pdf in batches:
            for s in pdf[json_col]:
                if s is None:
                    continue
                try:
                    v = _json.loads(s)
                except ValueError:
                    continue
                acc = _oracle.merge_tree(acc, _oracle.get_type(v))
                n += 1
        yield _pd.DataFrame({"tree": [_json.dumps(_oracle.encode_tree(acc))],
                             "n_rows": [n]})

    rows = df.select(json_col).mapInPandas(partials, "tree string, n_rows long").collect()
    final = _sniff.NULL
    for r in rows:
        final = _oracle.merge_tree(final, _oracle.decode_tree(_json.loads(r.tree)))
    return final


def tree_to_spark_type(tree):
    """Type tree -> Spark DataType (SURVEY §1.1 mapping).

    Scalars map to native types (IP/Date stay strings — the reference emits
    normalized strings); Object -> StructType (sorted keys, BTreeMap order);
    List -> ArrayType(elem) when all positions agree, else
    ArrayType(String): JSON arrays can only materialize as Spark arrays
    (from_json marks a struct-typed array corrupt), so heterogeneous lists
    carry raw strings and the tree's positional codes drive per-position
    casts downstream (element_at + casts.cast_field) — same reference
    semantics (positional per-index typing), applied one step later."""
    from pyspark.sql import types as T

    from ulp_spark.functions import sniff as _sniff

    _native = {
        _sniff.NULL: T.StringType(), _sniff.BOOL: T.BooleanType(),
        _sniff.INT: T.LongType(), _sniff.FLOAT: T.DoubleType(),
        _sniff.IPV4: T.StringType(), _sniff.IPV6: T.StringType(),
        _sniff.DATE: T.StringType(), _sniff.STR: T.StringType(),
    }
    if isinstance(tree, int):
        return _native[tree]
    if tree["kind"] == _sniff.OBJECT:
        return T.StructType([
            T.StructField(k, tree_to_spark_type(v), True)
            for k, v in sorted(tree["children"].items())
        ])
    children = [tree["children"][i] for i in sorted(tree["children"])]
    if children and all(c == children[0] for c in children):
        return T.ArrayType(tree_to_spark_type(children[0]), True)
    return T.ArrayType(T.StringType(), True)


def json_runtime_code(variant_value) -> "F.Column":
    """JSON *runtime* type code of a VARIANT value (``Types::get_type``,
    ``type_casting/src/types.rs:29-57``): numbers/bools/null map DIRECTLY to
    INT/FLOAT/BOOL/NULL — they are never re-stringified and sniffed (JSON
    number ``0`` is Int, not the ``"0"``-string Null quirk; ``1`` is Int,
    not Bool).  Only actual JSON strings run the content battery.  Variant
    preserves quotedness, which ``from_json(map<string,string>)`` destroyed
    (the round-1 bias this replaces)."""
    st = F.schema_of_variant(variant_value)
    content = variant_value.cast("string")
    # serde_json Number rule (the reference's runtime): Int iff the value
    # fits i64 OR u64, else f64 -> Float.  Spark variant types u64-range
    # integers as DECIMAL(p,0), so a scale-0 decimal is Int exactly when
    # the VALUE lies in [i64::MIN, u64::MAX] — mirrors DuckDB's
    # BIGINT/UBIGINT/DOUBLE split at the same boundaries (verified).
    is_dec0 = st.rlike(r"^DECIMAL\([0-9]+,0\)$")
    dv = F.try_variant_get(variant_value, "$", "decimal(38,0)")
    in_serde_int_range = (
        (dv >= F.lit("-9223372036854775808").cast("decimal(38,0)"))
        & (dv <= F.lit("18446744073709551615").cast("decimal(38,0)"))
    )
    return (
        F.when(st == "VOID", F.lit(sniff.NULL))
        .when(st == "BOOLEAN", F.lit(sniff.BOOL))
        .when(st.isin("BIGINT", "INT", "SMALLINT", "TINYINT"), F.lit(sniff.INT))
        .when(is_dec0 & in_serde_int_range, F.lit(sniff.INT))
        .when(st.isin("DOUBLE", "FLOAT") | st.startswith("DECIMAL"),
              F.lit(sniff.FLOAT))
        .when(st.startswith("ARRAY"), F.lit(sniff.LIST))
        .when(st.startswith("OBJECT") | st.startswith("STRUCT"),
              F.lit(sniff.OBJECT))
        .otherwise(sniff.sniff_code(content))
    )


def json_field_schema(df: DataFrame, json_col: str, key_cols: list[str] | None = None
                      ) -> DataFrame:
    """Dynamic per-key schema of a JSON-object string column.

    Output: (*key_cols, field, type_code, n_values).  The recursive-merge
    analog for one nesting level.  Values are exploded as VARIANT so JSON
    runtime types survive (see :func:`json_runtime_code`); nested
    containers fold in as LIST/OBJECT codes (a container mixed with any
    scalar canonicalizes to Str — the full-tree merge quirks live in
    :func:`json_tree_schema`).  Malformed JSON rows parse to null variants
    and contribute no key/value pairs (quarantine path).
    """
    keys = key_cols or []
    sel = "".join(f"src.{k}, " for k in keys)
    # table-qualified: the source frame may itself carry `key`/`value` cols.
    # `ve.key IS NOT NULL` drops top-level-ARRAY payloads (variant_explode
    # emits their elements with a null key; json_keys on the DuckDB side
    # enumerates nothing for them) — this is an OBJECT-column operator and
    # non-object payloads contribute no fields, same as malformed rows.
    kv = df.sparkSession.sql(
        f"SELECT {sel}ve.key AS field, ve.value AS __variant FROM {{df}} src, "
        f"LATERAL variant_explode(try_parse_json(src.{json_col})) ve "
        f"WHERE ve.key IS NOT NULL",
        df=df,
    ).withColumnRenamed("__variant", "value")
    bits = F.array(*[F.lit(b) for b in sniff.BIT])
    mask = F.element_at(bits, json_runtime_code(F.col("value")) + 1)
    return (
        kv.groupBy(*keys, "field")
        .agg(
            F.bit_or(mask).alias("mask"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select(*keys, "field", sniff.resolve_mask(F.col("mask")).alias("type_code"),
                "n_values")
    )
