"""P7@record-level + J1 — cast parsed records to their route's merged schema.

Reference: the ingest phase re-reads each NDJSON record, looks up its
route's type map and recursively casts (``src/elastic.rs:76-99`` ->
``Mapping::cast_json`` ``src/type_map.rs:174-198``), erroring the record on
the first bad field (``type_casting/src/lib.rs:389-397``).

Here the route->schema dict (A2 output, driver-side, KiB) is *compiled into
the plan*: for every field, a ``when(route == r, cast_to(type_r))`` cascade
— the broadcast lookup becomes literal expressions, zero joins, zero
Python.  Two shapes:

* :func:`cast_single_pass` — one DataFrame for all routes; casted values
  carried in canonical string form + per-row ``cast_error``.  Used for
  counting/parity and for a single ``partitionBy(route)`` fan-out write.
* :func:`cast_per_route` — one *typed* DataFrame per route (int fields are
  longs, bools are booleans...), the exact per-sink schema the reference
  PUTs as an index mapping (S8).  Driver loops routes in sorted order
  (the reference's BTreeMap iteration, ``src/workerpool.rs:104``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ulp_spark.functions import casts, sniff


def _repr_str(value: Column, rcode: Column, target: int, helpers) -> tuple[Column, Column]:
    """Casted value rendered canonically as a string (parity form)."""
    val, err = casts.cast_field(value, rcode, target, **helpers)
    if target == sniff.BOOL:
        return F.when(val, "true").otherwise("false"), err
    if target in (sniff.INT, sniff.FLOAT):
        return val.cast("string"), err
    return val, err


def schema_dim(
    spark, route_schemas: dict[str, dict[str, int]], fields: list[str],
    route_col: str = "route",
) -> DataFrame:
    """Route -> per-field target-type dimension (KiB), the J1 broadcast dim.

    This is literally the reference's ``index_pattern_mappings`` BTreeMap
    shipped as a table (``src/type_map.rs:90-98``)."""
    rows = [
        tuple([r] + [route_schemas[r].get(f) for f in fields])
        for r in sorted(route_schemas)
    ]
    ddl = f"{route_col} string, " + ", ".join(f"{f}__target int" for f in fields)
    return spark.createDataFrame(rows, ddl)


def cast_single_pass(
    df: DataFrame,
    route_schemas: dict[str, dict[str, int]],
    fields: list[str],
    route_col: str = "route",
) -> DataFrame:
    """All routes in one pass; adds ``<f>__cast`` string columns +
    ``cast_error``.  Rows whose route is absent from the schema dict get
    ``cast_error = true`` (the reference's unseen-route error,
    ``src/type_map.rs:193-196``).

    Plan shape (matters at every scale):
    * the route->schema map joins in as a BROADCAST DIM (J1), so the per-row
      lookup is a hash probe, not a |routes|-deep when-cascade;
    * casts branch over the DISTINCT TARGET TYPES a field takes across all
      routes (<= 8, usually 1-2), keyed by the joined ``<f>__target`` code;
    * shared str_int/str_bool/str_float helpers are computed once per field.
    A naive per-route expression cascade is O(fields x routes x |helpers|)
    after optimizer inlining — observed to wedge Catalyst and OOM the JVM.
    """
    spark = df.sparkSession
    from pyspark.sql.functions import broadcast

    dim = schema_dim(spark, route_schemas, fields, route_col)
    # Helper columns (str_int/str_bool/str_float regex batteries) only for
    # fields whose target set can READ them: NULL/IPV4/IPV6/DATE casts
    # never touch iv/bv/fv (cast_field embeds helpers per target branch),
    # so e.g. a DATE-only field — typically the timestamp, whose
    # digit-leading values pay the full numeric battery — skips all three
    # eager columns.  Identical outputs: unused columns never reached the
    # plan's cast branches anyway (r6; guide §2.3 "don't compute what you
    # throw away").
    _HELPER_TARGETS = {sniff.BOOL, sniff.INT, sniff.FLOAT, sniff.STR}
    field_targets = {
        f: sorted({s[f] for s in route_schemas.values()
                   if s.get(f) is not None})
        for f in fields
    }
    helper_fields = [f for f in fields
                     if _HELPER_TARGETS & set(field_targets[f])]
    staged = (
        df.join(broadcast(dim.withColumn("__known", F.lit(True))),
                on=route_col, how="left")
        .select("*", *[c for f in helper_fields
                       for c in casts.helper_columns(f)])
    )
    err_any = F.coalesce(F.col("__known"), F.lit(False)) == F.lit(False)
    out_cols: list[Column] = []
    for f in fields:
        value, rcode = F.col(f), F.col(f"{f}__r")
        # the parse stage's sniff verdict rides along so the DATE cast can
        # test it instead of re-running the calendar regex per row
        # (casts.cast_field docstring proves the predicate equivalence);
        # frames without a __t column (not the pipeline shape) keep the
        # regex path
        sc_col = F.col(f"{f}__t") if f"{f}__t" in df.columns else None
        if f in helper_fields:
            helpers = dict(iv=F.col(f"{f}__iv"), bv=F.col(f"{f}__bv"),
                           fv=F.col(f"{f}__fv"), sniff_code=sc_col)
        else:
            helpers = dict(iv=None, bv=None, fv=None, sniff_code=sc_col)
        tcol = F.col(f"{f}__target")
        targets = field_targets[f]
        casted = F.lit(None).cast("string")
        for t in targets:
            v, e = _repr_str(value, rcode, t, helpers)
            casted = F.when(tcol == t, v).otherwise(casted)
            # coalesce guards three-valued logic: when this route's schema
            # omits the field, tcol is NULL and (NULL == t) & TRUE is NULL —
            # which would turn cast_error itself NULL (a row that BOTH
            # filter(err) and filter(~err) drop).  Absent field = no cast =
            # no error, i.e. false.
            err_any = err_any | F.coalesce((tcol == t) & e, F.lit(False))
        out_cols.append(casted.alias(f"{f}__cast"))
    drop_cols = [f"{f}__{s}" for f in fields for s in ("iv", "bv", "fv", "target")]
    drop_cols.append("__known")
    return (
        staged.select("*", *out_cols)
        .withColumn("cast_error", err_any)
        .drop(*drop_cols)
    )


_NATIVE = {
    sniff.NULL: "string", sniff.BOOL: "boolean", sniff.INT: "bigint",
    sniff.FLOAT: "double", sniff.IPV4: "string", sniff.IPV6: "string",
    sniff.DATE: "string", sniff.STR: "string",
}


def cast_per_route(
    df: DataFrame,
    route_schemas: dict[str, dict[str, int]],
    fields: list[str],
    route_col: str = "route",
    keep: list[str] | None = None,
    materialize: bool = True,
) -> dict[str, DataFrame]:
    """Sorted {route: typed DataFrame} — each with its own native schema.

    ``materialize`` (default on) puts a :func:`ulp_spark.session.seam`
    between the input and the per-route loop — REQUIRED for an
    unmaterialized parse derivation.  This is the same fan-out shape as
    ``manifest.resume_fanout``: each route's ``filter(route == r)`` is
    pushed through every projection below it, substituting the full
    derivation into the filter, and the resulting whole-stage-codegen
    class blows Janino's 64 KB method limit (observed again in round 4
    after the guarded replace-parse widened the tree: ONE route's collect
    took 490 s with ``CodeGenerator: Failed to compile`` fallbacks; with
    the seam the whole map collects in seconds).  Callers whose input is
    already materialized (cache/checkpoint/table read) can pass False.
    """
    if materialize:
        from ulp_spark.session import seam

        df = seam(df)
    out: dict[str, DataFrame] = {}
    for r in sorted(route_schemas):
        schema = route_schemas[r]
        part = df.filter(F.col(route_col) == r).select(
            "*", *[c for f in fields for c in casts.helper_columns(f)]
        )
        cols: list[Column] = [F.col(c) for c in (keep or [])]
        err = F.lit(False)
        for f in fields:
            target = schema.get(f)
            if target is None:
                continue
            v, e = casts.cast_field(
                F.col(f), F.col(f"{f}__r"), target,
                iv=F.col(f"{f}__iv"), bv=F.col(f"{f}__bv"), fv=F.col(f"{f}__fv"),
                sniff_code=(F.col(f"{f}__t")
                            if f"{f}__t" in df.columns else None),
            )
            cols.append(v.cast(_NATIVE[target]).alias(f))
            err = err | e
        out[r] = part.select(*cols, err.alias("cast_error"))
    return out


def spark_schema_ddl(schema: dict[str, int]) -> str:
    """S8 analog: route type-map -> DDL column list (reference
    ``src/elastic.rs:38-66`` translates Types -> ES mapping JSON)."""
    return ", ".join(f"{f} {_NATIVE[c].upper()}" for f, c in sorted(schema.items()))
