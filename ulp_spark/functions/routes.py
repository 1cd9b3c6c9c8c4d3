"""P4/P5 — route templates: compile once on the driver, evaluate as a single
``concat`` Column expression per row.

Reference: ``IndexPatternObject::from(&str)`` splits ``"lit_{{path}}_lit"``
into (part, eval) pieces (``src/type_map.rs:14-35``);
``generate_index_pattern`` evaluates them per record (``src/type_map.rs:37-62``)
with these semantics, all replicated here:

* missing key            -> ``"NONE"``
* array value            -> ``"ARRAY"``
* object value           -> ``"OBJECT"``
* string value           -> itself
* non-string scalar (number/bool/null) -> appends **nothing** (the
  silent-empty quirk, ``src/type_map.rs:49-53`` — only ``as_str()`` is used)

In this engine a parsed record is a struct of extracted string fields plus
their sniffed type codes (the JSON-typed view: the reference's EVTX parser
emits typed JSON, so a field whose content sniffs numeric corresponds to a
JSON number there).  ``field_part`` therefore keys off the sniffed code.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ulp_spark.functions import sniff

_TOKEN = re.compile(r"\{\{(.+?)\}\}")


def split_template(template: str) -> list[tuple[str, bool]]:
    """``"a_{{x}}_b"`` -> ``[("a_", False), ("x", True), ("_b", False)]``."""
    parts: list[tuple[str, bool]] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append((template[pos:m.start()], False))
        parts.append((m.group(1), True))
        pos = m.end()
    if pos < len(template):
        parts.append((template[pos:], False))
    return parts


def field_part(value: Column, type_code: Column) -> Column:
    """Route contribution of one extracted field (P5 semantics).

    Evaluates on the MATERIALIZED JSON runtime type: IPv4/IPv6/Date-sniffed
    values are runtime strings (``as_str()`` succeeds in the reference), so
    they route as themselves; only true non-string scalars append nothing.
    Non-finite Float sniffs ("inf", "1e999") can never be JSON numbers —
    the reference holds ``Value::String("inf")``, ``as_str()`` succeeds,
    and the record routes as the text (the same materialized-runtime rule
    the cast stage already uses; plain runtime_code here silently-emptied
    them — wrong sink).
    """
    rcode = sniff.materialized_runtime_code(value, type_code)
    return (
        F.when(value.isNull(), F.lit("NONE"))
        .when(rcode == sniff.STR, value)
        .otherwise(F.lit(""))  # numeric/bool/null scalars: silent empty
    )


def compile_template(template: str, fields: dict[str, tuple[Column, Column]]) -> Column:
    """Compile a route template into one Column.

    ``fields`` maps field name -> (value column, sniffed type-code column).
    Unknown field names evaluate as missing (-> "NONE"), matching the
    reference's get_value miss (``src/type_map.rs:44-46``).
    """
    cols: list[Column] = []
    for text, is_eval in split_template(template):
        if not is_eval:
            cols.append(F.lit(text))
        elif text in fields:
            value, code = fields[text]
            cols.append(field_part(value, code))
        else:
            cols.append(F.lit("NONE"))
    return F.concat(*cols) if cols else F.lit("")


def field_part_sql(value_expr: str, code_expr: str) -> str:
    """DuckDB twin of :func:`field_part` (incl. the non-finite-Float ->
    runtime-string rule)."""
    return f"""
    CASE
      WHEN {value_expr} IS NULL THEN 'NONE'
      WHEN ({code_expr}) IN ({sniff.STR}, {sniff.IPV4}, {sniff.IPV6}, {sniff.DATE})
        THEN {value_expr}
      WHEN ({code_expr}) = {sniff.FLOAT}
           AND NOT (regexp_matches({value_expr}, '{sniff.RE_FLOAT}')
                    AND isfinite(try_cast({value_expr} AS DOUBLE)))
        THEN {value_expr}
      ELSE ''
    END
    """
