"""P8 — sink-name sanitization (reference ``src/elastic.rs:156-182``).

Order pinned from the reference: lowercase -> strip ``: " * + / \\ | ? # % > <``
-> spaces to ``_`` -> trim leading ``_ . -``.  Pure Column expression
(and a DuckDB twin), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BAD = r'[:"*+/\\|?#%><]'
_LEAD = r"^[_.\-]+"


def sanitize_sink_name(col: Column) -> Column:
    out = F.lower(col)
    out = F.regexp_replace(out, _BAD, "")
    out = F.regexp_replace(out, " ", "_")
    return F.regexp_replace(out, _LEAD, "")


def sanitize_sink_name_sql(expr: str) -> str:
    """DuckDB twin of :func:`sanitize_sink_name`."""
    return (
        "regexp_replace(replace(regexp_replace(lower(" + expr + "), "
        "':|\"|\\*|\\+|/|\\\\|\\||\\?|#|%|>|<', '', 'g'), ' ', '_'), "
        "'^[_.-]+', '')"
    )
