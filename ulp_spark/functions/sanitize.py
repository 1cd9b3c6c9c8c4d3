"""P8 — sink-name sanitization (reference ``src/elastic.rs:156-182``).

Order pinned from the reference: ASCII lowercase -> strip
``: " * + / \\ | ? # % > <`` -> spaces to ``_`` -> trim leading ``_``, then
leading ``.``, then leading ``-`` (three SEQUENTIAL trims, the Rust order:
``-_foo`` keeps ``_foo``, it does not strip the mixed run).  Lowercasing is
ASCII-only (``make_ascii_lowercase`` — non-ASCII bytes untouched), so
``É`` survives as-is rather than mapping to ``é``.  Pure Column expression
(and a DuckDB twin), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BAD = r'[:"*+/\\|?#%><]'
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def sanitize_sink_name(col: Column) -> Column:
    out = F.translate(col, _UPPER, _LOWER)  # ASCII-only lowercase
    out = F.regexp_replace(out, _BAD, "")
    out = F.regexp_replace(out, " ", "_")
    out = F.regexp_replace(out, "^_+", "")
    out = F.regexp_replace(out, r"^\.+", "")
    return F.regexp_replace(out, "^-+", "")


def sanitize_sink_name_sql(expr: str) -> str:
    """DuckDB twin of :func:`sanitize_sink_name`."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        "replace(regexp_replace("
        f"translate({expr}, '{_UPPER}', '{_LOWER}'), "
        "':|\"|\\*|\\+|/|\\\\|\\||\\?|#|%|>|<', '', 'g'), ' ', '_'), "
        "'^_+', ''), '^\\.+', ''), '^-+', '')"
    )
