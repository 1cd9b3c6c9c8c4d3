"""J1/J2 — broadcast-hash-join enrichment.

Reference: two per-row dictionary lookups — route -> type-map
(``src/type_map.rs:184-192``) and parser -> default route template
(``src/lib.rs:48-56``).  Both become broadcast hash joins against small
dimension DataFrames: Catalyst keeps the probe side streaming (no shuffle
of the fact table), which is the only join shape this pipeline ever needs
at 10^12 rows — the dimensions are KiB-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast-join ``dim`` onto ``fact``.

    ``how='left'`` keeps unmatched fact rows (unseen key -> NULL payload —
    the reference *errors* on an unseen route, ``src/type_map.rs:193-196``;
    callers surface that as an error/quarantine column instead of dying).
    """
    return fact.join(broadcast(dim), on=on, how=how)


def with_match_flag(
    fact: DataFrame, dim: DataFrame, on: str, flag: str = "enrich_miss"
) -> DataFrame:
    """Enrich + a boolean column marking keys absent from the dimension."""
    probe = dim.select(F.col(on), F.lit(True).alias("__hit"))
    out = fact.join(broadcast(probe), on=on, how="left")
    return out.withColumn(flag, F.col("__hit").isNull()).drop("__hit")
