"""D1/S7/S8 — deterministic multi-sink fan-out writes.

Reference: one Elasticsearch index per distinct route, docs routed row by
row with buffered bulk POSTs and infinite retry (``src/elastic.rs:76-154``,
``src/workerpool.rs:104-126``).  Spark-side replacements:

* the scalable shape: ONE pass, ``partitionBy(route)`` parquet/Iceberg
  write — every route lands in its own directory/partition in a single
  shuffle-free job (:func:`write_partitioned`);
* the exact-parity shape: per-route typed tables written in sorted route
  order (:func:`write_per_route`) — per-sink schemas differ per route just
  like per-index ES mappings (S8), so this is the shape a migration of the
  reference would expose to consumers;
* idempotent commit: parquet/Iceberg atomic job commit replaces the
  reference's retry-forever loop (``src/elastic.rs:124-151``); re-running a
  committed route is a no-op via the manifest check (plans.manifest).

At cluster scale ``write_partitioned`` is the default: no driver loop, AQE
coalesces output files, and per-partition stats become lineage rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, route_col: str = "route", mode: str = "overwrite"
) -> None:
    """Single-pass fan-out: directory per route under ``path``."""
    (
        df.write.mode(mode)
        .partitionBy(route_col)
        .parquet(path)
    )


def write_per_route(
    tables: dict[str, DataFrame], base: str, mode: str = "overwrite"
) -> dict[str, str]:
    """Write each route's typed table under ``base/<route>``; returns
    {route: path} in deterministic sorted order."""
    out: dict[str, str] = {}
    for route in sorted(tables):
        path = os.path.join(base, route)
        tables[route].write.mode(mode).parquet(path)
        out[route] = path
    return out


def route_counts(df: DataFrame, route_col: str = "route") -> DataFrame:
    """A5: rows per sink — the reference's implicit per-index doc count."""
    return df.groupBy(route_col).agg(F.count(F.lit(1)).alias("n_rows"))
