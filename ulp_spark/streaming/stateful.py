"""Custom stateful streaming operator: cross-batch first-wins dedup.

The reference has no record streaming (SURVEY §2.6); this is the
Spark-native capability its always-on ingest API gestures at: a stream of
records where a doc_id must be emitted exactly once across ALL micro-
batches, not just within one.  Built on ``applyInPandasWithState`` —
per-group state (the set digest of seen ids) lives in the state store,
checkpointed with the query, so a restart resumes without re-emitting.

Scale shape: state is keyed by a BUCKET of the id space (``pmod(hash(id),
n_buckets)``), not by the id itself — state-store entries stay bounded and
each group's state is one compact set; the stream shuffles once on the
bucket key.  At 10^12 ids the per-bucket set becomes a Bloom/HLL sketch —
swap inside ``_dedup_group`` only.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id string, route string"
STATE_SCHEMA = "seen array<string>"
N_BUCKETS = 64


def _dedup_group(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_routes = [], []
    for pdf in pdfs:
        for doc_id, route in zip(pdf["doc_id"], pdf["route"]):
            if doc_id not in seen:
                seen.add(doc_id)
                out_ids.append(doc_id)
                out_routes.append(route)
    state.update((sorted(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "route": out_routes})


def dedup_stream(routed: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Exactly-once doc_id emission across micro-batches (first wins)."""
    bucketed = routed.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    )
    return (
        bucketed.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_group, OUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout,
        )
    )
