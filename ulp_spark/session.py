"""SparkSession construction with scale-appropriate defaults.

The reference's parallelism knob is ``ULP_WORKERS_N`` (default 8 OS threads,
``src/workerpool.rs:19-29``).  Here the knob is the Spark master / executor
count; these defaults are what we'd set on a real 1000-executor cluster too
(AQE on, Arrow on, sane shuffle partitioning), minus the cluster-only bits
(dynamic allocation, external shuffle service) which are deploy-time configs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these would be overridden by deploy config; the *ratios* are what
# matter: shuffle partitions ~ 2-3x total cores, 128 MiB scan splits,
# broadcast threshold large enough for dimension tables (pattern_dict,
# route->schema map are KiB-sized).
_DEFAULTS = {
    # Let AQE re-plan at runtime: coalesce tiny shuffle partitions, split
    # skewed ones (the reference's "1 file = 1 task" skew has no such escape).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF (the vectorized parse/sniff path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp rendering regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Spark 4 routes lower()/upper() through ICU case mappings by default;
    # profiling showed CollationSupport$Lower.execBinaryICU dominating the
    # sniff battery (~5x the whole regex stack).  The reference's semantics
    # are to_ascii_lowercase, so JVM case mapping is both faster AND closer.
    "spark.sql.icu.caseMappings.enabled": "false",
    # Scan splits: 128 MiB keeps partitions memory-safe at any input size.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Dimension tables here are tiny; 64 MiB broadcast headroom.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "64",
    # Quieter logs in tests.
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def seam(df, eager: bool = False):
    """Materialization seam for a frame consumed by multiple downstream
    jobs (the pipeline's S5 seam, generalized — dedup/similarity band
    tables, shard assignment, anomaly stats all reuse it).

    Storage tier is chosen by session config (ADVICE r3): when the
    SparkContext has a CHECKPOINT DIR configured, use a reliable
    ``checkpoint`` — blocks live on the checkpoint filesystem and survive
    executor loss / dynamic-allocation deallocation, the right form on a
    real cluster.  Otherwise fall back to ``localCheckpoint`` — blocks
    live only in executor storage: fast and fine on local[] / static
    single-JVM runs (this sandbox), but executor loss makes the lineage
    unrecoverable, so cluster deployments should set
    ``sc.setCheckpointDir(...)`` (one line) to flip every seam in the
    repo to the durable path.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def get_spark(
    app_name: str = "ulp_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the bench harness can pin parallelism for the
    N-vs-4N-core scaling measurement.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
