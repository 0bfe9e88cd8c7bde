"""SparkSession factory tuned for the engine.

Local testing uses local[N]; the config posture is what we would ship on a
1000-executor cluster against ~100 TB: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), broadcast threshold explicit, Arrow enabled
for the few pandas-UDF paths (multimodal decode), shuffle partitions sized for
the local harness but overridable per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones. At 100 TB these matter more than any static tuning.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/customer-at-small-SF) broadcast; the
    # 10 MB default is conservative — 64 MB is safe with 4 GB+ executors.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for pandas UDF / toPandas paths (multimodal, ANN rerank).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local harness size; on a real cluster set ~2-3x total cores.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "16"),
    # Shuffle/spill on tmpfs: in this (virtualised) test environment the
    # disk-backed local dir produced 70-99% SYSTEM cpu during shuffle-heavy
    # stages (kernel fs churn), inflating small-stage wall time 10-40x.
    # On a real cluster use fast local SSDs instead.
    "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                                      "/dev/shm/spark-local"),
    # Keep parquet scans splittable and pruning-friendly.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS), which the Spark
    # vectorized reader rejects; read as long and rebuild in the loader
    # (sources/catalog.py normalises back to TimestampType).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Event time is normalised to TIMESTAMP (ltz) for watermarking; pin the
    # session zone so the NTZ->TIMESTAMP rebuild is deterministic on any
    # host instead of inheriting the machine's local zone.
    "spark.sql.session.timeZone": "UTC",
    # NOTE on string literals: Spark's default lexer backslash-escapes
    # inside '...' while DuckDB follows ANSI (backslash is plain). Portable
    # literal text therefore never embeds raw backslashes/control chars —
    # klepto_spark.functions.portable.s() splices them via chr(n), which
    # both engines evaluate identically (found by hypothesis in
    # tests/test_portable_properties.py). Quote-doubling '' works in both.
    # Managed-table warehouse (bucketed tables) on tmpfs like local.dir.
    "spark.sql.warehouse.dir": os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR",
                                              "/dev/shm/spark-warehouse"),
    # Interleave the orchestrator's concurrent per-table jobs (engine.py X1)
    # instead of FIFO head-of-line blocking.
    "spark.scheduler.mode": "FAIR",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


# non-empty once the zone-override warning has fired (warn once, not per load)
_WARNED_ZONE_OVERRIDE: list[str] = []


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Make event-time parquet readable/watermarkable in ANY session.

    The driver (and any embedding application) constructs its own
    SparkSession without our builder defaults, so the loaders set these
    runtime-settable confs immediately before reading. Without nanosAsLong,
    Spark rejects INT64 TIMESTAMP(NANOS) parquet columns outright
    (PARQUET_TYPE_ILLEGAL); without a pinned zone, the NTZ->TIMESTAMP
    rebuild in :func:`normalise_nanos_ts` would depend on the host zone.

    NOTE: the zone pin is a GLOBAL session-conf mutation, deliberate and
    visible — event-time columns this engine emits are UTC instants, and
    collection/formatting of them must agree with the UTC-based oracles
    regardless of the embedding session's previous zone. An application
    that needs a different display zone for its own data should set
    ``spark.sql.session.timeZone`` back after the load; a one-time warning
    flags the overwrite so the change is never silent (restoring the zone
    eagerly here would be wrong — the engine's DataFrames are lazy, and
    collection/formatting happens after this call returns)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    prev = spark.conf.get("spark.sql.session.timeZone", None)
    if prev not in (None, "UTC", "Etc/UTC") and not _WARNED_ZONE_OVERRIDE:
        import warnings
        warnings.warn(
            f"klepto_spark pins spark.sql.session.timeZone=UTC for "
            f"deterministic event-time handling (was {prev!r}); set it back "
            f"after the load if your application needs {prev!r} for display",
            stacklevel=2)
        _WARNED_ZONE_OVERRIDE.append(prev)
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalise_nanos_ts(df, column: str = "ts"):
    """Rebuild the event-time column into a watermarkable TimestampType.

    Handles both on-disk shapes the testdata has shipped:

    - INT64 TIMESTAMP(NANOS), surfaced as ``bigint`` under the nanosAsLong
      conf: integer division (`div`) keeps the arithmetic in BIGINT — float
      division loses precision above 2^53, which rounds ~2024-era nano
      epochs and lands the truncating cast 1µs low on ~2% of rows.
    - microsecond TIMESTAMP_NTZ (Spark 4's default read of
      isAdjustedToUTC=false parquet): cast to TIMESTAMP under the pinned
      UTC session zone (see :func:`ensure_nanos_conf`) — the wall clock is
      preserved exactly and ``withWatermark`` accepts the column.
    """
    from pyspark.sql import functions as F
    for field in df.schema.fields:
        if field.name != column:
            continue
        kind = field.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn(
                column, F.timestamp_micros(F.expr(f"`{column}` div 1000")))
        elif kind == "timestamp_ntz":
            df = df.withColumn(column, F.col(column).cast("timestamp"))
    return df


def get_spark(app_name: str = "klepto_spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to local[$SPARK_GRAFT_CPUS]."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    # comma-separated extra jars (e.g. mysql/postgres JDBC drivers for the
    # real-database e2e suite — see docker-compose.test.yml)
    extra_jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS")
    if extra_jars:
        conf["spark.jars"] = extra_jars
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
