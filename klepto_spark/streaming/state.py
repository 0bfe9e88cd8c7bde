"""Streaming state-store configuration.

The default HDFS-backed state store keeps every key's state on the
executor HEAP — fine for bounded aggregations, fatal for sessionize-class
operators at 100 TB/day where active-key state outgrows executor memory.
RocksDB (bundled with Spark since 3.2) spills state to local SSD and,
with changelog checkpointing, uploads only per-batch deltas instead of
full snapshots — both required for large stateful queries to survive.

These settings only take effect for queries STARTED after they are set;
a running query keeps the provider its checkpoint was created with.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = ("spark.sql.streaming.stateStore.rocksdb."
                   "changelogCheckpointing.enabled")


def use_rocksdb_state(spark: SparkSession, *,
                      changelog_checkpointing: bool = True,
                      bounded_memory_mb: int | None = None) -> None:
    """Route new streaming queries' state to RocksDB.

    ``changelog_checkpointing`` writes per-batch changelogs instead of
    full SST snapshots — checkpoint cost proportional to updated keys,
    not total state. ``bounded_memory_mb`` caps RocksDB block-cache +
    memtable memory across all state store instances on an executor
    (otherwise each instance sizes independently and N instances × cache
    can overrun the container)."""
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_CONF,
                   "true" if changelog_checkpointing else "false")
    if bounded_memory_mb is not None:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
            "true")
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "maxMemoryUsageMB", str(int(bounded_memory_mb)))


def use_default_state(spark: SparkSession) -> None:
    """Back to the heap-backed HDFS provider (small-state queries)."""
    spark.conf.unset(_PROVIDER_CONF)
    spark.conf.unset(_CHANGELOG_CONF)
