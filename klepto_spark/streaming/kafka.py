"""Kafka-shaped streaming source/sink, routed through the DSN grammar.

``kafka://broker1:9092,broker2:9092/topic?startingOffsets=earliest``
maps onto Spark's Kafka connector options. The connector jar
(org.apache.spark:spark-sql-kafka-0-10) is NOT bundled with pyspark, so
everything here is gated: option construction and DSN routing are pure
and always testable; actually opening the stream requires the jar and
fails with a clear dependency error instead of Spark's opaque
DATA_SOURCE_NOT_FOUND.

Param passthrough: DSN query params become connector options verbatim
(``startingOffsets``, ``maxOffsetsPerTrigger``, ``kafka.*`` client
settings …), so operational tuning needs no code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from klepto_spark.sources.dsn import DSN, DSNError, parse

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
_JAR_HINT = ("Kafka connector jar not on the classpath — submit with "
             "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>")


def kafka_options(dsn: DSN) -> dict[str, str]:
    """Connector options for a kafka:// DSN (pure; no Spark needed)."""
    if dsn.type != "kafka":
        raise DSNError(f"not a kafka dsn: {dsn.type!r}")
    if not dsn.address:
        raise DSNError("kafka dsn needs bootstrap servers: "
                       "kafka://host:9092[,host2:9092]/topic")
    if not dsn.data_source:
        raise DSNError("kafka dsn needs a topic: kafka://host:9092/topic")
    opts = {"kafka.bootstrap.servers": dsn.address,
            "subscribe": dsn.data_source}
    opts.update(dsn.params)
    return opts


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._sc._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
        return True
    except Exception:  # noqa: BLE001 — absent jar surfaces as Py4J error
        return False


def read_kafka_stream(spark: SparkSession, dsn_str: str,
                      value_schema=None) -> DataFrame:
    """readStream over a kafka:// DSN.

    Returns the raw connector frame (key/value binary + topic, partition,
    offset, timestamp) unless ``value_schema`` is given, in which case the
    value is JSON-decoded into those columns plus the event ``timestamp``
    — the shape the events-pipeline operators expect."""
    dsn = parse(dsn_str)
    opts = kafka_options(dsn)
    if not kafka_available(spark):
        raise DSNError(_JAR_HINT)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema is None:
        return df
    return (df.select(F.from_json(F.col("value").cast("string"),
                                  value_schema).alias("v"),
                      F.col("timestamp").alias("_kafka_ts"))
            .select("v.*", "_kafka_ts"))


def run_to_kafka(stream_df: DataFrame, dsn_str: str, checkpoint: str,
                 available_now: bool = True):
    """writeStream into a kafka topic: rows are JSON-encoded into
    ``value`` (a ``key`` column, if present, is kept as the message key
    for partition affinity). Returns the StreamingQuery."""
    dsn = parse(dsn_str)
    opts = kafka_options(dsn)
    spark = stream_df.sparkSession
    if not kafka_available(spark):
        raise DSNError(_JAR_HINT)
    payload_cols = [c for c in stream_df.columns if c != "key"]
    out = stream_df.select(
        *([F.col("key").cast("string").alias("key")]
          if "key" in stream_df.columns else []),
        F.to_json(F.struct(*payload_cols)).alias("value"))
    writer = (out.writeStream.format("kafka")
              .option("kafka.bootstrap.servers",
                      opts["kafka.bootstrap.servers"])
              .option("topic", opts["subscribe"])
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
