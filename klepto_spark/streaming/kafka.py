"""Kafka-shaped streaming source/sink, routed through the DSN grammar.

``kafka://broker1:9092,broker2:9092/topic?startingOffsets=earliest``
maps onto Spark's Kafka connector options. The connector jar
(org.apache.spark:spark-sql-kafka-0-10) is NOT bundled with pyspark, so
the pieces are factored by what they need:

- :func:`kafka_options` / :func:`kafka_sink_options` — pure DSN→options
  mapping, no Spark at all;
- :func:`decode_kafka_value` / :func:`encode_kafka_payload` — pure
  DataFrame projections between the connector's frame shape
  (key/value binary + topic/partition/offset/timestamp) and typed event
  rows; they run on ANY stream with that shape, so tests drive them over
  an in-memory fake without the jar;
- :func:`read_kafka_stream` / :func:`run_to_kafka` — the thin
  jar-gated composition: connector load/start plus the pure pieces,
  failing with a clear dependency hint instead of Spark's opaque
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


def kafka_sink_options(dsn: DSN, checkpoint: str) -> dict[str, str]:
    """writeStream option map for a kafka:// sink DSN (pure). The source
    grammar's ``subscribe`` becomes the sink's ``topic``; client
    ``kafka.*`` params pass through so SSL/auth tuning applies to the
    producer too."""
    src = kafka_options(dsn)
    out = {k: v for k, v in src.items() if k.startswith("kafka.")}
    out["topic"] = src["subscribe"]
    out["checkpointLocation"] = checkpoint
    return out


def decode_kafka_value(df: DataFrame, value_schema=None) -> DataFrame:
    """Connector frame -> typed event rows (pure projection).

    With no schema the raw frame passes through; with one, ``value`` is
    JSON-decoded into its columns plus the broker ``timestamp`` as
    ``_kafka_ts`` — the shape the events-pipeline operators expect.
    Runs on any DataFrame with the connector's columns, streaming or
    not, so the logic is testable without the connector jar."""
    if value_schema is None:
        return df
    return (df.select(F.from_json(F.col("value").cast("string"),
                                  value_schema).alias("v"),
                      F.col("timestamp").alias("_kafka_ts"))
            .select("v.*", "_kafka_ts"))


def encode_kafka_payload(df: DataFrame) -> DataFrame:
    """Typed rows -> Kafka producer frame (pure projection): every
    non-``key`` column JSON-encodes into ``value``; a ``key`` column, if
    present, is kept as the message key for partition affinity."""
    payload_cols = [c for c in df.columns if c != "key"]
    return df.select(
        *([F.col("key").cast("string").alias("key")]
          if "key" in df.columns else []),
        F.to_json(F.struct(*payload_cols)).alias("value"))


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._sc._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
        return True
    except Exception:  # noqa: BLE001 — absent jar surfaces as Py4J error
        return False


def read_kafka_stream(spark: SparkSession, dsn_str: str,
                      value_schema=None) -> DataFrame:
    """readStream over a kafka:// DSN: connector load +
    :func:`decode_kafka_value`."""
    dsn = parse(dsn_str)
    opts = kafka_options(dsn)
    if not kafka_available(spark):
        raise DSNError(_JAR_HINT)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return decode_kafka_value(reader.load(), value_schema)


def run_to_kafka(stream_df: DataFrame, dsn_str: str, checkpoint: str,
                 available_now: bool = True):
    """writeStream into a kafka topic: :func:`encode_kafka_payload` +
    the connector sink. Returns the StreamingQuery."""
    dsn = parse(dsn_str)
    sink_opts = kafka_sink_options(dsn, checkpoint)
    spark = stream_df.sparkSession
    if not kafka_available(spark):
        raise DSNError(_JAR_HINT)
    writer = encode_kafka_payload(stream_df).writeStream.format("kafka")
    for k, v in sink_opts.items():
        writer = writer.option(k, v)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
