"""External connectors (SURVEY.md §2.1 S7/S10/S11) — thin, gated.

The reference's JDBC source/sink (``GtfsDAO.java:28-48``,
``utils/__init__.py:17-53``) and Kafka producer
(``GtfsArrivalsProducer.java:123-190``) map directly onto Spark's
built-in connectors. The v1 image carries no Postgres driver or Kafka
broker, so these wrappers validate eagerly and raise actionable
errors instead of failing deep inside a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    num_partitions: int = 8,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S10: partitioned JDBC read. Unlike the reference's single
    ResultSet cursor (GtfsDAO.java:96-122), the read is split into
    ``num_partitions`` range slices so executors pull in parallel."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append",
    batchsize: int = 100_000, **options: str,
) -> None:
    """S7: batched JDBC write. ``batchsize`` mirrors the reference's
    ``commit_every=100000`` (utils/__init__.py:17) but executes as JDBC
    batch statements per partition instead of one INSERT per row."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def write_kafka_batch(
    df: DataFrame, bootstrap: str, topic: str, **options: str
) -> None:
    """S11 batch parity: DataFrame with a ``value`` (and optional
    ``key``) column → Kafka. The streaming twin is a
    ``writeStream.format("kafka")`` over the same payload — see
    ``streaming/windows.run_to_memory`` for the sink wiring pattern.
    Requires the spark-sql-kafka package on the classpath."""
    writer = (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
