"""Idempotent streaming sinks (SURVEY.md §2.1 S8 under streaming).

The reference makes batch loads idempotent with ``ON CONFLICT DO
NOTHING`` (utils/__init__.py:55-56). The streaming equivalent is a
``foreachBatch`` upsert: every micro-batch dedups on the natural key
within the batch, anti-joins against keys already in the sink, and
appends only the remainder. Combined with checkpointing this gives
effectively-once delivery into a plain parquet directory — replayed
micro-batches (after a crash between write and checkpoint commit)
insert zero new rows, exactly like the reference's conflict-ignoring
INSERT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_batch_append(
    batch: DataFrame, path: str, key_cols: Sequence[str]
) -> None:
    """One micro-batch of the conflict-ignoring append (also usable
    for plain batch loads — same semantics as catalog.new_runs).

    Scale note: the anti-join shuffles only the batch side when the
    sink is read with the key filter pushed down; for very large sinks
    key-partition the sink directory and prune to the batch's
    partitions before the anti-join.
    """
    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    fresh = batch.dropDuplicates(list(key_cols))
    try:
        existing = spark.read.parquet(path).select(*key_cols)
    except AnalysisException as e:
        # ONLY a missing sink directory means "first batch". Any other
        # read failure (throttling, permissions, corrupt footer) must
        # fail the batch — appending without the anti-join would
        # silently break the effectively-once invariant.
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            existing = None
        else:
            raise
    if existing is not None:
        fresh = fresh.join(existing, list(key_cols), "left_anti")
    fresh.write.mode("append").parquet(path)


def write_stream_idempotent(
    stream_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """S8 streaming twin: file-sink append that ignores conflicts on
    ``key_cols`` via foreachBatch. Returns the started query."""

    def _on_batch(batch: DataFrame, _batch_id: int) -> None:
        idempotent_batch_append(batch, path, key_cols)

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_on_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_key_count(spark_df: DataFrame, key_cols: Sequence[str]) -> int:
    """Distinct-key count of a sink — the invariant an idempotent sink
    preserves across replays (test helper)."""
    return spark_df.select(*[F.col(c) for c in key_cols]).distinct().count()
