"""Stream-static enrichment with a REFRESHING dimension.

Spark's stream-static join resolves the static side once per batch only
for simple file sources; when the dimension is a managed snapshot table
(io/versioned.py) or any source that must be re-resolved, the robust
pattern is foreachBatch: each micro-batch re-loads the CURRENT dim
snapshot and broadcast-joins it — so a dim publish between batches is
picked up by the very next batch, with snapshot isolation inside a batch
(the versioned `_CURRENT` pointer swap is atomic; a batch never sees a
torn dim).

This is the streaming twin of the reference's "yesterday's file"
cache-join (schema/irve geo enrichment): slowly-changing reference data
applied to a live feed without restarting the query.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def enrich_stream_with_dim(
    stream: DataFrame,
    dim_loader: Callable[[SparkSession], DataFrame],
    on: list[str],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    how: str = "left",
):
    """Start (availableNow) a foreachBatch query that joins every batch
    against a freshly loaded dim. Returns the StreamingQuery.

    ``dim_loader(spark)`` runs once per micro-batch on the driver —
    pair it with ``versioned.read_version`` for atomic snapshot refresh.
    The dim is broadcast (refreshing dims are small by construction; a
    fact-sized "dim" belongs in a stream-stream join instead).
    """

    def run(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        enriched = batch_df.join(F.broadcast(dim), on=on, how=how)
        sink(enriched, batch_id)

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
