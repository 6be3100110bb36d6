"""Continuous incremental entity resolution: the reference's
batch-delta maintenance (NOT-EXISTS insert into the full entity table,
mlir.py:2066-2095) expressed as a Structured Streaming job.

Each micro-batch of newly crawled pages runs through the FULL
blocking/scoring/clustering pipeline TOGETHER WITH the already-stamped
entity table's pages, then `merge_entities` folds the result into the
durable table: urls already present keep their entity_id (the
README.md:46-49 stability invariants), genuinely new urls adopt the id
of the cluster they join, novel clusters mint new ids. foreachBatch
gives exactly-once table maintenance per micro-batch (the checkpoint
tracks which input files are consumed).

Scale notes: re-clustering batch ∪ table is how the reference does it
too (its "current + previous extract" union). At 10^12 rows the union
re-run is bounded by blocking — batch pages only generate candidate
pairs inside their own block keys, and unchanged blocks reproduce
identical entity ids (deterministic pipeline), so MERGE semantics stay
append-only for untouched entities. A production deployment points
`table_path` at an Iceberg table and swaps the overwrite for
sources.io.merge_upsert (snapshot-isolated MERGE INTO).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from entity_resolution_spark.datagen import PAGES_SCHEMA
from entity_resolution_spark.operators.incremental import merge_entities
from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline


def start_incremental_er(
    spark: SparkSession,
    pages_dir: str,
    table_path: str,
    checkpoint_dir: str,
    pipeline: EntityResolutionPipeline | None = None,
    pages_lookup=None,
):
    """Start the streaming query: pages_dir (parquet feed) -> entity
    table at table_path, maintained incrementally per micro-batch.

    ``pages_lookup`` (optional callable batch_df -> DataFrame) returns
    the page payloads for re-clustering context; by default the batch
    alone is clustered (sufficient when crawl batches are
    self-contained). Returns the StreamingQuery; stop() it to halt.
    """
    pipe = pipeline or EntityResolutionPipeline()
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pages = pages_lookup(batch_df) if pages_lookup is not None else batch_df
        stamped = pipe.run(pages)
        try:
            existing = spark.read.parquet(table_path)
            has_existing = True
        except Exception:  # first batch: no table yet  # noqa: BLE001
            has_existing = False
        if has_existing:
            merged = merge_entities(existing, stamped)
        else:
            merged = stamped
        # overwrite-on-merge; production: Iceberg merge_upsert instead
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(table_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
