"""Stage 9 — canonical-record selection + stable entity-ID stamping.

Reference parity: the reference picks a canonical record per component
with a 4-level min cascade (min first_txn_dte, then store, then upc,
then card — mlir.py:1981-2010) implemented as chained Snowflake joins,
then stamps blake2b(canonical card) (mlir.py:1938-1943). Here the whole
cascade is ONE partial-aggregatable min(struct(warc_ts, url)) — the W2
mapping in SURVEY.md §2.5, lexicographic struct ordering = the cascade
— fused with the size count in a single groupBy, and the id is
sha2(canonical url). (Round-4 de-skew: this was a row_number window,
which gathers every member of a component into ONE task — a
boilerplate-linked mega-component would straggle; the agg combines
map-side and the attach join is AQE-skew-splittable.)

Entity-ID properties (reference README.md:46-49): unique per entity;
time invariant; invariant to adding new duplicate pages / re-crawls
(as long as the earliest page of the component is unchanged).
Singleton pages (in no component) are stamped from their own url via
the same hash — an anti-join, reference J7 pattern (mlir.py:2044-2049).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.hashing import entity_hash


def stamp_entities(pages: DataFrame, components: DataFrame) -> DataFrame:
    """pages(url, url_id, warc_ts, ...) x components(id, component) ->
    entities(url, url_id, entity_id, canonical_url, component_size,
    first_seen).
    """
    member = pages.join(components, pages["url_id"] == components["id"], "inner").drop("id")
    # one agg computes the canonical winner AND the size: min(struct)
    # orders by (warc_ts, url) lexicographically — exactly the old
    # window's orderBy — and urls are unique, so the winner is total
    canon = member.groupBy("component").agg(
        F.min(F.struct(F.col("warc_ts"), F.col("url"))).alias("_w"),
        F.count("*").alias("component_size"),
    ).select(
        "component",
        F.col("_w.url").alias("canonical_url"),
        F.col("_w.warc_ts").alias("first_seen"),
        "component_size",
    )
    clustered = (
        member.join(canon, "component")
        .select(
            "url",
            "url_id",
            entity_hash(F.col("canonical_url")).alias("entity_id"),
            "canonical_url",
            "component_size",
            "first_seen",
        )
    )
    singletons = (
        pages.join(components, pages["url_id"] == components["id"], "left_anti")
        .select(
            "url",
            "url_id",
            entity_hash(F.col("url")).alias("entity_id"),
            F.col("url").alias("canonical_url"),
            F.lit(1).alias("component_size"),
            F.col("warc_ts").alias("first_seen"),
        )
    )
    return clustered.unionByName(singletons)
