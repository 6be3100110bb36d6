"""Second-level (household-analog) clustering: re-block level-1
entities on composite keys, re-cluster transitively, stamp a stable
super-entity id.

Reference parity: generateHHIDs (mlir.py:2102-2557) runs the whole
blocking -> pairing -> connected-components -> stamping pipeline a
SECOND time over shopper-level records, with a `multi_key` composite
blocking key built from the lower-level entity id plus a PII prefix
(mlir.py:2225: concat_ws(shopper_id, left(phone, 6))), and maintains
the resulting household ids with the same incremental anti-join
pattern. Web analog implemented here: records re-block on their
level-1 entity_id plus coarser composite keys (e.g. domain + a short
canonical-title/text prefix), merge transitively, and the super-entity
id is stamped from the canonical (minimum) member so it inherits the
reference's invariance properties (README.md:46-49): stable across
reruns, invariant to adding new members that don't change the
canonical.

Scale: identical shape to level-1 — one exploded (key, id) table, the
frequency cap bounds quadratic blowup per key, the pair self-join
shuffles on the key, and the CC loop is the same bounded-lineage
large-star/small-star iteration. Level-2 inputs are one row per
RECORD (like the reference, which re-blocks records, not entities), so
no extra aggregation stage is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.hashing import entity_hash
from entity_resolution_spark.operators.blocking import cap_key_frequency
from entity_resolution_spark.operators.connected_components import connected_components
from entity_resolution_spark.operators.pairs import candidate_pairs


def multi_key(*cols, prefix_col=None, prefix_len: int = 6):
    """Composite blocking key, the reference's multi_key pattern
    (mlir.py:2225): concat of the given columns plus a left-prefix of
    ``prefix_col``. NULL in any part yields NULL (no key) — concat_ws
    alone would silently SKIP null parts, so a null title would turn
    the key into a domain-only key and over-merge (round-2 advisory);
    the all-parts-present guard makes the documented semantics real."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    if prefix_col is not None:
        p = F.col(prefix_col) if isinstance(prefix_col, str) else prefix_col
        parts.append(F.substring(p, 1, prefix_len))
    all_present = parts[0].isNotNull()
    for part in parts[1:]:
        all_present = all_present & part.isNotNull()
    # unit-separator joiner, collision-safe; None when any part is NULL
    return F.when(all_present, F.concat_ws("␟", *parts))


def rollup_entities(
    records: DataFrame,
    id_col: str,
    key_cols: list[str],
    key_cap: int = 10_000,
    out_id: str = "super_id",
) -> DataFrame:
    """records(id_col:numeric, key_cols...) -> (id_col, super_id,
    super_key, super_size).

    Multi-pass blocking: one (key, id) row per non-empty key column
    value (each tagged with the column name so different key spaces
    never collide), frequency-capped, self-joined to pairs, clustered
    with large-star/small-star CC, and stamped: super_key = min member
    id of the transitive cluster, super_id = sha2(super_key) (same
    hash as level-1 entity ids, reference F18).
    """
    blocks = None
    for k in key_cols:
        b = records.select(
            F.col(id_col).alias("url_id"),
            F.concat_ws(":", F.lit(k), F.col(k).cast("string")).alias("block_key"),
        ).filter(F.col(k).isNotNull() & (F.length(F.col(k).cast("string")) > 0))
        blocks = b if blocks is None else blocks.unionByName(b)
    blocks = blocks.dropDuplicates(["url_id", "block_key"])
    capped, _stats = cap_key_frequency(blocks, cap=key_cap)
    pairs = candidate_pairs(capped)
    edges = pairs.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
    comps = connected_components(edges)
    base = records.select(F.col(id_col)).dropDuplicates([id_col])
    attached = (
        base.join(comps, base[id_col] == comps["id"], "left")
        .select(F.col(id_col), F.coalesce("component", F.col(id_col)).alias("super_key"))
    )
    # partial-aggregated size + join, not a count-over-window: a giant
    # super-cluster would otherwise single-task (round-4 de-skew)
    sizes = attached.groupBy("super_key").agg(F.count("*").alias("super_size"))
    return attached.join(sizes, "super_key").select(
        id_col,
        entity_hash(F.col("super_key")).alias(out_id),
        "super_key",
        "super_size",
    )


def rollup_pages(entities: DataFrame, feats: DataFrame, prefix_len: int = 12) -> DataFrame:
    """Level-2 pass over the ER pipeline's own outputs: re-block
    stamped pages on (entity_id) and (domain + normalized-title
    prefix) — the web analog of the reference's
    ['shopper_id', 'phone', ..., 'multi_key'] second-level key list
    (Orchestrate_Demo.py:508-514) — and stamp super-entity ids.

    entities: pipeline.run() output (url, url_id, entity_id, ...).
    feats:    featurize() output (url_id, domain, norm_title, ...).
    Returns entities + (super_id, super_key, super_size).
    """
    recs = entities.select("url_id", "entity_id").join(
        feats.select("url_id", "domain", "norm_title"), "url_id"
    )
    keyed = recs.select(
        "url_id",
        "entity_id",
        multi_key("domain", prefix_col="norm_title", prefix_len=prefix_len).alias("domain_title"),
    )
    rolled = rollup_entities(keyed, "url_id", ["entity_id", "domain_title"])
    return entities.join(rolled, "url_id")
