"""The 10-stage entity-resolution pipeline (SURVEY.md §7.1).

pages → extract → normalize → features → block → pairs → score →
edges → cluster → stamp [→ incremental merge], with optional
per-stage checkpointing (resume-from-failure) and a metrics side
channel (blocking-key stats, stage row counts).

Each stage is a pure DataFrame→DataFrame function from the operator
modules; this module only sequences them — there is no hidden state,
so the whole plan stays visible to Catalyst until a checkpoint
materializes it.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.extract import extract
from entity_resolution_spark.features import FeatureConfig, build_features
from entity_resolution_spark.normalize import normalize
from entity_resolution_spark.operators.blocking import (
    BlockingConfig,
    block_keys,
    cap_key_frequency,
    salt_hot_keys,
)
from entity_resolution_spark.operators.connected_components import connected_components
from entity_resolution_spark.operators.pairs import candidate_pairs
from entity_resolution_spark.operators.scoring import (
    ScoringConfig,
    deterministic_match_pass,
    edges_from_scores,
    resolve_broadcast,
    score_pairs_two_phase,
)
from entity_resolution_spark.operators.stamping import stamp_entities
from entity_resolution_spark.sources.checkpoint import StageCheckpointer

PAIR_FEATURE_COLS = ["fingerprint", "shingles", "norm_title", "text_prefix"]


@dataclass(frozen=True)
class PipelineConfig:
    features: FeatureConfig = field(default_factory=FeatureConfig)
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    # reference stage-6 structure: deterministic exact-match pass whose
    # edges are NOT-EXISTS-subtracted from the probabilistic input
    # (Orchestrate_Demo.py:360). Off -> exact dups score 1.0 inside the
    # probabilistic path instead; same components either way.
    deterministic_prepass: bool = True

    def fingerprint(self) -> str:
        return hashlib.sha256(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


def oracle_mode_config() -> PipelineConfig:
    """Pipeline config with every hash in the ANSI-SQL-reproducible md5
    mode (url ids, shingles, MinHash, band keys) — identical plan
    shape to the default, so the WHOLE flagship pipeline can be
    value-checked against a DuckDB replay (see __spark_entry__
    er_pipeline_oracle). Slower per row (md5 + base conversion vs
    xxhash64); production runs keep the default."""
    return PipelineConfig(
        features=FeatureConfig(hash_mode="md5"),
        blocking=BlockingConfig(hash_mode="md5"),
    )


class EntityResolutionPipeline:
    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        if self.config.scoring.num_perm != self.config.features.num_perm:
            raise ValueError(
                "ScoringConfig.num_perm must match FeatureConfig.num_perm "
                f"({self.config.scoring.num_perm} != {self.config.features.num_perm}): "
                "the estimate gate is calibrated to the signature length"
            )
        if self.config.scoring.prefix_len != self.config.features.prefix_len:
            raise ValueError(
                "ScoringConfig.prefix_len must match FeatureConfig.prefix_len "
                f"({self.config.scoring.prefix_len} != {self.config.features.prefix_len}): "
                "text_prefix is built by featurize — tuning only the scoring "
                "side would silently have no effect"
            )
        bands = self.config.blocking.bands
        rows = self.config.blocking.rows_per_band
        if bands * rows > self.config.features.num_perm:
            raise ValueError(
                f"BlockingConfig bands*rows_per_band ({bands}x{rows}) exceeds the "
                f"MinHash signature length ({self.config.features.num_perm}): bands "
                "sliced past the signature all hash the EMPTY slice to one "
                "universal key, silently pairing every same-lang record"
            )
        self.metrics: dict[str, object] = {}

    # -- stage functions (pure) ------------------------------------------
    def featurize(self, pages: DataFrame) -> DataFrame:
        # A small input (one parquet file) arrives as 1-2 partitions; the
        # extract/minhash pandas-UDF stages would then run serially no
        # matter how many cores exist. Fan out to the cluster width
        # first — hash on url, so the layout is deterministic (probe
        # via inputFiles(), never .rdd — round-2 advisory).
        from entity_resolution_spark.util import fan_out

        pages = fan_out(pages, "url")
        return build_features(
            normalize(extract(pages), hash_mode=self.config.features.hash_mode),
            self.config.features,
        )

    def block(self, feats: DataFrame) -> tuple[DataFrame, DataFrame]:
        blocks = block_keys(feats, self.config.blocking)
        capped, stats = cap_key_frequency(blocks, self.config.blocking.key_cap)
        if self.config.blocking.salt_threshold > 0:
            capped = salt_hot_keys(
                capped,
                stats,
                salt_threshold=self.config.blocking.salt_threshold,
                n_salts=self.config.blocking.n_salts,
                hash_mode=self.config.blocking.hash_mode,
                only_containing="domain:" if self.config.blocking.salt_domain_only else None,
            )
        return capped, stats

    def score(self, pairs: DataFrame, feats: DataFrame) -> DataFrame:
        return score_pairs_two_phase(pairs, feats, self.config.scoring)

    # -- full run ---------------------------------------------------------
    def run(self, pages: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
        """pages -> entities(url, url_id, entity_id, canonical_url,
        component_size, first_seen)."""
        spark = pages.sparkSession
        ckpt = (
            StageCheckpointer(spark, checkpoint_dir, self.config.fingerprint())
            if checkpoint_dir
            else None
        )

        def staged(name: str, fn) -> DataFrame:
            if ckpt is not None:
                return ckpt.run_stage(name, fn)
            return fn()

        feats = staged("03_features", lambda: self.featurize(pages))
        if ckpt is None:
            # The feature table feeds ~6 subplans (block keys, both
            # sides of each attach, the survivor semi-join, stamping).
            # Since the MinHash signature is now pure map-side algebra
            # (no shuffle for Spark to auto-reuse as a ReusedExchange),
            # materialize it ONCE here — the un-checkpointed analog of
            # the 03_features parquet stage write. Blocks are freed by
            # the ContextCleaner when the result is dropped.
            feats = feats.localCheckpoint(eager=True)
        # blocking + key stats (metrics: dropped-hot accounting)
        if ckpt is not None and ckpt.is_complete("04_blocks"):
            blocks = ckpt.read("04_blocks")
            stats = ckpt.read("04_key_stats")
        else:
            blocks, stats = self.block(feats)
            if ckpt is not None:
                blocks = ckpt.write(blocks, "04_blocks")
                stats = ckpt.write(stats, "04_key_stats")
        self.metrics["key_stats"] = stats
        pairs = staged("05_pairs", lambda: candidate_pairs(blocks))
        # the pass eagerly materializes its pair-fingerprint attach —
        # skip it when the components checkpoint is complete (its only
        # consumers, edges and the scored-stage input, are then read
        # from parquet and the eager join would be pure waste on every
        # resume)
        need_det = self.config.deterministic_prepass and not (
            ckpt is not None and ckpt.is_complete("08_components")
        )
        if need_det:
            det_edges, pairs = deterministic_match_pass(
                pairs,
                feats,
                # size-resolved per run (round-4 verdict: a fixed True
                # default OOMs at scale); only the 8-byte fingerprint
                # rides this attach so auto broadcasts it far longer
                # than the wide phase-2 payload.
                broadcast=resolve_broadcast(
                    self.config.scoring, feats, ["fingerprint"]
                ),
            )
        else:
            det_edges = None
        scored = staged("06_scored", lambda: self.score(pairs, feats))
        edges = edges_from_scores(scored, self.config.scoring.threshold)
        if det_edges is not None:
            edges = edges.unionByName(det_edges)
        comps = staged("08_components", lambda: connected_components(edges))
        entities = staged(
            "09_entities",
            lambda: stamp_entities(
                feats.select("url", "url_id", "warc_ts"), comps
            ),
        )
        return entities

    def collect_metrics(self) -> dict[str, int]:
        stats: DataFrame = self.metrics.get("key_stats")  # type: ignore[assignment]
        if stats is None:
            return {}
        rows = stats.groupBy("status").agg(F.count("*").alias("n")).collect()
        return {f"keys_{r['status']}": int(r["n"]) for r in rows}
