"""entity_resolution_spark — a PySpark-native record-linkage / web-scale
text-analytics engine.

Re-expresses the pipeline semantics of the reference entity-resolution
system (blocking → pairwise scoring → transitive clustering → stable
entity-ID stamping → incremental update) as idiomatic Spark DataFrame
programs over Common-Crawl-style web pages, plus the surrounding
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design rules (see SURVEY.md §4/§7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
- No per-row Python UDFs in hot paths; Arrow-batched pandas UDFs only
  where built-ins can't express the semantics.
- Explicit skew handling: blocking-key frequency caps + salting + AQE.
- Deterministic everywhere: ids via xxhash64/sha2, never
  monotonically_increasing_id in user-visible output.
"""

__version__ = "0.1.0"

from entity_resolution_spark.session import get_spark  # noqa: F401
