"""Sources & sinks: parquet/Iceberg-gated IO, checkpoint manifests."""
