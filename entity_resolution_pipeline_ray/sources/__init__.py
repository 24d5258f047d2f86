"""Sources and sinks: the deterministic synthetic pages corpus, parquet readers
with column pruning, and partitioned parquet writers with lineage manifests."""
