"""Sources: deterministic synthetic generators + parquet readers."""
