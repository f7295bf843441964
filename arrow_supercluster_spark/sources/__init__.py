"""Sources — parquet readers and deterministic fixture derivations."""
