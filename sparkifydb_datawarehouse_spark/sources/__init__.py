"""Source connectors (mapped JSON, parquet fixtures)."""
