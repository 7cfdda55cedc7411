"""Source connectors: parquet warehouse catalog, paginated REST adapter,
key-value match-cache table."""
