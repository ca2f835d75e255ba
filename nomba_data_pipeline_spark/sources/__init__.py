"""Source readers: staged JSON/parquet, schema-inference parity, JDBC."""
