"""Spark integration: encode/decode jobs, Iceberg-style table layer, DataSource."""
