"""Plans — the query registry consumed by __spark_entry__.py."""
