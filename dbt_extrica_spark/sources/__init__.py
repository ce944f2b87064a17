from .registry import (
    register_sources, read_parquet_table, read_table, TEST_TABLES,
)

__all__ = ["register_sources", "read_parquet_table", "read_table",
           "TEST_TABLES"]
