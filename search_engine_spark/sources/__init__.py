"""Table IO abstraction: the same pipeline runs over parquet directories
(this sandbox) or Iceberg catalog tables (the 100 TB deployment)."""

from .tableio import IcebergIO, ParquetIO, TableIO, iceberg_available, table_io_for

__all__ = ["TableIO", "ParquetIO", "IcebergIO", "iceberg_available", "table_io_for"]
