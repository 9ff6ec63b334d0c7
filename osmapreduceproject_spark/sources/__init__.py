from .io import read_csv, read_json, read_parquet, write_parquet, write_partitioned

__all__ = ["read_parquet", "read_csv", "read_json", "write_parquet", "write_partitioned"]
