from as_etl_storage_spark.writers.writer import ParquetWriter, WriteResult

__all__ = ["ParquetWriter", "WriteResult"]
