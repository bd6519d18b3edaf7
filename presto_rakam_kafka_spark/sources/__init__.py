"""Physical sources backing event tables (SURVEY §2.A tier-A operators)."""

from presto_rakam_kafka_spark.sources.parquet import ParquetEventSource

__all__ = ["ParquetEventSource"]
