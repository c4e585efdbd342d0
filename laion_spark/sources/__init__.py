from laion_spark.sources.npy import discover_shards, etl_shards, shard_report

__all__ = ["discover_shards", "etl_shards", "shard_report"]
