from syncflux_spark.operators.copy import ChunkReport, SyncReport, copy_range, sync, sync_dbrp

__all__ = ["ChunkReport", "SyncReport", "copy_range", "sync", "sync_dbrp"]
