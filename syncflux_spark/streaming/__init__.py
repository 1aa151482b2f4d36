from syncflux_spark.streaming.monitor import ClusterState, ClusterStatus, HAMonitor
from syncflux_spark.streaming.replicate import ReplicationStream
from syncflux_spark.streaming.windowed import WindowedRollupStream

__all__ = [
    "ClusterState",
    "ClusterStatus",
    "HAMonitor",
    "ReplicationStream",
    "WindowedRollupStream",
]
