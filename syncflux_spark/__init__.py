"""syncflux_spark — a PySpark-native analytics/replication engine.

Re-expresses the data-processing capabilities of toni-moreno/syncflux
(an InfluxDB 1.x replication/recovery tool, see /root/reference) as an
idiomatic Spark engine:

- catalog:      database / retention-policy / measurement metadata and
                schema discovery + replication (reference: pkg/agent/
                hacluster.go GetSchema/ReplicateSchema).
- operators:    chunked time-range copy with retry + recovery
                (pkg/agent/sync.go), plus the extended large-scale
                training-data surface (dedup, similarity search,
                text analysis, multimodal plumbing).
- streaming:    continuous replication via Structured Streaming with
                checkpointed gap backfill (hamonitor parity,
                pkg/agent/hacluster.go:259-390).
- functions:    scalar helpers (ns-epoch time conversion, window math,
                text/vector column expression builders).

Everything is DataFrame/Catalyst-first: filters push down to parquet,
aggregations are partial-agg friendly, small dimensions broadcast, and
nothing collects to the driver in a hot path.
"""

from syncflux_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
