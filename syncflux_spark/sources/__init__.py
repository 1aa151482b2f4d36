from syncflux_spark.sources.parquet import TABLES, load_table, load_tables, scan_time_range

__all__ = ["TABLES", "load_table", "load_tables", "scan_time_range"]
