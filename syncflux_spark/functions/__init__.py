from syncflux_spark.functions.time import (
    chunk_windows,
    copy_window,
    parse_input_time,
    time_bucket,
    unixnano_to_ts,
)

__all__ = [
    "chunk_windows",
    "copy_window",
    "parse_input_time",
    "time_bucket",
    "unixnano_to_ts",
]
