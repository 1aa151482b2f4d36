from syncflux_spark.webui.api import StatusServer

__all__ = ["StatusServer"]
