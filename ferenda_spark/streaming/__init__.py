from .ingest import incremental_extract, stream_extract  # noqa: F401
