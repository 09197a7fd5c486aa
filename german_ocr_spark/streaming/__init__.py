from .incremental import (  # noqa: F401
    stream_dedup,
    stream_extract,
    stream_sessionize,
    stream_windowed_rates,
)
