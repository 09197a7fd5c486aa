from .incremental import (  # noqa: F401
    attribution_join,
    stream_attribute,
    stream_dedup,
    stream_extract,
    stream_sessionize,
    stream_windowed_rates,
)
