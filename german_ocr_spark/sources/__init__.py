from .files import (  # noqa: F401
    MIME_BY_EXT,
    read_media_dir,
    read_span_table,
    route_mime,
    write_bucketed,
)
