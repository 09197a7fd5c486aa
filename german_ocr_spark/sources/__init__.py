from .files import (  # noqa: F401
    MIME_BY_EXT,
    read_media_dir,
    read_span_table,
    route_mime,
    write_bucketed,
)
from .jsonl import (  # noqa: F401
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl_sharded,
)
from .csvfile import read_csv_quarantined  # noqa: F401
