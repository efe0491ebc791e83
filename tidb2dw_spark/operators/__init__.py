from .dedup import last_writer_wins
from .merge import merge_changelog, apply_changelog
from .project import (
    positional_projection,
    cast_projection,
    decode_binary_columns,
    metadata_row_filter,
    pk_projection,
)

__all__ = [
    "last_writer_wins",
    "merge_changelog",
    "apply_changelog",
    "positional_projection",
    "cast_projection",
    "decode_binary_columns",
    "metadata_row_filter",
    "pk_projection",
]
