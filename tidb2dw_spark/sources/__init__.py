from .envelope import ENVELOPE_COLUMNS, envelope_schema, strip_envelope
from .snapshot import read_snapshot_csv, write_snapshot_csv, snapshot_glob
from .changelog import (
    DmlPathKey,
    CdcFile,
    parse_dml_file_path,
    generate_dml_file_path,
    discover_increment_files,
    diff_dml_maps,
    sorted_pending_keys,
)

__all__ = [
    "ENVELOPE_COLUMNS",
    "envelope_schema",
    "strip_envelope",
    "read_snapshot_csv",
    "write_snapshot_csv",
    "snapshot_glob",
    "DmlPathKey",
    "CdcFile",
    "parse_dml_file_path",
    "generate_dml_file_path",
    "discover_increment_files",
    "diff_dml_maps",
    "sorted_pending_keys",
]
