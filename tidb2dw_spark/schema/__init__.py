from .table_def import TableCol, TableDefinition, load_schema_file, parse_schema_file_name
from .types import tidb_type_to_spark, table_def_to_struct
from .diff import ColumnDiff, DiffAction, diff_columns
from .evolve import apply_column_diffs, project_column_diffs, truncate_table

__all__ = [
    "TableCol",
    "TableDefinition",
    "load_schema_file",
    "parse_schema_file_name",
    "tidb_type_to_spark",
    "table_def_to_struct",
    "ColumnDiff",
    "DiffAction",
    "diff_columns",
    "apply_column_diffs",
    "project_column_diffs",
    "truncate_table",
]
