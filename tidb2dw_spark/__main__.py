"""``python -m tidb2dw_spark`` — CLI entry (see cli.py)."""

from .cli import main

raise SystemExit(main())
