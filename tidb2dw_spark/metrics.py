"""Per-table metrics + replication status (reference parity:
pkg/metrics/metrics.go:24-79 counter/gauge helpers and the gin `/info`
status API, apiservice/api_info.go:65-72, server.go:38-42).

Thread-safe in-process registry; `snapshot()` returns the JSON-shaped dict
the reference serves over HTTP.  An HTTP server is intentionally out of
scope for the engine core — callers can mount `snapshot()` on any
framework; `serve()` offers a stdlib one for parity testing.
"""

from __future__ import annotations

import json
import threading
import time
from collections import defaultdict
from enum import Enum


class TableStage(str, Enum):
    """Replication stage per table (cmd/core.go:75-85 stage diagram)."""

    INIT = "init"
    CHANGEFEED_CREATED = "changefeed-created"
    SNAPSHOT_DUMPED = "snapshot-dumped"
    SNAPSHOT_LOADED = "snapshot-loaded"
    INCREMENTAL = "incremental"
    ERROR = "error"


class MetricsRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, str], float] = defaultdict(float)
        self._gauges: dict[tuple[str, str], float] = {}
        self._stages: dict[str, TableStage] = {}
        self._errors: dict[str, str] = {}
        self._started = time.time()

    # counter/gauge surface mirrors metrics.go Add/Sub/Read helpers
    def add(self, table: str, name: str, delta: float = 1.0) -> None:
        with self._lock:
            self._counters[(table, name)] += delta

    def set_gauge(self, table: str, name: str, value: float) -> None:
        with self._lock:
            self._gauges[(table, name)] = value

    def read(self, table: str, name: str) -> float:
        with self._lock:
            if (table, name) in self._counters:
                return self._counters[(table, name)]
            return self._gauges.get((table, name), float("nan"))

    def set_stage(self, table: str, stage: TableStage, error: str | None = None) -> None:
        with self._lock:
            self._stages[table] = stage
            if error is not None:
                self._errors[table] = error

    def snapshot(self) -> dict:
        """The `/info` payload: per-table stage, error, counters, gauges."""
        with self._lock:
            tables: dict[str, dict] = {}
            for table, stage in self._stages.items():
                tables[table] = {"stage": stage.value}
                if table in self._errors:
                    tables[table]["error"] = self._errors[table]
            for (table, name), v in self._counters.items():
                tables.setdefault(table, {}).setdefault("counters", {})[name] = v
            for (table, name), v in self._gauges.items():
                tables.setdefault(table, {}).setdefault("gauges", {})[name] = v
            return {"uptime_sec": round(time.time() - self._started, 3), "tables": tables}

    def to_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)

    def to_prometheus(self, prefix: str = "tidb2dw") -> str:
        """Prometheus text exposition of the same snapshot (reference
        parity: apiservice/server.go:38-42 serves promhttp next to
        `/info`): counters and gauges become per-table-labeled series,
        the stage becomes a one-hot `<prefix>_table_stage` gauge."""
        snap = self.snapshot()
        by_name: dict[str, list[str]] = {}
        for fqn, t in sorted(snap["tables"].items()):
            label = fqn.replace("\\", "\\\\").replace('"', '\\"')
            for kind_key, kind in (("counters", "counter"), ("gauges", "gauge")):
                for name, val in sorted(t.get(kind_key, {}).items()):
                    metric = f"{prefix}_{name}"
                    by_name.setdefault(f"# TYPE {metric} {kind}\n", []).append(
                        f'{metric}{{table="{label}"}} {val:g}'
                    )
            stage = t.get("stage")
            if stage:
                metric = f"{prefix}_table_stage"
                by_name.setdefault(f"# TYPE {metric} gauge\n", []).append(
                    f'{metric}{{table="{label}",stage="{stage}"}} 1'
                )
        out = []
        for header in sorted(by_name):
            out.append(header)
            out.extend(line + "\n" for line in by_name[header])
        return "".join(out)


DEFAULT_REGISTRY = MetricsRegistry()

# canonical metric names (metrics.go metric families)
TABLE_NUMBERS = "table_numbers"
SNAPSHOT_TOTAL_SIZE = "snapshot_total_size_bytes"
SNAPSHOT_LOADED_SIZE = "snapshot_loaded_size_bytes"
INCREMENT_PENDING_SIZE = "increment_pending_size_bytes"
INCREMENT_LOADED_SIZE = "increment_loaded_size_bytes"
TABLE_VERSIONS = "table_versions"
ERROR_COUNT = "error_count"


def serve(registry: MetricsRegistry, port: int = 0):
    """Minimal stdlib `/info` endpoint for parity tests; returns the
    listening server (callers shutdown())."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802  (stdlib API)
            path = self.path.rstrip("/")
            if path in ("", "/info"):
                body = registry.to_json().encode()
                ctype = "application/json"
            elif path == "/metrics":
                body = registry.to_prometheus().encode()
                ctype = "text/plain; version=0.0.4"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = HTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
