"""Live pipeline dashboard served over stdlib HTTP — no dependencies.

The reference ships a Streamlit app (mini_etl/ui/app.py:36-529) with four
working surfaces: a metrics dashboard (app.py:111-152), run-pipeline from
an uploaded/pasted YAML config (app.py:154-308), a config viewer/validator
(app.py:310-392), and filtered run history (app.py:394-448). SURVEY §2.6
scoped the Streamlit dependency out; this module closes the remaining gap
with a ``http.server`` twin of those surfaces:

- ``GET /``             live dashboard + history (re-read per request,
                        auto-refreshing) — the same page
                        :func:`mini_etl_spark.monitor.render_history_html`
                        writes for CI artifacts
- ``GET /api/history``  the run history as JSON
- ``GET /healthz``      liveness probe
- ``POST /api/validate`` YAML/JSON config in the body → validation errors
- ``POST /api/run``     config in the body → build + run the pipeline on
                        a shared SparkSession, append stats to the history
                        file, return the stats JSON. Disabled unless the
                        server was started with ``allow_run=True``
                        (running a config executes arbitrary reads/writes
                        — an operator opts in, same trust model as the
                        reference's run page).

State is one JSON file (the ``--stats-json`` format the CLI writes /
:func:`monitor.history_to_json`): every surface re-reads it per request, so
any pipeline process appending to the same file shows up live, and the
server itself holds no state worth losing. Start from the CLI
(``mini-etl-spark ui --history runs.json``) or programmatically via
:class:`DashboardServer` (used by tests, binds an ephemeral port).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any

from mini_etl_spark.monitor import render_history_html

__all__ = ["DashboardServer"]


class DashboardServer:
    """Owns the HTTP server, the history file, and (lazily) a Spark
    session for ``/api/run``. ``port=0`` binds an ephemeral port —
    read the real one from ``self.port`` after construction."""

    def __init__(
        self,
        history_path: str,
        host: str = "127.0.0.1",
        port: int = 8765,
        title: str = "pipeline runs",
        allow_run: bool = False,
    ) -> None:
        self.history_path = Path(history_path)
        self.title = title
        self.allow_run = allow_run
        self._lock = threading.Lock()
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a: Any) -> None:  # quiet by default
                pass

            def _send(
                self, code: int, body: bytes, ctype: str = "application/json"
            ) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path in ("/", "/index.html"):
                    page = render_history_html(outer._history(), outer.title)
                    # live page: re-render on a timer client-side
                    page = page.replace(
                        "<meta charset=\"utf-8\">",
                        "<meta charset=\"utf-8\"><meta http-equiv=\"refresh\" content=\"5\">",
                    )
                    self._send(200, page.encode(), "text/html; charset=utf-8")
                elif self.path == "/api/history":
                    self._send(200, json.dumps(outer._history()).encode())
                elif self.path == "/healthz":
                    self._send(200, b'{"status": "ok"}')
                else:
                    self._send(404, b'{"error": "not found"}')

            def do_POST(self) -> None:  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode()
                if self.path == "/api/validate":
                    try:
                        errors = outer._validate(body)
                        self._send(200, json.dumps({"errors": errors}).encode())
                    except Exception as exc:  # parse errors are the answer
                        self._send(
                            400, json.dumps({"errors": [str(exc)]}).encode()
                        )
                elif self.path == "/api/run":
                    if not outer.allow_run:
                        self._send(
                            403,
                            b'{"error": "run disabled; start the server with --allow-run"}',
                        )
                        return
                    try:
                        stats = outer._run(body)
                        self._send(200, json.dumps(stats, default=str).encode())
                    except Exception as exc:
                        self._send(400, json.dumps({"error": str(exc)}).encode())
                else:
                    self._send(404, b'{"error": "not found"}')

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    # -- state ------------------------------------------------------------

    def _history(self) -> list[dict[str, Any]]:
        if not self.history_path.exists():
            return []
        try:
            data = json.loads(self.history_path.read_text())
        except json.JSONDecodeError:
            return []
        return data if isinstance(data, list) else []

    def _append_history(self, stats: dict[str, Any]) -> None:
        with self._lock:
            history = self._history()
            history.append(stats)
            self.history_path.parent.mkdir(parents=True, exist_ok=True)
            self.history_path.write_text(json.dumps(history, default=str))

    # -- config surfaces ---------------------------------------------------

    def _load_config(self, body: str):
        import tempfile

        from mini_etl_spark.config import ConfigLoader

        suffix = ".json" if body.lstrip().startswith("{") else ".yaml"
        with tempfile.NamedTemporaryFile(
            "w", suffix=suffix, delete=False
        ) as fh:
            fh.write(body)
            tmp = fh.name
        try:
            loader = ConfigLoader()
            return loader, loader.load(tmp)
        finally:
            Path(tmp).unlink(missing_ok=True)

    def _validate(self, body: str) -> list[str]:
        _, config = self._load_config(body)
        return config.validate()

    def _run(self, body: str) -> dict[str, Any]:
        loader, config = self._load_config(body)
        errors = config.validate()
        if errors:
            raise ValueError(f"invalid config: {errors}")
        from mini_etl_spark.session import get_spark

        pipeline = loader.build_pipeline(config)
        stats = pipeline.run(get_spark("mini-etl-spark-ui"))
        self._append_history(stats)
        return stats

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "DashboardServer":
        """Serve in a daemon thread (tests, embedding); returns self."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        """Blocking serve (the CLI path)."""
        self._httpd.serve_forever()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
