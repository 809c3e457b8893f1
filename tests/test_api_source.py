"""REST API source tests against a real local HTTP server (pagination,
data_path drill-down, auth headers, retry)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from mini_etl_spark.retry import RetryConfig
from mini_etl_spark.sources import read_api

ROWS = [{"id": i, "name": f"row_{i}"} for i in range(25)]


class _Handler(BaseHTTPRequestHandler):
    fail_next = {"count": 0}

    def log_message(self, *args):  # silence
        pass

    def do_GET(self):
        parsed = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        if parsed.path == "/flaky":
            if _Handler.fail_next["count"] > 0:
                _Handler.fail_next["count"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            payload = ROWS[:3]
        elif parsed.path == "/auth":
            if self.headers.get("Authorization") != "Bearer sekrit":
                self.send_response(401)
                self.end_headers()
                return
            payload = ROWS[:2]
        elif parsed.path == "/nested":
            payload = {"meta": {"total": len(ROWS)}, "data": {"items": ROWS[:4]}}
        elif parsed.path == "/paged":
            page = int(qs.get("page", 1))
            size = int(qs.get("per_page", 10))
            start = (page - 1) * size
            payload = ROWS[start : start + size]
        elif parsed.path == "/offset":
            off = int(qs.get("offset", 0))
            size = int(qs.get("limit", 10))
            payload = ROWS[off : off + size]
        else:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def api_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_simple_get(spark, api_server):
    df = read_api(f"{api_server}/paged")(spark)
    assert df.count() == 10


def test_page_pagination_collects_all(spark, api_server):
    df = read_api(
        f"{api_server}/paged",
        pagination={"type": "page", "param": "page", "size_param": "per_page", "size": 10},
    )(spark)
    assert df.count() == 25
    assert {r.id for r in df.collect()} == set(range(25))


def test_offset_pagination(spark, api_server):
    df = read_api(
        f"{api_server}/offset",
        pagination={"type": "offset", "param": "offset", "size_param": "limit", "size": 7},
    )(spark)
    assert df.count() == 25


def test_data_path_drilldown(spark, api_server):
    df = read_api(f"{api_server}/nested", data_path="data.items")(spark)
    assert df.count() == 4


def test_bearer_auth(spark, api_server):
    df = read_api(f"{api_server}/auth", auth={"type": "bearer", "token": "sekrit"})(spark)
    assert df.count() == 2


def test_retry_on_500(spark, api_server):
    _Handler.fail_next["count"] = 2
    cfg = RetryConfig(max_attempts=4, initial_delay=0.05, jitter=False)
    # requests raises HTTPError (not retryable by default) — widen the set
    import requests

    cfg.retryable_exceptions = (requests.exceptions.RequestException,)
    df = read_api(f"{api_server}/flaky", retry=cfg)(spark)
    assert df.count() == 3


def test_parallel_paged_fetch(spark, api_server):
    """Known page range → executors fetch pages in parallel via mapInPandas."""
    df = read_api(
        f"{api_server}/paged",
        pagination={
            "type": "page", "param": "page", "size_param": "per_page",
            "size": 10, "total_pages": 3,
        },
        schema="id bigint, name string",
    )(spark)
    assert df.count() == 25
    assert {r.id for r in df.collect()} == set(range(25))
