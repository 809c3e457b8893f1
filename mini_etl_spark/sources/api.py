"""REST API source (⇐ APIExtractor, extractors.py:359-523).

Capabilities mirrored: GET/POST, headers/params/body, basic & bearer auth
(extractors.py:428-431), ``data_path`` drill-down into nested JSON
(extractors.py:511-517), page- and offset-based pagination
(extractors.py:473-490), timeout, retry with exponential backoff
(extractors.py:465 via core/retry.py).

Architecture: unknown-length pagination is inherently sequential (each page
reveals whether a next one exists), so that loop stays on the driver — same
as the reference. When the page range IS known (``total_pages``), pages are
fetched **in parallel on executors** via mapInPandas — the scale path the
reference lacked.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mini_etl_spark.retry import RetryConfig, retry_with_backoff

Source = Callable[[SparkSession], DataFrame]


def _drill(payload: Any, data_path: str | None) -> list[dict]:
    """Follow a dotted path into nested JSON (extractors.py:511-517)."""
    node = payload
    if data_path:
        for part in data_path.split("."):
            if not isinstance(node, dict) or part not in node:
                raise ValueError(f"read_api: data_path {data_path!r} not found in response")
            node = node[part]
    if isinstance(node, dict):
        node = [node]
    if not isinstance(node, list):
        raise ValueError("read_api: response payload is not a JSON array/object")
    return node


def _fetch_page(
    url: str,
    method: str,
    headers: dict | None,
    params: dict | None,
    body: dict | None,
    auth: dict | None,
    timeout: float,
    retry: RetryConfig,
) -> Any:
    import requests

    req_auth = None
    req_headers = dict(headers or {})
    if auth:
        kind = auth.get("type", "bearer")
        if kind == "basic":
            req_auth = (auth.get("username", ""), auth.get("password", ""))
        elif kind == "bearer":
            req_headers["Authorization"] = f"Bearer {auth.get('token', '')}"

    def _do() -> Any:
        resp = requests.request(
            method.upper(),
            url,
            headers=req_headers,
            params=params,
            json=body,
            auth=req_auth,
            timeout=timeout,
        )
        resp.raise_for_status()
        return resp.json()

    return retry_with_backoff(_do, config=retry)


def read_api(
    url: str,
    method: str = "GET",
    headers: dict | None = None,
    params: dict | None = None,
    body: dict | None = None,
    data_path: str | None = None,
    pagination: dict | None = None,
    auth: dict | None = None,
    timeout: float = 30.0,
    retry: RetryConfig | None = None,
    schema: Any | None = None,
) -> Source:
    """Build an API source.

    ``pagination`` (extractors.py:473-490):
      - ``{"type": "page", "param": "page", "start": 1, "size_param": "per_page",
         "size": 100, "total_pages": N?}``
      - ``{"type": "offset", "param": "offset", "size_param": "limit", "size": 100}``
    Pagination stops when a page returns fewer than ``size`` records (or is
    empty). With ``total_pages`` given, pages fan out to executors.
    """
    retry = retry or RetryConfig()

    def _read(spark: SparkSession) -> DataFrame:
        records: list[dict]
        if pagination and pagination.get("total_pages"):
            # Known page range → parallel fetch on executors.
            p = dict(pagination)
            pages = list(range(p.get("start", 1), p.get("start", 1) + p["total_pages"]))
            pages_df = spark.createDataFrame([(pg,) for pg in pages], "page int")
            args = json.dumps(
                {
                    "url": url, "method": method, "headers": headers,
                    "params": params, "body": body, "auth": auth,
                    "timeout": timeout, "data_path": data_path,
                    "param": p.get("param", "page"),
                    "size_param": p.get("size_param"), "size": p.get("size"),
                    # caller's retry policy rides to executors (numeric
                    # fields only; retryable_exceptions keeps its default)
                    "retry": {
                        "max_attempts": retry.max_attempts,
                        "initial_delay": retry.initial_delay,
                        "max_delay": retry.max_delay,
                        "backoff_factor": retry.backoff_factor,
                        "jitter": retry.jitter,
                    },
                }
            )

            def _fetch_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                cfg = json.loads(args)
                for pdf in batches:
                    rows: list[dict] = []
                    for page in pdf["page"].tolist():
                        call_params = dict(cfg["params"] or {})
                        call_params[cfg["param"]] = page
                        if cfg["size_param"] and cfg["size"]:
                            call_params[cfg["size_param"]] = cfg["size"]
                        payload = _fetch_page(
                            cfg["url"], cfg["method"], cfg["headers"], call_params,
                            cfg["body"], cfg["auth"], cfg["timeout"],
                            RetryConfig(**cfg["retry"]),
                        )
                        rows.extend(_drill(payload, cfg["data_path"]))
                    if rows:
                        yield pd.json_normalize(rows)

            if schema is None:
                raise ValueError("read_api: parallel paginated reads require schema=")
            return pages_df.mapInPandas(_fetch_batch, schema=schema)

        # Driver-side sequential fetch (unknown length / no pagination).
        records = []
        if not pagination:
            payload = _fetch_page(url, method, headers, params, body, auth, timeout, retry)
            records = _drill(payload, data_path)
        else:
            p = dict(pagination)
            kind = p.get("type", "page")
            size = p.get("size", 100)
            cursor = p.get("start", 1) if kind == "page" else 0
            while True:
                call_params = dict(params or {})
                call_params[p.get("param", "page" if kind == "page" else "offset")] = cursor
                if p.get("size_param"):
                    call_params[p["size_param"]] = size
                payload = _fetch_page(
                    url, method, headers, call_params, body, auth, timeout, retry
                )
                page_records = _drill(payload, data_path)
                records.extend(page_records)
                if len(page_records) < size or not page_records:
                    break
                cursor = cursor + 1 if kind == "page" else cursor + size
        pdf = pd.json_normalize(records) if records else pd.DataFrame()
        if schema is not None:
            return spark.createDataFrame(pdf, schema=schema)
        if pdf.empty:
            raise ValueError("read_api: empty response and no schema= given")
        return spark.createDataFrame(pdf)

    return _read
