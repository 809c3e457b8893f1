"""Live HTTP dashboard (mini_etl_spark/ui.py): real requests against a
real server — dashboard render, history API, config validate, and an
end-to-end pipeline run POSTed through the wire."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from mini_etl_spark.ui import DashboardServer


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.read().decode()


def _post(url: str, body: str):
    req = urllib.request.Request(
        url, data=body.encode(), method="POST",
        headers={"Content-Type": "application/x-yaml"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as err:
        return err.code, err.read().decode()


@pytest.fixture()
def server(tmp_path):
    history = tmp_path / "runs.json"
    history.write_text(json.dumps([
        {"name": "seeded", "rows": 42, "errors": 0, "duration": 1.5,
         "rows_per_second": 28.0},
    ]))
    srv = DashboardServer(str(history), port=0, allow_run=True).start()
    yield srv
    srv.shutdown()


def test_dashboard_and_history(server):
    base = f"http://{server.host}:{server.port}"
    status, page = _get(base + "/")
    assert status == 200
    assert "total runs" in page and "seeded" in page
    assert 'http-equiv="refresh"' in page  # live page auto-refreshes

    status, body = _get(base + "/api/history")
    assert status == 200
    assert json.loads(body)[0]["rows"] == 42

    status, body = _get(base + "/healthz")
    assert status == 200 and json.loads(body)["status"] == "ok"

    with pytest.raises(urllib.error.HTTPError) as err:
        _get(base + "/nope")
    assert err.value.code == 404


def test_validate_endpoint(server):
    base = f"http://{server.host}:{server.port}"
    good = """
name: ok
source: {type: parquet, path: '/tmp/x'}
sink: {type: null}
"""
    status, body = _post(base + "/api/validate", good)
    assert status == 200 and json.loads(body)["errors"] == []

    bad = """
name: bad
source: {type: nosuch, path: '/tmp/x'}
sink: {type: null}
"""
    status, body = _post(base + "/api/validate", bad)
    assert status == 200 and json.loads(body)["errors"]


def test_run_endpoint_end_to_end(server, spark, tmp_path):
    src = tmp_path / "in_parquet"
    spark.createDataFrame(
        [(i, float(i) * 2) for i in range(50)], "id long, v double"
    ).write.parquet(str(src))
    out = tmp_path / "out_parquet"
    cfg = f"""
name: via-http
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: filter
    condition: "id < 10"
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    base = f"http://{server.host}:{server.port}"
    status, body = _post(base + "/api/run", cfg)
    assert status == 200, body
    stats = json.loads(body)
    assert stats["rows"] == 10 and stats["errors"] == 0
    assert spark.read.parquet(str(out)).count() == 10

    # the run landed in the history file and shows on the dashboard
    _, hist = _get(base + "/api/history")
    names = [r["name"] for r in json.loads(hist)]
    assert names == ["seeded", "via-http"]
    _, page = _get(base + "/")
    assert "via-http" in page


def test_run_disabled_by_default(tmp_path):
    srv = DashboardServer(str(tmp_path / "h.json"), port=0).start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        status, body = _post(base + "/api/run", "name: x")
        assert status == 403 and "disabled" in body
    finally:
        srv.shutdown()
