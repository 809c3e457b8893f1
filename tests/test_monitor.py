"""Dashboard-grade HTML run report (monitor.py): metric cards, status
coloring, sparklines, per-pipeline rollup — dependency-free single file."""

from __future__ import annotations

import json

from mini_etl_spark.monitor import history_to_html, history_to_json

HIST = [
    {"name": "p1", "rows": 1000, "errors": 0, "duration": 2.5, "rows_per_second": 400.0},
    {"name": "p1", "rows": 1200, "errors": 0, "duration": 2.1, "rows_per_second": 571.4},
    {"name": "p2", "rows": 0, "errors": 3, "duration": 0.4, "rows_per_second": 0.0},
    {"name": "p1", "rows": 1100, "errors": 0, "duration": 1.9, "rows_per_second": 578.9},
]


def test_html_report_dashboard_surface(tmp_path):
    path = tmp_path / "report.html"
    history_to_html(HIST, str(path), title="demo corpus")
    s = path.read_text()
    # metric cards: totals, success/fail split, rows, time
    assert "total runs" in s and ">4<" in s
    assert "successful" in s and ">3<" in s and "failed" in s
    assert "3,300" in s  # per-pipeline rollup rows for p1
    # sparklines are inline SVG — no JS, no external assets
    assert "polyline" in s and "<script" not in s and "http" not in s
    # status coloring per run row
    assert 'class="ok"' in s and 'class="err"' in s
    # newest-first: the last run's row renders before the first run's
    # (cell-level needles — bare numbers also occur in sparkline labels)
    assert s.index("<td>1.9</td>") < s.index("<td>2.5</td>")


def test_html_report_single_run_and_empty(tmp_path):
    # one run: no sparkline (needs 2+ points), no per-pipeline section
    p1 = tmp_path / "one.html"
    history_to_html(HIST[:1], str(p1))
    s = p1.read_text()
    assert "polyline" not in s and "Per pipeline" not in s
    assert 'class="ok"' in s
    # empty history renders a valid page
    p0 = tmp_path / "zero.html"
    history_to_html([], str(p0))
    assert "<table>" in p0.read_text()


def test_json_twin_roundtrips(tmp_path):
    path = tmp_path / "h.json"
    history_to_json(HIST, str(path))
    assert json.loads(path.read_text()) == HIST
