"""Read-only monitoring view over ``Pipeline.history``.

The reference ships a Streamlit dashboard (mini_etl/ui/app.py:36-529);
SURVEY §2.6 scopes a live UI out of the engine. This closes the inspection
gap without importing anything: run stats go to a JSON file or a
self-contained single-file HTML report, viewable after the process exits.
"""

from __future__ import annotations

import html
import json
from pathlib import Path
from typing import Any

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }}
h1 {{ font-size: 1.3rem; }}
table {{ border-collapse: collapse; margin-top: 1rem; }}
th, td {{ border: 1px solid #ccc; padding: 0.4rem 0.8rem; text-align: right; }}
th {{ background: #f3f3f3; }}
td:first-child, th:first-child {{ text-align: left; }}
</style></head><body>
<h1>{title}</h1>
<table>
<tr>{header}</tr>
{rows}
</table>
</body></html>
"""


def history_to_json(history: list[dict[str, Any]], path: str) -> None:
    """Dump run history (list of per-run stats dicts) to a JSON file."""
    target = Path(path)
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(json.dumps(history, indent=2, default=str))


def history_to_html(history: list[dict[str, Any]], path: str, title: str = "pipeline runs") -> None:
    """Render run history as one dependency-free HTML file."""
    cols: list[str] = []
    for run in history:
        for k in run:
            if k not in cols:
                cols.append(k)
    header = "".join(f"<th>{html.escape(str(c))}</th>" for c in cols)
    rows = "\n".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(run.get(c, '')))}</td>" for c in cols)
        + "</tr>"
        for run in history
    )
    target = Path(path)
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(_PAGE.format(title=html.escape(title), header=header, rows=rows))
