"""Minimal static Data Docs renderer + checkpoint action.

What the reference builds with a renderer/view/site-builder pipeline
(render/renderer/page_renderer.py:36 ValidationResultsPageRenderer →
_render_validation_header :358 / _render_validation_statistics :598 /
per-expectation content blocks; render/renderer/site_builder.py writes
the site; checkpoint/actions.py:1001 UpdateDataDocsAction triggers it
after each validation) is re-expressed here as two pure functions and
one action:

- :func:`render_suite_result_page` — one HTML page for one
  ``ExpectationSuiteValidationResult``: header (suite name, run id,
  overall status), the statistics block, and one row per expectation
  with its observed value / unexpected counts and a violations sample
  (``partial_unexpected_list`` / ``partial_unexpected_counts``, the
  same fields ``format_map_output`` emits — core/result.py).
- :func:`build_index` — ``index.html`` over every rendered run,
  newest first (stand-in for site_index_page_renderer.py).
- :class:`UpdateDataDocsAction` — checkpoint action writing
  ``<site_dir>/validations/<run_id>.html`` and refreshing the index.

Everything is driver-side string formatting over a result that has
already been collected and bounded (partial lists are capped by
result_format upstream), so rendering cost is O(expectations), never
O(rows) — safe at any table scale.
"""

from __future__ import annotations

import html
import json
import os
from typing import Any, Dict, List, Optional

from ..checkpoint.actions import ValidationAction

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       margin: 2rem auto; max-width: 72rem; color: #1a202c; }
h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 1.5rem; }
table { border-collapse: collapse; width: 100%; font-size: 0.88rem; }
th, td { border: 1px solid #cbd5e0; padding: 0.35rem 0.55rem;
         text-align: left; vertical-align: top; }
th { background: #edf2f7; }
.pass { color: #276749; font-weight: 600; }
.fail { color: #9b2c2c; font-weight: 600; }
.badge { display: inline-block; padding: 0.1rem 0.5rem;
         border-radius: 0.25rem; color: #fff; }
.badge.ok { background: #2f855a; } .badge.bad { background: #c53030; }
.stats td:first-child { font-weight: 600; width: 18rem; }
code { background: #f7fafc; padding: 0 0.2rem; }
.sample { font-size: 0.8rem; color: #4a5568; }
.muted { color: #718096; }
"""


def _esc(value: Any) -> str:
    if value is None:
        return "<span class='muted'>—</span>"
    return html.escape(str(value))


def _fmt_number(value: Any) -> str:
    if isinstance(value, float):
        return _esc(round(value, 5))
    return _esc(value)


def _observed(result: Dict[str, Any]) -> str:
    """The 'observed value' cell, mirroring what the reference's
    content blocks surface: observed_value for aggregate expectations,
    unexpected count/percent for map expectations."""
    if not result:
        return _esc(None)
    if "observed_value" in result:
        return _fmt_number(result["observed_value"])
    if "unexpected_count" in result:
        pct = result.get("unexpected_percent")
        pct_txt = f" ({round(pct, 4)}%)" if pct is not None else ""
        return (
            f"{_esc(result['unexpected_count'])} unexpected"
            f"{html.escape(pct_txt)}"
            f" of {_esc(result.get('element_count'))}"
        )
    return _esc(None)


def _violation_sample(result: Dict[str, Any]) -> str:
    """Bounded violations sample: prefer SUMMARY's value/count pairs,
    fall back to the BASIC partial list. Both are already capped by
    partial_unexpected_count upstream (core/result.py
    format_map_output), so this never materializes full columns."""
    if not result:
        return ""
    counts = result.get("partial_unexpected_counts")
    if counts:
        items = ", ".join(
            f"{_esc(c.get('value'))}×{_esc(c.get('count'))}"
            for c in counts
            if isinstance(c, dict)
        )
        return f"<div class='sample'>top violations: {items}</div>"
    partial = result.get("partial_unexpected_list")
    if partial:
        items = ", ".join(_esc(v) for v in partial[:20])
        return f"<div class='sample'>sample violations: {items}</div>"
    return ""


def _kwargs_cell(kwargs: Dict[str, Any]) -> str:
    shown = {k: v for k, v in kwargs.items() if k != "result_format"}
    return f"<code>{_esc(json.dumps(shown, default=str, sort_keys=True))}</code>"


def render_suite_result_page(
    result,
    suite_name: str = "suite",
    run_id: str = "",
) -> str:
    """Render one ExpectationSuiteValidationResult to a standalone
    HTML page (header + statistics + per-expectation table), the
    static equivalent of the reference's ValidationResultsPageRenderer
    (page_renderer.py:101-131 render())."""
    stats = dict(result.statistics or {})
    ok = bool(result.success)
    badge = (
        "<span class='badge ok'>Succeeded</span>"
        if ok
        else "<span class='badge bad'>Failed</span>"
    )
    rows: List[str] = []
    for evr in result.results:
        cfg = evr.expectation_config
        etype = cfg.expectation_type if cfg else "(unknown)"
        column = (cfg.kwargs.get("column") if cfg else None) or (
            cfg.kwargs.get("column_list") if cfg else None
        )
        status = (
            "<td class='pass'>✓ pass</td>"
            if evr.success
            else "<td class='fail'>✗ fail</td>"
        )
        exc = ""
        if evr.exception_info.get("raised_exception"):
            exc = (
                "<div class='sample fail'>exception: "
                f"{_esc(evr.exception_info.get('exception_message'))}</div>"
            )
        rows.append(
            "<tr>"
            f"{status}"
            f"<td><code>{_esc(etype)}</code></td>"
            f"<td>{_esc(column)}</td>"
            f"<td>{_kwargs_cell(cfg.kwargs if cfg else {})}</td>"
            f"<td>{_observed(evr.result)}"
            f"{_violation_sample(evr.result)}{exc}</td>"
            "</tr>"
        )
    stat_rows = "".join(
        f"<tr><td>{_esc(k.replace('_', ' '))}</td>"
        f"<td>{_fmt_number(v)}</td></tr>"
        for k, v in stats.items()
    )
    run_info = (
        f"<p class='muted'>run id: <code>{_esc(run_id)}</code></p>"
        if run_id
        else ""
    )
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Validation — {_esc(suite_name)} — {_esc(run_id)}</title>
<style>{_CSS}</style></head><body>
<h1>Validation result: {_esc(suite_name)} {badge}</h1>
{run_info}
<h2>Statistics</h2>
<table class="stats">{stat_rows}</table>
<h2>Expectations ({len(result.results)})</h2>
<table>
<tr><th>Status</th><th>Expectation</th><th>Column</th>
<th>Arguments</th><th>Observed / violations</th></tr>
{''.join(rows)}
</table>
</body></html>
"""


def build_index(site_dir: str) -> str:
    """Rebuild ``index.html`` from the pages under
    ``<site_dir>/validations/`` (newest mtime first) — the minimal
    stand-in for the reference's site_index_page_renderer.py."""
    vdir = os.path.join(site_dir, "validations")
    entries: List[str] = []
    if os.path.isdir(vdir):
        pages = sorted(
            (p for p in os.listdir(vdir) if p.endswith(".html")),
            key=lambda p: os.path.getmtime(os.path.join(vdir, p)),
            reverse=True,
        )
        for page in pages:
            name = _esc(page[: -len(".html")])
            entries.append(
                f"<li><a href='validations/{html.escape(page)}'>"
                f"{name}</a></li>"
            )
    body = (
        f"<ul>{''.join(entries)}</ul>"
        if entries
        else "<p class='muted'>No validation runs rendered yet.</p>"
    )
    index_html = f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Data Docs</title><style>{_CSS}</style></head><body>
<h1>Data Docs — validation runs</h1>
{body}
</body></html>
"""
    path = os.path.join(site_dir, "index.html")
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(site_dir, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(index_html)
    os.replace(tmp, path)
    return path


class UpdateDataDocsAction(ValidationAction):
    """Checkpoint action: render the run's result page and refresh the
    site index (ref checkpoint/actions.py:1001 UpdateDataDocsAction,
    minus the DataContext/site-config indirection)."""

    name = "UpdateDataDocsAction"

    def __init__(self, site_dir: str, suite_name: Optional[str] = None):
        self.site_dir = site_dir
        self.suite_name = suite_name

    def run(self, result, runner) -> Dict[str, str]:
        suite_name = self.suite_name or getattr(
            getattr(runner, "suite", None), "name", None
        ) or "suite"
        page = render_suite_result_page(
            result, suite_name=suite_name, run_id=runner.run_id
        )
        vdir = os.path.join(self.site_dir, "validations")
        os.makedirs(vdir, exist_ok=True)
        path = os.path.join(vdir, f"{runner.run_id}.html")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(page)
        os.replace(tmp, path)
        index = build_index(self.site_dir)
        return {"page": path, "index": index}
