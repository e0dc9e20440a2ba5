"""Static HTML report writer — the last reference deliverable.

Renders the check summary + a capped mismatch slice into a single
self-contained HTML page with the reference report's structure: a card
with header pills, a PASS/WARN/FAIL check table, and a "Mismatched
Cells (k of n)" table (reference ``sample-report.html``; the browser
engine builds the same DOM in ``docs/script.js:349-370``).

Everything here is driver-side string formatting over ALREADY-COMPUTED
tiny rows: the check summary (a handful of rows) and the proof-capped
mismatch slice (``INLINE_MAX_ROWS`` max, src/validate.py:47). No Spark
job runs in this module — the header-pill counts are passed in AS DATA
(``check_summary_with_counts`` returns them alongside the summary
frame), never re-parsed out of the notes strings.
"""

from __future__ import annotations

import html
from collections.abc import Mapping, Sequence

_STATUS_CLASS = {"PASS": "ok", "WARN": "warn", "FAIL": "fail"}

# the reference report's stylesheet, condensed (sample-report.html:7-27)
_CSS = """
    body { font-family: system-ui, -apple-system, Segoe UI, Roboto, Arial, sans-serif; margin: 2rem; color:#111; }
    .card { border: 1px solid #e5e7eb; border-radius: 12px; padding: 1.5rem; max-width: 1100px; }
    h1 { margin: 0 0 0.5rem 0; font-size: 2.2rem; }
    .pill { display:inline-block; background:#f3f4f6; border:1px solid #e5e7eb; padding:.35rem .6rem; border-radius:999px; margin:.2rem .25rem; font-size:.95rem; }
    table { border-collapse: collapse; width: 100%; margin-top: 1rem; }
    th, td { border: 1px solid #e5e7eb; padding: 10px; text-align: left; }
    th { background: #f9fafb; }
    .ok { color: #16a34a; font-weight: 700; }
    .warn { color: #d97706; font-weight: 700; }
    .fail { color: #dc2626; font-weight: 700; }
    .section { margin-top: 1.25rem; }
    .small { font-size: .9rem; color:#6b7280; }
""".rstrip()

def _esc(v) -> str:
    return html.escape("" if v is None else str(v))


def _pill(label: str, value) -> str:
    return f'<span class="pill">{_esc(label)}: <strong>{_esc(value)}</strong></span>'


def _check_row(r: Mapping) -> str:
    status = str(r["status"])
    cls = _STATUS_CLASS.get(status, "warn")
    cells = [
        f"<td>{_esc(r['check'])}</td>",
        f'<td><span class="{cls}">{_esc(status)}</span></td>',
        f"<td>{_esc(r['notes'])}</td>",
    ]
    if "verified" in r:
        mark = "&#10003; " + _esc(r.get("verified_by") or "") if r["verified"] else ""
        cells.append(f"<td>{mark.strip()}</td>")
    return "<tr>" + "".join(cells) + "</tr>"


def render_report(
    pk: str,
    columns: Sequence[str],
    check_rows: Sequence[Mapping],
    mismatch_cols: Sequence[str],
    mismatch_rows: Sequence[Sequence],
    title: str = "Data Migration Validation Report",
    subtitle: str = "",
    counts: Mapping[str, int] | None = None,
) -> str:
    """Render the full standalone page. ``check_rows`` are the collected
    check-summary rows (optionally sign-off-annotated); ``mismatch_rows``
    are the proof-capped slice (values in ``mismatch_cols`` order);
    ``counts`` are the header-pill numbers from
    ``check_summary_with_counts`` (omit to render without count pills)."""
    counts = dict(counts or {})
    pills = [_pill(f"Primary key", pk)]
    if columns:
        pills.append(f'<span class="pill">Columns: {_esc(", ".join(columns))}</span>')
    for label, key in [
        ("OLD total", "old_total"),
        ("NEW total", "new_total"),
        ("Only in OLD", "only_in_old"),
        ("Only in NEW", "only_in_new"),
        ("Mismatches", "mismatches"),
    ]:
        if key in counts:
            pills.append(_pill(label, counts[key]))

    check_header = "<tr><th>Check</th><th>Status</th><th>Notes</th>"
    if check_rows and "verified" in check_rows[0]:
        check_header += "<th>Sign-off</th>"
    check_header += "</tr>"

    n_total = counts.get("mismatches", len(mismatch_rows))
    mism_section = ""
    if mismatch_cols:
        header = "".join(f"<th>{_esc(c)}</th>" for c in mismatch_cols)
        body = "\n".join(
            "<tr>" + "".join(f"<td>{_esc(v)}</td>" for v in row) + "</tr>"
            for row in mismatch_rows
        )
        mism_section = f"""
    <div class="section">
      <h2>Mismatched Cells ({len(mismatch_rows)} of {n_total})</h2>
      <p class="small">Cells where OLD and NEW values differ for the same {_esc(pk)}.</p>
      <table class="dataframe">
        <thead><tr>{header}</tr></thead>
        <tbody>
{body}
        </tbody>
      </table>
    </div>"""

    sub = f'\n    <p class="small">{_esc(subtitle)}</p>' if subtitle else ""
    return f"""<!doctype html>
<html>
<head>
  <meta charset="utf-8">
  <title>{_esc(title)}</title>
  <meta name="viewport" content="width=device-width, initial-scale=1">
  <style>{_CSS}
  </style>
</head>
<body>
  <div class="card">
    <h1>{_esc(title)}</h1>{sub}
    <div>
      {' '.join(pills)}
    </div>
    <table>
      <thead>
        {check_header}
      </thead>
      <tbody>
{chr(10).join(_check_row(r) for r in check_rows)}
      </tbody>
    </table>{mism_section}
  </div>
</body>
</html>
"""
