"""Static-HTML dashboard sink (reference K6 —
/root/reference/generate_html.py:5-218).

Reproduced semantics, not markup: the reference reads the consolidated
CSV, defaults missing columns to '', sorts by (time desc, exchange asc)
(generate_html.py:29-35), embeds the records as a JSON blob in a static
page, and renders client-filterable spot/futures tables with a date
filter (F5, generate_html.py:139-185).  The engine renders the SAME
record set from the consolidated DataFrame; filtering happens in a few
lines of vanilla JS over the embedded JSON.  K7 (FastAPI serving) stays
out of scope — a static artifact needs no server.
"""

from __future__ import annotations

import html
import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DASHBOARD_COLS = [
    "release_time", "time", "exchange", "symbol", "type", "action",
    "title", "url", "comments",
]

# Chinese date form that survives consolidation (e.g. '2025年10月14日') —
# the reference parses times with pd.to_datetime before sorting/filtering
# (generate_html.py:29-35), so raw-string comparison would diverge.
_CN_DATE = r"^(\d{4})年(\d{1,2})月(\d{1,2})日"


def _parsed_time(col: F.Column) -> F.Column:
    """``time`` parsed to a DATE the way the reference parses it
    (generate_html.py:29-35 pd.to_datetime; unparseable → null, sorted
    last and excluded from the date filter).  The 年/月/日 form is
    normalized to ISO first; everything else goes through
    try_to_timestamp (null on failure, never an ANSI error)."""
    cn = F.when(
        col.rlike(_CN_DATE),
        F.format_string(
            "%04d-%02d-%02d",
            F.regexp_extract(col, _CN_DATE, 1).cast("int"),
            F.regexp_extract(col, _CN_DATE, 2).cast("int"),
            F.regexp_extract(col, _CN_DATE, 3).cast("int"),
        ),
    )
    return F.try_to_timestamp(F.coalesce(cn, col)).cast("date")

_PAGE = """<!DOCTYPE html>
<html lang="zh-CN"><head><meta charset="utf-8">
<title>cex_crawler_spark announcements</title>
<style>
body{{font-family:sans-serif;margin:1.5em;background:#fafafa}}
table{{border-collapse:collapse;width:100%;margin-bottom:1em;background:#fff}}
th,td{{border:1px solid #ccc;padding:4px 8px;font-size:13px;text-align:left}}
th{{background:#eee}}
h2{{margin-top:1em}}
</style></head><body>
<h1>Announcements ({n} records, generated {run_date})</h1>
<label>date filter (time ≥): <input id="datefilter" type="date"></label>
<div id="tables"></div>
<script>
const DATA = {data_json};
const COLS = {cols_json};
function render(minDate) {{
  const groups = {{"现货": [], "合约": []}};
  for (const r of DATA) {{
    // _t is the server-parsed ISO date; unparseable times are excluded
    // from a date-filtered view (reference filterByDate semantics —
    // generate_html.py:136 `new Date(...)` invalid → filtered out)
    if (minDate && (!r._t || r._t < minDate)) continue;
    (groups[r.type] || (groups[r.type] = [])).push(r);
  }}
  let out = "";
  for (const [typ, rows] of Object.entries(groups)) {{
    out += `<h2>${{typ}} (${{rows.length}})</h2><table><tr>` +
      COLS.map(c => `<th>${{c}}</th>`).join("") + "</tr>" +
      rows.map(r => "<tr>" + COLS.map(c => `<td>${{r[c] ?? ""}}</td>`)
        .join("") + "</tr>").join("") + "</table>";
  }}
  document.getElementById("tables").innerHTML = out;
}}
document.getElementById("datefilter").addEventListener(
  "input", e => render(e.target.value));
render(null);
</script></body></html>
"""


def render_dashboard_html(
    consolidated: DataFrame, run_date: str, out_path: str | Path
) -> int:
    """Render the consolidated announcements to one static HTML file;
    returns the record count.  Sort = (parsed time desc nulls-last,
    exchange asc) — the reference sorts on pd.to_datetime(time) with NaT
    last (generate_html.py:29-35), so Chinese 年/月/日 times order by
    their date, not lexicographically.  Records are HTML-escaped then
    embedded as JSON (plus ``_t``, the parsed ISO date the client date
    filter compares against) for the client-side date filter (F5)."""
    rows = (
        consolidated.select(
            *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c)
              for c in DASHBOARD_COLS],
            F.coalesce(
                F.date_format(_parsed_time(F.col("time")), "yyyy-MM-dd"),
                F.lit(""),
            ).alias("_t"),
        )
        .orderBy(
            F.desc_nulls_last(_parsed_time(F.col("time"))), F.asc("exchange")
        )
        .collect()
    )
    records = [
        {c: html.escape(r[c]) for c in [*DASHBOARD_COLS, "_t"]} for r in rows
    ]
    page = _PAGE.format(
        n=len(records),
        run_date=html.escape(run_date),
        data_json=json.dumps(records, ensure_ascii=False),
        cols_json=json.dumps(DASHBOARD_COLS),
    )
    Path(out_path).write_text(page, encoding="utf-8")
    return len(records)
