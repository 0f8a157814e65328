"""Minimal built-in query UI served at ``/`` (reference parity:
querier/server.go:233-269 serves an embedded SPA; ``DisableUI`` gate).

Original single-file page (not derived from the reference's ui.html):
query editor → POST /query → results table, with client-side execution
time and response size readouts (the reference UI displays the same two
numbers, ui.html:460,477-480). Disable with GIGAPI_DISABLE_UI=1.
"""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>gigapi-querier-spark</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 72rem;
         padding: 0 1rem; }
  h1 { font-size: 1.2rem; }
  textarea { width: 100%; min-height: 7rem; font-family: ui-monospace, monospace;
             font-size: .9rem; padding: .5rem; box-sizing: border-box; }
  .row { display: flex; gap: .75rem; align-items: center; margin: .5rem 0 1rem; }
  input[type=text] { width: 10rem; }
  button { padding: .4rem 1.2rem; }
  #meta { color: #888; font-size: .85rem; margin-left: auto; }
  table { border-collapse: collapse; font-size: .85rem; width: 100%; }
  th, td { border: 1px solid #8884; padding: .25rem .5rem; text-align: left;
           font-family: ui-monospace, monospace; }
  th { position: sticky; top: 0; background: Canvas; }
  #err { color: #c33; white-space: pre-wrap; font-family: ui-monospace, monospace; }
  #wrap { max-height: 60vh; overflow: auto; }
</style>
</head>
<body>
<h1>gigapi-querier-spark</h1>
<textarea id="q" spellcheck="false">SELECT 1 AS x</textarea>
<div class="row">
  <label>db <input type="text" id="db" value="mydb"></label>
  <button id="run">Run</button>
  <span id="meta"></span>
</div>
<div id="err"></div>
<div id="wrap"><table id="out"></table></div>
<script>
const $ = (id) => document.getElementById(id);
async function run() {
  $("err").textContent = ""; $("out").innerHTML = ""; $("meta").textContent = "…";
  const t0 = performance.now();
  let resp, text;
  try {
    resp = await fetch(`/query?db=${encodeURIComponent($("db").value)}`, {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({query: $("q").value}),
    });
    text = await resp.text();
  } catch (e) { $("err").textContent = String(e); $("meta").textContent = ""; return; }
  const ms = (performance.now() - t0).toFixed(0);
  $("meta").textContent = `${ms} ms · ${text.length} bytes`;
  let data;
  try { data = JSON.parse(text); } catch { $("err").textContent = text; return; }
  if (!resp.ok || (data && data.error)) {
    $("err").textContent = (data && data.error) || text; return;
  }
  const rows = Array.isArray(data) ? data : (data.results || []);
  if (!rows.length) { $("err").textContent = "(0 rows)"; return; }
  const cols = Object.keys(rows[0]);
  const table = $("out");
  table.innerHTML = "<tr>" + cols.map(c => `<th>${c}</th>`).join("") + "</tr>";
  for (const r of rows.slice(0, 1000)) {
    const tr = document.createElement("tr");
    tr.innerHTML = cols.map(c => `<td>${r[c] === null ? "∅" : String(r[c])}</td>`).join("");
    table.appendChild(tr);
  }
  if (rows.length > 1000) $("err").textContent = `(showing 1000 of ${rows.length} rows)`;
}
$("run").addEventListener("click", run);
$("q").addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") run();
});
</script>
</body>
</html>
"""
