"""Built-in query UI served at ``/`` (reference parity:
querier/server.go:233-269 serves an embedded SPA; ``DisableUI`` gate).

Original single-file page (not derived from the reference's ui.html) with
the reference UI's behaviors re-implemented: query editor with Ctrl+Enter
run, database dropdown refreshed from SHOW DATABASES (ui.html:189), a
Results/Raw-JSON tab pair (ui.html:213-214), localStorage-backed query
history with click-to-load (ui.html:323-379, 20-item cap), a clear
button, and execution-time / response-size readouts (ui.html:460,
477-480). Plus a format toggle (json/ndjson) exercising the server's
streamed edge. Disable with GIGAPI_DISABLE_UI=1.
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
  .row { display: flex; gap: .75rem; align-items: center; margin: .5rem 0 1rem;
         flex-wrap: wrap; }
  select, input[type=text] { padding: .25rem; }
  button { padding: .4rem 1.2rem; }
  #meta { color: #888; font-size: .85rem; margin-left: auto; }
  table { border-collapse: collapse; font-size: .85rem; width: 100%; }
  th, td { border: 1px solid #8884; padding: .25rem .5rem; text-align: left;
           font-family: ui-monospace, monospace; }
  th { position: sticky; top: 0; background: Canvas; }
  #err { color: #c33; white-space: pre-wrap; font-family: ui-monospace, monospace; }
  #wrap, #raw { max-height: 60vh; overflow: auto; }
  #raw { white-space: pre; font-family: ui-monospace, monospace; font-size: .8rem; }
  .tabs { display: flex; gap: 0; border-bottom: 1px solid #8884; margin: .75rem 0; }
  .tabs button { border: none; background: none; padding: .4rem 1rem;
                 cursor: pointer; opacity: .6; }
  .tabs button.active { border-bottom: 2px solid #67c; opacity: 1; }
  #hist { margin-top: 1.5rem; }
  #hist h2 { font-size: .95rem; }
  .hitem { padding: .35rem .5rem; border: 1px solid #8883; border-radius: 4px;
           margin: .25rem 0; cursor: pointer; font-family: ui-monospace, monospace;
           font-size: .8rem; white-space: nowrap; overflow: hidden;
           text-overflow: ellipsis; }
  .hitem:hover { background: #8882; }
  .hdate { color: #888; font-size: .7rem; margin-left: .5rem; }
</style>
</head>
<body>
<h1>gigapi-querier-spark</h1>
<textarea id="q" spellcheck="false">SELECT 1 AS x</textarea>
<div class="row">
  <label>db <select id="db"></select></label>
  <button id="refreshDb" title="refresh database list">&#x21bb;</button>
  <label>format <select id="fmt">
    <option value="json">json</option>
    <option value="ndjson">ndjson</option>
  </select></label>
  <button id="run">Run</button>
  <button id="clear">Clear</button>
  <span id="meta"></span>
</div>
<div id="err"></div>
<div class="tabs">
  <button id="tabResults" class="active">Results</button>
  <button id="tabRaw">Raw</button>
</div>
<div id="wrap"><table id="out"></table></div>
<div id="raw" hidden></div>
<div id="hist"><h2>Query history</h2><div id="histItems"></div></div>
<script>
const $ = (id) => document.getElementById(id);
const MAX_HISTORY = 20;

function loadHistory() {
  try { return JSON.parse(localStorage.getItem("queryHistory") || "[]"); }
  catch { return []; }
}
function saveHistory(q, db) {
  let h = loadHistory().filter((it) => it.q !== q || it.db !== db);
  h.unshift({q, db, at: Date.now()});
  h = h.slice(0, MAX_HISTORY);
  localStorage.setItem("queryHistory", JSON.stringify(h));
  renderHistory();
}
function renderHistory() {
  const box = $("histItems");
  box.innerHTML = "";
  const h = loadHistory();
  if (!h.length) { box.textContent = "(empty)"; return; }
  for (const it of h) {
    const d = document.createElement("div");
    d.className = "hitem";
    d.textContent = it.q;
    const when = document.createElement("span");
    when.className = "hdate";
    when.textContent = new Date(it.at).toLocaleString();
    d.appendChild(when);
    d.addEventListener("click", () => {
      $("q").value = it.q;
      if ([...$("db").options].some((o) => o.value === it.db)) $("db").value = it.db;
    });
    box.appendChild(d);
  }
}

async function refreshDbs() {
  try {
    const resp = await fetch("/query", {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({query: "SHOW DATABASES"}),
    });
    const data = await resp.json();
    const rows = Array.isArray(data) ? data : (data.results || []);
    const sel = $("db");
    const prev = sel.value;
    sel.innerHTML = "";
    for (const r of rows) {
      const o = document.createElement("option");
      o.value = o.textContent = r.database_name;
      sel.appendChild(o);
    }
    if (!rows.length) {
      const o = document.createElement("option");
      o.value = o.textContent = "mydb";
      sel.appendChild(o);
    }
    if ([...sel.options].some((o) => o.value === prev)) sel.value = prev;
  } catch (e) { /* leave the list as-is */ }
}

function showTab(which) {
  $("tabResults").classList.toggle("active", which === "results");
  $("tabRaw").classList.toggle("active", which === "raw");
  $("wrap").hidden = which !== "results";
  $("raw").hidden = which !== "raw";
}

async function run() {
  $("err").textContent = ""; $("out").innerHTML = ""; $("raw").textContent = "";
  $("meta").textContent = "\\u2026";
  const fmt = $("fmt").value;
  const db = $("db").value || "mydb";
  const t0 = performance.now();
  let resp, text;
  try {
    resp = await fetch(`/query?db=${encodeURIComponent(db)}&format=${fmt}`, {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({query: $("q").value}),
    });
    text = await resp.text();
  } catch (e) { $("err").textContent = String(e); $("meta").textContent = ""; return; }
  const ms = (performance.now() - t0).toFixed(0);
  $("meta").textContent = `${ms} ms \\u00b7 ${text.length} bytes`;
  $("raw").textContent = text.slice(0, 200000);
  saveHistory($("q").value, db);
  let rows;
  if (fmt === "ndjson") {
    if (!resp.ok) { $("err").textContent = text; return; }
    rows = text.split("\\n").filter(Boolean).map((l) => {
      try { return JSON.parse(l); } catch { return null; }
    }).filter(Boolean);
  } else {
    let data;
    try { data = JSON.parse(text); } catch { $("err").textContent = text; return; }
    if (!resp.ok || (data && data.error)) {
      $("err").textContent = (data && data.error) || text; return;
    }
    rows = Array.isArray(data) ? data : (data.results || []);
  }
  if (!rows.length) { $("err").textContent = "(0 rows)"; return; }
  const cols = Object.keys(rows[0]);
  const table = $("out");
  table.innerHTML = "<tr>" + cols.map(c => `<th>${c}</th>`).join("") + "</tr>";
  for (const r of rows.slice(0, 1000)) {
    const tr = document.createElement("tr");
    tr.innerHTML = cols.map(c => `<td>${r[c] === null ? "\\u2205" : String(r[c])}</td>`).join("");
    table.appendChild(tr);
  }
  if (rows.length > 1000) $("err").textContent = `(showing 1000 of ${rows.length} rows)`;
}
$("run").addEventListener("click", run);
$("clear").addEventListener("click", () => {
  $("q").value = ""; $("out").innerHTML = ""; $("raw").textContent = "";
  $("err").textContent = ""; $("meta").textContent = "";
});
$("tabResults").addEventListener("click", () => showTab("results"));
$("tabRaw").addEventListener("click", () => showTab("raw"));
$("q").addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") run();
});
refreshDbs();
renderHistory();
$("refreshDb").addEventListener("click", refreshDbs);
</script>
</body>
</html>
"""
