"""Observatory single-page UI (vanilla JS, hash-routed).

Parity: the top views of the reference's React observatory
(``observatory/src/PoliciesPage.tsx``, ``EpisodeDetailPage.tsx``,
``SQLQuery.tsx`` and the dashboard heatmap), rebuilt as one dependency-free
static page served by ``web/app_backend.py`` over its already
route-conformant JSON API:

- ``#/policies``  -> GET  /stats/policies
- ``#/episodes``  -> POST /stats/episodes/query (+ per-episode metrics via
                     GET /stats/episodes/<id>/metrics)
- ``#/heatmap``   -> GET  /dashboard/heatmap?metric=...
- ``#/sql``       -> GET /sql/tables, POST /sql/query (SELECT-only)
"""

OBSERVATORY_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>metta_tpu observatory</title>
<style>
  :root { --fg:#1a1a2e; --muted:#6b7280; --line:#e5e7eb; --acc:#4f46e5; }
  body { font: 14px/1.5 system-ui, sans-serif; color: var(--fg);
         margin: 0; background: #fafafa; }
  nav { display: flex; gap: 4px; padding: 10px 16px; background: #fff;
        border-bottom: 1px solid var(--line); align-items: center; }
  nav b { margin-right: 16px; }
  nav a { padding: 6px 12px; border-radius: 6px; color: var(--muted);
          text-decoration: none; }
  nav a.on { background: var(--acc); color: #fff; }
  main { padding: 16px; max-width: 1100px; margin: 0 auto; }
  table { border-collapse: collapse; background: #fff; width: 100%;
          border: 1px solid var(--line); }
  th, td { border-bottom: 1px solid var(--line); padding: 6px 10px;
           text-align: left; font-variant-numeric: tabular-nums; }
  th { background: #f3f4f6; position: sticky; top: 0; }
  tr.click { cursor: pointer; }
  tr.click:hover { background: #eef2ff; }
  .cell { text-align: right; }
  input, select, textarea, button {
    font: inherit; padding: 6px 8px; border: 1px solid var(--line);
    border-radius: 6px; background: #fff; }
  button { background: var(--acc); color: #fff; border: 0; cursor: pointer; }
  .bar { display: flex; gap: 8px; margin: 0 0 12px; flex-wrap: wrap; }
  .err { color: #b91c1c; white-space: pre-wrap; }
  #detail { margin-top: 16px; }
  h2 { font-size: 16px; }
  textarea { width: 100%; min-height: 90px; font-family: ui-monospace,
             monospace; }
</style></head><body>
<nav><b>metta_tpu observatory</b>
  <a href="#/policies" data-v="policies">Policies</a>
  <a href="#/episodes" data-v="episodes">Episodes</a>
  <a href="#/heatmap" data-v="heatmap">Heatmap</a>
  <a href="#/leaderboard" data-v="leaderboard">Leaderboard</a>
  <a href="#/tasks" data-v="tasks">Eval&nbsp;Tasks</a>
  <a href="#/tournament" data-v="tournament">Tournament</a>
  <a href="#/sql" data-v="sql">SQL</a>
</nav>
<main id="main"></main>
<script>
const $ = (h) => { const d = document.createElement('div'); d.innerHTML = h; return d; };
const esc = (s) => String(s ?? '').replace(/[&<>"]/g,
  c => ({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;'}[c]));
const J = async (url, body) => {
  const r = await fetch(url, body === undefined ? {} : {
    method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(body)});
  if (!r.ok) throw new Error(url + ': HTTP ' + r.status);
  return r.json();
};
const table = (cols, rows, rowAttr) => {
  let t = '<table><tr>' + cols.map(c => '<th>' + esc(c) + '</th>').join('') + '</tr>';
  for (const row of rows) {
    t += '<tr ' + (rowAttr ? rowAttr(row) : '') + '>' +
      cols.map(c => '<td>' + esc(row[c]) + '</td>').join('') + '</tr>';
  }
  return t + '</table>';
};

const views = {
  async policies(m) {
    const d = await J('/stats/policies');
    m.innerHTML = '<h2>Policies (' + d.policies.length + ')</h2>' +
      table(['policy_uri', 'episodes', 'last_seen'], d.policies,
            r => 'class="click" data-p="' + esc(r.policy_uri) + '"');
    m.querySelectorAll('tr.click').forEach(tr => tr.onclick = () =>
      location.hash = '#/episodes?policy_uri=' + encodeURIComponent(tr.dataset.p));
  },

  async episodes(m, params) {
    const filt = {limit: 200};
    for (const k of ['policy_uri', 'sim_suite', 'sim_name'])
      if (params.get(k)) filt[k] = params.get(k);
    const d = await J('/stats/episodes/query', filt);
    const cols = d.episodes.length ?
      Object.keys(d.episodes[0]).filter(k => k !== 'attributes') :
      ['episode_id', 'policy_uri', 'sim_suite', 'sim_name'];
    m.innerHTML = '<h2>Episodes (' + d.episodes.length + ')</h2>' +
      '<div class="bar"><input id="fp" placeholder="policy_uri" value="' +
      esc(filt.policy_uri || '') + '"><input id="fs" placeholder="sim_suite" value="' +
      esc(filt.sim_suite || '') + '"><button id="go">Filter</button></div>' +
      table(cols, d.episodes, r => 'class="click" data-e="' + esc(r.episode_id) + '"') +
      '<div id="detail"></div>';
    m.querySelector('#go').onclick = () => {
      const q = new URLSearchParams();
      if (m.querySelector('#fp').value) q.set('policy_uri', m.querySelector('#fp').value);
      if (m.querySelector('#fs').value) q.set('sim_suite', m.querySelector('#fs').value);
      location.hash = '#/episodes?' + q;
    };
    m.querySelectorAll('tr.click').forEach(tr => tr.onclick = async () => {
      const d2 = await J('/stats/episodes/' + tr.dataset.e + '/metrics');
      m.querySelector('#detail').innerHTML =
        '<h2>Episode ' + esc(tr.dataset.e) + '</h2>' +
        '<h3>Game metrics</h3>' + table(['metric', 'value'], d2.game_metrics) +
        '<h3>Agent metrics</h3>' +
        table(['agent_id', 'metric', 'value'], d2.agent_metrics);
    });
  },

  async leaderboard(m, params) {
    const metric = params.get('metric') || 'reward';
    m.innerHTML = '<h2>Policy leaderboard</h2>' +
      '<div class="bar"><input id="lb" value="' + esc(metric) + '">' +
      '<button id="go">Load</button></div><div id="tbl"></div>';
    m.querySelector('#go').onclick = () =>
      location.hash = '#/leaderboard?metric=' + encodeURIComponent(m.querySelector('#lb').value);
    const d = await J('/leaderboard?metric=' + encodeURIComponent(metric));
    m.querySelector('#tbl').innerHTML =
      table(['rank', 'policy_uri', 'episodes', 'value'], d.entries);
  },

  async tasks(m) {
    let d;
    try { d = await J('/tasks'); }
    catch (e) { m.innerHTML = '<h2>Eval tasks</h2><p class="err">task queue ' +
      'not configured on this backend</p>'; return; }
    const rows = d.tasks.map(t => ({
      task_id: t.task_id, status: t.status, policy_uri: t.policy_uri,
      assignee: t.assignee || '', sims: (t.simulations || [])
        .map(s => s.name).join(', '),
      result: t.result ? JSON.stringify(t.result).slice(0, 60) : ''}));
    m.innerHTML = '<h2>Eval tasks (' + rows.length + ')</h2>' +
      '<div class="bar"><input id="tp" placeholder="policy_uri to evaluate">' +
      '<button id="mk">Create task</button></div>' +
      table(['task_id', 'status', 'policy_uri', 'assignee', 'sims', 'result'], rows);
    m.querySelector('#mk').onclick = async () => {
      const uri = m.querySelector('#tp').value;
      if (!uri) return;
      await J('/tasks', {policy_uri: uri, simulations: [{name: 'basic'}]});
      location.reload();
    };
  },

  async tournament(m, params) {
    const d = await J('/tournament/seasons');
    const season = params.get('season') ||
      (d.seasons[0] ? d.seasons[0].name : null);
    let html = '<h2>Tournament</h2><div class="bar">' +
      d.seasons.map(s => '<a href="#/tournament?season=' + esc(s.name) + '">' +
        esc(s.name) + '</a>').join(' ') +
      ' <input id="ns" placeholder="new season"><button id="mk">Create</button></div>';
    if (season) {
      const lb = await J('/tournament/seasons/' + season + '/leaderboard');
      const rows = lb.entries.map(e => ({rank: e.rank, policy_uri: e.policy_uri,
        mean_score: (+e.mean_score).toFixed(3), wins: e.wins, matches: e.matches}));
      html += '<h2>' + esc(season) + ' leaderboard</h2>' +
        table(['rank', 'policy_uri', 'mean_score', 'wins', 'matches'], rows);
      const ms = await J('/tournament/seasons/' + season + '/matches');
      html += '<h2>Recent matches</h2>' +
        table(['id', 'players', 'created_at'], ms.matches.map(x => ({
          id: x.id, created_at: x.created_at,
          players: x.players.map(p => p.policy_uri + ':' + p.score).join('  ')})));
    }
    m.innerHTML = html;
    m.querySelector('#mk').onclick = async () => {
      const name = m.querySelector('#ns').value;
      if (!name) return;
      await J('/tournament/seasons', {name});
      location.hash = '#/tournament?season=' + encodeURIComponent(name);
    };
  },

  async heatmap(m, params) {
    const metric = params.get('metric') || 'reward';
    m.innerHTML = '<h2>Policy × simulation heatmap</h2>' +
      '<div class="bar"><input id="hm" value="' + esc(metric) + '">' +
      '<button id="go">Load</button></div><div id="grid"></div>';
    m.querySelector('#go').onclick = () =>
      location.hash = '#/heatmap?metric=' + encodeURIComponent(m.querySelector('#hm').value);
    const d = await J('/dashboard/heatmap?metric=' + encodeURIComponent(metric));
    const byPS = {};
    for (const c of d.cells) (byPS[c.policy] = byPS[c.policy] || {})[c.sim] = c.value;
    const vals = d.cells.map(c => c.value);
    const lo = Math.min(...vals, 0), hi = Math.max(...vals, 1e-9);
    let t = '<table><tr><th>policy \\\\ sim</th>' +
      d.sims.map(e => '<th>' + esc(e) + '</th>').join('') + '</tr>';
    for (const p of d.policies) {
      t += '<tr><td>' + esc(p) + '</td>';
      for (const e of d.sims) {
        const v = (byPS[p] || {})[e];
        const a = v === undefined ? 0 : (v - lo) / (hi - lo || 1);
        t += '<td class="cell" style="background: rgba(79,70,229,' +
          (0.08 + 0.6 * a).toFixed(3) + ')">' +
          (v === undefined ? '–' : (+v).toFixed(3)) + '</td>';
      }
      t += '</tr>';
    }
    m.querySelector('#grid').innerHTML = t + '</table>';
  },

  async sql(m) {
    const tl = await J('/sql/tables');
    m.innerHTML = '<h2>SQL (SELECT-only)</h2><div class="bar">' +
      tl.map(t => '<span>' + esc(t.table_name) + ' (' + t.row_count +
             ' rows)</span>').join(' · ') + '</div>' +
      '<textarea id="q">SELECT * FROM episodes LIMIT 20</textarea>' +
      '<div class="bar" style="margin-top:8px"><button id="go">Run</button></div>' +
      '<div id="res"></div>';
    m.querySelector('#go').onclick = async () => {
      try {
        const d = await J('/sql/query', {query: m.querySelector('#q').value});
        const rows = d.rows.map(r => Object.fromEntries(
          d.columns.map((c, i) => [c, r[i]])));
        m.querySelector('#res').innerHTML = table(d.columns, rows);
      } catch (e) {
        m.querySelector('#res').innerHTML = '<div class="err">' + esc(e) + '</div>';
      }
    };
  },
};

async function route() {
  const h = location.hash.slice(2) || 'policies';
  const [view, qs] = h.split('?');
  const name = views[view] ? view : 'policies';
  document.querySelectorAll('nav a').forEach(a =>
    a.classList.toggle('on', a.dataset.v === name));
  const m = document.getElementById('main');
  try {
    await views[name](m, new URLSearchParams(qs || ''));
  } catch (e) {
    m.innerHTML = '<div class="err">' + esc(e) + '</div>';
  }
}
addEventListener('hashchange', route);
route();
</script></body></html>
"""
