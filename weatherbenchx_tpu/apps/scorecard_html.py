"""Static HTML scorecard viewer.

The reference ships Plotly Dash web apps for interactive scorecards
(``public_benchmark/apps/dash_app.py``, deployed on App Engine). This
dependency-free equivalent renders the combined scorecard
(``combine_results`` output) into a single self-contained HTML file:
model × lead-time score tables per variable/metric/region with a
color scale, plus client-side region/metric selectors.

Example:
  python -m weatherbenchx_tpu.apps.scorecard_html \
      --scorecard=scorecard.npz --output=scorecard.html
"""

import argparse
import html
import json
from typing import Optional, Sequence

import numpy as np

from weatherbenchx_tpu import io as io_lib

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>WeatherBench-X TPU scorecard</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }}
 h1 {{ font-size: 1.4rem; }}
 select {{ margin: 0 1rem 1rem 0; padding: 0.3rem; font-size: 1rem; }}
 table {{ border-collapse: collapse; margin-bottom: 2rem; }}
 th, td {{ border: 1px solid #ccc; padding: 0.35rem 0.7rem;
           text-align: right; font-variant-numeric: tabular-nums; }}
 th {{ background: #f2f2f2; text-align: center; }}
 caption {{ font-weight: 600; text-align: left; padding: 0.4rem 0; }}
</style></head>
<body>
<h1>WeatherBench-X TPU scorecard</h1>
<label>Metric <select id="metric"></select></label>
<label>Region <select id="region"></select></label>
<div id="tables"></div>
<script>
const DATA = {data_json};
const metricSel = document.getElementById('metric');
const regionSel = document.getElementById('region');
for (const m of DATA.metrics) metricSel.add(new Option(m, m));
for (const r of DATA.regions) regionSel.add(new Option(r, r));
function color(v, lo, hi) {{
  if (!isFinite(v)) return '#eee';
  const t = hi > lo ? (v - lo) / (hi - lo) : 0.5;
  const g = Math.round(235 - 110 * t), r = Math.round(125 + 110 * t);
  return `rgb(${{r}},${{g}},125)`;
}}
function render() {{
  const metric = metricSel.value, region = regionSel.value;
  let out = '';
  for (const variable of DATA.variables) {{
    const entry = DATA.values[variable]?.[metric]?.[region];
    if (!entry) continue;
    const vals = entry.flat().filter(isFinite);
    const lo = Math.min(...vals), hi = Math.max(...vals);
    out += `<table><caption>${{variable}} — ${{metric}} — ${{region}}</caption>`;
    out += '<tr><th>model</th>' + DATA.lead_times.map(
        l => `<th>${{l}}</th>`).join('') + '</tr>';
    DATA.models.forEach((model, i) => {{
      out += `<tr><th>${{model}}</th>` + entry[i].map(v =>
        `<td style="background:${{color(v, lo, hi)}}">` +
        (isFinite(v) ? v.toPrecision(4) : '—') + '</td>').join('') + '</tr>';
    }});
    out += '</table>';
  }}
  document.getElementById('tables').innerHTML =
      out || '<p>No data for this selection.</p>';
}}
metricSel.onchange = regionSel.onchange = render;
render();
</script>
</body></html>
"""


def render_scorecard_html(scorecard_path: str) -> str:
  """Renders the combined scorecard npz into a standalone HTML page."""
  sc = io_lib.load_dataset(scorecard_path)
  variables = sorted(str(v) for v in sc.keys())
  first = sc[variables[0]]
  models = [str(m) for m in first.coord_values('model')]
  metrics = sorted({str(m) for v in variables
                    for m in sc[v].coord_values('metric')})
  regions = ([str(r) for r in first.coord_values('region')]
             if 'region' in first.dims else ['all'])
  if 'lead_time' in first.dims:
    lead_values = first.coord_values('lead_time')
    lead_labels = [str(np.timedelta64(l, 'h')) if lead_values.dtype.kind == 'm'
                   else str(l) for l in lead_values]
  else:
    lead_labels = ['value']

  values: dict = {}
  for variable in variables:
    da = sc[variable]
    values[variable] = {}
    for metric in [str(m) for m in da.coord_values('metric')]:
      values[variable][metric] = {}
      sel = da.sel(metric=metric)
      for region in regions:
        r = sel.sel(region=region) if 'region' in sel.dims else sel
        order = ['model'] + (['lead_time'] if 'lead_time' in r.dims else [])
        r = r.transpose(*order) if r.dims != tuple(order) else r
        arr = np.asarray(r.values, dtype=np.float64)
        if arr.ndim == 1:
          arr = arr[:, None]
        values[variable][metric][region] = [
            [None if not np.isfinite(x) else float(x) for x in row]
            for row in arr]

  data = {
      'variables': variables,
      'models': models,
      'metrics': metrics,
      'regions': regions,
      'lead_times': lead_labels,
      'values': values,
  }
  return _PAGE.format(data_json=json.dumps(data))


def main(argv: Optional[Sequence[str]] = None) -> None:
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--scorecard', required=True,
                 help='Combined scorecard .npz (from combine_results)')
  p.add_argument('--output', required=True, help='Output .html file')
  args = p.parse_args(argv)
  page = render_scorecard_html(args.scorecard)
  with open(args.output, 'w') as f:
    f.write(page)
  print(f'Wrote {args.output} ({len(page)} bytes)')


if __name__ == '__main__':
  main()
