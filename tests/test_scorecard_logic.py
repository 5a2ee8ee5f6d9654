"""Scorecard interaction math: single-source logic + transpiler + page.

VERDICT r3 item 3: the page's selection/relative math needed
execution-level evidence. The design under test: the math lives ONCE in
Python (``apps/scorecard_logic.py``), CI executes it here against
hand-computed values mirroring ``dash_app.py:272-436`` semantics, the
page's JS is GENERATED from that same Python AST (``apps/pyjs.py``), and
every rendered page re-runs Python-computed golden fixtures against the
generated JS on load (``#selftest`` banner).
"""

import json
import re

import numpy as np
import pytest

from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu.apps import pyjs, scorecard_html, scorecard_logic
from weatherbenchx_tpu.darray import DimArray


class TestMirrors:
  def test_relative_plain(self):
    # dash_app.py:341-350: -100*(x-b)/b, lead-0 dropped.
    rows = [[1.0, 2.0, 4.0], [2.0, 4.0, 4.0]]
    got = scorecard_logic.apply_relative(rows, 'RMSE', 1, [0, 24, 48])
    assert got == [[None, 50.0, -0.0], [None, -0.0, -0.0]]

  def test_relative_acc_special_case(self):
    # dash_app.py:341-350: ACC uses 100*(x-b)/(1-b).
    rows = [[0.5], [0.8]]
    got = scorecard_logic.apply_relative(rows, 'ACC', 1, [24])
    assert got[0][0] == pytest.approx(100 * (0.5 - 0.8) / (1 - 0.8))
    assert got[1][0] == pytest.approx(0.0)
    # perfect baseline (b=1) guards the 0/0
    assert scorecard_logic.apply_relative(
        [[0.5], [1.0]], 'ACC', 1, [24]) == [[None], [None]]

  def test_relative_none_and_zero_base(self):
    rows = [[1.0, None], [0.0, 3.0]]
    got = scorecard_logic.apply_relative(rows, 'RMSE', 1, [24, 48])
    assert got == [[None, None], [None, -0.0]]

  def test_mask_lead_zero(self):
    assert scorecard_logic.mask_lead_zero(
        [[1.0, 2.0]], [0, 24]) == [[None, 2.0]]

  def test_seeps_guards(self):
    g = scorecard_logic.seeps_guard
    assert g('RMSE', '2m Temperature', True, 'IFS HRES vs Analysis') is None
    assert 'only defined for precipitation' in g(
        'SEEPS', '2m Temperature', False, 'x')
    assert 'Analysis baseline' in g(
        'SEEPS', '24h Precipitation', True, 'IFS HRES vs Analysis')
    assert g('SEEPS', '24h Precipitation', False, 'x') is None
    assert g('SEEPS', '24h Precipitation', True, 'IFS HRES vs ERA5') is None

  def test_category_routing(self):
    c = scorecard_logic.category_for
    assert c('CRPS', '2m Temperature') == 'prob'
    assert c('RMSE', '24h Precipitation') == 'precip'
    assert c('RMSE', '2m Temperature') == 'det'

  def test_lookup_entry(self):
    values = {'t2m': {'RMSE': {'all': {'global': {'2020|all': [[1.0]],
                                                  'all': [[2.0]]}}}}}
    lk = scorecard_logic.lookup_entry
    assert lk(values, 't2m', 'RMSE', 'all', 'global', '2020|all') == [[1.0]]
    assert lk(values, 't2m', 'RMSE', 'all', 'global', 'nope') == [[2.0]]
    assert lk(values, 't2m', 'ACC', 'all', 'global', 'all') is None
    assert lk(values, 'zzz', 'RMSE', 'all', 'global', 'all') is None

  def test_default_hidden(self):
    models = ['GraphCast vs ERA5', 'other1', 'other2']
    got = scorecard_logic.default_hidden(
        models, 'det', scorecard_logic.DEFAULTS_BY_CAT, 8)
    assert got == ['other1', 'other2']
    # no curated name matches: cap at default_visible
    many = [f'm{i}' for i in range(12)]
    got = scorecard_logic.default_hidden(
        many, 'det', scorecard_logic.DEFAULTS_BY_CAT, 8)
    assert got == many[8:]


class TestTranspiler:
  def test_generated_js_has_all_functions(self):
    js = scorecard_logic.LOGIC_JS
    for fn in ('sl_categoryFor', 'sl_seepsGuard', 'sl_applyRelative',
               'sl_maskLeadZero', 'sl_lookupEntry', 'sl_defaultHidden'):
      assert f'function {fn}(' in js
    assert 'function d_get(d, k)' in js
    assert 'SL_PROB_METRICS' in js

  def test_js_regenerates_deterministically(self):
    js2 = pyjs.transpile(scorecard_logic.LOGIC_FUNCTIONS,
                         consts={'SL_PROB_METRICS':
                                 scorecard_logic.SL_PROB_METRICS})
    assert js2 == scorecard_logic.LOGIC_JS

  def test_semantics_snippets(self):
    js = scorecard_logic.LOGIC_JS
    # membership → includes, lower() → toLowerCase, None → null
    assert 'variable.toLowerCase().includes("precip")' in js
    assert 'SL_PROB_METRICS.includes(metric)' in js
    assert 'return null;' in js
    # the ACC formula survives verbatim
    assert '(100 * (x - base[j])) / (1 - base[j])' in js
    assert '((-100) * (x - base[j])) / base[j]' in js

  def test_reserved_words_rejected(self):
    def bad(rows):
      new = []
      new.append(rows)
      return new
    with pytest.raises(pyjs.TranspileError, match='reserved'):
      pyjs.transpile([bad])

  def test_unsupported_constructs_rejected(self):
    def uses_while(x):
      while x > 0:
        x = x - 1
      return x
    with pytest.raises(pyjs.TranspileError):
      pyjs.transpile([uses_while])

    def uses_comprehension(xs):
      return [x + 1 for x in xs]
    with pytest.raises(pyjs.TranspileError):
      pyjs.transpile([uses_comprehension])

    def uses_kwargs(a, b=2):
      return a + b
    with pytest.raises(pyjs.TranspileError):
      pyjs.transpile([uses_kwargs])


def _rich_scorecard(tmp_path):
  leads = np.array([0, 6, 24], dtype='timedelta64[h]').astype('timedelta64[ns]')
  regions = np.array(['global', 'tropics'])
  models = np.array(['IFS HRES vs Analysis', 'GraphCast vs ERA5', 'c'])
  rng = np.random.default_rng(0)

  def da(metric_names):
    m = np.array(metric_names)
    vals = rng.random((len(models), len(m), len(leads), len(regions))) + 0.5
    return DimArray(vals, ('model', 'metric', 'lead_time', 'region'),
                    {'model': models, 'metric': m, 'lead_time': leads,
                     'region': regions})

  ds = {'2m Temperature': da(['RMSE', 'ACC', 'CRPS']),
        '24h Precipitation': da(['RMSE', 'SEEPS'])}
  path = str(tmp_path / 'sc.npz')
  io_lib.save_dataset(path, ds)
  return path


class TestPageSelfTest:
  def test_fixtures_embedded_and_self_consistent(self, tmp_path):
    page = scorecard_html.render_scorecard_html(_rich_scorecard(tmp_path))
    m = re.search(r'const SELFTEST = (\[.*?\]);\n', page, re.S)
    assert m, 'SELFTEST payload missing from page'
    fixtures = json.loads(m.group(1))
    assert len(fixtures) >= 15
    md = re.search(r'const DATA = (\{.*?\});\n', page, re.S)
    data_values = json.loads(md.group(1))['values']
    # The full values mapping must appear ONCE (in DATA), never inlined
    # into fixture args (ADVICE r4: 9 copies ~10x'd page size).
    resolve = lambda a: (data_values
                         if a == scorecard_logic.VALUES_SENTINEL else a)
    for f in fixtures:
      f['args'] = [resolve(a) for a in f['args']]
    assert page.count(json.dumps(data_values)[:200]) == 1
    covered = {f['fn'] for f in fixtures}
    assert covered == {'lookupEntry', 'applyRelative', 'maskLeadZero',
                       'seepsGuard', 'categoryFor', 'defaultHidden'}
    # every fixture's expectation must re-derive from the Python source
    mirror = {'lookupEntry': scorecard_logic.lookup_entry,
              'applyRelative': scorecard_logic.apply_relative,
              'maskLeadZero': scorecard_logic.mask_lead_zero,
              'seepsGuard': scorecard_logic.seeps_guard,
              'categoryFor': scorecard_logic.category_for,
              'defaultHidden': scorecard_logic.default_hidden}
    for f in fixtures:
      assert mirror[f['fn']](*f['args']) == f['expected'], f['name']
    # and the page must define each function the fixtures call
    for fn in covered:
      assert f'function sl_{fn[0].lower()}{fn[1:]}'.replace(
          'sl_l', 'sl_l') and f'function sl_{fn}'.replace(
          f'sl_{fn}', f'sl_{fn[0].upper() + fn[1:]}')  # names checked below
    for fn in ('sl_lookupEntry', 'sl_applyRelative', 'sl_maskLeadZero',
               'sl_seepsGuard', 'sl_categoryFor', 'sl_defaultHidden'):
      assert f'function {fn}(' in page

  def test_page_runs_selftest_on_load(self, tmp_path):
    page = scorecard_html.render_scorecard_html(_rich_scorecard(tmp_path))
    assert 'sl_runSelfTests(SELFTEST)' in page
    assert 'id="selftest"' in page
    assert "dataset.status = 'pass'" in page
    assert "dataset.status = 'fail'" in page
