import json
import re

import numpy as np

from weatherbenchx_tpu import io as io_lib, observability
from weatherbenchx_tpu.apps import scorecard_html
from weatherbenchx_tpu.darray import Coord, DimArray


class TestObservability:
  def test_counters_and_timings(self):
    m = observability.Metrics()
    m.counter('chunks_done')
    m.counter('chunks_done', 2)
    with m.timed('load'):
      pass
    m.record('load', 0.5)
    assert m.counters['chunks_done'] == 3
    assert m.timings['load'].count == 2
    assert m.timings['load'].max >= 0.5
    assert 'chunks_done: 3' in m.summary()

  def test_pipeline_records(self, tmp_path):
    from weatherbenchx_tpu import aggregation, test_utils
    from weatherbenchx_tpu import time_chunks as tc
    from weatherbenchx_tpu.data import loaders
    from weatherbenchx_tpu.metrics import deterministic
    from weatherbenchx_tpu.parallel import pipeline as pl

    preds, tgts = test_utils.canonical_forecast_pair(seed=0)
    init = preds['2m_temperature'].coord_values('init_time')
    lead = preds['2m_temperature'].coord_values('lead_time')
    reg = observability.Metrics()
    pipe = pl.EvaluationPipeline(
        metrics={'rmse': deterministic.RMSE()},
        aggregator=aggregation.Aggregator(
            reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude']),
        predictions_loader=loaders.PredictionsFromDataset(
            ds=preds, rename_dimensions=None),
        targets_loader=loaders.TargetsFromDataset(
            ds={'2m_temperature': tgts['2m_temperature'].rename(
                {'init_time': 'valid_time'}).isel(lead_time=0)},
            rename_dimensions=None),
        times=tc.TimeChunks(init[:2], lead[:1], init_time_chunk_size=1),
        metrics_registry=reg)
    pipe.run()
    assert reg.counters['chunks_done'] == 2
    assert reg.timings['eval_chunk_seconds'].count == 2
    assert reg.timings['load_targets_seconds'].count == 2


class TestScorecardHTML:
  def test_render(self, tmp_path):
    regions = np.array(['global', 'tropics'])
    leads = np.array([0, 6], dtype='timedelta64[h]').astype('timedelta64[ns]')
    da = DimArray(
        np.arange(8.0).reshape(2, 1, 2, 2),
        ('model', 'metric', 'lead_time', 'region'),
        {'model': np.array(['a', 'b']), 'metric': np.array(['RMSE']),
         'lead_time': leads, 'region': regions})
    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, {'t2m': da})
    page = scorecard_html.render_scorecard_html(path)
    assert '<!DOCTYPE html>' in page
    m = re.search(r'const DATA = (\{.*?\});\n', page, re.S)
    data = json.loads(m.group(1))
    assert data['models'] == ['a', 'b']
    assert data['regions'] == ['global', 'tropics']
    assert data['values']['t2m']['RMSE']['all']['tropics']['all'] == [
        [1.0, 3.0], [5.0, 7.0]]

  def test_curated_default_model_lists(self, tmp_path):
    """The page carries the reference's curated default-visible model
    lists per category (apps/config.py:55-70), not an alphabetical cap."""
    da = DimArray(np.array([[1.0]]), ('model', 'metric'),
                  {'model': np.array(['GraphCast vs ERA5']),
                   'metric': np.array(['RMSE'])})
    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, {'t2m': da})
    page = scorecard_html.render_scorecard_html(path)
    for snippet in ('"GraphCast vs ERA5", "NeuralGCM 0.7 vs ERA5"',
                    'const DEFAULTS_BY_CAT = ',
                    '"precip":', '"prob":',
                    'function categoryFor() {',
                    'function sl_defaultHidden(',
                    'const hidden = hiddenSet();'):
      assert snippet in page, snippet

  def test_nan_rendered_as_null(self, tmp_path):
    da = DimArray(np.array([[np.nan]]), ('model', 'metric'),
                  {'model': np.array(['a']), 'metric': np.array(['RMSE'])})
    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, {'v': da})
    page = scorecard_html.render_scorecard_html(path)
    data = json.loads(re.search(r'const DATA = (\{.*?\});\n', page,
                                re.S).group(1))
    assert data['values']['v']['RMSE']['all']['all']['all'] == [[None]]

  def test_level_dimension_gets_own_layer(self, tmp_path):
    da = DimArray(
        np.arange(12.0).reshape(1, 1, 3, 2, 2),
        ('model', 'metric', 'level', 'lead_time', 'region'),
        {'model': np.array(['a']), 'metric': np.array(['RMSE']),
         'level': np.array([500, 700, 850]),
         'lead_time': np.array([0, 6], 'timedelta64[h]').astype(
             'timedelta64[ns]'),
         'region': np.array(['global', 'tropics'])})
    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, {'z': da})
    page = scorecard_html.render_scorecard_html(path)
    data = json.loads(re.search(r'const DATA = (\{.*?\});\n', page,
                                re.S).group(1))
    assert list(data['values']['z']['RMSE'].keys()) == ['500', '700', '850']
    assert data['values']['z']['RMSE']['700']['tropics']['all'] == [[5.0, 7.0]]
    assert data['lead_hours'] == [0, 6]


class TestTimingsSnapshot:
  def test_timings_returns_isolated_snapshot(self):
    from weatherbenchx_tpu import observability

    m = observability.Metrics()
    m.record('load', 1.0)
    snap = m.timings
    m.record('load', 100.0)
    assert snap['load'].count == 1
    assert snap['load'].total == 1.0
    assert m.timings['load'].count == 2


class TestScorecardMixedRegions:
  def test_per_variable_region_sets_differ(self, tmp_path):
    """Variables with disjoint/partial region sets must render: the page
    region list is the union, and a variable simply has no entry for a
    region it was not evaluated on (the JS shows no-data for it)."""
    leads = np.array([6], dtype='timedelta64[h]').astype('timedelta64[ns]')

    def mk(regions, vals):
      return DimArray(
          np.asarray(vals, np.float64).reshape(1, 1, 1, len(regions)),
          ('model', 'metric', 'lead_time', 'region'),
          {'model': np.array(['a']), 'metric': np.array(['RMSE']),
           'lead_time': leads, 'region': np.array(regions)})

    path = str(tmp_path / 'sc.npz')
    io_lib.save_dataset(path, {
        't2m': mk(['global', 'tropics'], [1.0, 2.0]),
        'precip': mk(['global', 'tropics_land'], [3.0, 4.0]),
    })
    page = scorecard_html.render_scorecard_html(path)
    data = json.loads(re.search(r'const DATA = (\{.*?\});\n', page,
                                re.S).group(1))
    assert data['regions'] == ['global', 'tropics_land', 'tropics']
    t2m = data['values']['t2m']['RMSE']['all']
    precip = data['values']['precip']['RMSE']['all']
    assert 'tropics_land' not in t2m and 'tropics' in t2m
    assert 'tropics' not in precip and 'tropics_land' in precip
    assert precip['tropics_land']['all'] == [[4.0]]
