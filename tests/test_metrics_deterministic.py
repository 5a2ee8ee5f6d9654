import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, test_utils, weighting
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import base, deterministic


@pytest.fixture
def pair():
  return test_utils.canonical_forecast_pair(seed=1)


def _mean_all(x):
  return float(np.nanmean(x))


class TestStatistics:
  def test_error_family(self, pair):
    preds, tgts = pair
    p, t = preds['2m_temperature'].values, tgts['2m_temperature'].values
    err = deterministic.Error().compute(preds, tgts)['2m_temperature']
    np.testing.assert_allclose(err.values, p - t, rtol=1e-6)
    ae = deterministic.AbsoluteError().compute(preds, tgts)['2m_temperature']
    np.testing.assert_allclose(ae.values, np.abs(p - t), rtol=1e-6)
    se = deterministic.SquaredError().compute(preds, tgts)['2m_temperature']
    np.testing.assert_allclose(se.values, (p - t) ** 2, rtol=1e-5)

  def test_passthroughs(self, pair):
    preds, tgts = pair
    pp = deterministic.PredictionPassthrough().compute(preds, tgts)
    np.testing.assert_allclose(
        pp['2m_temperature'].values, preds['2m_temperature'].values)
    tp = deterministic.TargetPassthrough().compute(preds, tgts)
    np.testing.assert_allclose(
        tp['2m_temperature'].values, tgts['2m_temperature'].values)

  def test_passthrough_nan_copy(self, pair):
    preds, tgts = pair
    tv = tgts['2m_temperature'].values.copy()
    tv[0, 0, 0, 0] = np.nan
    tgts = dict(tgts, **{'2m_temperature': tgts['2m_temperature'].copy(data=tv)})
    pp = deterministic.PredictionPassthrough(copy_nans_from_targets=True
                                             ).compute(preds, tgts)
    assert np.isnan(pp['2m_temperature'].values[0, 0, 0, 0])

  def test_wind_vector_squared_error(self):
    preds, tgts = test_utils.canonical_forecast_pair(
        variables_2d=('u', 'v'), seed=2)
    stat = deterministic.WindVectorSquaredError(['u'], ['v'], ['wind'])
    out = stat.compute(preds, tgts)
    assert list(out.keys()) == ['wind']
    expected = (preds['u'].values - tgts['u'].values) ** 2 + (
        preds['v'].values - tgts['v'].values) ** 2
    np.testing.assert_allclose(out['wind'].values, expected, rtol=1e-5)
    assert stat.unique_name == 'WindVectorSquaredError_wind'

  def test_error_exceedance(self, pair):
    preds, tgts = pair
    stat = deterministic.ErrorExceedance(thresholds=[0.5, 1.0])
    out = stat.compute(preds, tgts)['2m_temperature']
    assert 'error_exceedance_thresholds' in out.dims
    ae = np.abs(preds['2m_temperature'].values - tgts['2m_temperature'].values)
    np.testing.assert_allclose(
        out.transpose('error_exceedance_thresholds', *preds['2m_temperature'].dims).values,
        np.stack([(ae > 0.5), (ae > 1.0)]).astype(np.float32))

  def test_relative_intensity(self, pair):
    preds, tgts = pair
    # Shift to positive values (precip-like).
    preds = {k: abs(v) for k, v in preds.items()}
    tgts = {k: abs(v) for k, v in tgts.items()}
    out = deterministic.RelativeIntensity().compute(preds, tgts)[
        '2m_temperature']
    p = preds['2m_temperature'].values
    t = tgts['2m_temperature'].values
    eps = 1e-6
    expected = np.abs((p.mean((-2, -1)) + eps) / (t.mean((-2, -1)) + eps) - 1)
    np.testing.assert_allclose(out.values, expected, rtol=1e-4, atol=1e-6)


class TestMetricsEndToEnd:
  def test_rmse_unweighted_global(self, pair):
    preds, tgts = pair
    metrics = {'rmse': deterministic.RMSE(), 'mse': deterministic.MSE(),
               'bias': deterministic.Bias(), 'mae': deterministic.MAE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    p, t = preds['2m_temperature'].values, tgts['2m_temperature'].values
    np.testing.assert_allclose(
        results['rmse.2m_temperature'].item(),
        np.sqrt(((p - t) ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        results['mse.2m_temperature'].item(), ((p - t) ** 2).mean(),
        rtol=1e-5)
    np.testing.assert_allclose(
        results['bias.2m_temperature'].item(), (p - t).mean(),
        rtol=1e-4, atol=1e-6)

  def test_statistic_dedup(self, pair):
    preds, tgts = pair
    metrics = {'rmse': deterministic.RMSE(), 'mse': deterministic.MSE()}
    stats = base.compute_unique_statistics_for_all_metrics(
        metrics, preds, tgts)
    assert list(stats.keys()) == ['SquaredError']

  def test_preserved_dims(self, pair):
    preds, tgts = pair
    metrics = {'rmse': deterministic.RMSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'latitude', 'longitude'])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    out = results['rmse.2m_temperature']
    assert out.dims == ('lead_time',)
    p, t = preds['2m_temperature'].values, tgts['2m_temperature'].values
    np.testing.assert_allclose(
        out.values, np.sqrt(((p - t) ** 2).mean(axis=(0, 2, 3))), rtol=1e-5)

  def test_area_weighted_rmse(self, pair):
    preds, tgts = pair
    metrics = {'rmse': deterministic.RMSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'],
        weigh_by=[weighting.GridAreaWeighting()])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    lat = preds['2m_temperature'].coord_values('latitude')
    w = weighting.cell_area_from_latitude(np.deg2rad(lat))
    w = w / w.mean()
    se = (preds['2m_temperature'].values - tgts['2m_temperature'].values) ** 2
    expected = np.sqrt(
        (se * w[None, None, :, None]).sum() / (np.ones_like(se) * w[None, None, :, None]).sum())
    np.testing.assert_allclose(
        results['rmse.2m_temperature'].item(), expected, rtol=1e-5)

  def test_wind_vector_rmse(self):
    preds, tgts = test_utils.canonical_forecast_pair(
        variables_2d=('u', 'v'), seed=3)
    metrics = {'vrmse': deterministic.WindVectorRMSE('u', 'v', 'wind')}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    se = (preds['u'].values - tgts['u'].values) ** 2 + (
        preds['v'].values - tgts['v'].values) ** 2
    np.testing.assert_allclose(
        results['vrmse.wind'].item(), np.sqrt(se.mean()), rtol=1e-5)


class TestClimatologyMetrics:
  def _clim(self, pair, kind='dayofyear_hour'):
    preds, _ = pair
    da = preds['2m_temperature']
    lats = da.coord_values('latitude')
    lons = da.coord_values('longitude')
    rng = np.random.default_rng(7)
    if kind == 'dayofyear_hour':
      dims = ('dayofyear', 'hour', 'latitude', 'longitude')
      coords = {'dayofyear': np.arange(1, 367),
                'hour': np.array([0, 6, 12, 18]),
                'latitude': lats, 'longitude': lons}
      data = rng.standard_normal(
          (366, 4, len(lats), len(lons))).astype(np.float32)
    else:
      raise NotImplementedError
    return {'2m_temperature': DimArray(data, dims, coords)}

  def test_acc_alignment_and_value(self, pair):
    preds, tgts = pair
    clim = self._clim(pair)
    metrics = {'acc': deterministic.ACC(climatology=clim)}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    # Manual: align climatology by valid time dayofyear/hour.
    da = preds['2m_temperature']
    init = da.coord_values('init_time')
    lead = da.coord_values('lead_time')
    vt = init[:, None] + lead[None, :]
    import pandas as pd
    vt_idx = pd.DatetimeIndex(vt.reshape(-1))
    cda = clim['2m_temperature']
    doy = vt_idx.dayofyear.values - 1
    hour = np.searchsorted(np.array([0, 6, 12, 18]), vt_idx.hour.values)
    aligned = cda.values[doy, hour].reshape(vt.shape + cda.values.shape[2:])
    p, t = da.values, tgts['2m_temperature'].values
    pa, ta = p - aligned, t - aligned
    expected = (pa * ta).mean() / np.sqrt(
        (pa ** 2).mean() * (ta ** 2).mean())
    np.testing.assert_allclose(
        results['acc.2m_temperature'].item(), expected, rtol=1e-5)

  def test_prediction_activity(self, pair):
    preds, tgts = pair
    clim = self._clim(pair)
    metrics = {'act': deterministic.PredictionActivity(climatology=clim)}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    results = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)
    assert np.isfinite(results['act.2m_temperature'].item())
