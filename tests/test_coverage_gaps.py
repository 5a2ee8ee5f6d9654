"""Coverage for components without direct tests elsewhere."""

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, test_utils
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import loaders
from weatherbenchx_tpu.metrics import base as mbase
from weatherbenchx_tpu.metrics import deterministic, probabilistic, wrappers


class TestClimatologyTimeDim:
  def test_exact_time_climatology(self):
    """Climatology with a 'time' dim: exact valid_time match."""
    times = np.arange('2020-01-01', '2020-01-10', dtype='datetime64[D]'
                      ).astype('datetime64[ns]')
    clim = {'t': DimArray(np.arange(9.0), ('time',), {'time': times})}
    init = times[:2]
    lead = np.array([0, 24], dtype='timedelta64[h]').astype('timedelta64[ns]')
    pred = {'t': DimArray(np.zeros((2, 2)), ('init_time', 'lead_time'),
                          {'init_time': init, 'lead_time': lead})}
    aligned = mbase.align_climatology(clim['t'], pred['t'])
    # valid times: day0/day1 for init0; day1/day2 for init1.
    np.testing.assert_allclose(np.asarray(aligned.values),
                               [[0.0, 1.0], [1.0, 2.0]])

  def test_valid_time_coord_direct(self):
    vt = np.arange('2020-03-01', '2020-03-04', dtype='datetime64[D]'
                   ).astype('datetime64[ns]')
    da = DimArray(np.zeros(3), ('valid_time',), {'valid_time': vt})
    dims, values = mbase.valid_time_coord(da)
    assert dims == ('valid_time',)
    np.testing.assert_array_equal(values, vt)

  def test_missing_time_coords_raises(self):
    da = DimArray(np.zeros(3), ('x',))
    with pytest.raises(ValueError, match='valid_time or init/lead_time'):
      mbase.valid_time_coord(da)


class TestClimatologyLoader:
  def test_dayofyear_hour_selection(self):
    rng = np.random.default_rng(0)
    clim = {'t': DimArray(
        rng.standard_normal((366, 2, 3)), ('dayofyear', 'hour', 'latitude'),
        {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 12]),
         'latitude': np.array([-10.0, 0.0, 10.0])})}
    loader = loaders.ClimatologyFromDataset(ds=clim)
    init = np.array(['2020-02-01T00', '2020-02-02T12'],
                    dtype='datetime64[ns]')
    lead = np.array([0, 12], dtype='timedelta64[h]').astype('timedelta64[ns]')
    chunk = loader.load_chunk(init, lead)
    da = chunk['t']
    assert da.dims == ('init_time', 'lead_time', 'latitude')
    # init0 (Feb 1 = doy 32) at hour 0 and (lead 12h) hour 12.
    src = np.asarray(clim['t'].values)
    np.testing.assert_allclose(np.asarray(da.values)[0, 0], src[31, 0])
    np.testing.assert_allclose(np.asarray(da.values)[0, 1], src[31, 1])
    # init1 Feb 2 12:00 + 12h -> Feb 3 (doy 34) hour 0.
    np.testing.assert_allclose(np.asarray(da.values)[1, 1], src[33, 0])


class TestTimeDependentThresholds:
  def test_select_bin_thresholds_by_valid_time(self):
    vt = np.arange('2020-01-01', '2020-01-05', dtype='datetime64[D]'
                   ).astype('datetime64[ns]')
    thresholds = DimArray(
        np.arange(4.0)[:, None], ('valid_time', 'threshold'),
        {'valid_time': vt, 'threshold': np.array([0.5])})
    init = vt[:2]
    lead = np.array([0, 24], dtype='timedelta64[h]').astype('timedelta64[ns]')
    chunk = DimArray(np.zeros((2, 2)), ('init_time', 'lead_time'),
                     {'init_time': init, 'lead_time': lead})
    out = wrappers.select_bin_thresholds_by_time_from_chunk(thresholds, chunk)
    assert set(out.dims) == {'init_time', 'lead_time', 'threshold'}
    np.testing.assert_allclose(
        np.asarray(out.transpose('init_time', 'lead_time',
                                 'threshold').values)[..., 0],
        [[0.0, 1.0], [1.0, 2.0]])

  def test_cdf_with_dimarray_thresholds_requires_suffix(self):
    with pytest.raises(ValueError, match='unique_name_suffix'):
      wrappers.ContinuousToCDF(
          'predictions',
          threshold_values=DimArray(np.array([1.0]), ('threshold',)),
          threshold_dim='threshold')

  def test_monotonicity_enforcement(self):
    da = DimArray(np.array([0.3]), ('x',))
    with pytest.raises(ValueError, match='monotonically increasing'):
      wrappers.compute_cdf([1.0, 0.5], da, 'threshold',
                           enforce_monotonicity=True)


class TestProbabilisticGaps:
  def test_ensemble_error_exceedance(self):
    preds, tgts = test_utils.canonical_forecast_pair(
        n_init=2, n_lead=2, ensemble_size=4, seed=0)
    stat = probabilistic.EnsembleErrorExceedance(thresholds=[0.5, 1.5])
    out = stat.compute(preds, tgts)['2m_temperature']
    assert 'number' not in out.dims
    assert 'error_exceedance_thresholds' in out.dims
    p = preds['2m_temperature'].values
    t = tgts['2m_temperature'].values
    ae = np.abs(p - t[None])
    expected = np.stack([(ae > 0.5).mean(0), (ae > 1.5).mean(0)])
    np.testing.assert_allclose(
        np.asarray(out.transpose('error_exceedance_thresholds',
                                 *tgts['2m_temperature'].dims).values),
        expected, rtol=1e-5)

  def test_crps_unfair_vs_fair_ordering(self):
    preds, tgts = test_utils.canonical_forecast_pair(
        n_init=2, n_lead=2, ensemble_size=5, seed=1)
    fair = test_utils.compute_all_metrics(
        {'c': probabilistic.CRPSEnsemble(fair=True)}, preds, tgts,
        ['init_time', 'lead_time', 'latitude', 'longitude'])
    unfair = test_utils.compute_all_metrics(
        {'c': probabilistic.CRPSEnsemble(fair=False)}, preds, tgts,
        ['init_time', 'lead_time', 'latitude', 'longitude'])
    # Unfair divides spread by M instead of M-1: smaller spread -> larger CRPS.
    assert unfair['c.2m_temperature'].item() > fair['c.2m_temperature'].item()

  def test_spread_skill_ratio_hard_error(self):
    with pytest.raises(ValueError, match='no longer supported'):
      probabilistic.SpreadSkillRatio()

  def test_ensemble_rps_with_per_variable_thresholds(self):
    preds, tgts = test_utils.canonical_forecast_pair(
        n_init=2, n_lead=2, ensemble_size=4, seed=2)
    thresholds = {'2m_temperature': DimArray(
        np.array([-0.5, 0.0, 0.5]), ('bins',),
        {'bins': np.array([-0.5, 0.0, 0.5])})}
    stat = probabilistic.EnsembleRankedProbabilityScore(
        prediction_bin_thresholds=thresholds,
        target_bin_thresholds=thresholds,
        bin_dim='bins', unique_name_suffix='tvar')
    out = stat.compute(preds, tgts)['2m_temperature']
    assert 'bins' not in out.dims
    assert np.isfinite(np.asarray(out.values)).all()


class TestBaselineComparisonCustom:
  def test_ratio_comparison(self):
    from weatherbenchx_tpu.inference import baseline_comparison as bc

    def ratio(main, baseline):
      return {k: main[k] / baseline[k] for k in main.keys()}

    preds, tgts = test_utils.canonical_forecast_pair(seed=3)
    metrics = {'mse': deterministic.MSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    stats = mbase.compute_unique_statistics_for_all_metrics(
        metrics, preds, tgts)
    state = agg.aggregate_statistics(stats)
    combined = bc.combine_aggregation_states(state, state)
    comparison = bc.BaselineComparison(metrics['mse'], comparison=ratio)
    values = combined.metric_values({'cmp': comparison})
    # Same state on both sides: ratio exactly 1.
    assert values['cmp.2m_temperature'].item() == pytest.approx(1.0)


class TestTemporalMode:
  def test_benchmark_cli_temporal(self, tmp_path):
    import os
    import sys
    sys.path.insert(0, 'tests')
    from test_apps import _write_source_files
    from weatherbenchx_tpu import io as io_lib
    from weatherbenchx_tpu.apps import run_benchmark_evaluation

    ppath, tpath, cpath, init, lead = _write_source_files(
        tmp_path, with_extras=True)
    outdir = str(tmp_path / 'results')
    run_benchmark_evaluation.main([
        '--prediction', 'hres', '--target', 'era5',
        '--resolution', '64x32', '--year', '2020',
        '--variables', '2m_temperature', '--time_frequency', '12',
        '--init_time_start', '2020-01-01', '--init_time_stop', '2020-01-03',
        '--lead_time_stop_days', '2', '--lead_time_frequency', '12',
        '--init_time_chunk_size', '2', '--lead_time_chunk_size', '4',
        '--temporal',
        '--output_dir', outdir,
        '--prediction_path', ppath, '--target_path', tpath,
        '--climatology_path', cpath,
    ])
    out = io_lib.load_dataset(os.path.join(
        outdir, 'hres_vs_era5_64x32_2020-init12h_temporal.npz'))
    da = out['rmse.2m_temperature']
    # Temporal mode preserves init_time (per-forecast results).
    assert 'init_time' in da.dims
    assert da.sizes['init_time'] == 4
    assert da.coord_values('init_time').dtype.kind == 'M'


class TestIselKwargs:
  def test_positional_member_selection_on_one_indexed_coord(self):
    import numpy as np
    from weatherbenchx_tpu.darray import DimArray
    t = np.array(['2020-01-01T00', '2020-01-01T06'], dtype='datetime64[ns]')
    lead = np.array([0], 'timedelta64[h]').astype('timedelta64[ns]')
    # ECMWF perturbed-member convention: 1-indexed member coordinate.
    ds = {'t2m': DimArray(
        np.arange(2 * 2 * 1 * 3, dtype=np.float32).reshape(2, 2, 1, 3),
        ('number', 'init_time', 'lead_time', 'latitude'),
        {'number': np.array([1, 2]), 'init_time': t, 'lead_time': lead,
         'latitude': np.array([-10.0, 0.0, 10.0])})}
    loader = loaders.PredictionsFromDataset(
        ds=ds, rename_dimensions=None, isel_kwargs={'number': 0})
    chunk = loader.load_chunk(t, lead)
    da = chunk['t2m']
    assert 'number' not in da.dims  # first member, dim dropped
    np.testing.assert_array_equal(
        da.values, ds['t2m'].isel(number=0).values)


class TestRemainingPublics:
  """Direct coverage for publics previously only exercised indirectly."""

  def test_land_sea_binning(self):
    from weatherbenchx_tpu import binning
    frac = DimArray(np.array([[0.9, 0.1], [0.6, 0.4]]),
                    ('latitude', 'longitude'),
                    {'latitude': Coord(('latitude',), np.array([0.0, 10.0])),
                     'longitude': Coord(('longitude',),
                                        np.array([0.0, 10.0]))})
    stat = frac.copy(data=np.ones((2, 2)))
    mask = binning.LandSea(frac, include_global_mask=True
                           ).create_bin_mask(stat)
    np.testing.assert_array_equal(
        mask.coord_values('land_sea'), ['land', 'sea', 'global'])
    m = np.asarray(mask.values)
    np.testing.assert_array_equal(m[0], [[1, 0], [1, 0]])
    np.testing.assert_array_equal(m[1], [[0, 1], [0, 1]])
    assert m[2].all()

  def test_constant_weighting(self):
    from weatherbenchx_tpu import aggregation, weighting
    da = DimArray(np.array([2.0, 4.0]), ('x',),
                  {'x': Coord(('x',), np.arange(2))})
    for w in (1.0, 3.0):
      agg = aggregation.Aggregator(
          reduce_dims=['x'], weigh_by=[weighting.ConstantWeighting(w)])
      state = agg.aggregate_statistics({'s': {'v': da}})
      # Constant weights cancel in the mean.
      np.testing.assert_allclose(
          np.asarray(state.mean_statistics()['s']['v'].values), 3.0)

  def test_multiple_interpolation_composes(self):
    from weatherbenchx_tpu import interpolations
    lats = np.linspace(-80, 80, 9)
    lons = np.linspace(0, 360, 12, endpoint=False)
    da = DimArray(
        np.add.outer(lats, np.zeros(12)).astype(np.float32),
        ('latitude', 'longitude'),
        {'latitude': Coord(('latitude',), lats),
         'longitude': Coord(('longitude',), lons)})
    combo = interpolations.MultipleInterpolation(interpolations=[
        interpolations.CropToBox(lat_min=-40, lat_max=40,
                                 lon_min=0, lon_max=359),
        interpolations.InterpolateToFixedCoords(
            method='linear',
            coords={'latitude': np.array([-10.0, 10.0]),
                    'longitude': np.array([30.0, 90.0])}),
    ])
    out = combo.interpolate_data_array(da)
    assert out.sizes['latitude'] == 2 and out.sizes['longitude'] == 2
    np.testing.assert_allclose(
        np.asarray(out.values)[:, 0], [-10.0, 10.0], atol=1e-5)

  def test_fillna_notnull(self):
    from weatherbenchx_tpu import darray
    da = DimArray(np.array([1.0, np.nan, 3.0]), ('x',),
                  {'x': Coord(('x',), np.arange(3))})
    filled = da.fillna(0.0)
    np.testing.assert_array_equal(np.asarray(filled.values), [1.0, 0.0, 3.0])
    np.testing.assert_array_equal(
        np.asarray(da.notnull().values), [True, False, True])


class TestComparisonSafeThresholds:
  """Float64 thresholds vs f32 data: directional rounding preserves the
  reference's float64 comparison semantics exactly.

  Round-5 TPU parity fuzz find (wrappers seed 49): an f32-lattice member
  value tied the round-to-nearest f32 image of a float64 RPS bin
  threshold, flipping a CDF indicator by 1/M at one gridpoint relative to
  the reference's float64 compare (``weatherbenchX/metrics/wrappers.py:
  333-374``). The fix rounds each constant to the largest f32 <= t (for
  ``<=``/``>``) or the smallest f32 >= t (for ``<``/``>=``), after which
  comparing at ANY precision gives the float64 answer.
  """

  def _tie_case(self):
    # x is an exact f32 value; t64 lies strictly ABOVE x in float64 but
    # rounds DOWN to exactly x in f32 (round-to-nearest).
    x = np.float32(0.3360923)
    up = np.nextafter(x, np.float32(np.inf))
    t64 = float(x) + 0.25 * (float(up) - float(x))
    assert float(x) < t64 and np.float32(t64) == x
    return x, t64

  def test_directional_rounding_matches_f64_all_ops(self):
    from weatherbenchx_tpu import darray as dr
    x, t64 = self._tie_case()
    thr = DimArray(np.array([t64]), ('t',), {'t': np.array([t64])})
    for op, fn in (('<=', lambda a, b: a <= b), ('<', lambda a, b: a < b),
                   ('>', lambda a, b: a > b), ('>=', lambda a, b: a >= b)):
      adj = dr.comparison_safe_threshold(thr, np.float32, op)
      got_f32 = bool(fn(x, np.asarray(adj.values, np.float32)[0]))
      want_f64 = bool(fn(float(x), t64))
      assert got_f32 == want_f64, (op, float(x), t64)
    # No-op cases: float64 data, exactly-representable thresholds,
    # device-resident thresholds.
    adj = dr.comparison_safe_threshold(thr, np.float64, '<=')
    assert np.asarray(adj.values)[0] == t64
    exact = DimArray(np.array([0.5]), ('t',), {'t': np.array([0.5])})
    adj = dr.comparison_safe_threshold(exact, np.float32, '<=')
    assert np.asarray(adj.values)[0] == np.float32(0.5)

  def test_binarize_and_cdf_match_reference_f64_semantics(self):
    from weatherbenchx_tpu.metrics import wrappers
    x, t64 = self._tie_case()
    da = DimArray(np.array([x, np.float32(0.1)], np.float32), ('p',),
                  {'p': np.arange(2)})
    # Reference computes x > t in float64: x < t64 -> False.
    got = wrappers.binarize_thresholds(da, [t64], 'thr')
    np.testing.assert_array_equal(
        np.asarray(got.values), [[0.0], [0.0]])
    # CDF right-inclusive: x <= t64 in float64 -> True.
    got = wrappers.compute_cdf([t64], da, 'thr',
                               enforce_monotonicity=False)
    np.testing.assert_array_equal(
        np.asarray(got.values), [[1.0], [1.0]])
    # CDF left-exclusive with a threshold strictly BELOW x that rounds UP
    # to x: x < t64b in float64 -> False.
    down = np.nextafter(x, np.float32(-np.inf))
    t64b = float(x) - 0.25 * (float(x) - float(down))
    assert np.float32(t64b) == x and t64b < float(x)
    got = wrappers.compute_cdf([t64b], da, 'thr',
                               enforce_monotonicity=False,
                               right_inclusive=False)
    np.testing.assert_array_equal(
        np.asarray(got.values), [[0.0], [1.0]])

  def test_error_exceedance_tie(self):
    from weatherbenchx_tpu.metrics import deterministic
    x, t64 = self._tie_case()
    preds = {'v': DimArray(np.array([x], np.float32), ('p',),
                           {'p': np.arange(1)})}
    targs = {'v': DimArray(np.zeros(1, np.float32), ('p',),
                           {'p': np.arange(1)})}
    stat = deterministic.ErrorExceedance(thresholds=[t64])
    out = stat.compute(preds, targs)['v']
    # |error| = x < t64 in float64 -> not exceeded.
    np.testing.assert_array_equal(np.asarray(out.values).ravel(), [0.0])
