"""Categorical/SEEPS/FSS numerics + wrapper composition tests."""

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import categorical, spatial, wrappers


def compute_all(metrics, preds, tgts, reduce_dims):
  agg = aggregation.Aggregator(reduce_dims=reduce_dims)
  return aggregation.compute_metric_values_for_single_chunk(
      metrics, agg, preds, tgts)


def binary_pair():
  # Hand contingency: TP=2, TN=3, FP=1, FN=2 over 8 points.
  p = np.array([1, 1, 1, 0, 0, 0, 0, 1], float)
  t = np.array([1, 1, 0, 1, 0, 0, 0, 0], float)
  # -> TP=2 (0,1), FP=2 (2,7), FN=1 (3), TN=3 (4,5,6)
  return ({'v': DimArray(p, ('x',))}, {'v': DimArray(t, ('x',))})


class TestConfusionMatrix:
  def test_counts(self):
    preds, tgts = binary_pair()
    tp = categorical.TruePositives().compute(preds, tgts)['v']
    tn = categorical.TrueNegatives().compute(preds, tgts)['v']
    fp = categorical.FalsePositives().compute(preds, tgts)['v']
    fn = categorical.FalseNegatives().compute(preds, tgts)['v']
    assert (np.asarray(tp.values).sum(), np.asarray(tn.values).sum(),
            np.asarray(fp.values).sum(), np.asarray(fn.values).sum()
            ) == (2, 3, 2, 1)

  def test_nan_propagation(self):
    preds = {'v': DimArray(np.array([1.0, np.nan]), ('x',))}
    tgts = {'v': DimArray(np.array([1.0, 1.0]), ('x',))}
    tp = categorical.TruePositives().compute(preds, tgts)['v']
    assert np.isnan(np.asarray(tp.values)[1])

  def test_metric_formulas(self):
    preds, tgts = binary_pair()
    results = compute_all(
        {'csi': categorical.CSI(), 'acc': categorical.Accuracy(),
         'recall': categorical.Recall(), 'far': categorical.FalseAlarmRate(),
         'precision': categorical.Precision(), 'f1': categorical.F1Score(),
         'fb': categorical.FrequencyBias(), 'hss': categorical.HSS(),
         'ets': categorical.ETS(), 'sedi': categorical.SEDI()},
        preds, tgts, ['x'])
    tp, tn, fp, fn = 2 / 8, 3 / 8, 2 / 8, 1 / 8
    approx = lambda k: results[f'{k}.v'].item()
    assert approx('csi') == pytest.approx(tp / (tp + fp + fn))
    assert approx('acc') == pytest.approx((tp + tn))
    assert approx('recall') == pytest.approx(tp / (tp + fn))
    assert approx('far') == pytest.approx(fp / (tp + fp))
    assert approx('precision') == pytest.approx(tp / (tp + fp))
    assert approx('f1') == pytest.approx(2 * tp / (2 * tp + fp + fn))
    assert approx('fb') == pytest.approx((tp + fp) / (tp + fn))
    hss = 2 * (tp * tn - fp * fn) / ((tp + fn) * (fn + tn)
                                     + (tp + fp) * (fp + tn))
    assert approx('hss') == pytest.approx(hss, rel=1e-5)
    tpr = (tp + fp) * (tp + fn) / 1.0
    ets = (tp - tpr) / (tp + fp + fn - tpr)
    assert approx('ets') == pytest.approx(ets, rel=1e-5)
    h = np.clip(tp / (tp + fn), 1e-6, 1 - 1e-6)
    f = np.clip(fp / (fp + tn), 1e-6, 1 - 1e-6)
    sedi = ((np.log(f) - np.log(h) + np.log(1 - h) - np.log(1 - f))
            / (np.log(h) + np.log(f) + np.log(1 - h) + np.log(1 - f)))
    assert approx('sedi') == pytest.approx(sedi, rel=1e-5)

  def test_reliability_calibrated(self):
    rng = np.random.default_rng(0)
    prob = rng.random(20000)
    target = (rng.random(20000) < prob).astype(np.float64)
    preds = {'v': DimArray(prob, ('x',))}
    tgts = {'v': DimArray(target, ('x',))}
    results = compute_all({'rel': categorical.Reliability()}, preds, tgts,
                          ['x'])
    out = results['rel.v']
    assert out.sizes['reliability_bin'] == 10
    mids = np.arange(0.05, 1.0, 0.1)
    np.testing.assert_allclose(np.asarray(out.values), mids, atol=0.03)


class TestSEEPS:
  def _setup(self):
    rng = np.random.default_rng(0)
    lats = np.linspace(-90, 90, 5)
    lons = np.linspace(0, 360, 6, endpoint=False)
    init = np.array(['2020-01-01T00', '2020-01-01T06'],
                    dtype='datetime64[ns]')
    lead = np.array([0, 6], dtype='timedelta64[h]').astype('timedelta64[ns]')
    shape = (2, 2, 5, 6)
    dims = ('init_time', 'lead_time', 'latitude', 'longitude')
    coords = {'init_time': init, 'lead_time': lead,
              'latitude': lats, 'longitude': lons}
    vals = rng.random(shape).astype(np.float32)
    tgt = {'precip': DimArray(vals, dims, coords)}
    pred = {'precip': DimArray(vals.copy(), dims, coords)}
    base_field = vals[0, 0]
    clim = {
        'precip_seeps_dry_fraction': DimArray(
            np.broadcast_to(base_field + 0.4, (366, 4, 5, 6)).copy(),
            ('dayofyear', 'hour', 'latitude', 'longitude'),
            {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 6, 12, 18]),
             'latitude': lats, 'longitude': lons}),
        'precip_seeps_threshold': DimArray(
            np.broadcast_to(base_field + 1.0, (366, 4, 5, 6)).copy(),
            ('dayofyear', 'hour', 'latitude', 'longitude'),
            {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 6, 12, 18]),
             'latitude': lats, 'longitude': lons}),
    }
    return pred, tgt, clim

  def test_perfect_forecast_is_zero_and_orientation(self):
    """Mirrors reference metrics_test.py:368-425."""
    pred, tgt, clim = self._setup()
    # Make p1 uniform 0.4 and wet threshold above all values so every point
    # is 'light' (values in (0.00025, threshold)).
    clim['precip_seeps_dry_fraction'] = clim[
        'precip_seeps_dry_fraction'].copy(
            data=np.full((366, 4, 5, 6), 0.4, np.float32))
    seeps = categorical.SEEPS(variables=['precip'], climatology=clim)
    stat = seeps.compute(pred, tgt)['precip']
    np.testing.assert_allclose(np.asarray(stat.values), 0.0, atol=1e-4)
    # Forecast shifted +0.5 with dry targets: set targets to 0 (dry),
    # predictions to 0.5 (light): score = 0.5 * 1/p1 = 1.25.
    dry_tgt = {'precip': tgt['precip'].copy(
        data=np.zeros_like(np.asarray(tgt['precip'].values)))}
    light_pred = {'precip': pred['precip'].copy(
        data=np.full_like(np.asarray(pred['precip'].values), 0.5))}
    stat = seeps.compute(light_pred, dry_tgt)['precip']
    np.testing.assert_allclose(np.asarray(stat.values), 1.25, atol=1e-4)

  def test_p1_masking(self):
    pred, tgt, clim = self._setup()
    # p1 = 0.95 everywhere -> outside [0.1, 0.85] -> all masked (NaN).
    clim['precip_seeps_dry_fraction'] = clim[
        'precip_seeps_dry_fraction'].copy(
            data=np.full((366, 4, 5, 6), 0.95, np.float32))
    seeps = categorical.SEEPS(variables=['precip'], climatology=clim)
    stat = seeps.compute(pred, tgt)['precip']
    assert np.isnan(np.asarray(stat.values)).all()
    assert not np.asarray(stat.coords['mask'].values).any()
    # Masked aggregation returns empty-weight NaN, not an error.
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'],
        masked=True)
    state = agg.aggregate_statistics({'seeps': {'precip': stat}})
    assert np.isnan(state.mean_statistics()['seeps']['precip'].item())


class TestFSS:
  def test_neighborhood_averaging_hand(self):
    x = np.zeros((5, 5), np.float32)
    x[2, 2] = 1.0
    da = DimArray(x, ('latitude', 'longitude'))
    out = spatial.neighborhood_averaging(da, 3)
    expected = np.zeros((5, 5), np.float32)
    expected[1:4, 1:4] = 1 / 9
    np.testing.assert_allclose(np.asarray(out.values), expected, atol=1e-6)

  def test_wrap_longitude(self):
    x = np.zeros((5, 6), np.float32)
    x[2, 0] = 1.0
    da = DimArray(x, ('latitude', 'longitude'))
    out_wrap = spatial.neighborhood_averaging(da, 3, wrap_longitude=True)
    # Wrapped: column 5 (adjacent via wrap) sees the mass.
    assert np.asarray(out_wrap.values)[2, 5] == pytest.approx(1 / 9)
    out_nowrap = spatial.neighborhood_averaging(da, 3, wrap_longitude=False)
    assert np.asarray(out_nowrap.values)[2, 5] == 0.0

  def test_even_size_raises(self):
    da = DimArray(np.zeros((5, 5), np.float32), ('latitude', 'longitude'))
    with pytest.raises(ValueError, match='odd'):
      spatial.neighborhood_averaging(da, 4)

  def test_fss_perfect_and_total_miss(self):
    p = np.zeros((1, 8, 8), np.float32)
    p[0, 4, 4] = 1
    preds = {'v': DimArray(p, ('init_time', 'latitude', 'longitude'))}
    results = compute_all(
        {'fss': spatial.FSS(neighborhood_size_in_pixels=3)},
        preds, preds, ['init_time', 'latitude', 'longitude'])
    assert results['fss.v'].item() == pytest.approx(1.0)
    # Total miss beyond the neighborhood -> FSS 0.
    t = np.zeros((1, 8, 8), np.float32)
    t[0, 1, 1] = 1
    tgts = {'v': DimArray(t, ('init_time', 'latitude', 'longitude'))}
    results = compute_all(
        {'fss': spatial.FSS(neighborhood_size_in_pixels=3)},
        preds, tgts, ['init_time', 'latitude', 'longitude'])
    assert results['fss.v'].item() == pytest.approx(0.0, abs=1e-6)

  def test_multiple_neighborhood_sizes(self):
    rng = np.random.default_rng(0)
    p = (rng.random((2, 9, 12)) > 0.7).astype(np.float32)
    t = (rng.random((2, 9, 12)) > 0.7).astype(np.float32)
    preds = {'v': DimArray(p, ('init_time', 'latitude', 'longitude'))}
    tgts = {'v': DimArray(t, ('init_time', 'latitude', 'longitude'))}
    results = compute_all(
        {'fss': spatial.FSS(neighborhood_size_in_pixels=[1, 3, 5])},
        preds, tgts, ['init_time', 'latitude', 'longitude'])
    out = results['fss.v']
    assert out.dims == ('neighborhood_size',)
    np.testing.assert_array_equal(
        out.coord_values('neighborhood_size'), [1, 3, 5])
    # FSS generally increases with neighborhood size for random fields.
    vals = np.asarray(out.values)
    assert vals[2] > vals[0]


class TestWrappers:
  def test_continuous_to_binary_nan(self):
    da = DimArray(np.array([0.1, 0.9, np.nan]), ('x',))
    out = wrappers.binarize_thresholds(da, [0.5], 'threshold')
    v = np.asarray(out.transpose('threshold', 'x').values)
    np.testing.assert_array_equal(v[0, :2], [0.0, 1.0])
    assert np.isnan(v[0, 2])

  def test_ensemble_quantiles_matches_numpy(self):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 5))
    da = DimArray(x, ('number', 'x'))
    q = wrappers.EnsembleQuantiles('predictions', [0.25, 0.5]).transform_fn(da)
    assert q.dims == ('quantile', 'x')
    np.testing.assert_allclose(
        np.asarray(q.values), np.quantile(x, [0.25, 0.5], axis=0), rtol=1e-6)

  def test_continuous_to_bins(self):
    da = DimArray(np.array([0.05, 0.55, 0.95]), ('x',))
    tr = wrappers.ContinuousToBins('predictions', [-np.inf, 0.5, 1.0], 'bin')
    out = tr.transform_fn(da)
    assert out.sizes['bin'] == 2
    got = out.transpose('x', 'bin').values
    np.testing.assert_array_equal(np.asarray(got),
                                  [[1, 0], [0, 1], [0, 1]])
    np.testing.assert_array_equal(out.coord_values('bin_left'),
                                  [-np.inf, 0.5])

  def test_wrapped_metric_composition_order(self):
    # transforms [f, g] apply as g(f(x)).
    calls = []
    f = wrappers.Inline('both', lambda d: (calls.append('f'), d + 1)[1], 'f')
    g = wrappers.Inline('both', lambda d: (calls.append('g'), d * 2)[1], 'g')
    from weatherbenchx_tpu.metrics import deterministic
    m = wrappers.WrappedMetric(deterministic.MSE(), [f, g])
    stat = list(m.statistics.values())[0]
    preds = {'v': DimArray(np.array([1.0]), ('x',))}
    tgts = {'v': DimArray(np.array([0.0]), ('x',))}
    out = stat.compute(preds, tgts)['v']
    # pred: (1+1)*2 = 4; tgt: (0+1)*2 = 2 -> SE = 4.
    assert np.asarray(out.values)[0] == pytest.approx(4.0)

  def test_unique_name_discipline(self):
    from weatherbenchx_tpu.metrics import deterministic
    t1 = wrappers.ContinuousToBinary('both', [0.5], 'threshold')
    t2 = wrappers.ContinuousToBinary('both', [0.7], 'threshold')
    s1 = wrappers.WrappedStatistic(deterministic.SquaredError(), t1)
    s2 = wrappers.WrappedStatistic(deterministic.SquaredError(), t2)
    assert s1.unique_name != s2.unique_name

  def test_shift_and_relu_and_select(self):
    da = DimArray(np.array([-1.0, 2.0]), ('x',), {'x': np.array([0, 1])})
    shifted = wrappers.ShiftAlongNewDim(
        'both', [0.0, 10.0], 'shift', 's').transform_fn(da)
    assert shifted.sizes['shift'] == 2
    relu = wrappers.ReLU('both').transform_fn(da)
    np.testing.assert_array_equal(np.asarray(relu.values), [0.0, 2.0])
    sel = wrappers.Select('both', sel={'x': 1}).transform_fn(da)
    assert sel.item() == 2.0

  def test_stack_to_new_dimension(self):
    da = DimArray(np.arange(6.0).reshape(2, 3), ('a', 'b'))
    out = wrappers.StackToNewDimension('both', ['a', 'b'], 'c').transform_fn(da)
    assert out.dims == ('c',)
    assert out.shape == (6,)

  def test_subselect_variables(self):
    from weatherbenchx_tpu.metrics import deterministic
    m = wrappers.SubselectVariables(deterministic.MSE(), ['a'])
    preds = {'a': DimArray(np.ones(2), ('x',)),
             'b': DimArray(np.ones(2), ('x',))}
    out = compute_all({'m': m}, preds, preds, ['x'])
    assert 'm.a' in out and 'm.b' not in out

  def test_weibull(self):
    da = DimArray(np.array([[1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
                  ('number', 'x'))
    out = wrappers.WeibullEnsembleToProbabilistic(
        'predictions').transform_fn(da)
    np.testing.assert_allclose(np.asarray(out.values), [2 / 4, 2 / 4])


class TestDecisionSupport:
  """Confident/Covered/JaccardDistant/Opportunism (reference
  categorical.py:701-971) on hand-computed intervals."""

  def _setup(self):
    lats = np.array([0.0, 10.0])
    lons = np.array([0.0])
    init = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead = np.array([0], dtype='timedelta64[h]').astype('timedelta64[ns]')
    dims = ('number', 'init_time', 'lead_time', 'latitude', 'longitude')
    coords = {'number': np.arange(5), 'init_time': init, 'lead_time': lead,
              'latitude': lats, 'longitude': lons}
    # Members 0..4 at every point: q0.1 = 0.4, q0.9 = 3.6, spread 3.2.
    vals = np.broadcast_to(
        np.arange(5.0)[:, None, None, None, None], (5, 1, 1, 2, 1)).copy()
    preds = {'v': DimArray(vals.astype(np.float32), dims, coords)}
    # Both targets inside [0.4, 3.6] -> Covered mean 1.0.
    tgts = {'v': DimArray(
        np.array([2.0, 1.0], np.float32).reshape(1, 1, 2, 1),
        dims[1:], {k: coords[k] for k in dims[1:]})}
    # Climatological quantile intervals: lat0 [0, 10], lat1 [100, 102].
    base = np.array([[[0.0], [100.0]], [[10.0], [102.0]]], np.float32)
    clim = {'v': DimArray(
        np.broadcast_to(base, (366, 4, 2, 2, 1)).copy(),
        ('dayofyear', 'hour', 'quantile', 'latitude', 'longitude'),
        {'dayofyear': np.arange(1, 367), 'hour': np.array([0, 6, 12, 18]),
         'quantile': np.array([0.1, 0.9]), 'latitude': lats,
         'longitude': lons})}
    return preds, tgts, clim

  def test_statistics_hand_values(self):
    preds, tgts, clim = self._setup()
    reduce = ['init_time', 'lead_time', 'latitude', 'longitude']
    # Confident: spread 3.2 vs 0.7*clim_spread -> lat0: 3.2 < 7 True,
    # lat1: 3.2 < 1.4 False.
    conf = categorical.Confident('number', clim).compute(preds, tgts)['v']
    np.testing.assert_array_equal(
        np.asarray(conf.values).ravel(), [True, False])
    # Covered: both targets inside the [0.4, 3.6] ensemble interval.
    cov = categorical.Covered('number').compute(preds, tgts)['v']
    np.testing.assert_array_equal(
        np.asarray(cov.values).ravel(), [True, True])
    # Jaccard: lat0 [0.4,3.6] vs [0,10] -> dist 0.68 < 0.75 -> False;
    # lat1 vs [100,102] disjoint -> dist 1 -> True.
    jd = categorical.JaccardDistant('number', clim).compute(
        preds, tgts)['v']
    np.testing.assert_array_equal(
        np.asarray(jd.values).ravel(), [False, True])
    results = compute_all(
        {'opp': categorical.Opportunism(
            'number', clim, is_confident=True, is_covered=True,
            is_jaccard_distant=True)},
        preds, tgts, reduce)
    # Product of means: 0.5 * 1.0 * 0.5.
    assert results['opp.v'].item() == pytest.approx(0.25)
    results = compute_all(
        {'opp': categorical.Opportunism(
            'number', clim, is_confident=False, is_covered=False,
            is_jaccard_distant=False)},
        preds, tgts, reduce)
    assert results['opp.v'].item() == pytest.approx(0.0)
    results = compute_all(
        {'opp': categorical.Opportunism('number', clim, is_confident=True)},
        preds, tgts, reduce)
    assert results['opp.v'].item() == pytest.approx(0.5)

  def test_jaccard_identical_point_intervals_not_distant(self):
    preds, tgts, clim = self._setup()
    # Constant ensemble at 5 -> prediction interval [5, 5]; climatology
    # interval also [5, 5]: union 0 -> Jaccard index 1 -> distance 0.
    p = preds['v'].copy(data=np.full_like(np.asarray(preds['v'].values), 5.0))
    c = clim['v'].copy(data=np.full_like(np.asarray(clim['v'].values), 5.0))
    jd = categorical.JaccardDistant('number', {'v': c}).compute(
        {'v': p}, tgts)['v']
    assert not np.asarray(jd.values).any()


class TestMultiSizeNeighborhoodMask:
  """Regression: per-size validity masks must survive multi-size concat."""

  def _masked_grid(self):
    rng = np.random.default_rng(5)
    data = (rng.uniform(size=(9, 12)) > 0.5).astype(np.float32)
    mask = np.ones((9, 12), dtype=bool)
    mask[4, 6] = False  # one invalid cell mid-grid
    coords = {'latitude': np.linspace(-60, 60, 9),
              'longitude': np.arange(12) * 30.0,
              'mask': Coord(('latitude', 'longitude'), mask)}
    return DimArray(data, ('latitude', 'longitude'), coords)

  def test_per_size_masks_differ_along_new_dim(self):
    da = self._masked_grid()
    out = spatial.neighborhood_averaging(da, [1, 3], wrap_longitude=True)
    mask_c = out.coords['mask']
    assert 'neighborhood_size' in mask_c.dims
    m = np.asarray(mask_c.values)
    m = np.moveaxis(m, mask_c.dims.index('neighborhood_size'), 0)
    # Size-3 mask is strictly smaller: the invalid cell's neighborhood
    # (and the convolution's zeroed latitude edges) also become invalid.
    assert m[0].sum() > m[1].sum()
    # Each slice equals the single-size computation's mask.
    for i, n in enumerate([1, 3]):
      single = spatial.neighborhood_averaging(da, n, wrap_longitude=True)
      np.testing.assert_array_equal(
          m[i], np.asarray(single.coords['mask'].values))

  def test_fss_multi_size_aggregates_each_size_with_its_own_mask(self):
    da = self._masked_grid()
    tgt = self._masked_grid()
    fss_multi = {'fss': spatial.FSS(neighborhood_size_in_pixels=[1, 3],
                                    wrap_longitude=True)}
    agg = aggregation.Aggregator(
        reduce_dims=['latitude', 'longitude'], masked=True)
    multi = aggregation.compute_metric_values_for_single_chunk(
        fss_multi, agg, {'v': da}, {'v': tgt})['fss.v']
    for i, n in enumerate([1, 3]):
      single = aggregation.compute_metric_values_for_single_chunk(
          {'fss': spatial.FSS(neighborhood_size_in_pixels=n,
                              wrap_longitude=True)},
          agg, {'v': da}, {'v': tgt})['fss.v']
      np.testing.assert_allclose(
          np.asarray(multi.isel({'neighborhood_size': i}).values),
          np.asarray(single.values), rtol=1e-6)


class TestEnsembleQuantilesDimGuard:
  def _da(self, dims, shape):
    import numpy as np
    rng = np.random.default_rng(0)
    return DimArray(rng.standard_normal(shape).astype(np.float32), dims,
                    {d: np.arange(s) for d, s in zip(dims, shape)})

  def test_custom_quantile_dim_with_existing_quantile_dim_ok(self):
    # A dim literally named 'quantile' is fine when quantile_dim='q'.
    da = self._da(('quantile', 'number'), (2, 5))
    out = wrappers.EnsembleQuantiles(
        'predictions', [0.5], quantile_dim='q').transform_fn(da)
    assert 'q' in out.dims and 'quantile' in out.dims

  def test_existing_configured_dim_raises(self):
    da = self._da(('q', 'number'), (2, 5))
    with pytest.raises(ValueError, match="'q'"):
      wrappers.EnsembleQuantiles(
          'predictions', [0.5], quantile_dim='q').transform_fn(da)
