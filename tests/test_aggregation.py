import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning, test_utils, weighting
from weatherbenchx_tpu.aggregation import AggregationState, Aggregator
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import deterministic


def _stat(values, dims=('x',), coords=None):
  return {'SquaredError': {'v': DimArray(np.asarray(values), dims, coords)}}


class TestAggregatorSemantics:
  def test_nan_propagates_by_default(self):
    agg = Aggregator(reduce_dims=['x'])
    state = agg.aggregate_statistics(_stat([1.0, np.nan, 3.0]))
    mean = state.mean_statistics()['SquaredError']['v']
    assert np.isnan(mean.item())

  def test_skipna(self):
    agg = Aggregator(reduce_dims=['x'], skipna=True)
    state = agg.aggregate_statistics(_stat([1.0, np.nan, 3.0]))
    mean = state.mean_statistics()['SquaredError']['v']
    assert mean.item() == pytest.approx(2.0)

  def test_masked(self):
    # Mask out position 1 (which contains a NaN) -> mean over the rest.
    da = DimArray(np.array([1.0, np.nan, 3.0]), ('x',))
    da = da.assign_coords(mask=Coord(('x',), np.array([True, False, True])))
    agg = Aggregator(reduce_dims=['x'], masked=True)
    state = agg.aggregate_statistics({'s': {'v': da}})
    assert state.mean_statistics()['s']['v'].item() == pytest.approx(2.0)

  def test_masked_with_nan_outside_mask_propagates(self):
    da = DimArray(np.array([1.0, np.nan, 3.0]), ('x',))
    da = da.assign_coords(mask=Coord(('x',), np.array([True, True, True])))
    agg = Aggregator(reduce_dims=['x'], masked=True)
    state = agg.aggregate_statistics({'s': {'v': da}})
    assert np.isnan(state.mean_statistics()['s']['v'].item())

  def test_masked_skipna_combination(self):
    da = DimArray(np.array([1.0, np.nan, 3.0]), ('x',))
    da = da.assign_coords(mask=Coord(('x',), np.array([True, True, True])))
    agg = Aggregator(reduce_dims=['x'], masked=True, skipna=True)
    state = agg.aggregate_statistics({'s': {'v': da}})
    assert state.mean_statistics()['s']['v'].item() == pytest.approx(2.0)

  def test_variable_without_reduce_dim_dropped(self):
    agg = Aggregator(reduce_dims=['y'])
    state = agg.aggregate_statistics(_stat([1.0, 2.0]))
    assert state.sum_weighted_statistics['SquaredError'] == {}

  def test_custom_weights(self):
    class W(weighting.Weighting):
      def weights(self, statistic):
        return DimArray(np.array([1.0, 2.0, 3.0]), ('x',))

    agg = Aggregator(reduce_dims=['x'], weigh_by=[W()])
    state = agg.aggregate_statistics(_stat([1.0, 1.0, 4.0]))
    expected = (1 + 2 + 12) / 6
    assert state.mean_statistics()['s' if False else 'SquaredError'][
        'v'].item() == pytest.approx(expected)

  def test_binning_latitude(self):
    lats = np.array([-45.0, 0.0, 45.0])
    da = DimArray(np.array([1.0, 2.0, 3.0]), ('latitude',),
                  {'latitude': lats})
    agg = Aggregator(
        reduce_dims=['latitude'],
        bin_by=[binning.LatitudeBins(degrees=90)])
    state = agg.aggregate_statistics({'s': {'v': da}})
    mean = state.mean_statistics()['s']['v']
    assert mean.dims == ('latitude_bins',)
    # Bins: [-90,0] includes -45 and 0; [0,90] includes 0 and 45.
    np.testing.assert_allclose(mean.values, [1.5, 2.5])

  def test_binning_regions_with_weights(self):
    preds, tgts = test_utils.canonical_forecast_pair(seed=5)
    regions = {'global': ((-90, 90), (0, 360)),
               'nh': ((20, 90), (0, 360)),
               'dateline': ((-90, 90), (170, -170))}
    agg = Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'],
        bin_by=[binning.Regions(regions)],
        weigh_by=[weighting.GridAreaWeighting()])
    results = aggregation.compute_metric_values_for_single_chunk(
        {'rmse': deterministic.RMSE()}, agg, preds, tgts)
    out = results['rmse.2m_temperature']
    assert out.dims == ('region',)
    assert list(out.coord_values('region')) == ['global', 'nh', 'dateline']
    # Manual check of the NH bin.
    da = preds['2m_temperature']
    lat = da.coord_values('latitude')
    lon = da.coord_values('longitude')
    w = weighting.cell_area_from_latitude(np.deg2rad(lat))
    w = w / w.mean()
    se = (da.values - tgts['2m_temperature'].values) ** 2
    m = ((lat >= 20) & (lat <= 90))[:, None] * np.ones_like(lon)[None, :]
    wfull = w[:, None] * m
    expected_nh = np.sqrt((se * wfull).sum() / (np.ones_like(se) * wfull).sum())
    np.testing.assert_allclose(out.values[1], expected_nh, rtol=1e-5)
    # Dateline-wrapping region is non-empty.
    assert np.isfinite(out.values[2])


class TestAggregationState:
  def _make_state(self, vals, coords=None):
    agg = Aggregator(reduce_dims=[])
    return agg.aggregate_statistics(
        {'s': {'v': DimArray(np.asarray(vals), ('x',), coords)}})

  def test_monoid_sum_fast_path(self):
    s1 = self._make_state([1.0, 2.0])
    s2 = self._make_state([3.0, 4.0])
    total = s1 + s2
    np.testing.assert_allclose(
        total.sum_weighted_statistics['s']['v'].values, [4.0, 6.0])
    np.testing.assert_allclose(total.sum_weights['s']['v'].values, [2.0, 2.0])

  def test_zero_identity(self):
    s1 = self._make_state([1.0, 2.0])
    total = AggregationState.zero() + s1 + AggregationState.zero()
    np.testing.assert_allclose(
        total.sum_weighted_statistics['s']['v'].values, [1.0, 2.0])
    assert AggregationState.sum([]).sum_weighted_statistics is None

  def test_outer_join_sum(self):
    s1 = self._make_state([1.0, 2.0], {'x': np.array([0, 1])})
    s2 = self._make_state([10.0, 20.0], {'x': np.array([1, 2])})
    total = s1 + s2
    ws = total.sum_weighted_statistics['s']['v']
    np.testing.assert_array_equal(ws.coord_values('x'), [0, 1, 2])
    np.testing.assert_allclose(ws.values, [1.0, 12.0, 20.0])
    w = total.sum_weights['s']['v']
    np.testing.assert_allclose(w.values, [1.0, 2.0, 1.0])

  def test_outer_join_disjoint_concat(self):
    s1 = self._make_state([1.0], {'x': np.array([0])})
    s2 = self._make_state([2.0], {'x': np.array([5])})
    total = s1 + s2
    np.testing.assert_allclose(
        total.sum_weighted_statistics['s']['v'].values, [1.0, 2.0])

  def test_host_float64_fast_path_stays_on_host(self):
    """Summing all-host (to_host float64) states must not round-trip
    through the device, which would silently downcast to float32."""
    s1 = self._make_state([1.0, 2.0]).to_host()
    s2 = self._make_state([3.0, 4.0]).to_host()
    total = AggregationState.sum([s1, s2])
    ws = total.sum_weighted_statistics['s']['v']
    assert isinstance(ws.data, np.ndarray), type(ws.data)
    assert ws.data.dtype == np.float64, ws.data.dtype
    np.testing.assert_allclose(np.asarray(ws.values), [4.0, 6.0])

  def test_zero_state_passthrough(self):
    """to_host / mean_statistics / metric_values on the zero state don't
    crash (e.g. a pipeline whose chunks were all dropped)."""
    z = AggregationState.zero()
    assert z.to_host().sum_weighted_statistics is None
    assert z.mean_statistics() == {}
    assert z.metric_values({}) == {}
    assert z.sum_along_dims(['x']).sum_weighted_statistics is None

  def test_sum_along_dims_missing_dim_is_noop(self):
    """Variables lacking the reduced dim pass through unchanged — x.sum(())
    must be a no-op, not a full reduction (bootstrap point estimates hit
    this for mixed-dim states)."""
    agg = Aggregator(reduce_dims=[])
    state = agg.aggregate_statistics({'s': {
        'with_dim': DimArray(np.arange(6.0).reshape(2, 3), ('unit', 'x')),
        'without_dim': DimArray(np.arange(3.0), ('x',)),
    }})
    out = state.sum_along_dims(['unit'])
    ws = out.sum_weighted_statistics['s']
    assert ws['with_dim'].dims == ('x',)
    np.testing.assert_allclose(np.asarray(ws['with_dim'].values),
                               [3.0, 5.0, 7.0])
    assert ws['without_dim'].dims == ('x',)  # untouched, not collapsed
    np.testing.assert_allclose(np.asarray(ws['without_dim'].values),
                               [0.0, 1.0, 2.0])

  def test_sum_along_dims(self):
    preds, tgts = test_utils.canonical_forecast_pair(seed=6)
    agg = Aggregator(reduce_dims=['latitude', 'longitude'])
    stats = {'se': {'t': (preds['2m_temperature']
                          - tgts['2m_temperature']) ** 2}}
    state = agg.aggregate_statistics(stats)
    reduced = state.sum_along_dims(['init_time', 'lead_time'])
    agg2 = Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'])
    direct = agg2.aggregate_statistics(stats)
    np.testing.assert_allclose(
        reduced.mean_statistics()['se']['t'].item(),
        direct.mean_statistics()['se']['t'].item(), rtol=1e-5)

  def test_dataset_roundtrip(self, tmp_path):
    preds, tgts = test_utils.canonical_forecast_pair(seed=7)
    agg = Aggregator(reduce_dims=['latitude', 'longitude'])
    state = agg.aggregate_statistics(
        {'se': {'2m_temperature': (preds['2m_temperature']
                                   - tgts['2m_temperature']) ** 2}})
    flat = state.to_dataset()
    assert 'se#2m_temperature#sum_weighted_statistics' in flat
    state2 = AggregationState.from_dataset(flat)
    np.testing.assert_allclose(
        state2.sum_weights['se']['2m_temperature'].values,
        state.sum_weights['se']['2m_temperature'].values)
    # File round-trip through the npz container.
    path = str(tmp_path / 'state.npz')
    state.save(path)
    state3 = AggregationState.load(path)
    np.testing.assert_allclose(
        state3.sum_weighted_statistics['se']['2m_temperature'].values,
        np.asarray(state.sum_weighted_statistics['se'][
            '2m_temperature'].values), rtol=1e-6)
    np.testing.assert_array_equal(
        state3.sum_weighted_statistics['se']['2m_temperature'
                                             ].coord_values('init_time'),
        preds['2m_temperature'].coord_values('init_time'))

  def test_chunked_equals_direct(self):
    """Summing per-chunk states == aggregating the full data at once."""
    preds, tgts = test_utils.canonical_forecast_pair(n_init=6, seed=8)
    metrics = {'rmse': deterministic.RMSE()}
    agg = Aggregator(
        reduce_dims=['init_time', 'lead_time', 'latitude', 'longitude'],
        weigh_by=[weighting.GridAreaWeighting()])
    direct = aggregation.compute_metric_values_for_single_chunk(
        metrics, agg, preds, tgts)

    from weatherbenchx_tpu.metrics import base as mbase
    states = []
    for i in range(0, 6, 2):
      p = {k: v.isel(init_time=slice(i, i + 2)) for k, v in preds.items()}
      t = {k: v.isel(init_time=slice(i, i + 2)) for k, v in tgts.items()}
      stats = mbase.compute_unique_statistics_for_all_metrics(metrics, p, t)
      states.append(agg.aggregate_statistics(stats))
    total = AggregationState.sum(states)
    chunked = total.metric_values(metrics)
    np.testing.assert_allclose(
        chunked['rmse.2m_temperature'].item(),
        direct['rmse.2m_temperature'].item(), atol=1e-5)


class TestWeighting:
  def test_area_weights_sum_to_sphere(self):
    lats = np.linspace(-90, 90, 19)
    w = weighting.cell_area_from_latitude(np.deg2rad(lats))
    # Total cell area integral over sphere = 2 (integral of cos from -pi/2..pi/2)
    np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-6)

  def test_descending_latitude(self):
    lats = np.linspace(90, -90, 19)
    da = DimArray(np.zeros(19), ('latitude',), {'latitude': lats})
    w = weighting.GridAreaWeighting().weights(da)
    np.testing.assert_allclose(np.asarray(w.values).mean(), 1.0)
    # Symmetric: weight at +90 == weight at -90
    np.testing.assert_allclose(w.values[0], w.values[-1])

  def test_no_latitude_dim(self):
    da = DimArray(np.zeros(3), ('x',))
    w = weighting.GridAreaWeighting().weights(da)
    assert w.dims == ()
    assert w.item() == 1.0


class TestBinning:
  def test_by_exact_coord(self):
    da = DimArray(np.arange(4.0), ('index',),
                  {'lead': Coord(('index',), np.array([1, 2, 1, 2]))})
    mask = binning.ByExactCoord('lead').create_bin_mask(da)
    assert mask.dims == ('lead', 'index')
    np.testing.assert_array_equal(mask.coord_values('lead'), [1, 2])
    np.testing.assert_array_equal(
        mask.values, [[1, 0, 1, 0], [0, 1, 0, 1]])

  def test_by_time_unit(self):
    times = np.array(['2020-01-01T00', '2020-01-01T06', '2020-01-02T00'],
                     dtype='datetime64[ns]')
    da = DimArray(np.arange(3.0), ('init_time',), {'init_time': times})
    mask = binning.ByTimeUnit('hour', 'init_time').create_bin_mask(da)
    assert mask.dims == ('init_time_hour', 'init_time')
    np.testing.assert_array_equal(mask.coord_values('init_time_hour'), [0, 6])
    np.testing.assert_array_equal(mask.values, [[1, 0, 1], [0, 1, 0]])

  def test_by_time_unit_from_seconds_matches(self):
    import jax.numpy as jnp
    times = np.array(['2020-01-01T00', '2020-01-01T06', '2020-01-02T00'],
                     dtype='datetime64[ns]')
    # The seconds coord is relative (e.g. seconds-of-day), matching the
    # reference semantics of a raw `coord // 3600` (binning.py:544-567).
    secs = times.astype('datetime64[s]').astype(np.int64) % 86400
    da = DimArray(np.arange(3.0), ('init_time',),
                  {'init_time': Coord(('init_time',), jnp.asarray(secs))})
    mask = binning.ByTimeUnitFromSeconds(
        'hour', 'init_time', bins=[0, 6]).create_bin_mask(da)
    np.testing.assert_array_equal(
        np.asarray(mask.values), [[1, 0, 1], [0, 1, 0]])
    # And it must be jit-traceable with the coord as a device leaf:
    import jax
    out = jax.jit(lambda d: binning.ByTimeUnitFromSeconds(
        'hour', 'init_time', bins=[0, 6]).create_bin_mask(d))(da)
    np.testing.assert_array_equal(np.asarray(out.values), mask.values)

  def test_by_sets_with_complements(self):
    da = DimArray(np.arange(3.0), ('index',),
                  {'station': Coord(('index',),
                                    np.array(['a', 'b', 'c']))})
    mask = binning.BySets(
        {'ab': ['a', 'b']}, 'station', bin_dim_name='station_set',
        add_set_complements=True, add_global_bin=True).create_bin_mask(da)
    np.testing.assert_array_equal(
        mask.coord_values('station_set'), ['ab', 'not_in_ab', 'global'])
    np.testing.assert_array_equal(
        mask.values, [[1, 1, 0], [0, 0, 1], [1, 1, 1]])

  def test_by_coord_bins(self):
    da = DimArray(np.arange(4.0), ('index',),
                  {'elev': Coord(('index',), np.array([10.0, 100.0, 1000.0,
                                                       50.0]))})
    mask = binning.ByCoordBins('elev', np.array([0.0, 100.0, 2000.0])
                               ).create_bin_mask(da)
    np.testing.assert_array_equal(mask.values, [[1, 0, 0, 1], [0, 1, 1, 0]])

  def test_regions_land_mask_label_aligned(self):
    """A land/sea mask stored in the OPPOSITE latitude order must be
    label-aligned before the positional AND — otherwise land flips
    north/south silently."""
    lat_desc = np.array([30.0, 10.0, -10.0, -30.0])
    lon = np.array([0.0, 180.0])
    # Land only in the northern half, stored ASCENDING.
    ls = DimArray(np.array([[0, 0], [0, 0], [1, 1], [1, 1]], np.float32),
                  ('latitude', 'longitude'),
                  {'latitude': lat_desc[::-1], 'longitude': lon})
    stat = DimArray(np.ones((4, 2)), ('latitude', 'longitude'),
                    {'latitude': lat_desc, 'longitude': lon})
    mask = binning.Regions({'global': ((-90, 90), (0, 360))},
                           land_sea_mask=ls).create_bin_mask(stat)
    land = np.asarray(mask.sel(region='global_land').values)
    # Land must land on the rows whose latitude > 0 (indices 0, 1 in the
    # statistic's descending order).
    np.testing.assert_array_equal(land, [[1, 1], [1, 1], [0, 0], [0, 0]])
    # Mismatched coordinate SETS must raise, not silently misbin.
    bad = DimArray(np.ones((3, 2)), ('latitude', 'longitude'),
                   {'latitude': np.array([0.0, 10.0, 20.0]),
                    'longitude': lon})
    with pytest.raises(ValueError, match='do not match'):
      binning.Regions({'global': ((-90, 90), (0, 360))},
                      land_sea_mask=bad).create_bin_mask(stat)

  def test_landsea_label_aligned(self):
    lat_desc = np.array([30.0, -30.0])
    lon = np.array([0.0, 180.0])
    frac = DimArray(np.array([[1.0, 1.0], [0.0, 0.0]]),
                    ('latitude', 'longitude'),
                    {'latitude': lat_desc[::-1], 'longitude': lon})
    stat = DimArray(np.ones((2, 2)), ('latitude', 'longitude'),
                    {'latitude': lat_desc, 'longitude': lon})
    mask = binning.LandSea(frac).create_bin_mask(stat)
    land = np.asarray(mask.sel(land_sea='land').values)
    # frac has land at its FIRST stored row (lat=-30); in the statistic's
    # descending order that is the SECOND row.
    np.testing.assert_array_equal(land, [[0, 0], [1, 1]])

  def test_duplicate_bin_dims_raise(self):
    agg = Aggregator(
        reduce_dims=['latitude'],
        bin_by=[binning.LatitudeBins(degrees=90),
                binning.LatitudeBins(degrees=45)])
    da = DimArray(np.zeros(3), ('latitude',),
                  {'latitude': np.array([-45.0, 0.0, 45.0])})
    with pytest.raises(ValueError, match='unique'):
      agg.aggregate_statistics({'s': {'v': da}})


class TestLongitudeBins:
  def test_longitude_bins(self):
    lons = np.array([0.0, 45.0, 90.0, 180.0, 270.0, 315.0])
    da = DimArray(np.ones(6), ('longitude',),
                  {'longitude': Coord(('longitude',), lons)})
    mask = binning.LongitudeBins(degrees=90.0).create_bin_mask(da)
    assert mask.dims == ('longitude_bins', 'longitude')
    np.testing.assert_array_equal(
        mask.coord_values('longitude_bins'), [0.0, 90.0, 180.0, 270.0])
    m = np.asarray(mask.values)
    # Reference parity: bands are CLOSED intervals [start, start+90], so
    # boundary longitudes belong to both neighbours, and the last band's
    # 360 wraps to 0 (reference binning.py:63-77).
    np.testing.assert_array_equal(m[0], [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 0, 1, 1, 0, 0])
    np.testing.assert_array_equal(m[3], [1, 0, 0, 0, 1, 1])

  def test_wraparound_range(self):
    # A range crossing the dateline: (300, 60) covers 300..360 and 0..60.
    lons = np.array([0.0, 30.0, 100.0, 310.0, 359.0])
    da = DimArray(np.ones(5), ('longitude',),
                  {'longitude': Coord(('longitude',), lons)})
    mask = binning.LongitudeBins(
        degrees=60.0, lon_range=(300, 60)).create_bin_mask(da)
    np.testing.assert_array_equal(
        mask.coord_values('longitude_bins'), [300.0, 0.0])
    m = np.asarray(mask.values)
    # [300, 360] wraps: 360 === 0, so lon 0 is inside (reference parity).
    np.testing.assert_array_equal(m[0], [1, 0, 0, 1, 1])  # 300-360
    np.testing.assert_array_equal(m[1], [1, 1, 0, 0, 0])  # 0-60


class TestByTimeUnitSets:
  def test_datetime_month_sets(self):
    t = np.array(['2020-01-10', '2020-02-10', '2020-06-10', '2020-07-10'],
                 dtype='datetime64[ns]')
    da = DimArray(np.ones(4), ('valid_time',),
                  {'valid_time': Coord(('valid_time',), t)})
    b = binning.ByTimeUnitSets(
        {'DJF': [12, 1, 2], 'JJA': [6, 7, 8]}, unit='month',
        dim='valid_time', add_global_bin=True)
    mask = b.create_bin_mask(da)
    assert mask.dims == ('valid_time_month_sets', 'valid_time')
    np.testing.assert_array_equal(
        mask.coord_values('valid_time_month_sets'),
        ['DJF', 'JJA', 'global'])
    m = np.asarray(mask.values)
    np.testing.assert_array_equal(m[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 0, 1, 1])
    np.testing.assert_array_equal(m[2], [1, 1, 1, 1])

  def test_timedelta_day_sets_scalar_member(self):
    lead = np.array([0, 24, 48, 120], 'timedelta64[h]').astype(
        'timedelta64[ns]')
    da = DimArray(np.ones(4), ('lead_time',),
                  {'lead_time': Coord(('lead_time',), lead)})
    b = binning.ByTimeUnitSets({'day1': 1, 'later': [2, 5]}, unit='day',
                               dim='lead_time')
    m = np.asarray(b.create_bin_mask(da).values)
    np.testing.assert_array_equal(m[0], [0, 1, 0, 0])
    np.testing.assert_array_equal(m[1], [0, 0, 1, 1])

  def test_aggregates_end_to_end(self):
    t = np.array(['2020-01-01', '2020-06-01'], dtype='datetime64[ns]')
    da = DimArray(np.array([2.0, 4.0]), ('valid_time',),
                  {'valid_time': Coord(('valid_time',), t)})
    agg = aggregation.Aggregator(
        reduce_dims=['valid_time'],
        bin_by=[binning.ByTimeUnitSets(
            {'winter': [12, 1, 2], 'summer': [6, 7, 8]},
            unit='month', dim='valid_time')])
    state = agg.aggregate_statistics({'s': {'v': da}})
    means = state.mean_statistics()['s']['v']
    np.testing.assert_allclose(np.asarray(means.values), [2.0, 4.0])


class TestBatchedDeviceSum:
  """AggregationState.sum over many states: O(N/64) dispatches, not O(N)."""

  def _states(self, n):
    import jax.numpy as jnp
    out = []
    for i in range(n):
      da = DimArray(jnp.full((3,), float(i + 1)), ('lead_time',),
                    {'lead_time': np.arange(3)})
      out.append(AggregationState(
          {'s': {'v': da}}, {'s': {'v': da.copy(data=jnp.ones(3))}}))
    return out

  def test_sum_correct(self):
    n = 130
    total = AggregationState.sum(self._states(n))
    np.testing.assert_allclose(
        np.asarray(total.sum_weighted_statistics['s']['v'].data),
        np.full(3, n * (n + 1) / 2))
    np.testing.assert_allclose(
        np.asarray(total.sum_weights['s']['v'].data), np.full(3, n))

  @pytest.mark.parametrize('n,expected_stacks', [(8, 1), (256, 4)])
  def test_dispatch_count_scales_by_batch(self, n, expected_stacks,
                                          monkeypatch):
    calls = {'stack': 0}
    orig_stack = aggregation.jnp.stack

    def counting_stack(xs, *a, **kw):
      calls['stack'] += 1
      return orig_stack(xs, *a, **kw)

    monkeypatch.setattr(aggregation.jnp, 'stack', counting_stack)
    AggregationState.sum(self._states(n))
    # Two leaf trees (stats + weights) -> 2 * ceil(n/64) stack+sum programs.
    assert calls['stack'] == 2 * expected_stacks
