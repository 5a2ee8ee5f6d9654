"""Interpolation kernels, sparse parquet loading, latency wrappers."""

import os

import numpy as np
import pytest

from weatherbenchx_tpu import aggregation, binning, interpolations
from weatherbenchx_tpu import time_chunks as tc
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base as data_base
from weatherbenchx_tpu.data import latency_wrappers, loaders, sparse_parquet
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.parallel import pipeline as pl


def grid_da(nlat=7, nlon=8, extra=None, seed=0, fn=None):
  lats = np.linspace(-90, 90, nlat)
  lons = np.linspace(0, 360, nlon, endpoint=False)
  if fn is None:
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((nlat, nlon)).astype(np.float64)
  else:
    data = fn(lats[:, None], lons[None, :])
  dims = ('latitude', 'longitude')
  coords = {'latitude': lats, 'longitude': lons}
  da = DimArray(data, dims, coords)
  if extra:
    da = da.expand_dims({'time': extra})
  return da


class TestInterpKernels:
  def test_linear_exact_on_linear_function(self):
    da = grid_da(fn=lambda lat, lon: 2.0 * lat + 0.5 * lon)
    out = interpolations.interpolate_to_coords(
        da, {'latitude': np.array([-45.5, 12.25]),
             'longitude': np.array([10.0, 33.3, 200.0])}, 'linear')
    expected = (2.0 * np.array([-45.5, 12.25])[:, None]
                + 0.5 * np.array([10.0, 33.3, 200.0])[None, :])
    np.testing.assert_allclose(np.asarray(out.values), expected, rtol=1e-6)
    np.testing.assert_array_equal(out.coord_values('latitude'),
                                  [-45.5, 12.25])

  def test_nearest(self):
    da = grid_da()
    out = interpolations.interpolate_to_coords(
        da, {'latitude': np.array([-89.0])}, 'nearest')
    np.testing.assert_allclose(
        np.asarray(out.values), np.asarray(da.values)[[0]], rtol=1e-6)

  def test_extrapolation_and_bounds(self):
    da = grid_da(fn=lambda lat, lon: lat + 0 * lon)
    out = interpolations.interpolate_to_coords(
        da, {'latitude': np.array([-100.0])}, 'linear',
        extrapolate_out_of_bounds=True)
    np.testing.assert_allclose(np.asarray(out.values)[0], -100.0, rtol=1e-6)
    out2 = interpolations.interpolate_to_coords(
        da, {'latitude': np.array([-100.0])}, 'linear',
        extrapolate_out_of_bounds=False)
    assert np.isnan(np.asarray(out2.values)).all()

  def test_descending_latitude(self):
    da = grid_da(fn=lambda lat, lon: lat + 0 * lon)
    da_desc = da.sortby('latitude', ascending=False)
    out = interpolations.interpolate_to_coords(
        da_desc, {'latitude': np.array([17.3])}, 'linear')
    np.testing.assert_allclose(np.asarray(out.values)[0], 17.3, rtol=1e-6)

  def test_pointwise_grid_to_sparse(self):
    da = grid_da(fn=lambda lat, lon: lat * 2 + lon * 0.1)
    stations = DimArray(
        np.array([-10.0, 40.0]), ('index',),
        {'index': np.arange(2),
         'stationName': Coord(('index',), np.array(['AAA', 'BBB'])),
         'latitude': Coord(('index',), np.array([-10.0, 40.0])),
         'longitude': Coord(('index',), np.array([45.0, 100.0]))})
    dim_args = {
        'latitude': DimArray(np.array([-10.0, 40.0]), ('index',),
                             stations.coords),
        'longitude': DimArray(np.array([45.0, 100.0]), ('index',),
                              stations.coords)}
    out = interpolations.interpolate_to_coords(da, dim_args, 'linear')
    assert out.dims == ('index',)
    np.testing.assert_allclose(
        np.asarray(out.values),
        np.array([-10.0 * 2 + 4.5, 40.0 * 2 + 10.0]), rtol=1e-6)
    # Station coords carried through.
    np.testing.assert_array_equal(
        out.coord_values('stationName'), ['AAA', 'BBB'])

  def test_wrap_longitude(self):
    da = grid_da(nlon=8, fn=lambda lat, lon: np.cos(np.deg2rad(lon)) + 0 * lat)
    # Interpolate at lon=337.5+22.5/2 (between last point 315 and wrap 360).
    tgt = np.array([337.5])
    wrapped = interpolations.InterpolateToFixedCoords(
        'linear', {'longitude': tgt}, wrap_longitude=True)
    out = wrapped.interpolate_data_array(da)
    v_last, v_first = np.cos(np.deg2rad(315)), np.cos(0)
    np.testing.assert_allclose(
        np.asarray(out.values)[:, 0], (v_last + v_first) / 2, rtol=1e-6)

  def test_crop_and_subsample(self):
    da = grid_da()
    crop = interpolations.CropToBox(-30, 30, 45, 180)
    out = crop.interpolate_data_array(da)
    assert (np.abs(out.coord_values('latitude')) <= 30).all()
    assert (out.coord_values('longitude') >= 45).all()
    sub = interpolations.Subsample(['longitude'], 2)
    out2 = sub.interpolate_data_array(da)
    assert out2.sizes['longitude'] == 4

  def test_altitude_adjustment_temperature(self):
    da = grid_da(fn=lambda lat, lon: 280.0 + 0 * lat * lon)
    grid_elev = grid_da(fn=lambda lat, lon: 100.0 + 0 * lat * lon)
    ref = DimArray(
        np.zeros(2), ('index',),
        {'latitude': Coord(('index',), np.array([0.0, 10.0])),
         'longitude': Coord(('index',), np.array([45.0, 90.0])),
         'elevation': Coord(('index',), np.array([600.0, 100.0]))})
    interp = interpolations.GridToSparseWithAltitudeAdjustment(
        'linear', grid_elevation=grid_elev)
    out = interp.interpolate({'2m_temperature': da},
                             {'2m_temperature': ref})['2m_temperature']
    # Station 0 is 500m above grid: T - 500*0.0065 = 276.75; station 1 same.
    np.testing.assert_allclose(
        np.asarray(out.values), [280.0 - 500 * 0.0065, 280.0], rtol=1e-6)

  def test_altitude_adjustment_through_multiple_interpolation(self):
    """The variable name must survive composition: wrapped in
    MultipleInterpolation, the temperature adjustment still applies
    (previously name=None silently skipped it)."""
    da = grid_da(fn=lambda lat, lon: 280.0 + 0 * lat * lon)
    grid_elev = grid_da(fn=lambda lat, lon: 100.0 + 0 * lat * lon)
    ref = DimArray(
        np.zeros(2), ('index',),
        {'latitude': Coord(('index',), np.array([0.0, 10.0])),
         'longitude': Coord(('index',), np.array([45.0, 90.0])),
         'elevation': Coord(('index',), np.array([600.0, 100.0]))})
    interp = interpolations.MultipleInterpolation([
        interpolations.GridToSparseWithAltitudeAdjustment(
            'linear', grid_elevation=grid_elev)])
    out = interp.interpolate({'2m_temperature': da},
                             {'2m_temperature': ref})['2m_temperature']
    np.testing.assert_allclose(
        np.asarray(out.values), [280.0 - 500 * 0.0065, 280.0], rtol=1e-6)

  def test_altitude_adjustment_integer_elevation(self):
    """An int-typed DEM grid_elevation must interpolate along (promoted to
    float), not be silently dropped → KeyError downstream."""
    da = grid_da(fn=lambda lat, lon: 280.0 + 0 * lat * lon)
    grid_elev = grid_da(fn=lambda lat, lon: 100.0 + 0 * lat * lon)
    grid_elev = grid_elev.copy(
        data=np.asarray(grid_elev.values).astype(np.int32))
    ref = DimArray(
        np.zeros(2), ('index',),
        {'latitude': Coord(('index',), np.array([0.0, 10.0])),
         'longitude': Coord(('index',), np.array([45.0, 90.0])),
         'elevation': Coord(('index',), np.array([600.0, 100.0]))})
    interp = interpolations.GridToSparseWithAltitudeAdjustment(
        'linear', grid_elevation=grid_elev)
    out = interp.interpolate({'2m_temperature': da},
                             {'2m_temperature': ref})['2m_temperature']
    np.testing.assert_allclose(
        np.asarray(out.values), [280.0 - 500 * 0.0065, 280.0], rtol=1e-6)

  def test_altitude_adjustment_wind(self):
    da = grid_da(fn=lambda lat, lon: 10.0 + 0 * lat * lon)
    grid_elev = grid_da(fn=lambda lat, lon: 0.0 * lat * lon)
    ref = DimArray(
        np.zeros(3), ('index',),
        {'latitude': Coord(('index',), np.array([0.0, 0.0, 0.0])),
         'longitude': Coord(('index',), np.array([45.0, 90.0, 135.0])),
         'elevation': Coord(('index',), np.array([50.0, 600.0, 1300.0]))})
    interp = interpolations.GridToSparseWithAltitudeAdjustment(
        'linear', grid_elevation=grid_elev)
    out = interp.interpolate({'10m_wind_speed': da},
                             {'10m_wind_speed': ref})['10m_wind_speed']
    np.testing.assert_allclose(
        np.asarray(out.values),
        [10.0, 10.0 * (1 + 0.002 * 500), 10.0 * 3], rtol=1e-6)

  def test_neighborhood_threshold_probabilities(self):
    da = grid_da(nlat=9, nlon=12, fn=lambda lat, lon: 0 * lat * lon)
    d = np.asarray(da.values).copy()
    d[4, 6] = 1.0
    da = da.copy(data=d)
    interp = interpolations.NeighborhoodThresholdProbabilities(
        neighborhood_sizes=[1, 3], thresholds=[0.5])
    out = interp.interpolate_data_array(da)
    assert 'smoothing_neighborhood' in out.dims
    v = out.transpose('smoothing_neighborhood', 'threshold_value',
                      'latitude', 'longitude').values
    assert np.asarray(v)[0, 0, 4, 6] == 1.0
    np.testing.assert_allclose(np.asarray(v)[1, 0, 4, 6], 1 / 9, atol=1e-6)

  def test_empty_reference(self):
    da = grid_da(extra=3)
    ref = DimArray(np.zeros(0), ('index',),
                   {'latitude': Coord(('index',), np.zeros(0)),
                    'longitude': Coord(('index',), np.zeros(0))})
    interp = interpolations.InterpolateToReferenceCoords('linear')
    out = interp.interpolate_data_array(da, ref)
    assert out.sizes['index'] == 0
    assert out.sizes['time'] == 3


def _write_parquet_fixture(tmp_path, n_stations=5):
  import pandas as pd

  times = np.arange('2020-01-01T00', '2020-01-03T00',
                    np.timedelta64(6, 'h'), dtype='datetime64[ns]')
  rows = []
  rng = np.random.default_rng(0)
  for t in times:
    for s in range(n_stations):
      rows.append({
          'timeNominal': pd.Timestamp(t),
          'stationName': f'ST{s}',
          'latitude': -60.0 + 25.0 * s,
          'longitude': 10.0 + 60.0 * s,
          'elevation': 100.0 * s,
          'temperature': 270.0 + rng.standard_normal(),
          'temperatureDD': 'S' if s != 3 else 'Z',  # one bad-quality station
      })
  df = pd.DataFrame(rows)
  path = str(tmp_path / 'obs')
  for month, g in df.groupby(df.timeNominal.dt.month):
    fn = os.path.join(path, 'year=2020', f'month={month}',
                      f'2020-{str(month).zfill(2)}.parquet')
    os.makedirs(os.path.dirname(fn), exist_ok=True)
    g.to_parquet(fn)
  return path, df


class TestSparseParquet:
  def test_basic_load(self, tmp_path):
    path, df = _write_parquet_fixture(tmp_path)
    loader = sparse_parquet.SparseObservationsFromParquet(
        path=path, partitioned_by='month', time_dim='timeNominal',
        variables=['temperature'],
        coordinate_variables=['latitude', 'longitude', 'stationName'])
    init_times = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead_times = np.array([6, 12], dtype='timedelta64[h]').astype(
        'timedelta64[ns]')
    chunk = loader.load_chunk(init_times, lead_times)
    da = chunk['temperature']
    assert da.dims == ('index',)
    assert da.sizes['index'] == 10  # 2 lead times x 5 stations
    assert set(np.unique(da.coord_values('stationName'))) == {
        'ST0', 'ST1', 'ST2', 'ST3', 'ST4'}
    np.testing.assert_array_equal(
        np.unique(da.coord_values('lead_time').astype('timedelta64[h]')
                  .astype(int)), [6, 12])

  def test_metar_qc_flags(self, tmp_path):
    path, df = _write_parquet_fixture(tmp_path)
    loader = sparse_parquet.METARFromParquet(
        path=path, variables=['2m_temperature'], time_dim='timeNominal',
        partitioned_by='month')
    init_times = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead_times = np.array([6], dtype='timedelta64[h]').astype(
        'timedelta64[ns]')
    chunk = loader.load_chunk(init_times, lead_times)
    da = chunk['2m_temperature']
    vals = np.asarray(da.values)
    names = da.coord_values('stationName')
    assert np.isnan(vals[names == 'ST3']).all()  # QC flag 'Z' -> NaN
    assert not np.isnan(vals[names == 'ST0']).any()

  def test_end_to_end_sparse_eval(self, tmp_path):
    """Grid forecast vs sparse obs through the full pipeline."""
    path, df = _write_parquet_fixture(tmp_path)
    targets_loader = sparse_parquet.SparseObservationsFromParquet(
        path=path, partitioned_by='month', time_dim='timeNominal',
        variables=['t'],
        rename_variables={'temperature': 't'},
        coordinate_variables=['latitude', 'longitude', 'stationName'],
        add_nan_mask=True)
    # Gridded predictions interpolated to stations.
    lats = np.linspace(-90, 90, 19)
    lons = np.linspace(0, 360, 36, endpoint=False)
    init = np.array(['2020-01-01T00', '2020-01-01T12'],
                    dtype='datetime64[ns]')
    lead = np.array([6, 12], dtype='timedelta64[h]').astype('timedelta64[ns]')
    rng = np.random.default_rng(1)
    pred_ds = {'t': DimArray(
        270 + rng.standard_normal((2, 2, 19, 36)).astype(np.float32),
        ('init_time', 'lead_time', 'latitude', 'longitude'),
        {'init_time': init, 'lead_time': lead,
         'latitude': lats, 'longitude': lons})}
    predictions_loader = loaders.PredictionsFromDataset(
        ds=pred_ds, rename_dimensions=None,
        interpolation=interpolations.InterpolateToReferenceCoords('linear'))
    metrics = {'rmse': deterministic.RMSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['index'], masked=True,
        bin_by=[binning.ByExactCoord('lead_time')])
    values = pl.evaluate(
        metrics, agg, predictions_loader, targets_loader,
        tc.TimeChunks(init, lead, init_time_chunk_size=1))
    out = values['rmse.t']
    assert out.dims == ('lead_time',)
    assert np.isfinite(np.asarray(out.values)).all()

  def test_stats_sink_keeps_station_coords(self, tmp_path):
    """Statistics streamed via chunk_stats_sink keep the per-row host
    coords (stationName) that lean_pair strips for retrace-free eval."""
    path, df = _write_parquet_fixture(tmp_path)
    targets_loader = sparse_parquet.SparseObservationsFromParquet(
        path=path, partitioned_by='month', time_dim='timeNominal',
        variables=['t'],
        rename_variables={'temperature': 't'},
        coordinate_variables=['latitude', 'longitude', 'stationName'],
        add_nan_mask=True)
    lats = np.linspace(-90, 90, 19)
    lons = np.linspace(0, 360, 36, endpoint=False)
    init = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead = np.array([6, 12], dtype='timedelta64[h]').astype('timedelta64[ns]')
    rng = np.random.default_rng(1)
    pred_ds = {'t': DimArray(
        270 + rng.standard_normal((1, 2, 19, 36)).astype(np.float32),
        ('init_time', 'lead_time', 'latitude', 'longitude'),
        {'init_time': init, 'lead_time': lead,
         'latitude': lats, 'longitude': lons})}
    predictions_loader = loaders.PredictionsFromDataset(
        ds=pred_ds, rename_dimensions=None,
        interpolation=interpolations.InterpolateToReferenceCoords('linear'))
    emitted = []
    pl.EvaluationPipeline(
        metrics={'rmse': deterministic.RMSE()},
        aggregator=aggregation.Aggregator(reduce_dims=['index'],
                                          masked=True),
        predictions_loader=predictions_loader,
        targets_loader=targets_loader,
        times=tc.TimeChunks(init, lead, init_time_chunk_size=1),
        chunk_stats_sink=lambda i, offsets, flat: emitted.append(flat),
    ).run()
    assert emitted
    for flat in emitted:
      da = flat['SquaredError.t']
      assert da.has_coord('stationName'), sorted(da.coords)
      names = np.asarray(da.coords['stationName'].values)
      assert names.shape == (da.sizes['index'],)
      assert any(str(n).startswith('ST') for n in names.ravel())

  def test_pad_dim_to_multiple(self):
    da = DimArray(np.arange(5.0), ('index',),
                  {'stationName': Coord(('index',),
                                        np.array(['a', 'b', 'c', 'd', 'e'])),
                   'latitude': Coord(('index',), np.arange(5.0))})
    padded = data_base.pad_dim_to_multiple({'v': da}, 'index', 4)['v']
    assert padded.sizes['index'] == 8
    assert np.isnan(np.asarray(padded.values)[5:]).all()
    mask = np.asarray(padded.coords['mask'].values)
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0, 0, 0])
    assert padded.coord_values('stationName')[5] == ''
    # Masked aggregation over padded chunk == unpadded mean.
    agg = aggregation.Aggregator(reduce_dims=['index'], masked=True)
    state = agg.aggregate_statistics({'s': {'v': padded}})
    assert state.mean_statistics()['s']['v'].item() == pytest.approx(2.0)

  def test_pad_preserves_non_float_dtypes(self):
    """int64/bool/datetime data keeps its dtype when padded (0-fill + mask),
    so padded and exact-multiple chunks stay layout-identical."""
    big = 2**60 + 7  # would corrupt under a float32 (or even float64) cast
    ints = DimArray(np.array([big, 1, 2], np.int64), ('index',))
    bools = DimArray(np.array([True, False, True]), ('index',))
    times = DimArray(
        np.array(['2020-01-01', '2020-01-02', '2020-01-03'],
                 'datetime64[ns]'), ('index',))
    padded = data_base.pad_dim_to_multiple(
        {'i': ints, 'b': bools, 't': times}, 'index', 4)
    assert padded['i'].dtype == np.int64
    assert np.asarray(padded['i'].values)[0] == big
    np.testing.assert_array_equal(np.asarray(padded['i'].values)[3:], [0])
    assert padded['b'].dtype == np.bool_
    assert padded['t'].dtype == np.dtype('datetime64[ns]')
    for v in padded.values():
      np.testing.assert_array_equal(
          np.asarray(v.coords['mask'].values), [1, 1, 1, 0])
    # Exact-multiple path (with existing mask) returns the same dtype.
    exact = data_base.pad_dim_to_multiple(
        {'i': padded['i']}, 'index', 4)['i']
    assert exact.dtype == np.int64


class TestLatencyWrappers:
  def _forecast_ds(self):
    # Nominal inits at 00/12 UTC over 3 days, leads 0..36h.
    init = np.arange('2020-01-01T00', '2020-01-04T00',
                     np.timedelta64(12, 'h'), dtype='datetime64[ns]')
    # Hourly leads: latency adjustment shifts leads by the init offset, so
    # adjusted leads must exist on the nominal grid.
    lead = (np.arange(0, 42, 1) * np.timedelta64(1, 'h')).astype(
        'timedelta64[ns]')
    # Data encodes valid_time in hours since epoch so we can verify
    # alignment after latency adjustment.
    vt = (init[:, None] + lead[None, :]).astype('datetime64[h]').astype(int)
    return {'t': DimArray(
        vt.astype(np.float64), ('init_time', 'lead_time'),
        {'init_time': init, 'lead_time': lead})}

  def test_constant_latency(self):
    ds = self._forecast_ds()
    loader = loaders.PredictionsFromDataset(ds=ds, rename_dimensions=None)
    wrapper = latency_wrappers.DatasetConstantLatencyWrapper(
        loader, latency=np.timedelta64(6, 'h'))
    # Query init 2020-01-01T18 (between nominal 12 and next 00+6h issue):
    # most recent available: nominal 12 (issue 18 <= 18).
    init_times = np.array(['2020-01-01T18'], dtype='datetime64[ns]')
    lead_times = np.array([6], dtype='timedelta64[h]').astype(
        'timedelta64[ns]')
    chunk = wrapper.load_chunk(init_times, lead_times)
    da = chunk['t']
    # Returned coords are the REQUESTED times.
    np.testing.assert_array_equal(da.coord_values('init_time'), init_times)
    np.testing.assert_array_equal(da.coord_values('lead_time'), lead_times)
    # But data comes from nominal init 12h with lead 12h = valid 2020-01-02T00.
    expected_vt = np.datetime64('2020-01-02T00', 'h').astype(int)
    assert da.values.item() == expected_vt

  def test_no_available_init_raises(self):
    ds = self._forecast_ds()
    loader = loaders.PredictionsFromDataset(ds=ds, rename_dimensions=None)
    wrapper = latency_wrappers.DatasetConstantLatencyWrapper(
        loader, latency=np.timedelta64(6, 'h'))
    with pytest.raises(ValueError, match='No available init time'):
      wrapper.load_chunk(
          np.array(['2019-12-31T00'], dtype='datetime64[ns]'),
          np.array([6], dtype='timedelta64[h]').astype('timedelta64[ns]'))

  def test_multiple_latency_picks_freshest(self):
    ds = self._forecast_ds()
    # Loader A: 00/12 inits with 6h latency. Loader B: 06/18 inits with 3h.
    init_b = np.arange('2020-01-01T06', '2020-01-04T06',
                       np.timedelta64(12, 'h'), dtype='datetime64[ns]')
    lead = (np.arange(0, 42, 1) * np.timedelta64(1, 'h')).astype(
        'timedelta64[ns]')
    vt_b = (init_b[:, None] + lead[None, :]).astype(
        'datetime64[h]').astype(int)
    ds_b = {'t': DimArray(vt_b.astype(np.float64) + 0.5,
                          ('init_time', 'lead_time'),
                          {'init_time': init_b, 'lead_time': lead})}
    wa = latency_wrappers.DatasetConstantLatencyWrapper(
        loaders.PredictionsFromDataset(ds=ds, rename_dimensions=None),
        latency=np.timedelta64(6, 'h'))
    wb = latency_wrappers.DatasetConstantLatencyWrapper(
        loaders.PredictionsFromDataset(ds=ds_b, rename_dimensions=None),
        latency=np.timedelta64(3, 'h'))
    multi = latency_wrappers.MultipleConstantLatencyWrapper([wa, wb])
    # At init 2020-01-01T10: A's latest issue 06 (00+6h); B's latest issue
    # 09 (06+3h) -> B is fresher (offset 4h vs 10h).
    chunk = multi.load_chunk(
        np.array(['2020-01-01T10'], dtype='datetime64[ns]'),
        np.array([6], dtype='timedelta64[h]').astype('timedelta64[ns]'))
    # B's data has +0.5 marker.
    assert chunk['t'].values.item() % 1 == 0.5


class TestInterpReviewFixes:
  """Regression tests for the round-3 interpolation-layer review findings."""

  def test_altitude_adjustment_empty_reference(self):
    """Zero-station reference: the inherited empty guard must win — no
    KeyError from the missing interpolated grid_elevation coord."""
    da = grid_da(fn=lambda lat, lon: 280.0 + 0 * lat * lon)
    grid_elev = grid_da(fn=lambda lat, lon: 100.0 + 0 * lat * lon)
    ref = DimArray(
        np.zeros(0), ('index',),
        {'latitude': Coord(('index',), np.zeros(0)),
         'longitude': Coord(('index',), np.zeros(0)),
         'elevation': Coord(('index',), np.zeros(0))})
    interp = interpolations.GridToSparseWithAltitudeAdjustment(
        'linear', grid_elevation=grid_elev)
    out = interp.interpolate({'2m_temperature': da},
                             {'2m_temperature': ref})['2m_temperature']
    assert out.sizes['index'] == 0

  def test_pointwise_rejects_unknown_method(self):
    da = grid_da()
    stations = {
        'latitude': DimArray(np.array([0.0]), ('index',),
                             {'index': np.arange(1)}),
        'longitude': DimArray(np.array([45.0]), ('index',),
                              {'index': np.arange(1)})}
    with pytest.raises(ValueError, match='Unsupported interpolation method'):
      interpolations.interpolate_to_coords(da, stations, 'cubic')

  def test_outer_rejects_unknown_method(self):
    da = grid_da()
    with pytest.raises(ValueError, match='Unsupported interpolation method'):
      interpolations.interpolate_to_coords(
          da, {'latitude': np.array([0.0])}, 'cubic')

  def test_non_monotonic_source_raises(self):
    """Wrap-around-unsorted longitudes must fail loudly, not corrupt."""
    lons = np.array([350.0, 355.0, 0.0, 5.0, 10.0, 15.0, 20.0, 25.0])
    da = DimArray(np.arange(8.0), ('longitude',), {'longitude': lons})
    with pytest.raises(ValueError, match='strictly monotonic'):
      interpolations.interpolate_to_coords(
          da, {'longitude': np.array([2.0])}, 'linear')

  def test_duplicate_source_coord_raises(self):
    lats = np.array([0.0, 10.0, 10.0, 30.0])
    da = DimArray(np.arange(4.0), ('latitude',), {'latitude': lats})
    with pytest.raises(ValueError, match='strictly monotonic'):
      interpolations.interpolate_to_coords(
          da, {'latitude': np.array([5.0])}, 'linear')

  def test_bool_mask_coord_survives_regridding(self):
    """A boolean validity-mask coord over interpolated dims is kept (as
    bool), valid only where every contributing source point is valid."""
    da = grid_da(nlat=5, nlon=8, fn=lambda lat, lon: lat + 0 * lon)
    mask = np.ones((5, 8), dtype=bool)
    mask[2, :] = False  # invalid latitude row at 0 deg
    da = da.assign_coords(mask=Coord(('latitude', 'longitude'), mask))
    out = interpolations.interpolate_to_coords(
        da, {'latitude': np.array([-90.0, -22.5, 45.0])}, 'linear')
    assert 'mask' in out.coords
    mv = np.asarray(out.coords['mask'].values)
    assert mv.dtype == np.bool_
    # -90 sits on a fully valid row; -22.5 is halfway between the valid
    # -45 row and the invalid 0 row; 45 is exactly on a valid row.
    assert mv[0].all()
    assert not mv[1].any()
    assert mv[2].all()

  def test_dropna_integer_variable(self, tmp_path):
    """dropna=True with an int64 column must keep all rows, not crash."""
    import pandas as pd

    times = np.arange('2020-01-01T00', '2020-01-01T12',
                      np.timedelta64(6, 'h'), dtype='datetime64[ns]')
    rows = []
    for t in times:
      for s in range(3):
        rows.append({
            'timeNominal': pd.Timestamp(t),
            'stationName': f'ST{s}',
            'latitude': 10.0 * s,
            'longitude': 20.0 * s,
            'cloudCount': np.int64(s),  # integer variable, no NaN notion
            'temperature': np.nan if s == 1 else 270.0,
        })
    df = pd.DataFrame(rows)
    fn = os.path.join(str(tmp_path / 'obs'), 'year=2020', 'month=1',
                      '2020-01.parquet')
    os.makedirs(os.path.dirname(fn), exist_ok=True)
    df.to_parquet(fn)

    loader = sparse_parquet.SparseObservationsFromParquet(
        path=str(tmp_path / 'obs'), partitioned_by='month',
        time_dim='timeNominal', variables=['cloudCount'],
        coordinate_variables=['latitude', 'longitude', 'stationName'],
        dropna=True)
    init = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead = np.array([6], dtype='timedelta64[h]').astype('timedelta64[ns]')
    chunk = loader.load_chunk(init, lead)
    assert chunk['cloudCount'].sizes['index'] == 3  # nothing dropped

    # Mixed float+int without split: only the float NaN row drops.
    loader2 = sparse_parquet.SparseObservationsFromParquet(
        path=str(tmp_path / 'obs'), partitioned_by='month',
        time_dim='timeNominal', variables=['temperature', 'cloudCount'],
        coordinate_variables=['latitude', 'longitude', 'stationName'],
        dropna=True, split_variables=False)
    chunk2 = loader2.load_chunk(init, lead)
    assert chunk2['cloudCount'].sizes['index'] == 2


class TestParquetFileCache:
  """cache_files: one decode per file, identical results to per-point reads."""

  def _load(self, path, cache_files, tolerance=None, remove_duplicates=False):
    loader = sparse_parquet.SparseObservationsFromParquet(
        path=path, partitioned_by='month', time_dim='timeNominal',
        variables=['temperature'],
        coordinate_variables=['latitude', 'longitude', 'stationName'],
        tolerance=tolerance,
        remove_duplicates=remove_duplicates,
        observation_dim='stationName' if remove_duplicates else None,
        pick_closest_duplicate_by='timeNominal' if remove_duplicates else None,
        cache_files=cache_files)
    init_times = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
    lead_times = np.array([6, 12], dtype='timedelta64[h]').astype(
        'timedelta64[ns]')
    return loader.load_chunk(init_times, lead_times)

  @pytest.mark.parametrize('kwargs', [
      {},
      {'tolerance': np.timedelta64(30, 'm')},
      {'tolerance': np.timedelta64(30, 'm'), 'remove_duplicates': True},
  ])
  def test_cached_equals_uncached(self, tmp_path, kwargs):
    path, _ = _write_parquet_fixture(tmp_path)
    plain = self._load(path, cache_files=0, **kwargs)
    cached = self._load(path, cache_files=4, **kwargs)
    for var in plain:
      np.testing.assert_array_equal(
          np.asarray(plain[var].values), np.asarray(cached[var].values))
      for cname in plain[var].coords:
        np.testing.assert_array_equal(
            np.asarray(plain[var].coords[cname].values),
            np.asarray(cached[var].coords[cname].values))

  def test_cached_metar_preprocessing_equals_uncached(self, tmp_path):
    """The cached path applies row-wise preprocessing once per FILE (QC
    NaNing, longitude wrap, elevation fill); results must equal the
    uncached per-window application exactly."""
    path, _ = _write_parquet_fixture(tmp_path)

    def load(cache_files):
      loader = sparse_parquet.METARFromParquet(
          path=path, variables=['2m_temperature'], time_dim='timeNominal',
          partitioned_by='month', tolerance=np.timedelta64(30, 'm'),
          remove_duplicates=True, pick_closest_duplicate_by='timeNominal',
          cache_files=cache_files)
      init_times = np.array(['2020-01-01T00'], dtype='datetime64[ns]')
      lead_times = np.array([6, 12], dtype='timedelta64[h]').astype(
          'timedelta64[ns]')
      return loader.load_chunk(init_times, lead_times)

    plain, cached = load(0), load(4)
    for var in plain:
      np.testing.assert_array_equal(
          np.asarray(plain[var].values), np.asarray(cached[var].values))
      assert np.isnan(np.asarray(cached[var].values)).any(), \
          'QC flag NaNing must have applied on the cached path'
      for cname in plain[var].coords:
        np.testing.assert_array_equal(
            np.asarray(plain[var].coords[cname].values),
            np.asarray(cached[var].coords[cname].values), err_msg=cname)

  def test_non_rowwise_preprocess_rejected(self):
    """Cached preprocessing must be row-wise (ADVICE r4): time edits,
    sorting, and row additions are detected; row-wise value edits and
    drops pass."""
    t = np.array(['2020-01-01T00', '2020-01-01T02', '2020-01-01T01',
                  '2020-01-01T02'], dtype='datetime64[ns]')
    check = sparse_parquet._check_rowwise_preprocess
    check(t, t)                      # identity
    check(t, t[[0, 2, 3]])           # row drops keep order
    with pytest.raises(ValueError, match='row-wise'):
      check(t, np.sort(t))           # sorting reorders
    with pytest.raises(ValueError, match='row-wise'):
      check(t, t + np.timedelta64(1, 'h'))  # time edit
    with pytest.raises(ValueError, match='row-wise'):
      check(t, np.concatenate([t, t[:1]]))  # addition
    # Large-file fallback: multiset check catches edits/additions.
    big = np.repeat(t, 3)
    check(big, big[::2], exact_limit=4)
    with pytest.raises(ValueError, match='row-wise'):
      check(big, big[::2] + np.timedelta64(1, 'h'), exact_limit=4)

  def test_decodes_once_per_file(self, tmp_path, monkeypatch):
    path, _ = _write_parquet_fixture(tmp_path)
    import pandas as pd
    calls = []
    real = pd.read_parquet
    monkeypatch.setattr(pd, 'read_parquet',
                        lambda fn, *a, **k: calls.append(fn) or real(fn))
    self._load(path, cache_files=4)
    # 2 evaluation points over the same January file: one decode.
    assert len(calls) == 1

  def test_lru_evicts(self, tmp_path):
    cache = sparse_parquet._FileFrameCache(1, 'timeNominal')
    path, _ = _write_parquet_fixture(tmp_path)
    fn = os.path.join(path, 'year=2020', 'month=1', '2020-01.parquet')
    a = cache.get(fn)
    assert cache.get(fn) is a        # hit
    cache._frames['other'] = a       # fill past capacity
    while len(cache._frames) > cache.max_files:
      cache._frames.popitem(last=False)
    assert fn not in cache._frames   # evicted oldest

  @pytest.mark.parametrize('closed_end', [False, True])
  @pytest.mark.parametrize('point', [False, True])
  def test_sorted_bounds_matches_mask(self, closed_end, point):
    rng = np.random.default_rng(7)
    base = np.datetime64('2020-01-01T00', 'ns')
    times = base + rng.integers(0, 3600, 500) * np.timedelta64(1, 'm')
    # Duplicates + exact boundary hits + NaT rows, in shuffled (file) order.
    times = np.concatenate(
        [times, times[:50], np.full(5, np.datetime64('NaT', 'ns'))])
    rng.shuffle(times)
    start = base + np.timedelta64(600, 'm')
    if point:
      window = sparse_parquet.Window(start)
      times[7] = np.datetime64(start, 'ns')  # guarantee an exact hit
    else:
      window = sparse_parquet.Window(
          start, start + np.timedelta64(90, 'm'), closed_end=closed_end)
    order = np.argsort(times, kind='stable')
    lo, hi = window.sorted_bounds(times[order])
    selected = np.sort(order[lo:hi])
    np.testing.assert_array_equal(selected, np.flatnonzero(
        window.mask(times)))
