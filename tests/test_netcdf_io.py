"""netCDF interop tests: scipy-written v3, h5py-simulated v4, CLI, state.

The v4 fixture reproduces the HDF5 layout netCDF4/xarray produce
(dimension scales + DIMENSION_LIST + CF time attrs), standing in for
reference-written files (``beam_pipeline.py:369-404`` writes metrics and
AggregationState with ``to_netcdf``).
"""

import os

import numpy as np
import pytest

from weatherbenchx_tpu import fileio, io as io_lib, netcdf_io
from weatherbenchx_tpu.darray import Coord, DimArray


def _dataset():
  nlat, nlon, nt = 5, 8, 3
  coords = {
      'init_time': np.array(['2020-01-01', '2020-01-02', '2020-01-03'],
                            dtype='datetime64[ns]'),
      'lead_time': (np.arange(nt) * np.timedelta64(6, 'h')
                    ).astype('timedelta64[ns]'),
      'latitude': np.linspace(-80, 80, nlat),
      'longitude': np.linspace(0, 315, nlon),
  }
  rng = np.random.default_rng(0)
  da = DimArray(
      rng.standard_normal((nt, nt, nlat, nlon)).astype(np.float32),
      ('init_time', 'lead_time', 'latitude', 'longitude'), coords)
  regions = DimArray(
      np.array([1.5, 2.5]), ('region',),
      {'region': np.array(['global', 'tropics']),
       'threshold': Coord((), np.float64(0.5))})
  return {'rmse.z500': da, 'seeps.precip': regions}


class TestNetcdf3RoundTrip:
  def test_round_trip(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'metrics.nc')
    io_lib.save_dataset(path, ds)
    back = io_lib.load_dataset(path)
    assert set(back) == set(ds)
    for k, a in ds.items():
      b = back[k]
      assert b.dims == a.dims
      np.testing.assert_array_equal(np.asarray(b.values),
                                    np.asarray(a.values))
      for cn, c in a.coords.items():
        bc = b.coords[cn]
        assert bc.dims == tuple(c.dims)
        np.testing.assert_array_equal(np.asarray(bc.values),
                                      np.asarray(c.values))

  def test_detected_without_extension(self, tmp_path):
    ds = _dataset()
    nc = str(tmp_path / 'renamed.dat')
    netcdf_io.save_dataset_netcdf(nc, ds)
    back = io_lib.load_dataset(nc)  # magic-sniffed, not extension
    assert set(back) == set(ds)

  def test_cf_structure_for_xarray(self, tmp_path):
    """The raw file carries the CF attrs xarray's decoder needs."""
    from scipy.io import netcdf_file
    path = str(tmp_path / 'cf.nc')
    netcdf_io.save_dataset_netcdf(path, _dataset())
    nc = netcdf_file(path, mode='r', mmap=False)
    try:
      t = nc.variables['init_time']
      assert b'since' in t._attributes['units']
      assert t.data.dtype.str.endswith('f8')  # classic has no int64
      lt = nc.variables['lead_time']
      assert lt._attributes['units'] == b'microseconds'
      # string coord as a char matrix over a strlen dim
      region = nc.variables['region']
      assert region.data.dtype.kind == 'S'
      assert region.dimensions[-1].endswith('_strlen')
      # aux (non-dim) coord referenced via the CF coordinates attr
      assert b'threshold' in nc.variables['seeps.precip']._attributes[
          'coordinates']
    finally:
      nc.close()

  def test_bool_and_int64(self, tmp_path):
    ds = {
        'mask': DimArray(np.array([True, False, True]), ('x',),
                         {'x': np.arange(3, dtype=np.int64)}),
        'big': DimArray(np.array([2**40, -2**40]), ('y',),
                        {'y': np.array([0, 1], dtype=np.int64)}),
    }
    path = str(tmp_path / 'b.nc')
    io_lib.save_dataset(path, ds)
    back = io_lib.load_dataset(path)
    assert back['mask'].values.dtype == bool
    np.testing.assert_array_equal(back['mask'].values, [True, False, True])
    np.testing.assert_array_equal(back['big'].values, [2**40, -2**40])
    assert back['mask'].coords['x'].values.dtype.kind == 'i'

  def test_atomic_write_and_remote(self, tmp_path):
    ds = _dataset()
    local = str(tmp_path / 'a.nc')
    fileio.save_dataset_atomic(local, ds)
    assert not [f for f in os.listdir(tmp_path) if '.tmp.' in f]
    remote = 'memory://nc_test/b.nc'
    fileio.save_dataset_atomic(remote, ds)
    back = fileio.load_dataset_any(remote)
    np.testing.assert_array_equal(
        np.asarray(back['rmse.z500'].values),
        np.asarray(ds['rmse.z500'].values))


def _write_netcdf4_style(path):
  """An HDF5 file laid out the way netCDF4/xarray write it."""
  h5py = pytest.importorskip('h5py')
  t = np.array([0., 6., 12.])  # hours since 2020-01-01
  vals = np.arange(12, dtype=np.float32).reshape(3, 4)
  with h5py.File(path, 'w') as f:
    time = f.create_dataset('time', data=t)
    time.attrs['CLASS'] = np.bytes_('DIMENSION_SCALE')
    time.attrs['NAME'] = np.bytes_('time')
    time.attrs['units'] = np.bytes_('hours since 2020-01-01')
    time.attrs['calendar'] = np.bytes_('proleptic_gregorian')
    # a bare dimension with no coordinate variable
    st = f.create_dataset('station', data=np.zeros(4))
    st.attrs['CLASS'] = np.bytes_('DIMENSION_SCALE')
    st.attrs['NAME'] = np.bytes_(
        'This is a netCDF dimension but not a netCDF variable.')
    v = f.create_dataset('t2m', data=vals, fillvalue=-9999.0)
    v.attrs['_FillValue'] = np.float32(-9999.0)
    v.dims[0].attach_scale(time)
    v.dims[1].attach_scale(st)
  return t, vals


class TestNetcdf4Read:
  def test_h5_dimension_scales_and_cf_time(self, tmp_path):
    path = str(tmp_path / 'ref.nc')
    t, vals = _write_netcdf4_style(path)
    ds = io_lib.load_dataset(path)
    assert set(ds) == {'t2m'}
    da = ds['t2m']
    assert da.dims == ('time', 'station')
    np.testing.assert_array_equal(np.asarray(da.values), vals)
    times = np.asarray(da.coords['time'].values)
    assert times.dtype.kind == 'M'
    np.testing.assert_array_equal(
        times,
        np.datetime64('2020-01-01', 'ns') + (t * 3600e9).astype(
            'timedelta64[ns]'))

  def test_fill_value_to_nan(self, tmp_path):
    h5py = pytest.importorskip('h5py')
    path = str(tmp_path / 'fill.nc')
    with h5py.File(path, 'w') as f:
      v = f.create_dataset('x', data=np.array([1.0, -9999.0, 3.0]))
      v.attrs['_FillValue'] = np.float64(-9999.0)
    ds = io_lib.load_dataset(path)
    out = np.asarray(ds['x'].values)
    assert np.isnan(out[1]) and out[0] == 1.0 and out[2] == 3.0


class TestAggregationStateNetcdf:
  def test_state_round_trip(self):
    """AggregationState → .nc → AggregationState reproduces metrics,
    mirroring the reference's save/load-for-inference flow
    (``aggregation.py:227-258`` + ``WriteAggregationState``)."""
    import tempfile

    from weatherbenchx_tpu import aggregation, test_utils, weighting
    from weatherbenchx_tpu.metrics import base as mbase, deterministic

    preds, tgts = test_utils.canonical_forecast_pair(
        n_init=2, n_lead=2, spatial_resolution_in_degrees=30.0, seed=1)
    metrics = {'rmse': deterministic.RMSE()}
    agg = aggregation.Aggregator(
        reduce_dims=['init_time', 'latitude', 'longitude'],
        weigh_by=[weighting.GridAreaWeighting()])
    stats = mbase.compute_unique_statistics_for_all_metrics(
        metrics, preds, tgts)
    state = agg.aggregate_statistics(stats)
    expected = state.metric_values(metrics)
    with tempfile.TemporaryDirectory() as d:
      path = os.path.join(d, 'state.nc')
      io_lib.save_dataset(path, state.to_dataset())
      restored = aggregation.AggregationState.from_dataset(
          io_lib.load_dataset(path))
    got = restored.metric_values(metrics)
    for k in expected:
      np.testing.assert_allclose(np.asarray(got[k].values),
                                 np.asarray(expected[k].values), rtol=1e-6)


def test_benchmark_cli_nc_output(tmp_path):
  from tests.test_apps import _write_source_files
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
      '--init_time_chunk_size', '4', '--lead_time_chunk_size', '4',
      '--output_dir', outdir, '--output_format', 'nc',
      '--prediction_path', ppath, '--target_path', tpath,
      '--climatology_path', cpath,
  ])
  out = os.path.join(outdir, 'hres_vs_era5_64x32_2020-init12h.nc')
  results = io_lib.load_dataset(out)
  da = results['rmse.2m_temperature']
  assert da.sizes['region'] == 34
  assert np.isfinite(np.asarray(da.sel(region='global').values)).all()


def test_loader_reads_netcdf_source(tmp_path):
  """PredictionsFromDataset/TargetsFromDataset accept a .nc path via the
  self-contained reader (no xarray needed)."""
  from weatherbenchx_tpu import time_chunks as tc
  from weatherbenchx_tpu.data import loaders

  rng = np.random.default_rng(0)
  lats, lons = np.linspace(-60, 60, 4), np.linspace(0, 270, 4)
  valid = (np.datetime64('2020-01-01', 'ns')
           + np.arange(6) * np.timedelta64(12, 'h'))
  init = valid[:4]
  lead = (np.arange(2) * np.timedelta64(12, 'h')).astype('timedelta64[ns]')
  tgt = {'2m_temperature': DimArray(
      rng.standard_normal((6, 4, 4)).astype(np.float32),
      ('time', 'latitude', 'longitude'),
      {'time': valid, 'latitude': lats, 'longitude': lons})}
  pred = {'2m_temperature': DimArray(
      rng.standard_normal((4, 2, 4, 4)).astype(np.float32),
      ('time', 'prediction_timedelta', 'latitude', 'longitude'),
      {'time': init, 'prediction_timedelta': lead,
       'latitude': lats, 'longitude': lons})}
  ppath, tpath = str(tmp_path / 'p.nc'), str(tmp_path / 't.nc')
  io_lib.save_dataset(ppath, pred)
  io_lib.save_dataset(tpath, tgt)

  ploader = loaders.PredictionsFromDataset(
      path=ppath, variables=['2m_temperature'])
  tloader = loaders.TargetsFromDataset(
      path=tpath, variables=['2m_temperature'])
  chunk_init, chunk_lead = next(iter(tc.TimeChunks(init, lead)))
  t_chunk = tloader.load_chunk(chunk_init, chunk_lead)
  p_chunk = ploader.load_chunk(chunk_init, chunk_lead, reference=t_chunk)
  da = p_chunk['2m_temperature']
  assert da.sizes['init_time'] == 4 and da.sizes['lead_time'] == 2
  np.testing.assert_allclose(
      np.asarray(da.values),
      np.asarray(pred['2m_temperature'].values), rtol=1e-6)


def test_writer_guards(tmp_path):
  """Ambiguous datasets fail loudly instead of writing corrupt files."""
  with pytest.raises(ValueError, match='zero-length'):
    netcdf_io.save_dataset_netcdf(
        str(tmp_path / 'z.nc'),
        {'x': DimArray(np.zeros((0, 0)), ('a', 'b'))})
  with pytest.raises(ValueError, match='used twice'):
    netcdf_io.save_dataset_netcdf(
        str(tmp_path / 'c.nc'),
        {'a': DimArray(np.arange(4.), ('b',), {'b': np.arange(4)}),
         'c': DimArray(np.arange(2.), ('a',), {'a': np.arange(2)})})


def test_reference_written_state_loads(tmp_path):
  """A netCDF4/HDF5 AggregationState laid out exactly as the reference
  writes it ('<stat>#<var>#sum_weighted_statistics' keys,
  ``aggregation.py:227-258`` + ``WriteAggregationState``) restores and
  finalizes here."""
  h5py = pytest.importorskip('h5py')

  from weatherbenchx_tpu import aggregation
  from weatherbenchx_tpu.metrics import deterministic

  path = str(tmp_path / 'state.nc')
  lead_hours = np.array([6.0, 12.0])
  sum_ws = np.array([8.0, 18.0])   # per-lead Σ w·(squared error)
  sum_w = np.array([2.0, 2.0])     # per-lead Σ w  → RMSE [2, 3]
  with h5py.File(path, 'w') as f:
    lt = f.create_dataset('lead_time', data=lead_hours)
    lt.attrs['CLASS'] = np.bytes_('DIMENSION_SCALE')
    lt.attrs['NAME'] = np.bytes_('lead_time')
    lt.attrs['units'] = np.bytes_('hours')
    for key, vals in [
        ('SquaredError#2m_temperature#sum_weighted_statistics', sum_ws),
        ('SquaredError#2m_temperature#sum_weights', sum_w)]:
      d = f.create_dataset(key, data=vals)
      d.dims[0].attach_scale(lt)

  ds = io_lib.load_dataset(path)
  state = aggregation.AggregationState.from_dataset(ds)
  values = state.metric_values({'rmse': deterministic.RMSE()})
  da = values['rmse.2m_temperature']
  assert da.dims == ('lead_time',)
  np.testing.assert_allclose(np.asarray(da.values), [2.0, 3.0])
  np.testing.assert_array_equal(
      np.asarray(da.coords['lead_time'].values),
      (lead_hours * 3600e9).astype('timedelta64[ns]'))


class TestCfDecodeEdgeCases:
  def test_packed_fill_masks_before_unpack(self):
    """CF order: fill sentinels identified in packed ints, THEN scaled —
    scaling first turns -32767 into a plausible-looking value."""
    raw = np.array([10, -32767, 20], dtype=np.int16)
    out, _ = netcdf_io._decode_var(
        't', raw, ('x',),
        {'_FillValue': np.int16(-32767), 'scale_factor': 0.5,
         'add_offset': 100.0})
    assert np.isnan(out[1])
    np.testing.assert_array_equal(out[[0, 2]], [105.0, 110.0])

  def test_microsecond_times_round_trip_exactly(self, tmp_path):
    t = np.array(['2020-01-01T00:00:00.000001', '2020-06-01T12:34:56.789',
                  'NaT'], dtype='datetime64[ns]')
    ds = {'v': DimArray(np.zeros(3, np.float32), ('time',), {'time': t})}
    path = str(tmp_path / 'us.nc')
    netcdf_io.save_dataset_netcdf(path, ds)
    back = np.asarray(
        netcdf_io.load_dataset_netcdf(path)['v'].coords['time'].values)
    assert np.isnat(back[2])
    np.testing.assert_array_equal(back[:2], t[:2])

  def test_integer_fill_without_scale_promotes_to_nan(self):
    """Unpacked int data with a fill sentinel must not keep e.g. -9999 as a
    real value: promote to float64 + NaN like xarray's mask_and_scale."""
    raw = np.array([10, -9999, 20], dtype=np.int32)
    out, _ = netcdf_io._decode_var('t', raw, ('x',),
                                   {'_FillValue': np.int32(-9999)})
    assert out.dtype == np.float64
    assert np.isnan(out[1])
    np.testing.assert_array_equal(out[[0, 2]], [10.0, 20.0])

  def test_int_time_with_fill_decodes_to_nat(self):
    raw = np.array([0, -9999, 86400], dtype=np.int32)
    out, _ = netcdf_io._decode_var(
        'time', raw, ('time',),
        {'_FillValue': np.int32(-9999), 'units': 'seconds since 2020-01-01'})
    assert out.dtype.kind == 'M'
    assert np.isnat(out[1])
    assert out[2] == np.datetime64('2020-01-02', 'ns')

  def test_int64_beyond_2_53_raises(self, tmp_path):
    ds = {'big': DimArray(np.array([2**53 + 1, 0], np.int64), ('x',))}
    with pytest.raises(ValueError, match='2\\^53'):
      netcdf_io.save_dataset_netcdf(str(tmp_path / 'big.nc'), ds)

  def test_int64_beyond_int32_warns_of_float64(self, tmp_path):
    ds = {'big': DimArray(np.array([2**40, -2**40], np.int64), ('x',))}
    with pytest.warns(UserWarning, match='float64'):
      netcdf_io.save_dataset_netcdf(str(tmp_path / 'w.nc'), ds)

  def test_unsigned_int_round_trip(self, tmp_path):
    ds = {'u8': DimArray(np.array([0, 250], np.uint8), ('x',)),
          'u16': DimArray(np.array([0, 65000], np.uint16), ('y',)),
          'u32': DimArray(np.array([1, 2**31 + 7], np.uint32), ('z',))}
    path = str(tmp_path / 'u.nc')
    netcdf_io.save_dataset_netcdf(path, ds)
    back = netcdf_io.load_dataset_netcdf(path)
    for k, v in ds.items():
      np.testing.assert_array_equal(np.asarray(back[k].values), v.values)


def test_xarray_scipy_backend_conventions(tmp_path):
  """A netCDF3 file written the way xarray's scipy backend encodes things
  (int 'days since' times, char arrays over a 'stringN' dim, int8 bools
  with a dtype attr) decodes to the expected DimArrays."""
  from scipy.io import netcdf_file

  path = str(tmp_path / 'xr_style.nc')
  nc = netcdf_file(path, mode='w', version=2)
  nc.createDimension('time', 3)
  nc.createDimension('station', 2)
  nc.createDimension('string5', 5)
  t = nc.createVariable('time', np.int32, ('time',))
  t[:] = np.array([0, 1, 2], np.int32)
  t.units = 'days since 2020-01-01'
  t.calendar = 'proleptic_gregorian'
  names = nc.createVariable('station', 'S1', ('station', 'string5'))
  names[:] = np.array([[b'K', b'J', b'F', b'K', b''],
                       [b'K', b'L', b'A', b'X', b'']])
  ok = nc.createVariable('qc_pass', np.int8, ('time', 'station'))
  ok[:] = np.array([[1, 0], [0, 1], [1, 1]], np.int8)
  ok.dtype = 'bool'
  nc.close()

  from weatherbenchx_tpu import io as io_mod
  ds = io_mod.load_dataset(path)
  da = ds['qc_pass']
  assert da.values.dtype == bool
  np.testing.assert_array_equal(
      np.asarray(da.coords['time'].values),
      np.array(['2020-01-01', '2020-01-02', '2020-01-03'],
               dtype='datetime64[ns]'))
  np.testing.assert_array_equal(
      np.asarray(da.coords['station'].values), ['KJFK', 'KLAX'])


def test_netcdf_shared_coord_with_nat_saves(tmp_path):
  """Same NaT-tolerant coordinate-consistency contract as the zarr writer
  (shared helper in cf.py)."""
  times = np.array(['2020-01-01', 'NaT'], dtype='datetime64[ns]')
  mk = lambda seed: DimArray(
      np.random.default_rng(seed).standard_normal(2).astype(np.float32),
      ('valid_time',), {'valid_time': Coord(('valid_time',), times.copy())})
  path = str(tmp_path / 'nat.nc')
  netcdf_io.save_dataset_netcdf(path, {'a': mk(1), 'b': mk(2)})
  ds = netcdf_io.load_dataset_netcdf(path)
  assert set(ds) == {'a', 'b'}
