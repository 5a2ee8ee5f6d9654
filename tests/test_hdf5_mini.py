"""Pure-Python HDF5 reader vs REAL libhdf5-written bytes.

Every fixture here is written by h5py (bundled libhdf5), so the fallback
reader (:mod:`weatherbenchx_tpu.hdf5_mini`) is validated against
authentic external bytes, not its own writer. The netCDF4 fallback path
(``netcdf_io._load_netcdf4_fallback``) must agree with the h5py path on
identical files (VERDICT r3 missing #4 / item 6).
"""

import io

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from weatherbenchx_tpu import hdf5_mini, netcdf_io


def _write(build, **file_kw):
  bio = io.BytesIO()
  with h5py.File(bio, 'w', **file_kw) as f:
    build(f)
  return bio.getvalue()


class TestRawReader:
  @pytest.mark.parametrize('file_kw', [{}, {'libver': 'latest'}])
  @pytest.mark.parametrize('dset_kw', [
      {},
      {'chunks': (4, 5)},
      {'chunks': (4, 5), 'compression': 'gzip'},
      {'chunks': (4, 5), 'compression': 'gzip', 'shuffle': True},
      {'chunks': (4, 5), 'fletcher32': True},
      {'chunks': (4, 5), 'compression': 'gzip', 'shuffle': True,
       'fletcher32': True},
  ])
  def test_float_array_layouts(self, file_kw, dset_kw):
    arr = np.random.default_rng(0).standard_normal((13, 17)).astype(
        np.float32)
    data = _write(lambda f: f.create_dataset('x', data=arr, **dset_kw),
                  **file_kw)
    ds = hdf5_mini.read_flat(data)
    np.testing.assert_array_equal(ds['x'].data, arr)

  def test_dtypes_and_scalars(self):
    def build(f):
      f.create_dataset('scalar', data=3.5)
      f.create_dataset('i64', data=np.arange(6, dtype=np.int64))
      f.create_dataset('u8', data=np.arange(4, dtype=np.uint8))
      f.create_dataset('be', data=np.arange(6, dtype='>i4'))
      f.create_dataset('bef', data=np.linspace(0, 1, 5).astype('>f8'))
      f.create_dataset('fixed_str',
                       data=np.array([b'abc', b'de'], dtype='S3'))
      f.create_dataset('vlen_str',
                       data=np.array(['hello', 'wx'], dtype=object),
                       dtype=h5py.string_dtype())
    ds = hdf5_mini.read_flat(_write(build))
    assert ds['scalar'].data == 3.5
    assert ds['i64'].data.tolist() == [0, 1, 2, 3, 4, 5]
    assert ds['u8'].data.dtype == np.uint8
    assert ds['be'].data.tolist() == [0, 1, 2, 3, 4, 5]
    assert ds['be'].data.dtype.byteorder in ('=', '<')
    np.testing.assert_allclose(ds['bef'].data, np.linspace(0, 1, 5))
    assert ds['fixed_str'].data.tolist() == [b'abc', b'de']
    assert ds['vlen_str'].data.tolist() == ['hello', 'wx']

  def test_dimension_scales_and_attrs(self):
    def build(f):
      lat = f.create_dataset('latitude', data=np.linspace(-90, 90, 7))
      lon = f.create_dataset(
          'longitude',
          data=np.linspace(0, 360, 8, endpoint=False).astype(np.float32))
      t = f.create_dataset(
          't2m', data=np.arange(56.0).reshape(7, 8).astype(np.float32))
      lat.make_scale('latitude')
      lon.make_scale('longitude')
      t.dims[0].attach_scale(lat)
      t.dims[1].attach_scale(lon)
      t.attrs['units'] = 'K'
      t.attrs['add_offset'] = 2.5
      t.attrs['valid_range'] = np.array([0.0, 400.0])
    ds = hdf5_mini.read_flat(_write(build))
    assert ds['t2m'].attrs['DIMENSION_LIST'] == [['latitude'],
                                                 ['longitude']]
    assert ds['latitude'].attrs['CLASS'] == b'DIMENSION_SCALE'
    assert ds['t2m'].attrs['units'] == 'K'
    assert ds['t2m'].attrs['add_offset'] == 2.5
    np.testing.assert_array_equal(ds['t2m'].attrs['valid_range'],
                                  [0.0, 400.0])

  def test_many_datasets_btree_groups(self):
    # Enough links to force real group B-tree/symbol-node traversal.
    arrays = {f'var_{i:03d}': np.full(3, float(i), np.float32)
              for i in range(60)}

    def build(f):
      for k, v in arrays.items():
        f.create_dataset(k, data=v)
    ds = hdf5_mini.read_flat(_write(build))
    assert set(ds) == set(arrays)
    for k, v in arrays.items():
      np.testing.assert_array_equal(ds[k].data, v)

  def test_not_hdf5_raises(self):
    with pytest.raises(hdf5_mini.Hdf5FormatError, match='not an HDF5'):
      hdf5_mini.read_flat(b'CDF\x01 definitely netcdf3' + b'\x00' * 64)


def _netcdf4_flavored_bytes():
  """An AggregationState-shaped netCDF4 file as the reference tooling
  writes it (xarray/netCDF4 layout: dimension scales, '#'-pathed vars,
  CF time encoding)."""
  rng = np.random.default_rng(3)
  n_lead = 4
  leads = np.arange(n_lead) * 6 * 3600 * 10**9

  def build(f):
    lead = f.create_dataset('lead_time', data=leads.astype(np.int64))
    lead.attrs['units'] = 'nanoseconds'
    lead.make_scale('lead_time')
    for name in ('SquaredError#2m_temperature#sum_weighted_statistics',
                 'SquaredError#2m_temperature#sum_weights'):
      v = f.create_dataset(name, data=rng.random(n_lead).astype(
          np.float64), chunks=(2,), compression='gzip')
      v.dims[0].attach_scale(lead)
  return _write(build)


class TestNetcdf4Fallback:
  def test_fallback_matches_h5py_path(self):
    data = _netcdf4_flavored_bytes()
    via_h5py = netcdf_io._load_netcdf4(io.BytesIO(data))
    via_fallback = netcdf_io._load_netcdf4_fallback(io.BytesIO(data))
    assert set(via_h5py) == set(via_fallback)
    for k in via_h5py:
      a, b = via_h5py[k], via_fallback[k]
      assert a.dims == b.dims
      np.testing.assert_array_equal(np.asarray(a.values),
                                    np.asarray(b.values))
      assert set(a.coords) == set(b.coords)
      for c in a.coords:
        np.testing.assert_array_equal(
            np.asarray(a.coords[c].values), np.asarray(b.coords[c].values))

  def test_forced_fallback_env(self, monkeypatch):
    monkeypatch.setenv('WBX_NO_H5PY', '1')
    data = _netcdf4_flavored_bytes()
    ds = netcdf_io._load_netcdf4(io.BytesIO(data))
    key = 'SquaredError#2m_temperature#sum_weighted_statistics'
    assert key in ds
    da = ds[key]
    assert da.dims == ('lead_time',)
    # CF nanoseconds decode to timedelta64 on the coord
    lt = np.asarray(da.coords['lead_time'].values)
    assert lt.dtype.kind == 'm'
    assert lt[1] - lt[0] == np.timedelta64(6, 'h')

  def test_aggregation_state_roundtrip_via_fallback(self, monkeypatch):
    """A '#'-schema state written as netCDF4 loads into AggregationState
    through the fallback reader."""
    from weatherbenchx_tpu import aggregation

    monkeypatch.setenv('WBX_NO_H5PY', '1')
    ds = netcdf_io._load_netcdf4(io.BytesIO(_netcdf4_flavored_bytes()))
    state = aggregation.AggregationState.from_dataset(ds)
    stats = state.mean_statistics()
    assert 'SquaredError' in stats
    assert '2m_temperature' in stats['SquaredError']
    assert stats['SquaredError']['2m_temperature'].dims == ('lead_time',)
