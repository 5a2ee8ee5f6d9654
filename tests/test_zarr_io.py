"""Self-contained Zarr v2 store tests: round-trip, lazy windows, layout.

The store layout must match what xarray+zarr produce/consume (reference
input stores and the unaggregated pipeline's output,
``beam_pipeline.py:610-681``): v2 metadata, ``_ARRAY_DIMENSIONS``, CF time
encoding, full-extent edge chunks, consolidated metadata.
"""

import json
import os

import numpy as np
import pytest

from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu import lazy, zarr_io
from weatherbenchx_tpu.darray import Coord, DimArray


def _dataset(n_time=10, n_lat=7, n_lon=8, seed=0):
  rng = np.random.default_rng(seed)
  t = (np.datetime64('2020-01-01', 'ns')
       + np.arange(n_time) * np.timedelta64(6, 'h'))
  lead = (np.arange(3) * np.timedelta64(12, 'h')).astype('timedelta64[ns]')
  coords = {'valid_time': t,
            'latitude': np.linspace(-90, 90, n_lat),
            'longitude': np.linspace(0, 360, n_lon, endpoint=False)}
  da = DimArray(rng.standard_normal((n_time, n_lat, n_lon)).astype(np.float32),
                ('valid_time', 'latitude', 'longitude'), coords)
  aux = da.assign_coords(step=Coord(('valid_time',), lead.repeat(4)[:n_time]))
  return {'t2m': aux, 'z500': da.copy(data=(da.values * 2).astype(np.float32))}


class TestZarrRoundTrip:
  @pytest.mark.parametrize('compressor', [None, 'zlib'])
  def test_roundtrip(self, tmp_path, compressor):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4},
                              compressor=compressor)
    back = zarr_io.open_dataset_zarr(path)
    assert set(back) == set(ds)
    for k, da in ds.items():
      got = back[k]
      assert got.dims == da.dims
      np.testing.assert_array_equal(np.asarray(got.data), da.values)
      for cname, c in da.coords.items():
        np.testing.assert_array_equal(
            np.asarray(got.coords[cname].values), np.asarray(c.values))
        assert got.coords[cname].values.dtype == np.asarray(c.values).dtype

  def test_lazy_window_reads_only_needed_chunks(self, tmp_path, monkeypatch):
    ds = _dataset(n_time=16)
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 2})
    opened = zarr_io.open_dataset_zarr(path)
    loads = []
    orig = zarr_io.ZarrChunkSource._load_cell
    monkeypatch.setattr(
        zarr_io.ZarrChunkSource, '_load_cell',
        lambda self, cell: loads.append(cell) or orig(self, cell))
    win = opened['t2m'].isel(valid_time=np.array([4, 5]))
    np.testing.assert_array_equal(
        np.asarray(win.data), ds['t2m'].values[[4, 5]])
    assert set(loads) == {(2, 0, 0)}  # times 4,5 live in time-chunk 2 only

  def test_store_layout_is_zarr_v2(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4})
    with open(os.path.join(path, '.zgroup')) as f:
      assert json.load(f) == {'zarr_format': 2}
    with open(os.path.join(path, 't2m', '.zarray')) as f:
      zarray = json.load(f)
    assert zarray['chunks'] == [4, 7, 8]
    assert zarray['fill_value'] == 'NaN'
    with open(os.path.join(path, 't2m', '.zattrs')) as f:
      attrs = json.load(f)
    assert attrs['_ARRAY_DIMENSIONS'] == ['valid_time', 'latitude',
                                          'longitude']
    assert 'step' in attrs['coordinates'].split()
    # CF-encoded time coordinate.
    with open(os.path.join(path, 'valid_time', '.zattrs')) as f:
      tattrs = json.load(f)
    assert 'since' in tattrs['units']
    # Edge chunk stored at full extent: 10 times / chunk 4 -> 3 chunks.
    assert os.path.getsize(os.path.join(path, 't2m', '2.0.0')) == 4 * 7 * 8 * 4
    assert os.path.exists(os.path.join(path, '.zmetadata'))

  def test_loader_reads_zarr_store(self, tmp_path):
    from weatherbenchx_tpu.data import loaders
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    zarr_io.save_dataset_zarr(path, ds, chunks={'valid_time': 4})
    loader = loaders.TargetsFromDataset(path=path, rename_dimensions=None)
    t = ds['t2m'].coord_values('valid_time')
    chunk = loader.load_chunk(
        t[:2], np.array([12], 'timedelta64[h]').astype('timedelta64[ns]'))
    np.testing.assert_array_equal(
        chunk['t2m'].isel(init_time=0, lead_time=0).values,
        ds['t2m'].sel(valid_time=t[0] + np.timedelta64(12, 'h')).values)

  def test_io_dispatch(self, tmp_path):
    ds = _dataset()
    path = str(tmp_path / 'store.zarr')
    io_lib.save_dataset(path, ds)
    back = io_lib.load_dataset(path)
    np.testing.assert_array_equal(
        np.asarray(back['z500'].values), ds['z500'].values)
    opened = io_lib.open_dataset(path)
    assert lazy.is_lazy(opened['z500'].data)

  def test_mismatched_shared_coord_raises(self, tmp_path):
    ds = _dataset()
    bad = dict(ds)
    bad['z500'] = ds['z500'].assign_coords(
        latitude=Coord(('latitude',), np.linspace(-80, 80, 7)))
    with pytest.raises(ValueError, match='latitude'):
      zarr_io.save_dataset_zarr(str(tmp_path / 'b.zarr'), bad)

  def test_scalar_and_string_arrays(self, tmp_path):
    ds = {'names': DimArray(
        np.array(['alpha', 'be'], dtype='<U5'), ('station',),
        {'station': np.arange(2), 'one': Coord((), np.float64(3.5))})}
    path = str(tmp_path / 's.zarr')
    zarr_io.save_dataset_zarr(path, ds)
    back = zarr_io.open_dataset_zarr(path)
    np.testing.assert_array_equal(
        np.asarray(back['names'].data), ds['names'].values)
    assert np.asarray(back['names'].coords['one'].values).item() == 3.5

  def test_fortran_order_store_rejected(self, tmp_path):
    """order='F' chunks would decode scrambled; the reader must refuse."""
    import json
    path = tmp_path / 'f.zarr'
    zarr_io.save_dataset_zarr(str(path), _dataset())
    zarray_path = path / 'z500' / '.zarray'
    meta = json.loads(zarray_path.read_text())
    meta['order'] = 'F'
    zarray_path.write_text(json.dumps(meta))
    (path / '.zmetadata').unlink()  # force per-array metadata reads
    with pytest.raises(ValueError, match='order'):
      ds = zarr_io.open_dataset_zarr(str(path))
      np.asarray(ds['z500'].data)


def test_float_cf_time_nan_decodes_to_nat():
  """NaN in float 'units since' time coords (xarray's NaT encoding) must
  decode to NaT, not fall through floor(NaN).astype(int64)."""
  from weatherbenchx_tpu.zarr_io import _decode_cf_time
  import warnings as _warnings
  for unit in ('nanoseconds', 'days'):
    vals = np.array([0.0, np.nan, 1.5])
    with _warnings.catch_warnings():
      _warnings.simplefilter('error')  # the raw NaN cast emits RuntimeWarning
      out = _decode_cf_time(vals, {'units': f'{unit} since 2020-01-01'})
    assert out.dtype.kind == 'M'
    assert out[0] == np.datetime64('2020-01-01', 'ns')
    assert np.isnat(out[1])


def test_shared_coord_with_nat_saves(tmp_path):
  """NaT == NaT for the coordinate-consistency check: a shared time coord
  with missing entries must not spuriously fail the save (cf.py)."""
  times = np.array(['2020-01-01', 'NaT', '2020-01-03'],
                   dtype='datetime64[ns]')
  mk = lambda seed: DimArray(
      np.random.default_rng(seed).standard_normal(3).astype(np.float32),
      ('valid_time',), {'valid_time': Coord(('valid_time',), times.copy())})
  root = str(tmp_path / 'nat.zarr')
  zarr_io.save_dataset_zarr(root, {'a': mk(1), 'b': mk(2)})
  ds = zarr_io.open_dataset_zarr(root)
  got = np.asarray(ds['a'].coords['valid_time'].values)
  assert np.isnat(got[1])
  np.testing.assert_array_equal(got.view('i8'), times.view('i8'))


def test_cf_time_int_overflow_raises():
  """Coarse-unit int CF times past the datetime64[ns] range must raise,
  not wrap into wrong-era timestamps."""
  from weatherbenchx_tpu.zarr_io import _decode_cf_time
  # ~year 2262 boundary: 9.3e9 seconds overflows int64 ns.
  vals = np.array([0, 10_000_000_000], dtype=np.int64)
  with pytest.raises(OverflowError):
    _decode_cf_time(vals, {'units': 'seconds since 1970-01-01'})
  # In-range values still decode exactly.
  ok = _decode_cf_time(np.array([0, 86400], dtype=np.int64),
                       {'units': 'seconds since 1970-01-01'})
  np.testing.assert_array_equal(
      ok, np.array(['1970-01-01', '1970-01-02'], dtype='datetime64[ns]'))
  # min-int64 is the NaT sentinel and passes through.
  nat = _decode_cf_time(np.array([np.iinfo(np.int64).min], dtype=np.int64),
                        {'units': 'days since 1970-01-01'})
  assert np.isnat(nat[0])
