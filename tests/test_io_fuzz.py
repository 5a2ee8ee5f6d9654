"""Randomized round-trip fuzz over the self-contained storage stack.

The round-2 advisor findings all sat in zarr/netCDF decode corners
(integer fills, CF-time NaNs, int64 netCDF3 limits), i.e. interactions of
dtype × coords × compressor × chunking that example-based tests pin one
at a time. This fuzzer draws random datasets — mixed dtypes (f32/f64/i32/
i64/bool/datetime coords), NaNs, non-dim coords, ragged chunk splits,
every compressor — writes them through each backend (npz, wbx, zarr,
netCDF3), reads them back, and asserts values/dims/coords survive.

Formats are lossy in DOCUMENTED ways only (netCDF3 widens unsigned and
out-of-int32 int64 to float64, bools to int8); the fuzzer encodes those
contracts so any new silent coercion fails a seed.
"""

import os
import warnings

import numpy as np
import pytest

from weatherbenchx_tpu import io as wio
from weatherbenchx_tpu import netcdf_io
from weatherbenchx_tpu import zarr_io
from weatherbenchx_tpu.darray import Coord, DimArray

DIM_POOL = ('time', 'level', 'latitude', 'longitude')
SIZES = {'time': 5, 'level': 3, 'latitude': 7, 'longitude': 9}


def _rand_dataset(rng):
  n_vars = int(rng.integers(1, 4))
  ds = {}
  for v in range(n_vars):
    dims = tuple(d for d in DIM_POOL if rng.random() < 0.7) or ('latitude',)
    shape = tuple(SIZES[d] for d in dims)
    kind = rng.choice(['f4', 'f8', 'i4', 'i8', 'bool'])
    if kind == 'bool':
      data = rng.random(shape) > 0.5
    elif kind.startswith('i'):
      data = rng.integers(-1000, 1000, shape).astype(np.dtype(kind))
    else:
      data = rng.standard_normal(shape).astype(np.dtype(kind))
      if rng.random() < 0.4:
        flat = data.reshape(-1)
        flat[rng.integers(0, flat.size)] = np.nan
    coords = {}
    for d in dims:
      if d == 'time':
        coords[d] = (np.datetime64('2021-06-01', 'ns')
                     + np.arange(SIZES[d]) * np.timedelta64(12, 'h'))
      elif rng.random() < 0.7:
        coords[d] = np.linspace(-5, 5, SIZES[d])
    if len(dims) >= 2 and rng.random() < 0.3:
      # Name is per-variable: zarr/netCDF store one coord array per name,
      # and the writer correctly rejects same-name/different-dims clashes.
      coords[f'station_name{v}'] = Coord(
          dims[:1], np.array([f's{i}' for i in range(shape[0])]))
    ds[f'var{v}'] = DimArray(data, dims, coords)
  return ds


def _assert_same(got, want, lossy_int64=False):
  assert set(got) == set(want)
  for name, w in want.items():
    g = got[name]
    assert tuple(g.dims) == tuple(w.dims), (name, g.dims, w.dims)
    gv, wv = np.asarray(g.values), np.asarray(w.values)
    if wv.dtype == bool and gv.dtype != bool:
      gv = gv.astype(bool)  # netCDF3 stores bool as int8 (documented)
    if wv.dtype.kind in 'iu' and gv.dtype.kind == 'f':
      assert lossy_int64, (name, wv.dtype, gv.dtype)
      gv = gv.astype(wv.dtype)
    if wv.dtype.kind == 'f':
      np.testing.assert_allclose(gv, wv, rtol=0, atol=0, equal_nan=True,
                                 err_msg=name)
    else:
      np.testing.assert_array_equal(gv, wv, err_msg=name)
    for cname, c in w.coords.items():
      assert g.coords.get(cname) is not None, (name, cname)
      gc = np.asarray(g.coords[cname].values)
      wc = np.asarray(c.values)
      if wc.dtype.kind == 'U' or gc.dtype.kind in 'SU':
        np.testing.assert_array_equal(gc.astype(str), wc.astype(str),
                                      err_msg=f'{name}:{cname}')
      else:
        np.testing.assert_array_equal(gc, wc, err_msg=f'{name}:{cname}')


@pytest.mark.parametrize('seed', range(20))
def test_roundtrip_all_backends(seed, tmp_path):
  rng = np.random.default_rng(8800 + seed)
  ds = _rand_dataset(rng)

  npz = str(tmp_path / 'd.npz')
  wio.save_dataset(npz, ds)
  _assert_same(wio.load_dataset(npz), ds)

  wbx = str(tmp_path / 'd.wbx')
  wio.save_dataset_wbx(wbx, ds)
  _assert_same(wio.load_dataset_wbx(wbx), ds)

  compressor = str(rng.choice(['none', 'zlib', 'blosc']))
  chunk_dim = str(rng.choice(DIM_POOL))
  chunks = {chunk_dim: int(rng.integers(1, SIZES[chunk_dim] + 1))}
  zarr = str(tmp_path / 'd.zarr')
  zarr_io.save_dataset_zarr(
      zarr, ds, chunks=chunks,
      compressor=None if compressor == 'none' else compressor)
  _assert_same(zarr_io.open_dataset_zarr(zarr), ds)

  nc = str(tmp_path / 'd.nc')
  with warnings.catch_warnings():
    warnings.simplefilter('ignore', UserWarning)  # documented widenings
    netcdf_io.save_dataset_netcdf(nc, ds)
  _assert_same(netcdf_io.load_dataset_netcdf(nc), ds, lossy_int64=True)
