"""Minimal xarray.testing shim."""

import numpy as np


def _pairs(a, b):
  from . import DataArray, Dataset  # pylint: disable=g-import-not-at-top
  if isinstance(a, Dataset) and isinstance(b, Dataset):
    assert set(a.keys()) == set(b.keys()), (set(a.keys()), set(b.keys()))
    return [(a[k], b[k]) for k in a.keys()]
  return [(a, b)]


def _aligned_values(x, y, check_dim_order):
  """Returns comparable value arrays, honoring ``check_dim_order``.

  With check_dim_order=True (xarray's default) a dim-order mismatch is a
  FAILURE — silently transposing here would let the shim manufacture a
  pass that real xarray would reject (ADVICE r4). Only when the caller
  explicitly passes check_dim_order=False do we align by transpose.
  """
  if set(y.dims) == set(x.dims) and y.dims != x.dims:
    if check_dim_order:
      raise AssertionError(
          f'dim order mismatch: {x.dims} != {y.dims} '
          '(pass check_dim_order=False to compare order-insensitively)')
    return x.values, y.transpose(*x.dims).values
  return x.values, y.values


def assert_allclose(a, b, rtol=1e-05, atol=1e-08, check_dim_order=True):
  for x, y in _pairs(a, b):
    xv, yv = _aligned_values(x, y, check_dim_order)
    np.testing.assert_allclose(xv, yv, rtol=rtol, atol=atol)


def assert_equal(a, b, check_dim_order=True):
  for x, y in _pairs(a, b):
    xv, yv = _aligned_values(x, y, check_dim_order)
    if xv.dtype.kind in 'fc' and np.asarray(yv).dtype.kind in 'fc':
      np.testing.assert_allclose(xv, yv, rtol=0, atol=0)
    else:
      np.testing.assert_array_equal(xv, yv)


def assert_identical(a, b):
  assert_equal(a, b)
