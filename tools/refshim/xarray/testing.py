"""Minimal xarray.testing shim."""

import numpy as np


def _pairs(a, b):
  from . import DataArray, Dataset  # pylint: disable=g-import-not-at-top
  if isinstance(a, Dataset) and isinstance(b, Dataset):
    assert set(a.keys()) == set(b.keys()), (set(a.keys()), set(b.keys()))
    return [(a[k], b[k]) for k in a.keys()]
  return [(a, b)]


def _aligned_values(x, y):
  yv = y.transpose(*x.dims).values if set(y.dims) == set(x.dims) and \
      y.dims != x.dims else y.values
  return x.values, yv


def assert_allclose(a, b, rtol=1e-05, atol=1e-08, check_dim_order=True):
  del check_dim_order  # values are compared dim-order-insensitively anyway
  for x, y in _pairs(a, b):
    xv, yv = _aligned_values(x, y)
    np.testing.assert_allclose(xv, yv, rtol=rtol, atol=atol)


def assert_equal(a, b, check_dim_order=True):
  del check_dim_order
  for x, y in _pairs(a, b):
    xv, yv = _aligned_values(x, y)
    if xv.dtype.kind in 'fc' and np.asarray(yv).dtype.kind in 'fc':
      np.testing.assert_allclose(xv, yv, rtol=0, atol=0)
    else:
      np.testing.assert_array_equal(xv, yv)


def assert_identical(a, b):
  assert_equal(a, b)
