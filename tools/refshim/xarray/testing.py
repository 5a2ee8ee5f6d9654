"""Minimal xarray.testing shim."""

import numpy as np


def _pairs(a, b):
  from . import DataArray, Dataset  # pylint: disable=g-import-not-at-top
  if isinstance(a, Dataset) and isinstance(b, Dataset):
    assert set(a.keys()) == set(b.keys()), (set(a.keys()), set(b.keys()))
    return [(a[k], b[k]) for k in a.keys()]
  return [(a, b)]


def assert_allclose(a, b, rtol=1e-05, atol=1e-08):
  for x, y in _pairs(a, b):
    yv = y.transpose(*x.dims).values if set(y.dims) == set(x.dims) and \
        y.dims != x.dims else y.values
    np.testing.assert_allclose(x.values, yv, rtol=rtol, atol=atol)


def assert_equal(a, b):
  assert_allclose(a, b, rtol=0, atol=0)


def assert_identical(a, b):
  assert_allclose(a, b, rtol=0, atol=0)
