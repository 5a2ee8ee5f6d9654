"""Randomized op-chain equivalence: DimArray vs xarray semantics.

``darray.DimArray`` is the architectural keystone — every statistic,
aggregation, and loader flows through it — and its contract is "xarray's
named-axis semantics, jit-compatible". The example-based tests in
``test_darray.py`` pin each op once; this fuzzer applies seeded random
CHAINS of ops (broadcast arithmetic, reductions, where, isel/sel,
transpose, expand/concat) simultaneously to a DimArray and to the
reference-grade xarray shim (``tools/refshim`` — the same implementation
that runs the actual upstream code in ``test_reference_parity.py``),
comparing values, dims, and coords after every step. Chains catch
interaction bugs (e.g. a transpose followed by broadcast-add followed by
a reduction over a now-moved dim) that single-op tests can't.
"""

import os
import sys

import numpy as np
import pytest

from weatherbenchx_tpu.darray import DimArray

_SHIM_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'tools', 'refshim')
_SHIM_CACHE = []


def _shim():
  """Import the refshim xarray WITHOUT leaving it in sys.modules/sys.path.

  Leaving the shim registered as ``xarray`` breaks later test files that
  gate behavior on whether the real xarray is importable (same hygiene as
  ``test_reference_parity._import_reference``); the cached module object
  keeps working after deregistration.
  """
  if _SHIM_CACHE:
    return _SHIM_CACHE[0]
  saved = {k: v for k, v in sys.modules.items()
           if k == 'xarray' or k.startswith('xarray.')}
  sys.path.insert(0, _SHIM_ROOT)
  try:
    for k in list(saved):
      del sys.modules[k]
    import xarray as shim_xr
    assert 'wbx-refshim' in shim_xr.__version__
    _SHIM_CACHE.append(shim_xr)
    return shim_xr
  finally:
    for k in list(sys.modules):
      if k == 'xarray' or k.startswith('xarray.'):
        del sys.modules[k]
    sys.modules.update(saved)
    sys.path.remove(_SHIM_ROOT)


DIM_SIZES = {'time': 4, 'level': 3, 'latitude': 5, 'longitude': 6}


def _coords_for(dims, rng):
  out = {}
  for d in dims:
    n = DIM_SIZES[d]
    if d == 'time':
      out[d] = (np.datetime64('2020-01-01', 'ns')
                + np.arange(n) * np.timedelta64(6, 'h'))
    elif rng.random() < 0.8:  # sometimes leave a dim label-less
      out[d] = np.linspace(0, 10, n) + (0 if d != 'level' else 100)
  return out


def _rand_var(rng, nan_frac=0.1):
  dims = tuple(d for d in DIM_SIZES
               if rng.random() < 0.75) or ('latitude',)
  shape = tuple(DIM_SIZES[d] for d in dims)
  data = rng.standard_normal(shape).astype(np.float32)
  if rng.random() < nan_frac:
    flat = data.reshape(-1)
    flat[rng.integers(0, flat.size)] = np.nan
  coords = _coords_for(dims, rng)
  return data, dims, coords


class Pair:
  """One value held in both representations."""

  def __init__(self, t, r):
    self.t, self.r = t, r

  @classmethod
  def new(cls, xr, rng):
    data, dims, coords = _rand_var(rng)
    return cls(DimArray(data, dims, coords),
               xr.DataArray(data.copy(), dims=dims, coords=coords))

  def check(self, step):
    assert tuple(self.t.dims) == tuple(self.r.dims), (
        step, self.t.dims, self.r.dims)
    tv = np.asarray(self.t.data, dtype=np.float64)
    rv = np.asarray(self.r.values, dtype=np.float64)
    # Semantics equivalence, not ulp parity: jnp and numpy order fp32
    # accumulations differently, so long op chains drift a few ulp and
    # near-zero reduction sums cancel to ~n·eps·|summand| absolute error
    # (seeds 133/283 sat at 2.7e-6 rel / 2.3e-6 abs). Real alignment or
    # masking bugs produce O(1) errors that these bounds still catch.
    np.testing.assert_allclose(tv, rv, rtol=1e-5, atol=1e-4,
                               equal_nan=True, err_msg=step)
    for d in self.t.dims:
      t_has = self.t.has_coord(d)
      r_has = d in dict(self.r.coords)
      assert t_has == r_has, (step, d, t_has, r_has)
      if t_has:
        tc = np.asarray(self.t.coords[d].values)
        rc = np.asarray(self.r.coords[d].values)
        np.testing.assert_array_equal(tc, rc, err_msg=f'{step}:{d}')


def _apply_op(pair, other, op_id, rng, xr):
  """Applies one random op to both sides; returns (Pair, description)."""
  t, r = pair.t, pair.r
  if op_id == 'add':
    return Pair(t + other.t, r + other.r), 'add'
  if op_id == 'mul':
    return Pair(t * other.t, r * other.r), 'mul'
  if op_id == 'sub_scalar':
    return Pair(t - 1.5, r - 1.5), 'sub_scalar'
  if op_id == 'abs_sq':
    return Pair(abs(t) ** 2, abs(r) ** 2), 'abs_sq'
  if op_id == 'reduce':
    dims = [d for d in t.dims if rng.random() < 0.5]
    if not dims:
      return pair, 'noop'
    how = rng.choice(['mean', 'sum'])
    skipna = bool(rng.integers(2))
    return Pair(getattr(t, str(how))(dims, skipna=skipna),
                getattr(r, str(how))(dim=dims, skipna=skipna)
                ), f'{how}({dims},skipna={skipna})'
  if op_id == 'where':
    return (Pair(t.where(t > 0), r.where(r > 0)), 'where>0')
  if op_id == 'transpose':
    perm = list(t.dims)
    rng.shuffle(perm)
    return Pair(t.transpose(*perm), r.transpose(*perm)), f'transpose{perm}'
  if op_id == 'isel':
    if not t.dims:
      return pair, 'noop'
    d = str(rng.choice(list(t.dims)))
    n = t.sizes[d]
    lo = int(rng.integers(0, n))
    hi = int(rng.integers(lo + 1, n + 1))
    return (Pair(t.isel(**{d: slice(lo, hi)}),
                 r.isel(**{d: slice(lo, hi)})), f'isel({d},{lo}:{hi})')
  if op_id == 'expand':
    if 'member' in t.dims:
      return pair, 'noop'
    return (Pair(t.expand_dims('member'), r.expand_dims('member')),
            'expand_dims')
  if op_id == 'sel':
    # Label-based slice on a labeled, sorted-coord dim.
    cands = [d for d in t.dims
             if t.has_coord(d) and t.coords[d].dims == (d,)
             and np.asarray(t.coords[d].values).dtype.kind in 'fiM'
             and t.sizes[d] > 1]
    if not cands:
      return pair, 'noop'
    d = str(rng.choice(cands))
    vals = np.asarray(t.coords[d].values)
    if not np.all(vals[:-1] <= vals[1:]):
      return pair, 'noop'
    lo, hi = sorted(rng.choice(len(vals), 2, replace=False))
    sl = slice(vals[lo], vals[hi])
    return (Pair(t.sel(**{d: sl}), r.sel(**{d: sl})), f'sel({d})')
  if op_id == 'rename':
    if 'latitude' not in t.dims:
      return pair, 'noop'
    return (Pair(t.rename({'latitude': 'y'}), r.rename({'latitude': 'y'})),
            'rename(latitude->y)')
  if op_id == 'fillna':
    return Pair(t.fillna(-2.0), r.fillna(-2.0)), 'fillna'
  return pair, 'noop'


OPS = ['add', 'mul', 'sub_scalar', 'abs_sq', 'reduce', 'where',
       'transpose', 'isel', 'expand', 'sel', 'rename', 'fillna']


@pytest.mark.parametrize('seed', range(40))
def test_random_chain(seed):
  xr = _shim()
  rng = np.random.default_rng(7000 + seed)
  pair = Pair.new(xr, rng)
  pair.check('init')
  for step in range(6):
    op = str(rng.choice(OPS))
    # Binary ops draw a fresh operand whose dims may only partially
    # overlap — exercising broadcast-by-name + coord merging.
    other = Pair.new(xr, rng)
    if op in ('add', 'mul'):
      # Align labeled coords on shared dims: both libraries require
      # (and the framework asserts) label agreement for arithmetic.
      shared = [d for d in other.t.dims if d in pair.t.dims]
      for d in shared:
        has_t = pair.t.has_coord(d)
        if has_t != (d in dict(other.r.coords)):
          op = 'mul' if op == 'add' else 'add'  # keep draw count stable
        if has_t and d in dict(other.r.coords):
          vals = np.asarray(pair.t.coords[d].values)
          if other.t.sizes[d] != len(vals):
            break
          other = Pair(other.t.assign_coords(**{d: vals}),
                       other.r.assign_coords(**{d: vals}))
      else:
        pass
      # Skip draws whose shared dims disagree in size (labeled or not):
      # the shim (like xarray) refuses them outright, while DimArray
      # permits size-1 named broadcast — a documented divergence — and
      # cleanly rejects the rest (see test_darray.py's mismatch test).
      mismatch = any(
          (pair.t.has_coord(d) != (d in dict(other.r.coords)))
          or other.t.sizes[d] != pair.t.sizes[d]
          for d in shared)
      if mismatch:
        continue
    pair, desc = _apply_op(pair, other, op, rng, xr)
    pair.check(f'seed{seed}:step{step}:{desc}')
