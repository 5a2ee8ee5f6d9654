"""DimArray: a TPU-native named-axis array.

This is the framework's replacement for the reference's use of
``xr.DataArray`` everywhere (e.g. ``weatherbenchX/metrics/base.py:136-158``).
Design goals, in order:

1. **jit-transparent.** A DimArray is a JAX pytree. Its ``data`` and any
   device-resident coordinates (e.g. NaN ``mask`` coords, int64 time-seconds
   coords) are pytree *leaves* and trace through ``jax.jit`` / ``shard_map`` /
   ``vmap``. Dim names and host-side coordinates (latitude values,
   datetime64 arrays, station-name string arrays) are *static* auxiliary
   data, hashed by content so jit caching works.
2. **Dim-name broadcasting.** Binary ops align operands by dimension *name*
   (union of dims, xarray-style first-appearance ordering), so statistic
   code reads like the reference's xarray code but lowers to pure
   ``jnp`` ops XLA can fuse.
3. **Host/device coordinate split.** datetime64/string coords never touch
   the device (XLA has no such dtypes). Anything that must participate in
   on-device compute (masks, thresholds, time-as-int64-seconds) is stored as
   a jnp array coord and becomes a traced leaf.

A "Dataset" in this framework is simply ``dict[str, DimArray]``; see
``tree.map_structure``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Hashable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _is_host_value(v: Any) -> bool:
  """True if v is host-side (static under jit): numpy arrays & py scalars."""
  if isinstance(v, np.ndarray):
    return True
  if isinstance(v, (bool, int, float, str, bytes, np.generic)):
    return True
  if getattr(v, '__wbx_lazy__', False):  # lazy windowed view (lazy.py)
    return True
  return False


class _HashableArray:
  """Content-hashable wrapper so numpy coords can be static jit aux data."""

  __slots__ = ('value', '_hash')

  def __init__(self, value: np.ndarray):
    self.value = value
    self._hash = None

  def __hash__(self):
    if self._hash is None:
      v = np.asarray(self.value)
      self._hash = hash((v.shape, str(v.dtype), v.tobytes()))
    return self._hash

  def __eq__(self, other):
    if not isinstance(other, _HashableArray):
      return NotImplemented
    a, b = np.asarray(self.value), np.asarray(other.value)
    return (
        a.shape == b.shape
        and a.dtype == b.dtype
        and a.tobytes() == b.tobytes()
    )


@dataclasses.dataclass(frozen=True)
class Coord:
  """A coordinate: named values laid out along a (possibly empty) dims tuple.

  ``values`` is either a numpy array (host coordinate — static under jit) or a
  jnp array (device coordinate — traced leaf under jit). A dimension
  coordinate is a 1-D Coord whose single dim equals its own name.
  """

  dims: tuple[str, ...]
  values: Any

  def __post_init__(self):
    if not isinstance(self.dims, tuple):
      object.__setattr__(self, 'dims', tuple(self.dims))

  @property
  def is_host(self) -> bool:
    return _is_host_value(self.values)

  def __repr__(self):
    v = self.values
    shape = getattr(v, 'shape', ())
    dt = getattr(v, 'dtype', type(v).__name__)
    kind = 'host' if self.is_host else 'device'
    return f'Coord(dims={self.dims}, shape={shape}, dtype={dt}, {kind})'


def broadcast_dims(*dim_tuples: Sequence[str]) -> tuple[str, ...]:
  """Union of dims in order of first appearance (xarray broadcast order)."""
  out: list[str] = []
  for dims in dim_tuples:
    for d in dims:
      if d not in out:
        out.append(d)
  return tuple(out)


def _check_shared_sizes(*operands) -> None:
  """Raise a named-dim error when shared dims have incompatible extents.

  Each operand is a ``(dims, shape)`` pair. Size-1 extents broadcast
  against any size (a deliberate, documented divergence from xarray,
  which refuses same-named dims of unequal length outright); two extents
  both >1 can never be reconciled, and without this check they surface
  as a raw positional-shape TypeError from jax deep inside the op.
  """
  sizes: dict[str, int] = {}
  for dims, shape in operands:
    for d, n in zip(dims, shape):
      prev = sizes.get(d)
      if prev is None or prev == 1:
        sizes[d] = n
      elif n != 1 and n != prev:
        raise ValueError(
            f'dimension {d!r} has mismatched sizes {prev} and {n}: '
            'named-axis broadcasting requires equal (or size-1) extents '
            'on shared dims')


def _expand_to(data, dims: tuple[str, ...], out_dims: tuple[str, ...]):
  """Transpose+expand ``data`` with named ``dims`` to align with out_dims.

  Missing dims become size-1 axes (broadcastable).
  """
  if dims == out_dims:
    return data
  # Transpose existing dims into their relative order within out_dims.
  order = [dims.index(d) for d in out_dims if d in dims]
  if order != list(range(len(dims))):
    data = jnp.transpose(data, order)
  # Insert size-1 axes for missing dims.
  idx = tuple(
      (slice(None) if d in dims else None) for d in out_dims
  )
  return data[idx]


def _merge_coords(
    result_dims: tuple[str, ...],
    *coord_dicts: Mapping[str, Coord],
) -> dict[str, Coord]:
  """Merge coords from operands, keeping those whose dims fit result_dims.

  First occurrence wins (the reference relies on xarray's coordinate
  propagation; within a chunk all arrays share coords by construction so a
  first-wins policy is sufficient and cheap).
  """
  out: dict[str, Coord] = {}
  for cd in coord_dicts:
    for name, coord in cd.items():
      if name in out:
        continue
      if set(coord.dims).issubset(result_dims):
        out[name] = coord
  return out


def _dt64_to_ns_int(v: np.ndarray) -> np.ndarray:
  return v.astype('datetime64[ns]').astype(np.int64)


# ---------------------------------------------------------------------------
# DimArray
# ---------------------------------------------------------------------------


class DimArray:
  """Named-axis array over jnp (or numpy) data with host/device coords."""

  __slots__ = ('data', 'dims', 'coords')

  def __init__(
      self,
      data: Any,
      dims: Sequence[str] | str = (),
      coords: Mapping[str, Coord | tuple | Any] | None = None,
  ):
    if isinstance(dims, str):
      dims = (dims,)
    dims = tuple(dims)
    if (_is_host_value(data) and not isinstance(data, np.ndarray)
        and not getattr(data, '__wbx_lazy__', False)):
      data = np.asarray(data)
    ndim = getattr(data, 'ndim', 0)
    if ndim != len(dims):
      raise ValueError(
          f'data has {ndim} axes but dims={dims} has {len(dims)}'
      )
    self.data = data
    self.dims = dims
    cdict: dict[str, Coord] = {}
    shape = getattr(data, 'shape', ())
    for name, c in (coords or {}).items():
      coord = _as_coord(name, c, dims)
      if coord.dims == (name,) and name in dims:
        n = shape[dims.index(name)]
        cn = np.shape(coord.values)[0] if np.ndim(coord.values) else 1
        if cn != n:
          raise ValueError(
              f'coordinate {name!r} has {cn} labels but dim {name!r} has '
              f'length {n}')
      cdict[name] = coord
    self.coords = cdict

  # -- basic properties -----------------------------------------------------

  @property
  def shape(self) -> tuple[int, ...]:
    return tuple(getattr(self.data, 'shape', ()))

  @property
  def ndim(self) -> int:
    return len(self.dims)

  @property
  def dtype(self):
    return self.data.dtype

  @property
  def sizes(self) -> dict[str, int]:
    return dict(zip(self.dims, self.shape))

  @property
  def size(self) -> int:
    return int(np.prod(self.shape)) if self.shape else 1

  @property
  def values(self) -> np.ndarray:
    return np.asarray(self.data)

  def item(self):
    return np.asarray(self.data).item()

  def __repr__(self):
    lines = [f'DimArray {dict(zip(self.dims, self.shape))} {self.dtype}']
    for k, v in self.coords.items():
      lines.append(f'  {k}: {v}')
    lines.append(repr(self.data))
    return '\n'.join(lines)

  def coord_values(self, name: str) -> np.ndarray:
    """Host numpy values of a coordinate."""
    return np.asarray(self.coords[name].values)

  def has_coord(self, name: str) -> bool:
    return name in self.coords

  # -- construction helpers ---------------------------------------------------

  def copy(self, data=None, coords=None) -> 'DimArray':
    return DimArray(
        self.data if data is None else data,
        self.dims,
        self.coords if coords is None else coords,
    )

  def assign_coords(self, **coords) -> 'DimArray':
    new = dict(self.coords)
    for name, c in coords.items():
      if c is None:
        new.pop(name, None)
      else:
        new[name] = _as_coord(name, c, self.dims)
    return DimArray(self.data, self.dims, new)

  def drop_coords(self, names) -> 'DimArray':
    if isinstance(names, str):
      names = [names]
    new = {k: v for k, v in self.coords.items() if k not in names}
    return DimArray(self.data, self.dims, new)

  def rename(self, mapping: Mapping[str, str] | None = None, **kw) -> 'DimArray':
    mapping = dict(mapping or {}, **kw)
    dims = tuple(mapping.get(d, d) for d in self.dims)
    coords = {}
    for name, c in self.coords.items():
      coords[mapping.get(name, name)] = Coord(
          tuple(mapping.get(d, d) for d in c.dims), c.values
      )
    return DimArray(self.data, dims, coords)

  # -- dtype / NaN ------------------------------------------------------------

  def astype(self, dtype) -> 'DimArray':
    return self.copy(data=jnp.asarray(self.data).astype(dtype))

  def isnull(self) -> 'DimArray':
    d = jnp.asarray(self.data)
    if jnp.issubdtype(d.dtype, jnp.floating) or jnp.issubdtype(
        d.dtype, jnp.complexfloating
    ):
      return self.copy(data=jnp.isnan(d))
    return self.copy(data=jnp.zeros(d.shape, dtype=bool))

  def notnull(self) -> 'DimArray':
    isnull = self.isnull()
    return isnull.copy(data=~jnp.asarray(isnull.data))

  def fillna(self, value) -> 'DimArray':
    d = jnp.asarray(self.data)
    return self.copy(data=jnp.where(jnp.isnan(d), value, d))

  def where(self, cond, other=jnp.nan) -> 'DimArray':
    """Keep values where cond is True, else ``other`` (xarray semantics)."""
    cond_da = cond if isinstance(cond, DimArray) else DimArray(cond)
    other_da = other if isinstance(other, DimArray) else DimArray(
        other if not _is_host_value(other) else np.asarray(other))
    _check_shared_sizes((self.dims, self.shape),
                        (cond_da.dims, cond_da.shape),
                        (other_da.dims, other_da.shape))
    out_dims = broadcast_dims(self.dims, cond_da.dims, other_da.dims)
    x = _expand_to(jnp.asarray(self.data), self.dims, out_dims)
    c = _expand_to(jnp.asarray(cond_da.data), cond_da.dims, out_dims)
    o = _expand_to(jnp.asarray(other_da.data), other_da.dims, out_dims)
    data = jnp.where(c, x, o)
    coords = _merge_coords(out_dims, self.coords, cond_da.coords)
    return DimArray(data, out_dims, coords)

  def clip(self, min=None, max=None) -> 'DimArray':
    return self.copy(data=jnp.clip(jnp.asarray(self.data), min, max))

  # -- arithmetic -------------------------------------------------------------

  def _binary_op(self, other, op, reflexive=False) -> 'DimArray':
    if isinstance(other, DimArray):
      _check_shared_sizes((self.dims, self.shape),
                          (other.dims, other.shape))
      out_dims = broadcast_dims(self.dims, other.dims)
      a = _expand_to(jnp.asarray(self.data), self.dims, out_dims)
      b = _expand_to(jnp.asarray(other.data), other.dims, out_dims)
      coords = _merge_coords(out_dims, self.coords, other.coords)
      data = op(b, a) if reflexive else op(a, b)
      return DimArray(data, out_dims, coords)
    else:
      a = jnp.asarray(self.data)
      data = op(other, a) if reflexive else op(a, other)
      return DimArray(data, self.dims, self.coords)

  def __add__(self, o): return self._binary_op(o, jnp.add)
  def __radd__(self, o): return self._binary_op(o, jnp.add, True)
  def __sub__(self, o): return self._binary_op(o, jnp.subtract)
  def __rsub__(self, o): return self._binary_op(o, jnp.subtract, True)
  def __mul__(self, o): return self._binary_op(o, jnp.multiply)
  def __rmul__(self, o): return self._binary_op(o, jnp.multiply, True)
  def __truediv__(self, o): return self._binary_op(o, jnp.divide)
  def __rtruediv__(self, o): return self._binary_op(o, jnp.divide, True)
  def __pow__(self, o): return self._binary_op(o, jnp.power)
  def __mod__(self, o): return self._binary_op(o, jnp.mod)
  def __gt__(self, o): return self._binary_op(o, jnp.greater)
  def __ge__(self, o): return self._binary_op(o, jnp.greater_equal)
  def __lt__(self, o): return self._binary_op(o, jnp.less)
  def __le__(self, o): return self._binary_op(o, jnp.less_equal)
  def __eq__(self, o): return self._binary_op(o, jnp.equal)  # type: ignore
  def __ne__(self, o): return self._binary_op(o, jnp.not_equal)  # type: ignore
  def __and__(self, o): return self._binary_op(o, jnp.logical_and)
  def __rand__(self, o): return self._binary_op(o, jnp.logical_and, True)
  def __or__(self, o): return self._binary_op(o, jnp.logical_or)
  def __ror__(self, o): return self._binary_op(o, jnp.logical_or, True)
  def __xor__(self, o): return self._binary_op(o, jnp.logical_xor)

  def __neg__(self): return self.copy(data=-jnp.asarray(self.data))
  def __abs__(self): return self.copy(data=jnp.abs(jnp.asarray(self.data)))
  def __invert__(self):
    return self.copy(data=jnp.logical_not(jnp.asarray(self.data)))

  __hash__ = None  # type: ignore

  # -- reductions ---------------------------------------------------------------

  def _reduce(self, fn, nanfn, dim=None, skipna=False, **kw) -> 'DimArray':
    dims = _norm_dims(dim, self.dims)
    if dim is not None and dim is not Ellipsis and not dims:
      # Reducing over an explicitly-empty dim list is a no-op (xarray
      # semantics); `axis=() or None` would instead reduce EVERYTHING.
      # AggregationState.sum_along_dims relies on this for variables that
      # lack the requested dim.
      return self
    axes = tuple(self.dims.index(d) for d in dims)
    out_dims = tuple(d for d in self.dims if d not in dims)
    f = nanfn if skipna else fn
    data = f(jnp.asarray(self.data), axis=axes or None, **kw)
    coords = {
        k: v for k, v in self.coords.items()
        if set(v.dims).issubset(out_dims)
    }
    return DimArray(data, out_dims, coords)

  def sum(self, dim=None, skipna=False) -> 'DimArray':
    return self._reduce(jnp.sum, jnp.nansum, dim, skipna)

  def mean(self, dim=None, skipna=False) -> 'DimArray':
    return self._reduce(jnp.mean, jnp.nanmean, dim, skipna)

  def std(self, dim=None, skipna=False, ddof=0) -> 'DimArray':
    return self._reduce(jnp.std, jnp.nanstd, dim, skipna, ddof=ddof)

  def var(self, dim=None, skipna=False, ddof=0) -> 'DimArray':
    return self._reduce(jnp.var, jnp.nanvar, dim, skipna, ddof=ddof)

  def min(self, dim=None, skipna=False) -> 'DimArray':
    return self._reduce(jnp.min, jnp.nanmin, dim, skipna)

  def max(self, dim=None, skipna=False) -> 'DimArray':
    return self._reduce(jnp.max, jnp.nanmax, dim, skipna)

  def any(self, dim=None) -> 'DimArray':
    return self._reduce(jnp.any, jnp.any, dim)

  def all(self, dim=None) -> 'DimArray':
    return self._reduce(jnp.all, jnp.all, dim)

  def count(self, dim=None) -> 'DimArray':
    """Count of non-NaN values over dims."""
    notnan = ~jnp.asarray(self.isnull().data)
    return self.copy(data=notnan.astype(jnp.int32))._reduce(
        jnp.sum, jnp.sum, dim)

  def cumsum(self, dim: str) -> 'DimArray':
    ax = self.dims.index(dim)
    return self.copy(data=jnp.cumsum(jnp.asarray(self.data), axis=ax))

  def quantile(self, q, dim: str, skipna: bool = False,
               quantile_dim: str = 'quantile') -> 'DimArray':
    """Quantiles along a dim (numpy 'linear' interpolation, like xarray)."""
    q_arr = np.atleast_1d(np.asarray(q, dtype=np.float64))
    ax = self.dims.index(dim)
    fn = jnp.nanquantile if skipna else jnp.quantile
    data = fn(jnp.asarray(self.data), jnp.asarray(q_arr), axis=ax)
    # jnp.quantile puts the quantile axis first.
    out_dims = (quantile_dim,) + self.dims[:ax] + self.dims[ax + 1:]
    coords = {k: c for k, c in self.coords.items()
              if dim not in c.dims}
    coords[quantile_dim] = Coord((quantile_dim,), q_arr)
    return DimArray(data, out_dims, coords)

  def diff(self, dim: str, n: int = 1) -> 'DimArray':
    """First-order difference along a dim (upper-label convention)."""
    ax = self.dims.index(dim)
    data = jnp.diff(jnp.asarray(self.data), n=n, axis=ax)
    coords = {}
    for k, c in self.coords.items():
      if dim in c.dims:
        cax = c.dims.index(dim)
        sl = (slice(None),) * cax + (slice(n, None),)
        coords[k] = Coord(c.dims, c.values[sl])
      else:
        coords[k] = c
    return DimArray(data, self.dims, coords)

  def stack_to_new_dim(self, dims_to_stack: Sequence[str],
                       new_dim: str) -> 'DimArray':
    """Stacks dims into one new trailing range-valued dimension."""
    dims_to_stack = tuple(dims_to_stack)
    rest = [d for d in self.dims if d not in dims_to_stack]
    out = self.transpose(*(rest + list(dims_to_stack)))
    new_size = int(np.prod([self.sizes[d] for d in dims_to_stack]))
    data = jnp.asarray(out.data).reshape(
        tuple(self.sizes[d] for d in rest) + (new_size,))
    coords = {k: c for k, c in self.coords.items()
              if not (set(c.dims) & set(dims_to_stack))}
    coords[new_dim] = Coord((new_dim,), np.arange(new_size))
    return DimArray(data, tuple(rest) + (new_dim,), coords)

  # -- shape manipulation -------------------------------------------------------

  def transpose(self, *dims: str) -> 'DimArray':
    if not dims:
      dims = tuple(reversed(self.dims))
    if '...' in dims:
      named = [d for d in dims if d != '...']
      rest = [d for d in self.dims if d not in named]
      i = dims.index('...')
      dims = tuple(named[:i]) + tuple(rest) + tuple(named[i:])
    missing = [d for d in dims if d not in self.dims]
    if missing or len(dims) != len(self.dims):
      raise ValueError(
          f'transpose dims {dims} do not match array dims {self.dims}'
          + (f' (unknown: {missing})' if missing else ''))
    order = [self.dims.index(d) for d in dims]
    # Host data stays numpy: keeps pure host-side workflows (result
    # combination, serialization) off the accelerator entirely.
    xp = np if _is_host_value(self.data) else jnp
    return DimArray(xp.transpose(self.data, order), dims, self.coords)

  def expand_dims(self, dim: str | Mapping[str, int], axis: int = 0
                  ) -> 'DimArray':
    if isinstance(dim, str):
      dim = {dim: 1}
    xp = np if _is_host_value(self.data) else jnp
    data = self.data
    dims = list(self.dims)
    for name, size in dim.items():
      data = xp.expand_dims(data, axis)
      if size != 1:
        data = xp.broadcast_to(
            data, data.shape[:axis] + (size,) + data.shape[axis + 1:])
      dims.insert(axis, name)
      axis += 1
    return DimArray(data, tuple(dims), self.coords)

  def squeeze(self, dim: str | None = None) -> 'DimArray':
    if dim is None:
      drop = [d for d, s in self.sizes.items() if s == 1]
    else:
      drop = [dim]
    out = self
    for d in drop:
      out = out.isel({d: 0})
    return out

  def broadcast_like(self, other: 'DimArray') -> 'DimArray':
    out_dims = broadcast_dims(other.dims, self.dims)
    sizes = {**self.sizes, **other.sizes}
    data = _expand_to(jnp.asarray(self.data), self.dims, out_dims)
    data = jnp.broadcast_to(data, tuple(sizes[d] for d in out_dims))
    coords = _merge_coords(out_dims, self.coords, other.coords)
    return DimArray(data, out_dims, coords)

  # -- indexing -------------------------------------------------------------------

  def isel(self, indexers: Mapping[str, Any] | None = None, **kw) -> 'DimArray':
    indexers = dict(indexers or {}, **kw)
    # Apply one dim at a time (keeps coord logic simple; XLA fuses gathers).
    out = self
    for dim, idx in indexers.items():
      out = out._isel_one(dim, idx)
    return out

  def _isel_one(self, dim: str, idx) -> 'DimArray':
    ax = self.dims.index(dim)
    scalar = isinstance(idx, (int, np.integer))
    sl = (slice(None),) * ax + (idx,)
    if _is_host_value(self.data):
      new_data = self.data[sl]
    else:
      new_data = jnp.asarray(self.data)[sl]
    new_dims = self.dims[:ax] + self.dims[ax + 1:] if scalar else self.dims
    new_coords = {}
    for name, c in self.coords.items():
      if dim in c.dims:
        cax = c.dims.index(dim)
        csl = (slice(None),) * cax + (idx,)
        cvals = c.values[csl]
        cdims = (c.dims[:cax] + c.dims[cax + 1:]) if scalar else c.dims
        new_coords[name] = Coord(cdims, cvals)
      else:
        new_coords[name] = c
    return DimArray(new_data, new_dims, new_coords)

  def sel(self, indexers: Mapping[str, Any] | None = None,
          method: str | None = None, **kw) -> 'DimArray':
    """Label-based selection on host (numpy) dimension coordinates."""
    indexers = dict(indexers or {}, **kw)
    isel_idx = {}
    for dim, labels in indexers.items():
      coord = np.asarray(self.coords[dim].values)
      if isinstance(labels, slice):
        # Label-slice: inclusive on both ends, following the coordinate's
        # own order (pandas/xarray convention) — on a descending coordinate
        # (e.g. north-to-south latitude stores) start is the upper bound.
        descending = coord.size > 1 and coord[0] > coord[-1]
        mask = np.ones(coord.shape, bool)
        if labels.start is not None:
          mask &= (coord <= labels.start) if descending else (
              coord >= labels.start)
        if labels.stop is not None:
          mask &= (coord >= labels.stop) if descending else (
              coord <= labels.stop)
        isel_idx[dim] = np.nonzero(mask)[0]
      else:
        isel_idx[dim] = _label_indices(coord, labels, method)
    return self.isel(isel_idx)

  def take(self, dim: str, indices: np.ndarray,
           new_dims: Sequence[str]) -> 'DimArray':
    """Vectorized gather: replace ``dim`` with ``new_dims`` of indices.shape.

    The named-array equivalent of xarray's vectorized ``.sel`` with a
    multi-dimensional indexer (e.g. selecting valid_time at every
    (init_time, lead_time) pair). Coords laid out along ``dim`` are gathered
    too and become coords over ``new_dims``.
    """
    indices = np.asarray(indices) if _is_host_value(indices) else indices
    new_dims = tuple(new_dims)
    ax = self.dims.index(dim)
    idx_shape = tuple(indices.shape)
    if len(new_dims) != len(idx_shape):
      raise ValueError(f'{new_dims=} does not match indices shape {idx_shape}')
    flat_idx = indices.reshape(-1)
    if _is_host_value(self.data):
      # One-axis fancy index (== np.take); on a lazy view this is THE
      # windowed read: only the gathered rows come off disk.
      gathered = np.asarray(
          self.data[(slice(None),) * ax + (np.asarray(flat_idx),)])
    else:
      gathered = jnp.take(jnp.asarray(self.data), jnp.asarray(flat_idx),
                          axis=ax)
    out_shape = self.shape[:ax] + idx_shape + self.shape[ax + 1:]
    gathered = gathered.reshape(out_shape)
    out_dims = self.dims[:ax] + new_dims + self.dims[ax + 1:]
    coords: dict[str, Coord] = {}
    for name, c in self.coords.items():
      if dim not in c.dims:
        coords[name] = c
        continue
      cax = c.dims.index(dim)
      if _is_host_value(c.values):
        cg = np.take(np.asarray(c.values), np.asarray(flat_idx), axis=cax)
      else:
        cg = jnp.take(jnp.asarray(c.values), jnp.asarray(flat_idx), axis=cax)
      cg = cg.reshape(c.values.shape[:cax] + idx_shape
                      + c.values.shape[cax + 1:])
      coords[name] = Coord(c.dims[:cax] + new_dims + c.dims[cax + 1:], cg)
    return DimArray(gathered, out_dims, coords)

  def sortby(self, name: str, ascending: bool = True) -> 'DimArray':
    c = self.coords[name]
    if len(c.dims) != 1:
      raise ValueError('sortby requires a 1-D coordinate')
    order = np.argsort(np.asarray(c.values), kind='stable')
    if not ascending:
      order = order[::-1]
    return self.isel({c.dims[0]: order})

  # -- xarray interop (gated: xarray is an optional dependency) -----------------

  def to_xarray(self):
    import xarray as xr  # noqa: deferred optional import
    coords = {
        k: (list(c.dims), np.asarray(c.values))
        for k, c in self.coords.items()
    }
    return xr.DataArray(self.values, dims=list(self.dims), coords=coords)

  @classmethod
  def from_xarray(cls, da) -> 'DimArray':
    coords = {
        str(k): Coord(tuple(str(d) for d in c.dims), c.values)
        for k, c in da.coords.items()
    }
    return cls(da.values, tuple(str(d) for d in da.dims), coords)


def _as_coord(name: str, c, parent_dims: tuple[str, ...]) -> Coord:
  if isinstance(c, Coord):
    return c
  if isinstance(c, tuple) and len(c) == 2:
    dims, values = c
    if isinstance(dims, str):
      dims = (dims,)
    if (isinstance(dims, (tuple, list))
        and all(isinstance(d, str) for d in dims)
        and set(dims) <= set(parent_dims)):
      return Coord(tuple(dims), _coerce_coord_values(values))
    # Not a (dims, values) pair — e.g. {'animal': ('cat', 'dog')} is a
    # 2-tuple of VALUES; fall through to value coercion rather than
    # silently building a Coord with bogus dims.
  if isinstance(c, DimArray):
    return Coord(c.dims, c.data)
  values = _coerce_coord_values(c)
  ndim = getattr(values, 'ndim', 0)
  if ndim == 0:
    return Coord((), values)
  if ndim == 1:
    if name in parent_dims or name not in parent_dims and len(parent_dims) == 0:
      return Coord((name,), values)
    # 1-D coord laid out along a dim of matching size.
    return Coord((name,), values)
  raise ValueError(
      f'Cannot infer dims for >1-D coord {name!r}; pass (dims, values)')


def _coerce_coord_values(values):
  if _is_host_value(values):
    return np.asarray(values)
  if isinstance(values, (list, tuple, range)):
    return np.asarray(values)
  return values  # jnp array / tracer


def _norm_dims(dim, all_dims: tuple[str, ...]) -> tuple[str, ...]:
  if dim is None or dim is Ellipsis:
    return all_dims
  if isinstance(dim, str):
    dim = (dim,)
  dims = tuple(dim)
  missing = [d for d in dims if d not in all_dims]
  if missing:
    raise ValueError(f'Dimensions {missing} not found in {all_dims}')
  return dims


def _label_indices(coord: np.ndarray, labels, method: str | None):
  labels_arr = np.asarray(labels)
  scalar = labels_arr.ndim == 0
  labels_arr = np.atleast_1d(labels_arr)
  if labels_arr.dtype.kind == 'M':
    labels_arr = labels_arr.astype(coord.dtype)
  if method is None:
    sorter = np.argsort(coord, kind='stable')
    pos = np.searchsorted(coord, labels_arr, sorter=sorter)
    pos = np.clip(pos, 0, len(coord) - 1)
    idx = sorter[pos]
    if not np.array_equal(coord[idx], labels_arr):
      bad = labels_arr[coord[idx] != labels_arr]
      raise KeyError(f'Labels not found in coordinate: {bad[:5]}')
  elif method == 'nearest':
    if coord.dtype.kind in 'Mm':
      c = coord.astype('int64').astype('float64')
      l = labels_arr.astype(coord.dtype).astype('int64').astype('float64')
    else:
      c, l = coord.astype('float64'), labels_arr.astype('float64')
    idx = np.abs(c[None, :] - l[:, None]).argmin(axis=1)
  elif method == 'ffill':
    sorter = np.argsort(coord, kind='stable')
    pos = np.searchsorted(coord[sorter], labels_arr, side='right') - 1
    if np.any(pos < 0):
      raise KeyError('Label before first coordinate value with method=ffill')
    idx = sorter[pos]
  else:
    raise ValueError(f'Unknown sel method: {method}')
  return int(idx[0]) if scalar else idx


# ---------------------------------------------------------------------------
# Module-level functions (xarray-ufunc style)
# ---------------------------------------------------------------------------


def _unary(fn) -> Callable[[DimArray], DimArray]:
  def f(x: DimArray) -> DimArray:
    if isinstance(x, DimArray):
      return x.copy(data=fn(jnp.asarray(x.data)))
    return fn(jnp.asarray(x))
  return f


sqrt = _unary(jnp.sqrt)
exp = _unary(jnp.exp)
log = _unary(jnp.log)
log1p = _unary(jnp.log1p)
abs_ = _unary(jnp.abs)
sign = _unary(jnp.sign)
floor = _unary(jnp.floor)
ceil = _unary(jnp.ceil)


def where(cond: DimArray, x, y) -> DimArray:
  """Elementwise select with dim-name broadcasting (xr.where semantics)."""
  xd = x if isinstance(x, DimArray) else DimArray(jnp.asarray(x))
  return xd.where(cond, y)


def comparison_safe_threshold(thresholds: DimArray, data_dtype,
                              op: str) -> DimArray:
  """Pre-rounds float64 comparison constants for sub-f64 data dtypes.

  Under jit with x64 disabled, a float64 threshold constant is silently
  stored at float32, so a data value on the f32 lattice can TIE the
  round-to-nearest image of the threshold even though in float64 it lies
  strictly on one side — flipping indicator statistics (CDF / binarize /
  exceedance) relative to the reference, which compares in float64
  (``weatherbenchX/metrics/wrappers.py:333-374``; caught by the round-5
  100-seed TPU parity fuzz: one exact f32 tie flipped an RPS bin count by
  1/M at one gridpoint, 7e-4 on the aggregate).

  For data x exactly representable in ``data_dtype`` and a float64
  threshold t, the float64 comparison is preserved EXACTLY by rounding t
  directionally in ``data_dtype``:

  * ops ``<=`` and ``>``: the largest ``data_dtype`` value <= t;
  * ops ``<`` and ``>=``: the smallest ``data_dtype`` value >= t;

  after which the comparison may run at ANY precision (f32 on device, f64
  on host) with an identical result — a host-side constant adjustment with
  zero device cost. No-op when the data dtype is float64/non-float or the
  thresholds are device-resident (data-dependent thresholds are computed
  at data precision on both sides, so ties there are shared, not skewed).
  """
  try:
    dt = np.dtype(data_dtype)
  except TypeError:
    return thresholds
  tvals = thresholds.data
  if not (_is_host_value(tvals)
          and np.issubdtype(dt, np.floating) and np.finfo(dt).bits < 64
          and np.issubdtype(np.asarray(tvals).dtype, np.floating)):
    return thresholds
  t64 = np.asarray(tvals, np.float64)
  t_near = t64.astype(dt)
  with np.errstate(invalid='ignore', over='ignore'):
    if op in ('<=', '>'):
      overshoot = t_near.astype(np.float64) > t64
      rounded = np.where(overshoot,
                         np.nextafter(t_near, dt.type(-np.inf)), t_near)
    elif op in ('<', '>='):
      undershoot = t_near.astype(np.float64) < t64
      rounded = np.where(undershoot,
                         np.nextafter(t_near, dt.type(np.inf)), t_near)
    else:
      raise ValueError(f'unsupported comparison op {op!r}')
  return thresholds.copy(data=rounded.astype(dt))


def maximum(a: DimArray, b) -> DimArray:
  return a._binary_op(b, jnp.maximum)


def minimum(a: DimArray, b) -> DimArray:
  return a._binary_op(b, jnp.minimum)


def zeros_like(x: DimArray, dtype=None) -> DimArray:
  return x.copy(data=jnp.zeros(x.shape, dtype=dtype or x.dtype))


def ones_like(x: DimArray, dtype=None) -> DimArray:
  return x.copy(data=jnp.ones(x.shape, dtype=dtype or x.dtype))


def full_like(x: DimArray, fill, dtype=None) -> DimArray:
  return x.copy(data=jnp.full(x.shape, fill, dtype=dtype or x.dtype))


def concat(arrays: Sequence[DimArray], dim: str) -> DimArray:
  """Concatenate along a (possibly new) named dimension.

  Parts are matched by dim NAME (transposed to the first part's order when
  their dim sets agree), mirroring xr.concat semantics.
  """
  arrays = list(arrays)
  first = arrays[0]
  if dim not in first.dims:
    arrays = [a.expand_dims(dim) for a in arrays]
  order = arrays[0].dims
  arrays = [a if a.dims == order else a.transpose(*order) for a in arrays]
  ax = arrays[0].dims.index(dim)
  if all(_is_host_value(a.data) for a in arrays):
    # Host fast path: keep result-combination workflows off the device.
    data = np.concatenate([np.asarray(a.data) for a in arrays], axis=ax)
  else:
    data = jnp.concatenate([jnp.asarray(a.data) for a in arrays], axis=ax)
  coords: dict[str, Coord] = {}
  for name, c in arrays[0].coords.items():
    if dim in c.dims:
      cax = c.dims.index(dim)
      parts = [a.coords[name].values for a in arrays if name in a.coords]
      if len(parts) == len(arrays):
        if all(_is_host_value(p) for p in parts):
          coords[name] = Coord(c.dims, np.concatenate(
              [np.asarray(p) for p in parts], axis=cax))
        else:
          coords[name] = Coord(c.dims, jnp.concatenate(
              [jnp.asarray(p) for p in parts], axis=cax))
    else:
      # A non-dim coord that differs between parts (e.g. the per-size
      # validity mask FSS's neighborhood averaging computes) gains the
      # concat dim, like xr.concat's coords='different' behavior. Values
      # that can't be compared without a device sync (tracers/device
      # arrays) stack whenever the parts are distinct objects; identical
      # host values (and shared objects) keep a single copy.
      parts = [a.coords.get(name) for a in arrays]
      if any(p is None for p in parts):
        coords[name] = c
        continue
      vals = [p.values for p in parts]
      if all(p.dims == c.dims for p in parts) and _coord_parts_identical(vals):
        coords[name] = c
      else:
        # Each part's coord covers all of that part's slices along dim.
        sizes = [a.sizes[dim] for a in arrays]
        if all(_is_host_value(v) for v in vals):
          expanded = [np.broadcast_to(np.asarray(v), (n,) + np.shape(v))
                      for v, n in zip(vals, sizes)]
          stacked = np.concatenate(expanded, axis=0)
        else:
          expanded = [jnp.broadcast_to(jnp.asarray(v), (n,) + jnp.shape(v))
                      for v, n in zip(vals, sizes)]
          stacked = jnp.concatenate(expanded, axis=0)
        coords[name] = Coord((dim,) + c.dims, stacked)
  return DimArray(data, arrays[0].dims, coords)


def _coord_parts_identical(vals: Sequence[Any]) -> bool:
  """Whether per-part coord values are certainly all the same."""
  first = vals[0]
  if all(v is first for v in vals):
    return True
  if not all(_is_host_value(v) for v in vals):
    return False  # device/tracer values: not provable without a sync
  first = np.asarray(first)
  for v in vals[1:]:
    v = np.asarray(v)
    if v.shape != first.shape or v.dtype != first.dtype:
      return False
    if not (np.array_equal(v, first)
            or (v.dtype.kind == 'f'
                and np.array_equal(v, first, equal_nan=True))):
      return False
  return True


def dot_regime(specs: Sequence[tuple], dim: Sequence[str] | str) -> str:
  """Which lowering :func:`dot` takes on TPU for these operand layouts.

  ``specs`` is a list of ``(dims, shape)`` pairs (one per operand, in
  :func:`dot` argument order); returns ``'vpu'`` (fused broadcast
  multiply + tree reduce) or ``'mxu'`` (einsum-HIGHEST). Shape-only so
  callers — notably ``Aggregator.aggregate_statistics``'s batching gate
  — can ask about hypothetical layouts (e.g. a stacked statistic group)
  without materializing them. The rule: the broadcast product must stay
  within 8x the largest operand, else the product blow-up loses to the
  matmul form (measured 21 vs 5 ms/step on the 51-rank histogram shape).
  """
  dims = (dim,) if isinstance(dim, str) else tuple(dim)
  del dims  # routing depends only on the broadcast product vs operands
  all_dims = broadcast_dims(*[d for d, _ in specs])
  sizes: dict = {}
  for dd, ss in specs:
    for d, n in zip(dd, ss):
      if sizes.get(d, 1) == 1:
        sizes[d] = n
  product_elems = 1
  for d in all_dims:
    product_elems *= sizes[d]
  max_operand = max(int(np.prod(s)) if s else 1 for _, s in specs)
  return 'vpu' if product_elems <= 8 * max_operand else 'mxu'


def dot(*arrays: DimArray, dim: Sequence[str] | str) -> DimArray:
  """Named contraction: multiply all arrays and sum over ``dim``.

  TPU-native equivalent of the reference's single aggregation contraction
  ``xr.dot(stat, *weights, *bin_masks, dim=reduce_dims)``
  (``weatherbenchX/aggregation.py:328``).

  On TPU this lowers as a broadcast multiply + reduce, which XLA fuses
  into one VPU pass — NOT as ``jnp.einsum``: einsum routes to the MXU,
  whose default precision multiplies f32 as single-pass bf16 (measured
  2e-1 worst-case relative error on the production 34-bin contraction)
  and whose ``Precision.HIGHEST`` multi-pass fix both re-reads operands
  (det family 2.5 → 4.2 ms/step) and still accumulates sequentially
  (2e-4). The fused multiply + tree-reduce is simultaneously the fastest
  and the most accurate form measured on the v5e: 0.88 vs 0.93/0.97 ms
  and 6e-6 vs 2e-1/2e-4 relative error against a float64 reference.

  On CPU/GPU it stays ``jnp.einsum``, which reproduces the reference's
  np.einsum summation order — the parity suite compares at the
  reference's own 1e-5, and a different reduction association alone
  pushes cancellation-heavy finalizers (REV value curves) outside it.
  """
  dims = (dim,) if isinstance(dim, str) else tuple(dim)
  all_dims = broadcast_dims(*[a.dims for a in arrays])
  out_dims = tuple(d for d in all_dims if d not in dims)
  operands = [jnp.asarray(a.data) for a in arrays]
  if all(op.dtype == jnp.bool_ for op in operands):
    # bool*bool is logical AND and bool sums reduce to int; a count needs
    # floats. (Mixed operands promote to float on multiply.)
    operands = [op.astype(jnp.float32) for op in operands]

  # The broadcast multiply + reduce only wins while the (fused) product
  # stays near the operands' size — one extra "bin" dim (34 regions over a
  # lead×lat×lon statistic, ratio ~4) fuses into a single VPU pass, but
  # genuinely matmul-shaped contractions with several large output dims
  # (rank histogram: 51 ranks × 34 regions, ratio ~200) blow the product
  # up 51× and measured 4× slower than the MXU (21 vs 5 ms/step).
  vpu_friendly = dot_regime(
      [(a.dims, a.shape) for a in arrays], dims) == 'vpu'
  # History (round 5): a manual 3-term bf16 Dekker-split MXU lowering for
  # single-bool-mask contractions (round 4's darray._mask_mxu_dot) was
  # REMOVED after on-chip measurement (tools/bench_mask_dot_forms.py):
  # it materialized the broadcast product + three bf16 splits in HBM
  # (rank_histogram 4.6 -> 25 ms/step in BENCH_r04), and XLA reassociates
  # dot(zh,m)+dot(zl,m)+dot(zt,m) into dot(zh+zl+zt,m) on TPU, collapsing
  # the split back to bf16 grade (measured 6e-3 max rel error vs the
  # 1e-5 parity envelope). einsum-HIGHEST (== the BF16_BF16_F32_X6 dot
  # algorithm) keeps the 6-pass decomposition INSIDE the fused MXU
  # pipeline: measured 1.3e-5 max rel err and 1.35 ms at the 204-row
  # production shape vs the manual split's 6e-3 / 4.1 ms.

  if jax.default_backend() != 'tpu' or not vpu_friendly:
    # CPU/GPU: einsum reproduces the reference's np.einsum summation order
    # (the parity suite compares at the reference's own 1e-5; a different
    # reduction association alone lands cancellation-heavy finalizers like
    # REV outside it). On TPU, HIGHEST avoids the MXU's default bf16
    # multiplies (2e-1 worst-case error measured); it is a no-op on CPU
    # and disables tf32 on GPU.
    letters = {d: chr(ord('a') + i) for i, d in enumerate(all_dims)}
    spec = ','.join(''.join(letters[d] for d in a.dims) for a in arrays)
    spec += '->' + ''.join(letters[d] for d in out_dims)
    data = jnp.einsum(spec, *operands, precision=jax.lax.Precision.HIGHEST)
    coords = _merge_coords(out_dims, *[a.coords for a in arrays])
    return DimArray(data, out_dims, coords)

  def expand(a, op):
    # Transpose to all_dims order and insert size-1 axes for missing dims.
    present = [d for d in all_dims if d in a.dims]
    op = jnp.transpose(op, [a.dims.index(d) for d in present])
    for i, d in enumerate(all_dims):
      if d not in a.dims:
        op = jnp.expand_dims(op, i)
    return op

  prod = expand(arrays[0], operands[0])
  for a, op in zip(arrays[1:], operands[1:]):
    prod = prod * expand(a, op)
  data = prod.sum(tuple(i for i, d in enumerate(all_dims) if d in dims))
  coords = _merge_coords(out_dims, *[a.coords for a in arrays])
  return DimArray(data, out_dims, coords)


def dot_batched(stats: Sequence[DimArray], *operands: DimArray,
                dim: Sequence[str] | str) -> list[DimArray]:
  """Contract several SAME-LAYOUT arrays against shared operands at once.

  Equivalent to ``[dot(s, *operands, dim=dim) for s in stats]`` (rows of
  a contraction are independent), but stacks the statistics on a fresh
  leading axis so the whole group lowers as ONE contraction. This is what
  feeds the MXU mask path its rows: the production aggregation calls dot
  per (statistic, variable, numerator/denominator) with only ``lead``
  (~4) rows each — batching a family's 20 same-layout calls gives an
  (80, N)x(N, 34) matmul instead of 20 VPU re-scans of the mask stack.

  The reference has no analogue (each ``xr.dot`` is separate inside
  beam's per-chunk combine, ``weatherbenchX/aggregation.py:290-328``);
  this is a TPU-first restructuring.
  """
  stats = list(stats)
  if not stats:
    return []
  first = stats[0]
  for s in stats[1:]:
    if s.dims != first.dims or s.shape != first.shape:
      raise ValueError('dot_batched requires identical dims/shape: '
                       f'{s.dims}{s.shape} vs {first.dims}{first.shape}')
  if len(stats) == 1:
    return [dot(first, *operands, dim=dim)]
  batch_dim = '__stack__'
  assert batch_dim not in first.dims
  stacked = jnp.stack([jnp.asarray(s.data) for s in stats])
  # Dim coords of the shared layout ride along; per-entry non-dim coords
  # are re-merged per split below exactly as dot() would.
  sda = DimArray(stacked, (batch_dim,) + first.dims,
                 {k: c for k, c in first.coords.items()
                  if set(c.dims).issubset(first.dims)})
  outb = dot(sda, *operands, dim=dim)
  ax = outb.dims.index(batch_dim)
  out_dims = tuple(d for d in outb.dims if d != batch_dim)
  outs = []
  for i, s in enumerate(stats):
    data = jnp.take(outb.data, i, axis=ax)
    coords = _merge_coords(out_dims, s.coords,
                           *[a.coords for a in operands])
    outs.append(DimArray(data, out_dims, coords))
  return outs


def apply_ufunc(
    fn: Callable,
    *arrays: DimArray,
    input_core_dims: Sequence[Sequence[str]] | None = None,
    output_core_dims: Sequence[Sequence[str]] = ((),),
    output_sizes: Mapping[str, int] | None = None,
) -> DimArray:
  """Apply a raw-array function over broadcast dims with core dims last.

  A minimal analogue of ``xr.apply_ufunc(..., vectorize=False)``: inputs are
  transposed so their core dims are the trailing axes, batch dims are
  broadcast by name, ``fn`` maps core-dim arrays to core-dim arrays.
  Only single-output supported.
  """
  n = len(arrays)
  input_core_dims = input_core_dims or [()] * n
  batch_dims = broadcast_dims(*[
      tuple(d for d in a.dims if d not in set(icd))
      for a, icd in zip(arrays, input_core_dims)
  ])
  ops = []
  sizes: dict[str, int] = {}
  for a, icd in zip(arrays, input_core_dims):
    order = [d for d in batch_dims if d in a.dims] + list(icd)
    at = a.transpose(*order) if tuple(order) != a.dims else a
    d = _expand_to(jnp.asarray(at.data), at.dims,
                   tuple(batch_dims) + tuple(icd))
    sizes.update({k: v for k, v in a.sizes.items()})
    ops.append(d)
  # Broadcast batch axes to common sizes.
  nb = len(batch_dims)
  bshape = tuple(sizes[d] for d in batch_dims)
  ops = [
      jnp.broadcast_to(o, bshape + o.shape[nb:]) for o in ops
  ]
  out = fn(*ops)
  ocd = tuple(output_core_dims[0])
  out_dims = tuple(batch_dims) + ocd
  coords = _merge_coords(out_dims, *[a.coords for a in arrays])
  return DimArray(out, out_dims, coords)


# ---------------------------------------------------------------------------
# Pytree registration
# ---------------------------------------------------------------------------


def _flatten(da: DimArray):
  leaf_coords = []
  static_coords = []
  for name, c in sorted(da.coords.items()):
    if c.is_host:
      static_coords.append((name, c.dims, _HashableArray(c.values)))
    else:
      leaf_coords.append((name, c.dims))
  leaves = [da.data] + [da.coords[name].values for name, _ in leaf_coords]
  aux = (da.dims, tuple(leaf_coords), tuple(static_coords))
  return leaves, aux


def _unflatten(aux, leaves):
  dims, leaf_coords, static_coords = aux
  da = object.__new__(DimArray)
  da.data = leaves[0]
  da.dims = dims
  coords = {}
  for (name, cdims), v in zip(leaf_coords, leaves[1:]):
    coords[name] = Coord(cdims, v)
  for name, cdims, wrapped in static_coords:
    coords[name] = Coord(cdims, wrapped.value)
  da.coords = coords
  return da


jax.tree_util.register_pytree_node(DimArray, _flatten, _unflatten)
