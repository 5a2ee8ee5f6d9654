"""Minimal eager xarray_beam emulation for the refshim.

Covers exactly the surface the reference's unaggregated pipeline uses
(``beam_pipeline.py:31,538,577,672,679``): ``Key``, ``make_template``,
``Rechunk`` and ``ChunksToZarr``. Works on refshim ``xarray`` Datasets and
the eager list-backed PCollections of the apache_beam shim.

- ``Rechunk`` assembles the incoming per-variable (Key, Dataset) chunks
  into one full-size chunk per variable, placing each chunk's values at
  its Key offsets within the declared ``dim_sizes`` — the in-process
  equivalent of the distributed shuffle.
- ``ChunksToZarr`` merges the assembled variables with the template's
  coords and writes a real zarr v2 store whose on-disk chunk layout
  follows ``zarr_chunks`` (the refshim's ``to_zarr`` writes the chunk
  grid; its ``open_zarr`` reads it back), so the reference test observes
  the same store shape semantics as with real xarray-beam.

Unsupported usage raises instead of guessing (the refshim ground rule).
"""

from __future__ import annotations

import numpy as np

import apache_beam as beam
import xarray as xr


class Key:
  """Chunk key: integer element offsets per dim + the variable-name set."""

  def __init__(self, offsets=None, vars=None):  # pylint: disable=redefined-builtin
    self.offsets = dict(offsets or {})
    self.vars = None if vars is None else frozenset(vars)

  def __eq__(self, other):
    return (isinstance(other, Key) and self.offsets == other.offsets
            and self.vars == other.vars)

  def __hash__(self):
    return hash((tuple(sorted(self.offsets.items())), self.vars))

  def __repr__(self):
    return f'Key(offsets={self.offsets}, vars={set(self.vars or ())})'


def make_template(ds):
  """Returns a zeros-valued Dataset with the input's dims/coords/dtypes.

  The eager analog of xarray_beam's lazy-dask template: downstream code
  only reads shapes, dims, coords and dtypes from it, then the pipeline
  overwrites every value.
  """
  out = xr.Dataset(attrs=dict(ds.attrs))
  for cname, cda in ds.coords.items():
    out.coords[cname] = (tuple(cda.dims), np.asarray(cda.values))
  for name, da in ds.items():
    data = np.zeros(da.shape, dtype=da.dtype)
    coords = {cn: (tuple(c.dims), np.asarray(c.values))
              for cn, c in da.coords.items()}
    out[name] = xr.DataArray(data, dims=tuple(da.dims), coords=coords)
  return out


def _fill_value_for(dtype):
  dtype = np.dtype(dtype)
  if dtype.kind in 'fc':
    return np.nan
  if dtype.kind == 'M':
    return np.datetime64('NaT')
  if dtype.kind == 'm':
    return np.timedelta64('NaT')
  return 0


class Rechunk(beam.PTransform):
  """Assembles (Key, single-variable Dataset) chunks to full arrays.

  Signature mirrors xarray_beam's: (dim_sizes, source_chunks,
  target_chunks, itemsize). In this eager in-process shim all chunks are
  already resident, so the output is one full-size chunk per variable
  keyed at offset 0; the ``target_chunks`` layout is applied at the zarr
  write in ChunksToZarr (which receives the same mapping).
  """

  def __init__(self, dim_sizes, source_chunks, target_chunks, itemsize=4,
               **kwargs):
    del source_chunks, itemsize, kwargs
    self._dim_sizes = dict(dim_sizes)
    self._target_chunks = dict(target_chunks)

  def expand(self, pcoll):
    per_var: dict = {}
    for key, chunk_ds in pcoll.elements:
      names = key.vars if key.vars is not None else set(chunk_ds.keys())
      for name in names:
        per_var.setdefault(name, []).append((key, chunk_ds[name]))

    out = []
    for name, chunks in per_var.items():
      _key0, da0 = chunks[0]
      dims = tuple(da0.dims)
      shape = tuple(self._dim_sizes[d] for d in dims)
      full = np.full(shape, _fill_value_for(da0.dtype), dtype=da0.dtype)
      coord_buffers = {}
      for d in dims:
        cvals0 = np.asarray(da0.coords[d].values) if d in da0.coords else None
        if cvals0 is not None:
          coord_buffers[d] = np.full(
              self._dim_sizes[d], _fill_value_for(cvals0.dtype),
              dtype=cvals0.dtype)
      for key, da in chunks:
        if tuple(da.dims) != dims:
          raise ValueError(
              f'inconsistent dims for {name!r}: {da.dims} vs {dims}')
        index = tuple(
            slice(key.offsets.get(d, 0),
                  key.offsets.get(d, 0) + da.sizes[d]) for d in dims)
        full[index] = np.asarray(da.values)
        for d, sl in zip(dims, index):
          if d in coord_buffers and d in da.coords:
            coord_buffers[d][sl] = np.asarray(da.coords[d].values)
      coords = {d: (
          (d,), vals) for d, vals in coord_buffers.items()}
      assembled = xr.Dataset()
      assembled[name] = xr.DataArray(full, dims=dims, coords=coords)
      out.append((Key({d: 0 for d in dims}, vars={name}), assembled))
    return beam.PCollection(out)


class ChunksToZarr(beam.PTransform):
  """Merges assembled variables with the template and writes a zarr store."""

  def __init__(self, store, template=None, zarr_chunks=None, **kwargs):
    del kwargs
    self._store = store
    self._template = template
    self._zarr_chunks = dict(zarr_chunks or {})

  def expand(self, pcoll):
    template = self._template
    out = xr.Dataset(attrs=dict(template.attrs) if template is not None
                     else {})
    if template is not None:
      for cname, cda in template.coords.items():
        out.coords[cname] = (tuple(cda.dims), np.asarray(cda.values))
    for key, chunk_ds in pcoll.elements:
      names = key.vars if key.vars is not None else set(chunk_ds.keys())
      for name in names:
        da = chunk_ds[name]
        if any(off != 0 for off in key.offsets.values()):
          raise NotImplementedError(
              'shim ChunksToZarr expects fully-assembled chunks '
              '(apply Rechunk first)')
        coords = {cn: (tuple(c.dims), np.asarray(c.values))
                  for cn, c in da.coords.items()}
        out[name] = xr.DataArray(
            np.asarray(da.values), dims=tuple(da.dims), coords=coords)
    out.to_zarr(self._store, chunks=self._zarr_chunks)
    return beam.PCollection([])


__version__ = '0.8.0+wbx-refshim'
