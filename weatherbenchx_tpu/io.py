"""Self-contained dataset (de)serialization.

xarray/netCDF/zarr are optional in this environment, so the framework ships
its own lossless container for ``dict[str, DimArray]`` datasets: a single
``.npz`` file holding every data/coord array plus a JSON structure record.
Datetime64/timedelta64/string coords round-trip exactly.

``to_xarray_dataset``/``from_xarray_dataset`` provide interop when xarray
is installed (mirrors the reference's netCDF artifacts, e.g.
``beam_pipeline.py:369-404``).
"""

import json
import os
from typing import Hashable, Mapping

import numpy as np

from weatherbenchx_tpu.darray import Coord, DimArray

Dataset = Mapping[Hashable, DimArray]


def _collect(dataset: Dataset) -> tuple[dict, dict[str, np.ndarray]]:
  """Shared structure record + flat key→array map for both containers."""
  arrays: dict[str, np.ndarray] = {}
  meta: dict = {'version': 1, 'variables': {}}
  for i, (var, da) in enumerate(dataset.items()):
    key = f'v{i}'
    meta['variables'][str(var)] = {
        'key': key,
        'dims': list(da.dims),
        'coords': {
            str(name): {'key': f'{key}.c{j}', 'dims': list(c.dims)}
            for j, (name, c) in enumerate(da.coords.items())
        },
    }
    arrays[key] = np.asarray(da.data)
    for j, (name, c) in enumerate(da.coords.items()):
      arrays[f'{key}.c{j}'] = np.asarray(c.values)
  return meta, arrays


def _assemble(meta: dict, get) -> dict[str, DimArray]:
  out: dict[str, DimArray] = {}
  for var, spec in meta['variables'].items():
    coords = {
        name: Coord(tuple(cspec['dims']), get(cspec['key']))
        for name, cspec in spec['coords'].items()
    }
    out[var] = DimArray(get(spec['key']), tuple(spec['dims']), coords)
  return out


def save_dataset(path: str, dataset: Dataset) -> None:
  """Writes a dict[var, DimArray] dataset.

  ``.wbx`` paths use the block container (thread-parallel raw writes via
  the native core when built — the fast path for checkpoint/statistics
  streaming); anything else writes the portable .npz container.
  """
  if path.endswith('.wbx'):
    save_dataset_wbx(path, dataset)
    return
  if path.rstrip('/').endswith('.zarr'):
    from weatherbenchx_tpu import zarr_io
    zarr_io.save_dataset_zarr(path.rstrip('/'), dataset)
    return
  if path.endswith('.nc'):
    from weatherbenchx_tpu import netcdf_io
    netcdf_io.save_dataset_netcdf(path, dataset)
    return
  meta, arrays = _collect(dataset)
  arrays['__meta__'] = np.frombuffer(
      json.dumps(meta).encode(), dtype=np.uint8)
  with open(path, 'wb') as f:
    np.savez(f, **arrays)


def dumps_dataset(dataset: Dataset) -> bytes:
  """Serializes a dataset to portable .npz bytes (in memory)."""
  import io as _pyio
  meta, arrays = _collect(dataset)
  arrays['__meta__'] = np.frombuffer(
      json.dumps(meta).encode(), dtype=np.uint8)
  buf = _pyio.BytesIO()
  np.savez(buf, **arrays)
  return buf.getvalue()


def loads_dataset(data: bytes) -> dict[str, DimArray]:
  """Inverse of dumps_dataset; also parses .wbx container bytes.

  The wbx branch makes remote ``.wbx`` paths work through
  ``fileio.load_dataset_any`` (one whole-object fetch) instead of feeding
  block-container bytes to the npz parser and failing with a misleading
  pickle error.
  """
  import io as _pyio
  if data[:8] == _WBX_MAGIC:
    manifest_offset = int(np.frombuffer(data[8:16], np.uint64)[0])
    manifest = json.loads(data[manifest_offset:].decode())

    def get(key):
      b = manifest['blocks'][key]
      dtype = np.dtype(b['dtype'])
      n = int(np.prod(b['shape'], dtype=np.int64))
      arr = np.frombuffer(data, dtype, count=n, offset=b['offset'])
      return arr.reshape(tuple(b['shape'])).copy()  # writable

    return _assemble(manifest, get)
  with np.load(_pyio.BytesIO(data), allow_pickle=False) as npz:
    meta = json.loads(bytes(npz['__meta__']).decode())
    return _assemble(meta, lambda key: npz[key].copy())


def _looks_like_zarr(path: str) -> bool:
  """A directory is a zarr v2 store if it carries store/array metadata."""
  if any(os.path.exists(os.path.join(path, f))
         for f in ('.zmetadata', '.zgroup')):
    return True
  try:
    entries = os.listdir(path)
  except OSError:
    return False
  return any(os.path.exists(os.path.join(path, e, '.zarray'))
             for e in entries)


def load_dataset(path: str) -> dict[str, DimArray]:
  """Reads a dataset written by save_dataset (.npz, .wbx or .zarr)."""
  if path.rstrip('/').endswith('.zarr') or os.path.isdir(path):
    if os.path.isdir(path) and not _looks_like_zarr(path):
      raise ValueError(
          f'{path!r} is a directory but not a zarr v2 store (no '
          '.zmetadata/.zgroup or */.zarray inside)')
    from weatherbenchx_tpu import zarr_io
    ds = zarr_io.open_dataset_zarr(path.rstrip('/'))
    return {k: v.copy(data=np.asarray(v.data)) for k, v in ds.items()}
  if path.endswith('.wbx') or _is_wbx(path):
    return load_dataset_wbx(path)
  if path.endswith('.nc') or _is_netcdf(path):
    from weatherbenchx_tpu import netcdf_io
    return netcdf_io.load_dataset_netcdf(path)
  with np.load(path, allow_pickle=False) as npz:
    meta = json.loads(bytes(npz['__meta__']).decode())
    return _assemble(meta, lambda key: npz[key])


# ---------------------------------------------------------------------------
# .wbx block container
#
# Layout: | magic (8B) | u64 manifest_offset | 4096-aligned raw blocks ... |
#         | manifest JSON |
# The manifest records each block's offset/nbytes/dtype/shape plus the
# dataset structure. Reads/writes go through the native parallel blockstore
# (weatherbenchx_tpu/native) when available, else plain Python file I/O —
# the format is identical either way.
# ---------------------------------------------------------------------------

_WBX_MAGIC = b'WBXBLK01'
_ALIGN = 4096


def _is_wbx(path: str) -> bool:
  try:
    with open(path, 'rb') as f:
      return f.read(8) == _WBX_MAGIC
  except OSError:
    return False


def is_netcdf_bytes(data: bytes) -> bool:
  """True for netCDF3 (CDF-1/2/5) or netCDF4/HDF5 leading bytes — THE
  magic check; path- and bytes-level dispatchers both route through it."""
  return data[:3] == b'CDF' or data[:8] == b'\x89HDF\r\n\x1a\n'


def _is_netcdf(path: str) -> bool:
  try:
    with open(path, 'rb') as f:
      return is_netcdf_bytes(f.read(8))
  except OSError:
    return False


def save_dataset_wbx(path: str, dataset: Dataset,
                     threads: int = 8) -> None:
  from weatherbenchx_tpu import native

  meta, arrays = _collect(dataset)
  blocks: dict = {}
  offset = _ALIGN  # first block after the (padded) header
  buffers, offsets = [], []
  for key, arr in arrays.items():
    if not arr.flags.c_contiguous:
      # (conditional: ascontiguousarray would promote 0-d arrays to 1-d)
      arr = np.ascontiguousarray(arr).reshape(arr.shape)
    arrays[key] = arr
    blocks[key] = {
        'offset': offset,
        'nbytes': int(arr.nbytes),
        'dtype': arr.dtype.str,
        'shape': list(arr.shape),
    }
    buffers.append(arr)
    offsets.append(offset)
    offset += -(-max(arr.nbytes, 1) // _ALIGN) * _ALIGN
  manifest = json.dumps({**meta, 'blocks': blocks}).encode()

  with open(path, 'wb') as f:
    f.write(_WBX_MAGIC)
    f.write(np.uint64(offset).tobytes())
    f.truncate(offset)
    f.seek(offset)
    f.write(manifest)
  if native.available() and buffers:
    native.pwrite_blocks(path, buffers, offsets, threads=threads)
  else:
    with open(path, 'r+b') as f:
      for arr, off in zip(buffers, offsets):
        f.seek(off)
        f.write(arr.tobytes())


def load_dataset_wbx(path: str, threads: int = 8) -> dict[str, DimArray]:
  from weatherbenchx_tpu import native

  with open(path, 'rb') as f:
    magic = f.read(8)
    if magic != _WBX_MAGIC:
      raise ValueError(f'{path} is not a .wbx container')
    manifest_offset = int(np.frombuffer(f.read(8), np.uint64)[0])
    f.seek(manifest_offset)
    manifest = json.loads(f.read().decode())

  blocks = manifest['blocks']
  keys = list(blocks.keys())
  buffers = {
      key: np.empty(tuple(b['shape']), dtype=np.dtype(b['dtype']))
      for key, b in blocks.items()
  }
  nonempty = [k for k in keys if buffers[k].nbytes > 0]
  if native.available() and nonempty:
    native.pread_blocks(
        path, [buffers[k] for k in nonempty],
        [blocks[k]['offset'] for k in nonempty], threads=threads)
  else:
    with open(path, 'rb') as f:
      for k in nonempty:
        f.seek(blocks[k]['offset'])
        # readinto the preallocated buffer: writable (frombuffer over the
        # read bytes would be read-only — the native path returns writable
        # arrays, and in-place updates of loaded states must work on both)
        # and one copy fewer.
        got = f.readinto(buffers[k])
        if got != buffers[k].nbytes:
          raise ValueError(
              f'{path}: block {k!r} truncated '
              f'({got} of {buffers[k].nbytes} bytes)')
  return _assemble(manifest, lambda key: buffers[key])


def open_dataset(path: str) -> dict[str, DimArray]:
  """Opens a dataset LAZILY: coords eager, variable data as windowed views.

  The streaming analog of :func:`load_dataset` — the reference's lazy Zarr
  open + per-chunk ``.compute()`` (``data_loaders/base.py:146-153``).
  Selections on the returned DimArrays compose index metadata; the per-chunk
  compute step in ``data/base.py`` reads only the selected window from disk
  (threaded positional reads for ``.wbx`` blocks and uncompressed ``.npz``
  members). Bounded memory regardless of store size.
  """
  from weatherbenchx_tpu import lazy

  if path.rstrip('/').endswith('.zarr') or os.path.isdir(path):
    from weatherbenchx_tpu import zarr_io
    return zarr_io.open_dataset_zarr(path.rstrip('/'))
  if path.endswith('.wbx') or _is_wbx(path):
    with open(path, 'rb') as f:
      if f.read(8) != _WBX_MAGIC:
        raise ValueError(f'{path} is not a .wbx container')
      manifest_offset = int(np.frombuffer(f.read(8), np.uint64)[0])
      f.seek(manifest_offset)
      manifest = json.loads(f.read().decode())
    blocks = manifest['blocks']

    def get(key):
      b = blocks[key]
      src = lazy.BlockSource(path, b['offset'], b['shape'], b['dtype'])
      return lazy.LazyArray(src)

    ds = _assemble(manifest, get)
  else:
    sources = lazy.locate_npz_members(path)
    npz = np.load(path, allow_pickle=False)  # handle stays open for
    # eager fallbacks (compressed members) — STORED members never touch it.
    meta = json.loads(bytes(npz['__meta__']).decode())

    def get(key):
      src = sources.get(key)
      if src is None:
        return lazy.LazyArray(lazy.EagerSource(npz[key]))
      return lazy.LazyArray(src)

    ds = _assemble(meta, get)
  # Coordinates materialize eagerly: they are small, and selection logic
  # needs host values.
  out = {}
  for var, da in ds.items():
    coords = {name: Coord(c.dims, np.asarray(c.values))
              for name, c in da.coords.items()}
    out[var] = DimArray(da.data, da.dims, coords)
  return out


def open_dataset_auto(path: str) -> dict[str, DimArray]:
  """Lazy open by extension/protocol with optional-dependency gating.

  THE single place that decides how a store path opens (used by the data
  loaders and the CLIs — keep the dispatch rules here only):

  * local ``.npz`` / ``.wbx`` → self-contained windowed views;
  * ``.zarr`` (local or fsspec URL), or any remote URL that isn't a
    netCDF/HDF file → ``xr.open_zarr`` when BOTH xarray and zarr are
    installed, else the self-contained zarr reader (also fsspec-capable);
  * remote ``.npz`` → eager fetch of the portable container;
  * anything else (netCDF, GRIB, ...) → xarray, lazily when dask exists.
  """
  import importlib.util

  from weatherbenchx_tpu import fileio  # function-local: fileio imports io

  stripped = path.rstrip('/')
  remote = fileio.is_remote(path)
  if stripped.endswith(('.npz', '.wbx')):
    if remote:
      return fileio.load_dataset_any(path)
    return open_dataset(path)
  netcdf_like = stripped.endswith(('.nc', '.nc4', '.h5', '.grib', '.grib2'))
  if stripped.endswith('.zarr') or (remote and not netcdf_like):
    if (importlib.util.find_spec('xarray') is not None
        and importlib.util.find_spec('zarr') is not None):
      import xarray as xr
      return open_xarray_dataset(xr.open_zarr(path))
    from weatherbenchx_tpu import zarr_io
    return zarr_io.open_dataset_zarr(stripped)
  self_contained_netcdf = not remote and (
      stripped.endswith(('.nc', '.nc4', '.h5')) or _is_netcdf(path))
  if importlib.util.find_spec('xarray') is None:
    if self_contained_netcdf:
      # Self-contained netCDF fallback (eager — suits climatology/metrics
      # scale files; use zarr for forecast-archive-scale stores).
      from weatherbenchx_tpu import netcdf_io
      return netcdf_io.load_dataset_netcdf(path)
    raise ImportError(
        f'opening {path!r} needs xarray (GRIB/remote netCDF), which is '
        'not installed; .npz/.wbx/.zarr/.nc open self-contained')
  import xarray as xr  # optional, for netCDF/GRIB stores
  lazy_kwargs = {'chunks': {}} if importlib.util.find_spec('dask') else {}
  try:
    return open_xarray_dataset(xr.open_dataset(path, **lazy_kwargs))
  except (ImportError, ValueError):
    # xarray present but without a netCDF engine (netCDF4/h5netcdf/scipy):
    # fall back to the self-contained reader for local netCDF files.
    if self_contained_netcdf:
      from weatherbenchx_tpu import netcdf_io
      return netcdf_io.load_dataset_netcdf(path)
    raise


def open_xarray_dataset(xds) -> dict[str, DimArray]:
  """Wraps a (lazy, e.g. dask-backed) xarray Dataset without materializing.

  Gated on xarray being installed; per-chunk windows compute via
  ``DataArray.isel(...).values`` (the reference's per-chunk compute).
  """
  from weatherbenchx_tpu import lazy

  out = {}
  for var in xds.data_vars:
    xda = xds[var]
    coords = {
        str(name): Coord(tuple(str(d) for d in xda[name].dims),
                         np.asarray(xda[name].values))
        for name in xda.coords
    }
    out[str(var)] = DimArray(
        lazy.LazyArray(lazy.XarraySource(xda)),
        tuple(str(d) for d in xda.dims), coords)
  return out


def to_xarray_dataset(dataset: Dataset):
  """Optional xarray interop (requires xarray installed)."""
  import xarray as xr

  return xr.Dataset({str(k): v.to_xarray() for k, v in dataset.items()})


def from_xarray_dataset(ds) -> dict[str, DimArray]:
  return {str(k): DimArray.from_xarray(ds[k]) for k in ds.data_vars}
