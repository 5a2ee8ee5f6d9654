"""Gridded dataset loaders.

TPU-native equivalents of the reference's Zarr/NetCDF loaders
(``weatherbenchX/data_loaders/xarray_loaders.py:25-410``), over three
sources: an in-memory ``dict[var, DimArray]`` dataset, the framework's own
npz container (``io.save_dataset``), or — when xarray/zarr are installed —
any xarray-openable store (gated import).

Canonical dim names follow the ECMWF convention after renaming:
``init_time``/``lead_time`` for forecasts, ``valid_time`` for analyses,
``latitude``/``longitude`` for space, ``number`` for ensemble members.
"""

import threading
from typing import Any, Callable, Hashable, Iterable, Mapping, Optional, Union

import numpy as np

from weatherbenchx_tpu import io as io_lib
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base

Dataset = dict[str, DimArray]


def rename_dataset(
    ds: Dataset,
    rename_dimensions: Optional[Union[Mapping[str, str], str]] = 'ecmwf',
    rename_variables: Optional[Mapping[str, str]] = None,
    convert_lat_lon_to_latitude_longitude: bool = True,
) -> Dataset:
  """Renames dims/vars to canonical names (reference ``xarray_loaders.py:25-52``)."""
  def ds_dims(d: Dataset) -> set:
    out = set()
    for da in d.values():
      out.update(da.dims)
      out.update(da.coords.keys())
    return out

  mapping: dict[str, str] = {}
  dims = ds_dims(ds)
  if convert_lat_lon_to_latitude_longitude and 'lat' in dims and 'lon' in dims:
    mapping.update({'lat': 'latitude', 'lon': 'longitude'})
  if rename_dimensions == 'ecmwf':
    if 'prediction_timedelta' in dims:  # forecast dataset
      mapping.update({'time': 'init_time', 'prediction_timedelta': 'lead_time'})
    else:  # (re-)analysis dataset
      mapping.update({'time': 'valid_time'})
  elif isinstance(rename_dimensions, Mapping):
    mapping.update(rename_dimensions)
  elif rename_dimensions is not None:
    raise ValueError('rename_dimensions must be either "ecmwf", a dict or None.')

  out = {k: (da.rename(mapping) if mapping else da) for k, da in ds.items()}
  if rename_variables:
    out = {rename_variables.get(k, k): v for k, v in out.items()}
  return out


class DatasetBackedLoader(base.DataLoader):
  """Shared source handling for dataset-backed loaders.

  Accepts an in-memory dataset (``ds=``) or a path: ``.npz`` (framework
  container) always works; ``.zarr``/netCDF paths require xarray installed.
  """

  def __init__(
      self,
      path: Optional[str] = None,
      ds: Optional[Dataset] = None,
      variables: Optional[Iterable[str]] = None,
      sel_kwargs: Optional[Mapping[str, Any]] = None,
      isel_kwargs: Optional[Mapping[str, Any]] = None,
      rename_dimensions: Optional[Union[Mapping[str, str], str]] = 'ecmwf',
      automatically_convert_lat_lon_to_latitude_longitude: bool = True,
      rename_variables: Optional[Mapping[str, str]] = None,
      preprocessing_fn: Optional[Callable[[Dataset], Dataset]] = None,
      **kwargs,
  ):
    if (path is None) == (ds is None):
      raise ValueError('Exactly one of path or ds must be specified.')
    self._ds = ds
    self._path = path
    self._variables = variables
    self._sel_kwargs = sel_kwargs
    self._isel_kwargs = isel_kwargs
    self._rename_dimensions = rename_dimensions
    self._auto_latlon = automatically_convert_lat_lon_to_latitude_longitude
    self._rename_variables = rename_variables
    self._preprocessing_fn = preprocessing_fn
    self._preprocessed = False
    self._prepare_lock = threading.Lock()
    super().__init__(**kwargs)

  def maybe_prepare_dataset(self) -> None:
    """Opens and preprocesses the dataset once per process/worker.

    The per-worker lazy open mirrors reference
    ``xarray_loaders.py:116-141``. Thread-safe: the pipeline's prefetch
    threads call load_chunk concurrently from the very first chunks, and
    an unguarded lazy init would apply preprocessing_fn (a non-idempotent
    user function, e.g. a unit shift) twice to the same dataset.
    """
    if self._preprocessed:
      return
    with self._prepare_lock:
      self._prepare_dataset_locked()

  def _prepare_dataset_locked(self) -> None:
    if self._preprocessed:
      return
    if self._ds is None:
      assert self._path is not None
      # Lazy open: coords eager, data as windowed views. Per-chunk
      # selections read only their window from disk, so stores larger
      # than RAM stream chunk-by-chunk (reference lazy-Zarr behavior,
      # ``data_loaders/base.py:146-153``). Dispatch by extension/protocol
      # with optional-dependency gating lives in io.open_dataset_auto.
      self._ds = io_lib.open_dataset_auto(self._path)
    if self._preprocessing_fn is not None:
      self._ds = self._preprocessing_fn(self._ds)
    self._ds = rename_dataset(
        self._ds, self._rename_dimensions, self._rename_variables,
        self._auto_latlon)
    if self._variables is not None:
      self._ds = {k: self._ds[k] for k in self._variables}
    if self._sel_kwargs is not None:
      # Per-variable selection on applicable dims only (xarray Dataset.sel
      # semantics: variables lacking a dim are passed through).
      self._ds = {
          k: v.sel({d: s for d, s in self._sel_kwargs.items()
                    if d in v.dims})
          for k, v in self._ds.items()
      }
    if self._isel_kwargs is not None:
      # Positional selection — e.g. member 0 of an ensemble regardless of
      # whether the member coordinate is 0- or 1-indexed (reference uses
      # isel(number=0), ``public_configs.py:264-285``).
      self._ds = {
          k: v.isel({d: s for d, s in self._isel_kwargs.items()
                     if d in v.dims})
          for k, v in self._ds.items()
      }
    self._preprocessed = True

  def load_chunk(self, init_times, lead_times=None, reference=None):
    self.maybe_prepare_dataset()
    return super().load_chunk(init_times, lead_times, reference)

  def _sel_each(self, **indexers) -> Dataset:
    return {k: v.sel(indexers) for k, v in self._ds.items()}


class PredictionsFromDataset(DatasetBackedLoader):
  """Forecast loader: selects (init_time, lead_time) directly.

  Reference: ``xarray_loaders.py:160-206``.
  """

  def _load_chunk_from_source(self, init_times, lead_times=None):
    assert self._ds is not None
    out = {}
    for k, da in self._ds.items():
      sel = da.sel(init_time=init_times)
      if lead_times is not None:
        if isinstance(lead_times, slice):
          lt = sel.coord_values('lead_time')
          start = np.timedelta64(lead_times.start)
          stop = np.timedelta64(lead_times.stop)
          keep = np.nonzero((lt >= start) & (lt <= stop))[0]  # inclusive end
          sel = sel.isel(lead_time=keep)
        else:
          sel = sel.sel(lead_time=lead_times)
      out[k] = sel
    return out


class TargetsFromDataset(DatasetBackedLoader):
  """Analysis/target loader: valid_time = init_time + lead_time gather.

  Vectorized select over the valid_time dim (reference
  ``xarray_loaders.py:209-263``), producing (init_time, lead_time, ...)
  arrays with a valid_time non-dim coord.
  """

  def _load_chunk_from_source(self, init_times, lead_times=None):
    assert self._ds is not None
    out = {}
    if lead_times is None:
      for k, da in self._ds.items():
        sel = da.sel(valid_time=init_times).rename({'valid_time': 'init_time'})
        sel = sel.assign_coords(
            valid_time=Coord(('init_time',), init_times))
        out[k] = sel
      return out
    if isinstance(lead_times, slice):
      raise ValueError('Lead time slice not supported for target data loaders.')
    valid_time = (init_times[:, None].astype('datetime64[ns]')
                  + lead_times[None, :].astype('timedelta64[ns]'))
    for k, da in self._ds.items():
      # Normalize to ns before keying: np.datetime64 scalars of different
      # units compare equal but HASH differently, so a [s]/[h]-unit store
      # coord would miss every (ns) lookup key.
      coord = np.asarray(da.coord_values('valid_time')).astype('datetime64[ns]')
      lookup = {v: i for i, v in enumerate(coord)}
      try:
        idx = np.array([[lookup[v] for v in row] for row in valid_time])
      except KeyError as e:
        raise KeyError(f'valid_time {e} not found in target dataset') from e
      sel = da.take('valid_time', idx, ('init_time', 'lead_time'))
      sel = sel.assign_coords(
          init_time=Coord(('init_time',), init_times),
          lead_time=Coord(('lead_time',), lead_times),
          valid_time=Coord(('init_time', 'lead_time'), valid_time))
      out[k] = sel
    return out


class ClimatologyFromDataset(DatasetBackedLoader):
  """Reads a (dayofyear[, hour]) climatology as a predictions dataset.

  Reference: ``xarray_loaders.py:266-316``.
  """

  def __init__(
      self,
      climatology_time_coords: Iterable[str] = ('dayofyear', 'hour'),
      rename_dimensions=None,
      **kwargs,
  ):
    super().__init__(rename_dimensions=rename_dimensions, **kwargs)
    self._climatology_time_coords = tuple(climatology_time_coords)

  def _load_chunk_from_source(self, init_times, lead_times=None):
    assert self._ds is not None
    import pandas as pd

    if isinstance(lead_times, slice):
      raise ValueError(
          'Lead time slice not yet supported for climatology data loaders.')
    if lead_times is not None:
      valid_time = (init_times[:, None].astype('datetime64[ns]')
                    + lead_times[None, :].astype('timedelta64[ns]'))
      out_dims = ('init_time', 'lead_time')
    else:
      valid_time = init_times.astype('datetime64[ns]')
      out_dims = ('init_time',)
    vt = pd.DatetimeIndex(valid_time.reshape(-1))

    out = {}
    for k, da in self._ds.items():
      sel = da
      for coord_name in self._climatology_time_coords:
        unit_values = np.asarray(getattr(vt, coord_name)).reshape(
            valid_time.shape)
        coord = sel.coord_values(coord_name)
        lookup = {int(v): i for i, v in enumerate(coord)}
        idx = np.vectorize(lambda u: lookup[int(u)])(unit_values)
        # Each subsequent select indexes the same output dims, so gather
        # elementwise: first gather expands, later ones select diagonally.
        if coord_name == self._climatology_time_coords[0]:
          sel = sel.take(coord_name, idx, out_dims)
        else:
          sel = _diagonal_take(sel, coord_name, idx, out_dims)
      coords = dict(init_time=Coord(('init_time',), init_times))
      if lead_times is not None:
        coords['lead_time'] = Coord(('lead_time',), lead_times)
        coords['valid_time'] = Coord(out_dims, valid_time)
      sel = sel.assign_coords(**coords)
      out[k] = sel
    return out


def _diagonal_take(da: DimArray, dim: str, idx: np.ndarray,
                   out_dims: tuple) -> DimArray:
  """Select da[dim=idx] where idx is laid out along out_dims already in da.

  Equivalent to xarray's pointwise sel when the indexer shares dims with the
  array (the second time-coord select of a dayofyear/hour climatology).
  """
  # Move out_dims to front, dim right after.
  order = [d for d in out_dims] + [dim] + [
      d for d in da.dims if d not in out_dims and d != dim]
  da_t = da.transpose(*order)
  data = da_t.data
  n_out = len(out_dims)
  flat = np.asarray(data).reshape((-1,) + np.asarray(data).shape[n_out:])
  flat_idx = idx.reshape(-1)
  gathered = flat[np.arange(flat.shape[0]), flat_idx]
  out_shape = idx.shape + np.asarray(data).shape[n_out + 1:]
  gathered = gathered.reshape(out_shape)
  dims = tuple(out_dims) + tuple(
      d for d in da.dims if d not in out_dims and d != dim)
  coords = {k: c for k, c in da.coords.items()
            if set(c.dims).issubset(dims)}
  return DimArray(gathered, dims, coords)


class PersistenceFromDataset(DatasetBackedLoader):
  """Target dataset as a persistence forecast, replicated along lead_time.

  Reference: ``xarray_loaders.py:319-337``.
  """

  def _load_chunk_from_source(self, init_times, lead_times=None):
    assert self._ds is not None
    if lead_times is None or isinstance(lead_times, slice):
      raise ValueError(
          'Exact lead times must be specified for persistence data loader.')
    out = {}
    for k, da in self._ds.items():
      sel = da.sel(valid_time=init_times).rename({'valid_time': 'init_time'})
      sel = sel.expand_dims({'lead_time': len(lead_times)}, axis=1)
      sel = sel.assign_coords(
          lead_time=Coord(('lead_time',), lead_times),
          init_time=Coord(('init_time',), init_times))
      out[k] = sel
    return out


class ProbabilisticClimatologyFromDataset(DatasetBackedLoader):
  """Treats each year of a target dataset as one ensemble member.

  For each valid_time, takes the same (dayofyear, hour) from every year in
  [start_year, end_year] as ensemble members (reference
  ``xarray_loaders.py:340-410``).
  """

  def __init__(self, start_year: int, end_year: int,
               ensemble_dim: str = 'number', **kwargs):
    super().__init__(**kwargs)
    self._start_year = start_year
    self._end_year = end_year
    self._ensemble_dim = ensemble_dim

  def _load_chunk_from_source(self, init_times, lead_times=None):
    assert self._ds is not None
    import pandas as pd

    if lead_times is None or isinstance(lead_times, slice):
      raise ValueError(
          'Exact lead times must be specified for this data loader.')
    valid_time = (init_times[:, None].astype('datetime64[ns]')
                  + lead_times[None, :].astype('timedelta64[ns]'))
    vt = pd.DatetimeIndex(valid_time.reshape(-1))
    doy = np.asarray(vt.dayofyear).reshape(valid_time.shape)
    hod = np.asarray(vt.hour).reshape(valid_time.shape)
    years = list(range(self._start_year, self._end_year + 1))
    member_times = np.stack([
        (np.datetime64(str(year), 'ns')
         + ((doy - 1) * 24 + hod) * np.timedelta64(1, 'h'))
        for year in years])  # (member, init, lead)
    out = {}
    for k, da in self._ds.items():
      # ns-normalized keys: cross-unit datetime64 scalars hash differently.
      coord = np.asarray(da.coord_values('valid_time')).astype('datetime64[ns]')
      lookup = {v: i for i, v in enumerate(coord)}
      idx = np.vectorize(lambda t: lookup[np.datetime64(t, 'ns')])(
          member_times)
      sel = da.take('valid_time', idx,
                    (self._ensemble_dim, 'init_time', 'lead_time'))
      sel = sel.assign_coords(**{
          self._ensemble_dim: Coord((self._ensemble_dim,),
                                    np.arange(len(years))),
          'init_time': Coord(('init_time',), init_times),
          'lead_time': Coord(('lead_time',), lead_times),
          'valid_time': Coord(('init_time', 'lead_time'), valid_time),
      })
      out[k] = sel
    return out
