"""Sparse (station/satellite) observation loaders from partitioned Parquet.

Feature parity with reference ``weatherbenchX/data_loaders/sparse_parquet.py``
(hive partitioning ``:27-69``, windowed time filters and duplicate handling
``:72-360``, METAR preset ``:362-524``), redesigned around two small pieces:

* :class:`PartitionLayout` — maps a time range onto the hive-partitioned
  file set (``year=/month=[/day=[/hour=]]``);
* :class:`Window` — the half-open/closed valid-time interval a single
  (init, lead) evaluation point selects, with its Parquet predicate.

Chunks come back as ``dict[var, DimArray]`` over an ``index`` dim with
latitude/longitude/elevation/station/valid_time (+ init_time/lead_time)
coordinates — ready for grid→sparse interpolation against them. Ragged
``index`` lengths are padded downstream (``data/base.py
pad_dim_to_multiple``) so the jitted pipeline sees a bounded shape set.
"""

import dataclasses
import os
from typing import Callable, Mapping, Optional, Sequence, Union

import numpy as np

from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base

_ZERO_TD = np.timedelta64(0, 'h')


@dataclasses.dataclass(frozen=True)
class PartitionLayout:
  """Hive partition scheme: one parquet file per month/day/hour.

  Assumes no missing files over the requested range (matching the
  reference's layout contract).
  """

  granularity: str  # 'month' | 'day' | 'hour'

  _UNITS = {'month': 'M', 'day': 'D', 'hour': 'h'}

  def __post_init__(self):
    if self.granularity not in self._UNITS:
      raise ValueError(
          f"partitioned_by must be one of {sorted(self._UNITS)}; "
          f"got {self.granularity!r}")

  @property
  def numpy_unit(self) -> str:
    return self._UNITS[self.granularity]

  def file_for(self, root: str, when: np.datetime64) -> str:
    t = when.item()
    parts = [f'year={t.year}', f'month={t.month}']
    stamp = f'{t.year}-{t.month:02d}'
    if self.granularity in ('day', 'hour'):
      parts.append(f'day={t.day}')
      stamp += f'-{t.day:02d}'
    if self.granularity == 'hour':
      parts.append(f'hour={t.hour}')
      stamp += f'T{t.hour:02d}'
    return os.path.join(root, *parts, f'{stamp}.parquet')

  def files_covering(self, root: str, start: np.datetime64,
                     stop: np.datetime64) -> list[str]:
    """Partition files whose period intersects [start, stop]."""
    unit = self.numpy_unit
    one = np.timedelta64(1, unit)
    periods = np.arange(np.datetime64(start, unit),
                        np.datetime64(stop, unit) + one, one)
    return [self.file_for(root, p) for p in periods]


@dataclasses.dataclass(frozen=True)
class Window:
  """A valid-time selection interval for one evaluation point.

  ``stop=None`` means an exact-time match. Otherwise the interval is
  ``[start, stop)`` — or ``[start, stop]`` when ``closed_end``.
  """

  start: np.datetime64
  stop: Optional[np.datetime64] = None
  closed_end: bool = False

  def predicate(self, time_column: str) -> list[tuple]:
    """The pyarrow row filter implementing this window."""
    import pandas as pd

    if self.stop is None:
      return [(time_column, '=', pd.Timestamp(self.start))]
    return [(time_column, '>=', pd.Timestamp(self.start)),
            (time_column, '<=' if self.closed_end else '<',
             pd.Timestamp(self.stop))]

  def mask(self, times: np.ndarray) -> np.ndarray:
    """In-memory row mask with the exact semantics of ``predicate``."""
    times = np.asarray(times, dtype='datetime64[ns]')
    start = np.datetime64(self.start, 'ns')
    if self.stop is None:
      return times == start
    stop = np.datetime64(self.stop, 'ns')
    return (times >= start) & (times <= stop if self.closed_end
                               else times < stop)

  def sorted_bounds(self, times_sorted: np.ndarray) -> tuple:
    """``[lo, hi)`` positions selecting exactly ``mask``'s rows, given the
    time column pre-sorted ascending (binary search instead of a scan)."""
    start = np.datetime64(self.start, 'ns')
    if self.stop is None:
      return (np.searchsorted(times_sorted, start, 'left'),
              np.searchsorted(times_sorted, start, 'right'))
    stop = np.datetime64(self.stop, 'ns')
    return (np.searchsorted(times_sorted, start, 'left'),
            np.searchsorted(times_sorted, stop,
                            'right' if self.closed_end else 'left'))

  def file_range(self, slack: np.timedelta64) -> tuple:
    last = self.start if self.stop is None else self.stop
    return self.start - slack, last + slack


def _as_tolerance_pair(
    tolerance: Union[np.timedelta64, tuple, None],
) -> Optional[tuple]:
  """Normalizes the tolerance argument to a validated (before, after) pair."""
  if tolerance is None:
    return None
  if isinstance(tolerance, np.timedelta64):
    tolerance = (-tolerance, tolerance)
  if len(tolerance) != 2:
    raise ValueError(
        f'tolerance takes one np.timedelta64 (symmetric) or a (before, '
        f'after) pair; got {tolerance!r}')
  before, after = tolerance
  if after - before <= _ZERO_TD:
    raise ValueError(
        f'empty tolerance window {tolerance!r}: no observation can ever '
        'fall inside it')
  return before, after


class _ColumnTable:
  """Plain dict-of-numpy-columns table: the cache's row-gather currency.

  pandas row selection over arrow-backed columns pays a ChunkedArray.take
  per column per window (it dominated the METAR-month profile); numpy
  fancy-indexing over pre-extracted columns is ~10x cheaper and the
  string/QC columns convert to numpy exactly once per FILE instead of
  once per window.
  """

  __slots__ = ('cols',)

  def __init__(self, cols: dict):
    self.cols = cols

  def __len__(self) -> int:
    for v in self.cols.values():
      return len(v)
    return 0

  @classmethod
  def from_frame(cls, frame) -> '_ColumnTable':
    cols = {}
    for name in frame.columns:
      arr = np.asarray(frame[name].to_numpy())
      if arr.dtype == object:
        # One-time str conversion (station ids, QC flags); windows and the
        # final chunk assembly then never touch object dtype again.
        arr = arr.astype(str)
      cols[str(name)] = arr
    return cls(cols)

  def take(self, idx: np.ndarray) -> '_ColumnTable':
    return _ColumnTable({k: v[idx] for k, v in self.cols.items()})

  def select(self, names) -> '_ColumnTable':
    return _ColumnTable({n: self.cols[n] for n in names})

  def rename(self, mapping: Mapping[str, str]) -> '_ColumnTable':
    return _ColumnTable({mapping.get(k, k): v for k, v in self.cols.items()})

  def assign(self, **new_cols) -> '_ColumnTable':
    n = len(self)
    out = dict(self.cols)
    for k, v in new_cols.items():
      v = np.asarray(v)
      out[k] = np.full(n, v[()]) if v.ndim == 0 else v
    return _ColumnTable(out)

  @staticmethod
  def concat(tables: Sequence['_ColumnTable']) -> '_ColumnTable':
    tables = list(tables)
    names = list(tables[0].cols)
    out = {}
    for n in names:
      parts = [t.cols[n] for t in tables]
      # String columns may have different '<U' widths per window.
      if any(p.dtype.kind == 'U' for p in parts):
        width = max(p.dtype.itemsize // 4 for p in parts) or 1
        parts = [p.astype(f'<U{width}') for p in parts]
      out[n] = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return _ColumnTable(out)


def _check_rowwise_preprocess(times_before, times_after,
                              exact_limit: int = 500_000):
  """Validates that a preprocessing_fn behaved row-wise w.r.t. time.

  With ``cache_files`` enabled the fn runs once per FILE (before
  windowing) instead of once per extracted window; the two application
  orders agree exactly when the fn only drops/edits rows independently
  and never rewrites the time column or reorders rows. This checks the
  fn's output time column is a subsequence of the input's — catching the
  failure modes that silently change window membership (time edits,
  row additions, sorting). Files beyond ``exact_limit`` rows fall back
  to a vectorized multiset-subset check (catches edits/additions, not
  pure reorderings) to keep validation negligible next to the decode.
  """
  before = np.asarray(times_before)
  after = np.asarray(times_after)
  msg = ('preprocessing_fn edited, reordered, or added time-column rows; '
         'with cache_files it must be row-wise: surviving rows keep '
         'their original times and order '
         '(see SparseObservationsFromParquet docstring)')
  if len(after) > len(before):
    raise ValueError(msg)
  if len(after) == len(before):  # common case: value edits, no drops
    if not np.array_equal(after, before):
      raise ValueError(msg)
    return
  if len(before) > exact_limit:
    ub, cb = np.unique(before, return_counts=True)
    ua, ca = np.unique(after, return_counts=True)
    pos = np.searchsorted(ub, ua)
    if (pos >= len(ub)).any() or (ub[np.minimum(pos, len(ub) - 1)]
                                  != ua).any() or (ca > cb[pos]).any():
      raise ValueError(msg)
    return
  bi = 0
  n = len(before)
  # Compare raw int64 views: datetime64.tolist() yields python ints,
  # which never compare equal to datetime64 scalars.
  b_list = before.view('i8').tolist() if before.dtype.kind in 'mM' \
      else before.tolist()
  a_list = after.view('i8').tolist() if after.dtype.kind in 'mM' \
      else after.tolist()
  for t in a_list:  # exact two-pointer subsequence check
    while bi < n and b_list[bi] != t:
      bi += 1
    if bi == n:
      raise ValueError(msg)
    bi += 1


class _FileFrameCache:
  """Thread-safe LRU of fully-decoded, time-indexed partition files.

  Evaluation points within one chunk hit the same partition files over
  and over (e.g. 24 hourly valid times per daily file); without a cache
  each point pays a full parquet decode. Bounded by file COUNT — partition
  files are roughly uniform in size, so this is a practical memory bound
  chosen by the caller.

  Each entry stores the file as a :class:`_ColumnTable` (row-wise
  preprocessing already applied, strings already numpy) plus a one-time
  argsort of its time column, so every window extraction is a binary
  search (``Window.sorted_bounds``) + numpy row-gather instead of an
  O(rows) scan + per-column arrow take — the scan dominates once files
  reach real METAR size (tens of millions of rows/month). Selected rows
  are returned in ORIGINAL file order, so downstream tie-breaking
  (duplicate removal keeps the first-seen row) is identical to the
  uncached predicate read.
  """

  def __init__(self, max_files: int, time_column: str, preprocess=None):
    import collections
    import threading
    self.max_files = max_files
    self.time_column = time_column
    # Row-wise per-file preprocessing (QC NaNing etc.). Applying it once
    # per FILE here is equivalent to the uncached per-window application
    # exactly when the fn is row-wise and leaves the time column intact —
    # which window-based selection already requires for sane semantics.
    self.preprocess = preprocess
    self._lock = threading.Lock()
    self._frames: 'collections.OrderedDict' = collections.OrderedDict()

  def get(self, fn: str):
    """Returns ``(table, times_sorted, order)`` with ``order`` the argsort
    of the file's time column (both empty for a zero-row file)."""
    import pandas as pd
    with self._lock:
      if fn in self._frames:
        self._frames.move_to_end(fn)
        return self._frames[fn]
    frame = pd.read_parquet(fn)
    if self.preprocess is not None and len(frame):
      before = frame[self.time_column].to_numpy(copy=True)
      frame = self.preprocess(frame)
      _check_rowwise_preprocess(before, frame[self.time_column].to_numpy())
    table = _ColumnTable.from_frame(frame)
    if len(table):
      times = np.asarray(table.cols[self.time_column],
                         dtype='datetime64[ns]')
      order = np.argsort(times, kind='stable')
      entry = (table, times[order], order)
    else:
      entry = (table, np.empty(0, 'datetime64[ns]'), np.empty(0, np.intp))
    with self._lock:
      self._frames[fn] = entry
      self._frames.move_to_end(fn)
      while len(self._frames) > self.max_files:
        self._frames.popitem(last=False)
    return entry


def _read_parquet_window(files: Sequence[str], window: Window,
                         time_column: str,
                         cache: Optional[_FileFrameCache] = None):
  """Reads and concatenates the window's rows across partition files.

  With a cache, returns a :class:`_ColumnTable` (numpy row-gathers);
  without one, a pandas DataFrame from per-window predicate reads.
  """
  import pandas as pd
  import pyarrow

  if cache is not None:
    tables = []
    for fn in files:
      table, times_sorted, order = cache.get(fn)
      if len(table):
        lo, hi = window.sorted_bounds(times_sorted)
        table = table.take(np.sort(order[lo:hi]))
      tables.append(table)
    return _ColumnTable.concat(tables)

  predicate = window.predicate(time_column)
  frames = []
  for fn in files:
    try:
      frames.append(pd.read_parquet(fn, filters=predicate))
    except pyarrow.lib.ArrowTypeError:
      # Predicates fail to type-check against a zero-row file's schema;
      # confirm it really is empty rather than masking a data bug.
      whole = pd.read_parquet(fn)
      if len(whole):
        raise
      frames.append(whole)
  return pd.concat(frames, ignore_index=True)


def _keep_closest_observation(df, key_column: str, valid_time,
                              time_column: Optional[str]):
  """One row per key: the temporally closest to valid_time (first on ties,
  or plain first-seen when no time column is given)."""
  if isinstance(df, _ColumnTable):
    if time_column is None:
      order = np.arange(len(df))
    else:
      gap = np.abs(np.asarray(df.cols[time_column], 'datetime64[ns]')
                   - np.datetime64(valid_time, 'ns'))
      order = np.argsort(gap, kind='stable')
    keys = df.cols[key_column][order]
    _, first = np.unique(keys, return_index=True)
    # keep the closest (= first in ranked order) per key, in ranked order
    return df.take(order[np.sort(first)])
  if time_column is None:
    order = np.arange(len(df))
  else:
    gap = np.abs(df[time_column].to_numpy() - np.datetime64(valid_time, 'ns'))
    order = np.argsort(gap, kind='stable')
  ranked = df.iloc[order]
  return ranked[~ranked[key_column].duplicated()]


class SparseObservationsFromParquet(base.DataLoader):
  """General sparse observations from hive-partitioned Parquet.

  Reference semantics (``sparse_parquet.py:72-360``): per evaluation point
  (init+lead), select rows whose time falls in the point's window (exact
  match, +/- tolerance, or a lead interval), optionally keep only the
  closest observation per station, and stack everything into flat
  ``index``-dim arrays.

  ``preprocessing_fn`` contract: the fn must be ROW-WISE — it may edit
  values or drop rows, where each row's fate depends only on that row,
  and surviving rows must keep their original times and relative order.
  Without ``cache_files`` it runs per extracted window; with
  ``cache_files`` it runs once per partition file before windowing, and
  the two orders only agree for row-wise fns (window-relative filtering,
  time-column edits, or sorting would silently change results between
  cached and uncached runs). The cached path validates this by checking
  the fn's output time column is a subsequence of its input's.
  """

  def __init__(
      self,
      path: str,
      partitioned_by: str,
      time_dim: str,
      variables: Sequence[str],
      coordinate_variables: Sequence[str] = (),
      split_variables: bool = False,
      dropna: bool = False,
      tolerance: Optional[Union[np.timedelta64, tuple]] = None,
      rename_variables: Optional[Mapping[str, str]] = None,
      include_slice_end_time: bool = False,
      remove_duplicates: bool = False,
      pick_closest_duplicate_by: Optional[str] = None,
      observation_dim: Optional[str] = None,
      file_tolerance: np.timedelta64 = np.timedelta64(1, 'h'),
      preprocessing_fn: Optional[Callable] = None,
      cache_files: int = 0,
      **kwargs,
  ):
    super().__init__(compute=False, **kwargs)
    self._root = path
    self._layout = PartitionLayout(partitioned_by)
    self._time_dim = time_dim
    self._variables = list(variables)
    self._coordinate_variables = list(coordinate_variables) + ['valid_time']
    self._split_variables = split_variables
    self._dropna = dropna
    self._tolerance = _as_tolerance_pair(tolerance)
    self._rename_variables = rename_variables
    self._include_slice_end_time = include_slice_end_time
    if remove_duplicates and observation_dim is None:
      raise ValueError(
          'remove_duplicates needs observation_dim to know which column '
          'identifies an observation')
    self._remove_duplicates = remove_duplicates
    self._pick_closest_duplicate_by = pick_closest_duplicate_by
    self._observation_dim = observation_dim
    self._file_tolerance = file_tolerance
    self._preprocessing_fn = preprocessing_fn
    # cache_files > 0 keeps that many fully-decoded partition files in an
    # LRU and filters windows in memory — one decode per file per chunk
    # instead of one per evaluation point (the per-point predicate reads
    # re-decode the same file for every lead/init hitting it).
    self._file_cache = (
        _FileFrameCache(cache_files, time_dim,
                        preprocess=self._preprocessing_fn)
        if cache_files else None)

  # -- one evaluation point → one table ---------------------------------------

  def _window_for(self, valid_time: np.datetime64,
                  lead_interval: Optional[slice]) -> Window:
    if self._tolerance is not None:
      before, after = self._tolerance
      return Window(valid_time + before, valid_time + after,
                    closed_end=self._include_slice_end_time)
    if lead_interval is not None:
      return Window(valid_time - lead_interval.start,
                    valid_time + lead_interval.stop,
                    closed_end=self._include_slice_end_time)
    return Window(valid_time)

  def _table_for_point(self, valid_time: np.datetime64,
                       lead_interval: Optional[slice] = None):
    window = self._window_for(valid_time, lead_interval)
    lo, hi = window.file_range(self._file_tolerance)
    files = self._layout.files_covering(self._root, lo, hi)
    df = _read_parquet_window(files, window, self._time_dim,
                              cache=self._file_cache)
    if self._preprocessing_fn is not None and not isinstance(
        df, _ColumnTable):
      # Cached tables arrive preprocessed (once per file, _FileFrameCache).
      df = self._preprocessing_fn(df)
    if self._remove_duplicates:
      if lead_interval is not None:
        raise ValueError(
            'remove_duplicates is ambiguous over a lead_times interval '
            '(several valid observations per station is the point)')
      df = _keep_closest_observation(
          df, self._observation_dim, valid_time,
          self._pick_closest_duplicate_by)
    renames = dict(self._rename_variables or {})
    renames[self._time_dim] = 'valid_time'
    if isinstance(df, _ColumnTable):
      return df.rename(renames).select(
          self._variables + self._coordinate_variables)
    df = df.rename(columns=renames)
    return df[self._variables + self._coordinate_variables]

  # -- chunk assembly ----------------------------------------------------------

  def _load_chunk_from_source(self, init_times, lead_times=None):
    import pandas as pd

    tables = []
    if isinstance(lead_times, slice):
      if self._tolerance is not None:
        raise ValueError(
            'tolerance and a lead_times interval both define the time '
            'window; specify only one')
      for init_time in init_times:
        df = self._table_for_point(init_time, lead_interval=lead_times)
        if isinstance(df, _ColumnTable):
          valid = np.asarray(df.cols['valid_time'], 'datetime64[ns]')
          df = df.assign(init_time=np.datetime64(init_time, 'ns'),
                         lead_time=valid - np.datetime64(init_time, 'ns'))
        else:
          df = df.assign(init_time=init_time,
                         lead_time=df['valid_time'] - init_time)
        tables.append(df)
    elif lead_times is None:
      tables = [self._table_for_point(t) for t in init_times]
    else:
      for init_time in init_times:
        for lead_time in lead_times:
          df = self._table_for_point(init_time + lead_time)
          if isinstance(df, _ColumnTable):
            df = df.assign(
                init_time=np.datetime64(init_time, 'ns'),
                lead_time=np.timedelta64(lead_time, 'ns'))
          tables.append(
              df if isinstance(df, _ColumnTable)
              else df.assign(init_time=init_time, lead_time=lead_time))

    if tables and isinstance(tables[0], _ColumnTable):
      stacked = _ColumnTable.concat(tables)
    else:
      stacked = pd.concat(tables, ignore_index=True)
    coord_names = list(self._coordinate_variables)
    if lead_times is not None:
      coord_names += ['init_time', 'lead_time']

    def as_array(column) -> np.ndarray:
      if isinstance(stacked, _ColumnTable):
        return stacked.cols[column]
      values = stacked[column].to_numpy()
      # String-ish columns (station ids) come back as object arrays.
      return values.astype(str) if values.dtype == object else values

    coords = {name: Coord(('index',), as_array(name))
              for name in coord_names}
    coords['index'] = Coord(('index',), np.arange(len(stacked)))
    chunk = {var: DimArray(as_array(var), ('index',), coords)
             for var in self._variables}
    return self._drop_missing(chunk) if self._dropna else chunk

  def _drop_missing(self, chunk: dict) -> dict:
    """NaN-row removal: per variable when split, else rows missing anywhere.

    Dtype-aware like the reference's ``xr.Dataset.dropna``: floats drop
    NaN rows, datetimes drop NaT rows, and integer/string variables (e.g.
    count or flag columns) have no missing sentinel — every row kept.
    """

    def present(values) -> np.ndarray:
      arr = np.asarray(values)
      if np.issubdtype(arr.dtype, np.floating):
        return ~np.isnan(arr)
      if arr.dtype.kind in 'mM':
        return ~np.isnat(arr)
      return np.ones(arr.shape, dtype=bool)

    finite = {v: present(da.values) for v, da in chunk.items()}
    if self._split_variables:
      return {v: da.isel(index=np.flatnonzero(finite[v]))
              for v, da in chunk.items()}
    keep = np.flatnonzero(
        np.logical_and.reduce(list(finite.values())))
    return {v: da.isel(index=keep) for v, da in chunk.items()}


# -- METAR preset -------------------------------------------------------------
# Station-variable naming and QC conventions (reference
# ``sparse_parquet.py:362-409``); the mapping itself is fixed data.

METAR_TO_ERA5_NAMES = {
    'seaLevelPress': 'mean_sea_level_pressure',
    'temperature': '2m_temperature',
    'dewpoint': '2m_dewpoint_temperature',
    'windSpeed': '10m_wind_speed',
    'windGust': '10m_wind_gust',
    'windDir': '10m_wind_direction',
    'minTemp24Hour': 'min_2m_temperature_24hr',
    'maxTemp24Hour': 'max_2m_temperature_24hr',
    'precip1Hour': 'total_precipitation_1hr',
    'precip3Hour': 'total_precipitation_3hr',
    'precip6Hour': 'total_precipitation_6hr',
    'precip24Hour': 'total_precipitation_24hr',
    'precipRate': 'precipitation_rate',
}
ERA5_TO_METAR_NAMES = {v: k for k, v in METAR_TO_ERA5_NAMES.items()}

METAR_QC_SUFFIX = 'DD'
METAR_BAD_QUALITY_FLAGS = ('Z', 'B', 'X', 'Q', 'k')
METAR_COORDINATE_VARIABLES = (
    'latitude', 'longitude', 'elevation', 'stationName')
_METAR_ELEVATION_FILL = 9.999e03


def set_bad_quality_to_nan(df, variables, qc_suffix, bad_quality_flags):
  """NaNs every value whose paired QC column carries a bad flag."""
  for variable in variables:
    bad = np.isin(df[variable + qc_suffix], bad_quality_flags)
    df[variable] = df[variable].mask(bad)
  return df


def convert_longitude_to_0_to_360(df, longitude_dim: str = 'longitude'):
  df[longitude_dim] = np.mod(df[longitude_dim], 360)
  return df


def _metar_clean(df, metar_variables, user_fn=None):
  """Standard METAR hygiene: QC flags → NaN, wrap longitude, NaN the
  elevation fill value. Runs after any user preprocessing."""
  if user_fn is not None:
    df = user_fn(df)
  df = set_bad_quality_to_nan(
      df, metar_variables, METAR_QC_SUFFIX, METAR_BAD_QUALITY_FLAGS)
  df = convert_longitude_to_0_to_360(df)
  df['elevation'] = df['elevation'].mask(
      df['elevation'] >= _METAR_ELEVATION_FILL)
  return df


class METARFromParquet(SparseObservationsFromParquet):
  """METAR observations with QC-flag NaNing and ERA5-style renames.

  Reference ``sparse_parquet.py:411-524``.
  """

  def __init__(
      self,
      path: str,
      variables: Sequence[str],
      time_dim: str,
      partitioned_by: str = 'month',
      rename_variables: Optional[Mapping[str, str]] = None,
      preprocessing_fn: Optional[Callable] = None,
      **kwargs,
  ):
    del rename_variables  # the METAR→ERA5 naming is fixed
    metar_variables = [ERA5_TO_METAR_NAMES[v] for v in variables]
    super().__init__(
        path=path,
        partitioned_by=partitioned_by,
        time_dim=time_dim,
        variables=list(variables),
        coordinate_variables=METAR_COORDINATE_VARIABLES,
        observation_dim='stationName',
        rename_variables=METAR_TO_ERA5_NAMES,
        preprocessing_fn=lambda df: _metar_clean(
            df, metar_variables, preprocessing_fn),
        **kwargs,
    )
