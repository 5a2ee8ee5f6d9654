"""Sparse (station/satellite) observation loaders from partitioned Parquet.

Reference semantics: ``weatherbenchX/data_loaders/sparse_parquet.py:27-524``.
Chunks come back as dict[var, DimArray] over an ``index`` dim with
latitude/longitude/elevation/station/valid_time (+ init_time/lead_time)
coordinates — ready for grid→sparse interpolation against them.
"""

import functools
import os
from typing import Callable, Hashable, Mapping, Optional, Sequence, Union

import numpy as np

from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.data import base


def get_parquet_files_subset(
    path: str,
    time_start: np.datetime64,
    time_end: np.datetime64,
    partition_by: str,
) -> list[str]:
  """Hive-partition filenames covering [time_start, time_end]."""
  unit = {'month': 'M', 'day': 'D', 'hour': 'h'}.get(partition_by)
  if unit is None:
    raise NotImplementedError(f'{partition_by} not implemented.')
  time_start = np.datetime64(time_start, unit)
  time_end = np.datetime64(time_end, unit)
  td = np.timedelta64(1, unit)
  times = np.arange(time_start, time_end + td, td)
  return [parquet_filename_for_time(path, t, unit) for t in times]


def parquet_filename_for_time(path: str, time: np.datetime64,
                              unit: str) -> str:
  """Partition filename for a given time (reference ``:53-69``)."""
  t = time.item()
  year, month = t.year, t.month
  if unit == 'M':
    fn = f'year={year}/month={month}/{year}-{str(month).zfill(2)}.parquet'
  elif unit == 'D':
    day = t.day
    fn = (f'year={year}/month={month}/day={day}/'
          f'{year}-{str(month).zfill(2)}-{str(day).zfill(2)}.parquet')
  elif unit == 'h':
    day, hour = t.day, t.hour
    fn = (f'year={year}/month={month}/day={day}/hour={hour}/'
          f'{year}-{str(month).zfill(2)}-{str(day).zfill(2)}'
          f'T{str(hour).zfill(2)}.parquet')
  else:
    raise NotImplementedError
  return os.path.join(path, fn)


class SparseObservationsFromParquet(base.DataLoader):
  """General sparse observations from hive-partitioned Parquet.

  Assumes year=/month=[/day=[/hour=]] partitioning with no missing files
  (reference ``sparse_parquet.py:72-191``).
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
      **kwargs,
  ):
    super().__init__(compute=False, **kwargs)
    self._path = path
    if partitioned_by not in ['hour', 'day', 'month']:
      raise ValueError(f'Unsupported partitioned_by: {partitioned_by}')
    self._partitioned_by = partitioned_by
    self._time_dim = time_dim
    self._variables = list(variables)
    self._coordinate_variables = list(coordinate_variables) + ['valid_time']
    self._split_variables = split_variables
    self._dropna = dropna
    if tolerance is not None:
      if isinstance(tolerance, np.timedelta64):
        tolerance = (-tolerance, tolerance)
      if len(tolerance) != 2:
        raise ValueError(
            'Tolerance must be a single np.timedelta64 or a 2-tuple.')
      if (tolerance[1] - tolerance[0]) <= np.timedelta64(0, 'h'):
        raise ValueError(
            'Tolerance range should be non-empty. This will always return '
            'an empty array.')
    self._tolerance = tolerance
    self._rename_variables = rename_variables
    self._include_slice_end_time = include_slice_end_time
    self._remove_duplicates = remove_duplicates
    self._pick_closest_duplicate_by = pick_closest_duplicate_by
    if remove_duplicates and observation_dim is None:
      raise ValueError(
          'observation_dim must be specified if remove_duplicates is True.')
    self._observation_dim = observation_dim
    self._file_tolerance = file_tolerance
    self._preprocessing_fn = preprocessing_fn

  def _pick_closest_from_duplicates(self, df, valid_time):
    import pandas as pd  # noqa: F401

    if self._pick_closest_duplicate_by is not None:
      df = df.copy()
      df['time_diff'] = np.abs(
          df[self._pick_closest_duplicate_by] - valid_time)
      df = df.sort_values('time_diff', ascending=True)
    return df[~df[self._observation_dim].duplicated(keep='first')]

  def _load_data_for_single_time(self, valid_time, lead_time_slice=None):
    import pandas as pd
    import pyarrow

    if self._tolerance is None:
      if lead_time_slice is None:
        start_time, stop_time = valid_time, None
      else:
        start_time = valid_time - lead_time_slice.start
        stop_time = valid_time + lead_time_slice.stop
    else:
      start_time = valid_time + self._tolerance[0]
      stop_time = valid_time + self._tolerance[1]

    if stop_time is None:
      file_start = start_time - self._file_tolerance
      file_stop = start_time + self._file_tolerance
      filters = [(self._time_dim, '=', pd.Timestamp(start_time))]
    else:
      file_start = start_time - self._file_tolerance
      file_stop = stop_time + self._file_tolerance
      op_end = '<=' if self._include_slice_end_time else '<'
      filters = [
          (self._time_dim, '>=', pd.Timestamp(start_time)),
          (self._time_dim, op_end, pd.Timestamp(stop_time)),
      ]
    files = get_parquet_files_subset(
        self._path, file_start, file_stop, self._partitioned_by)

    def _read_single_file(fn):
      try:
        return pd.read_parquet(fn, filters=filters)
      except pyarrow.lib.ArrowTypeError:
        df = pd.read_parquet(fn)
        assert len(df) == 0, 'This should only happen if the file is empty.'
        return df

    df = pd.concat([_read_single_file(fn) for fn in files],
                   ignore_index=True)
    if self._preprocessing_fn is not None:
      df = self._preprocessing_fn(df)
    if self._remove_duplicates:
      assert lead_time_slice is None, (
          'Removing duplicates not compatible with slice lead_time.')
      df = self._pick_closest_from_duplicates(df, valid_time)
    if self._rename_variables is not None:
      df = df.rename(columns=self._rename_variables)
    df = df.rename(columns={self._time_dim: 'valid_time'})
    return df.loc[:, self._variables + self._coordinate_variables]

  def _load_chunk_from_source(self, init_times, lead_times=None):
    import pandas as pd

    dfs = []
    if not isinstance(lead_times, slice):
      for init_time in init_times:
        if lead_times is None:
          dfs.append(self._load_data_for_single_time(init_time))
        else:
          for lead_time in lead_times:
            valid_time = init_time + lead_time
            df = self._load_data_for_single_time(valid_time)
            df = df.copy()
            df['init_time'] = init_time
            df['lead_time'] = lead_time
            dfs.append(df)
    else:
      assert self._tolerance is None, (
          'Tolerance not compatible with lead_time slice.')
      for init_time in init_times:
        df = self._load_data_for_single_time(
            init_time, lead_time_slice=lead_times)
        df = df.copy()
        df['init_time'] = init_time
        df['lead_time'] = df.valid_time - df.init_time
        dfs.append(df)

    combined = pd.concat(dfs, ignore_index=True)
    time_coords = [] if lead_times is None else ['init_time', 'lead_time']
    coord_names = self._coordinate_variables + time_coords

    def column_to_array(col) -> np.ndarray:
      values = combined[col].to_numpy()
      if values.dtype == object:
        values = values.astype(str)
      return values

    coords = {
        name: Coord(('index',), column_to_array(name))
        for name in coord_names
    }
    coords['index'] = Coord(('index',), np.arange(len(combined)))

    out: dict[str, DimArray] = {}
    for var in self._variables:
      out[var] = DimArray(
          combined[var].to_numpy(), ('index',), coords)

    if self._dropna:
      if self._split_variables:
        for v, da in out.items():
          keep = np.nonzero(~np.isnan(np.asarray(da.values)))[0]
          out[v] = da.isel(index=keep)
      else:
        all_finite = np.ones(len(combined), bool)
        for da in out.values():
          all_finite &= ~np.isnan(np.asarray(da.values))
        keep = np.nonzero(all_finite)[0]
        out = {v: da.isel(index=keep) for v, da in out.items()}
    return out


# METAR constants (reference ``sparse_parquet.py:362-409``)
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


def set_bad_quality_to_nan(df, variables, qc_suffix, bad_quality_flags):
  for variable in variables:
    df[variable] = df[variable].where(
        ~np.isin(df[variable + qc_suffix], bad_quality_flags), np.nan)
  return df


def convert_longitude_to_0_to_360(df, longitude_dim: str = 'longitude'):
  df[longitude_dim] = np.mod(df[longitude_dim], 360)
  return df


class METARFromParquet(SparseObservationsFromParquet):
  """METAR observations with QC-flag NaNing and standard renames.

  Reference ``sparse_parquet.py:411-524``: bad-quality flags → NaN,
  longitude to [0, 360), elevation fill values (9999) → NaN.
  """

  def __init__(
      self,
      path: str,
      variables: Sequence[str],
      time_dim: str,
      split_variables: bool = False,
      dropna: bool = False,
      tolerance: Optional[np.timedelta64] = None,
      partitioned_by: str = 'month',
      rename_variables: Optional[Mapping[str, str]] = None,
      include_slice_end_time: bool = False,
      remove_duplicates: bool = False,
      pick_closest_duplicate_by: Optional[str] = None,
      file_tolerance: np.timedelta64 = np.timedelta64(1, 'h'),
      preprocessing_fn: Optional[Callable] = None,
      **kwargs,
  ):
    del rename_variables  # METAR names are fixed.

    def metar_preprocessing_fn(df, preprocessing_fn=None):
      if preprocessing_fn is not None:
        df = preprocessing_fn(df)
      df = set_bad_quality_to_nan(
          df,
          [ERA5_TO_METAR_NAMES[v] for v in variables],
          METAR_QC_SUFFIX, METAR_BAD_QUALITY_FLAGS)
      df = convert_longitude_to_0_to_360(df)
      df['elevation'] = df['elevation'].where(
          df['elevation'] < 9.999e03, np.nan)
      return df

    super().__init__(
        path=path,
        variables=list(variables),
        time_dim=time_dim,
        coordinate_variables=METAR_COORDINATE_VARIABLES,
        observation_dim='stationName',
        split_variables=split_variables,
        dropna=dropna,
        tolerance=tolerance,
        partitioned_by=partitioned_by,
        rename_variables=METAR_TO_ERA5_NAMES,
        include_slice_end_time=include_slice_end_time,
        remove_duplicates=remove_duplicates,
        pick_closest_duplicate_by=pick_closest_duplicate_by,
        file_tolerance=file_tolerance,
        preprocessing_fn=functools.partial(
            metar_preprocessing_fn, preprocessing_fn=preprocessing_fn),
        **kwargs,
    )
