"""Spatial verification metrics: Fractions Skill Score (FSS).

Reference semantics: ``weatherbenchX/metrics/spatial.py:24-244``. The
neighborhood averaging runs as a batched cumsum-difference kernel
(``ops/conv.py``) over all leading dims at once instead of a per-grid scipy
loop.
"""

import dataclasses
from typing import Iterable, Mapping, Union

import jax.numpy as jnp
import numpy as np

from weatherbenchx_tpu import darray
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import base
from weatherbenchx_tpu.ops import conv


def neighborhood_averaging_for_single_size(
    da: DimArray, neighborhood_size: int, wrap_longitude: bool = False
) -> DimArray:
  """Neighborhood average over (latitude, longitude) for one size."""
  order = [d for d in da.dims if d not in ('latitude', 'longitude')]
  order += ['latitude', 'longitude']
  dat = da.transpose(*order) if tuple(order) != da.dims else da
  out_data = conv.convolve2d_wrap_longitude(
      jnp.asarray(dat.data), neighborhood_size, wrap_longitude)
  out = DimArray(out_data, dat.dims, dat.coords)
  if da.has_coord('mask'):
    mask_c = da.coords['mask']
    mask_da = DimArray(mask_c.values, mask_c.dims,
                       {d: da.coords[d] for d in mask_c.dims
                        if d in da.coords})
    new_mask = neighborhood_averaging(
        mask_da.drop_coords('mask') if mask_da.has_coord('mask') else mask_da,
        neighborhood_size, wrap_longitude)
    # isclose against 1 (conv rounding), reference ``spatial.py:70-78``.
    nm = jnp.isclose(jnp.asarray(new_mask.data), 1.0)
    out = out.assign_coords(mask=Coord(new_mask.dims, nm))
  return out


def neighborhood_averaging(
    da: DimArray,
    neighborhood_size: Union[int, Iterable[int]],
    wrap_longitude: bool = False,
) -> DimArray:
  """Neighborhood averaging, optionally over several sizes (new dim)."""
  if isinstance(neighborhood_size, Iterable):
    sizes = list(neighborhood_size)
    out = darray.concat(
        [neighborhood_averaging_for_single_size(da, n, wrap_longitude)
         for n in sizes], 'neighborhood_size')
    return out.assign_coords(neighborhood_size=Coord(
        ('neighborhood_size',), np.asarray(sizes)))
  return neighborhood_averaging_for_single_size(
      da, neighborhood_size, wrap_longitude)


def get_suffix(neighborhood_size, wrap_longitude: bool = False) -> str:
  if isinstance(neighborhood_size, Iterable):
    suffix = ','.join([str(t) for t in neighborhood_size])
  else:
    suffix = str(neighborhood_size)
  if wrap_longitude:
    suffix += '_wrap_longitude'
  return suffix


@dataclasses.dataclass
class SquaredFractionsError(base.PerVariableStatistic):
  """Numerator of the FSS."""

  neighborhood_size_in_pixels: Union[int, Iterable[int]]
  wrap_longitude: bool = False

  @property
  def unique_name(self) -> str:
    suffix = get_suffix(self.neighborhood_size_in_pixels, self.wrap_longitude)
    return f'SquaredFractionsError_{suffix}'

  def _compute_per_variable(self, predictions, targets):
    predictions = neighborhood_averaging(
        predictions, self.neighborhood_size_in_pixels, self.wrap_longitude)
    targets = neighborhood_averaging(
        targets, self.neighborhood_size_in_pixels, self.wrap_longitude)
    return (predictions - targets) ** 2


@dataclasses.dataclass
class SquaredPredictionFraction(base.PerVariableStatistic):
  """One part of the FSS denominator."""

  neighborhood_size_in_pixels: Union[int, Iterable[int]]
  wrap_longitude: bool = False

  @property
  def unique_name(self) -> str:
    suffix = get_suffix(self.neighborhood_size_in_pixels, self.wrap_longitude)
    return f'SquaredPredictionFraction_{suffix}'

  def _compute_per_variable(self, predictions, targets):
    predictions = neighborhood_averaging(
        predictions, self.neighborhood_size_in_pixels, self.wrap_longitude)
    return predictions ** 2 + darray.zeros_like(targets)


@dataclasses.dataclass
class SquaredTargetFraction(base.PerVariableStatistic):
  """One part of the FSS denominator."""

  neighborhood_size_in_pixels: Union[int, Iterable[int]]
  wrap_longitude: bool = False

  @property
  def unique_name(self) -> str:
    suffix = get_suffix(self.neighborhood_size_in_pixels, self.wrap_longitude)
    return f'SquaredTargetFraction_{suffix}'

  def _compute_per_variable(self, predictions, targets):
    targets = neighborhood_averaging(
        targets, self.neighborhood_size_in_pixels, self.wrap_longitude)
    return targets ** 2 + darray.zeros_like(predictions)


@dataclasses.dataclass
class FSS(base.PerVariableMetric):
  """Fractions Skill Score over one or several square pixel neighborhoods.

  Inputs must already be binary (Roberts & Lean 2008); reference
  ``spatial.py:188-244``.
  """

  neighborhood_size_in_pixels: Union[int, Iterable[int]]
  wrap_longitude: bool = False

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {
        'SquaredFractionsError': SquaredFractionsError(
            self.neighborhood_size_in_pixels, self.wrap_longitude),
        'SquaredPredictionFraction': SquaredPredictionFraction(
            self.neighborhood_size_in_pixels, self.wrap_longitude),
        'SquaredTargetFraction': SquaredTargetFraction(
            self.neighborhood_size_in_pixels, self.wrap_longitude),
    }

  def _values_from_mean_statistics_per_variable(self, s):
    return 1 - (s['SquaredFractionsError']
                / (s['SquaredPredictionFraction']
                   + s['SquaredTargetFraction']))
