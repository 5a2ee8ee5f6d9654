"""Base data loader.

Reference semantics: ``weatherbenchX/data_loaders/base.py:25-163``. Loaders
return chunks as ``dict[var, DimArray]`` with canonical dims
(init_time/lead_time/valid_time/latitude/longitude[/number]). The load
pipeline per chunk: source load → process_chunk_fn → interpolation against a
reference chunk → optional NaN mask coord → optional values-as-coord.

TPU note: the NaN ``mask`` coord is attached as a DEVICE coordinate so it
traces straight into the jitted aggregation (masked values are zeroed in
one fused op; see ``aggregation.Aggregator.aggregate_stat_var``).
"""

import abc
from typing import Callable, Collection, Hashable, Mapping, Optional, Union

import numpy as np

from weatherbenchx_tpu import tree
from weatherbenchx_tpu.darray import Coord, DimArray


def add_nan_mask_to_data(
    data: Mapping[Hashable, DimArray],
    variable_subset: Collection[str] | None = None,
) -> dict[Hashable, DimArray]:
  """Adds a boolean 'mask' coord to each variable, False marking NaNs.

  Preferred over skipna so unexpected NaNs still propagate loudly
  (reference ``data_loaders/base.py:25-56``).
  """
  out = dict(data)
  for var in out:
    if variable_subset is None or var in variable_subset:
      da = out[var]
      mask = ~np.isnan(np.asarray(da.values))
      out[var] = da.assign_coords(mask=Coord(da.dims, mask))
  return out


class DataLoader(abc.ABC):
  """Base class for data loaders.

  Loaders return prediction/target chunks that broadcast against each other;
  when mapping one dataset onto another (e.g. grid → sparse points), the
  other chunk is passed as ``reference`` for interpolation.
  """

  def __init__(
      self,
      interpolation=None,
      compute: bool = True,
      add_nan_mask: bool = False,
      process_chunk_fn: Optional[Callable[
          [Mapping[Hashable, DimArray]], Mapping[Hashable, DimArray]]] = None,
      add_values_to_coords: bool = False,
  ):
    self._interpolation = interpolation
    self._compute = compute
    self._add_nan_mask = add_nan_mask
    self._process_chunk_fn = process_chunk_fn
    self._add_values_to_coords = add_values_to_coords

  @abc.abstractmethod
  def _load_chunk_from_source(
      self,
      init_times: np.ndarray,
      lead_times: Optional[Union[np.ndarray, slice]] = None,
  ) -> Mapping[Hashable, DimArray]:
    """Loader-specific source read."""

  def load_chunk(
      self,
      init_times: np.ndarray,
      lead_times: Optional[Union[np.ndarray, slice]] = None,
      reference: Optional[Mapping[Hashable, DimArray]] = None,
  ) -> Mapping[Hashable, DimArray]:
    """Shared chunk-loading pipeline (reference ``base.py:111-163``)."""
    chunk = self._load_chunk_from_source(init_times, lead_times)

    if self._process_chunk_fn is not None:
      chunk = self._process_chunk_fn(chunk)

    if self._interpolation is not None:
      chunk = self._interpolation.interpolate(chunk, reference)

    if self._compute:
      # Materialize any lazy views into contiguous host arrays,
      # preserving dtype.
      def _compute_one(da: DimArray) -> DimArray:
        d = da.data
        if isinstance(d, np.ndarray) and not d.flags.c_contiguous:
          return da.copy(data=np.ascontiguousarray(d))
        return da
      chunk = tree.map_structure(_compute_one, chunk)

    if self._add_nan_mask:
      chunk = add_nan_mask_to_data(chunk)

    if self._add_values_to_coords:
      chunk = tree.map_structure(
          lambda da: da.assign_coords(
              values_as_coord=Coord(da.dims, np.asarray(da.values))), chunk)

    return chunk
