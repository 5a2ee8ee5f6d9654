"""Deterministic statistics and metrics.

Reference semantics: ``weatherbenchX/metrics/deterministic.py:30-425``.
All statistics are pure jnp elementwise functions; XLA fuses them into the
aggregation contraction so errors/squares are never materialized in HBM.
"""

from typing import Hashable, Mapping, Sequence, Union

import numpy as np

from weatherbenchx_tpu import darray
from weatherbenchx_tpu import tree
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import base


### Statistics


class RelativeIntensity(base.PerVariableStatistic):
  """|ratio of spatial-mean prediction to spatial-mean target - 1|.

  Mask-aware spatial mean with epsilon regularization
  (reference ``deterministic.py:30-88``, eps=1e-6). Intended for
  non-negative fields such as precipitation.
  """

  def __init__(self, spatial_dims: Sequence[str] = ('latitude', 'longitude')):
    self._spatial_dims = tuple(spatial_dims)

  def _compute_per_variable(
      self, predictions: DimArray, targets: DimArray) -> DimArray:
    spatial_dims = self._spatial_dims
    epsilon = 1e-6
    if targets.has_coord('mask'):
      mask = DimArray(
          targets.coords['mask'].values, targets.coords['mask'].dims) == 1
      count = mask.astype(predictions.dtype).broadcast_like(
          targets).sum(spatial_dims)
      prediction_sum = predictions.where(mask, 0).sum(spatial_dims)
      target_sum = targets.where(mask, 0).sum(spatial_dims)
      prediction_mean = (prediction_sum / count).where(count > 0, 0.0)
      target_mean = (target_sum / count).where(count > 0, 0.0)
      ratio = (prediction_mean + epsilon) / (target_mean + epsilon)
      result = abs(ratio - 1)
      result = result.assign_coords(
          mask=Coord(count.dims, (count > 0).astype(int).data))
      return result
    prediction_mean = predictions.mean(spatial_dims)
    target_mean = targets.mean(spatial_dims)
    ratio = (prediction_mean + epsilon) / (target_mean + epsilon)
    return abs(ratio - 1)


class Error(base.PerVariableStatistic):
  """prediction - target."""

  def _compute_per_variable(self, predictions, targets):
    return predictions - targets


class AbsoluteError(base.PerVariableStatistic):
  """|prediction - target|."""

  def _compute_per_variable(self, predictions, targets):
    return abs(predictions - targets)


class SquaredError(base.PerVariableStatistic):
  """(prediction - target)^2."""

  def _compute_per_variable(self, predictions, targets):
    return (predictions - targets) ** 2


class PredictionPassthrough(base.PerVariableStatistic):
  """Returns predictions (with targets' coords preserved)."""

  def __init__(self, copy_nans_from_targets: bool = False):
    self._copy_nans_from_targets = copy_nans_from_targets

  def _compute_per_variable(self, predictions, targets):
    result = predictions + darray.zeros_like(targets)
    if self._copy_nans_from_targets:
      result = result.where(~targets.isnull())
    return result


class TargetPassthrough(base.PerVariableStatistic):
  """Returns targets (with predictions' coords preserved)."""

  def __init__(self, copy_nans_from_predictions: bool = False):
    self._copy_nans_from_predictions = copy_nans_from_predictions

  def _compute_per_variable(self, predictions, targets):
    result = targets + darray.zeros_like(predictions)
    if self._copy_nans_from_predictions:
      result = result.where(~predictions.isnull())
    return result


class WindVectorSquaredError(base.Statistic):
  """(u_err)^2 + (v_err)^2 as a new vector-named variable.

  Reference ``deterministic.py:174-219``.
  """

  def __init__(self, u_name: Sequence[str], v_name: Sequence[str],
               vector_name: Sequence[str]):
    self._u_name = list(u_name)
    self._v_name = list(v_name)
    self._vector_name = list(vector_name)
    if not len(self._u_name) == len(self._v_name) == len(self._vector_name):
      raise ValueError(
          'u_name, v_name, and vector_name must have the same length')

  @property
  def unique_name(self) -> str:
    return 'WindVectorSquaredError_' + '_'.join(self._vector_name)

  def compute(self, predictions, targets):
    out = {}
    for u, v, vector in zip(self._u_name, self._v_name, self._vector_name):
      se = (predictions[u] - targets[u]) ** 2 + (
          predictions[v] - targets[v]) ** 2
      out[vector] = se
    return out


class SquaredPredictionAnomaly(base.PerVariableStatisticWithClimatology):
  """(prediction - climatology)^2."""

  def _compute_per_variable_with_aligned_climatology(
      self, predictions, targets, aligned_climatology):
    return (predictions - aligned_climatology) ** 2


class SquaredTargetAnomaly(base.PerVariableStatisticWithClimatology):
  """(target - climatology)^2."""

  def _compute_per_variable_with_aligned_climatology(
      self, predictions, targets, aligned_climatology):
    return (targets - aligned_climatology) ** 2


class AnomalyCovariance(base.PerVariableStatisticWithClimatology):
  """(prediction - climatology) * (target - climatology)."""

  def _compute_per_variable_with_aligned_climatology(
      self, predictions, targets, aligned_climatology):
    return (predictions - aligned_climatology) * (
        targets - aligned_climatology)


class ErrorExceedance(base.PerVariableStatistic):
  """Indicator of |error| exceeding thresholds (NaN-preserving).

  Reference ``deterministic.py:262-295``; thresholds become a new
  ``error_exceedance_thresholds`` dim.
  """

  def __init__(self, thresholds: Sequence[float] | DimArray):
    if not isinstance(thresholds, DimArray):
      # Stored at float64 so the comparison constants can be rounded
      # DIRECTIONALLY to the data dtype at compute time (round-to-nearest
      # f32 can tie an f32-lattice |error| that float64 puts strictly on
      # one side — see darray.comparison_safe_threshold).
      t = np.asarray(thresholds, dtype=np.float64)
      thresholds = DimArray(
          t, ('error_exceedance_thresholds',),
          {'error_exceedance_thresholds': t})
    self._thresholds = thresholds

  def _compute_per_variable(self, predictions, targets):
    abs_error = abs(predictions - targets)
    thresholds = self._thresholds
    thresholds_cmp = darray.comparison_safe_threshold(
        thresholds, abs_error.dtype, '>')
    out = (abs_error > thresholds_cmp).astype(predictions.dtype)
    out = out.where(~abs_error.isnull())
    out = out.where(~thresholds.isnull())
    return out


### Metrics

# Metrics that are just the mean of a Statistic: use the Statistic directly.
Bias = Error
MAE = AbsoluteError
MSE = SquaredError
PredictionAverage = PredictionPassthrough
TargetAverage = TargetPassthrough


class RMSE(base.PerVariableMetric):
  """Root mean squared error."""

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {'SquaredError': SquaredError()}

  def _values_from_mean_statistics_per_variable(self, statistic_values):
    return darray.sqrt(statistic_values['SquaredError'])


class WindVectorRMSE(base.Metric):
  """sqrt of mean wind-vector squared error (reference :327-371)."""

  def __init__(self, u_name: Union[str, list], v_name: Union[str, list],
               vector_name: Union[str, list]):
    self._u_name = [u_name] if isinstance(u_name, str) else list(u_name)
    self._v_name = [v_name] if isinstance(v_name, str) else list(v_name)
    self._vector_name = ([vector_name] if isinstance(vector_name, str)
                         else list(vector_name))
    if not len(self._u_name) == len(self._v_name) == len(self._vector_name):
      raise ValueError(
          'u_name, v_name, and vector_name must have the same length')

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {'WindVectorSquaredError': WindVectorSquaredError(
        self._u_name, self._v_name, self._vector_name)}

  def values_from_mean_statistics(self, statistic_values):
    return tree.map_structure(
        darray.sqrt, dict(statistic_values['WindVectorSquaredError']))


class ACC(base.PerVariableMetric):
  """Anomaly correlation coefficient (reference :374-400)."""

  def __init__(self, climatology: Mapping[Hashable, DimArray]):
    self._climatology = climatology

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {
        'SquaredPredictionAnomaly': SquaredPredictionAnomaly(
            climatology=self._climatology),
        'SquaredTargetAnomaly': SquaredTargetAnomaly(
            climatology=self._climatology),
        'AnomalyCovariance': AnomalyCovariance(climatology=self._climatology),
    }

  def _values_from_mean_statistics_per_variable(self, statistic_values):
    return statistic_values['AnomalyCovariance'] / (
        darray.sqrt(statistic_values['SquaredPredictionAnomaly'])
        * darray.sqrt(statistic_values['SquaredTargetAnomaly']))


class PredictionActivity(base.PerVariableMetric):
  """Std dev of prediction anomalies (reference :403-425)."""

  def __init__(self, climatology: Mapping[Hashable, DimArray]):
    self._climatology = climatology

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {'SquaredPredictionAnomaly': SquaredPredictionAnomaly(
        climatology=self._climatology)}

  def _values_from_mean_statistics_per_variable(self, statistic_values):
    return darray.sqrt(statistic_values['SquaredPredictionAnomaly'])
