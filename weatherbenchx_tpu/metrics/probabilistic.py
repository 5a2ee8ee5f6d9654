"""Probabilistic (ensemble) statistics and metrics.

Reference semantics: ``weatherbenchX/metrics/probabilistic.py:28-1220``.
TPU notes:

* On TPU, the CRPS spread E|X − X'| defaults to a Pallas pairwise kernel
  (``ops/crps_pairwise.py``) that holds the ensemble block in VMEM and does
  ⌈(M−1)/2⌉ rolled absolute-difference passes — measured ~3× faster than
  the jnp.sort PWM path at M=50 (set ``WBX_NO_PALLAS=1`` to disable). Both
  ``use_sort`` settings route through it when eligible; the flag then only
  selects the fallback algorithm.
* Off-TPU, use_sort=True is the O(M log M) Zamo & Naveau PWM form via one
  ``jnp.sort`` (reference ``run_benchmark_evaluation.py:342`` production
  config), and use_sort=False the O(M²) broadcast form; XLA fuses the
  |Xi - Xj| reduction so the M×M intermediate is tiled, not materialized.
* Wasserstein distance is a fully-vectorized jnp implementation (sorted
  CDF-difference integral), replacing the reference's per-point scipy
  vectorize loop (``probabilistic.py:662-710``).
"""

import os
from typing import Hashable, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weatherbenchx_tpu.ops import crps_pairwise

from weatherbenchx_tpu import darray
from weatherbenchx_tpu import tree
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import base
from weatherbenchx_tpu.metrics import categorical
from weatherbenchx_tpu.metrics import deterministic
from weatherbenchx_tpu.metrics import wrappers
ENSEMBLE_DIM = 'number'


### Statistics


class EnsembleAveragedStatistic(base.Statistic):
  """Averages a wrapped statistic over the ensemble dimension."""

  def __init__(self, wrapped_statistic: base.Statistic, *,
               ensemble_dim: str, skipna_ensemble: bool):
    self._wrapped_statistic = wrapped_statistic
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def unique_name(self) -> str:
    # The reference omits skipna_ensemble (``probabilistic.py:50-52``),
    # silently deduplicating skipna and non-skipna variants; appending it
    # only when non-default keeps name parity for reference-written states.
    name = self._wrapped_statistic.unique_name + '_each_' + self._ensemble_dim
    if self._skipna_ensemble:
      name += '_skipna_ensemble'
    return name

  def prepare_chunk(self, predictions, targets):
    return self._wrapped_statistic.prepare_chunk(predictions, targets)

  def compute(self, predictions, targets):
    statistics = self._wrapped_statistic.compute(predictions, targets)

    def reduce_over_ensemble(da: DimArray) -> DimArray:
      if self._ensemble_dim not in da.dims:
        raise ValueError(
            f'Dimension {self._ensemble_dim} not found in {da.dims}')
      return da.mean(self._ensemble_dim, skipna=self._skipna_ensemble)

    return tree.map_structure(reduce_over_ensemble, dict(statistics))


class EnsembleAveragedMetric(base.Metric):
  """Wraps a metric to average its statistics over the ensemble dim."""

  def __init__(self, wrapped_metric: base.Metric, *,
               ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._wrapped_metric = wrapped_metric
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {
        name: EnsembleAveragedStatistic(
            wrapped_statistic=stat, ensemble_dim=self._ensemble_dim,
            skipna_ensemble=self._skipna_ensemble)
        for name, stat in self._wrapped_metric.statistics.items()}

  def values_from_mean_statistics(self, statistic_values):
    return self._wrapped_metric.values_from_mean_statistics(statistic_values)


class CRPSSkill(base.PerVariableStatistic):
  """The skill measure associated with CRPS, E|X - Y|.

  Handles ensemble targets via a pseudo ensemble dim (O(N·M) pairwise;
  reference ``probabilistic.py:116-145``).
  """

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def unique_name(self) -> str:
    # skipna_ensemble appended only when non-default: the reference omits it
    # entirely (``probabilistic.py:128-130``), colliding the two variants.
    name = f'CRPSSkill_{self._ensemble_dim}'
    if self._skipna_ensemble:
      name += '_skipna_ensemble'
    return name

  def _compute_per_variable(self, predictions, targets):
    if not self._skipna_ensemble and self._ensemble_dim not in targets.dims:
      fused = _fused_ensemble_pass(predictions, targets, self._ensemble_dim)
      if fused is not None:
        return fused['skill_sum'] / fused['m']
    reduce_dims = [self._ensemble_dim]
    if self._ensemble_dim in targets.dims:
      kernel_result = self._maybe_cross_kernel(predictions, targets)
      if kernel_result is not None:
        return kernel_result
      pseudo = f'{self._ensemble_dim}_PSEUDO_FOR_TARGETS'
      reduce_dims.append(pseudo)
      targets = targets.rename({self._ensemble_dim: pseudo})
    return abs(predictions - targets).mean(
        tuple(reduce_dims), skipna=self._skipna_ensemble)

  def _maybe_cross_kernel(self, predictions, targets):
    """Two-ensemble E|X−Y| via the Pallas cross kernel (TPU fast path).

    The jnp fallback broadcasts an (Mx, My, *rest) intermediate; the
    kernel accumulates it in VMEM instead. Requires identical non-ensemble
    dims/sizes and skipna off (NaN propagation matches skipna=False).
    """
    ens = self._ensemble_dim
    interpret = os.environ.get('WBX_PALLAS_INTERPRET', '0') == '1'
    if self._skipna_ensemble or os.environ.get('WBX_NO_PALLAS', '0') == '1':
      return None
    mx, my = predictions.sizes[ens], targets.sizes[ens]
    if not (interpret
            or crps_pairwise.cross_supported(mx, my, predictions.dtype)):
      return None
    rest = [d for d in predictions.dims if d != ens]
    if (sorted(d for d in targets.dims if d != ens) != sorted(rest)
        or any(targets.sizes[d] != predictions.sizes[d] for d in rest)
        or predictions.dtype != targets.dtype):
      return None
    p_t = predictions.transpose(ens, *rest)
    t_t = targets.transpose(ens, *rest)
    total = crps_pairwise.pairwise_cross_sum(
        jnp.asarray(p_t.data), jnp.asarray(t_t.data), interpret=interpret)
    # Merge coords from BOTH operands, like the broadcast fallback's
    # arithmetic would (a targets-side ``mask`` coord must survive for
    # masked aggregation).
    coords = darray._merge_coords(tuple(rest), predictions.coords,
                                  targets.coords)
    return DimArray(total / (mx * my), tuple(rest), coords)


def _fused_ensemble_pass(predictions, targets, ensemble_dim):
  """Shared fused-kernel results for this compute pass, or None.

  One Pallas pass over the VMEM-resident ensemble block yields CRPS
  spread, CRPS skill, the ensemble mean, and Σ(x−mean)² together
  (``ops/crps_pairwise.fused_ensemble_stats``) — sibling statistics
  (CRPSSkill/CRPSSpread/UnbiasedEnsembleMeanSquaredError/
  EnsembleVariance) computed in the same pass then share it via
  ``base.computation_cache`` instead of re-reading the ~830 MB
  production ensemble from HBM for a second skill/moments sweep.
  Deterministic-target case only; the memo holds tracers, so it only
  activates inside a compute pass (cache is None otherwise — each
  statistic falls back to its standalone path).
  """
  cache = base.get_computation_cache()
  if cache is None:
    return None
  if os.environ.get('WBX_NO_PALLAS', '0') == '1':
    return None
  interpret = os.environ.get('WBX_PALLAS_INTERPRET', '0') == '1'
  if ensemble_dim not in predictions.dims or ensemble_dim in targets.dims:
    return None
  m = int(predictions.sizes[ensemble_dim])
  rest = [d for d in predictions.dims if d != ensemble_dim]
  if (sorted(str(d) for d in targets.dims) != sorted(str(d) for d in rest)
      or any(targets.sizes[d] != predictions.sizes[d] for d in rest)
      or predictions.dtype != targets.dtype):
    return None
  if not (interpret or crps_pairwise.fused_supported(
      m, len(rest), predictions.dtype)) or len(rest) < 2 or m < 2:
    return None
  key = ('fused_ens_stats', ensemble_dim,
         id(predictions.data), id(targets.data))
  hit = cache.get(key)
  if hit is not None:
    return hit
  pin = (predictions.data, targets.data)  # see below
  order = [ensemble_dim] + rest
  x = jnp.asarray(predictions.transpose(*order).data)
  y = jnp.asarray(targets.transpose(*rest).data)
  spread, skill, mean, sqdev = crps_pairwise.fused_ensemble_stats(
      x, y, interpret=interpret)
  out_dims = tuple(rest)
  p_coords = {k: c for k, c in predictions.coords.items()
              if set(c.dims).issubset(out_dims)}
  both_coords = darray._merge_coords(out_dims, predictions.coords,
                                     targets.coords)
  out = {
      'm': m,
      'spread_sum': DimArray(spread, out_dims, p_coords),
      'skill_sum': DimArray(skill, out_dims, both_coords),
      'mean': DimArray(mean, out_dims, p_coords),
      'sq_dev_sum': DimArray(sqdev, out_dims, p_coords),
      # Pin the keyed inputs: the key is id()-based, and in EAGER passes
      # wrapper transforms build fresh same-shape arrays per statistic —
      # once freed, CPython reuses the id and a later statistic with
      # different data would get a false hit. Holding a reference keeps
      # the ids live for the lifetime of the entry.
      '_pin': pin,
  }
  cache[key] = out
  return out


class CRPSSpread(base.PerVariableStatistic):
  """Sample estimate of the CRPS spread term E|X - X'|.

  use_sort=True: the O(M log M) Zamo & Naveau PWM rank form
  (``probabilistic.py:214-240``); otherwise the O(M²) pairwise form.
  """

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               use_sort: bool = False, fair: bool = True,
               which: str = 'predictions', skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._use_sort = use_sort
    self._which = which
    self._fair = fair
    self._skipna_ensemble = skipna_ensemble

  @property
  def unique_name(self) -> str:
    # skipna_ensemble appended only when non-default (reference omits it,
    # ``probabilistic.py:180-183``, colliding the two variants).
    fair_str = 'fair' if self._fair else 'unfair'
    name = f'CRPSSpread_{self._ensemble_dim}_{fair_str}_{self._which}'
    if self._skipna_ensemble:
      name += '_skipna_ensemble'
    return name

  def _dedup_identity(self):
    # use_sort selects the algorithm (pairwise vs PWM), not the value, so
    # both settings legitimately share a unique_name.
    return {k: v for k, v in vars(self).items() if k != '_use_sort'}

  def _compute_per_variable(self, predictions, targets):
    if self._which == 'predictions':
      da = predictions
    elif self._which == 'targets':
      da = targets
    else:
      raise ValueError(f'Unhandled which={self._which!r}')

    if self._skipna_ensemble:
      n_ensemble = da.count(self._ensemble_dim)
    else:
      n_ensemble = da.sizes[self._ensemble_dim]
      if n_ensemble < 2:
        raise ValueError('Cannot estimate CRPS spread with n_ensemble < 2.')

    if self._which == 'predictions' and not self._skipna_ensemble:
      fused = _fused_ensemble_pass(predictions, targets, self._ensemble_dim)
      if fused is not None:
        m = fused['m']
        return fused['spread_sum'] / (m * (m - int(self._fair)))

    # WBX_PALLAS_INTERPRET=1 runs the kernel via the Pallas interpreter on
    # any backend — CI exercises this exact selection path on CPU.
    interpret = os.environ.get('WBX_PALLAS_INTERPRET', '0') == '1'
    if (not self._skipna_ensemble
        and os.environ.get('WBX_NO_PALLAS', '0') != '1'
        and (interpret
             or crps_pairwise.supported(int(n_ensemble), da.dtype))):
      # TPU fast path: Pallas spread kernel on a VMEM-resident ensemble
      # block — ~5× XLA's lax.sort form at M=50. The kernel itself picks
      # pair enumeration or an in-kernel bitonic/PWM sort body by M (see
      # ops/crps_pairwise.py). Numerically the same estimator to fp
      # tolerance, so both use_sort settings take it.
      m = int(n_ensemble)
      order = [self._ensemble_dim] + [
          d for d in da.dims if d != self._ensemble_dim]
      da_t = da.transpose(*order)
      axis0_first = jnp.asarray(da_t.data)
      pair_sum = crps_pairwise.spread_sum_along_axis(
          axis0_first, 0, interpret=interpret)
      out_dims = tuple(order[1:])
      coords = {k: c for k, c in da.coords.items()
                if set(c.dims).issubset(out_dims)}
      return DimArray(pair_sum / (m * (m - int(self._fair))),
                      out_dims, coords)

    if self._use_sort:
      if self._skipna_ensemble:
        raise ValueError(
            'skipna_ensemble is not supported with use_sort=True.')
      # PWM form: with X sorted ascending, λ₂-type sum is
      # Σ_i (2i - M - 1) X_(i) — the rank of a sorted element IS its
      # position (ties contribute identically), so ONE sort along the
      # minor-most axis replaces the reference's rankdata (double argsort
      # + gather), reference ``probabilistic.py:214-240``.
      order = [d for d in da.dims if d != self._ensemble_dim]
      order.append(self._ensemble_dim)
      da_t = da.transpose(*order)
      sorted_members = jnp.sort(jnp.asarray(da_t.data), axis=-1)
      m = int(n_ensemble)
      coeff = (2 * jnp.arange(1, m + 1, dtype=sorted_members.dtype)
               - m - 1)
      pwm = jnp.mean(coeff * sorted_members, axis=-1)
      out_dims = tuple(order[:-1])
      coords = {k: c for k, c in da.coords.items()
                if set(c.dims).issubset(out_dims)}
      return DimArray(2 * pwm / (m - int(self._fair)), out_dims, coords)
    else:
      second = 'ensemble_dim_2'
      da_2 = da.rename({self._ensemble_dim: second})
      return abs(da - da_2).sum(
          (self._ensemble_dim, second), skipna=self._skipna_ensemble
      ) / (n_ensemble * (n_ensemble - int(self._fair)))


class EnsembleVariance(base.PerVariableStatistic):
  """Unbiased (ddof=1) ensemble variance."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def unique_name(self) -> str:
    return (f'EnsembleVariance_{self._ensemble_dim}_skipna_ensemble_'
            f'{self._skipna_ensemble}')

  def _compute_per_variable(self, predictions, targets):
    if not self._skipna_ensemble:
      fused = _fused_ensemble_pass(predictions, targets, self._ensemble_dim)
      if fused is not None:
        return fused['sq_dev_sum'] / (fused['m'] - 1)
    return predictions.var(self._ensemble_dim, ddof=1,
                           skipna=self._skipna_ensemble)


class UnbiasedEnsembleMeanSquaredError(base.PerVariableStatistic):
  """E(X̄ - Y)² debiased by var/M (reference ``probabilistic.py:276-336``)."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def unique_name(self) -> str:
    return (f'UnbiasedEnsembleMeanSquaredError_{self._ensemble_dim}_'
            f'skipna_ensemble_{self._skipna_ensemble}')

  def _compute_per_variable(self, predictions, targets):
    if self._ensemble_dim not in predictions.dims:
      raise ValueError(
          f'Dimension {self._ensemble_dim} not found in {predictions.dims}')
    fused = (None if self._skipna_ensemble else
             _fused_ensemble_pass(predictions, targets, self._ensemble_dim))
    if fused is not None:
      mean, m = fused['mean'], fused['m']
      var = fused['sq_dev_sum'] / (m - 1)
      return (mean - targets) ** 2 - var / m
    predictions_mean = predictions.mean(
        self._ensemble_dim, skipna=self._skipna_ensemble)
    predictions_var = predictions.var(
        self._ensemble_dim, ddof=1, skipna=self._skipna_ensemble)
    if self._skipna_ensemble:
      num_predictions = predictions.count(self._ensemble_dim)
    else:
      num_predictions = predictions.sizes[self._ensemble_dim]
    predictions_bias = predictions_var / num_predictions

    if self._ensemble_dim in targets.dims:
      targets_mean = targets.mean(
          self._ensemble_dim, skipna=self._skipna_ensemble)
      targets_var = targets.var(
          self._ensemble_dim, ddof=1, skipna=self._skipna_ensemble)
      if self._skipna_ensemble:
        num_targets = targets.count(self._ensemble_dim)
      else:
        num_targets = targets.sizes[self._ensemble_dim]
      targets_bias = targets_var / num_targets
    else:
      targets_mean = targets
      targets_bias = 0.0
    biased_mse = (predictions_mean - targets_mean) ** 2
    return biased_mse - predictions_bias - targets_bias


class EnsembleRankedProbabilityScore(base.Statistic):
  """Fair (or biased) RPS from ensemble samples via CDF binning.

  Composes ContinuousToCDF wrappers with the (un)biased MSE statistic and
  sums over bins (reference ``probabilistic.py:339-477``). Computed with
  the real variable name preserved so per-variable threshold mappings
  resolve.
  """

  def __init__(self, prediction_bin_thresholds, target_bin_thresholds,
               bin_dim: str, unique_name_suffix: str,
               ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False, fair: bool = True,
               enforce_monotonicity: bool = True,
               right_inclusive: bool = True):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble
    self._fair = fair
    self._bin_dim = bin_dim
    self._unique_name_suffix = unique_name_suffix

    binned_prediction_wrapper = wrappers.ContinuousToCDF(
        which='predictions', threshold_values=prediction_bin_thresholds,
        threshold_dim=bin_dim, unique_name_suffix=unique_name_suffix,
        enforce_monotonicity=enforce_monotonicity,
        right_inclusive=right_inclusive)
    binned_target_wrapper = wrappers.ContinuousToCDF(
        which='targets', threshold_values=target_bin_thresholds,
        threshold_dim=bin_dim, unique_name_suffix=unique_name_suffix,
        enforce_monotonicity=enforce_monotonicity,
        right_inclusive=right_inclusive)

    if self._fair:
      se_stat = UnbiasedEnsembleMeanSquaredError(
          ensemble_dim=ensemble_dim, skipna_ensemble=skipna_ensemble)
    else:
      se_stat = wrappers.WrappedStatistic(
          deterministic.SquaredError(),
          wrappers.EnsembleMean(
              which='both', ensemble_dim=ensemble_dim,
              skipna=skipna_ensemble, skip_if_ensemble_dim_missing=True))
    self._se_stat = wrappers.WrappedStatistic(
        wrappers.WrappedStatistic(se_stat, binned_target_wrapper),
        binned_prediction_wrapper)

  @property
  def unique_name(self) -> str:
    return (f'RankedProbabilityScore_{self._ensemble_dim}_'
            f'skipna_ensemble_{self._skipna_ensemble}_'
            f'fair_{self._fair}_'
            f'{self._unique_name_suffix}')

  def compute(self, predictions, targets):
    out = {}
    for var in predictions:
      if var not in targets:
        continue
      cdf_mse = self._se_stat.compute(
          {var: predictions[var]}, {var: targets[var]})[var]
      out[var] = cdf_mse.sum(self._bin_dim, skipna=self._skipna_ensemble)
    return out


### Metrics


class CRPSEnsemble(base.PerVariableMetric):
  """Fair CRPS: E|X - Y| - 0.5 E|X - X'| (Zamo & Naveau 2018)."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               use_sort: bool = False, fair: bool = True,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._use_sort = use_sort
    self._fair = fair
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {
        'CRPSSkill': CRPSSkill(
            ensemble_dim=self._ensemble_dim,
            skipna_ensemble=self._skipna_ensemble),
        'CRPSSpread': CRPSSpread(
            ensemble_dim=self._ensemble_dim, use_sort=self._use_sort,
            fair=self._fair, skipna_ensemble=self._skipna_ensemble),
    }

  def _values_from_mean_statistics_per_variable(self, s):
    return s['CRPSSkill'] - 0.5 * s['CRPSSpread']


class CRPSEnsembleDistance(base.PerVariableMetric):
  """Energy-distance CRPS: skill - ½ pred spread - ½ target spread."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               use_sort: bool = False, fair: bool = True,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._use_sort = use_sort
    self._fair = fair
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    # skipna_ensemble is forwarded to ALL three terms. The reference only
    # forwards it to the prediction-spread term (``probabilistic.py:634-650``)
    # despite its docstring promising skipping for "the ensemble MAE and
    # MAD", so there E|X-Y| and E|Y-Y'| still go NaN — a deliberate
    # divergence fixing that upstream inconsistency (values differ only
    # when skipna_ensemble=True and NaN members are present).
    return {
        'CRPSSkill': CRPSSkill(
            ensemble_dim=self._ensemble_dim,
            skipna_ensemble=self._skipna_ensemble),
        'CRPSSpread': CRPSSpread(
            ensemble_dim=self._ensemble_dim, use_sort=self._use_sort,
            fair=self._fair, skipna_ensemble=self._skipna_ensemble),
        'CRPSTargetSpread': CRPSSpread(
            ensemble_dim=self._ensemble_dim, use_sort=self._use_sort,
            fair=self._fair, which='targets',
            skipna_ensemble=self._skipna_ensemble),
    }

  def _values_from_mean_statistics_per_variable(self, s):
    return (s['CRPSSkill'] - 0.5 * s['CRPSSpread']
            - 0.5 * s['CRPSTargetSpread'])


def _wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
  """1-Wasserstein distance between 1-D empirical distributions (jnp).

  Equivalent to scipy.stats.wasserstein_distance with uniform weights:
  the integral of |CDF_u - CDF_v| between consecutive pooled sample values.
  """
  u_sorted = jnp.sort(u)
  v_sorted = jnp.sort(v)
  all_values = jnp.sort(jnp.concatenate([u_sorted, v_sorted]))
  deltas = jnp.diff(all_values)
  u_cdf = jnp.searchsorted(u_sorted, all_values[:-1], side='right') / u.shape[0]
  v_cdf = jnp.searchsorted(v_sorted, all_values[:-1], side='right') / v.shape[0]
  return jnp.sum(jnp.abs(u_cdf - v_cdf) * deltas)


class WassersteinDistance(base.PerVariableStatistic):
  """1-Wasserstein (Earth Mover's) distance between the two ensembles.

  Fully-vectorized on device (vmapped sorted-CDF integral) — no "fair"
  debiasing exists for this distance (reference ``probabilistic.py:662-710``).
  """

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM):
    self._ensemble_dim = ensemble_dim

  @property
  def unique_name(self) -> str:
    return f'WassersteinDistance_{self._ensemble_dim}'

  def _compute_per_variable(self, predictions, targets):
    for name, da in [('predictions', predictions), ('targets', targets)]:
      if self._ensemble_dim not in da.dims:
        raise ValueError(
            f'Ensemble dimension {self._ensemble_dim!r} not found in '
            f'{name}: {da.dims}')

    def batched(u, v):
      batch_shape = u.shape[:-1]
      u2 = u.reshape((-1, u.shape[-1]))
      v2 = v.reshape((-1, v.shape[-1]))
      out = jax.vmap(_wasserstein_1d)(u2, v2)
      return out.reshape(batch_shape).astype(u.dtype)

    return darray.apply_ufunc(
        batched, predictions, targets,
        input_core_dims=[(self._ensemble_dim,), (self._ensemble_dim,)],
        output_core_dims=[()])


class EnsembleErrorExceedance(deterministic.ErrorExceedance):
  """Error exceedance averaged over ensemble members."""

  def __init__(self, thresholds, ensemble_dim: str = ENSEMBLE_DIM):
    super().__init__(thresholds=thresholds)
    self._ensemble_dim = ensemble_dim

  @property
  def unique_name(self) -> str:
    # The reference keys this by bare class name (``probabilistic.py:713``),
    # colliding instances over different ensemble dims; appended only when
    # non-default to keep name parity. Differing thresholds under the same
    # name are caught by base.unique_statistics_for_metrics.
    name = 'EnsembleErrorExceedance'
    if self._ensemble_dim != ENSEMBLE_DIM:
      name += f'_{self._ensemble_dim}'
    return name

  def _compute_per_variable(self, predictions, targets):
    out = super()._compute_per_variable(predictions, targets)
    return out.mean(self._ensemble_dim)


class UnbiasedEnsembleMeanRMSE(base.PerVariableMetric):
  """sqrt of the unbiased ensemble-mean MSE."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {'UnbiasedEnsembleMeanSquaredError':
            UnbiasedEnsembleMeanSquaredError(
                ensemble_dim=self._ensemble_dim,
                skipna_ensemble=self._skipna_ensemble)}

  def _values_from_mean_statistics_per_variable(self, s):
    return darray.sqrt(s['UnbiasedEnsembleMeanSquaredError'])


def SpreadSkillRatio(**unused_kwargs):  # pylint: disable=invalid-name
  raise ValueError(
      'SpreadSkillRatio is no longer supported as it was not correctly '
      'implemented. Please use UnbiasedSpreadSkillRatio instead and see '
      'the docstring of that class for more details.')


class UnbiasedSpreadSkillRatio(base.PerVariableMetric):
  """sqrt(mean ensemble variance / unbiased ensemble-mean MSE)."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {
        'EnsembleVariance': EnsembleVariance(
            ensemble_dim=self._ensemble_dim,
            skipna_ensemble=self._skipna_ensemble),
        'UnbiasedEnsembleMeanSquaredError':
            UnbiasedEnsembleMeanSquaredError(
                ensemble_dim=self._ensemble_dim,
                skipna_ensemble=self._skipna_ensemble),
    }

  def _values_from_mean_statistics_per_variable(self, s):
    return darray.sqrt(
        s['EnsembleVariance'] / s['UnbiasedEnsembleMeanSquaredError'])


class EnsembleRootMeanVariance(base.PerVariableMetric):
  """sqrt of the mean ensemble variance."""

  def __init__(self, ensemble_dim: str = ENSEMBLE_DIM,
               skipna_ensemble: bool = False):
    self._ensemble_dim = ensemble_dim
    self._skipna_ensemble = skipna_ensemble

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    return {'EnsembleVariance': EnsembleVariance(
        ensemble_dim=self._ensemble_dim,
        skipna_ensemble=self._skipna_ensemble)}

  def _values_from_mean_statistics_per_variable(self, s):
    return darray.sqrt(s['EnsembleVariance'])


def _select_optimal_thresholds(
    values: DimArray,
    optimal_thresholds: DimArray,
    method: str | None = None,
) -> DimArray:
  """Selects, per cost/loss ratio, the value at its optimal threshold.

  jax-native equivalent of the reference's vmapped gather
  (``probabilistic.py:883-936``); works inside jit and under the
  autodiff used by statistical inference.
  """
  from weatherbenchx_tpu.darray import _label_indices  # host index lookup

  thresh_coord = values.coord_values('threshold')
  opt_vals = np.asarray(optimal_thresholds.values)
  flat_idx = _label_indices(thresh_coord, opt_vals.reshape(-1), method)
  indices = DimArray(np.asarray(flat_idx).reshape(opt_vals.shape),
                     optimal_thresholds.dims,
                     {k: c for k, c in optimal_thresholds.coords.items()})

  # Broadcast values and indices over shared batch dims, then gather along
  # the threshold axis per cost_loss_ratio.
  batch_dims = tuple(d for d in values.dims if d != 'threshold')
  extra_idx_dims = tuple(d for d in indices.dims
                         if d not in ('cost_loss_ratio',) + batch_dims)
  assert not extra_idx_dims, f'unaligned optimal_thresholds dims {extra_idx_dims}'
  vt = values.transpose(*(batch_dims + ('threshold',)))
  sizes = {**vt.sizes, **indices.sizes}
  idx_full_dims = batch_dims + ('cost_loss_ratio',)

  from weatherbenchx_tpu.darray import _expand_to
  v_data = jnp.asarray(vt.data)
  i_data = _expand_to(jnp.asarray(indices.data), indices.dims, idx_full_dims)
  i_data = jnp.broadcast_to(i_data, tuple(sizes[d] for d in idx_full_dims))
  v_data = jnp.broadcast_to(
      _expand_to(v_data, vt.dims, batch_dims + ('threshold',)),
      tuple(sizes[d] for d in batch_dims) + (vt.sizes['threshold'],))

  select = lambda arr, i: arr[i]
  for _ in range(len(batch_dims)):
    select = jax.vmap(select, in_axes=0, out_axes=0)
  out = select(v_data, i_data)

  coords = {k: c for k, c in values.coords.items()
            if set(c.dims).issubset(batch_dims)}
  if 'cost_loss_ratio' in indices.coords:
    coords['cost_loss_ratio'] = indices.coords['cost_loss_ratio']
  return DimArray(out, idx_full_dims, coords)


class RelativeEconomicValue(base.Metric):
  """Relative economic value over cost/loss ratios and decision thresholds.

  Targets must be binary; predictions are probabilities in [0, 1]
  (reference ``probabilistic.py:939-1180``).
  """

  def __init__(self, *, ensemble_size: int | None = None,
               probability_thresholds: np.ndarray | None = None,
               cost_loss_ratios: np.ndarray | None = None,
               optimal_thresholds=None,
               optimal_thresholds_select_nearest: bool = False,
               statistic_suffix: str | None = None):
    if ensemble_size is None and probability_thresholds is None:
      raise ValueError(
          'Either ensemble_size or probability_thresholds must be specified.')
    if probability_thresholds is not None and ensemble_size is not None:
      raise ValueError(
          'Only one of ensemble_size or probability_thresholds must be'
          ' specified.')
    if probability_thresholds is not None and statistic_suffix is None:
      raise ValueError(
          'If probability_thresholds is specified, statistic_suffix must be'
          ' specified.')

    if cost_loss_ratios is None:
      cost_loss_ratios = np.geomspace(0.005, 1, 51)[:-1]
    self._cost_loss_ratio = DimArray(
        np.asarray(cost_loss_ratios), ('cost_loss_ratio',),
        {'cost_loss_ratio': np.asarray(cost_loss_ratios)})

    self._thresholds = probability_thresholds
    if self._thresholds is None:
      self._thresholds = (np.arange(ensemble_size) + 0.5) / ensemble_size
      if statistic_suffix is None:
        statistic_suffix = 'all_thresholds_for_ensemble_size'
    if not (np.all(self._thresholds >= 0.0)
            and np.all(self._thresholds <= 1.0)):
      raise ValueError(
          f'Probability thresholds must be in [0, 1], got {self._thresholds=}.')
    self._unique_name_suffix = statistic_suffix or ''

    if optimal_thresholds is not None:
      if isinstance(optimal_thresholds, Mapping):
        data_vars = optimal_thresholds.values()
      else:
        data_vars = [optimal_thresholds]
      for var in data_vars:
        if 'cost_loss_ratio' not in var.dims:
          raise ValueError(
              'optimal_thresholds must have "cost_loss_ratio" dimensions.')
        if not np.array_equal(var.coord_values('cost_loss_ratio'),
                              np.asarray(cost_loss_ratios)):
          raise ValueError(
              'optimal_thresholds must have cost_loss_ratio coordinates with '
              'the same values as the cost_loss_ratios argument.')
    self._optimal_thresholds = optimal_thresholds
    self._optimal_thresholds_select_nearest = optimal_thresholds_select_nearest

  @property
  def statistics(self) -> Mapping[str, base.Statistic]:
    binarize = wrappers.ContinuousToBinary(
        which='predictions', threshold_value=list(self._thresholds),
        threshold_dim='threshold',
        unique_name_suffix=self._unique_name_suffix)
    # No TrueNegatives: the finalizer never reads it (the mean contingency
    # normalizes to 1, so TN is derivable). The reference computes and
    # stores it anyway (``probabilistic.py:1049-1070``) — dropped here to
    # save a full threshold-dimensioned statistic's compute, HBM, and
    # AggregationState storage per variable.
    return {
        'TruePositives': wrappers.WrappedStatistic(
            categorical.TruePositives(), binarize),
        'FalsePositives': wrappers.WrappedStatistic(
            categorical.FalsePositives(), binarize),
        'FalseNegatives': wrappers.WrappedStatistic(
            categorical.FalseNegatives(), binarize),
    }

  def _add_constant_threshold_results(
      self, tp: DimArray, fp: DimArray, fn: DimArray
  ) -> Tuple[DimArray, DimArray, DimArray]:
    """Adds degenerate thresholds 0 (always positive) and 1 (always negative)."""
    base_rate = tp.isel(threshold=0) + fn.isel(threshold=0)
    base_rate = base_rate.drop_coords('threshold')
    zero = darray.zeros_like(base_rate)

    def at(x, threshold):
      e = x.expand_dims('threshold')
      return e.assign_coords(threshold=Coord(
          ('threshold',), np.array([threshold])))

    def cat(parts):
      return darray.concat(parts, 'threshold')

    tp2 = cat([at(base_rate, 0.0), tp, at(zero, 1.0)])
    fp2 = cat([at(1.0 - base_rate, 0.0), fp, at(zero, 1.0)])
    fn2 = cat([at(zero, 0.0), fn, at(base_rate, 1.0)])
    return tp2, fp2, fn2

  def values_from_mean_statistics(self, statistic_values):
    common_variables = set.intersection(
        *[set(statistic_values[s]) for s in self.statistics])
    values = {}
    for var_name in sorted(common_variables, key=str):
      stats_per_variable = {
          s: statistic_values[s][var_name] for s in self.statistics}
      values[var_name] = self._values_from_mean_statistics_per_variable(
          stats_per_variable, var_name)
    return values

  def _values_from_mean_statistics_per_variable(self, s, var_name):
    tp, fp, fn = (s['TruePositives'], s['FalsePositives'],
                  s['FalseNegatives'])
    tp, fp, fn = self._add_constant_threshold_results(tp, fp, fn)

    if self._optimal_thresholds is not None:
      if isinstance(self._optimal_thresholds, Mapping):
        optimal_thresholds = self._optimal_thresholds[var_name]
      else:
        optimal_thresholds = self._optimal_thresholds
      method = 'nearest' if self._optimal_thresholds_select_nearest else None
      tp = _select_optimal_thresholds(tp, optimal_thresholds, method)
      fp = _select_optimal_thresholds(fp, optimal_thresholds, method)
      fn = _select_optimal_thresholds(fn, optimal_thresholds, method)

    pred_cost = self._cost_loss_ratio * (tp + fp) + fn
    perf_cost = self._cost_loss_ratio * (tp + fn)
    clim_cost = darray.minimum(
        (tp + fn) * 0 + self._cost_loss_ratio, tp + fn)
    return (clim_cost - pred_cost) / (clim_cost - perf_cost)


class RankHistogram(base.PerVariableStatistic):
  """Counts of the target's rank within the sorted ensemble.

  Adds a 'rank' dim of size M+1 with one-hot float32 counts
  (reference ``probabilistic.py:1183-1220``).
  """

  def __init__(self, *, ensemble_dim: str = ENSEMBLE_DIM):
    self._ensemble_dim = ensemble_dim

  @property
  def unique_name(self) -> str:
    return f'RankHistogram_{self._ensemble_dim}'

  def _compute_per_variable(self, predictions, targets):
    num_bins = predictions.sizes[self._ensemble_dim] + 1
    ranks = (predictions < targets).astype(np.int32).sum(self._ensemble_dim)
    categories = DimArray(np.arange(num_bins), ('rank',),
                          {'rank': np.arange(num_bins)})
    counts = (ranks == categories).astype(np.float32)
    # NaN-loud divergence from the reference (``probabilistic.py:1205-1222``),
    # where a NaN target or member compares False and silently contributes a
    # (mis-ranked) count — inflating the rank-0 bin by the number of missing
    # observations with no way for masked/skipna aggregation to exclude them.
    missing = targets.isnull() | predictions.isnull().any(self._ensemble_dim)
    return counts.where(~missing)
