"""Delta method via native JAX linearization of the metric finalizers.

Reference: ``weatherbenchX/statistical_inference/autodiff.py:33-233``. Since
this framework's arrays are JAX-native, the reference's DataArray↔jax.Array
marshalling boilerplate (``autodiff.py:134-155``) disappears: we linearize
``values_from_mean_statistics ∘ weight-normalize`` at the mean statistics
with ``jax.linearize`` and vmap the tangent map over the experimental-unit
axis in one shot.
"""

from typing import Hashable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from weatherbenchx_tpu import aggregation
from weatherbenchx_tpu import tree
from weatherbenchx_tpu.darray import Coord, DimArray
from weatherbenchx_tpu.metrics import base as metrics_base
from weatherbenchx_tpu.inference import utils

MetricValues = Mapping[str, Mapping[Hashable, DimArray]]


def _dtype():
  return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def per_unit_values_linearized_around_mean_statistics(
    metrics: Mapping[str, metrics_base.Metric],
    aggregation_state: aggregation.AggregationState,
    experimental_unit_dim: str,
) -> tuple[MetricValues, MetricValues]:
  """Linearized per-unit metric values (multivariate delta method).

  Returns (value, per_unit_tangents): the metric at the mean statistics,
  and zero-mean per-unit tangents of the linearized finalizer. See the
  reference docstring (``autodiff.py:38-126``) for the full statistical
  story; weight normalization is part of the differentiated function.
  """
  cpu = jax.local_devices(backend='cpu')[0]
  dtype = _dtype()

  unit_coord = utils.get_and_check_experimental_unit_coord(
      aggregation_state, experimental_unit_dim)

  def to_unit_last(x: DimArray) -> DimArray:
    order = [d for d in x.dims if d != experimental_unit_dim]
    order.append(experimental_unit_dim)
    out = x.transpose(*order) if tuple(order) != x.dims else x
    # Host-side numpy data on CPU jax arrays; coords host.
    data = jax.device_put(
        jnp.asarray(np.asarray(out.values), dtype=dtype), cpu)
    coords = {k: Coord(c.dims, np.asarray(c.values))
              for k, c in out.coords.items()}
    return DimArray(data, out.dims, coords)

  per_unit = aggregation_state.map(to_unit_last)
  mean_state = per_unit.map(
      lambda x: x.mean(experimental_unit_dim))

  mean_ws_data = tree.map_structure(
      lambda d: d.data, mean_state.sum_weighted_statistics)
  mean_w_data = tree.map_structure(
      lambda d: d.data, mean_state.sum_weights)
  ws_template = mean_state.sum_weighted_statistics
  w_template = mean_state.sum_weights

  result_template: dict = {}

  def metric_fn(ws_data, w_data):
    ws = tree.map_structure(
        lambda d, t: DimArray(d, t.dims, t.coords), ws_data, ws_template)
    w = tree.map_structure(
        lambda d, t: DimArray(d, t.dims, t.coords), w_data, w_template)
    state = aggregation.AggregationState(ws, w)
    result = metrics_base.compute_metrics_from_statistics(
        metrics, state.mean_statistics())
    result_template.clear()
    result_template.update(result)
    return tree.map_structure(lambda x: jnp.asarray(x.data), result)

  values_data, linearized = jax.linearize(metric_fn, mean_ws_data, mean_w_data)
  linearized = jax.vmap(linearized, in_axes=-1, out_axes=-1)

  value = tree.map_structure(
      lambda d, t: DimArray(np.asarray(d), t.dims, t.coords),
      values_data, dict(result_template))

  tangents_in = aggregation.AggregationState.map_multi(
      lambda x, y: x - y, per_unit, mean_state)
  tangents_out_data = linearized(
      tree.map_structure(lambda d: jnp.asarray(d.data),
                         tangents_in.sum_weighted_statistics),
      tree.map_structure(lambda d: jnp.asarray(d.data),
                         tangents_in.sum_weights))

  unit_coord_np = Coord(unit_coord.dims, np.asarray(unit_coord.values))

  def rebuild_tangent(d, t: DimArray) -> DimArray:
    dims = t.dims + (experimental_unit_dim,)
    coords = dict(t.coords)
    coords[experimental_unit_dim] = unit_coord_np
    return DimArray(np.asarray(d), dims, coords)

  per_unit_tangents = tree.map_structure(
      rebuild_tangent, tangents_out_data, dict(result_template))

  return value, per_unit_tangents
